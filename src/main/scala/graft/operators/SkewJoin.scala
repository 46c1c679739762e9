package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys when the small side is too large to
  * broadcast.
  *
  * A plain shuffle join sends every row of a hot key to one reducer. The
  * salted form splits the fact side of each key into `saltBuckets`
  * deterministic sub-keys and replicates each build-side row once per
  * bucket, so a hot key's work spreads over `saltBuckets` reducers. The
  * build side grows by `saltBuckets`× — use it when that is still far
  * smaller than the hot partition it dissolves.
  *
  * Spark's AQE skew-join handles most cases at runtime by splitting
  * oversized partitions; this operator is the explicit, deterministic
  * form for pipelines that pin their plans (or for skew AQE cannot see,
  * e.g. a key that is hot only after a filter). Salt comes from a hash of
  * a fact-side column, so results are reproducible run to run.
  */
object SkewJoin {

  /** Inner-join `fact` with `build` on `key`, salted. `saltSource` must be
    * a fact-side column with per-row variation (any high-cardinality
    * column works — it only spreads rows, it never changes match
    * semantics). */
  def saltedInnerJoin(fact: DataFrame, build: DataFrame, key: String,
                      saltSource: Column, saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    val replicatedBuild = build.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }
}
