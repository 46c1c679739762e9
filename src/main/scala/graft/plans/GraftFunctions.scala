package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-facing registration of graft's native kernels, so a pure-SQL user
  * (the reference's `spark.sql`-over-a-fetched-file workflow,
  * etl_conformed_to_purposebuilt.py:199) can call the same codegen
  * Expressions the DataFrame API uses:
  *
  * {{{
  *   GraftFunctions.install(spark)
  *   spark.sql("""SELECT doc_id,
  *                  graft_simhash64(graft_tokens_hack) ...""")
  *   spark.sql("SELECT graft_cosine(a.emb, b.emb) FROM ...")
  * }}}
  *
  * Integer parameters (shingle width, hash count, sketch size) arrive as
  * SQL literals and are extracted at resolution time — they parameterize
  * codegen, so they must be constants.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Idempotently register all graft SQL functions on the session. */
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def f(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")

    f("graft_cosine") { e => CosineSimilarity(e(0), e(1)) }
    f("graft_simhash64") { e => SimHash64(e(0)) }
    f("graft_minhash_sig") { e =>
      MinHashSig(e(0), intLit(e(1), "numHashes")) }
    f("graft_shingle_hashes") { e =>
      ShingleHash(e(0), intLit(e(1), "shingle k")) }
    f("graft_char_shingle_hashes") { e =>
      CharShingleHashes(e(0), intLit(e(1), "ngram n")) }
    f("graft_jaccard_sorted") { e => JaccardSorted(e(0), e(1)) }
    f("graft_rolling_fingerprint") { e => RollingMinHash(e.head) }
    f("graft_misra_gries") { e =>
      MisraGriesAgg(e(0), intLit(e(1), "sketch k")) }
  }
}
