package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector (embedding-column) functions over Array[Float] columns.
  *
  * Float inputs are widened to double before arithmetic so results are
  * stable regardless of SIMD/accumulation differences in other engines, and
  * the fold order is the array order (Spark `aggregate` is a sequential
  * left fold) — deterministic across partitions/executors.
  *
  * Built on zip_with/aggregate/transform — codegen'd, no UDF. A custom
  * Catalyst Expression with a tight primitive loop is the next rung if the
  * fold shows up in profiles at scale.
  */
object VectorFns {

  private def d(x: Column): Column = x.cast(DoubleType)

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — native codegen Expression
    * (graft.plans.CosineSimilarity), bit-equal to the sequential fold. */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  /** Cosine rounded for stable cross-engine comparison/verification. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
