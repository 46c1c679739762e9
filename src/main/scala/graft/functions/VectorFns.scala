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

  /** Largest |component| — the symmetric-quantization scale factor. */
  def maxAbs(a: Column): Column = array_max(transform(a, x => abs(d(x))))

  /** Symmetric int8 quantization: q_i = round(127 · x_i / max|x|), the
    * standard absmax scheme (e.g. LLM.int8()). 4× smaller vectors for
    * ANN candidate scans; rerank the shortlist with the full-precision
    * cosine. Callers materialize `scale` (= maxAbs) once as its own
    * column — embedded here per element it would re-evaluate per element
    * (the SURVEY §7 lambda trap). All-zero vectors quantize to zeros. */
  def quantizeInt8(a: Column, scale: Column): Column =
    transform(a, x =>
      when(scale === 0.0, lit(0L))
        .otherwise(round(lit(127.0) * d(x) / scale, 0).cast(LongType)))
}
