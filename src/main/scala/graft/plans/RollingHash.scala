package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint (custom Catalyst Expression).
  *
  * hash(i) = sum_{j<w} code(c[i+j]) * base^j over a sliding window; the
  * fingerprint is the minimum window hash (winnowing-style, robust to
  * content shifts). base=31, w=8 keeps every intermediate exact in a Long
  * (31^7 * 127 * 8 < 2^53), so the same value is reproducible in any engine
  * with exact 53-bit arithmetic — which is what the DuckDB oracle uses.
  *
  * Implements `doGenCode` so the O(n) scan runs inside whole-stage codegen
  * next to the parquet reader — no UDF boxing on the 100 TB path. The
  * rolling update is O(1) per position: h' = (h - c)/base + c_new*base^(w-1).
  */
case class RollingMinHash(child: Expression, window: Int = 8, base: Long = 31L)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    RollingMinHash.fingerprint(s, window, base)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object fp = $cls.fingerprint($c.toString(), $window, ${base}L);
         |if (fp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) fp).longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  /** Null (no fingerprint) when the text is shorter than the window. */
  def fingerprint(s: String, window: Int, base: Long): java.lang.Long = {
    val n = s.length
    if (n < window) return null
    var topPow = 1L
    var j = 1
    while (j < window) { topPow *= base; j += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h += s.charAt(i).toLong * pow(base, i); i += 1 }
    var min = h
    i = 1
    while (i <= n - window) {
      h = (h - s.charAt(i - 1).toLong) / base + s.charAt(i + window - 1).toLong * topPow
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  private def pow(b: Long, e: Int): Long = {
    var r = 1L; var i = 0
    while (i < e) { r *= b; i += 1 }
    r
  }
}
