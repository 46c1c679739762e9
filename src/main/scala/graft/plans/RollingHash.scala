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

/** Per-position Rabin-Karp window hashes: element i is the hash of the
  * `window` code points starting at code-point position i (empty array when
  * the text is shorter than the window). This is the n-gram INDEX primitive
  * behind span-level substring dedup: one O(len) scan per document emits
  * every gram's 64-bit key without materializing a single gram string —
  * the alternative (substring explode) shuffles window× the corpus bytes.
  *
  * The hash is polynomial in the ring Long naturally provides (mod 2^64,
  * Java arithmetic wraps): h_i = sum_j cp(i+j) * B^(w-1-j), rolled in O(1)
  * per position. Unlike [[RollingMinHash]] it does NOT need
  * division-exact arithmetic, so the window is unbounded. Collisions are
  * possible (callers must verify candidates against exact gram text —
  * [[graft.operators.SubstringDedup]] does); equality of grams always
  * implies equality of hashes, so verification only ever REMOVES
  * false candidates. */
case class WindowHashes(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 2, s"window hash needs window >= 2, got $window")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.windowHashes(input.asInstanceOf[UTF8String].toString, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingMinHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.windowHashes($c.toString(), $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object RollingMinHash {

  /** Wrapping-ring multiplier for [[WindowHashes]]: an odd constant with
    * good bit dispersion (FNV-1a's 64-bit prime). Any odd value is a unit
    * mod 2^64; odd-ness is what makes distinct gram CONTENT change the
    * hash in every bit position of the polynomial. */
  private val WinBase = 0x100000001b3L

  /** All window hashes of s (code-point windows), rolled in O(len). */
  def windowHashes(s: String,
                   window: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // decode to code points so window positions agree with SQL substring
    // semantics (both Spark's substring and DuckDB's substr count code
    // points, not UTF-16 chars)
    val cps = new Array[Int](s.codePointCount(0, s.length))
    var i = 0; var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp; k += 1
      i += Character.charCount(cp)
    }
    val m = math.max(cps.length - window + 1, 0)
    val out = new Array[Long](m)
    if (m > 0) {
      var topPow = 1L
      var j = 1
      while (j < window) { topPow *= WinBase; j += 1 }
      var h = 0L
      j = 0
      while (j < window) { h = h * WinBase + cps(j); j += 1 }
      out(0) = h
      i = 1
      while (i < m) {
        h = (h - cps(i - 1) * topPow) * WinBase + cps(i + window - 1)
        out(i) = h
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

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
