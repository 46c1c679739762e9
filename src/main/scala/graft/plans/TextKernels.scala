package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextKernelOps {
  /** Occurrences (repeats counted) of set members in a token array —
    * one primitive loop + O(1) hash probes. */
  def hits(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Total character length of all tokens — one primitive loop. */
  def lenSum(toks: ArrayData): Long = {
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += toks.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => set.add(UTF8String.fromString(w)))
    set
  }

  /** Occurrence count of the most frequent token — one hash-count pass
    * over the row's own tokens. Replaces the explode → groupBy(doc,
    * token) → groupBy(doc) max plan shape, which shuffles every token
    * of the corpus twice to compute a per-ROW statistic. */
  def topTokenCount(toks: ArrayData): Int = {
    val n = toks.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val c = m.merge(toks.getUTF8String(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
      if (c.intValue() > best) best = c.intValue()
      i += 1
    }
    best
  }

  /** Count of `\S+` runs — whitespace-delimited tokens — in one UTF-8
    * byte walk (ASCII whitespace bytes never occur inside a multi-byte
    * code point, so byte-level run detection is exact). */
  def wsTokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    var inRun = false
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' ' || (b >= 0x09 && b <= 0x0D)
      if (ws) inRun = false
      else { if (!inRun) c += 1; inRun = true }
      i += 1
    }
    c
  }

  /** Count of `[a-z0-9]+` runs over the ASCII-lowercased text — the
    * match count of the tokenizer regex. ASCII-exact; like the regex,
    * non-ASCII code points break runs (the exotic lowercasings that map
    * non-ASCII into ASCII, e.g. KELVIN SIGN → k, differ — irrelevant for
    * the corpus formats this counts). */
  def wordRunCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    var inRun = false
    while (i < n) {
      val b = s.getByte(i)
      val alnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
        (b >= '0' && b <= '9')
      if (!alnum) inRun = false
      else { if (!inRun) c += 1; inRun = true }
      i += 1
    }
    c
  }

  /** Match count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — BPE-ish pieces:
    * letter runs, digit runs, single punctuation/symbol code points. */
  def bpePieces(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    var prev = 0 // 0 = ws/punct/none, 1 = letter run, 2 = digit run
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (prev != 1) c += 1
          prev = 1
        } else if (b >= '0' && b <= '9') {
          if (prev != 2) c += 1
          prev = 2
        } else if (b == ' ' || (b >= 0x09 && b <= 0x0D)) {
          prev = 0
        } else { // ASCII punctuation: one piece per char
          c += 1
          prev = 0
        }
      } else {
        if ((b & 0xC0) != 0x80) c += 1 // lead byte: one punct code point
        prev = 0
      }
      i += 1
    }
    c
  }

  /** Per-row Shannon token entropy in ONE hash-count pass — replaces
    * the explode → groupBy(doc, token) → join → groupBy(doc) plan,
    * which shuffles every token of the corpus twice to compute a
    * per-ROW statistic. Returns (n_tokens, vocab, entropy_nats).
    *
    * Bit-parity with the SQL replay is engineered, not hoped for: each
    * distinct token's term (n/t)·ln(n/t) is rounded EXACTLY like
    * Spark's round(double, 8) (BigDecimal HALF_UP — also DuckDB's
    * half-away-from-zero), scaled to a long in 1e-8 units, and summed
    * in exact integer arithmetic (order-independent); the final
    * −sum/1e8 is one correctly-rounded double division (1e8 is exact),
    * identical to casting the DECIMAL(18,8) sum to DOUBLE, then
    * rounded at 6 the same way. This is the lm_score order-independence
    * convention executed row-locally. */
  def tokenEntropy(toks: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      m.merge(toks.getUTF8String(i), Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue() + b.intValue()))
      i += 1
    }
    var sumScaled = 0L
    if (n > 0) {
      val t = n.toDouble
      val it = m.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        val p = c / t
        val term = p * Math.log(p)
        sumScaled += java.math.BigDecimal.valueOf(term)
          .setScale(8, java.math.RoundingMode.HALF_UP)
          .movePointRight(8).longValueExact()
      }
    }
    val entropy = java.math.BigDecimal.valueOf(-(sumScaled.toDouble / 1e8))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, m.size().toLong, entropy))
  }

  /** Code points NOT in [A-Za-z0-9] and not ASCII whitespace
    * ([ \t\n\x0B\f\r] — Java regex `\s`), i.e. the match count of
    * `[^A-Za-z0-9\s]`, in one UTF-8 byte walk: ASCII bytes classify
    * directly; a non-ASCII LEAD byte (0b11xxxxxx) counts one code point
    * (always outside the class), continuation bytes are skipped. No
    * per-match String allocation — `regexp_extract_all` on this pattern
    * allocates one single-char String per punctuation mark, which turns
    * a scan-speed quality pass into an allocation storm. */
  def punctCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var c = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        val isAlnum = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
          (b >= '0' && b <= '9')
        val isWs = b == ' ' || (b >= 0x09 && b <= 0x0D)
        if (!isAlnum && !isWs) c += 1
      } else if ((b & 0xC0) != 0x80) { // multi-byte lead
        c += 1
      }
      i += 1
    }
    c
  }
}

/** Count of tokens that appear in a fixed word set, as a native codegen
  * Expression. Replaces `size(filter(toks, t => t.isInCollection(...)))`:
  * Spark evaluates higher-order-function lambdas interpreted (a closure
  * call + an In-list scan per element), and the language-ID path runs
  * FOUR of them per row — on a 100 TB document scan that is the
  * difference between a scan-speed pass and a CPU-bound one. */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val set = TextKernelOps.buildSet(words)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"stopword_hits expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernelOps.hits(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("stopset", set, "java.util.HashSet")
      s"${ev.value} = graft.plans.TextKernelOps.hits($c, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Sum of token lengths (for mean-word-length), as a native codegen
  * Expression — replaces the interpreted `aggregate(toks, 0L, acc+len)`
  * fold. */
case class TokenLenSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "token_len_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_len_sum expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernelOps.lenSum(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernelOps.lenSum($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenLenSum =
    copy(child = newChild)
}

/** Single-byte-walk text counters as one native codegen Expression —
  * `kernel` names the static [[TextKernelOps]] method (punctCount /
  * wsTokenCount / wordRunCount / bpePieces). Each replaces a
  * `size(regexp_extract_all(...))` whose only purpose was the COUNT:
  * the regex version allocates a String per match (one per punctuation
  * mark for punctCount — measured 13× slower at bench scale). */
case class TextCount(child: Expression, kernel: String)
    extends UnaryExpression {

  require(TextCount.kernels(kernel), s"unknown text-count kernel: $kernel")

  override def dataType: DataType = IntegerType
  override def prettyName: String = kernel

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$kernel expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    kernel match {
      case "punctCount" => TextKernelOps.punctCount(s)
      case "wsTokenCount" => TextKernelOps.wsTokenCount(s)
      case "wordRunCount" => TextKernelOps.wordRunCount(s)
      case "bpePieces" => TextKernelOps.bpePieces(s)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernelOps.$kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): TextCount =
    copy(child = newChild)
}

object TextCount {
  val kernels: Set[String] =
    Set("punctCount", "wsTokenCount", "wordRunCount", "bpePieces")
}

/** Max per-row token frequency as a native codegen Expression — see
  * [[TextKernelOps.topTokenCount]]. */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_token_count expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernelOps.topTokenCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernelOps.topTokenCount($c);")

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** One-pass per-row Shannon token entropy — see
  * [[TextKernelOps.tokenEntropy]]. Output struct
  * (n_tokens BIGINT, vocab BIGINT, entropy_nats DOUBLE). */
case class TokenEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("vocab", LongType, nullable = false),
    StructField("entropy_nats", DoubleType, nullable = false)))
  override def prettyName: String = "token_entropy"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernelOps.tokenEntropy(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextKernelOps.tokenEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TextKernels {
  def tokenEntropy(toks: Column): Column =
    ColumnBridge.column(TokenEntropy(ColumnBridge.expression(toks)))
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopwordHits(ColumnBridge.expression(toks), words))
  def tokenLenSum(toks: Column): Column =
    ColumnBridge.column(TokenLenSum(ColumnBridge.expression(toks)))
  def topTokenCount(toks: Column): Column =
    ColumnBridge.column(TopTokenCount(ColumnBridge.expression(toks)))
  def punctCount(text: Column): Column =
    ColumnBridge.column(TextCount(ColumnBridge.expression(text), "punctCount"))
  def wsTokenCount(text: Column): Column =
    ColumnBridge.column(TextCount(ColumnBridge.expression(text), "wsTokenCount"))
  def wordRunCount(text: Column): Column =
    ColumnBridge.column(TextCount(ColumnBridge.expression(text), "wordRunCount"))
  def bpePieces(text: Column): Column =
    ColumnBridge.column(TextCount(ColumnBridge.expression(text), "bpePieces"))
}
