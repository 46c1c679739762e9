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

object TextKernels {
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(StopwordHits(ColumnBridge.expression(toks), words))
  def tokenLenSum(toks: Column): Column =
    ColumnBridge.column(TokenLenSum(ColumnBridge.expression(toks)))
}
