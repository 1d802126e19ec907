package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token-count expressions.
  *
  * Both counts are regex-definable (`size(split(text, "\\s+"))` and
  * `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")`), and the
  * DuckDB oracles keep those regex definitions — but at 100 TB the
  * counts are a pure scan bottleneck, and the regex engine walks a
  * backtracking automaton per char (and `split` additionally
  * materializes an array of UTF8String slices per row just to take
  * its length). These expressions compute the identical counts in one
  * branchy byte scan, no allocation, fused into whole-stage codegen.
  * FunctionsSpec pins exact equality with the regex forms on
  * adversarial and randomized inputs, including multi-byte UTF-8.
  */
abstract class TokenCountExpression extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string column, got ${child.dataType}")
}

/** ws_token_count(text) == size(split(text, "\\s+")).
  *
  * Spark's `split` runs with limit -1 (trailing empty fields KEPT),
  * so the field count is exactly (number of `\s+` separator runs)+1 —
  * leading/trailing separators contribute an empty field each, which
  * the +1-per-run accounting already covers. Java-regex `\s` is the
  * six ASCII whitespace chars; UTF-8 continuation/lead bytes are
  * negative and never match, so a bytewise scan needs no decoding.
  */
case class WsTokenCount(child: Expression) extends TokenCountExpression {
  override def prettyName: String = "ws_token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.wsCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.wsCount($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

/** bpe_token_count(text) ==
  * regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]").
  *
  * The alternation's greedy left-to-right semantics reduce to: one
  * token per maximal ASCII-letter run, one per maximal ASCII-digit
  * run, one per remaining non-whitespace CODEPOINT (Java char
  * classes match whole code points, so a multi-byte char is a single
  * token — the scan skips its continuation bytes in one step).
  */
case class BpeTokenCount(child: Expression) extends TokenCountExpression {
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    TokenCount.bpeCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.bpeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object TokenCount {

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** static entry for both interpreted eval and generated code */
  def wsCount(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var seps = 0L
    var inWs = false
    while (i < n) {
      val w = isWs(s.getByte(i))
      if (w && !inWs) seps += 1
      inWs = w
      i += 1
    }
    seps + 1
  }

  /** static entry for both interpreted eval and generated code */
  def bpeCount(s: UTF8String): Long = {
    val n = s.numBytes
    var i = 0
    var cnt = 0L
    // 0 = none, 1 = inside a letter run, 2 = inside a digit run
    var run = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (run != 1) { cnt += 1; run = 1 }
        } else if (b >= '0' && b <= '9') {
          if (run != 2) { cnt += 1; run = 2 }
        } else if (isWs(b)) {
          run = 0
        } else {
          cnt += 1; run = 0
        }
        i += 1
      } else {
        // non-ASCII codepoint: one "symbol" token, breaks any run
        cnt += 1; run = 0
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    cnt
  }
}
