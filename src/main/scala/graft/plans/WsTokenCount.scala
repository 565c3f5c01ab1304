package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims
import org.apache.spark.unsafe.types.UTF8String

/**
 * `ws_token_count(text)`: the number of whitespace-delimited tokens, as a
 * native Catalyst expression with whole-stage codegen — semantically
 * identical to `size(regexp_extract_all(text, '[^ \t\n\r\f]+', 0))`, the
 * token-COUNT idiom all over the text family (split stats q53, mixture
 * weights q115, budget q108, quality features q129, epoch plan q131...).
 *
 * Why custom: the regexp form materializes every token as a UTF8String in
 * an array merely to take its length — per-row allocation proportional to
 * the document, plus regex-engine dispatch per match. Counting maximal
 * non-whitespace runs needs ONE branchy byte scan and zero allocation.
 * The five delimiter bytes are all ASCII; UTF-8 multi-byte sequences never
 * contain ASCII bytes, so the byte-level scan is exact on any input.
 */
case class WsTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ws_token_count requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val n = u.numBytes()
    var cnt = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val b = u.getByte(i)
      val ws = b == 32 || b == 9 || b == 10 || b == 13 || b == 12
      if (ws) inRun = false
      else if (!inRun) { cnt += 1L; inRun = true }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val inRun = ctx.freshName("inRun")
      s"""
         |int $n = $s.numBytes();
         |long $cnt = 0L;
         |boolean $inRun = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $s.getByte($i);
         |  if ($b == 32 || $b == 9 || $b == 10 || $b == 13 || $b == 12) {
         |    $inRun = false;
         |  } else if (!$inRun) { $cnt++; $inRun = true; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)

  override def prettyName: String = "ws_token_count"
}

object WsTokenCount {
  /** Column API: whitespace-delimited token count (Long). */
  def ws_token_count(c: Column): Column =
    Shims.column(WsTokenCount(Shims.expression(c)))

  /** Register `ws_token_count` for SQL on an already-built session
    * (equivalent to configuring [[GraftExtensions]] at build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Shims.registerFunction(spark, "ws_token_count",
      exprs => WsTokenCount(exprs.head))
}
