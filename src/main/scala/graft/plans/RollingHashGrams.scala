package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims
import org.apache.spark.unsafe.types.UTF8String

/**
 * `rolling_hash_grams(text)`: the Karp-Rabin polynomial hash of every
 * k-gram of code points, as ONE array per row — the true O(n) rolling
 * recurrence (subtract the leaving code point's B^(k-1) term, multiply by
 * B, add the entering one), computed natively inside whole-stage codegen.
 *
 * Semantically identical to the composable form
 * `transform(sequence(1, n-k+1), i -> aggregate(transform(sequence(0, k-1),
 * j -> ascii(substring(text, i+j, 1))), 0L, (acc,c) -> (acc*B + c) % M))`,
 * which q135's profile showed costs ~75 s at sf0.1: interpreted
 * higher-order functions re-extract a substring per (position, offset)
 * and box every lambda variable — O(n·k) allocations where the recurrence
 * needs O(n) primitive ops. Hash unit is the CODE POINT (what `ascii()`
 * returns in Spark and DuckDB), so the oracle replays the value exactly
 * on any input, not just ASCII.
 *
 * Fewer than k code points yield an empty array; null yields null.
 */
case class RollingHashGrams(child: Expression) extends UnaryExpression {

  import RollingHashGrams.{B, K, M, BK}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash_grams requires a string input, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    ArrayData.toArrayData(RollingHashGrams.hashes(str))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RollingHashGrams.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, s => {
      val arr = ctx.freshName("arr")
      s"""
         |long[] $arr = $cls.hashes($s.toString());
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashGrams =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash_grams"
}

object RollingHashGrams {
  // shared with operators/TextOps q135 — ONE set of constants
  val K = 5
  val B = 257L
  val M = 1000000007L
  /** B^(K-1) mod M — the leaving code point's coefficient. */
  val BK: Long = {
    var r = 1L
    (1 until K).foreach(_ => r = r * B % M)
    r
  }

  /** O(n) rolling Karp-Rabin over code points (static so codegen can call
    * it — one tight loop, no per-gram rescans). */
  def hashes(str: String): Array[Long] = {
    val n = str.codePointCount(0, str.length)
    if (n < K) return Array.emptyLongArray
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    val out = new Array[Long](n - K + 1)
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    i = K
    while (i < n) {
      val t = java.lang.Math.floorMod(h - cps(i - K) * BK % M, M)
      h = (t * B + cps(i)) % M
      out(i - K + 1) = h
      i += 1
    }
    out
  }

  /** Column API. */
  def rolling_hash_grams(c: Column): Column =
    Shims.column(RollingHashGrams(Shims.expression(c)))
}
