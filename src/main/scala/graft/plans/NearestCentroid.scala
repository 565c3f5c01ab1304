package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims

/**
 * `nearest_centroid(vec, books)`: the k-means / IVF / PQ assignment step as
 * one native codegen'd expression.
 *
 * `vec` is an `array<bigint>` (fixed-point-quantized coordinates); `books`
 * is an `array<struct<cid int, cq array<bigint>>>` — in practice a literal
 * carrying the driver-resident centroid table into the plan. Returns
 * `struct<cid int, d2 bigint>`: the centroid with the minimum exact integer
 * squared distance Σ(a−b)², ties broken by the FIRST entry in `books`
 * (callers keep books sorted by cid ascending, making ties → lowest cid,
 * identical to `ROW_NUMBER() OVER (ORDER BY d2, cid) = 1`).
 *
 * Why custom: the composable alternative — `least()` over K
 * `struct(d2, cid)` columns, each with its own distance subexpression —
 * generates O(K·dim) lines of code, blowing past Janino/JIT method limits
 * for K beyond a few dozen (the PQ path's 4×16 codebooks already regressed
 * 2×). This expression is a constant ~30 generated lines looping over the
 * codebook DATA, so K can be 8 or 65 536 without touching codegen limits —
 * the assignment stays a map-only, shuffle-free operator at any scale.
 *
 * Reference motivation: the autoscaler-style placement loops in the
 * reference pick argmin over small driver-resident tables
 * (RebalancerCommon.java); here the same move is a per-row vector argmin.
 *
 * Overflow contract: the accumulation is CHECKED 64-bit arithmetic —
 * `Math.multiplyExact`/`Math.addExact` throw `ArithmeticException` rather
 * than wrapping silently, matching the SQL-engine (BIGINT overflow error)
 * behavior the oracle exhibits. Safe input range: with |a−b| ≤ 2^m and
 * dim ≤ 2^k, the sum is bounded by 2^(2m+k), so any m + k/2 ≤ 31 cannot
 * overflow (e.g. quantized coordinates within ±2^27 at dim ≤ 256). The
 * shipped callers quantize to ~2^20, far inside the contract.
 */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
            ArrayType(StructType(Array(f1, f2)), _)) =>
        f1.dataType == IntegerType && (f2.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "nearest_centroid requires (array<bigint>, array<struct<int, array<bigint>>>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("d2", LongType, nullable = false)))

  // null on null/ragged input or an empty codebook, like the least() chain
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vec = l.asInstanceOf[ArrayData]
    val books = r.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    var bestD2 = Long.MaxValue
    var bestCid = 0
    var found = false
    var b = 0
    while (b < books.numElements()) {
      if (books.isNullAt(b)) return null
      val s = books.getStruct(b, 2)
      val cq = s.getArray(1)
      if (cq.numElements() != dim) return null
      var acc = 0L
      var i = 0
      while (i < dim) {
        val d = Math.subtractExact(vec.getLong(i), cq.getLong(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        i += 1
      }
      if (!found || acc < bestD2) {
        bestD2 = acc
        bestCid = s.getInt(0)
        found = true
      }
      b += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestCid, bestD2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, books) => {
      val dim = ctx.freshName("dim")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val cq = ctx.freshName("cq")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bestD2 = ctx.freshName("bestD2")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      s"""
         |int $dim = $vec.numElements();
         |long $bestD2 = Long.MAX_VALUE;
         |int $bestCid = 0;
         |boolean $found = false;
         |for (int $b = 0; $b < $books.numElements() && !${ev.isNull}; $b++) {
         |  if ($books.isNullAt($b)) { ${ev.isNull} = true; break; }
         |  InternalRow $s = $books.getStruct($b, 2);
         |  ArrayData $cq = $s.getArray(1);
         |  if ($cq.numElements() != $dim) { ${ev.isNull} = true; break; }
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    long $d = java.lang.Math.subtractExact($vec.getLong($i), $cq.getLong($i));
         |    $acc = java.lang.Math.addExact($acc, java.lang.Math.multiplyExact($d, $d));
         |  }
         |  if (!$found || $acc < $bestD2) {
         |    $bestD2 = $acc;
         |    $bestCid = $s.getInt(0);
         |    $found = true;
         |  }
         |}
         |if (!$found) ${ev.isNull} = true;
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { java.lang.Integer.valueOf($bestCid), java.lang.Long.valueOf($bestD2) });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  /** Column API. `books`: array<struct<cid int, cq array<bigint>>> —
    * typically `typedlit(Seq[(Int, Seq[Long])])` sorted by cid. */
  def nearest_centroid(vec: Column, books: Column): Column =
    Shims.column(NearestCentroid(Shims.expression(vec), Shims.expression(books)))
}
