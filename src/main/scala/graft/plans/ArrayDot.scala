package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims

/**
 * `array_dot(a, b)`: dot product of two numeric arrays as a native Catalyst
 * expression with whole-stage codegen.
 *
 * Why custom: the composable alternative —
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,v) -> acc+v)` — runs on
 * the interpreted higher-order-function path (one closure call per element,
 * boxed lambda variables). For similarity search over billions of vectors
 * the dot product IS the hot loop; this expression compiles to a tight
 * primitive `for` over the array words. Summation is sequential
 * left-to-right, bit-identical to the fold it replaces.
 *
 * Accepts float or double element types (floats are widened per element,
 * matching `CAST(embedding AS DOUBLE[])` semantics), or two bigint arrays —
 * the fixed-point-quantizer path (q57/q58/q68) — in which case the result
 * is an exact integer dot (caller guarantees no overflow; quantized
 * coordinates are ~2^21 so 64-dim dots stay under 2^48).
 */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def bothLong: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if ((elemOk(left.dataType) && elemOk(right.dataType)) || bothLong)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"array_dot requires array<float|double> (or both array<bigint>) inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = if (bothLong) LongType else DoubleType
  // null result on length mismatch / null element, like zip_with+aggregate
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Mismatched lengths or a null element yield NULL — exactly what
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0D, (acc,v)->acc+v)` does
    * (zip_with pads the shorter side with nulls; null products poison the
    * sum). Silent truncation would make ragged inputs silently wrong. */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    if (bothLong) {
      var acc = 0L
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
      acc
    } else {
      val af = isFloat(left); val bf = isFloat(right)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val (accTy, getA, getB) =
        if (bothLong) ("long", s"$a.getLong($i)", s"$b.getLong($i)")
        else ("double",
          if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)",
          if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  $accTy $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_dot"
}

object ArrayDot {
  /** Column API: dot product. */
  def array_dot(a: Column, b: Column): Column =
    Shims.column(ArrayDot(Shims.expression(a), Shims.expression(b)))

  /** Column API: cosine similarity built from three dots (one codegen'd
    * pass each; numerically identical to the fold-based formulation). */
  def array_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    array_dot(a, b) / (sqrt(array_dot(a, a)) * sqrt(array_dot(b, b)))
  }

  /** Register `array_dot` for SQL on an already-built session (equivalent
    * to configuring [[GraftExtensions]] at session build time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Shims.registerFunction(spark, "array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)))
}

/**
 * Session extension registering graft's native functions for SQL use:
 * `spark.sql("SELECT array_dot(a, b) ...")`.
 *
 * Wire up with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
 * `.withExtensions(new GraftExtensions)`.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (children: Seq[Expression]) => ArrayDot(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
      (children: Seq[Expression]) => NearestCentroid(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("ws_token_count"),
      new ExpressionInfo(classOf[WsTokenCount].getName, "ws_token_count"),
      (children: Seq[Expression]) => WsTokenCount(children.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash_grams"),
      new ExpressionInfo(classOf[RollingHashGrams].getName, "rolling_hash_grams"),
      (children: Seq[Expression]) => RollingHashGrams(children.head)))
    // the text kernels (TextKernels.scala): literal int params resolve at
    // registration — a non-literal there is a caller bug, failed loudly
    def litInt(e: Expression): Int = e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => sys.error(s"expected an integer literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("ws_tokens"),
      new ExpressionInfo(classOf[TextKernels.WsTokens].getName, "ws_tokens"),
      (children: Seq[Expression]) => TextKernels.WsTokens(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ws_grams"),
      new ExpressionInfo(classOf[TextKernels.WsGrams].getName, "ws_grams"),
      (children: Seq[Expression]) => TextKernels.WsGrams(children(0), litInt(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("ws_gram_md5_hex"),
      new ExpressionInfo(classOf[TextKernels.WsGramMd5Hex].getName, "ws_gram_md5_hex"),
      (children: Seq[Expression]) => TextKernels.WsGramMd5Hex(children(0), litInt(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("char_shingles"),
      new ExpressionInfo(classOf[TextKernels.CharShingles].getName, "char_shingles"),
      (children: Seq[Expression]) => TextKernels.CharShingles(children(0),
        if (children.size > 1) litInt(children(1)) else 5)))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[TextKernels.Md5Prefix60].getName, "md5_prefix60"),
      (children: Seq[Expression]) => TextKernels.Md5Prefix60(children.head)))
    // per-key top-k: rewrite row_number-window + rank filter into the
    // two-phase (map-side-pruned) TopKPerKey operator
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // band theta-joins -> bucketed equi-joins (opt-in via
    // spark.graft.rangeJoin.bucketWidth; see RewriteRangeJoin)
    ext.injectOptimizerRule(_ => RewriteRangeJoin)
  }
}
