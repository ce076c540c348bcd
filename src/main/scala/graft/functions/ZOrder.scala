package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** `quantile_bucket(x double, boundaries array<double>) -> int`: the
  * number of boundaries ≤ x, by binary search over the (strictly
  * increasing, foldable) boundary array — i.e. the index of x's
  * quantile bucket in [0, boundaries.length].
  *
  * This is the per-column half of a Z-order key: boundaries come from
  * one `approxQuantile` sampling pass, so buckets are equi-DEPTH, not
  * equi-width — a skewed column (power-law user activity, log-scale
  * revenue) still spreads across all 2^bits codes where a fixed-width
  * `width_bucket` would collapse it into a few. The array is bound as
  * a codegen reference object: the search is branch-free
  * `Arrays.binarySearch` against one shared double[], not a 2^bits-way
  * CASE tree in the generated code. NaN sorts above every boundary
  * (top bucket), matching Spark's double ordering. */
case class QuantileBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val bs: Array[Double] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double argument, got ${child.dataType}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(x: Any): Any = {
    val idx = java.util.Arrays.binarySearch(bs, x.asInstanceOf[Double])
    if (idx >= 0) idx + 1 else -idx - 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("quantileBounds", bs, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = java.util.Arrays.binarySearch($b, $x);
         |${ev.value} = ($idx >= 0) ? $idx + 1 : -$idx - 1;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantile_bucket"
}

/** `spread_bits(bucket int; stride, offset, bits) -> bigint`: clamps
  * `bucket` to [0, 2^bits) and spreads its bits so that bit `i` lands
  * at position `i*stride + offset` — the per-column half of a Morton
  * (Z-order) interleave. The full key for columns c₀..cₙ₋₁ is
  * `spread(b₀, n, 0) | spread(b₁, n, 1) | … | spread(bₙ₋₁, n, n-1)`
  * via plain codegen'd BitwiseOr, so no N-ary expression is needed
  * and each column's bucket subtree is evaluated exactly once. */
case class SpreadBits(child: Expression, stride: Int, offset: Int, bits: Int)
    extends UnaryExpression {

  require(stride >= 1 && offset >= 0 && offset < stride && bits >= 1 &&
    (bits - 1).toLong * stride + offset < 63,
    s"spread_bits(stride=$stride, offset=$offset, bits=$bits) exceeds a long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an int argument, got ${child.dataType}")

  override def dataType: DataType = LongType

  private def maxBucket: Long = (1L << bits) - 1

  override def nullSafeEval(x: Any): Any = {
    val raw = x.asInstanceOf[Int].toLong
    val c = if (raw < 0L) 0L else if (raw > maxBucket) maxBucket else raw
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((c >> i) & 1L) << (i * stride + offset)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val c = ctx.freshName("c")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $c = (long) $x;
         |$c = ($c < 0L) ? 0L : (($c > ${maxBucket}L) ? ${maxBucket}L : $c);
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($c >> $i) & 1L) << ($i * $stride + $offset);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "spread_bits"
}
