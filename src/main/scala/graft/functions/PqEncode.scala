package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization encoder: `pq_encode(vec, books, m)` →
  * the `m` nearest-codeword ids of `vec`'s subvectors against a flat
  * m-major codebook literal (`books[((mi*ksub)+j)*dsub + t]` is
  * component `t` of codeword `j` of subspace `mi`).
  *
  * One fused pass per row — m·ksub·dsub multiply-adds with no
  * allocation. The HOF formulation (transform over a literal
  * codebook-of-structs with a zip_with+aggregate L2 per codeword)
  * re-applies an interpreted lambda per component: measured 5×+
  * slower at encode time, and encode is in the per-row hot path of
  * both index build and Lloyd training. Ties break toward the lowest
  * codeword id; a vector/books shape mismatch yields null (never a
  * silent truncation). */
case class PqEncodeCodes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float>, array<float>, int), got " +
        s"${first.dataType}, ${second.dataType}, ${third.dataType}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, b: Any, mAny: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val m = mAny.asInstanceOf[Int]
    val dims = vec.numElements()
    if (m <= 0 || dims == 0 || dims % m != 0) return null
    val dsub = dims / m
    if (books.numElements() == 0 || books.numElements() % (m * dsub) != 0) return null
    val ksub = books.numElements() / (m * dsub)
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < ksub) {
        var d = 0.0
        var t = 0
        val vOff = mi * dsub
        val bOff = (mi * ksub + j) * dsub
        while (t < dsub) {
          val diff = vec.getFloat(vOff + t).toDouble - books.getFloat(bOff + t).toDouble
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mi) = best
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, m) => {
      val dims = ctx.freshName("dims")
      val dsub = ctx.freshName("dsub")
      val ksub = ctx.freshName("ksub")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val vOff = ctx.freshName("vOff")
      val bOff = ctx.freshName("bOff")
      s"""
         |int $dims = $v.numElements();
         |if ($m <= 0 || $dims == 0 || $dims % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $dsub = $dims / $m;
         |  if ($b.numElements() == 0 || $b.numElements() % ($m * $dsub) != 0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    int $ksub = $b.numElements() / ($m * $dsub);
         |    int[] $codes = new int[$m];
         |    for (int $mi = 0; $mi < $m; $mi++) {
         |      int $best = 0;
         |      double $bestD = Double.MAX_VALUE;
         |      for (int $j = 0; $j < $ksub; $j++) {
         |        double $d = 0.0;
         |        int $vOff = $mi * $dsub;
         |        int $bOff = ($mi * $ksub + $j) * $dsub;
         |        for (int $t = 0; $t < $dsub; $t++) {
         |          double $diff = (double) $v.getFloat($vOff + $t) - (double) $b.getFloat($bOff + $t);
         |          $d += $diff * $diff;
         |        }
         |        if ($d < $bestD) { $bestD = $d; $best = $j; }
         |      }
         |      $codes[$mi] = $best;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "pq_encode"
}
