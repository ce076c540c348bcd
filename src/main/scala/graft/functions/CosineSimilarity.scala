package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two
  * `array<float>` embedding columns in one fused loop.
  *
  * The composable path (graft.functions.VectorFunctions.cosine) walks
  * the arrays three times through higher-order functions; this
  * expression is the hot-path variant — a single pass, whole-stage
  * codegen'd (doGenCode below), no lambda-function call overhead per
  * element. At 100 TB-scale ANN this loop IS the workload, which is
  * why it merits a custom Expression rather than a UDF (a Scala UDF
  * would deserialize every array element out of Tungsten).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  /** Nullable beyond the children: a dimensionality mismatch yields
    * null (a silent min-length truncation would hide a corrupt
    * embedding column). A zero-norm side yields 0.0, not 0/0 = NaN —
    * Spark orders NaN as the LARGEST double, so one all-zero embedding
    * would otherwise rank first in every top-k. */
  override def nullable: Boolean = true

  override def nullSafeEval(u: Any, v: Any): Any = {
    val a = u.asInstanceOf[ArrayData]
    val b = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSimilarity {
  val fnName = "cosine_sim"

  private val info = new ExpressionInfo(classOf[CosineSimilarity].getName, fnName)

  private val builder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, s"$fnName expects 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  /** Idempotently register `cosine_sim` on an existing session (for
    * sessions not built with GraftExtensions, e.g. the driver's). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(fnName)
    if (!registry.functionExists(id)) registry.registerFunction(id, info, builder)
  }
}

/** Session extension wiring: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions.type].getName, name),
        builder))
    }
  }
}
