package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native IVF cell assignment: `nearest_cells(emb, flat_cents,
  * cell_ids, probes)` → the `probes` nearest cell ids by cosine,
  * ordered exactly like the HOF form it replaces
  * (ascending (−cosine, cell id), Spark's nan-safe double order).
  *
  * Why native: the HOF formulation (transform over a literal
  * centroid-struct array + array_sort + slice) allocates nlist scored
  * structs AND sorts all of them PER ROW — exactly right at two-digit
  * nlist, but the r13 --ann-deep probe measured it at 53 s quantizer /
  * 51 s graph for (200k rows, nlist = 1000) on the honest
  * growing-cluster axis, where assignment is the whole cost. Here the
  * centroid matrix is bound once (flat cell-major float[], direct
  * access — not per-row ArrayData), per-cell norms are precomputed,
  * and top-probes is a probes-pass argmin with zero allocation:
  * O(nlist·(dim + probes)) per row, nothing sorted, nothing boxed.
  *
  * Exactness: the cosine is CosineSimilarity's arithmetic verbatim
  * (float→double accumulation order, zero-norm → 0.0 not NaN,
  * `dot / (sqrt(na)·sqrt(nb))` shape), so assignments are
  * BIT-IDENTICAL to the HOF path — the parity spec asserts it,
  * including ties (equal scores break to the smaller cell id, the
  * array_sort struct order) and NaN components (nan-safe comparator:
  * NaN sorts last, matching Spark's double ordering). A
  * dimensionality mismatch yields null, CosineSimilarity's
  * mismatch-is-corruption convention. */
case class NearestCells(child: Expression, flat: Array[Float],
    cells: Array[Int], probes: Int) extends UnaryExpression {
  require(cells.nonEmpty, "nearest_cells needs at least one centroid")
  require(flat.length % cells.length == 0,
    s"flat centroid matrix (${flat.length}) not divisible by ${cells.length} cells")
  require(probes >= 1, s"probes must be >= 1, got $probes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // per-cell squared norms, accumulated in CosineSimilarity's order
  @transient private lazy val cellNorms: Array[Double] =
    NearestCells.norms(flat, cells.length)

  override def nullSafeEval(input: Any): Any =
    NearestCells.compute(input.asInstanceOf[ArrayData], flat, cells,
      cellNorms, probes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centFlat", flat, "float[]")
    val cellsRef = ctx.addReferenceObj("cellIds", cells, "int[]")
    val normsRef = ctx.addReferenceObj("cellNorms", cellNorms, "double[]")
    val obj = NearestCells.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = $obj.MODULE$$.compute($c, $flatRef, $cellsRef, $normsRef, $probes);
      |if (${ev.value} == null) ${ev.isNull} = true;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

object NearestCells {
  private[graft] def norms(flat: Array[Float], nCells: Int): Array[Double] = {
    val dim = flat.length / nCells
    val out = new Array[Double](nCells)
    var j = 0
    while (j < nCells) {
      var nb = 0.0
      var t = 0
      val off = j * dim
      while (t < dim) {
        val y = flat(off + t).toDouble
        nb += y * y
        t += 1
      }
      out(j) = nb
      j += 1
    }
    out
  }

  /** Spark's nan-safe double comparison (NaN largest, -0.0 == 0.0) —
    * the ordering array_sort applied to the scored structs. */
  private def nanSafeLt(x: Double, y: Double): Boolean =
    if (x < y) true
    else if (x > y) false
    else if (x == y) false
    else !x.isNaN // x NaN → never less; y NaN (x not) → less

  def compute(a: ArrayData, flat: Array[Float], cells: Array[Int],
              norms: Array[Double], probes: Int): GenericArrayData = {
    val nCells = cells.length
    val dim = flat.length / nCells
    if (a.numElements() != dim) return null
    // query norm once (same accumulation order as CosineSimilarity)
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = a.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    val sqrtNa = math.sqrt(na)
    val neg = new Array[Double](nCells)
    var j = 0
    while (j < nCells) {
      var dot = 0.0
      var t = 0
      val off = j * dim
      while (t < dim) {
        dot += a.getFloat(t).toDouble * flat(off + t).toDouble
        t += 1
      }
      neg(j) = if (na == 0.0 || norms(j) == 0.0) -0.0
        else -(dot / (sqrtNa * math.sqrt(norms(j))))
      j += 1
    }
    val k = math.min(probes, nCells)
    val out = new Array[Int](k)
    val taken = new Array[Boolean](nCells)
    var p = 0
    while (p < k) {
      var best = -1
      var r = 0
      while (r < nCells) {
        if (!taken(r) && (best < 0 ||
            nanSafeLt(neg(r), neg(best)) ||
            (!nanSafeLt(neg(best), neg(r)) && cells(r) < cells(best))))
          best = r
        r += 1
      }
      taken(best) = true
      out(p) = cells(best)
      p += 1
    }
    new GenericArrayData(out)
  }
}
