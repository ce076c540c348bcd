package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup family's hot loops.
  *
  * The composable higher-order-function forms (transform/aggregate/
  * zip_with) are semantically fine but allocate an intermediate array
  * per lambda application and — worse — inline shared subtrees, so a
  * 64-permutation MinHash signature written as 64 × array_min(
  * transform(hashed, …)) re-hashes every shingle 64 times. At corpus
  * scale these loops ARE the workload; each expression below is one
  * fused, allocation-free pass with whole-stage codegen.
  */
private object HashExprConsts {
  val Prime: Long = 2147483647L // 2^31 - 1
  val NumPerms = 64
  /** Deterministic permutation parameters (seeded, fixed at build time).
    * Same seed/shape as the documented MinHash scheme in
    * graft.operators.Dedup. */
  val (permA: Array[Long], permB: Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue - 1).toLong + 1)
    val b = Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  def requireLongArray(e: Expression, name: String): TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$name expects array<bigint>, got $t")
  }
}

/** `minhash_sig(array<bigint>) -> array<bigint>`: 64-permutation
  * MinHash signature over pre-hashed shingles (e.g.
  * `transform(shingles, s -> xxhash64(s))`). Each input element is
  * normalized into [0, P) and run through the 64 affine permutations
  * in one loop — each shingle hash is read exactly once. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  import HashExprConsts._

  override def checkInputDataTypes(): TypeCheckResult = requireLongArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(NumPerms)(Prime)
    var i = 0
    while (i < n) {
      val h = ((arr.getLong(i) % Prime) + Prime) % Prime
      var p = 0
      while (p < NumPerms) {
        val v = (h * permA(p) + permB(p)) % Prime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val h = ctx.freshName("h")
      val v = ctx.freshName("v"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $c.numElements();
         |long[] $sig = new long[${NumPerms}];
         |java.util.Arrays.fill($sig, ${Prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = (($c.getLong($i) % ${Prime}L) + ${Prime}L) % ${Prime}L;
         |  for (int $p = 0; $p < ${NumPerms}; $p++) {
         |    long $v = ($h * $aRef[$p] + $bRef[$p]) % ${Prime}L;
         |    if ($v < $sig[$p]) $sig[$p] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** `simhash64(array<bigint>) -> bigint`: 64-bit SimHash over token
  * hashes — bit b of the result is the majority vote of bit b across
  * the inputs. One pass, a 64-int counter array, no allocations per
  * element. */
case class SimHash64(child: Expression) extends UnaryExpression {
  import HashExprConsts._

  override def checkInputDataTypes(): TypeCheckResult = requireLongArray(child, prettyName)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > n) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) $counts[$b] += (int) (($h >>> $b) & 1L);
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] * 2 > $n) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `sorted_intersect_count(array<bigint>, array<bigint>) -> int`:
  * size of the intersection of two SORTED DISTINCT long arrays via a
  * single merge pass — no per-pair hash-set build, which is what makes
  * `array_intersect` the bottleneck of an n-gram Jaccard verifier
  * (millions of candidate pairs × a set build each). Caller contract:
  * both inputs sorted ascending with distinct elements
  * (`array_sort(array_distinct(...))`). */
/** `pca_moments(array<float>) -> array<double>`: the per-row PCA
  * moment vector `[x_0 … x_{D-1}, x_0x_0, x_0x_1 … x_{D-1}x_{D-1}]`
  * (first moments, then the upper triangle of the outer product in
  * row-major order) — length D(D+3)/2. One fused pass; the HOF
  * formulation (flatten(transform(sequence…))) built ~D²/2 interpreted
  * struct allocations per row and dominated the covariance stage. */
case class PcaMoments(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PcaMoments.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = PcaMoments.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pca_moments"
}

object PcaMoments {
  def compute(emb: ArrayData): GenericArrayData = {
    val d = emb.numElements()
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Double](d + d * (d + 1) / 2)
    System.arraycopy(x, 0, out, 0, d)
    var idx = d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) { out(idx) = x(i) * x(j); idx += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `sig_agree(array<bigint>, array<bigint>) -> int`: number of
  * positions where two MinHash signatures carry the same value — the
  * signature-agreement count whose ratio over the permutation count
  * estimates Jaccard. Replaces the per-candidate-pair HOF stack
  * `size(filter(zip_with(a, b, …), …))`, which evaluates an
  * interpreted lambda per position per pair — on the banded-bucket
  * hot path that interpretation dominated the whole stage. */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression {
  import HashExprConsts._

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = requireLongArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l else requireLongArray(right, prettyName)
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(u: Any, v: Any): Any = {
    val a = u.asInstanceOf[ArrayData]; val b = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) ${ev.value}++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sig_agree"
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  import HashExprConsts._

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = requireLongArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l else requireLongArray(right, prettyName)
  }
  override def dataType: DataType = IntegerType

  override def nullSafeEval(u: Any, v: Any): Any = {
    val a = u.asInstanceOf[ArrayData]; val b = v.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |${ev.value} = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_intersect_count"
}

/** `hyperplane_bands(array<float>) -> array<bigint>`: per-table
  * random-hyperplane LSH bucket ids (index = table, value = the sign
  * bits of that table's plane projections), fused into ONE pass over
  * the vector that feeds all tables × planes accumulators. The
  * higher-order-function chain walked the embedding once per plane —
  * 36 array traversals with a lambda application per element, per row.
  * Plane matrices are seeded and memoized per dimension; the
  * accumulation order matches the HOF `aggregate` fold exactly, so
  * bucket assignments are bit-identical to the composable form. */
case class HyperplaneBands(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<float>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = HyperplaneBands.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bands"
}

object HyperplaneBands {
  val NumTables = 6
  val PlanesPerTable = 6
  val Seed = 1234

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()

  /** Flattened [table×plane][dim] Gaussian matrix; generation order
    * (Random(seed), table-major then plane) matches the historical
    * `Array.fill(NumTables, PlanesPerTable)(Array.fill(dim)(nextGaussian))`. */
  def matrixFor(dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent(dim, d => {
      val rnd = new scala.util.Random(Seed)
      Array.fill(NumTables * PlanesPerTable)(Array.fill(d)(rnd.nextGaussian()))
    })

  def compute(arr: ArrayData): GenericArrayData = {
    val dim = arr.numElements()
    val m = matrixFor(dim)
    val acc = new Array[Double](NumTables * PlanesPerTable)
    var d = 0
    while (d < dim) {
      val x = arr.getFloat(d).toDouble
      var k = 0
      while (k < acc.length) { acc(k) += x * m(k)(d); k += 1 }
      d += 1
    }
    val out = new Array[Long](NumTables)
    var t = 0
    while (t < NumTables) {
      var b = 0L
      var p = 0
      while (p < PlanesPerTable) {
        if (acc(t * PlanesPerTable + p) > 0) b |= (1L << p)
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Idempotent registration of every graft native function on a session
  * (covers sessions not built with GraftExtensions, e.g. the driver's). */
object GraftFunctions {
  private def unary(name: String, f: Expression => Expression) =
    (name, { children: Seq[Expression] =>
      require(children.length == 1, s"$name expects 1 argument"); f(children.head)
    })
  private def binary(name: String, f: (Expression, Expression) => Expression) =
    (name, { children: Seq[Expression] =>
      require(children.length == 2, s"$name expects 2 arguments"); f(children.head, children(1))
    })

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    binary(CosineSimilarity.fnName, CosineSimilarity(_, _)),
    unary("minhash_sig", MinHashSignature(_)),
    unary("simhash64", SimHash64(_)),
    unary("trigram_hashes", TrigramShingleHashes(_)),
    unary("trigram_strings", TrigramStrings(_)),
    unary("word_rep_stats", WordRepStats(_)),
    unary("codepoint_hist16", CodepointHist16(_)),
    unary("cdc_spans", CdcChunkSpans(_)),
    unary("hyperplane_bands", HyperplaneBands(_)),
    binary("sorted_intersect_count", SortedIntersectCount(_, _)),
    binary("sig_agree", SignatureAgreement(_, _)),
    unary("pca_moments", PcaMoments(_)),
    unary("vec_sum", VecSumAgg(_)),
    ("pq_encode", { children: Seq[Expression] =>
      require(children.length == 3, "pq_encode expects (vec, books, m)")
      PqEncodeCodes(children(0), children(1), children(2))
    }),
    ("freq_items_sketch", { children: Seq[Expression] =>
      require(children.length == 2, "freq_items_sketch expects (item, k)")
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"freq_items_sketch k must be an integer literal, got $other")
      }
      FreqItemsSketch(children.head, k)
    }),
    ("quantile_bucket", { children: Seq[Expression] =>
      require(children.length == 2, "quantile_bucket expects (x, boundaries)")
      require(children(1).foldable, "quantile_bucket boundaries must be foldable")
      val bs = children(1).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toDoubleArray().toSeq
        case other => throw new IllegalArgumentException(
          s"quantile_bucket boundaries must be array<double>, got $other")
      }
      QuantileBucket(children.head, bs)
    }),
    ("nearest_cells", { children: Seq[Expression] =>
      require(children.length == 4,
        "nearest_cells expects (emb, flat_cents, cell_ids, probes)")
      require(children(1).foldable && children(2).foldable,
        "nearest_cells centroid matrix and cell ids must be foldable")
      val flat = children(1).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toFloatArray()
        case other => throw new IllegalArgumentException(
          s"nearest_cells flat_cents must be array<float>, got $other")
      }
      val cells = children(2).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toIntArray()
        case other => throw new IllegalArgumentException(
          s"nearest_cells cell_ids must be array<int>, got $other")
      }
      val probes = children(3) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"nearest_cells probes must be an integer literal, got $other")
      }
      NearestCells(children.head, flat, cells, probes)
    }),
    ("pass_join_segments", { children: Seq[Expression] =>
      require(children.length == 2, "pass_join_segments expects (text, maxD)")
      val d = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"pass_join_segments maxD must be an integer literal, got $other")
      }
      PassJoinSegmentHashes(children.head, d)
    }),
    ("pass_join_probe", { children: Seq[Expression] =>
      require(children.length == 2, "pass_join_probe expects (text, maxD)")
      val d = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"pass_join_probe maxD must be an integer literal, got $other")
      }
      PassJoinProbeHashes(children.head, d)
    }),
    ("bloom_contains_long", { children: Seq[Expression] =>
      require(children.length == 3, "bloom_contains_long expects (bits, k, hash)")
      require(children(0).foldable, "bloom_contains_long bits must be foldable")
      val bits = children(0).eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray()
        case other => throw new IllegalArgumentException(
          s"bloom_contains_long bits must be array<bigint>, got $other")
      }
      val k = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"bloom_contains_long k must be an integer literal, got $other")
      }
      BloomContainsLong(children(2), bits, k)
    }),
    ("spread_bits", { children: Seq[Expression] =>
      require(children.length == 4, "spread_bits expects (bucket, stride, offset, bits)")
      def intLit(e: Expression, what: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(i: Int, IntegerType) => i
        case other => throw new IllegalArgumentException(
          s"spread_bits $what must be an integer literal, got $other")
      }
      SpreadBits(children.head, intLit(children(1), "stride"),
        intLit(children(2), "offset"), intLit(children(3), "bits"))
    }))

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!registry.functionExists(id))
        registry.registerFunction(id, new ExpressionInfo(getClass.getName, name), builder)
    }
  }
}
