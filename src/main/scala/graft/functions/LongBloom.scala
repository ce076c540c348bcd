package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Flat long[] Bloom filter over 64-bit keys — the map-side shuffle
  * diet for generate-heavy equi-joins (PassJoin's probe side emits
  * ~300 substring rows per doc; most match NO indexed segment
  * anywhere, yet each used to ride the full exchange + join just to
  * miss a hash lookup). Build the filter over the BUILD side's join
  * hashes (one distributed treeAggregate — per-partition bitsets
  * OR-merged on the driver), then kill probe rows before the
  * exchange with [[BloomContainsLong]]. NO false negatives by
  * construction — a pruned row provably matches nothing, so
  * candidate recall (and the final-row parity with the SQL oracle)
  * is untouched; false positives only ride the join and lose there.
  *
  * Keys are assumed pre-mixed (xxhash64 here), so probe position 0
  * uses the key itself; the k-1 extra probes use Kirsch-Mitzenmacher
  * double hashing with a murmur3-finalized step. Insert and lookup
  * share ONE helper ([[contains]] / [[insert]]) so build and eval
  * arithmetic cannot drift. */
object LongBloom {

  /** Murmur3 64-bit finalizer — the double-hash step. */
  @inline def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  @inline private def pos(bits: Array[Long], h: Long): Long =
    (h & Long.MaxValue) % (bits.length.toLong * 64L)

  def insert(bits: Array[Long], numHash: Int, x: Long): Unit = {
    val h2 = mix(x) | 1L
    var i = 0
    var h = x
    while (i < numHash) {
      val p = pos(bits, h)
      bits((p >>> 6).toInt) |= (1L << p) // java shift is mod 64
      h += h2
      i += 1
    }
  }

  def contains(bits: Array[Long], numHash: Int, x: Long): Boolean = {
    val h2 = mix(x) | 1L
    var i = 0
    var h = x
    while (i < numHash) {
      val p = pos(bits, h)
      if ((bits((p >>> 6).toInt) & (1L << p)) == 0L) return false
      h += h2
      i += 1
    }
    true
  }

  /** Optimal-ish sizing for `nKeys` at `fpp`, word-rounded and capped
    * (the cap bounds driver/task-binary weight at extreme scale — an
    * over-full filter degrades to a higher fpp, never to a false
    * negative). */
  def sized(nKeys: Long, fpp: Double, maxBytes: Long = 64L << 20): (Array[Long], Int) = {
    require(nKeys > 0 && fpp > 0 && fpp < 1, s"bad bloom params: $nKeys/$fpp")
    val ln2 = math.log(2)
    val mBits = math.min(maxBytes * 8L,
      math.max(64L, math.ceil(-nKeys * math.log(fpp) / (ln2 * ln2)).toLong))
    val k = math.max(1, math.round(mBits.toDouble / nKeys * ln2).toInt)
    (new Array[Long](((mBits + 63) / 64).toInt), math.min(k, 16))
  }

  /** Distributed build over one LONG column: per-partition local
    * bitsets, OR-merged up a tree — the corpus never collects, only
    * |bits| crosses the wire per partition. */
  def build(df: DataFrame, column: String, nKeys: Long,
            fpp: Double = 0.01): (Array[Long], Int) = {
    val (zero, k) = sized(nKeys, fpp)
    val bits = df.select(column).na.drop()
      .rdd.map(_.getLong(0))
      .treeAggregate(zero)(
        (arr, x) => { insert(arr, k, x); arr },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    (bits, k)
  }
}

/** `BloomContainsLong` — boolean membership probe against a
  * driver-built [[LongBloom]], as a codegen'd native expression (the
  * filter sits in the probe side's generate pipeline, inside
  * whole-stage codegen, upstream of the exchange). The bit array
  * rides the expression as a plain field: task-binary broadcast
  * ships it once per stage, `toString` stays sane (arrays print as
  * refs), and eval/codegen both call the SHARED [[LongBloom]] helper
  * so the lookup arithmetic is the build arithmetic. */
case class BloomContainsLong(child: Expression, bits: Array[Long],
    numHash: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects bigint, got $t")
  }
  override def dataType: DataType = BooleanType

  protected override def nullSafeEval(input: Any): Any =
    LongBloom.contains(bits, numHash, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LongBloom.contains($bitsRef, $numHash, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bloom_contains_long"
}
