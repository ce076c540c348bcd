package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_spans(text) -> array<struct<start:int, end:int, hash:bigint>>`:
  * content-defined chunk spans of a document via a gear rolling hash —
  * the FastCDC idea (Xia et al., USENIX ATC'16) re-expressed as one
  * native codegen'd pass per document.
  *
  * Why content-defined and not fixed windows: `doc_chunks`' fixed
  * token windows are positional — inserting ONE token near the front
  * of a re-crawled document shifts every later window, so no chunk of
  * the old and new revision matches and chunk-grain dedup finds
  * nothing. A gear-hash boundary depends only on the trailing ≤64
  * characters of content (`h = (h << 1) + gear[c]` sheds any
  * contribution after 64 shifts), so boundaries RE-SYNCHRONIZE within
  * one chunk of an edit and every chunk past it hashes identically —
  * which is what makes chunk-level dedup robust on 100 TB of
  * re-crawls, boilerplate and near-revisions.
  *
  * Cut rule (per position i, chunk length len = i - last):
  * a position is a CANDIDATE iff `(h & mask) == 0` (mask has
  * `AvgBits` low bits → candidates every ~2^AvgBits chars of
  * content); the cut is the first candidate with len ≥ MinLen, or a
  * forced cut at len = MaxLen. The rolling hash never resets, so
  * candidacy is purely content-local; only the min/max clamps depend
  * on the previous cut (and re-converge with it). The tail span
  * always flushes, so spans TILE the document exactly: concatenating
  * `[start, end)` reproduces the text byte-for-byte.
  *
  * `hash` is FNV-1a 64 over the span's chars — chunk identity for the
  * dedup census without materializing chunk strings through a shuffle
  * (the clean_dup_spans lesson: ship 8-byte hashes, not text).
  *
  * The gear table is 256 splitmix64 values from a FIXED seed —
  * deterministic across JVMs, sessions and engines, so chunk
  * boundaries are stable artifacts (re-chunking an unchanged doc in a
  * later ingest yields identical spans, which is what makes the
  * census incremental). Chars index the table by `char & 0xFF`;
  * non-Latin scripts still chunk (the low byte of a code unit is
  * content), just with a coarser alphabet.
  *
  * Defaults MinLen=32 / AvgBits=6 / MaxLen=256 target ~96-char
  * expected chunks — passage-scale for the documents corpus, small
  * enough that a duplicated paragraph spans several chunks (interior
  * chunks match even when the copy's edges differ). */
case class CdcChunkSpans(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("end", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunkSpans.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = CdcChunkSpans.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_spans"
}

object CdcChunkSpans {
  val MinLen = 32
  val AvgBits = 6
  val MaxLen = 256
  private val Mask = (1L << AvgBits) - 1L

  /** splitmix64 — the standard public-domain mixer (Steele et al.,
    * "Fast splittable pseudorandom number generators", OOPSLA'14). */
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Fixed gear table — seed 42, one splitmix64 draw per byte value. */
  private val Gear: Array[Long] = Array.tabulate(256)(i => splitmix64(42L + i))

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fnv(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h ^= s.charAt(i); h *= FnvPrime; i += 1 }
    h
  }

  def compute(text: UTF8String): ArrayData = {
    val s = if (text == null) "" else text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    val spans = new java.util.ArrayList[AnyRef]()
    var last = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(s.charAt(i) & 0xFF)
      val len = i - last + 1
      if ((len >= MinLen && (h & Mask) == 0L) || len >= MaxLen) {
        spans.add(InternalRow(last, i + 1, fnv(s, last, i + 1)))
        last = i + 1
      }
      i += 1
    }
    if (last < n) spans.add(InternalRow(last, n, fnv(s, last, n)))
    new GenericArrayData(spans.toArray)
  }
}
