package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `trigram_hashes(string) -> array<bigint>`: sorted distinct 64-bit
  * hashes of the 3-gram token shingles of a document (falling back to
  * the distinct tokens themselves when there are fewer than three).
  *
  * Replaces the higher-order-function chain
  * `array_sort(array_distinct(transform(shingles(text), xxhash64)))`,
  * which materializes every trigram as a string (split → sequence →
  * concat_ws per position → two distinct passes). Here each token is
  * hashed once and trigram identity is a mix of three token hashes —
  * injective per distinct trigram up to 64-bit collisions, so set
  * cardinalities (and hence Jaccard) are unchanged while never
  * allocating a shingle string.
  *
  * Tokenization matches `split(trim(text), '\s+')` (Java regex
  * semantics: split on whitespace runs after trimming spaces). */
case class TrigramShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TrigramShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = TrigramShingleHashes.getClass.getName // graft.functions.TrigramShingleHashes$
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "trigram_hashes"
}

/** `codepoint_hist16(string) -> array<int>`: 16-bin histogram of
  * code points mod 16 in one pass — the fused form of 16 ×
  * size(filter(chars, …)), which walked the split-char array once per
  * bin. */
case class CodepointHist16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CodepointHist16.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = CodepointHist16.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "codepoint_hist16"
}

object CodepointHist16 {
  def compute(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val counts = new Array[Int](16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts(cp % 16) += 1
      i += Character.charCount(cp)
    }
    new GenericArrayData(counts)
  }
}

/** `trigram_strings(string) -> array<string>`: the word 3-gram
  * shingle STRINGS of a document in order, with multiplicity; empty
  * below three words. The materialized-string sibling of
  * [[TrigramShingleHashes]] for census-style queries whose OUTPUT is
  * the gram text (e.g. the corpus top-k n-gram census, where hashes
  * can count but cannot name).
  *
  * Replaces `transform(sequence(…), i -> concat_ws(' ',
  * element_at(w, i), …))` over a captured split array: interpreted
  * higher-order evaluation has no common-subexpression elimination,
  * so each element_at re-ran the full regex split — O(words²) splits
  * per document. One tokenizer pass here.
  *
  * Tokenization matches `split(trim(text), '\s+')` (same quirks as
  * [[TrigramShingleHashes.compute]]). */
case class TrigramStrings(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TrigramStrings.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = TrigramStrings.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "trigram_strings"
}

object TrigramStrings {
  import TrigramShingleHashes.foreachToken

  def compute(text: UTF8String): GenericArrayData = {
    val s = if (text == null) "" else text.toString
    val toks = new java.util.ArrayList[String]()
    foreachToken(s)((from, until) => toks.add(s.substring(from, until)))
    val n = toks.size
    if (n < 3) new GenericArrayData(new Array[AnyRef](0))
    else {
      val out = new Array[AnyRef](n - 2)
      var j = 0
      while (j < n - 2) {
        out(j) = UTF8String.fromString(
          toks.get(j) + " " + toks.get(j + 1) + " " + toks.get(j + 2))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `word_rep_stats(string) -> array<int>`: per-document word
  * repetition statistics in ONE tokenizer pass —
  * `[n_words, top_word_count, bigram_total, bigram_distinct,
  *   trigram_total, trigram_distinct]`.
  *
  * Replaces the higher-order-function stack the repetition signals
  * first shipped with (sort_array + run-length `aggregate` for the
  * mode, two transform/concat_ws gram builds + array_distinct), whose
  * interpreted per-element lambdas re-split the text per output column
  * — ~50× slower per document than this fused pass.
  *
  * Exactness: the mode is counted by token STRING equality (hash-free)
  * and n-gram identity is the packed tuple of per-document token ids
  * (21 bits each), so distinct counts are exact — not
  * collision-probabilistic — up to 2^21 distinct tokens per document
  * (a multi-megabyte single doc; corpora at that grain are length-
  * filtered long before this operator).
  *
  * Tokenization matches `split(trim(text), '\s+')` exactly, including
  * the leading-empty-token and empty-string quirks (see
  * [[TrigramShingleHashes.compute]]). */
case class WordRepStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordRepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = WordRepStats.getClass.getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.MODULE$$.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_rep_stats"
}

object WordRepStats {
  import TrigramShingleHashes.foreachToken

  def compute(text: UTF8String): GenericArrayData = {
    val s = if (text == null) "" else text.toString
    val ids = new java.util.ArrayList[Integer]()
    val idOf = new java.util.HashMap[String, Integer]()
    val counts = new java.util.ArrayList[Integer]()
    foreachToken(s) { (from, until) =>
      val tok = s.substring(from, until)
      var id = idOf.get(tok)
      if (id == null) { id = Integer.valueOf(idOf.size); idOf.put(tok, id); counts.add(0) }
      counts.set(id, counts.get(id) + 1)
      ids.add(id)
      ()
    }
    val n = ids.size
    var top = 0
    var c = 0
    while (c < counts.size) { if (counts.get(c) > top) top = counts.get(c); c += 1 }
    def distinctGrams(g: Int): Int =
      if (n < g) 0
      else {
        val arr = new Array[Long](n - g + 1)
        var j = 0
        while (j <= n - g) {
          var key = 0L
          var t = 0
          while (t < g) { key = (key << 21) | ids.get(j + t).longValue(); t += 1 }
          arr(j) = key
          j += 1
        }
        java.util.Arrays.sort(arr)
        var d = 0
        var r = 0
        while (r < arr.length) { if (r == 0 || arr(r) != arr(r - 1)) d += 1; r += 1 }
        d
      }
    new GenericArrayData(Array(
      n, top, math.max(n - 1, 0), distinctGrams(2), math.max(n - 2, 0), distinctGrams(3)))
  }
}

object TrigramShingleHashes {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** Java-regex `\s` = [ \t\n\x0B\f\r] — the documented `split('\s+')`
    * tokenizer contract and what the DuckDB oracle's regex matches.
    * Deliberately NOT Character.isWhitespace, which also matches
    * U+001C-1F, U+2028/2029, U+3000 etc. and would give non-ASCII
    * corpora different shingle sets than the oracle. */
  private[functions] def isTokenSep(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** FNV-1a 64 over the chars of s[from, until). */
  private def hashToken(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Murmur3-style finalizer mix of three token hashes. */
  private def mix(a: Long, b: Long, c: Long): Long = {
    var h = a
    h = h * 31 + b
    h = h * 31 + c
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** THE tokenizer: applies `f(from, until)` to each token boundary of
    * `s`, replicating `split(trim(s), '\s+')` exactly — space-only
    * trim, a leading EMPTY token when the trimmed string begins with a
    * non-space separator (Java split() semantics), and a single empty
    * token for the empty/all-space string. The one definition shared
    * by every native expression in this family (hashes, strings,
    * repetition stats), so the load-bearing oracle-parity contract
    * cannot drift between the implementations. */
  private[functions] def foreachToken(s: String)(f: (Int, Int) => Unit): Unit = {
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    var emitted = false
    if (start < end && isTokenSep(s.charAt(start))) { f(0, 0); emitted = true }
    var i = start
    var tokStart = -1
    while (i <= end) {
      val isWs = i == end || isTokenSep(s.charAt(i))
      if (!isWs && tokStart < 0) tokStart = i
      else if (isWs && tokStart >= 0) {
        f(tokStart, i)
        emitted = true
        tokStart = -1
      }
      i += 1
    }
    if (!emitted) f(0, 0) // "" token, like split('')
  }

  def compute(text: UTF8String): GenericArrayData = {
    val s = if (text == null) "" else text.toString
    val hashes = new java.util.ArrayList[Long]()
    foreachToken(s)((from, until) => hashes.add(hashToken(s, from, until)))
    val n = hashes.size
    val out =
      if (n >= 3) {
        val arr = new Array[Long](n - 2)
        var j = 0
        while (j < n - 2) {
          arr(j) = mix(hashes.get(j), hashes.get(j + 1), hashes.get(j + 2))
          j += 1
        }
        arr
      } else {
        val arr = new Array[Long](n)
        var j = 0
        while (j < n) { arr(j) = hashes.get(j); j += 1 }
        arr
      }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }
}
