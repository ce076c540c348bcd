package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared guard for the run-log trend readers (the dedup calibration
  * log, the LSH-recall log, the retrieval self-recall log, and the
  * quality drift log). All four order runs by `run_id` AS A STRING
  * (window `lag`/streaks over `orderBy("run_id")`), so the documented
  * contract is that ids must sort lexicographically in chronological
  * order — ISO dates (`2026-08-16`) or zero-padded counters
  * (`run_0042`). A team feeding bare counters (`r2`, `r10`) gets
  * string order `r10 < r2`: every delta silently compares against the
  * wrong previous run, and `max(run_id)` serves a stale "latest".
  *
  * This guard makes the contract ENFORCED rather than documented: the
  * readers reject a log whose ids sort differently under string order
  * vs numeric-aware (natural) order, naming the offending ids. Cost:
  * one collect of the distinct run_id set — the logs grow with runs ×
  * contract dimension, never data size, so the set is tiny by the
  * same design that makes the logs safe to read at all. */
private[graft] object RunLog {

  /** Split into maximal digit / non-digit runs: "run_0042" →
    * [("run_", alpha), ("0042", digit)]. */
  private def tokens(s: String): Vector[(Boolean, String)] = {
    val out = Vector.newBuilder[(Boolean, String)]
    var i = 0
    while (i < s.length) {
      val digit = s.charAt(i).isDigit
      val start = i
      while (i < s.length && s.charAt(i).isDigit == digit) i += 1
      out += ((digit, s.substring(start, i)))
    }
    out.result()
  }

  /** Numeric-aware order: digit runs compare as integers (any length —
    * BigInt, so a 20-digit epoch doesn't overflow), everything else as
    * strings; equal-value ties (e.g. "01" vs "1") fall back to plain
    * string order so the relation stays total and antisymmetric. */
  private def naturalLt(a: String, b: String): Boolean = {
    val ta = tokens(a); val tb = tokens(b)
    var i = 0
    while (i < ta.length && i < tb.length) {
      val (da, va) = ta(i); val (db, vb) = tb(i)
      val c =
        if (da && db) BigInt(va).compare(BigInt(vb))
        else va.compareTo(vb)
      if (c != 0) return c < 0
      i += 1
    }
    if (ta.length != tb.length) ta.length < tb.length else a < b
  }

  /** Reject a run log whose distinct `run_id`s the string order and
    * the natural order disagree on — the 'r10'-before-'r2' failure
    * mode. Logs whose ids are consistent under both orders (ISO
    * dates, zero-padded counters, or any all-same-width scheme) pass
    * untouched. */
  def requireChronological(log: DataFrame): Unit = {
    val ids = log.select(col("run_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val str = ids.sorted
    val nat = ids.sortWith(naturalLt)
    str.zip(nat).find { case (s, n) => s != n }.foreach { case (s, n) =>
      throw new IllegalArgumentException(
        s"run_id values violate the chronological-ordering contract: string order" +
          s" ranks '$s' where numeric-aware order ranks '$n', so trend deltas would" +
          " compare against the wrong previous run. Use ISO dates (2026-08-16) or" +
          " zero-padded counters (run_0042) as run ids.")
    }
  }
}
