package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-engine libm parity probe (r14) — the measurement behind the
  * decision to oracle the log-domain queries (text_entropy,
  * text_perplexity[_bigram], ppl_threshold_curve) as full SQL.
  *
  * The repo's "libm rule" says a result carrying LOG2/POWER cannot be
  * exact-hash-compared against DuckDB because the two engines' libm
  * implementations may differ at the ulp. That rule was adopted on
  * principle, not measurement. This probe measures it: it evaluates
  * Spark's LOG2/LN/POWER over the exact input populations those
  * queries feed them —
  *   - small integers (entropy run counts, token counts),
  *   - add-one-smoothed vocabulary ratios (k+1)/(N+V) (perplexity
  *     log-probs),
  *   - bits-per-token magnitudes (the POWER(2, bpt) back-transform) —
  * and writes (x, spark_log2(x), spark_ln(x), spark_pow2(x)) parquet
  * for `scripts/libm_probe.py` to diff bit-for-bit against DuckDB's
  * log2/ln/power on the same x. Zero mismatches over the full input
  * population = the oracle can hash raw doubles; any mismatch = the
  * affected query keeps the 1e7-quantization guard on that term. */
object LibmProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_libm_probe")
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // population 1: integers 1..2^20 (log2 of run counts / n_words)
    val ints = spark.range(1L, 1048577L)
      .select(col("id").cast("double").as("x"))
    // population 2: smoothed vocab ratios across plausible corpus
    // sizes — (k+1)/(N+V) for k in 0..99999 at three denominators
    // bracketing sf0.001..sf10 vocab+token scales
    val ratios = spark.range(0L, 100000L)
      .crossJoin(spark.createDataFrame(Seq(
        Tuple1(131071.0), Tuple1(4194301.0), Tuple1(268435399.0)))
        .toDF("denom"))
      .select(((col("id") + 1).cast("double") / col("denom")).as("x"))
    // population 3: bits-per-token magnitudes for POWER(2, x) — a
    // dense grid over [0, 24) at irrational-ish offsets
    val bpts = spark.range(0L, 240000L)
      .select((col("id").cast("double") / 10000.0 + 0.000037).as("x"))

    Seq(("ints", ints), ("ratios", ratios), ("bpts", bpts)).foreach {
      case (name, df) =>
        df.select(col("x"),
            log2(col("x")).as("s_log2"),
            log(col("x")).as("s_ln"),
            pow(lit(2.0), col("x")).as("s_pow2"))
          .write.mode("overwrite").parquet(s"$out/$name")
        println(s"[libm] wrote $out/$name")
    }
    spark.stop()
  }
}
