package graft

import org.apache.spark.sql.functions._

/** Same-session A/B harness for the PassJoin candidate-join diet
  * (SURVEY §7u #2): times `dedup_edit_distance` variants back-to-back
  * in ONE JVM at each decade dir, so strategy comparisons aren't
  * polluted by cold-JVM / page-cache variance between separate runs.
  * Usage: `runMain graft.EditAb [sf1Dir] [sf10Dir] [--variants=a,b]`
  * — dirs default to the ScaleProbe replica dirs (must exist). */
object EditAb {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val small = "/root/testdata/sf0.1"
    val big = pos.headOption.getOrElse("/tmp/graft_sf1")
    val deep = pos.lift(1).getOrElse("/tmp/graft_sf10")
    val variants = args.find(_.startsWith("--variants="))
      .map(_.stripPrefix("--variants=").split(",").toSeq)
      .getOrElse(Seq("", "shuffle_hash"))
    val reps = args.find(_.startsWith("--reps="))
      .map(_.stripPrefix("--reps=").toInt).getOrElse(2)
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String): Double = {
      val t0 = System.nanoTime()
      operators.Dedup.editDistancePairs(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm scans + codegen once per dir (replica dirs may not exist
    // in a fresh session — diagnostics modes run on what's there)
    Seq(small, big, deep).distinct
      .filter(d => new java.io.File(s"$d/documents.parquet").exists)
      .foreach { d =>
        Tables.documents(spark, d).groupBy("lang").count()
          .write.format("noop").mode("overwrite").save()
      }
    // --stages: time the sub-plans of the PassJoin pipeline at the
    // deep dir to localize the third-decade constant
    if (args.contains("--stages")) {
      val d = operators.Dedup
      def stage(name: String, f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        println(s"""{"stage":"$name","rows":$rows,"sec":${f"${(System.nanoTime() - t0) / 1e9}%.3f"}}""")
        System.out.flush()
      }
      val docs = Tables.documents(spark, deep)
      val parts = d.editDistanceParts(docs)
      stage("idx", parts.idx.count())
      stage("probe", parts.probe.count())
      stage("probe_bloomed", parts.probeSide.count())
      stage("cand", parts.cand.count())
      stage("full", parts.result.count())
      spark.stop()
      return
    }
    // --shape [dir via positional]: one-off volume diagnostics for the
    // candidate-join diet — duplicate structure of the probe side
    // (how many rows share a (doc_r, i, wp, hsub) join key) and the
    // join's PRE-distinct output volume, the two numbers that decide
    // whether per-key sigma-set aggregation can pay
    if (args.contains("--shape")) {
      val d = operators.Dedup
      for (dir <- Seq(small) ++ (if (new java.io.File(big).exists) Seq(big) else Nil)) {
        val parts = d.editDistanceParts(Tables.documents(spark, dir))
        val probeN = parts.probe.count()
        val probeKeys = parts.probe
          .select("doc_r", "pi", "wp", "hsub").distinct().count()
        val idxN = parts.idx.count()
        // pre-distinct join output (same condition as cand, no dedup)
        val preDistinct = parts.idx.join(parts.probe,
          col("i") === col("pi") && col("w_s") === col("wp") &&
          col("hseg") === col("hsub") &&
          (col("len_s") < col("len_r") ||
            (col("len_s") === col("len_r") && col("doc_s") < col("doc_r"))) &&
          col("len_r") - col("len_s") <= 16 &&
          abs(col("sigma") - (col("i") * col("w_s") + lit(1))) <= col("i") &&
          abs(col("sigma") - (col("i") * col("w_s") + lit(1)) -
            (col("len_r") - col("len_s"))) <= lit(16) - col("i")).count()
        val cand = parts.cand.count()
        println(s"""{"dir":"$dir","idx":$idxN,"probe":$probeN,""" +
          s""""probe_keys":$probeKeys,"join_pre_distinct":$preDistinct,""" +
          s""""cand":$cand}""")
        System.out.flush()
        // cost anatomy: count() prunes hsub (substring+hash never run),
        // so time (a) the pruned count, (b) hsub forced, (c) the join
        // with the probe pre-materialized — isolating generation vs
        // hashing vs join proper
        def t(f: => Any): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val tCount = (1 to 2).map(_ => t(parts.probe.count())).min
        val tHsub = (1 to 2).map(_ =>
          t(parts.probe.agg(expr("bit_xor(hsub)")).collect())).min
        val tIdxH = (1 to 2).map(_ =>
          t(parts.idx.agg(expr("bit_xor(hseg)")).collect())).min
        val probeCk = parts.probe.localCheckpoint()
        val idxCk = parts.idx.localCheckpoint()
        val joined = idxCk.hint("shuffle_hash").join(probeCk,
          col("i") === col("pi") && col("w_s") === col("wp") &&
          col("hseg") === col("hsub") &&
          (col("len_s") < col("len_r") ||
            (col("len_s") === col("len_r") && col("doc_s") < col("doc_r"))) &&
          col("len_r") - col("len_s") <= 16 &&
          abs(col("sigma") - (col("i") * col("w_s") + lit(1))) <= col("i") &&
          abs(col("sigma") - (col("i") * col("w_s") + lit(1)) -
            (col("len_r") - col("len_s"))) <= lit(16) - col("i"))
          .select(least(col("doc_s"), col("doc_r")).as("doc_a"),
            greatest(col("doc_s"), col("doc_r")).as("doc_b"))
          .distinct()
        val tJoin = (1 to 2).map(_ => t(joined.count())).min
        println(f"""{"dir":"$dir","probe_count_sec":$tCount%.3f,""" +
          f""""probe_hsub_sec":$tHsub%.3f,"idx_hseg_sec":$tIdxH%.3f,""" +
          f""""join_on_checkpointed_sec":$tJoin%.3f}""")
        System.out.flush()
      }
      spark.stop()
      return
    }
    // --bloom-floor-ab: arm-vs-skip the probe bloom at the small dir
    // (r13: the 20k-doc arming floor was tuned when probe hashing
    // cost ~1.5 s; the rolling-hash diet moved the economics)
    if (args.contains("--bloom-floor-ab")) {
      run(small) // warm
      // interleaved k=3 per arm (ABBA order) so neither side rides a
      // warmer JVM; restore the SAVED prior floor, not a constant —
      // the shipped default has already been retuned once (20k→2k)
      // and a stale hardcoded restore would silently undo that for
      // any code that runs after the probe
      val prevFloor = operators.Dedup.candBloomMinDocs
      for (floor <- Seq(20000L, 0L, 0L, 20000L)) {
        operators.Dedup.candBloomMinDocs = floor
        val t = try (1 to 3).map(_ => run(small)).min
                finally operators.Dedup.candBloomMinDocs = prevFloor
        println(f"""{"dir":"$small","bloom_floor":$floor,"sec":$t%.3f}""")
        System.out.flush()
      }
      spark.stop()
      return
    }
    val parts = args.find(_.startsWith("--parts="))
      .map(_.stripPrefix("--parts=").split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(32))
    val dirs = if (args.contains("--deep-only")) Seq(deep) else Seq(small, big, deep)
    val fpps = args.find(_.startsWith("--fpps="))
      .map(_.stripPrefix("--fpps=").split(",").toSeq.map(_.toDouble))
      .getOrElse(Seq(operators.Dedup.candBloomFpp))
    run(small)
    for (dir <- dirs; v <- variants; p <- parts; fpp <- fpps) {
      operators.Dedup.candJoinHint = v
      operators.Dedup.candBloomFpp = fpp
      spark.conf.set("spark.sql.shuffle.partitions", p)
      val t = try (1 to reps).map(_ => run(dir)).min
              finally spark.conf.set("spark.sql.shuffle.partitions", 32)
      println(s"""{"dir":"$dir","variant":"${if (v.isEmpty) "smj" else v}","parts":$p,"fpp":$fpp,"sec":${f"$t%.3f"}}""")
      System.out.flush()
    }
  }
}
