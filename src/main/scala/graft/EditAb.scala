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
    // warm scans + codegen once per dir
    Seq(small, big, deep).foreach { d =>
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
