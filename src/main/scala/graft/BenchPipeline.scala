package graft

import org.apache.spark.storage.StorageLevel
import graft.sources.MartSink

/** A/B timing for the shared-scan mart build: the six marts written
  * from six independent plans (each re-scanning the events parquet)
  * vs from one persisted enriched projection — the structure
  * `Pipeline.run` uses. Prints one JSON line. */
object BenchPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val out1 = java.nio.file.Files.createTempDirectory("bp_rescan").toString
    val out2 = java.nio.file.Files.createTempDirectory("bp_shared").toString
    operators.EventMarts.enriched(spark, sfDir).count() // warm scan path
    val rescan = time {
      // marts() without a persisted input: every mart's plan re-scans
      Pipeline.marts(spark, sfDir).foreach { case (n, df) =>
        MartSink.writeSnapshot(df, s"$out1/$n")
      }
    }
    val shared = time {
      val e = operators.EventMarts.enriched(spark, sfDir)
        .persist(StorageLevel.MEMORY_AND_DISK)
      try Pipeline.martsFrom(e).foreach { case (n, df) =>
        MartSink.writeSnapshot(df, s"$out2/$n")
      } finally { e.unpersist(); () }
    }
    println(f"""{"rescan_sec":$rescan%.2f,"shared_scan_sec":$shared%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
