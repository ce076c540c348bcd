package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query cost breakdown (optimization-round instrument): with the
  * UI disabled in this sandbox, this is the "where does the time go"
  * tool of the optimization guide §1 — run a named query k times in
  * one session and report, per run:
  *   - plan_sec: analysis+optimization+physical planning (forced via
  *     queryExecution.executedPlan before the action)
  *   - exec_sec: the noop-sink write
  *   - jobs / stages / tasks: scheduler-side counts from a listener
  *     (every AQE re-optimization round spawns extra jobs — a high
  *     job count on tiny data is pure orchestration overhead; at
  *     100 TB the same count means extra passes/shuffles)
  *   - per-job wall: the slowest jobs named by their first stage.
  * One JSON line per run; iteration aid only (never a record).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPEAT", "2").toInt
    val spark = GraftSession.builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench so first-run numbers are comparable
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).groupBy("event_type").count()
      .write.format("noop").mode("overwrite").save()

    val jobStart = mutable.Map.empty[Int, Long]
    val jobWall = mutable.Map.empty[Int, Double]
    val jobStages = mutable.Map.empty[Int, Int]
    var stages = 0
    var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
        jobStart(e.jobId) = e.time
        jobStages(e.jobId) = e.stageInfos.size
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        jobWall(e.jobId) = (e.time - jobStart.getOrElse(e.jobId, e.time)) / 1e3
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        stages += 1; tasks += e.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (name <- args; i <- 1 to repeat) {
      listener.synchronized { jobStart.clear(); jobWall.clear(); jobStages.clear(); stages = 0; tasks = 0 }
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // force planning
      val t1 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases
        .map { case (p, s) => f""""$p":${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f""" }
        .mkString(",")
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(200) // let listener events drain (no public waitUntilEmpty)
      val (js, ss, ts, top) = listener.synchronized {
        val top = jobWall.toSeq.sortBy(-_._2).take(8)
          .map { case (id, w) => f""""j$id":$w%.3f""" }.mkString(",")
        (jobWall.size, stages, tasks, top)
      }
      println(f"""{"query":"$name","run":$i,"plan_sec":${(t1 - t0) / 1e9}%.3f,""" +
        f""""exec_sec":${(t2 - t1) / 1e9}%.3f,"jobs":$js,"stages":$ss,"tasks":$ts,""" +
        f""""phases":{$phases},"top_jobs":{$top}}""")
      System.out.flush()
    }
    spark.stop()
  }
}
