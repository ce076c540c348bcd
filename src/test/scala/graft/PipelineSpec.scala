package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{EventSource, MartSink}

class SourcesSpec extends SparkSpec {
  test("jsonl round-trip preserves the event schema and corrupt lines are isolated") {
    val dir = Files.createTempDirectory("graft_jsonl").toFile
    val f = new java.io.File(dir, "events.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"event_id":1,"ts":"2024-01-01T10:00:00","user_id":7,"event_type":"view","value":1.0,"props":"{}"}""")
    w.println("""{"event_id":2,"ts":"2024-01-01T10:01:00","user_id":7,"event_type":"purchase","value":9.5,"props":"{\"k\":3}"}""")
    w.println("""this is not json""")
    w.close()
    // Spark disallows querying only the corrupt-record column straight
    // off a raw file scan — cache the parsed batch first
    val df = EventSource.jsonl(spark, f.getAbsolutePath).cache()
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    val purchase = df.filter(col("event_type") === "purchase").collect().head
    assert(purchase.getAs[Double]("value") == 9.5)
  }

  test("dynamic partition overwrite only replaces recomputed dates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_mart").toString
    val day1 = Seq((1L, "2024-01-01", 5L), (2L, "2024-01-02", 7L))
      .toDF("user_id", "event_date", "n")
    MartSink.writePartitioned(day1, out, Seq("event_date"))
    // rewrite ONLY day 2 with a new value; day 1 must survive
    val day2 = Seq((2L, "2024-01-02", 99L)).toDF("user_id", "event_date", "n")
    MartSink.writePartitioned(day2, out, Seq("event_date"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    assert(back.filter(col("event_date") === "2024-01-01").collect().head.getAs[Long]("n") == 5L)
    assert(back.filter(col("event_date") === "2024-01-02").collect().head.getAs[Long]("n") == 99L)
  }
}

class EventGeneratorSpec extends SparkSpec {
  import graft.sources.EventGenerator

  test("generator is deterministic, schema-complete, and funnel-weighted") {
    val a = EventGenerator.events(spark, 5000).collect()
    val b = EventGenerator.events(spark, 5000).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.length == 5000)
    val types = a.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length).toMap
    assert(types("view") > types("purchase")) // funnel-heavy mix
    assert(a.forall(r => r.getAs[Double]("value") > 0))
    // purchases carry a product id in props
    assert(a.filter(_.getAs[String]("event_type") == "purchase")
      .forall(_.getAs[String]("props").contains("\"k\"")))
  }

  test("generated jsonl round-trips through EventSource with zero corrupt rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gen").toString
    EventGenerator.writeJsonl(spark, dir, n = 500, partitions = 2)
    val back = EventSource.jsonl(spark, dir).cache()
    assert(back.count() == 500)
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0)
  }
}

class PipelineSpec extends SparkSpec {
  test("pipeline validates, gates, and writes idempotent marts") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val r1 = Pipeline.run(spark, Sf, out)
    assert(r1.martsWritten.nonEmpty == r1.passed || !r1.passed)
    if (r1.passed) {
      val userMart = spark.read.parquet(s"$out/mart_user_daily")
      assert(userMart.count() ==
        operators.EventMarts.martUserDaily(spark, Sf).count())
      // second run is idempotent (same rows, not doubled)
      val r2 = Pipeline.run(spark, Sf, out)
      assert(r2.passed)
      assert(spark.read.parquet(s"$out/mart_user_daily").count() == userMart.count())
    }
  }
}
