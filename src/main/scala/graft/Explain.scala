package graft

/** Plan-audit main: prints `.explain("formatted")` for the named
  * queries (or all) at the given sf dir — used to verify the scale
  * invariants (SURVEY.md §4): PushedFilters reach the parquet scan,
  * dim joins broadcast, one shuffle per aggregate, wide
  * WholeStageCodegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder(master = "local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
