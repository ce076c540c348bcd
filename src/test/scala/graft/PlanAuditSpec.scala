package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Fleet-wide plan lint: every registered query is PLANNED (not
  * executed) and checked against the scale invariants that individual
  * specs can't guard once the query count grows. A regression that
  * sneaks a cartesian product or an unintended nested-loop join into
  * any operator fails here by name. */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose broadcast nested-loop join is the intended plan:
    * brute-force scoring joins every candidate against the whole
    * broadcast query set by design. */
  private val IntendedBnlj = Set("ann_cosine_topk")

  test("no query plans a cartesian product; nested-loop joins only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, Sf).queryExecution.executedPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      val bad =
        (if (cartesian.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (bnlj.nonEmpty && !IntendedBnlj(name)) Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
      bad
    }
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }
}
