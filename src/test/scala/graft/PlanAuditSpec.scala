package graft

import org.apache.spark.sql.DataFrame
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

  /** Queries whose CONSTRUCTION runs real Spark jobs (localCheckpoint
    * propagation rounds, k-means collect loops), so the DataFrame they
    * return is only the post-checkpoint/post-training tail — auditing
    * it would skip the expensive candidate-generation/probe subtrees.
    * Those subtrees are audited directly below instead. */
  private val AuditedViaSubplans = Set("dedup_near_corpus", "ann_ivf_kmeans")

  private def offendersIn(name: String, df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val cartesian = plan.collect { case c: CartesianProductExec => c }
    val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
    (if (cartesian.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
      (if (bnlj.nonEmpty && !IntendedBnlj(name)) Seq(s"$name: BroadcastNestedLoopJoin") else Nil)
  }

  test("no query plans a cartesian product; nested-loop joins only where intended") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => AuditedViaSubplans(name) }
      .flatMap { case (name, fn) => offendersIn(name, fn(spark, Sf)) }
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }

  test("underlying plans of job-running queries hold the same invariants") {
    // dedup_near_corpus: candidate generation is minhashLsh; each
    // propagation round is an equi-join of the checkpointed edge list
    // against labels (same shape every round) — audit the generator.
    // ann_ivf_kmeans: the probe plan is ivfTopKWith over literal
    // centroids (training only varies the literals) — audit the probe.
    val fakeCents = (0 until 4).map(i => i -> Array.fill(64)(i.toFloat + 0.5f))
    val offenders =
      offendersIn("dedup_near_corpus[minhashLsh]",
        operators.Dedup.minhashLsh(spark, Sf)) ++
      offendersIn("ann_ivf_kmeans[ivfTopKWith]",
        operators.Similarity.ivfTopKWith(spark, Sf, fakeCents, numQueries = 10, k = 5, nProbe = 2))
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }
}
