package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The ONE exact/approx percentile switch shared by every latency /
  * threshold rollup (conversion_latency, funnel_step_latency,
  * shipping_latency, rfm thresholds): exact `percentile` is the
  * group-buffering sort-based aggregate (oracle anchor); approx is
  * Greenwald-Khanna `approx_percentile` at a FIXED accuracy — the
  * q ± 0.01 rank band every `*_approx` spec asserts assumes this
  * constant, so it lives in exactly one place.
  */
private[graft] object Pct {

  /** GK sketch accuracy (rank error 1e-4 — far inside the specs'
    * q ± 0.01 acceptance band). */
  val GkAccuracy = 10000

  /** @param castDouble approx_percentile returns the INPUT type
    *   (bigint latencies stay bigint) while exact percentile returns
    *   double — cast to align, except for array-quantile calls whose
    *   input is already double (a cast on the array would fail). */
  def col(valueExpr: String, qExpr: String, approx: Boolean,
          castDouble: Boolean = true): Column = {
    val c =
      if (approx) expr(s"approx_percentile($valueExpr, $qExpr, $GkAccuracy)")
      else expr(s"percentile($valueExpr, $qExpr)")
    if (approx && castDouble) c.cast("double") else c
  }
}
