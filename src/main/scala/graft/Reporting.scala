package graft

import java.util.Locale
import org.apache.spark.sql.Row

/** Driver-side alert and report assembly over tiny collected
  * aggregates.
  *
  * Reference: scripts/slack_alert.py:78-204 (Block Kit payload shapes
  * for quality / success / failure alerts) and
  * scripts/llm_daily_report.py:424-538 with the deterministic no-LLM
  * fallback at :194-207 (the report is assembled from the five mart
  * extracts regardless; the LLM only paraphrases it).
  *
  * Pure formatting by design: no transport, no webhook URLs, no
  * network — emitting a payload is the caller's concern. These run on
  * the driver over ≤ tens of rows (the aggregates themselves are the
  * distributed part), so there is nothing to scale here.
  */
object Reporting {

  final case class CheckResult(checkName: String, checkType: String,
      totalRecords: Long, failedRecords: Long, passRate: Double, status: String)

  /** Adapt collected `Quality.summary` rows. */
  def checkResults(rows: Seq[Row]): Seq[CheckResult] = rows.map { r =>
    CheckResult(r.getAs[String]("check_name"), r.getAs[String]("check_type"),
      r.getAs[Long]("total_records"), r.getAs[Long]("failed_records"),
      r.getAs[Double]("pass_rate"), r.getAs[String]("status"))
  }

  // ---- minimal JSON assembly (payloads are flat Block Kit shapes;
  // ---- a full JSON library would be the only dependency it buys) ----

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def headerBlock(text: String) =
    s"""{"type":"header","text":{"type":"plain_text","text":"${esc(text)}"}}"""
  private def mrkdwn(text: String) = s"""{"type":"mrkdwn","text":"${esc(text)}"}"""
  private def fieldsBlock(fields: Seq[String]) =
    s"""{"type":"section","fields":[${fields.map(mrkdwn).mkString(",")}]}"""
  private def textBlock(text: String) = s"""{"type":"section","text":${mrkdwn(text)}}"""
  private def payload(blocks: Seq[String]) = s"""{"blocks":[${blocks.mkString(",")}]}"""

  private def num(l: Long) = String.format(Locale.US, "%,d", Long.box(l))
  private def money(d: Double) = String.format(Locale.US, "%,.0f", Double.box(d))
  private def pct1(d: Double) = String.format(Locale.US, "%.1f%%", Double.box(d))
  private def pct2(d: Double) = String.format(Locale.US, "%.2f%%", Double.box(d))

  /** Quality-gate alert (slack_alert.send_quality_report shape):
    * header [PASS|FAIL] + passed/total fields + one detail line per
    * failed check. */
  def qualityAlertPayload(executionDate: String, checks: Seq[CheckResult]): String = {
    val passed = checks.count(_.status == "PASS")
    val failed = checks.filter(_.status != "PASS")
    val statusText = if (failed.isEmpty) "PASS" else "FAIL"
    val base = Seq(
      headerBlock(s"[$statusText] quality checks ($executionDate)"),
      fieldsBlock(Seq(s"*result:* $passed/${checks.size} passed", s"*date:* $executionDate")))
    val detail =
      if (failed.isEmpty) Nil
      else Seq(textBlock("*failed:*\n" + failed.map(c =>
        s"- *${c.checkName}*: ${pct2(c.passRate)} " +
          s"(${num(c.failedRecords)} of ${num(c.totalRecords)} failed)").mkString("\n")))
    payload(base ++ detail)
  }

  /** Run-complete alert (slack_alert.send_pipeline_success shape). */
  def pipelineSuccessPayload(executionDate: String, totalEvents: Long,
      uniqueUsers: Long, qualityPassRate: String): String =
    payload(Seq(
      headerBlock(s"[SUCCESS] pipeline complete ($executionDate)"),
      fieldsBlock(Seq(
        s"*events:* ${num(totalEvents)}",
        s"*users:* ${num(uniqueUsers)}",
        s"*quality:* $qualityPassRate",
        s"*date:* $executionDate"))))

  /** Task-failure alert (slack_alert.send_pipeline_failure shape —
    * error text truncated to 500 chars, as the reference does). */
  def pipelineFailurePayload(jobId: String, taskId: String,
      executionDate: String, errorMessage: String): String =
    payload(Seq(
      headerBlock("[ALERT] pipeline failure"),
      fieldsBlock(Seq(s"*job:* $jobId", s"*task:* $taskId", s"*date:* $executionDate")),
      textBlock(s"*error:*\n```${errorMessage.take(500)}```")))

  /** Trending-change alert (the Slack-path shape for the decayed
    * top-N loop): header + entered/left/moved counts + one detail
    * line per change, in the order TrendingStream.topNChanges emits
    * them (entered by current rank, movers by current rank, departures
    * by previous rank). Callers fire this only when the top-N actually
    * changed — `TrendingStream.trendingAlert` returns None otherwise. */
  def trendingAlertPayload(asOf: String,
      n: Int, changes: Seq[graft.streaming.TrendingStream.TrendChange]): String = {
    val entered = changes.count(_.change == "entered")
    val left = changes.count(_.change == "left")
    val moved = changes.size - entered - left
    def score(d: Double) = String.format(Locale.US, "%.2f", Double.box(d))
    val lines = changes.map { c =>
      c.change match {
        case "entered" => s"- *product ${c.product_k}*: entered at #${c.cur_rank} (score ${score(c.score_now)})"
        case "left"    => s"- *product ${c.product_k}*: left (was #${c.prev_rank}, score ${score(c.score_now)})"
        case dir       => s"- *product ${c.product_k}*: #${c.prev_rank} -> #${c.cur_rank} ($dir, score ${score(c.score_now)})"
      }
    }
    payload(Seq(
      headerBlock(s"[TRENDING] top-$n changes ($asOf)"),
      fieldsBlock(Seq(s"*entered:* $entered", s"*left:* $left",
        s"*moved:* $moved", s"*as of:* $asOf")),
      textBlock("*changes:*\n" + lines.mkString("\n"))))
  }

  // ---- daily report (deterministic no-LLM template) ----

  private def nullablePct(r: Row, field: String): String =
    if (r.isNullAt(r.fieldIndex(field))) "n/a" else pct1(r.getAs[Double](field))

  /** Assemble the daily business report from the five mart extracts
    * (reportUserSummary / martFunnelDaily / productTopN /
    * reportOrderSummary / reportPaymentDist rows for one date) —
    * sectioned exactly like llm_daily_report's formatted summary, with
    * the fallback's "data summary only" determinism. */
  /** @param contractDrift optional (column, check_type, change) rows
    *   from `Pipeline.Result.contractDrift` — the healthy-run
    *   re-suggest diff against the pinned contract. Nonempty appends a
    *   "[contract drift]" section (the pre-failure trend beside the
    *   business numbers: a bound drifting toward its contract edge
    *   reads here BEFORE the day it breaks the gate); empty omits the
    *   section entirely, keeping byte-parity for reports without a
    *   wired contract. */
  /** @param contractPromoted the new pinned contract fingerprint when
    *   the run's opt-in auto-promotion fired (`Result
    *   .contractPromoted`) — an operational event the report reader
    *   must SEE (the gate's reference just changed under them), so it
    *   leads the drift section when present. */
  /** @param driftStreaks (column, check_type, consecutive-run count)
    *   rows from `Quality.widenStreaksLatest` — drift VELOCITY: checks
    *   whose bound has now re-widened N healthy runs in a row per the
    *   persisted drift log. A single day's "widened" is routine; the
    *   same bound widening for a week is the approach-trend this
    *   section exists to surface. Empty omits the section (byte-parity
    *   for reports without a wired drift log). */
  def dailyReport(executionDate: String,
      userSummary: Option[Row], funnel: Seq[Row], topProducts: Seq[Row],
      orderSummary: Option[Row], payments: Seq[Row],
      contractDrift: Seq[(String, String, String)] = Nil,
      contractPromoted: Option[String] = None,
      driftStreaks: Seq[(String, String, String, Long)] = Nil): String = {
    val user = userSummary.map { r =>
      Seq(
        s"- active users: ${num(r.getAs[Long]("active_users"))}",
        s"- events: ${num(r.getAs[Long]("total_events"))}",
        s"- views: ${num(r.getAs[Long]("total_views"))}",
        s"- clicks: ${num(r.getAs[Long]("total_clicks"))}",
        s"- purchases: ${num(r.getAs[Long]("total_purchases"))}",
        s"- revenue: ${money(r.getAs[Double]("total_revenue"))}",
        s"- purchasing user-days: ${num(r.getAs[Long]("purchasing_user_days"))}"
      ).mkString("\n")
    }.getOrElse("no data")

    val funnelText =
      if (funnel.isEmpty) "no data"
      else funnel.map { r =>
        s"[segment ${r.getAs[Int]("segment")}] " +
          s"views ${num(r.getAs[Long]("step1_viewers"))} -> " +
          s"clicks ${num(r.getAs[Long]("step2_clickers"))} -> " +
          s"purchases ${num(r.getAs[Long]("step3_purchasers"))}\n" +
          s"  rates: view->click ${nullablePct(r, "view_to_click_rate")} | " +
          s"click->purchase ${nullablePct(r, "click_to_purchase_rate")} | " +
          s"overall ${nullablePct(r, "overall_conversion_rate")}"
      }.mkString("\n")

    val productsText =
      if (topProducts.isEmpty) "no data"
      else topProducts.zipWithIndex.map { case (r, i) =>
        s"${i + 1}. product ${r.getAs[Int]("product_k")} - " +
          s"revenue ${money(r.getAs[Double]("revenue"))} | " +
          s"purchases ${num(r.getAs[Long]("purchases"))} | " +
          s"clicks ${num(r.getAs[Long]("clicks"))}"
      }.mkString("\n")

    val ordersText = orderSummary.map { r =>
      val base = Seq(
        s"- orders: ${num(r.getAs[Long]("order_count"))}",
        s"- revenue: ${money(r.getAs[Double]("total_revenue"))}",
        s"- avg order value: ${money(r.getAs[Double]("avg_order_value"))}",
        s"- max order amount: ${money(r.getAs[Double]("max_order_amount"))}",
        s"- unique buyers: ${num(r.getAs[Long]("unique_buyers"))}",
        s"- payment methods: ${payments.size}")
      val dist =
        if (payments.isEmpty) Nil
        else "payment distribution:" +: payments.map { p =>
          s"  - ${p.getAs[String]("payment_method")}: " +
            s"${num(p.getAs[Long]("order_count"))} orders / ${money(p.getAs[Double]("total_amount"))}"
        }
      (base ++ dist).mkString("\n")
    }.getOrElse("no data")

    val promotedLine = contractPromoted.map(fp =>
      s"- CONTRACT AUTO-PROMOTED: pinned contract refreshed to " +
        s"${fp.take(12)}… this run (healthy-drift streak policy)\n").getOrElse("")
    val driftSection =
      if (contractDrift.isEmpty && contractPromoted.isEmpty) ""
      else "\n[contract drift]\n" + promotedLine + contractDrift.sorted.map {
        case (c, k, ch) => s"- $c ($k): $ch"
      }.mkString("\n") + "\n"
    // the streak counts ALL drifting change types (widened, shifted,
    // domain_grew, domain_changed — driftTrendFromLog's predicate), so
    // the line words the LATEST run's label and keeps the count
    // neutral: a domain-growth streak must not read "bound widening"
    val velocitySection =
      if (driftStreaks.isEmpty) ""
      else "\n[contract drift velocity]\n" + driftStreaks.sorted.map {
        case (c, k, ch, n) =>
          val what = ch match {
            case "widened" => "bound widened"
            case "shifted" => "bound shifted"
            case "domain_grew" => "domain grew"
            case "domain_changed" => "domain changed"
            case other => other
          }
          s"- $c ($k): $what; drifting $n consecutive healthy runs"
      }.mkString("\n") + "\n"

    s"""Daily report ($executionDate)
       |${"=" * 40}
       |
       |[user activity]
       |$user
       |
       |[conversion funnel by segment]
       |$funnelText
       |
       |[top products]
       |$productsText
       |
       |[orders]
       |$ordersText
       |""".stripMargin + driftSection + velocitySection
  }

  // ---- quality dashboard (terminal + HTML renderings of the check
  // ---- log trend; reference: scripts/quality_dashboard.py
  // ---- generate_terminal_report :108-188 and
  // ---- generate_html_dashboard :189-324) ----

  /** One dashboard row: a run date's check results plus that day's
    * traffic summary (events/purchases/revenue from the marts). */
  final case class DashboardDay(date: String, checks: Seq[CheckResult],
      totalEvents: Long, purchases: Long, revenue: Double)

  private def dayStatus(d: DashboardDay): String =
    if (d.checks.isEmpty) "N/A"
    else if (d.checks.forall(_.status == "PASS")) "PASS" else "FAIL"

  /** Per-check day-grain failure frequency across the period:
    * (checkName, failDays, totalDays, passRatePct). */
  private def checkFrequencies(days: Seq[DashboardDay]): Seq[(String, Int, Int, Double)] =
    days.flatMap(_.checks).groupBy(_.checkName).toSeq.sortBy(_._1).map {
      case (name, cs) =>
        val fails = cs.count(_.status != "PASS")
        (name, fails, cs.size, (cs.size - fails).toDouble / cs.size * 100)
    }

  /** Terminal dashboard: daily status table, period stats, per-check
    * failure frequency — the reference's report layout with the same
    * column set (date, status, passed, events, purchases, revenue). */
  def qualityDashboard(days: Seq[DashboardDay]): String = {
    if (days.isEmpty) return "[WARN] no report data"
    val sep = "=" * 70
    val sorted = days.sortBy(_.date)
    val passDays = sorted.count(dayStatus(_) == "PASS")
    val failDays = sorted.count(dayStatus(_) == "FAIL")
    val header = Seq(
      sep, "quality dashboard",
      s"period: ${sorted.head.date} ~ ${sorted.last.date}",
      s"${sorted.size} day(s) total", sep, "", "--- daily status ---",
      f"${"date"}%-12s ${"status"}%-6s ${"passed"}%-8s ${"events"}%10s ${"purch"}%6s ${"revenue"}%14s",
      "-" * 70)
    val daily = sorted.map { d =>
      f"${d.date}%-12s ${dayStatus(d)}%-6s ${d.checks.count(_.status == "PASS")}/${d.checks.size}%-5d " +
        f"${num(d.totalEvents)}%10s ${num(d.purchases)}%6s ${money(d.revenue)}%14s"
    }
    val stats = Seq("-" * 70, "", "--- period stats ---",
      s"  PASS days:     $passDays",
      s"  FAIL days:     $failDays",
      s"  availability:  ${pct1(passDays.toDouble / math.max(passDays + failDays, 1) * 100)}",
      s"  total events:  ${num(sorted.map(_.totalEvents).sum)}",
      s"  total revenue: ${money(sorted.map(_.revenue).sum)}")
    val checks = Seq("", "--- per-check failure frequency ---") ++
      checkFrequencies(sorted).map { case (name, fails, total, rate) =>
        f"  $name%-30s ${pct1(rate)}%6s ($fails failed / $total day(s))" +
          (if (fails > 0) "  <-- attention" else "")
      }
    (header ++ daily ++ stats ++ checks ++ Seq("", sep)).mkString("\n")
  }

  private def escHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** HTML dashboard: summary cards + the same two tables as the
    * terminal report (reference layout; self-contained inline CSS, no
    * external assets). */
  def qualityDashboardHtml(days: Seq[DashboardDay]): String = {
    val sorted = days.sortBy(_.date)
    val passDays = sorted.count(dayStatus(_) == "PASS")
    val failDays = sorted.count(dayStatus(_) == "FAIL")
    val avail = pct1(passDays.toDouble / math.max(passDays + failDays, 1) * 100)
    def card(label: String, value: String) =
      s"""<div class="card"><div class="v">$value</div><div class="l">$label</div></div>"""
    val dailyRows = sorted.map { d =>
      val st = dayStatus(d)
      s"""<tr><td>${escHtml(d.date)}</td><td class="${st.toLowerCase}">$st</td>""" +
        s"""<td>${d.checks.count(_.status == "PASS")}/${d.checks.size}</td>""" +
        s"""<td>${num(d.totalEvents)}</td><td>${num(d.purchases)}</td><td>${money(d.revenue)}</td></tr>"""
    }.mkString("\n")
    val checkRows = checkFrequencies(sorted).map { case (name, fails, total, rate) =>
      val cls = if (fails > 0) "fail" else "pass"
      s"""<tr><td>${escHtml(name)}</td><td>$total</td><td class="$cls">$fails</td><td>${pct1(rate)}</td></tr>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html lang="en">
       |<head><meta charset="utf-8"><title>quality dashboard</title>
       |<style>
       |  body { font-family: sans-serif; margin: 24px; }
       |  .summary { display: flex; gap: 16px; margin: 20px 0; }
       |  .card { border: 1px solid #ddd; border-radius: 6px; padding: 12px 20px; }
       |  .card .v { font-size: 1.6em; font-weight: bold; }
       |  table { border-collapse: collapse; margin: 12px 0; }
       |  td, th { border: 1px solid #ccc; padding: 4px 10px; text-align: right; }
       |  td:first-child, th:first-child { text-align: left; }
       |  .pass { color: #1a7f37; } .fail { color: #cf222e; }
       |</style></head>
       |<body>
       |<h1>quality dashboard</h1>
       |<div class="summary">
       |${card("days", sorted.size.toString)}
       |${card("pass days", passDays.toString)}
       |${card("fail days", failDays.toString)}
       |${card("availability", avail)}
       |</div>
       |<h2>daily status</h2>
       |<table>
       |<tr><th>date</th><th>status</th><th>passed</th><th>events</th><th>purchases</th><th>revenue</th></tr>
       |$dailyRows
       |</table>
       |<h2>per-check pass rates</h2>
       |<table>
       |<tr><th>check</th><th>days</th><th>fail days</th><th>pass rate</th></tr>
       |$checkRows
       |</table>
       |</body>
       |</html>""".stripMargin
  }

  // ----------------- quarantine (gate verdict) dashboard -----------------
  // The review-queue counterpart of the quality dashboard above: where
  // qualityDashboard renders the CHECK log (did the corpus pass?), the
  // gate dashboard renders the session VERDICT log (what got
  // quarantined, why, and how big is the review backlog) — the
  // observability surface for the WARN/quarantine branch. Input is the
  // day-grain rollup both gate surfaces already produce
  // (Sessionize.gateDayRollup / SessionGateStream.gateDailyFromLog),
  // so batch runs and the streaming verdict log render identically.

  /** One gate-dashboard row: a day's session/event quarantine census
    * plus per-reason session counts (reason name -> sessions flagged). */
  final case class GateDay(date: String, sessionsTotal: Long,
      sessionsQuarantined: Long, eventsTotal: Long, eventsQuarantined: Long,
      reasonSessions: Seq[(String, Long)])

  /** Adapt collected day-rollup rows (the `session_quality_gate` /
    * `gateDailyFromLog` schema) into dashboard days. */
  def gateDays(rows: Seq[Row]): Seq[GateDay] = rows.map { r =>
    GateDay(
      String.valueOf(r.getAs[java.sql.Date]("session_date")),
      r.getAs[Long]("sessions_total"), r.getAs[Long]("sessions_quarantined"),
      r.getAs[Long]("events_total"), r.getAs[Long]("events_quarantined"),
      Seq("range" -> r.getAs[Long]("q_range_sessions"),
        "timestamp" -> r.getAs[Long]("q_ts_sessions"),
        "integrity" -> r.getAs[Long]("q_integrity_sessions"),
        "duplicate" -> r.getAs[Long]("q_dup_sessions"),
        "sequence" -> r.getAs[Long]("q_seq_sessions")))
  }

  private def qRate(q: Long, total: Long): Double =
    q.toDouble / math.max(total, 1L) * 100

  /** Per-reason totals across the period: (reason, sessionsFlagged,
    * shareOfQuarantinedPct) sorted worst-first. A session may carry
    * several reasons, so shares can sum past 100%. */
  private def reasonTotals(days: Seq[GateDay]): Seq[(String, Long, Double)] = {
    val q = math.max(days.map(_.sessionsQuarantined).sum, 1L)
    days.flatMap(_.reasonSessions).groupBy(_._1).toSeq
      .map { case (name, xs) => (name, xs.map(_._2).sum) }
      .sortBy { case (name, n) => (-n, name) }
      .map { case (name, n) => (name, n, n.toDouble / q * 100) }
  }

  /** Terminal gate dashboard: daily quarantine table, period stats
    * (including the review-queue event backlog), per-reason breakdown. */
  def gateDashboard(days: Seq[GateDay]): String = {
    if (days.isEmpty) return "[WARN] no gate verdict data"
    val sep = "=" * 70
    val sorted = days.sortBy(_.date)
    val header = Seq(
      sep, "session quarantine dashboard",
      s"period: ${sorted.head.date} ~ ${sorted.last.date}",
      s"${sorted.size} day(s) total", sep, "", "--- daily quarantine ---",
      f"${"date"}%-12s ${"sessions"}%9s ${"quarant"}%8s ${"q-rate"}%7s ${"events"}%10s ${"review-q"}%9s",
      "-" * 70)
    val daily = sorted.map { d =>
      f"${d.date}%-12s ${num(d.sessionsTotal)}%9s ${num(d.sessionsQuarantined)}%8s " +
        f"${pct1(qRate(d.sessionsQuarantined, d.sessionsTotal))}%7s " +
        f"${num(d.eventsTotal)}%10s ${num(d.eventsQuarantined)}%9s"
    }
    val sTot = sorted.map(_.sessionsTotal).sum
    val sQ = sorted.map(_.sessionsQuarantined).sum
    val stats = Seq("-" * 70, "", "--- period stats ---",
      s"  sessions:        ${num(sTot)}",
      s"  quarantined:     ${num(sQ)}",
      s"  quarantine rate: ${pct1(qRate(sQ, sTot))}",
      s"  review queue:    ${num(sorted.map(_.eventsQuarantined).sum)} event(s)")
    val reasons = Seq("", "--- quarantine reasons (sessions flagged) ---") ++
      reasonTotals(sorted).map { case (name, n, share) =>
        f"  $name%-12s ${num(n)}%9s  ${pct1(share)}%6s of quarantined" +
          (if (n > 0) "  <-- review" else "")
      }
    (header ++ daily ++ stats ++ reasons ++ Seq("", sep)).mkString("\n")
  }

  /** HTML gate dashboard: summary cards + the same two tables as the
    * terminal form (self-contained inline CSS, no external assets). */
  def gateDashboardHtml(days: Seq[GateDay]): String = {
    val sorted = days.sortBy(_.date)
    val sTot = sorted.map(_.sessionsTotal).sum
    val sQ = sorted.map(_.sessionsQuarantined).sum
    def card(label: String, value: String) =
      s"""<div class="card"><div class="v">$value</div><div class="l">$label</div></div>"""
    val dailyRows = sorted.map { d =>
      val cls = if (d.sessionsQuarantined > 0) "fail" else "pass"
      s"""<tr><td>${escHtml(d.date)}</td><td>${num(d.sessionsTotal)}</td>""" +
        s"""<td class="$cls">${num(d.sessionsQuarantined)}</td>""" +
        s"""<td>${pct1(qRate(d.sessionsQuarantined, d.sessionsTotal))}</td>""" +
        s"""<td>${num(d.eventsTotal)}</td><td>${num(d.eventsQuarantined)}</td></tr>"""
    }.mkString("\n")
    val reasonRows = reasonTotals(sorted).map { case (name, n, share) =>
      val cls = if (n > 0) "fail" else "pass"
      s"""<tr><td>${escHtml(name)}</td><td class="$cls">${num(n)}</td><td>${pct1(share)}</td></tr>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html lang="en">
       |<head><meta charset="utf-8"><title>session quarantine dashboard</title>
       |<style>
       |  body { font-family: sans-serif; margin: 24px; }
       |  .summary { display: flex; gap: 16px; margin: 20px 0; }
       |  .card { border: 1px solid #ddd; border-radius: 6px; padding: 12px 20px; }
       |  .card .v { font-size: 1.6em; font-weight: bold; }
       |  table { border-collapse: collapse; margin: 12px 0; }
       |  td, th { border: 1px solid #ccc; padding: 4px 10px; text-align: right; }
       |  td:first-child, th:first-child { text-align: left; }
       |  .pass { color: #1a7f37; } .fail { color: #cf222e; }
       |</style></head>
       |<body>
       |<h1>session quarantine dashboard</h1>
       |<div class="summary">
       |${card("days", sorted.size.toString)}
       |${card("sessions", num(sTot))}
       |${card("quarantined", num(sQ))}
       |${card("quarantine rate", pct1(qRate(sQ, sTot)))}
       |${card("review queue", num(sorted.map(_.eventsQuarantined).sum))}
       |</div>
       |<h2>daily quarantine</h2>
       |<table>
       |<tr><th>date</th><th>sessions</th><th>quarantined</th><th>q-rate</th><th>events</th><th>review queue</th></tr>
       |$dailyRows
       |</table>
       |<h2>quarantine reasons</h2>
       |<table>
       |<tr><th>reason</th><th>sessions flagged</th><th>share of quarantined</th></tr>
       |$reasonRows
       |</table>
       |</body>
       |</html>""".stripMargin
  }

  // ---- corpus daily report (documents-side sibling of dailyReport;
  // ---- reference: scripts/llm_daily_report.py builds exactly this
  // ---- summary text before handing it to an LLM — the transport is
  // ---- out of scope here, the REPORT is the surface) ----

  /** Render the corpus day: cleaning funnel, source mix, and live
    * token-budget fill — all from already-computed query frames
    * (`corpus_funnel`, `corpus_source_mix`,
    * `DocStream.tokenBudgetFromLog`); the renderer adds zero scans.
    * Any section tolerates an empty frame with "no data" — a report
    * that throws on a quiet day never ships. */
  def corpusReport(executionDate: String, funnel: Seq[Row],
      sourceMix: Seq[Row], budget: Seq[Row],
      agreement: Seq[Row] = Nil): String = {
    val funnelText =
      if (funnel.isEmpty) "no data"
      else funnel.map { r =>
        // stage keys are ordinal-prefixed (1_quality_gate …) for a
        // stable sort; strip the prefix for display
        val stage = r.getAs[String]("stage").dropWhile(_ != '_').drop(1)
        s"- $stage: ${num(r.getAs[Long]("n_docs"))} docs " +
          s"(${pct1(r.getAs[Double]("pct_of_input"))}) | " +
          s"remaining ${num(r.getAs[Long]("remaining_after"))}"
      }.mkString("\n")
    val mixText =
      if (sourceMix.isEmpty) "no data"
      else sourceMix.map { r =>
        s"- ${r.getAs[String]("source")}: " +
          s"${num(r.getAs[Long]("doc_count"))} docs " +
          s"(${pct1(r.getAs[Double]("doc_share"))}) | " +
          s"${num(r.getAs[Long]("token_count"))} tokens " +
          s"(${pct1(r.getAs[Double]("token_share"))})"
      }.mkString("\n")
    val budgetText =
      if (budget.isEmpty) "no data"
      else budget.map { r =>
        s"- ${r.getAs[String]("source")}: " +
          s"${num(r.getAs[Long]("bpe_tokens"))} bpe tokens ingested " +
          s"(${num(r.getAs[Long]("n_docs"))} docs / " +
          s"${num(r.getAs[Long]("word_count"))} words)"
      }.mkString("\n")
    // dedup method-agreement census (rows of `dedup_method_agreement
    // _full`): the calibration trend is only useful if someone SEES
    // it move — a seeded family drifting away from its exact
    // counterpart (re-hashed shingles, a changed band count, corpus
    // mix shift) shows up here as an agreement drop day over day,
    // the contract-drift precedent applied to dedup
    val agreementText =
      if (agreement.isEmpty) ""
      else "\n[dedup method agreement]\n" + agreement.map { r =>
        s"- ${r.getAs[String]("method_a")} vs ${r.getAs[String]("method_b")}: " +
          s"${num(r.getAs[Long]("n_pairs_a"))} / ${num(r.getAs[Long]("n_pairs_b"))} pairs | " +
          s"both ${num(r.getAs[Long]("n_both"))} | " +
          s"agreement ${pct1(r.getAs[Double]("agreement") * 100.0)}"
      }.mkString("\n") + "\n"
    s"""Corpus report ($executionDate)
       |${"=" * 40}
       |
       |[cleaning funnel]
       |$funnelText
       |
       |[source mix]
       |$mixText
       |
       |[token budget fill]
       |$budgetText
       |$agreementText""".stripMargin
  }

  /** Experiment readout report — the render of the A/B suite in its
    * REQUIRED reading order: the SRM gate first (an invalid split
    * voids everything below it), then the raw per-arm readout, then
    * the CUPED-adjusted readout with its variance-reduction yield.
    * Inputs are the collected rows of `ab_srm_check` (1 row),
    * `ab_test_summary` (≤2 rows) and `ab_cuped` (≤2 rows) — tiny
    * extracts, driver-side assembly like every report here. */
  def experimentReport(asOf: String, srm: Option[Row],
      summary: Seq[Row], cuped: Seq[Row],
      sequential: Seq[Row] = Nil): String = {
    def rate(d: Double) = pct2(d * 100.0)
    // sequential monitor: reads between the gate and the readouts —
    // if no look crossed its boundary, the raw/cuped numbers below are
    // PROGRESS, not verdicts (unguarded daily peeks inflate false
    // positives); if one did, the experiment stopped there and the
    // readouts are its confirmation. Rows are `ab_sequential`'s (or
    // `AbSequentialStream.sequentialFromLog`'s — same shape by
    // construction).
    val seqText =
      if (sequential.isEmpty) "no data"
      else {
        def d2(x: Double) = String.format(Locale.US, "%.2f", Double.box(x))
        val latest = sequential.maxBy(_.getAs[Int]("look"))
        val z = if (latest.isNullAt(latest.fieldIndex("z_score"))) "n/a"
                else d2(latest.getAs[Double]("z_score"))
        val crossings = sequential.filter(r =>
          !r.isNullAt(r.fieldIndex("crossed")) && r.getAs[Boolean]("crossed"))
        val verdict = crossings.sortBy(_.getAs[java.sql.Date]("day").toString)
          .headOption match {
          case Some(c) =>
            s"BOUNDARY CROSSED on ${c.getAs[java.sql.Date]("day")} " +
              s"(look ${c.getAs[Int]("look")}) — experiment stopped there; " +
              "readouts below are the confirmation"
          case None =>
            "no crossing — keep collecting; readouts below are progress, " +
              "not verdicts"
        }
        s"look ${latest.getAs[Int]("look")}/${latest.getAs[Int]("total_looks")} " +
          s"(${latest.getAs[java.sql.Date]("day")}) | z $z vs boundary " +
          s"${d2(latest.getAs[Double]("z_boundary"))} -> $verdict"
      }
    def liftOf(r: Row, field: String) =
      if (r.isNullAt(r.fieldIndex(field))) "n/a"
      else String.format(Locale.US, "%+.2f%%", Double.box(r.getAs[Double](field) * 100.0))
    val srmText = srm match {
      case None => "no data"
      case Some(r) =>
        val verdict =
          if (r.getAs[Boolean]("srm_flag"))
            "SRM DETECTED — the split is broken; every readout below is INVALID"
          else "split OK"
        val chi =
          if (r.isNullAt(r.fieldIndex("chi_sq"))) "n/a"
          else String.format(Locale.US, "%.3f", Double.box(r.getAs[Double]("chi_sq")))
        s"control ${num(r.getAs[Long]("n_control"))} / " +
          s"treatment ${num(r.getAs[Long]("n_treatment"))} users | " +
          s"chi_sq $chi -> $verdict"
    }
    val rawText =
      if (summary.isEmpty) "no data"
      else summary.map { r =>
        s"- ${r.getAs[String]("arm")}: ${num(r.getAs[Long]("n_users"))} users | " +
          s"view ${rate(r.getAs[Double]("view_rate"))} | " +
          s"conv ${rate(r.getAs[Double]("conv_rate"))} | " +
          s"lift ${liftOf(r, "lift_vs_control")}"
      }.mkString("\n")
    val cupedText =
      if (cuped.isEmpty) "no data"
      else cuped.map { r =>
        s"- ${r.getAs[String]("arm")}: adj conv ${rate(r.getAs[Double]("adj_conv_rate"))} | " +
          s"adj lift ${liftOf(r, "adj_lift_vs_control")} | " +
          s"theta ${String.format(Locale.US, "%.4f", Double.box(r.getAs[Double]("theta")))} | " +
          s"var reduction ${pct1(r.getAs[Double]("var_reduction") * 100.0)}"
      }.mkString("\n")
    s"""Experiment report ($asOf)
       |${"=" * 40}
       |
       |[sample-ratio gate]
       |$srmText
       |
       |[sequential monitor]
       |$seqText
       |
       |[raw readout]
       |$rawText
       |
       |[cuped readout]
       |$cupedText
       |""".stripMargin
  }

  /** The same experiment readout as a Block Kit payload (byte-parity
    * with the quality/trending/corpus payload family). The header
    * carries the SRM verdict so a broken split is visible in the
    * channel before anyone reads a lift number. */
  def experimentReportPayload(asOf: String, srm: Option[Row],
      summary: Seq[Row], cuped: Seq[Row],
      sequential: Seq[Row] = Nil): String = {
    val flagged = srm.exists(_.getAs[Boolean]("srm_flag"))
    val head = headerBlock(
      if (flagged) s"Experiment report $asOf — SRM DETECTED"
      else s"Experiment report $asOf")
    val fields = fieldsBlock(Seq(
      mrkdwn(s"*split:* ${if (flagged) "BROKEN" else "ok"}"),
      mrkdwn(s"*arms:* ${summary.size}"),
      mrkdwn(s"*users:* ${num(summary.map(_.getAs[Long]("n_users")).sum)}")))
    payload(Seq(head, fields,
      textBlock(experimentReport(asOf, srm, summary, cuped, sequential))))
  }

  /** The same corpus day as a Block Kit payload (the alert-channel
    * form, byte-parity with the quality/trending payload family). */
  def corpusReportPayload(executionDate: String, funnel: Seq[Row],
      sourceMix: Seq[Row], budget: Seq[Row],
      agreement: Seq[Row] = Nil): String = {
    val survived = funnel.find(_.getAs[String]("stage") == "4_survived")
    val input = funnel.headOption.map(_.getAs[Long]("n_input")).getOrElse(0L)
    val head = headerBlock(s"Corpus report $executionDate")
    val summary = fieldsBlock(Seq(
      mrkdwn(s"*input docs:* ${num(input)}"),
      mrkdwn(s"*survived:* ${survived.map(r => num(r.getAs[Long]("n_docs")))
        .getOrElse("no data")}"),
      mrkdwn(s"*sources:* ${sourceMix.size}"),
      mrkdwn(s"*budget rows:* ${budget.size}")))
    val body = textBlock(
      corpusReport(executionDate, funnel, sourceMix, budget, agreement))
    payload(Seq(head, summary, body))
  }
}
