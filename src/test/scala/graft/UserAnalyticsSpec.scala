package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventMarts, RangeJoin, UserAnalytics}

class UserAnalyticsSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String, String, Double)]) = {
    import spark.implicits._
    EventMarts.enrich(
      rows.toDF("event_id", "user_id", "ts", "event_type", "value")
        .withColumn("ts", col("ts").cast("timestamp"))
        .withColumn("props", lit("{}")))
  }

  test("user lifecycle: planted gaps classify new/retained/resurrected/lapsed exactly") {
    // u1: d1, d3 (gap 2 → retained), d20 (gap 17 → resurrected)
    // u2: d1 only (new, lapses after)
    // u3: d3, d8 (gap 5 → retained), last day of corpus → lapsed_after
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-01-03 10:00:00", "view", 1.0),
      (3L, 1L, "2024-01-20 10:00:00", "view", 1.0),
      (4L, 2L, "2024-01-01 11:00:00", "click", 1.0),
      (5L, 3L, "2024-01-03 09:00:00", "view", 1.0),
      (6L, 3L, "2024-01-08 09:00:00", "view", 1.0),
      (7L, 1L, "2024-01-01 12:00:00", "view", 1.0))) // same-day dup collapses
    val got = UserAnalytics.userLifecycleFrom(e).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getAs[Long]("active_users"), r.getAs[Long]("new_users"),
          r.getAs[Long]("retained_users"), r.getAs[Long]("resurrected_users"),
          r.getAs[Long]("lapsed_after_users")))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 0L, 0L, 1L))) // u1 retained later, u2 lapses
    assert(got("2024-01-03") == ((2L, 1L, 1L, 0L, 1L))) // u1's gap to Jan 20 lapses it
    assert(got("2024-01-08") == ((1L, 0L, 1L, 0L, 1L))) // u3's last day
    assert(got("2024-01-20") == ((1L, 0L, 0L, 1L, 1L))) // gap 17 resurrects u1
    // conservation at sf: every (user, day) is exactly one of new/ret/res
    val m = UserAnalytics.userLifecycle(spark, Sf)
      .agg(sum("active_users"), sum("new_users"), sum("retained_users"),
        sum("resurrected_users")).collect().head
    assert(m.getLong(0) == m.getLong(1) + m.getLong(2) + m.getLong(3))
    assert(m.getLong(1) == Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id").distinct().count())
  }

  test("retention triangle: planted cohorts fill exact cells; week-0 column equals cohort sizes") {
    // weeks are Monday-anchored; 2024-01-01 is a Monday.
    // u1: wk0, wk1, wk3. u2: wk0 only. u3: wk1 only (second cohort).
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-01-03 10:00:00", "view", 1.0), // same week dedups
      (3L, 1L, "2024-01-10 10:00:00", "view", 1.0),
      (4L, 1L, "2024-01-22 10:00:00", "view", 1.0),
      (5L, 2L, "2024-01-02 10:00:00", "view", 1.0),
      (6L, 3L, "2024-01-08 10:00:00", "view", 1.0)))
    val got = UserAnalytics.retentionTriangleFrom(e).collect()
      .map(r => (r.getDate(0).toString, r.getAs[Int]("week_offset")) ->
        ((r.getAs[Long]("active_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention_pct")))).toMap
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 100.0)))
    assert(got(("2024-01-01", 1)) == ((1L, 2L, 50.0)))
    assert(got(("2024-01-01", 3)) == ((1L, 2L, 50.0)))
    assert(!got.contains(("2024-01-01", 2))) // no activity → no cell
    assert(got(("2024-01-08", 0)) == ((1L, 1L, 100.0)))
    // sf invariant: week-0 cells partition the user base
    val zeroSum = UserAnalytics.retentionTriangle(spark, Sf)
      .filter(col("week_offset") === 0).agg(sum("active_users"))
      .collect().head.getLong(0)
    assert(zeroSum == Tables.events(spark, Sf)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id").distinct().count())
  }

  test("user feature matrix: planted counts, monetary, recency, and rates") {
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 5.0),
      (2L, 1L, "2024-01-01 10:05:00", "purchase", 10.50),
      (3L, 1L, "2024-01-03 10:00:00", "purchase", 4.25),
      (4L, 1L, "2024-01-03 11:00:00", "error", 1.0),
      (5L, 2L, "2024-01-05 10:00:00", "signup", 0.0)))
    val got = UserAnalytics.userFeatureMatrixFrom(e).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val u1 = got(1L)
    assert(u1.getAs[Long]("n_events") == 4 && u1.getAs[Long]("n_view") == 1 &&
      u1.getAs[Long]("n_purchase") == 2 && u1.getAs[Long]("n_error") == 1)
    assert(u1.getAs[Long]("active_days") == 2)
    assert(u1.getAs[Int]("tenure_days") == 2)
    assert(u1.getAs[Int]("recency_days") == 2) // corpus max = Jan 5
    assert(u1.getAs[Double]("monetary") == 14.75)
    assert(u1.getAs[Double]("avg_purchase_value") == 14.75 / 2.0)
    assert(u1.getAs[Double]("events_per_active_day") == 2.0)
    assert(u1.getAs[Double]("error_rate") == 0.25)
    val u2 = got(2L)
    assert(u2.getAs[Double]("monetary") == 0.0)
    assert(u2.isNullAt(u2.fieldIndex("avg_purchase_value"))) // no purchases
    assert(u2.getAs[Int]("recency_days") == 0)
  }

  test("traffic seasonality: zero-days enter the mean, constant slots have zero std") {
    // Two Mondays in corpus: slot (Mon, 10h) active BOTH at n=2 →
    // mean 2, std 0. Slot (Mon, 11h) active on ONE Monday with n=4 →
    // mean 4/2=2 (zero-day aware), std sqrt((16-2*4)/2)=2.
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0), // Mon week 1
      (2L, 1L, "2024-01-01 10:30:00", "view", 1.0),
      (3L, 2L, "2024-01-08 10:00:00", "view", 1.0), // Mon week 2
      (4L, 2L, "2024-01-08 10:30:00", "view", 1.0),
      (5L, 1L, "2024-01-01 11:00:00", "view", 1.0),
      (6L, 1L, "2024-01-01 11:10:00", "view", 1.0),
      (7L, 1L, "2024-01-01 11:20:00", "view", 1.0),
      (8L, 1L, "2024-01-01 11:30:00", "view", 1.0)))
    val got = UserAnalytics.trafficSeasonalityFrom(e).collect()
      .map(r => (r.getAs[Int]("dow"), r.getAs[Int]("event_hour")) -> r).toMap
    val mon = 2 // Spark dayofweek: Sunday=1
    val s10 = got((mon, 10))
    assert(s10.getAs[Long]("n_days") == 2 && s10.getAs[Long]("days_active") == 2)
    assert(s10.getAs[Double]("mean_per_day") == 2.0)
    assert(s10.getAs[Double]("std_per_day") == 0.0)
    val s11 = got((mon, 11))
    assert(s11.getAs[Long]("days_active") == 1)
    assert(s11.getAs[Double]("mean_per_day") == 2.0) // 4 events over 2 Mondays
    assert(s11.getAs[Double]("std_per_day") == 2.0)
    assert(s11.getAs[Long]("max_day") == 4)
    // shares sum to 100
    val share = UserAnalytics.trafficSeasonality(spark, Sf)
      .agg(sum("share_pct")).collect().head.getDouble(0)
    assert(math.abs(share - 100.0) < 1e-9)
  }

  test("multi-touch attribution: linear and U-shaped credits decompose the purchase") {
    // purchase by u1 at 12:00 value 9.0 with touches at 11:10 (view),
    // 11:30 (click), 11:50 (view) → linear 3.0 each; U: 0.4/0.2/0.4.
    // u2: single touch → full credit. u3: touch 2h before → excluded.
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 11:10:00", "view", 1.0),
      (2L, 1L, "2024-01-01 11:30:00", "click", 1.0),
      (3L, 1L, "2024-01-01 11:50:00", "view", 1.0),
      (4L, 1L, "2024-01-01 12:00:00", "purchase", 9.0),
      (5L, 2L, "2024-01-01 09:40:00", "click", 1.0),
      (6L, 2L, "2024-01-01 10:00:00", "purchase", 5.0),
      (7L, 3L, "2024-01-01 08:00:00", "view", 1.0),
      (8L, 3L, "2024-01-01 10:30:00", "purchase", 7.0)))
    val rows = RangeJoin.attributionMultitouchFrom(e).collect()
    val byPurchase = rows.groupBy(_.getAs[Long]("purchase_id"))
    assert(!byPurchase.contains(8L)) // no touch in window
    val p4 = byPurchase(4L).sortBy(_.getAs[Int]("touch_pos"))
    assert(p4.map(_.getAs[Long]("touch_id")).toSeq == Seq(1L, 2L, 3L))
    assert(p4.forall(_.getAs[Long]("n_touches") == 3))
    assert(p4.forall(r => r.getAs[Double]("credit_linear") == 3.0))
    assert(p4.map(_.getAs[Double]("credit_position")).toSeq ==
      Seq(9.0 * 0.4, 9.0 * (0.2 / 1.0), 9.0 * 0.4))
    val p6 = byPurchase(6L)
    assert(p6.length == 1 && p6.head.getAs[Double]("credit_linear") == 5.0 &&
      p6.head.getAs[Double]("credit_position") == 5.0)
    // credits conserve the purchase value (exact for these doubles)
    byPurchase.foreach { case (_, ts) =>
      val n = ts.head.getAs[Long]("n_touches").toDouble
      assert(math.abs(ts.map(_.getAs[Double]("credit_linear")).sum -
        ts.head.getAs[Double]("credit_linear") * n) < 1e-12)
    }
  }

  test("purchase intervals: planted gaps land in exact power-of-two day buckets") {
    // u1: same-day repeat (6 h → bucket 0), then 66 h (2 full days → bucket 2)
    // u2: 35 days → bucket 32; u3: single purchase — no gap
    // the view event must not create a gap
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "purchase", 10.0),
      (2L, 1L, "2024-01-01 16:00:00", "purchase", 10.0),
      (3L, 1L, "2024-01-04 10:00:00", "purchase", 10.0),
      (4L, 2L, "2024-01-01 09:00:00", "purchase", 10.0),
      (5L, 2L, "2024-02-05 09:00:00", "purchase", 10.0),
      (6L, 3L, "2024-01-02 09:00:00", "purchase", 10.0),
      (7L, 1L, "2024-01-02 09:00:00", "view", 0.0)))
    val got = UserAnalytics.purchaseIntervalsFrom(e).collect()
      .map(r => r.getAs[Int]("gap_bucket_days") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Long]("n_users"),
          r.getAs[Double]("share_of_gaps")))).toMap
    assert(got.keySet == Set(0, 2, 32))
    assert(got(0) == ((1L, 1L, 1.0 / 3.0)))
    assert(got(2) == ((1L, 1L, 1.0 / 3.0)))
    assert(got(32) == ((1L, 1L, 1.0 / 3.0)))
    // sf sanity: shares sum to 1, buckets are the fixed bin floors
    val sf = UserAnalytics.purchaseIntervals(spark, Sf).collect()
    assert(math.abs(sf.map(_.getAs[Double]("share_of_gaps")).sum - 1.0) < 1e-9)
    assert(sf.map(_.getAs[Int]("gap_bucket_days")).toSet
      .subsetOf(Set(0, 1, 2, 4, 8, 16, 32)))
  }

  test("sequential looks: cumulative enrolment is exact, the OBF-shape boundary relaxes to 1.96, a planted effect crosses") {
    import java.security.MessageDigest
    def arm(u: Long): String = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // 200 users enrol over days 1-4 (u % 4); EVERY treatment user
    // converts the day after enrolment, no control user ever does —
    // the strongest possible effect, so the boundary must be crossed
    // by the final look
    val users = (1L to 200L)
    val rows = users.flatMap { u =>
      val d = (u % 4 + 1).toInt
      val view = (u * 10, u, f"2024-01-0$d%d 10:00:00", "view", 1.0)
      if (arm(u) == "treatment")
        Seq(view, (u * 10 + 1, u, f"2024-01-0${d + 1}%d 10:00:00", "purchase", 5.0))
      else Seq(view)
    }
    val got = UserAnalytics.abSequentialFrom(ev(rows)).collect()
    val byLook = got.map(r => r.getAs[Int]("look") -> r).toMap
    val k = got.length
    assert(byLook.keySet == (1 to k).toSet && k == 5) // days 1..5
    // cumulative enrolment: final look counts every user once
    val last = byLook(k)
    assert(last.getAs[Long]("n_control") + last.getAs[Long]("n_treatment") == 200L)
    assert(last.getAs[Long]("x_control") == 0L)
    assert(last.getAs[Long]("x_treatment") == users.count(arm(_) == "treatment").toLong)
    // monotone enrolment, boundary strictly relaxing to exactly 1.96 at K
    (2 to k).foreach { i =>
      assert(byLook(i).getAs[Long]("n_control") >= byLook(i - 1).getAs[Long]("n_control"))
      assert(byLook(i).getAs[Double]("z_boundary") < byLook(i - 1).getAs[Double]("z_boundary"))
    }
    assert(last.getAs[Double]("z_boundary") == UserAnalytics.ZAlpha975)
    // the planted max-strength effect crosses by the final look, and
    // once the z exists it is positive (treatment converts more)
    assert(last.getAs[Boolean]("crossed"))
    got.filter(!_.isNullAt(got.head.fieldIndex("z_score")))
      .foreach(r => assert(r.getAs[Double]("z_score") > 0.0))
    // day 1: nobody has converted yet → se = 0 → no z, no verdict
    assert(byLook(1).isNullAt(byLook(1).fieldIndex("z_score")))
  }

  test("ab test summary: md5 arms match a driver recompute; rates and lift are exact") {
    import java.security.MessageDigest
    def arm(u: Long): String = {
      val h = MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // users 1..40: all view; users with u % 4 == 0 purchase too
    val rows = (1L to 40L).flatMap { u =>
      val v = (u * 10, u, s"2024-01-0${(u % 5) + 1} 10:00:00", "view", 1.0)
      if (u % 4 == 0) Seq(v, (u * 10 + 1, u, "2024-01-06 10:00:00", "purchase", 5.0))
      else Seq(v)
    }
    val got = UserAnalytics.abTestSummaryFrom(ev(rows)).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    val expected = (1L to 40L).groupBy(arm)
    assert(got.keySet == Set("control", "treatment"))
    Seq("control", "treatment").foreach { a =>
      val us = expected(a)
      val nU = us.size.toLong
      val nP = us.count(_ % 4 == 0).toLong
      assert(got(a).getAs[Long]("n_users") == nU, s"$a users")
      assert(got(a).getAs[Long]("n_viewers") == nU) // everyone views
      assert(got(a).getAs[Long]("n_purchasers") == nP, s"$a purchasers")
      assert(got(a).getAs[Double]("conv_rate") == nP.toDouble / nU.toDouble)
    }
    // control lift is exactly zero; treatment lift matches the two-op chain
    assert(got("control").getAs[Double]("lift_vs_control") == 0.0)
    val cr = got("control").getAs[Double]("conv_rate")
    val tr = got("treatment").getAs[Double]("conv_rate")
    assert(got("treatment").getAs[Double]("lift_vs_control") == (tr - cr) / cr)
    // assignment is deterministic: a rerun is byte-identical
    val again = UserAnalytics.abTestSummaryFrom(ev(rows)).collect()
      .map(r => r.getAs[String]("arm") -> r.getAs[Long]("n_users")).toMap
    assert(again == got.view.mapValues(_.getAs[Long]("n_users")).toMap)
  }

  test("srm check: counts match an md5 replica; broken split flags; users count once") {
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // every user emits TWO events — SRM must count distinct users, not rows
    val rows = (1L to 40L).flatMap(u => Seq(
      (u * 10, u, "2024-01-02 10:00:00", "view", 1.0),
      (u * 10 + 1, u, "2024-01-03 10:00:00", "view", 1.0)))
    val r = UserAnalytics.abSrmCheckFrom(ev(rows)).collect()
    assert(r.length == 1)
    val nC = (1L to 40L).count(arm(_) == "control").toLong
    val nT = 40L - nC
    assert(r(0).getAs[Long]("n_control") == nC)
    assert(r(0).getAs[Long]("n_treatment") == nT)
    val sq = (nC - nT) * (nC - nT)
    assert(r(0).getAs[Long]("sq_diff") == sq)
    assert(r(0).getAs[Double]("chi_sq") == sq.toDouble / 40.0)
    assert(r(0).getAs[Boolean]("srm_flag") == (100L * sq > 384L * 40L))
    // a logging path that drops one arm entirely MUST flag: keep only
    // control-hashing users (the classic gated-events SRM)
    val ctrlUsers = (1L to 200L).filter(arm(_) == "control").take(30)
    val broken = ctrlUsers.map(u => (u * 10, u, "2024-01-02 10:00:00", "view", 1.0))
    val b = UserAnalytics.abSrmCheckFrom(ev(broken)).collect()(0)
    assert(b.getAs[Long]("n_treatment") == 0L)
    assert(b.getAs[Boolean]("srm_flag"), "one-arm split must trip the SRM guard")
  }

  test("cuped: driver replica pins the sufficient-statistic chain; explained outcome zeroes adj lift") {
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // user u: (u%4+1) pre views on Jan 1; users u%3==0 make 2 post
    // purchases on Jan 9 (mid = epoch midpoint ≈ Jan 5 splits them)
    val users = (1L to 40L)
    def xOf(u: Long) = u % 4 + 1
    def yOf(u: Long) = if (u % 3 == 0) 2L else 0L
    var id = 0L
    val rows = users.flatMap { u =>
      val pre = (1L to xOf(u)).map { i =>
        id += 1; (id, u, s"2024-01-01 10:0${i % 6}:00", "view", 1.0)
      }
      val post = (1L to yOf(u)).map { i =>
        id += 1; (id, u, "2024-01-09 10:00:00", "purchase", 9.0)
      }
      pre ++ post
    }
    val got = UserAnalytics.abCupedFrom(ev(rows)).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    // driver replica of the EXACT mean-form chain
    val byArm = users.groupBy(arm)
    val gn = users.size.toDouble
    val gsx = users.map(xOf).sum.toDouble
    val gsy = users.map(yOf).sum.toDouble
    val gmx = gsx / gn
    val gmy = gsy / gn
    val cov = users.map(u => xOf(u) * yOf(u)).sum.toDouble / gn - gmx * gmy
    val varx = users.map(u => xOf(u) * xOf(u)).sum.toDouble / gn - gmx * gmx
    val vary = users.map(u => yOf(u) * yOf(u)).sum.toDouble / gn - gmy * gmy
    val theta = cov / varx
    def adjOf(us: Iterable[Long]): Double = {
      val n = us.size.toDouble
      val conv = us.map(yOf).sum.toDouble / n
      val meanPre = us.map(xOf).sum.toDouble / n
      conv - theta * (meanPre - gmx)
    }
    for ((a, us) <- byArm) {
      val r = got(a)
      assert(r.getAs[Long]("n_users") == us.size.toLong)
      assert(r.getAs[Double]("mean_pre") == us.map(xOf).sum.toDouble / us.size)
      assert(r.getAs[Double]("conv_rate") == us.map(yOf).sum.toDouble / us.size)
      assert(r.getAs[Double]("theta") == theta)
      assert(r.getAs[Double]("adj_conv_rate") == adjOf(us))
      assert(r.getAs[Double]("var_reduction") == cov * cov / (varx * vary))
    }
    val ctrlAdj = adjOf(byArm("control"))
    assert(got("treatment").getAs[Double]("adj_lift_vs_control") ==
      (adjOf(byArm("treatment")) - ctrlAdj) / ctrlAdj)
    // perfectly covariate-explained outcome: y == x for every user →
    // θ = 1 and both adjusted means collapse to E[x] (zero adj lift up
    // to the a−(a−b) ulp), while RAW conv rates still differ by arm
    id = 10000L
    val explained = users.flatMap { u =>
      val pre = (1L to xOf(u)).map { i =>
        id += 1; (id, u, s"2024-01-01 10:0${i % 6}:00", "view", 1.0)
      }
      val post = (1L to xOf(u)).map { i =>
        id += 1; (id, u, "2024-01-09 10:00:00", "purchase", 9.0)
      }
      pre ++ post
    }
    val ex = UserAnalytics.abCupedFrom(ev(explained)).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(ex("treatment").getAs[Double]("theta") == 1.0)
    assert(math.abs(ex("treatment").getAs[Double]("adj_lift_vs_control")) < 1e-12)
    assert(ex("treatment").getAs[Double]("var_reduction") == 1.0)
    // sf sanity: θ finite, ρ² in [0,1], both arms present
    val sf = UserAnalytics.abCuped(spark, Sf).collect()
    assert(sf.map(_.getAs[String]("arm")).toSet == Set("control", "treatment"))
    assert(sf.forall(r => r.getAs[Double]("var_reduction") >= 0.0 &&
      r.getAs[Double]("var_reduction") <= 1.0))
  }

  test("changepoint: planted level shift pins date, statistic, flag; flat traffic stays quiet") {
    // 6 days at 10/day then 6 days at 30/day: n=12, T=240,
    // u_d = 12·c_d − 240 → −120 pre / +120 post; |cusum| peaks at 720
    // on day 6; Σu² = 12·120² = 172800
    var id = 0L
    val rows = (1 to 12).flatMap { d =>
      val n = if (d <= 6) 10 else 30
      (1 to n).map { i =>
        id += 1
        (id, (d % 5).toLong + 1, f"2024-01-$d%02d 10:${i % 60}%02d:00", "view", 1.0)
      }
    }
    val got = UserAnalytics.trafficChangepointFrom(ev(rows)).collect()
    assert(got.length == 12)
    val byDate = got.map(r => r.getDate(0).toString -> r).toMap
    assert(byDate("2024-01-06").getAs[Long]("cusum") == -720L)
    assert(byDate("2024-01-06").getAs[Double]("residual") == -10.0)
    assert(got.forall(_.getAs[java.sql.Date]("split_date").toString == "2024-01-06"))
    assert(got.head.getAs[Double]("stat") == 720.0 / math.sqrt(172800.0))
    assert(got.forall(_.getAs[Boolean]("changepoint_flag"))) // 1.73 > 1.358
    // flat traffic: zero residuals → zero cusum, NULL stat, no flag
    var j = 10000L
    val flat = (1 to 5).flatMap { d =>
      (1 to 7).map { i => j += 1; (j, 1L, s"2024-02-0$d 10:0$i:00", "view", 1.0) }
    }
    val f = UserAnalytics.trafficChangepointFrom(ev(flat)).collect()
    assert(f.length == 5)
    assert(f.forall(_.getAs[Long]("cusum") == 0L))
    assert(f.forall(r => r.isNullAt(r.fieldIndex("stat")) &&
      !r.getAs[Boolean]("changepoint_flag")))
    // sf: one row per active day, a single shared split date
    val sf = UserAnalytics.trafficChangepoint(spark, Sf).collect()
    assert(sf.nonEmpty && sf.map(_.getDate(0)).distinct.length == sf.length)
    assert(sf.map(_.getAs[java.sql.Date]("split_date")).distinct.length == 1)
  }

  test("traffic forecast: planted weeks pin baseline x level exactly") {
    // Mondays Jan 1 / Jan 8, Sunday Jan 14 (last date) → forecast for
    // Mon Jan 15. Mon-10h baseline: (2+4)/2 = 3; Mon-12h: 2/2 = 1.
    // level = recent-7d (Jan 8..14: 6+3=9) vs daily rate (11 events /
    // 3 dates) over 7 days: 9*3/(11*7) = 27/77.
    var id = 0L
    def at(d: String, h: Int, n: Int) = (0 until n).map { i =>
      id += 1; (id, id, f"$d $h%02d:0$i:00", "view", 1.0)
    }
    val e = ev(at("2024-01-01", 10, 2) ++ at("2024-01-08", 10, 4) ++
      at("2024-01-08", 12, 2) ++ at("2024-01-14", 9, 3))
    val got = UserAnalytics.trafficForecastFrom(e).collect()
    assert(got.length == 2, s"expected Mon hours 10 and 12: ${got.toSeq}")
    val byHour = got.map(r => r.getAs[Int]("event_hour") ->
      ((r.getAs[Double]("baseline_mean"), r.getAs[Double]("level"),
        r.getAs[Double]("predicted_events")))).toMap
    val level = 9.0 * 3.0 / (11.0 * 7.0)
    assert(byHour(10)._1 == 3.0 && byHour(12)._1 == 1.0)
    assert(math.abs(byHour(10)._2 - level) < 1e-15)
    assert(math.abs(byHour(10)._3 - 3.0 * level) < 1e-15)
    assert(math.abs(byHour(12)._3 - 1.0 * level) < 1e-15)
    got.foreach(r => assert(r.getAs[java.sql.Date]("forecast_date").toString == "2024-01-15"))
  }

  test("user activity gini: closed forms, banded == one global window, sf sanity") {
    def gini(rows: Seq[(Long, Long, String, String, Double)]): Double =
      UserAnalytics.userActivityGiniFrom(ev(rows)).collect().head.getAs[Double]("gini")
    def mk(countsByUser: Map[Long, Int]): Seq[(Long, Long, String, String, Double)] = {
      var id = 0L
      countsByUser.toSeq.flatMap { case (u, n) =>
        (0 until n).map { i =>
          id += 1
          (id, u, f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d", "view", 1.0)
        }
      }
    }
    // all-equal activity → exactly 0 (the identity cancels)
    assert(math.abs(gini(mk(Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3)))) < 1e-12)
    // one user generates 97 of 100 events → driver closed form:
    // sorted [1,1,1,97], ranks 1..4: G = 2*394/(4*100) - 5/4 = 0.72
    assert(math.abs(gini(mk(Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 97))) - 0.72) < 1e-12)
    // the banded prefix-sum must equal ONE global window (the oracle's
    // plan) bit-for-bit: decimal addition is associative, the final
    // division sees identical integers
    val banded = UserAnalytics.userActivityGini(spark, Sf).collect().head
    val counts = operators.EventMarts.enriched(spark, Sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("n_events", "user_id")
    val global = counts
      .withColumn("rnk", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n"), sum("n_events").as("s"),
        sum(col("rnk").cast("decimal(38,0)") *
          col("n_events").cast("decimal(38,0)")).as("sr"))
      .collect().head
    val (n, s) = (global.getAs[Long]("n"), global.getAs[Long]("s"))
    val expected = 2.0 * global.getAs[java.math.BigDecimal]("sr").doubleValue() /
      (n.toDouble * s.toDouble) - (n + 1).toDouble / n.toDouble
    assert(banded.getAs[Long]("n_users") == n &&
      banded.getAs[Long]("total_events") == s)
    assert(banded.getAs[Double]("gini") == expected,
      s"banded ${banded.getAs[Double]("gini")} != global-window $expected")
    assert(banded.getAs[Double]("gini") > 0.0 && banded.getAs[Double]("gini") < 1.0)
  }

  test("weekly stickiness: planted DAU/WAU exact; sf ratios bounded") {
    // 2024-01-01 is a Monday. Week 1: u1 Mon+Tue, u2 Mon →
    // DAU (2, 1), WAU 2, avg_dau 1.5, stickiness 0.75.
    // Week 2: u3 on Wed only → stickiness exactly 1.0.
    val e = ev(Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-01-01 11:00:00", "click", 1.0), // same-day dup collapses
      (3L, 1L, "2024-01-02 10:00:00", "view", 1.0),
      (4L, 2L, "2024-01-01 12:00:00", "view", 1.0),
      (5L, 3L, "2024-01-10 09:00:00", "view", 1.0)))
    val got = UserAnalytics.stickinessWeeklyFrom(e).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getAs[Long]("wau"), r.getAs[Long]("active_days"),
          r.getAs[Double]("avg_dau"), r.getAs[Double]("stickiness")))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 1.5, 0.75)))
    assert(got("2024-01-08") == ((1L, 1L, 1.0, 1.0)))
    assert(got.size == 2)
    // sf: stickiness in (0, 1], avg_dau never exceeds wau, weeks ordered
    val sf = UserAnalytics.stickinessWeekly(spark, Sf).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0 + 1e-12)
      assert(r.getAs[Double]("avg_dau") <= r.getAs[Long]("wau").toDouble + 1e-9)
    }
  }

  test("power/mde: driver replica pins the z-chain; one-arm corpus yields NULL mde") {
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // z literals: Φ⁻¹(0.975)/Φ⁻¹(0.80) to double precision (Abramowitz
    // & Stegun 26.2.23 refined by Newton on Φ; provenance documented)
    // — sanity-bound them rather than re-derive libm in the spec
    assert(math.abs(UserAnalytics.ZAlpha975 - 1.96) < 0.005)
    assert(math.abs(UserAnalytics.ZPower80 - 0.8416) < 0.001)
    // users 1..60: u%5==0 purchases; every user also views (two rows —
    // the rollup must count users once)
    val users = (1L to 60L)
    var id = 0L
    val rows = users.flatMap { u =>
      val v = Seq { id += 1; (id, u, "2024-01-02 10:00:00", "view", 1.0) }
      val p = if (u % 5 == 0) Seq { id += 1; (id, u, "2024-01-03 10:00:00", "purchase", 9.0) }
              else Seq.empty
      v ++ p
    }
    val r = UserAnalytics.abPowerMdeFrom(ev(rows)).collect()
    assert(r.length == 1)
    val g = r(0)
    val byArm = users.groupBy(arm)
    val nC = byArm("control").size.toDouble
    val nT = byArm("treatment").size.toDouble
    val rc = byArm("control").count(_ % 5 == 0) / nC
    val rt = byArm("treatment").count(_ % 5 == 0) / nT
    val se = math.sqrt(rc * (1.0 - rc) / nC + rt * (1.0 - rt) / nT)
    val mde = (UserAnalytics.ZAlpha975 + UserAnalytics.ZPower80) * se
    assert(g.getAs[Long]("n_control") == nC.toLong)
    assert(g.getAs[Long]("n_treatment") == nT.toLong)
    assert(g.getAs[Double]("rate_control") == rc)
    assert(g.getAs[Double]("rate_treatment") == rt)
    assert(g.getAs[Double]("se_delta") == se)
    assert(g.getAs[Double]("mde_abs") == mde)
    assert(g.getAs[Double]("mde_rel") == mde / rc)
    assert(g.getAs[Double]("observed_delta") == rt - rc)
    assert(g.getAs[Boolean]("powered") == (math.abs(rt - rc) > mde))
    // a 60-user corpus with a ~5pp observed delta must read UNDERPOWERED
    assert(!g.getAs[Boolean]("powered"), "tiny corpus cannot be powered")
    // one-arm corpus: NULL se/mde/powered instead of a divide-by-zero
    val ctrlOnly = (1L to 400L).filter(arm(_) == "control").take(20)
      .map(u => (u * 100, u, "2024-01-02 10:00:00", "purchase", 9.0))
    val b = UserAnalytics.abPowerMdeFrom(ev(ctrlOnly)).collect()(0)
    assert(b.getAs[Long]("n_treatment") == 0L)
    assert(b.isNullAt(b.fieldIndex("mde_abs")) && b.isNullAt(b.fieldIndex("powered")))
    assert(b.getAs[Double]("rate_control") == 1.0)
    // sf sanity: both arms present and the chain is non-null (at tiny
    // sf every user purchases → p(1−p) = 0 → mde exactly 0 is correct)
    val sf = UserAnalytics.abPowerMde(spark, Sf).collect()(0)
    assert(sf.getAs[Long]("n_control") > 0 && sf.getAs[Long]("n_treatment") > 0)
    assert(!sf.isNullAt(sf.fieldIndex("mde_abs")) &&
      sf.getAs[Double]("mde_abs") >= 0.0)
  }

  test("stratified cuped: per-stratum theta matches replica; cold stratum takes theta 0") {
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // users 1..30: pre views x = u%3 (0 → cold stratum, 1..2 → light);
    // users 31..40: x = u%4+4 (heavy); purchases y = u%2 post-mid.
    // Cold users still appear via their post purchase (x=0, y>0) or a
    // post view so every user exists in the rollup.
    val users = (1L to 40L)
    def xOf(u: Long) = if (u <= 30) u % 3 else u % 4 + 4
    def yOf(u: Long) = u % 2
    var id = 0L
    val rows = users.flatMap { u =>
      val pre = (1L to xOf(u)).map { i =>
        id += 1; (id, u, s"2024-01-01 10:0${i % 6}:00", "view", 1.0)
      }
      val postAnchor = Seq { id += 1; (id, u, "2024-01-09 09:00:00", "view", 1.0) }
      val post = (1L to yOf(u)).map { _ =>
        id += 1; (id, u, "2024-01-09 10:00:00", "purchase", 9.0)
      }
      pre ++ postAnchor ++ post
    }
    val got = UserAnalytics.abCupedStratifiedFrom(ev(rows)).collect()
      .map(r => (r.getAs[String]("stratum"), r.getAs[String]("arm")) -> r).toMap
    // NOTE: x in the operator counts ALL pre-mid events; the planted
    // pre views land pre-mid (Jan 1 vs Jan 9 → mid ≈ Jan 5), the
    // anchor view and purchases post-mid, so x == xOf(u), y == yOf(u)
    def stratumOf(x: Long) = if (x == 0) "s0_cold" else if (x <= 3) "s1_light" else "s2_heavy"
    val byStratum = users.groupBy(u => stratumOf(xOf(u)))
    for ((s, su) <- byStratum) {
      val gn = su.size.toDouble
      val gmx = su.map(xOf).sum / gn
      val gmy = su.map(yOf).sum / gn
      val cov = su.map(u => xOf(u) * yOf(u)).sum / gn - gmx * gmy
      val varx = su.map(u => xOf(u) * xOf(u)).sum / gn - gmx * gmx
      val theta = if (varx != 0.0) cov / varx else 0.0
      for ((a, au) <- su.groupBy(arm)) {
        val r = got((s, a))
        assert(r.getAs[Long]("n_users") == au.size.toLong, s"($s,$a) n")
        assert(r.getAs[Double]("theta") == theta, s"($s,$a) theta")
        val conv = au.map(yOf).sum.toDouble / au.size
        val meanPre = au.map(xOf).sum.toDouble / au.size
        assert(r.getAs[Double]("adj_conv_rate") == conv - theta * (meanPre - gmx))
      }
      // the all-zero-covariate cold stratum must take theta = 0 (raw)
      if (s == "s0_cold") {
        assert(theta == 0.0)
        got.filter(_._1._1 == "s0_cold").values.foreach { r =>
          assert(r.getAs[Double]("theta") == 0.0)
          assert(r.getAs[Double]("adj_conv_rate") == r.getAs[Double]("conv_rate"))
          assert(r.getAs[Double]("var_reduction") == 0.0)
        }
      }
    }
    // sf sanity: every (stratum, arm) row has ρ² in [0,1]; strata ordered
    val sf = UserAnalytics.abCupedStratified(spark, Sf).collect()
    assert(sf.nonEmpty)
    sf.foreach { r =>
      val v = r.getAs[Double]("var_reduction")
      assert(v >= 0.0 && v <= 1.0 + 1e-12)
    }
    assert(sf.map(_.getAs[String]("stratum")).toSeq == sf.map(_.getAs[String]("stratum")).toSeq.sorted)
  }

  test("forecast backtest: held-out day scores the planted recipe exactly") {
    // Mondays Jan 1 / Jan 8 train the Monday baseline; Monday Jan 15
    // is the held-out target. Train: Mon-10h (2+4)/2 = 3, Mon-12h 2/2
    // = 1; level = recent-7d (Jan 8: 6, Jan 14: 3 → 9) vs train daily
    // rate (11/3) over 7 days → 27/77 (the traffic_forecast spec's
    // own constants, now scored against actuals).
    var id = 0L
    def at(d: String, h: Int, n: Int) = (0 until n).map { i =>
      id += 1; (id, id, f"$d $h%02d:0$i:00", "view", 1.0)
    }
    val e = ev(at("2024-01-01", 10, 2) ++ at("2024-01-08", 10, 4) ++
      at("2024-01-08", 12, 2) ++ at("2024-01-14", 9, 3) ++
      // the held-out Monday: 5 actual events at 10h, 2 at 13h (an hour
      // the model never saw → predicted 0)
      at("2024-01-15", 10, 5) ++ at("2024-01-15", 13, 2))
    val got = UserAnalytics.forecastBacktestFrom(e).collect()
      .map(r => r.getAs[Int]("event_hour") -> r).toMap
    val level = 9.0 * 3.0 / (11.0 * 7.0)
    // hour 10: actual 5, predicted 3·level
    assert(got(10).getAs[Long]("actual_events") == 5L)
    assert(math.abs(got(10).getAs[Double]("predicted_events") - 3.0 * level) < 1e-12)
    assert(got(10).getAs[Double]("abs_err") ==
      math.abs(5.0 - got(10).getAs[Double]("predicted_events")))
    assert(got(10).getAs[Double]("pct_err") == got(10).getAs[Double]("abs_err") / 5.0)
    // hour 12: forecast hour that never realized → actual 0, pct NULL
    assert(got(12).getAs[Long]("actual_events") == 0L)
    assert(math.abs(got(12).getAs[Double]("predicted_events") - 1.0 * level) < 1e-12)
    assert(got(12).isNullAt(got(12).fieldIndex("pct_err")))
    // hour 13: actual hour the model never saw → predicted 0, full miss
    assert(got(13).getAs[Long]("actual_events") == 2L)
    assert(got(13).getAs[Double]("predicted_events") == 0.0)
    assert(got(13).getAs[Double]("abs_err") == 2.0)
    assert(got(13).getAs[Double]("pct_err") == 1.0)
    got.values.foreach { r =>
      assert(r.getAs[java.sql.Date]("target_date").toString == "2024-01-15")
      assert(r.getAs[Int]("dow") == 2)
    }
    assert(got.keySet == Set(10, 12, 13))
    // sf sanity: ≤24 scored hours, errors finite and non-negative
    val sf = UserAnalytics.forecastBacktest(spark, Sf).collect()
    assert(sf.nonEmpty && sf.length <= 24)
    sf.foreach(r => assert(r.getAs[Double]("abs_err") >= 0.0))
  }

  test("ab funnel: per-arm depths and z-chain match a driver replica; one-arm yields NULL z") {
    def arm(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"exp1:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (h.charAt(0) >= '8') "treatment" else "control"
    }
    // depth(u) = u % 4: 0 → error only, 1 → view, 2 → +click, 3 → +purchase
    val users = (1L to 40L)
    def depth(u: Long) = u % 4
    var id = 0L
    val rows = users.flatMap { u =>
      def ev(t: String, off: Int) = { id += 1; (id, u, s"2024-01-02 10:0$off:00", t, 1.0) }
      depth(u) match {
        case 0 => Seq(ev("error", 0))
        case 1 => Seq(ev("view", 0))
        case 2 => Seq(ev("view", 0), ev("click", 1))
        case _ => Seq(ev("view", 0), ev("click", 1), ev("purchase", 2))
      }
    }
    val got = UserAnalytics.abFunnelFrom(ev(rows)).collect()
      .map(r => r.getAs[Int]("step") -> r).toMap
    assert(got.keySet == Set(1, 2, 3))
    val byArm = users.groupBy(arm)
    for (step <- 1 to 3) {
      val r = got(step)
      val nC = byArm("control").size.toLong
      val nT = byArm("treatment").size.toLong
      val xC = byArm("control").count(depth(_) >= step).toLong
      val xT = byArm("treatment").count(depth(_) >= step).toLong
      assert(r.getAs[Long]("n_control") == nC && r.getAs[Long]("n_treatment") == nT)
      assert(r.getAs[Long]("reach_control") == xC, s"step $step control reach")
      assert(r.getAs[Long]("reach_treatment") == xT, s"step $step treatment reach")
      val rc = xC.toDouble / nC
      val rt = xT.toDouble / nT
      val pp = (xC + xT).toDouble / (nC + nT).toDouble
      val se = math.sqrt(pp * (1.0 - pp) * (1.0 / nC + 1.0 / nT))
      assert(r.getAs[Double]("rate_control") == rc)
      assert(r.getAs[Double]("delta") == rt - rc)
      assert(r.getAs[Double]("z_score") == (rt - rc) / se, s"step $step z")
      assert(r.getAs[Boolean]("significant") ==
        (math.abs((rt - rc) / se) > UserAnalytics.ZAlpha975))
    }
    assert(got(1).getAs[String]("step_name") == "view" &&
      got(3).getAs[String]("step_name") == "purchase")
    // an A/A hash split on symmetric depths should not be significant
    assert(!got(1).getAs[Boolean]("significant"))
    // one-arm corpus: steps still emit, z NULL
    val ctrlOnly = (1L to 400L).filter(arm(_) == "control").take(12)
      .map(u => (u * 1000, u, "2024-01-02 10:00:00", "view", 1.0))
    val one = UserAnalytics.abFunnelFrom(ev(ctrlOnly)).collect()
    assert(one.length == 3)
    one.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("z_score")))
      assert(r.isNullAt(r.fieldIndex("n_treatment")))
    }
    // sf: funnel monotone per arm (reach can only shrink with depth)
    val sf = UserAnalytics.abFunnel(spark, Sf).collect().sortBy(_.getAs[Int]("step"))
    assert(sf.length == 3)
    assert(sf.sliding(2).forall { case Array(a, b) =>
      b.getAs[Long]("reach_control") <= a.getAs[Long]("reach_control") &&
        b.getAs[Long]("reach_treatment") <= a.getAs[Long]("reach_treatment")
    })
  }

  test("traffic decompose: planted dow pattern recovers trend/seasonal exactly; gaps disqualify") {
    // 21 dense days (Mon Jan 1 .. Sun Jan 21) with count = 10 + dow:
    // every full 7-day window sums to Σ(10+d) = 98 → trend ≡ 14,
    // det_scaled = 7(10+dow) − 98 = 7·dow − 28 → seasonal ≡ dow − 4,
    // residual ≡ 0. Edge days (1-3, 19-21) have no full window.
    var id = 0L
    def day(d: Int, n: Int) = (1 to n).map { i =>
      id += 1; (id, (i % 7).toLong + 1, f"2024-01-$d%02d 10:${i % 60}%02d:00", "view", 1.0)
    }
    // dayofweek(2024-01-01) = 2 (Monday, Spark's 1=Sunday convention)
    val rows = (1 to 21).flatMap { d =>
      val dow = (d % 7) + 1 // Jan 1 → 2 (Mon), Jan 6 → 7 (Sat), Jan 7 → 1 (Sun)
      day(d, 10 + dow)
    }
    val got = UserAnalytics.trafficDecomposeFrom(ev(rows)).collect()
    assert(got.length == 21)
    val byDate = got.map(r => r.getDate(0).toString -> r).toMap
    for (d <- 1 to 21) {
      val r = byDate(f"2024-01-$d%02d")
      val dow = (d % 7) + 1
      assert(r.getAs[Int]("dow") == dow, s"day $d dow")
      assert(r.getAs[Long]("n_events") == (10 + dow).toLong)
      assert(math.abs(r.getAs[Double]("seasonal") - (dow - 4)) < 1e-12, s"day $d seasonal")
      if (d >= 4 && d <= 18) {
        assert(r.getAs[Double]("trend") == 14.0, s"day $d trend")
        assert(math.abs(r.getAs[Double]("residual")) < 1e-12, s"day $d residual")
      } else {
        assert(r.isNullAt(r.fieldIndex("trend")), s"day $d edge trend")
        assert(r.isNullAt(r.fieldIndex("residual")), s"day $d edge residual")
      }
    }
    // a calendar gap disqualifies the windows that span it: 13 dense
    // days with day 7 missing → no day has 7 calendar neighbors
    var j = 100000L
    val gapped = ((1 to 13).filterNot(_ == 7)).flatMap { d =>
      (1 to 5).map { i => j += 1; (j, 1L, f"2024-03-$d%02d 10:0${i % 10}:00", "view", 1.0) }
    }
    val g = UserAnalytics.trafficDecomposeFrom(ev(gapped)).collect()
    assert(g.length == 12)
    assert(g.forall(_.isNullAt(g.head.fieldIndex("trend"))),
      "every window spans the gap or an edge — no trend may fill")
    // sf: decomposition reassembles the series wherever it's defined
    val sf = UserAnalytics.trafficDecompose(spark, Sf).collect()
    assert(sf.nonEmpty)
    sf.filter(r => !r.isNullAt(r.fieldIndex("residual"))).foreach { r =>
      val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(back - r.getAs[Long]("n_events").toDouble) < 1e-9)
    }
  }
}
