package graft

import graft.streaming.Events

/** Event-analytics operators (funnel, retention, tolerance as-of) on the real
  * sf0.001 events plus invariants a correct implementation must satisfy. */
class EventsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("funnel: stages are ordered and step timestamps are monotone") {
    val rows = Events.funnel(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Int]("funnel_stage")
      val tv = Option(r.getAs[java.lang.Long]("first_view_s")).map(_.toLong)
      val tc = Option(r.getAs[java.lang.Long]("first_click_s")).map(_.toLong)
      val tp = Option(r.getAs[java.lang.Long]("first_purchase_s")).map(_.toLong)
      // stage k implies steps 1..k present and later steps chronologically after
      assert((stage >= 1) == tv.isDefined)
      assert((stage >= 2) == tc.isDefined)
      assert((stage >= 3) == tp.isDefined)
      for (v <- tv; c <- tc) assert(c >= v, "first qualifying click is at/after the first view")
      for (c <- tc; p <- tp) assert(p >= c, "first qualifying purchase is at/after the click")
    }
    assert(rows.exists(_.getAs[Int]("funnel_stage") == 3), "some users convert fully at sf0.001")
  }

  test("retention: cohort day-0 count equals cohort size, offsets are non-negative") {
    val rows = Events.retentionCohorts(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("day_offset") >= 0))
    // every user is active on their own cohort day -> day-0 row exists per cohort
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_date").toString)
    byCohort.foreach { case (_, rs) =>
      val day0 = rs.filter(_.getAs[Int]("day_offset") == 0).map(_.getAs[Long]("n_active_users")).sum
      assert(day0 >= 1)
      // day-0 is the cohort's maximum possible activity count
      assert(rs.forall(_.getAs[Long]("n_active_users") <= day0))
    }
  }

  test("as-of with tolerance: subset of the unbounded as-of, all gaps within bound") {
    val bounded = Events.asofWithTolerance(spark, dir, toleranceS = 600).collect()
      .map(r => (r.getAs[Long]("error_event_id"), r.getAs[Long]("click_event_id"), r.getAs[Long]("gap_s")))
    val unbounded = Events.asofErrorsToClicks(spark, dir).collect()
      .map(r => (r.getAs[Long]("error_event_id"), r.getAs[Long]("click_event_id"), r.getAs[Long]("gap_s")))
    assert(bounded.nonEmpty && bounded.length < unbounded.length,
      "tolerance drops some stale matches at sf0.001")
    assert(bounded.forall(_._3 <= 600))
    assert(bounded.toSet.subsetOf(unbounded.toSet), "tolerance only FILTERS the as-of result")
  }

  test("attribution: credits split exactly, touch ids present iff clicks precede") {
    val rows = Events.attribution(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_prior_clicks")
      val first = Option(r.getAs[java.lang.Long]("first_click_id"))
      val last = Option(r.getAs[java.lang.Long]("last_click_id"))
      val (credit, leftover) = (r.getAs[Long]("credit_ppm_each"), r.getAs[Long]("leftover_ppm"))
      assert((n > 0) == first.isDefined && (n > 0) == last.isDefined)
      if (n > 0) assert(credit * n + leftover == 1000000L, s"ppm credits must sum to 1e6: $r")
      else assert(credit == 0 && leftover == 0)
    }
    assert(rows.exists(_.getAs[Long]("n_prior_clicks") > 0), "some purchases have prior clicks")
  }

  test("daily anomaly: flags match an exact BigInt recomputation of the 2-sigma rule") {
    val rows = Events.dailyAnomaly(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val counts = rs.map(r => BigInt(r.getAs[Long]("n_events")))
      val n = BigInt(rs.length)
      val s = counts.sum
      val q = counts.map(c => c * c).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("n_days") == rs.length.toLong)
        val x = BigInt(r.getAs[Long]("n_events"))
        val expected = (n * x - s).pow(2) > (n * q - s * s) * 4
        assert(r.getAs[Boolean]("is_anomaly") == expected,
          s"flag disagrees with exact integer recompute for $r")
      }
    }
  }
}
