package graft

import graft.streaming.Events
import org.apache.spark.sql.functions._

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

  test("q184 watermark lag: chunked parallel prefix equals the naive global running max") {
    import org.apache.spark.sql.expressions.Window
    val out = Events.watermarkLag(spark, dir).collect()(0)
    // independent recompute: single global window (fine at test scale)
    val e = graft.engine.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("arrival_us", expr(
        "us + (CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 7200) * 1000000"))
    val w = Window.orderBy(col("arrival_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lates = e.withColumn("run_max", max(col("us")).over(w))
      .withColumn("late_s",
        when(col("run_max") > col("us"), expr("(run_max - us + 999999) div 1000000"))
          .otherwise(0L))
      .collect().map(_.getAs[Long]("late_s")).filter(_ > 0).sorted
    assert(out.getAs[Long]("n_events") == e.count())
    assert(out.getAs[Long]("n_late") == lates.length.toLong)
    assert(lates.nonEmpty, "jittered arrivals must produce late events (non-vacuous)")
    def pct(k: Int, of: Int) = lates(((k.toLong * lates.length + of - 1) / of - 1).toInt)
    assert(out.getAs[Long]("p50_late_s") == pct(1, 2))
    assert(out.getAs[Long]("p90_late_s") == pct(9, 10))
    assert(out.getAs[Long]("p99_late_s") == pct(99, 100))
    assert(out.getAs[Long]("max_late_s") == lates.last)
  }
}
