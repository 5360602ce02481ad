package graft

import graft.engine.Analytics

/** Dashboard-parity analytics semantics on hand-built fact fixtures. */
class AnalyticsSpec extends SparkSuite {

  test("monthly YoY: diff and pct computed against same month of prior year") {
    val s = spark; import s.implicits._
    val fact = Seq(
      (20170301, 100.0), (20170315, 100.0), // 2017-03: 200
      (20180302, 300.0),                    // 2018-03: 300
      (20180401, 50.0))                     // 2018-04: no prior year
      .toDF("Order_Date_SK", "Sales_Amount")
    val out = Analytics.monthlySalesYoY(fact).collect()
      .map(r => (r.getAs[Int]("Year"), r.getAs[Int]("Month")) -> r).toMap
    val mar18 = out((2018, 3))
    assert(mar18.getAs[Double]("Sales") == 300.0)
    assert(mar18.getAs[Double]("PrevYearSales") == 200.0)
    assert(mar18.getAs[Double]("YoY_Diff") == 100.0)
    assert(mar18.getAs[Double]("YoY_Pct") == 50.0)
    assert(out((2017, 3)).isNullAt(out((2017, 3)).fieldIndex("PrevYearSales")))
    assert(out((2018, 4)).isNullAt(out((2018, 4)).fieldIndex("PrevYearSales")))
  }

  test("monthly YoY: a gap year yields NULL rather than comparing to an older year") {
    val s = spark; import s.implicits._
    val fact = Seq(
      (20160301, 100.0), // 2016-03
      (20180301, 300.0)) // 2018-03 — 2017-03 absent: YoY must be NULL, not vs 2016
      .toDF("Order_Date_SK", "Sales_Amount")
    val out = Analytics.monthlySalesYoY(fact).collect()
      .map(r => (r.getAs[Int]("Year"), r.getAs[Int]("Month")) -> r).toMap
    assert(out((2018, 3)).isNullAt(out((2018, 3)).fieldIndex("PrevYearSales")))
    assert(out((2018, 3)).isNullAt(out((2018, 3)).fieldIndex("YoY_Diff")))
  }

  test("top products: rank order, tie-break, and limit without a global window sort") {
    val s = spark; import s.implicits._
    val fact = Seq(("a", 10.0), ("a", 5.0), ("b", 20.0), ("c", 15.0), ("d", 1.0))
      .toDF("Product_ID", "Sales_Amount")
    val out = Analytics.topProducts(fact, n = 3).collect()
    assert(out.map(_.getAs[String]("Product_ID")).toSeq == Seq("b", "a", "c"))
    assert(out.map(_.getAs[Int]("Rank")).toSeq == Seq(1, 2, 3))
    assert(out(1).getAs[Double]("Product_Sales") == 15.0) // a = 10 + 5
  }

  test("share of sales sums to 100 percent across groups") {
    val s = spark; import s.implicits._
    val fact = Seq(("p1", 60.0), ("p2", 30.0), ("p3", 10.0))
      .toDF("Product_ID", "Sales_Amount")
    val dim = Seq(("p1", "CatA"), ("p2", "CatB"), ("p3", "CatB"))
      .toDF("Prod_ID", "Category")
    val out = Analytics.shareOfSales(fact, dim, "Prod_ID", "Product_ID", "Category")
      .collect().map(r => r.getAs[String]("Category") -> r.getAs[Double]("Pct_Of_Total")).toMap
    assert(out("CatA") == 60.0 && out("CatB") == 40.0)
  }

  test("q185 ols2: an exact plane recovers beta=(2,3) exactly; collinear features yield NULL") {
    val s = spark; import s.implicits._
    // y = 2x + 3z exactly, (x, z) non-collinear: (4,2) (6,3) (8,3)
    val fit = Seq(
      (0L, "a a b b", "en", "s", 14L),          // x=4 z=2 -> y=14
      (1L, "a a b b c c", "en", "s", 21L),      // x=6 z=3 -> y=21
      (2L, "a a a b b b c c", "en", "s", 25L),  // x=8 z=3 -> y=25
      // degenerate group: two points cannot determine two coefficients
      // (the centered Gram matrix has rank <= 1) -> det = 0
      (3L, "a a b b", "de", "s", 10L),
      (4L, "a a a a b b c c", "de", "s", 99L))
    fit.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet("/tmp/graft_ols2/documents.parquet")
    val out = Analytics.ols2(spark, "/tmp/graft_ols2").collect()
      .map(r => r.getAs[String]("lang") ->
        ((Option(r.getAs[java.lang.Long]("beta_tokens_ppm")),
          Option(r.getAs[java.lang.Long]("beta_distinct_ppm"))))).toMap
    assert(out("en") == ((Some(2000000L), Some(3000000L))),
      "an exact integer plane must be recovered exactly")
    assert(out("de") == ((None, None)), "collinear features guard to NULL")
  }

  test("q185 ols2: moment overflow raises loudly instead of NULLing like collinearity") {
    val s = spark; import s.implicits._
    // ~1e7-magnitude features: centered moments n·Σx² − (Σx)² reach ~1e16,
    // past the 1e15 exact-arithmetic guard — without it, decimal products
    // silently NULL (indistinguishable from a collinear det=0 group) while
    // the DuckDB oracle's HUGEINT raises
    // centered moment n·Σx² − (Σx)² = 3·1.4e17 − 3.6e17 = 6e16 > 1e15
    val big = Seq(
      ("en", 100000000L, 3L, 5L),
      ("en", 200000000L, 7L, 9L),
      ("en", 300000000L, 11L, 13L))
      .toDF("lang", "x", "z", "y")
    val e = intercept[Exception] {
      graft.engine.Analytics.ols2From(big).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("exact-arithmetic bound")),
      s"expected the ols2 overflow guard to fire, got: $e")
    // and a within-bound group is untouched by the guard
    val ok = Seq(("en", 4L, 2L, 14L), ("en", 6L, 3L, 21L), ("en", 8L, 3L, 25L))
      .toDF("lang", "x", "z", "y")
    val row = graft.engine.Analytics.ols2From(ok).collect().head
    assert(row.getAs[Long]("beta_tokens_ppm") == 2000000L)
  }

  test("incremental rollup: wave-only and state-only months both survive the merge") {
    val s = spark; import s.implicits._
    val dir = "/tmp/graft_test_ivm"
    def o(k: Long, d: String, p: Double) =
      (k, java.sql.Date.valueOf(d), 1L, "O", p)
    // months: 1995-01 state-only (keys 1,2), 1995-02 mixed (3 state + 7 wave),
    // 1995-03 WAVE-only (key 17) — the full-outer edge a left join would drop
    Seq(o(1, "1995-01-10", 10.0), o(2, "1995-01-20", 5.5),
        o(3, "1995-02-10", 7.25), o(7, "1995-02-15", 2.75),
        o(17, "1995-03-05", 99.0))
      .toDF("o_orderkey", "o_orderdate", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = graft.engine.Analytics.incrementalRevenueRollup(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      ("1995-01", 2L, 15.5),
      ("1995-02", 2L, 10.0),
      ("1995-03", 1L, 99.0)), s"got $out")
  }
}
