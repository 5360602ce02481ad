package graft

import graft.engine.RelOps

/** Correctness story for the approximate sketches (q45/q98): the catalog
  * forms are oracle-checked (exact columns hash-compare; the estimate's
  * bound boolean must be TRUE), and this spec additionally bounds the RAW
  * estimates. approx_count_distinct's default rsd is 0.05 and both sketches
  * are deterministic for a given input, so these bounds are stable
  * run-to-run. */
class ApproxSpec extends SparkSuite {

  test("q45 HLL estimate is within 2×rsd of the exact distinct count at sf0.01") {
    val row = RelOps.approxDistinctRaw(spark, "/root/testdata/sf0.01").head()
    val approx = row.getAs[Long]("approx_parts")
    val exact = row.getAs[Long]("exact_parts")
    assert(exact > 0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.10, s"relative error $relErr exceeds 2×rsd (approx=$approx exact=$exact)")
    // and the catalog form's folded boolean agrees
    val cat = RelOps.approxDistinct(spark, "/root/testdata/sf0.01").head()
    assert(cat.getAs[Boolean]("approx_ok"))
    assert(cat.getAs[Long]("exact_parts") == exact)
  }

  test("q98 approx median lands between the exact p45 and p55 per group at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    // accuracy=1000 bounds the RANK error at n/1000; p45..p55 is 100x looser
    val rows = RelOps.approxPercentilesRaw(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx_cents")
      val lo = r.getAs[Double]("p45")
      val hi = r.getAs[Double]("p55")
      assert(a >= lo && a <= hi, s"approx median $a outside exact [$lo, $hi] for $r")
    }
    val cat = RelOps.approxPercentiles(spark, dir).collect()
    assert(cat.nonEmpty && cat.forall(_.getAs[Boolean]("approx_ok")))
    // the 2×median-in-cents trick keeps the exact column integral: check it
    // reconstructs the double median exactly for every group
    val byStatus = rows.map(r =>
      r.getAs[String]("o_orderstatus") -> r.getAs[Double]("exact_cents_dbl")).toMap
    cat.foreach { r =>
      val m2x = r.getAs[Long]("median2x_cents")
      assert(m2x.toDouble == 2.0 * byStatus(r.getAs[String]("o_orderstatus")))
    }
  }
}
