package graft

import graft.engine.RelOps

/** Correctness story for the one rows-only catalog entry (q45): HLL is
  * approximate by design, but its error against the exact count must stay
  * within the sketch's configured accuracy. approx_count_distinct's default
  * rsd is 0.05 and the sketch is deterministic for a given input, so this
  * bound is stable run-to-run. */
class ApproxSpec extends SparkSuite {

  test("q45 HLL estimate is within 2×rsd of the exact distinct count at sf0.01") {
    val row = RelOps.approxDistinct(spark, "/root/testdata/sf0.01").head()
    val approx = row.getAs[Long]("approx_parts")
    val exact = row.getAs[Long]("exact_parts")
    assert(exact > 0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.10, s"relative error $relErr exceeds 2×rsd (approx=$approx exact=$exact)")
  }

  test("q98 approx median lands between the exact p45 and p55 per group at sf0.01") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    // accuracy=1000 bounds the RANK error at n/1000; p45..p55 is 100x looser
    val bounds = graft.engine.Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.45)").as("lo"),
        expr("percentile(o_totalprice, 0.55)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = RelOps.approxPercentiles(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("o_orderstatus"))
      val a = r.getAs[Double]("approx_median")
      assert(a >= lo && a <= hi, s"approx median $a outside exact [$lo, $hi] for $r")
    }
  }
}
