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
}
