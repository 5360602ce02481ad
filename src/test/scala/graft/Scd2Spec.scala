package graft

import java.sql.Date

import graft.engine.Scd2
import org.apache.spark.sql.functions._

/** SCD2 version semantics: close-on-change, carry-forward, insert, departure. */
class Scd2Spec extends SparkSuite {

  test("scd2: changed row closes + reopens, unchanged carries, new inserts, departed closes") {
    val s = spark; import s.implicits._
    val d0 = Date.valueOf("2017-01-01")
    val d1 = Date.valueOf("2017-06-01")
    val current = Seq(
      ("c1", "sao paulo", d0, null.asInstanceOf[Date], true),   // will change city
      ("c2", "rio", d0, null.asInstanceOf[Date], true),         // unchanged
      ("c3", "salvador", d0, null.asInstanceOf[Date], true))    // departs
      .toDF("Customer_ID", "City", "effective_date", "end_date", "is_current")
    val updates = Seq(
      ("c1", "campinas"), // changed
      ("c2", "rio"),      // same
      ("c4", "manaus"))   // new key
      .toDF("Customer_ID", "City")

    val out = Scd2(current, updates, "Customer_ID", Seq("City"), d1).cache()
    assert(out.count() == 5) // c1 closed + c1 new, c2 open, c3 closed, c4 new

    val c1 = out.filter("Customer_ID = 'c1'").orderBy("effective_date").collect()
    assert(c1.length == 2)
    assert(!c1(0).getAs[Boolean]("is_current") && c1(0).getAs[Date]("end_date") == d1)
    assert(c1(1).getAs[Boolean]("is_current") && c1(1).getAs[String]("City") == "campinas" &&
      c1(1).getAs[Date]("effective_date") == d1)

    val c2 = out.filter("Customer_ID = 'c2'").collect()
    assert(c2.length == 1 && c2(0).getAs[Boolean]("is_current") &&
      c2(0).getAs[Date]("effective_date") == d0)

    val c3 = out.filter("Customer_ID = 'c3'").collect()
    assert(c3.length == 1 && !c3(0).getAs[Boolean]("is_current") &&
      c3(0).getAs[Date]("end_date") == d1)

    val c4 = out.filter("Customer_ID = 'c4'").collect()
    assert(c4.length == 1 && c4(0).getAs[Boolean]("is_current") &&
      c4(0).getAs[Date]("effective_date") == d1)
  }

  test("scd2 null-safe change detection: NULL→value and value→NULL open new versions") {
    val s = spark; import s.implicits._
    val d0 = Date.valueOf("2017-01-01")
    val d1 = Date.valueOf("2017-06-01")
    // tracked attribute nullable on either side (Olist product category is)
    val current = Seq(
      ("p1", Option.empty[String], d0, null.asInstanceOf[Date], true), // NULL → value
      ("p2", Option("toys"), d0, null.asInstanceOf[Date], true),       // value → NULL
      ("p3", Option.empty[String], d0, null.asInstanceOf[Date], true)) // NULL → NULL (no change)
      .toDF("Prod_ID", "Category", "effective_date", "end_date", "is_current")
    val updates = Seq(
      ("p1", Option("beauty")),
      ("p2", Option.empty[String]),
      ("p3", Option.empty[String]))
      .toDF("Prod_ID", "Category")

    val out = Scd2(current, updates, "Prod_ID", Seq("Category"), d1).cache()

    val p1 = out.filter("Prod_ID = 'p1'").orderBy("effective_date").collect()
    assert(p1.length == 2, "NULL→value must close + reopen")
    assert(!p1(0).getAs[Boolean]("is_current") && p1(0).getAs[Date]("end_date") == d1)
    assert(p1(1).getAs[Boolean]("is_current") && p1(1).getAs[String]("Category") == "beauty")

    val p2 = out.filter("Prod_ID = 'p2'").orderBy("effective_date").collect()
    assert(p2.length == 2, "value→NULL must close + reopen")
    assert(!p2(0).getAs[Boolean]("is_current") && p2(0).getAs[String]("Category") == "toys")
    assert(p2(1).getAs[Boolean]("is_current") && p2(1).isNullAt(p2(1).fieldIndex("Category")))

    val p3 = out.filter("Prod_ID = 'p3'").collect()
    assert(p3.length == 1 && p3(0).getAs[Boolean]("is_current") &&
      p3(0).getAs[Date]("effective_date") == d0, "NULL = NULL must carry forward")
    out.unpersist()
  }

  test("scd2 is idempotent for an unchanged re-run of the same batch") {
    val s = spark; import s.implicits._
    val d0 = Date.valueOf("2017-01-01")
    val d1 = Date.valueOf("2017-06-01")
    val current = Seq(("c1", "x", d0, null.asInstanceOf[Date], true))
      .toDF("Customer_ID", "City", "effective_date", "end_date", "is_current")
    val updates = Seq(("c1", "y")).toDF("Customer_ID", "City")
    val once = Scd2(current, updates, "Customer_ID", Seq("City"), d1)
    val twice = Scd2(once, updates, "Customer_ID", Seq("City"), d1)
    // re-applying the same snapshot must not create another version
    assert(twice.count() == once.count())
    assert(twice.filter("is_current").count() == 1)
  }

  test("scd2 as-of: a pre-update instant reconstructs the original dimension exactly") {
    val dir = "/root/testdata/sf0.001"
    val out = Scd2.segmentAsOfDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orig = graft.engine.Tables.customer(spark, dir)
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // as of 2020-03-01 (before the 2020-06-15 update) every key holds its
    // ORIGINAL segment — time travel must recover the raw customer rollup
    assert(out.view.filterKeys(orig.contains).mapValues(_._1).toMap == orig,
      "as-of counts must equal the original per-segment rollup")
    assert(out.keySet == orig.keySet + "SEG_CHANGED",
      "the synthetic changed-segment value exists only in the current state")
    assert(out("SEG_CHANGED")._1 == 0L, "SEG_CHANGED is invisible as of the past date")
    out.foreach { case (seg, (asof, current, drift)) =>
      assert(drift == current - asof, s"drift must be the net change for $seg")
    }
  }
}
