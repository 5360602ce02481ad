package graft

import java.sql.Timestamp

import graft.engine.{GoldFacts, Quality}

/** Fact grain/measure semantics (reference `spark_jobs/reporting.py:249-409`). */
class GoldFactsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def silverFixture = {
    val s = spark; import s.implicits._
    val orders = Seq(
      ("o1", "c1", "Delivered", ts("2017-03-01 14:30:00"), ts("2017-03-01 15:00:00"),
        ts("2017-03-03 09:00:00"), ts("2017-03-06 11:00:00"), ts("2017-03-10 00:00:00")),
      ("o2", "c2", "Shipped", ts("2017-03-02 09:10:00"), ts("2017-03-02 10:00:00"),
        null, null, ts("2017-03-12 00:00:00")))
      .toDF("Ord_ID", "Cus_ID", "Ord_Status", "Ord_Purchase_Time", "Ord_Approved_At",
        "Ord_Delivered_Carrier_Date", "Ord_Delivered_Customer_Date", "Ord_Estimated_Delivery_Date")
    val items = Seq(
      ("o1", 1, "p1", "s1", ts("2017-03-05 00:00:00"), 50.0, 5.0),
      ("o1", 2, "p2", "s2", ts("2017-03-05 00:00:00"), 30.0, 3.0),
      ("o2", 1, "p1", "s1", ts("2017-03-06 00:00:00"), 20.0, 2.0))
      .toDF("Ord_ID", "Ord_Item_ID", "Prod_ID", "Sell_ID", "Shipping_Limit_Date", "Price", "Freight_Value")
    val payments = Seq(
      ("o1", 1, "credit_card", 3, 88.0),
      ("o2", 1, "boleto", 1, 22.0))
      .toDF("Ord_ID", "Payment_Sequential", "Payment_Type", "Payment_Installments", "Payment_Value")
    val reviews = Seq(
      ("r" * 32, "o1", 5, "great", "loved it", "2017-03-07 10:00:00", ts("2017-03-08 09:00:00")),
      ("q" * 32, "o2", 2, null, "", "2017-03-08 18:00:00", ts("2017-03-10 09:00:00")))
      .toDF("Rev_ID", "Ord_ID", "Rev_Score", "Rev_Comment_Title", "Rev_Comment_Message",
        "Rev_Creation_Date", "Rev_Answer_Timestamp")
    Map("orders" -> orders, "order_items" -> items,
      "order_payments" -> payments, "order_reviews" -> reviews)
  }

  test("fact_sales: order-item grain, date/time SKs, payment rollup broadcast to items") {
    val fs = GoldFacts.factSales(silverFixture)
    assert(fs.count() == 3)
    val o1rows = fs.filter("Order_ID = 'o1'").collect()
    assert(o1rows.length == 2)
    o1rows.foreach { r =>
      assert(r.getAs[Double]("Order_Payment_Value") == 88.0)
      assert(r.getAs[String]("Payment_Type") == "credit_card")
      assert(r.getAs[Int]("Order_Date_SK") == 20170301)
      assert(r.getAs[Int]("Order_Time_SK") == 14)
      assert(r.getAs[Int]("Quantity") == 1)
    }
    assert(o1rows.map(_.getAs[Double]("Sales_Amount")).toSet == Set(50.0, 30.0))
    // deterministic SKs: 1..n over (Order_ID, Order_Item_ID)
    assert(fs.orderBy("Sales_SK").collect().map(_.getAs[Long]("Sales_SK")).toSeq == Seq(1L, 2L, 3L))
  }

  test("fact_orders: order grain with item/payment rollups and delivery day math") {
    val fo = GoldFacts.factOrders(silverFixture)
    assert(fo.count() == 2)
    val o1 = fo.filter("Order_ID = 'o1'").head()
    assert(o1.getAs[Long]("Order_Items_Count") == 2)
    assert(o1.getAs[Double]("Order_Items_Value") == 80.0)
    assert(o1.getAs[Double]("Order_Freight_Value") == 8.0)
    assert(o1.getAs[Int]("Approval_Days") == 0)
    assert(o1.getAs[Int]("Total_Delivery_Days") == 5)
    val o2 = fo.filter("Order_ID = 'o2'").head()
    assert(o2.isNullAt(o2.fieldIndex("Total_Delivery_Days"))) // undelivered → null
  }

  test("fact_reviews: comment flags treat NULL and empty string as no-comment") {
    val fr = GoldFacts.factReviews(silverFixture)
    assert(fr.count() == 2)
    val r1 = fr.filter("Order_ID = 'o1'").head()
    assert(r1.getAs[Int]("Has_Comment") == 1 && r1.getAs[Int]("Has_Title") == 1)
    assert(r1.getAs[Int]("Review_Date_SK") == 20170307)
    assert(r1.getAs[Int]("Response_Days") == 1)
    val r2 = fr.filter("Order_ID = 'o2'").head()
    assert(r2.getAs[Int]("Has_Comment") == 0 && r2.getAs[Int]("Has_Title") == 0)
  }

  test("quality gate: passes on clean silver, throws on violations") {
    val s = spark; import s.implicits._
    val silver = silverFixture
    val results = Quality.gate(silver)
    assert(results.forall(_.passed))
    val badItems = Seq((null.asInstanceOf[String], 1, "p1", "s1", ts("2017-03-05 00:00:00"), 1.0, 1.0))
      .toDF("Ord_ID", "Ord_Item_ID", "Prod_ID", "Sell_ID", "Shipping_Limit_Date", "Price", "Freight_Value")
    val ex = intercept[IllegalArgumentException] {
      Quality.gate(silver + ("order_items" -> badItems))
    }
    assert(ex.getMessage.contains("Ord_ID"))
  }
}
