package graft

import java.nio.file.{Files, Paths}

import graft.engine.{Analytics, Pipeline}
import org.apache.spark.sql.functions._

/** End-to-end bronze→silver→gold over tiny Olist-shaped CSVs. */
class PipelineSpec extends SparkSuite {

  private val csvDir = "/tmp/graft_olist_csv"
  private val outDir = "/tmp/graft_olist_out"

  private def write(name: String, content: String): Unit = {
    Files.createDirectories(Paths.get(csvDir))
    Files.writeString(Paths.get(s"$csvDir/$name"), content)
  }

  private def fixtures(): Unit = {
    val id = "x" * 32
    write("olist_customers_dataset.csv",
      s"""customer_id,customer_unique_id,customer_zip_code_prefix,customer_city,customer_state
         |c1,u1,13023,campinas,SP
         |c2,u2,20000,rio de janeiro,RJ""".stripMargin)
    write("olist_orders_dataset.csv",
      s"""order_id,customer_id,order_status,order_purchase_timestamp,order_approved_at,order_delivered_carrier_date,order_delivered_customer_date,order_estimated_delivery_date
         |o1,c1,delivered,2017-03-01 14:30:00,2017-03-01 15:00:00,2017-03-03 09:00:00,2017-03-06 11:00:00,2017-03-10 00:00:00
         |o2,c2,shipped,2017-04-02 09:10:00,2017-04-02 10:00:00,,,2017-04-12 00:00:00""".stripMargin)
    write("olist_order_items_dataset.csv",
      s"""order_id,order_item_id,product_id,seller_id,shipping_limit_date,price,freight_value
         |o1,1,p1,s1,2017-03-05 00:00:00,50.0,5.0
         |o2,1,p1,s1,2017-04-06 00:00:00,20.0,2.0""".stripMargin)
    write("olist_order_payments_dataset.csv",
      s"""order_id,payment_sequential,payment_type,payment_installments,payment_value
         |o1,1,credit_card,3,55.0
         |o2,1,boleto,1,22.0""".stripMargin)
    write("olist_order_reviews_dataset.csv",
      s"""review_id,order_id,review_score,review_comment_title,review_comment_message,review_creation_date,review_answer_timestamp
         |$id,o1,5,great,loved it,2017-03-07 10:00:00,2017-03-08 09:00:00""".stripMargin)
    write("olist_products_dataset.csv",
      s"""product_id,product_category_name,product_name_lenght,product_description_lenght,product_photos_qty,product_weight_g,product_length_cm,product_height_cm,product_width_cm
         |p1,cama_mesa_banho,40,200,2,800,30,10,20""".stripMargin)
    write("olist_sellers_dataset.csv",
      s"""seller_id,seller_zip_code_prefix,seller_city,seller_state
         |s1,1001,sao paulo,SP""".stripMargin)
    write("olist_geolocation_dataset.csv",
      s"""geolocation_zip_code_prefix,geolocation_lat,geolocation_lng,geolocation_city,geolocation_state
         |13023,-22.9,-47.06,campinas,SP
         |13023,-22.91,-47.07,campinas,SP
         |20000,-22.95,-43.2,rio de janeiro,RJ""".stripMargin)
    write("product_category_name_translation.csv",
      s"""product_category_name,product_category_name_english
         |cama_mesa_banho,bed_bath_table""".stripMargin)
  }

  test("pipeline run: all layers written, gates pass, facts and analytics query") {
    fixtures()
    val stages = scala.collection.mutable.ArrayBuffer.empty[String]
    val report = Pipeline.run(spark, csvDir, outDir, onStageComplete = stages += _)

    assert(stages.toSeq == Seq("bronze", "silver", "quality_checks", "gold"))
    assert(report.qualityChecks.forall(_.passed))
    assert(report.silverRows("orders") == 2)
    assert(report.goldTables.size == 12) // 9 dims + 3 facts

    val factSales = spark.read.parquet(s"$outDir/gold/fact_sales")
    assert(factSales.count() == 2)
    val dimGeo = spark.read.parquet(s"$outDir/gold/dim_geography")
    assert(dimGeo.count() == 2) // zip-deduped
    val dimDate = spark.read.parquet(s"$outDir/gold/dim_date")
    // spine spans o1..o2 purchase dates (2017-03-01 .. 2017-04-02) = 33 days
    assert(dimDate.count() == 33)

    // analytics over the produced star schema
    val top = Analytics.topProducts(factSales, n = 5).collect()
    assert(top.head.getAs[String]("Product_ID") == "p1")
    assert(top.head.getAs[Double]("Product_Sales") == 70.0)
    val factOrders = spark.read.parquet(s"$outDir/gold/fact_orders")
    val kpis = Analytics.deliveryKpis(factOrders).head()
    assert(kpis.getAs[Long]("Total_Orders") == 2)
    assert(kpis.getAs[Long]("Late_Deliveries") == 0)
  }

  test("idempotence: a second run overwrites cleanly with identical results") {
    fixtures()
    Pipeline.run(spark, csvDir, outDir)
    val first = spark.read.parquet(s"$outDir/gold/fact_orders")
      .orderBy("Order_SK").collect().map(_.toString).toSeq
    Pipeline.run(spark, csvDir, outDir)
    val second = spark.read.parquet(s"$outDir/gold/fact_orders")
      .orderBy("Order_SK").collect().map(_.toString).toSeq
    assert(first == second)
  }
}
