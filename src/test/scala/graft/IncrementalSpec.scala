package graft

import java.nio.file.{Files, Paths}

import graft.streaming.IncrementalPipeline

/** Incremental ingestion semantics: each landed file processed exactly once. */
class IncrementalSpec extends SparkSuite {

  private val srcDir = "/tmp/graft_incr_src"
  private val outDir = "/tmp/graft_incr_out"

  private def land(name: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(srcDir))
    val header = "order_id,customer_id,order_status,order_purchase_timestamp," +
      "order_approved_at,order_delivered_carrier_date,order_delivered_customer_date," +
      "order_estimated_delivery_date"
    Files.writeString(Paths.get(s"$srcDir/$name"), (header +: rows).mkString("\n"))
  }

  test("streaming medallion: second batch appends without reprocessing the first") {
    def rm(p: String): Unit = {
      val f = new java.io.File(p)
      if (f.isDirectory) f.listFiles().foreach(c => rm(c.getPath))
      f.delete()
    }
    rm(srcDir); rm(outDir)

    land("batch1.csv", Seq(
      "o1,c1,delivered,2017-03-01 14:30:00,2017-03-01 15:00:00,,,2017-03-10 00:00:00",
      "o2,c2,shipped,2017-03-02 09:10:00,2017-03-02 10:00:00,,,2017-03-12 00:00:00"))
    IncrementalPipeline.runOrdersAvailableNow(spark, srcDir, outDir)
    val afterFirst = spark.read.parquet(s"$outDir/silver/orders")
    assert(afterFirst.count() == 2)
    assert(afterFirst.filter("Ord_Status = 'Delivered'").count() == 1) // initcap applied

    land("batch2.csv", Seq(
      "o3,c3,invoiced,2017-03-03 11:00:00,2017-03-03 12:00:00,,,2017-03-13 00:00:00"))
    IncrementalPipeline.runOrdersAvailableNow(spark, srcDir, outDir)
    val afterSecond = spark.read.parquet(s"$outDir/silver/orders")
    assert(afterSecond.count() == 3) // appended exactly once, batch1 not re-read
    assert(afterSecond.select("Ord_ID").distinct().count() == 3)
  }
}
