package graft

import org.apache.spark.sql.functions._

/** Multi-format sink/source round-trips (SURVEY §2.1 source/sink inventory
  * beyond parquet: csv, json, orc). */
class SinksSpec extends SparkSuite {

  test("csv/json/orc round-trip a projected orders table losslessly") {
    val src = graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val expected = src.orderBy("o_orderkey").collect().map(_.toString).toSeq
    val schema = src.schema

    src.write.mode("overwrite").option("header", "true").csv("/tmp/graft_sink/csv")
    val csvBack = spark.read.option("header", "true").schema(schema).csv("/tmp/graft_sink/csv")
    assert(csvBack.orderBy("o_orderkey").collect().map(_.toString).toSeq == expected)

    src.write.mode("overwrite").json("/tmp/graft_sink/json")
    val jsonBack = spark.read.schema(schema).json("/tmp/graft_sink/json")
    assert(jsonBack.orderBy("o_orderkey").collect().map(_.toString).toSeq == expected)

    src.write.mode("overwrite").orc("/tmp/graft_sink/orc")
    val orcBack = spark.read.orc("/tmp/graft_sink/orc")
    assert(orcBack.orderBy("o_orderkey").collect().map(_.toString).toSeq == expected)
  }
}
