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

  test("live JDBC roundtrip: nation survives embedded-Derby write/read byte-for-byte; overwrite is repeatable") {
    val dir = "/root/testdata/sf0.001"
    val direct = graft.engine.Tables.nation(spark, dir)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        min(col("n_name")).as("first_nation"),
        sum(col("n_nationkey")).as("key_sum"))
      .orderBy("n_regionkey").collect().map(_.toString).toSeq
    val viaJdbc = graft.engine.Bronze.jdbcRoundtripNation(spark, dir)
      .collect().map(_.toString).toSeq
    assert(viaJdbc == direct, "the JDBC write+read path must be lossless vs the parquet source")
    // S2 is OVERWRITE semantics: a second full write must drop+recreate, not append
    val again = graft.engine.Bronze.jdbcRoundtripNation(spark, dir)
      .collect().map(_.toString).toSeq
    assert(again == direct, "a repeated overwrite must not duplicate rows")
  }

  test("corrupt CSV rows: PERMISSIVE captures them, DROPMALFORMED drops them") {
    val dir = new java.io.File("/tmp/graft_sink/bad_csv")
    rmTree(dir.toString); dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, "part.csv"))
    w.println("id,amount"); w.println("1,10.5"); w.println("2,NOT_A_NUMBER")
    w.println("3,30.0"); w.close()
    val schema = "id INT, amount DOUBLE, _corrupt_record STRING"
    val permissive = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(dir.toString)
      .cache() // corrupt-record column requires the parsed+raw rows to coexist
    try {
      assert(permissive.count() == 3, "PERMISSIVE keeps every row")
      val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
      assert(bad.length == 1 && bad.head.getAs[String]("_corrupt_record").contains("NOT_A_NUMBER"))
      assert(permissive.filter(col("amount").isNotNull).count() == 2)
    } finally permissive.unpersist()
    val dropped = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema("id INT, amount DOUBLE").csv(dir.toString)
    // collect(), not count(): CSV column pruning would skip parsing `amount`
    // for a count-only plan, and an unparsed field can't be detected malformed
    assert(dropped.collect().length == 2, "DROPMALFORMED silently removes the bad row")
  }

  test("typed JSON parsing: malformed and key-missing payloads yield NULL, not errors") {
    val s = spark; import s.implicits._
    // events fixture with raw nano timestamps (Tables.events divides to micros)
    Seq(
      (1L, 1700000000000000000L, 10L, "click", 1.0, """{"k": 42}"""),
      (2L, 1700000001000000000L, 10L, "click", 1.0, "not json at all"),
      (3L, 1700000002000000000L, 10L, "click", 1.0, """{"other": 7}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet("/tmp/graft_sink/json_typed/events.parquet")
    val rows = graft.engine.RelOps.jsonTyped(spark, "/tmp/graft_sink/json_typed").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Integer]("k")).map(_.toInt), r.getAs[Boolean]("parsed_ok"))).toMap
    assert(rows(1L) == ((Some(42), true)))
    assert(rows(2L) == ((None, false)), "malformed JSON -> NULL struct, no exception")
    assert(rows(3L) == ((None, false)), "missing key -> NULL field")
  }

  test("parquet schema evolution: mergeSchema unions columns across batches") {
    val base = "/tmp/graft_sink/evolve"
    rmTree(base)
    val s = spark; import s.implicits._
    Seq((1L, "a")).toDF("id", "old_col").write.parquet(s"$base/b1")
    Seq((2L, 9.5)).toDF("id", "new_col").write.parquet(s"$base/b2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/b1", s"$base/b2")
    assert(merged.columns.sorted.toSeq == Seq("id", "new_col", "old_col"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("old_col") == "a" && rows(0).isNullAt(rows(0).fieldIndex("new_col")))
    assert(rows(1).getAs[Double]("new_col") == 9.5 && rows(1).isNullAt(rows(1).fieldIndex("old_col")))
  }
}
