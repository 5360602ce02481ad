package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end bronze → silver → gold pipeline — the engine-native replacement
  * for the reference's 10-task Airflow DAG (`Dag/E-commerce_dag.py:220-222`):
  * plain sequencing, quality gate between silver and gold, Parquet sinks in a
  * medallion directory layout (`out/{bronze,silver,gold}/`), idempotent by
  * overwrite like the reference's 30-minute re-runs.
  *
  * Side-effect hooks replace the DAG's email notification tasks (O4).
  */
object Pipeline {

  final case class RunReport(
      silverRows: Map[String, Long],
      qualityChecks: Seq[Quality.CheckResult],
      goldTables: Seq[String])

  /** Run the full pipeline from an Olist CSV directory.
    * @param onStageComplete notification hook (stage name) — O4 analog. */
  def run(spark: SparkSession, csvDir: String, outDir: String,
      writeBronze: Boolean = true,
      onStageComplete: String => Unit = _ => ()): RunReport = {

    // Bronze: one session, explicit schemas (vs ingestion.py's session-per-table)
    val bronze = Bronze.readAll(spark, csvDir)
    if (writeBronze)
      bronze.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/bronze/$name") }
    onStageComplete("bronze")

    // Silver: 8 cleaned tables, written once each
    val silver = Silver.transformAll(bronze)
    silver.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/silver/$name") }
    // re-read so gold plans scan parquet instead of recomputing the lineage
    val silverStored = silver.keys.map(n => n -> spark.read.parquet(s"$outDir/silver/$n")).toMap
    onStageComplete("silver")

    // Quality gate between silver and gold — halts on violation (O2)
    val checks = Quality.gate(silverStored)
    onStageComplete("quality_checks")

    // Gold: 9 dims + 3 facts
    val dims = GoldDims.all(spark, silverStored)
    dims.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/gold/$name") }
    // facts are year-partitioned (derived from the yyyyMMdd date SK) so BI
    // date-range queries get partition pruning at the file listing level —
    // the scale lever the reference's unpartitioned JDBC tables never had
    import org.apache.spark.sql.functions.{col, expr}
    val facts = Map(
      "fact_sales" -> GoldFacts.factSales(silverStored)
        .withColumn("Order_Year", expr("Order_Date_SK div 10000")),
      "fact_orders" -> GoldFacts.factOrders(silverStored)
        .withColumn("Order_Year", expr("Order_Date_SK div 10000")),
      "fact_reviews" -> GoldFacts.factReviews(silverStored)
        .withColumn("Review_Year", expr("Review_Date_SK div 10000")))
    facts.foreach { case (name, df) =>
      val partCol = if (name == "fact_reviews") "Review_Year" else "Order_Year"
      Bronze.writeParquet(df, s"$outDir/gold/$name", partitionBy = Seq(partCol))
    }
    onStageComplete("gold")

    val silverRows = silverStored.map { case (n, df) => n -> df.count() }
    RunReport(silverRows, checks, (dims.keys ++ facts.keys).toSeq.sorted)
  }
}
