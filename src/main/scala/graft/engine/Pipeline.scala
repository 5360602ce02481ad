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

  /** Stage-level retry (O3 — `Dag/E-commerce_dag.py:92-93`: every task runs
    * with `retries=1, retry_delay=30min`). Re-runs `body` up to `maxRetries`
    * total attempts; stages are idempotent (overwrite sinks) so a re-run after
    * a partial failure is safe, same as the reference's Airflow re-run.
    *
    * @param onRetry observability hook (stage, attempt just failed 1-based, error)
    * @param sleep   injectable delay between attempts (default real sleep) */
  def withRetry[T](stage: String, maxRetries: Int = 2, delayMs: Long = 0L,
      onRetry: (String, Int, Throwable) => Unit = (_, _, _) => (),
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    def attempt(n: Int): T =
      try body
      catch {
        case e: Exception if n < maxRetries =>
          onRetry(stage, n, e)
          if (delayMs > 0) sleep(delayMs)
          attempt(n + 1)
      }
    attempt(1)
  }

  /** Run the full pipeline from an Olist CSV directory.
    * @param onStageComplete notification hook (stage name) — O4 analog.
    * @param stageRetries    total attempts per stage (O3; reference: 2)
    * @param retryDelayMs    delay between attempts (reference: 30 min; 0 here
    *                        so local runs don't stall)
    * @param onRetry         hook fired when a stage attempt fails and will be
    *                        retried */
  def run(spark: SparkSession, csvDir: String, outDir: String,
      writeBronze: Boolean = true,
      onStageComplete: String => Unit = _ => (),
      stageRetries: Int = 2,
      retryDelayMs: Long = 0L,
      onRetry: (String, Int, Throwable) => Unit = (_, _, _) => ()): RunReport = {

    def staged[T](name: String)(body: => T): T = {
      val out = withRetry(name, stageRetries, retryDelayMs, onRetry)(body)
      onStageComplete(name)
      out
    }

    // Bronze: one session, explicit schemas (vs ingestion.py's session-per-table)
    val bronze = Bronze.readAll(spark, csvDir)
    staged("bronze") {
      if (writeBronze)
        bronze.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/bronze/$name") }
    }

    // Silver: 8 cleaned tables, written once each
    val silver = Silver.transformAll(bronze)
    val silverStored = staged("silver") {
      silver.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/silver/$name") }
      // re-read so gold plans scan parquet instead of recomputing the lineage
      silver.keys.map(n => n -> spark.read.parquet(s"$outDir/silver/$n")).toMap
    }

    // Quality gate between silver and gold — halts on violation (O2).
    // Deliberately NOT retried: a data-quality violation is deterministic —
    // re-running it would just re-fail after the delay.
    val checks = Quality.gate(silverStored)
    onStageComplete("quality_checks")

    // Gold: 9 dims + 3 facts
    val dims = GoldDims.all(spark, silverStored)
    // facts are year-partitioned (derived from the yyyyMMdd date SK) so BI
    // date-range queries get partition pruning at the file listing level —
    // the scale lever the reference's unpartitioned JDBC tables never had
    import org.apache.spark.sql.functions.expr
    val facts = Map(
      "fact_sales" -> GoldFacts.factSales(silverStored)
        .withColumn("Order_Year", expr("Order_Date_SK div 10000")),
      "fact_orders" -> GoldFacts.factOrders(silverStored)
        .withColumn("Order_Year", expr("Order_Date_SK div 10000")),
      "fact_reviews" -> GoldFacts.factReviews(silverStored)
        .withColumn("Review_Year", expr("Review_Date_SK div 10000")))
    staged("gold") {
      dims.foreach { case (name, df) => Bronze.writeParquet(df, s"$outDir/gold/$name") }
      facts.foreach { case (name, df) =>
        val partCol = if (name == "fact_reviews") "Review_Year" else "Order_Year"
        Bronze.writeParquet(df, s"$outDir/gold/$name", partitionBy = Seq(partCol))
      }
    }

    val silverRows = silverStored.map { case (n, df) => n -> df.count() }
    RunReport(silverRows, checks, (dims.keys ++ facts.keys).toSeq.sorted)
  }
}
