package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic testdata tables (see /root/repo/TESTDATA.md).
  *
  * The reference ingests CSV with inferred schemas and round-trips every layer
  * through JDBC (reference `spark_jobs/ingestion.py:12-22`,
  * `spark_jobs/transformation.py:13-21`). Our canonical at-rest format is Parquet:
  * vectorized columnar scans, min/max row-group skipping, predicate pushdown and
  * column pruning all come for free, which the reference's JDBC layer never had.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos and truncate to microseconds
    * (`ts div 1000` — integral division; a double division would lose precision
    * on ~1.7e18 nano epochs). Cross-engine comparisons are pinned to MICRO (or
    * coarser) granularity on BOTH engines — oracle session-gap predicates use
    * `epoch_us`, oracle event windows order by `(epoch_us(ts), event_id)`, and
    * everything else truncates to >= seconds — so the truncation here is
    * semantics-neutral vs the oracle even on sub-microsecond fixtures. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
