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
    Fs.readParquet(spark, s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `events.ts` normalized to session-zoned TIMESTAMP at microsecond
    * granularity, whatever physical type the generated parquet carries:
    *
    *  - TIMESTAMP(NANOS): Spark 4's reader rejects it ([PARQUET_TYPE_ILLEGAL]),
    *    so `nanosAsLong` surfaces raw nano longs which we truncate to micros
    *    (`ts div 1000` — integral division; a double division would lose
    *    precision on ~1.7e18 nano epochs);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers TIMESTAMP_NTZ;
    *    cast to TIMESTAMP — micros-identical under the UTC session timezone
    *    every entrypoint pins, and keeps `unix_micros`/`window()` downstream
    *    working unchanged;
    *  - TIMESTAMP(MICROS, adjusted): already the type we want.
    *
    * Cross-engine comparisons are pinned to MICRO (or coarser) granularity on
    * BOTH engines — oracle session-gap predicates use `epoch_us`, oracle event
    * windows order by `(epoch_us(ts), event_id)`, and everything else
    * truncates to >= seconds — so the normalization here is semantics-neutral
    * vs the oracle even on sub-microsecond fixtures. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
