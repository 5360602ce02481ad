package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffling fact tables into hash buckets on
  * their join key so repeated fact⋈fact / fact⋈rollup joins run with NO
  * exchange on either side — the co-located-join lever for 100 TB (pay the
  * shuffle once at write time, never again at read time).
  *
  * Uses Spark's native parquet data-source bucketing (`bucketBy` + `sortBy` +
  * `saveAsTable`; no Hive dependency — the in-memory catalog + warehouse dir
  * suffice). The reference's Postgres tables have no equivalent; every join
  * re-shuffles there.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table on `key`. Drops any stale
    * table/location first (an orphan warehouse dir from a previous JVM would
    * otherwise fail CREATE with LOCATION_ALREADY_EXISTS). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 32): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Fs.rmTree(new java.io.File(warehouse, table).getPath)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True iff the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for "this join is co-located". */
  def hasShuffleExchange(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
