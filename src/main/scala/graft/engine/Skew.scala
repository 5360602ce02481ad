package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (hot
  * customers, boilerplate band hashes, …).
  *
  * AQE's skew-join splitting (enabled in our sessions) handles most cases at
  * runtime; [[saltedJoin]] is the explicit form for when a key is so hot that
  * even a split partition overwhelms one task, or when AQE is unavailable
  * (streaming state, non-AQE deployments): the large side scatters each key
  * across `saltFactor` sub-keys, the small side is replicated `saltFactor`×,
  * and the join runs on (key, salt) — same rows out, `saltFactor`-way finer
  * parallelism on the hot key.
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * Result is row-identical to `large.join(small, key)` (inner). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val spark = large.sparkSession
    import spark.implicits._
    val salted = large.withColumn("__salt", (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(lit((0 until saltFactor).toArray)))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Key-frequency profile: the observability query that decides whether a
    * join needs salting (top keys + their share of rows). */
  def keyProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = Window.partitionBy()
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .withColumn("pct_of_total",
        round(col("n_rows") * 100.0 / sum(col("n_rows")).over(total), 2))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }

  private val Window = org.apache.spark.sql.expressions.Window
}
