package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gates: the reference runs these as SQL in Postgres from Airflow
  * (`Dag/E-commerce_dag.py:11-47`) and raises to halt the DAG (`:49-77`); here
  * they are Spark aggregates over the silver DataFrames, halting via exception —
  * no external store, no process boundary (SURVEY §2.11 O2, §2.5 A5).
  */
object Quality {

  final case class CheckResult(name: String, violations: Long) {
    def passed: Boolean = violations == 0L
  }

  /** null checks on order_items keys (`E-commerce_dag.py:22-29`). */
  def checkOrderItems(silverItems: DataFrame): Seq[CheckResult] = {
    val row = silverItems.agg(
      sum(when(col("Ord_ID").isNull, 1).otherwise(0)).cast("long").as("null_ord"),
      sum(when(col("Prod_ID").isNull, 1).otherwise(0)).cast("long").as("null_prod")).head()
    Seq(
      CheckResult("order_items.Ord_ID not null", row.getLong(0)),
      CheckResult("order_items.Prod_ID not null", row.getLong(1)))
  }

  /** null + 32-char-id checks on order_reviews (`E-commerce_dag.py:30-37`). */
  def checkOrderReviews(silverReviews: DataFrame): Seq[CheckResult] = {
    val row = silverReviews.agg(
      sum(when(col("Rev_ID").isNull, 1).otherwise(0)).cast("long").as("null_rev"),
      sum(when(length(col("Rev_ID")) =!= 32, 1).otherwise(0)).cast("long").as("bad_len")).head()
    Seq(
      CheckResult("order_reviews.Rev_ID not null", row.getLong(0)),
      CheckResult("order_reviews.Rev_ID length = 32", row.getLong(1)))
  }

  /** Generic gate: uniqueness of a key column (engine extension — the check the
    * reference's dedup makes trivially true). */
  def checkUniqueKey(df: DataFrame, key: String): CheckResult = {
    val row = df.agg((count(lit(1)) - countDistinct(col(key))).as("dups")).head()
    CheckResult(s"$key unique", row.getLong(0))
  }

  /** Run all reference gates; throws like the DAG's ValueError on failure
    * (`E-commerce_dag.py:69-77`). */
  def gate(silver: Map[String, DataFrame]): Seq[CheckResult] = {
    val results = checkOrderItems(silver("order_items")) ++
      checkOrderReviews(silver("order_reviews"))
    val failed = results.filterNot(_.passed)
    require(failed.isEmpty,
      s"quality gate failed: ${failed.map(r => s"${r.name} (${r.violations} violations)").mkString("; ")}")
    results
  }
}
