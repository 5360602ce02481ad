package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Decimal helpers for oracle-exact arithmetic.
  *
  * The driver hash-compares our parquet output against DuckDB. Floating-point
  * aggregation is order-dependent, so a `sum(double)` can differ in the last bits
  * between engines. All money-like source columns carry exactly 2 decimal digits,
  * so casting each element to DECIMAL(18,2) *before* aggregating makes every sum
  * exact and order-independent in both engines (the same trick the reference's
  * author intended with DECIMAL(10,2) in `Dag/sql/create_table.sql:11-16`).
  */
object Dec {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D18_4: DecimalType = DecimalType(18, 4)

  /** Element-level cast of a 2-dp double column to exact decimal. */
  def d2(c: Column): Column = c.cast(D18_2)

  /** Exact, order-independent sum of a 2-dp money column. Final cast back to
    * DOUBLE: the exact decimal sum converts to the nearest double identically in
    * Spark and DuckDB, and DOUBLE round-trips unambiguously through parquet,
    * pandas, and DuckDB result frames (DECIMAL does not — DuckDB's client layer
    * coerces it to float while parquet keeps decimal128). */
  def sum2(c: Column): Column = sum(d2(c)).cast("double")

  /** Exact revenue term x * (1 - y) summed at scale 4 (e.g. price * (1-discount)). */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(d2(price) * (lit(1).cast(DecimalType(4, 2)) - d2(discount))).cast("double")
}
