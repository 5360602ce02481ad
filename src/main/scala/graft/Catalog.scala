package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.RelOps

/** One named query per implemented operator (SURVEY.md §2), with the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Conventions that make the hash-compare deterministic (SURVEY §7.4):
  *  - money aggregates cast element-wise to DECIMAL(18,2) before summing
  *    (exact, order-independent in both engines — see [[graft.engine.Dec]]);
  *  - integer-typed derived columns pinned to INT/BIGINT on both sides;
  *  - every ranked/limited output carries a full tie-break ordering;
  *  - no monotonically_increasing_id / current_timestamp / nondeterministic first().
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {

  private def q(name: String, run: (SparkSession, String) => DataFrame, sql: String) =
    QueryDef(name, run, Some(sql))

  val relational: Seq[QueryDef] = Seq(
    q("q01_pricing_summary", RelOps.pricingSummary,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    q("q02_filter_project", RelOps.filterProject,
      """SELECT o_orderkey AS okey, o_custkey AS ckey,
        |  o_totalprice AS total,
        |  CAST(year(o_orderdate) AS INT) AS oyear
        |FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        |ORDER BY okey""".stripMargin),

    q("q03_per_order_agg_join", RelOps.perOrderAggJoin,
      """SELECT o_orderkey, o_custkey,
        |  o_totalprice AS total,
        |  order_revenue, n_items, last_ship
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue,
        |        COUNT(*) AS n_items,
        |        MAX(l_shipdate) AS last_ship
        |      FROM lineitem GROUP BY l_orderkey) li
        |  ON o_orderkey = li.l_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    q("q04_dedup_keyed", RelOps.dedupKeyed,
      """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin),

    q("q05_distinct", RelOps.distinctRows,
      """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin),

    q("q06_date_spine", RelOps.dateSpine,
      """WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS mn, CAST(max(o_orderdate) AS DATE) AS mx FROM orders),
        |s AS (SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d FROM b)
        |SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_sk,
        |  d AS date,
        |  CAST(year(d) AS INT) AS year, CAST(month(d) AS INT) AS month,
        |  CAST(quarter(d) AS INT) AS quarter, CAST(day(d) AS INT) AS day_of_month,
        |  CAST(week(d) AS INT) AS week_of_year,
        |  monthname(d) AS month_name, dayname(d) AS day_name,
        |  isodow(d) IN (6, 7) AS is_weekend
        |FROM s ORDER BY date_sk""".stripMargin),

    q("q07_when_chain", RelOps.whenChainClassifier,
      """SELECT CASE WHEN l_quantity < 10 THEN 'XS'
        |            WHEN l_quantity < 25 THEN 'S'
        |            WHEN l_quantity < 40 THEN 'M'
        |            ELSE 'L' END AS qty_band,
        |  l_returnflag, COUNT(*) AS n
        |FROM lineitem WHERE l_returnflag IN ('A', 'N')
        |GROUP BY qty_band, l_returnflag
        |ORDER BY qty_band, l_returnflag""".stripMargin),

    q("q08_string_funcs", RelOps.stringFuncs,
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |  p_brand || ':' || p_type AS brand_type,
        |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
        |  substring(p_name, 1, 3) AS prefix3
        |FROM part ORDER BY p_partkey""".stripMargin),

    q("q09_regex_filter", RelOps.regexFilter,
      """SELECT p_brand, COUNT(*) AS n_clean
        |FROM part
        |WHERE regexp_matches(p_name, '^[a-z]+ [a-z]+$')
        |  AND NOT regexp_matches(p_type, '[^A-Z ]')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    q("q10_yoy_window", RelOps.yoyRevenue,
      """WITH yearly AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS oyear,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY oyear)
        |SELECT oyear, revenue,
        |  lag(revenue, 1) OVER (ORDER BY oyear) AS prev_revenue,
        |  revenue - lag(revenue, 1) OVER (ORDER BY oyear) AS yoy_diff
        |FROM yearly ORDER BY oyear""".stripMargin),

    q("q11_topk_parts", RelOps.topKParts,
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS part_revenue
        |  FROM lineitem GROUP BY l_partkey),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (ORDER BY part_revenue DESC, l_partkey) AS INT) AS rank
        |  FROM rev)
        |SELECT rank, p_partkey, p_name, part_revenue
        |FROM ranked JOIN part ON l_partkey = p_partkey
        |WHERE rank <= 10 ORDER BY rank""".stripMargin),

    q("q12_share_of_total", RelOps.shareOfTotal,
      """WITH rev AS (
        |  SELECT n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS nrd
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name,
        |  CAST(nrd AS DOUBLE) AS nation_rev,
        |  CAST(SUM(nrd) OVER () AS DOUBLE) AS total_rev,
        |  round(CAST(nrd AS DOUBLE) * 100.0 / CAST(SUM(nrd) OVER () AS DOUBLE), 4) AS pct
        |FROM rev ORDER BY n_name""".stripMargin),

    q("q13_sort_limit", RelOps.sortLimit,
      """SELECT o_orderkey, o_totalprice AS total
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin),

    q("q14_set_ops", RelOps.setOps,
      """WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT nk, 'both' AS tag FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        |UNION ALL
        |SELECT nk, 'customer_only' AS tag FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        |UNION ALL
        |SELECT nk, 'supplier_only' AS tag FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c)
        |ORDER BY nk, tag""".stripMargin),

    q("q15_anti_join", RelOps.antiJoin,
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin),

    q("q16_outer_join_agg", RelOps.outerJoinAgg,
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS lifetime_value
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    q("q17_global_minmax", RelOps.globalMinMax,
      """SELECT CAST(min(o_orderdate) AS DATE) AS min_date,
        |  CAST(max(o_orderdate) AS DATE) AS max_date,
        |  COUNT(*) AS n_rows
        |FROM orders""".stripMargin),

    q("q18_quality_gate", RelOps.qualityGate,
      """SELECT COUNT(*) AS total_rows,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
        |  COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_orderkeys
        |FROM orders""".stripMargin),

    q("q19_star_join", RelOps.starJoin,
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1997
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin),

    q("q20_date_parts", RelOps.datePartsAgg,
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
        |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin),

    q("q21_running_total", RelOps.runningTotal,
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),

    q("q22_range_join", RelOps.rangeJoin,
      """SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS band_qty
        |FROM lineitem
        |JOIN (VALUES ('B1_under10', 0.0, 10.0), ('B2_10to25', 10.0, 25.0),
        |             ('B3_25to40', 25.0, 40.0), ('B4_40plus', 40.0, 51.0)) AS b(band, lo, hi)
        |  ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY band ORDER BY band""".stripMargin),

    q("q23_surrogate_dim", RelOps.surrogateDim,
      """SELECT CAST(row_number() OVER (ORDER BY segment) AS INT) AS segment_sk, segment
        |FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)
        |ORDER BY segment_sk""".stripMargin),
  )

  val all: Seq[QueryDef] = relational

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
