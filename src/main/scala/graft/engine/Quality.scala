package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Declarative expectation suite (q128): each check is an AGGREGATE
    * expression yielding its violation count, so an arbitrary rule set
    * evaluates in ONE table scan (the Deequ-style "analyzer batch" shape —
    * at 100 TB the scan dominates, so rules must share it, never re-scan per
    * rule). The wide 1-row aggregate is unpivoted to (rule_name, violations,
    * passed) rows via stack. */
  def expect(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, c), i) => c.cast("long").as(s"_r$i") }
    val stackExpr = s"stack(${checks.size}, " +
      checks.zipWithIndex.map { case ((n, _), i) => s"'$n', _r$i" }.mkString(", ") +
      ") AS (rule_name, violations)"
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(stackExpr))
      .withColumn("passed", col("violations") === 0L)
      .orderBy("rule_name")
  }

  /** The orders expectation suite behind q128: null / uniqueness / range /
    * domain / date-window rules, all in one pass over orders. */
  def orderExpectations(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    expect(Tables.orders(spark, dir), Seq(
      "orderkey_not_null" -> sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
      "orderkey_unique" -> (count(lit(1)) - countDistinct(col("o_orderkey"))),
      "totalprice_in_range" -> sum(when(col("o_totalprice") < 0 ||
        col("o_totalprice") > 1000000, 1L).otherwise(0L)),
      "status_in_domain" -> sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)),
      "orderdate_in_window" -> sum(when(
        col("o_orderdate") < lit("1992-01-01").cast("timestamp") ||
          col("o_orderdate") >= lit("2002-01-01").cast("timestamp"), 1L).otherwise(0L))))

  /** Order-independent table fingerprint (q129): per-group bit_xor of 60-bit
    * md5 row hashes over a CANONICAL string encoding. XOR is commutative and
    * associative, so the checksum is independent of partitioning, row order,
    * and merge order — two replicas (or a table before/after a rewrite,
    * compaction, or engine migration) compare by exchanging one row per
    * group, never by sorting or co-locating 100 TB. Doubles enter via the
    * exact DECIMAL(18,2) rendering and timestamps via the DATE rendering, the
    * two canonical forms both engines print identically; NULLs via a sentinel
    * (concat_ws would silently drop them, aliasing (NULL,'x') with ('x',NULL)). */
  def tableFingerprint(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        call_function("graft_md5_prefix", concat_ws("|",
          coalesce(col("o_orderkey").cast("string"), lit("\\N")),
          coalesce(col("o_custkey").cast("string"), lit("\\N")),
          coalesce(col("o_orderstatus"), lit("\\N")),
          coalesce(col("o_totalprice").cast(Dec.D18_2).cast("string"), lit("\\N")),
          coalesce(col("o_orderdate").cast("date").cast("string"), lit("\\N"))),
          lit(15)).as("fp"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(fp)").as("fingerprint"))
      .orderBy("o_orderpriority")
  }

  /** Merkle RANGE diff (q208) — [[tableFingerprint]]'s flat checksum upgraded
    * to the hierarchical anti-entropy protocol two 100 TB replicas actually
    * run: doc-id ranges fingerprint at three granularities (leaf = 64 ids,
    * mid = 8 leaves, top = 8 mids), replicas compare TOP summaries first and
    * drill into a subtree only where it differs, so reconciliation moves
    * O(diff · log n) fingerprints instead of re-hashing either corpus against
    * the other. The "replica" is derived in-query with a deterministic
    * planted corruption (docs with doc_id % 97 = 13 carry a mutated text);
    * output is the narrowed-down DIFFERING LEAF ranges.
    *
    * One corpus scan builds the leaf table (xor of 60-bit md5-derived row
    * hashes — commutative, so map-side combinable and order-independent,
    * same domain as q129); every level above is leaf-count-sized arithmetic.
    * The drill-down is exact up to xor cancellation between sibling diffs
    * (two corrupted leaves under one mid whose 60-bit diffs xor to zero,
    * P ≈ 2⁻⁶⁰ per pair — the standard Merkle-summary trade; the fixed
    * fixture corpus is verified non-degenerate by the oracle, which computes
    * the leaf diff DIRECTLY with no hierarchy). */
  def merkleRangeDiff(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    def rowHash(text: Column): Column =
      call_function("graft_md5_prefix",
        concat(col("doc_id").cast("string"), lit("|"), text), lit(15))
    val mutated = when(col("doc_id") % 97 === 13,
      concat(col("text"), lit(" replica-corruption"))).otherwise(col("text"))
    // the leaf table feeds THREE consumers (top summary, mid summary, final
    // leaf filter) — materialized once per call so the corpus scan+aggregate
    // runs once, not per lineage path (the clustersFromPairs round-trip
    // discipline; importanceWeights dropped its round-trip in r14 when its
    // consumer count fell to two); in the deployed protocol this table IS
    // the at-rest per-replica fingerprint artifact
    val leavesPath = graft.engine.Fs.overwriteVersioned(
      s"graft_merkle_${graft.engine.Fs.dirTag(dir)}") { p =>
      Tables.documents(spark, dir)
        .select(expr("doc_id div 64").as("leaf"),
          rowHash(col("text")).as("h_base"), rowHash(mutated).as("h_repl"))
        .groupBy(col("leaf"))
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(h_base)").as("fp_base"), expr("bit_xor(h_repl)").as("fp_repl"))
        .withColumn("mid", expr("leaf div 8"))
        .withColumn("top", expr("mid div 8"))
        .write.mode("overwrite").parquet(p)
    }
    val leaves = spark.read.parquet(leavesPath)
    // drill-down: tops that differ → their mids that differ → their leaves.
    // Each summary table is leaf-count-sized; the semi-join chain is the
    // log-depth narrowing a replica pair exchanges over the network.
    val topDiff = leaves.groupBy(col("top"))
      .agg(expr("bit_xor(fp_base)").as("t_base"), expr("bit_xor(fp_repl)").as("t_repl"))
      .filter(col("t_base") =!= col("t_repl")).select(col("top"))
    val midDiff = leaves.join(broadcast(topDiff), Seq("top"), "left_semi")
      .groupBy(col("mid"))
      .agg(expr("bit_xor(fp_base)").as("m_base"), expr("bit_xor(fp_repl)").as("m_repl"))
      .filter(col("m_base") =!= col("m_repl")).select(col("mid"))
    leaves.join(broadcast(midDiff), Seq("mid"), "left_semi")
      .filter(col("fp_base") =!= col("fp_repl"))
      .select(col("leaf"), (col("leaf") * 64).as("id_lo"),
        col("n_docs"), col("fp_base"), col("fp_repl"))
      .orderBy("leaf")
  }

  /** Right-to-erasure delete propagation (q214) — the compliance op every
    * production store runs: a deterministic erasure-request set
    * (c_custkey % 59 = 3) cascades through the FK graph
    * customer → orders → lineitem, and the audit reports, per table, rows
    * before / purged / after — the deletion datasheet an erasure run files
    * (a cascade that forgot a level would leave dangling children, which
    * [[referentialIntegrity]] then flags; the lineitem level here derives
    * from purged ORDERS, so the chain cannot skip).
    *
    * Scale shape: in deployment the request set is request-bounded (tiny →
    * AQE broadcasts it); in THIS simulation the doomed set is a fixed 1/59
    * modular slice of orders — corpus-proportional, not request-bounded —
    * so no broadcast hint is forced and AQE decides from the runtime size.
    * Each table pays ONE membership pass (purged = semi, survivors = anti,
    * both from the same conditional aggregate where possible). The lineitem
    * level derives membership from the purged ORDER key set, never by
    * joining lineitem to customer. */
  def deletePropagation(spark: org.apache.spark.sql.SparkSession, dir: String,
      mod: Int = 59, rem: Int = 3): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val doomedOrders = orders.filter(col("o_custkey") % mod === rem)
      .select(col("o_orderkey"))
    def audit(name: String, df: DataFrame, purgedCond: Column): DataFrame =
      df.agg(
        count(lit(1)).as("n_before"),
        sum(when(purgedCond, 1L).otherwise(0L)).as("n_purged"))
        .select(lit(name).as("table_name"), col("n_before"), col("n_purged"),
          (col("n_before") - col("n_purged")).as("n_after"))
    val liPurged = li.join(doomedOrders,
        li("l_orderkey") === doomedOrders("o_orderkey"), "left")
      .withColumn("purged", col("o_orderkey").isNotNull)
    audit("customer", cust, col("c_custkey") % mod === rem)
      .unionByName(audit("orders", orders, col("o_custkey") % mod === rem))
      .unionByName(audit("lineitem", liPurged, col("purged")))
      .orderBy("table_name")
  }

  /** Referential-integrity audit (q135): orphan counts for every FK edge of
    * the star schema — the cross-TABLE complement of the single-table
    * expectation suite (q128). Each edge is one LEFT join of the child key
    * against the DISTINCT parent key set plus a 1-row aggregate; a NULL
    * child key is NOT an orphan (SQL FK semantics — unknowns are allowed,
    * dangling references are not). At 100 TB each edge's join shuffles only
    * the key columns, and the distinct parent side is dim-sized for
    * dimension edges (broadcast). Integer ppm keeps the audit oracle-exact. */
  /** One FK edge of [[referentialIntegrity]]: orphan stats for
    * `child.childKey -> parent.parentKey`. */
  def fkOrphans(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey).as("k"))
      .join(parent.select(col(parentKey).as("k")).distinct()
        .withColumn("hit", lit(1)), Seq("k"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("hit").isNull && col("k").isNotNull, 1L).otherwise(0L))
          .as("n_orphans"))
      .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"),
        expr("n_orphans * 1000000L div n_rows").as("orphan_ppm"))

  def referentialIntegrity(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    fkOrphans("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey")
      .unionByName(fkOrphans("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionByName(fkOrphans("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionByName(fkOrphans("orders.o_custkey->customer",
        Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .orderBy("fk_edge")
  }

  /** k-anonymity profile (q124): group customers by a quasi-identifier tuple
    * (nation, market segment, account-balance band) and report, per nation,
    * how many equivalence classes fall below `k` members and what share of
    * customers sits in those re-identifiable classes. The release-gate
    * counterpart of the PII redaction op (q64): redaction strips direct
    * identifiers, this measures whether the remaining quasi-identifiers
    * still single people out. Two chained aggregations, both map-side
    * combinable; the balance band uses floor() (not integer cast) so
    * negative balances band identically on both engines. */
  def kAnonymity(customer: DataFrame, k: Int = 5): DataFrame =
    customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("grp_n"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("grp_n") < k, 1L).otherwise(0L)).as("risky_groups"),
        sum(when(col("grp_n") < k, col("grp_n")).otherwise(0L)).as("risky_customers"),
        sum(col("grp_n")).as("n_customers"))
      .withColumn("risky_ppm", expr("risky_customers * 1000000L div n_customers"))
      .orderBy("c_nationkey")

  /** Rounded-ppm first-digit Benford expectation, digits 1..9 (log10(1+1/d),
    * summing to exactly 10⁶) — embedded as literals in BOTH engines so the
    * audit needs no float logarithms at all. */
  val BenfordPpm: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)

  /** Benford first-digit audit (q179) over order totals — the classic
    * fabricated/synthetic-amounts screen, extended here as a data-quality
    * audit beside the reference's null/key gates: natural multi-scale
    * amounts follow log10(1+1/d) closely; a flat or spiky digit histogram
    * flags generated or truncated data (as it does for this synthetic
    * corpus). One scan → 9-row digit histogram; the first digit comes from
    * the INTEGER part's decimal string (floor on both engines — no float
    * log10 whose boundary rounding could disagree). Exact ppm observed
    * shares against the literal expected table.
    *
    * The total attaches via collect-explode over the ≤9-row histogram
    * (round 10, VERDICT r9 #4 sweep): one more 1-row aggregate in the SAME
    * lineage, instead of a `crossJoin(broadcast(total))` whose total branch
    * re-ran the fact-table scan as a separate broadcast job. Bounded by
    * construction — the collected array can never exceed 9 digits. */
  def benfordAudit(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val expectedArr = BenfordPpm.mkString("array(", "L,", "L)")
    val counts = Tables.orders(spark, dir)
      .select(expr("CAST(floor(o_totalprice) AS BIGINT)").as("v"))
      .filter(col("v") > 0)
      .select(expr("CAST(substring(CAST(v AS STRING), 1, 1) AS BIGINT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    counts.agg(collect_list(struct(col("digit"), col("n"))).as("h"))
      .select(explode(col("h")).as("r"),
        aggregate(col("h"), lit(0L), (acc, x) => acc + x.getField("n")).as("n_tot"))
      .select(col("r.digit").as("digit"), col("r.n").as("n"), col("n_tot"))
      .withColumn("observed_ppm", expr("CAST(n * 1000000 div n_tot AS BIGINT)"))
      .withColumn("expected_ppm",
        expr(s"element_at($expectedArr, CAST(digit AS INT))"))
      .withColumn("abs_delta_ppm", abs(col("observed_ppm") - col("expected_ppm")))
      .select(col("digit"), col("n"), col("observed_ppm"), col("expected_ppm"),
        col("abs_delta_ppm"))
      .orderBy("digit")
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
