package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Classifier-evaluation and score-calibration operators — the measurement
  * half of a curation stack. A 100 TB pipeline doesn't just run its quality/
  * language/dedup heuristics, it continuously evaluates them (AUC, agreement)
  * and calibrates their thresholds across heterogeneous sources; these
  * operators are that harness, built on the same exact-integer (ppm)
  * conventions as the rest of the catalog so every metric hash-matches the
  * DuckDB oracle.
  *
  * Scale note shared by [[rocAuc]], [[paretoFrontier]], and
  * [[scoreCalibration]]: each uses ONE unpartitioned window, but always over
  * a value-domain-bounded frame (distinct marker counts / distinct document
  * lengths — thousands of rows regardless of corpus size), never over the
  * corpus itself. The corpus-sized stages are all hash aggregates with
  * map-side combine.
  */
object Eval {

  /** Deduplicated equal-mass decile bounds of a (value, count) histogram —
    * the shared counting-selection machinery of [[psiDrift]] and
    * [[reliabilityBins]]: cumulative window over the (pre-filtered,
    * pruning-stable) histogram, bound_d = min value whose cumulative count
    * reaches ceil(d·n/10), tied bounds deduped so downstream bin ids stay a
    * stable 1..k. Returns a one-row frame holding the sorted `bounds` array
    * (broadcast by callers). */
  private def dedupedDecileBounds(hist: DataFrame, valueCol: String,
      countCol: String): DataFrame = {
    val wAll = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col(countCol)).over(wAll))
      .withColumn("n_tot", sum(col(countCol)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("decile", explode(expr("sequence(1, 9)")))
      .groupBy(col("decile"))
      .agg(min(when(col("cum") >= expr("(decile * n_tot + 9) div 10"),
        col(valueCol))).as("b"))
      .agg(array_distinct(sort_array(collect_list(col("b")))).as("bounds"))
  }

  /** Exact ROC-AUC (q160) of the English-marker count as a ranking score for
    * the ground-truth label `lang = 'en'` — the standard threshold-free
    * quality check for a retrieval/filter heuristic. Computed via the
    * Mann-Whitney U statistic on the SCORE HISTOGRAM: per distinct score,
    * (count, positives); doubled average ranks (2·minrank + c − 1, exact
    * integers — no 0.5 ties) come from a running sum over the tiny distinct-
    * score frame; AUC = U / (n_pos·n_neg) in ppm, cross-products lifted to
    * DECIMAL(38,0) so a planetary corpus can't overflow the rank sums.
    *
    * One document scan, one map-side-combinable aggregate on score; no
    * corpus-wide rank window (the usual AUC-by-row_number plan would
    * single-partition sort the world). */
  def rocAuc(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextStats.withLangMarkers(
      Tables.documents(spark, dir).select(col("lang"), col("text")))
      .select(col("en_markers").as("score"),
        (col("lang") === "en").cast("long").as("is_pos"))
    val hist = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("c"), sum(col("is_pos")).as("p"))
    val wBefore = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist
      .withColumn("cum_before", coalesce(sum(col("c")).over(wBefore), lit(0L)))
      // each positive in a tie group of size c starting at minrank
      // (cum_before + 1) carries doubled average rank 2·minrank + c − 1
      .withColumn("sum2_g",
        expr("CAST(p AS DECIMAL(38,0)) * (2 * (cum_before + 1) + c - 1)"))
    ranked
      .agg(sum(col("c")).as("n"), sum(col("p")).as("n_pos"),
        sum(col("sum2_g")).as("sum2"))
      .select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        expr("sum2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)").as("u2d"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        expr("CAST(u2d AS BIGINT)").as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("CAST(u2d * 1000000 div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
          .otherwise(0L).as("auc_ppm"))
  }

  /** Truncation-stability Cohen's kappa (q161): agreement between the lang-id
    * prediction on the FULL document and on its first half — the "how much
    * does my classifier's decision depend on seeing the whole input"
    * robustness eval (a production stack runs exactly this before deciding
    * how much of each document its cheap classifiers may read). Kappa
    * corrects raw agreement for chance: κ = (n·Σdiag − Σ row·col) /
    * (n² − Σ row·col), computed in exact integer ppm with the cross-products
    * in DECIMAL(38,0).
    *
    * Both predictions come off ONE scan ([[TextStats.withLangMarkers]]
    * applied twice in sequence — pure projections, no self-join); the
    * confusion matrix and its margins are |classes|²-bounded at any corpus
    * size. */
  def truncationKappa(spark: SparkSession, dir: String): DataFrame = {
    val full = TextStats.withLangMarkers(
      Tables.documents(spark, dir).select(col("text"), col("n_chars")))
      .select(col("predicted_lang").as("pred_full"),
        expr("substring(text, 1, CAST(n_chars div 2 AS INT))").as("text"))
    val both = TextStats.withLangMarkers(full)
      .select(col("pred_full"), col("predicted_lang").as("pred_half"))
    val cells = both.groupBy(col("pred_full"), col("pred_half"))
      .agg(count(lit(1)).as("cn"))
    val totals = cells.agg(
      sum(col("cn")).as("n"),
      sum(when(col("pred_full") === col("pred_half"), col("cn")).otherwise(0L))
        .as("sum_diag"))
    val rows = cells.groupBy(col("pred_full").as("cls")).agg(sum(col("cn")).as("rn"))
    val cols0 = cells.groupBy(col("pred_half").as("cls")).agg(sum(col("cn")).as("cln"))
    val rowcol = rows.join(cols0, Seq("cls"), "full_outer")
      .agg(sum(expr(
        "CAST(coalesce(rn, 0) AS DECIMAL(38,0)) * coalesce(cln, 0)")).as("sum_rowcol"))
    totals.crossJoin(rowcol)
      .select(col("n"), col("sum_diag"),
        expr("CAST(sum_rowcol AS BIGINT)").as("sum_rowcol"),
        expr("CAST(CAST(sum_diag AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("po_ppm"),
        expr("CAST(sum_rowcol * 1000000 div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)")
          .as("pe_ppm"),
        when(expr("CAST(n AS DECIMAL(38,0)) * n - sum_rowcol") > 0,
          expr("CAST((CAST(n AS DECIMAL(38,0)) * sum_diag - sum_rowcol) * 1000000 " +
            "div (CAST(n AS DECIMAL(38,0)) * n - sum_rowcol) AS BIGINT)"))
          .otherwise(0L).as("kappa_ppm"))
  }

  /** 2-D pareto frontier (q162) over (length, lexical diversity): the
    * documents no other document strictly beats on BOTH n_chars and distinct-
    * token count — the multi-objective data-selection primitive ("give me
    * the efficient frontier of long AND diverse documents" — a curation run
    * sweeps thresholds along it instead of picking one arbitrary cutoff).
    *
    * Scale shape: the skyline is computed on the DISTINCT-x frame (per-length
    * max diversity, then a running max ordered by length desc — strictly
    * preceding rows only), and documents join back to that bounded frame by
    * broadcast. Never an all-pairs dominance self-join. A document is kept
    * iff no strictly-longer document has strictly-higher diversity. */
  def paretoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("x"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("y"))
    val perX = m.groupBy(col("x")).agg(max(col("y")).as("max_y"))
    val wAbove = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val best = perX.withColumn("best_above", max(col("max_y")).over(wAbove))
      .select(col("x"), col("best_above"))
    m.join(broadcast(best), Seq("x"))
      .filter(col("best_above").isNull || col("y") >= col("best_above"))
      .select(col("doc_id"), col("x"), col("y"))
      .orderBy("doc_id")
  }

  /** Per-source score calibration (q163): each source's decile values of
    * n_chars, mapped to the CORPUS-wide cumulative fraction (ppm) at that
    * value — the calibration table that lets one global quality threshold be
    * translated into per-source thresholds (sources with different length
    * distributions would otherwise be filtered with wildly different
    * effective strictness). Deciles are exact order statistics selected by
    * counting (value at ceil(k·n/10)), the same histogram-not-sort shape as
    * q152; the decile table (9 rows per source) joins the corpus cumulative
    * histogram by broadcast equi-join — decile values are actual data
    * values, so no interpolation/range join is ever needed. */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.documents(spark, dir).select(col("source"), col("n_chars").as("v"))
    val hist = v.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum(col("c")).over(wSrc))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
    val deciles = cum
      .withColumn("decile", explode(expr("sequence(1, 9)")))
      .groupBy(col("source"), col("decile"))
      .agg(min(when(col("cum") >= expr("(decile * n + 9) div 10"), col("v")))
        .as("value"))
    val corpusHist = v.groupBy(col("v")).agg(count(lit(1)).as("cc"))
    val wAll = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val corpusCum = corpusHist
      .withColumn("ccum", sum(col("cc")).over(wAll))
      .select(col("v").as("value"), col("ccum"))
    val total = v.agg(count(lit(1)).as("n_corpus"))
    deciles.join(broadcast(corpusCum), Seq("value"))
      .crossJoin(broadcast(total))
      .select(col("source"), col("decile").cast("long").as("decile"), col("value"),
        expr("CAST(CAST(ccum AS DECIMAL(38,0)) * 1000000 div n_corpus AS BIGINT)")
          .as("corpus_ppm"))
      .orderBy("source", "decile")
  }

  /** Reliability diagram (q174) for the en-marker score against the
    * ground-truth label `lang = 'en'` — the CALIBRATION half of classifier
    * eval, beside [[rocAuc]]'s discrimination half: equal-mass score deciles,
    * each reporting observed positive rate vs mean score. A well-calibrated
    * filter shows pos_rate rising monotonically with the bin's mean score;
    * q160 can be high while this table is badly mis-calibrated, which is why
    * production stacks track both.
    *
    * Everything is computed ON the score histogram (score-domain-bounded at
    * any corpus size): deciles by counting (q152 shape, tied bounds deduped
    * as in [[psiDrift]]), then bins aggregate the HISTOGRAM rows weighted by
    * their counts — the corpus is scanned exactly once (the histogram
    * aggregate); no second pass rebins raw rows. Exact integer output:
    * pos_rate in ppm, mean score in thousandths. */
  def reliabilityBins(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextStats.withLangMarkers(
      Tables.documents(spark, dir).select(col("lang"), col("text")))
      // when/otherwise (not a bare ===.cast): a null lang must count 0 like
      // the oracle's CASE, and a never-null p is what makes the p >= 0
      // pruning guard below a true no-op
      .select(col("en_markers").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_pos"))
    val hist = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("c"), sum(col("is_pos")).as("p"))
    // p >= 0 is always true — it keeps p in the bounds branch's pruned
    // schema so both consumers share ONE histogram exchange (see ksTest)
    val bounds = dedupedDecileBounds(hist.filter(col("p") >= 0), "score", "c")
    hist.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("1 + size(filter(bounds, x -> score > x))").cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("n"), sum(col("p")).as("n_pos"),
        sum(col("score") * col("c")).as("sum_score"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("pos_rate_ppm"),
        expr("CAST(sum_score * 1000 div n AS BIGINT)").as("mean_score_milli"))
      .orderBy("bin")
  }

  /** Leave-one-source-out ablation table (q175) — for each source, what the
    * corpus profile looks like WITHOUT it, the first-order data-valuation
    * question ("which source is dragging mean document length down / skewing
    * the language mix") answered for ALL sources at once. The naive form is
    * |sources| full passes; this is ONE corpus aggregate + a complement
    * projection against broadcast totals — every rest-metric is
    * total-minus-source on decomposable sums, the same complement trick as
    * q145's absent-term mass. Only decomposable metrics qualify (counts,
    * sums); distinct-counts deliberately excluded.
    *
    * Guards: a single-source corpus leaves an empty rest → 0 rows of rest
    * metrics would divide by zero; guarded to 0 like [[ksTest]]'s n_rest. */
  def sourceAblation(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"),
        // when/otherwise, not ===.cast: a NULL lang must count 0 like the
        // oracle's CASE (an all-NULL source would otherwise emit NULL sums)
        when(col("lang") === "en", 1L).otherwise(0L).as("is_en"))
    val per = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"), sum(col("n_chars")).as("len_src"),
        sum(col("is_en")).as("en_src"))
    // totals re-aggregate the per-source frame (|sources| rows), not the
    // corpus — the shared exchange is reused and the corpus is scanned once
    val tot = per.agg(sum(col("n_src")).as("n"), sum(col("len_src")).as("len_tot"),
      sum(col("en_src")).as("en_tot"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_src").as("n_removed"),
        expr("CAST(CAST(len_tot AS DECIMAL(38,0)) * 1000 div n AS BIGINT)")
          .as("mean_chars_milli_full"),
        when(col("n") > col("n_src"),
          expr("CAST(CAST(len_tot - len_src AS DECIMAL(38,0)) * 1000 div (n - n_src) AS BIGINT)"))
          .otherwise(0L).as("mean_chars_milli_rest"),
        when(col("n") > col("n_src"),
          expr("CAST(CAST(en_tot - en_src AS DECIMAL(38,0)) * 1000000 div (n - n_src) AS BIGINT)"))
          .otherwise(0L).as("en_share_rest_ppm"))
      .orderBy("source")
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic (q169), each source vs the
    * REST of the corpus, over the document-length distribution: D =
    * sup_v |F_src(v) − F_rest(v)|, reported in ppm. The per-source drift
    * alarm a curation stack runs after every ingest — "did this crawl's
    * length profile move away from everything else?" — with an exact
    * threshold-free statistic instead of eyeballed histograms.
    *
    * Exactness: the sup over the merged value domain is attained at a jump
    * point of EITHER ECDF, so both ECDFs are evaluated on the full
    * (source × distinct-value) grid; |F_src − F_rest| is compared via the
    * cross-multiplied integer |cum_src·n_rest − cum_rest·n_src| in
    * DECIMAL(38,0) — no float ECDFs, one truncating division at the very end.
    *
    * Scale shape: the corpus touches ONE hash aggregate — the (source, v)
    * histogram — and every other frame (per-source totals, the distinct
    * value grid, the corpus cumulative histogram, the grand total) is
    * DERIVED from it, with pruning-stable schemas so the planner's
    * ReuseExchange collapses all five lineage paths onto a single scan
    * (PlanSpec pins it). The grid and its windows live on |sources| ×
    * |distinct lengths| rows — value-domain-bounded, independent of corpus
    * row count — and the corpus cumulative histogram joins in by broadcast. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.documents(spark, dir).select(col("source"), col("n_chars").as("v"))
    val h = v.groupBy(col("source"), col("v")).agg(count(lit(1)).as("c"))
    val srcTot = h.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    // the always-true c > 0 keeps the count column in this branch's pruned
    // schema — otherwise column pruning rewrites the aggregate without it
    // and the exchange no longer canonicalizes equal (no reuse, extra scan)
    val distinctV = h.filter(col("c") > 0).select(col("v")).distinct()
    val total = h.agg(sum(col("c")).as("n"))
    val grid = srcTot.crossJoin(distinctV)
    val wSrc = Window.partitionBy(col("source")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe keys: a plain equi left join pushes IsNotNull(key) into the
    // right side, making its subtree unequal to the other h consumers (no
    // exchange reuse → a second corpus scan) — and <=> also matches a NULL
    // group to its own grid row, consistent with GROUP BY null semantics
    val hR = h.select(col("source").as("h_source"), col("v").as("h_v"), col("c"))
    val cumSrc = grid.join(hR,
        col("source") <=> col("h_source") && col("v") <=> col("h_v"), "left")
      .withColumn("c0", coalesce(col("c"), lit(0L)))
      .withColumn("cum_src", sum(col("c0")).over(wSrc))
    val wAll = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val corpusCum = h.groupBy(col("v")).agg(sum(col("c")).as("cc"))
      .withColumn("ccum", sum(col("cc")).over(wAll))
      .select(col("v"), col("ccum"))
    cumSrc.join(broadcast(corpusCum), Seq("v"))
      .crossJoin(broadcast(total))
      .withColumn("n_rest", col("n") - col("n_src"))
      .withColumn("diff", expr(
        "abs(CAST(cum_src AS DECIMAL(38,0)) * n_rest - CAST(ccum - cum_src AS DECIMAL(38,0)) * n_src)"))
      .groupBy(col("source"), col("n_src"), col("n_rest"))
      .agg(max(col("diff")).as("d_num"))
      .select(col("source"), col("n_src"), col("n_rest"),
        when(col("n_rest") > 0,
          expr("CAST(d_num * 1000000 div (CAST(n_src AS DECIMAL(38,0)) * n_rest) AS BIGINT)"))
          .otherwise(0L).as("d_ppm"))
      .orderBy("source")
  }

  /** Pearson chi-square test of independence (q170) between `lang` and
    * `source`, with Cramér's V² — "is language mix independent of where the
    * data came from", the first question about any multi-source corpus.
    * χ² = Σ_cells (O−E)²/E with E = R·C/n, computed per cell as the exact
    * integer ((n·O − R·C)² · 10⁶) div (n·R·C): each cell's contribution is a
    * truncating division of non-negative integers (identical in both
    * engines), and the SUM of integers is order-independent — so the
    * statistic hash-matches without any float summation-order pinning.
    * Exact in DECIMAL(38,0) up to n ≈ 5·10⁷ rows ((n·O−R·C)²·10⁶ ≤ n⁴·10⁶);
    * beyond that, the same formula runs on per-cell ppm shares instead of raw
    * counts at a bounded precision cost.
    *
    * Scale shape: ONE corpus-sized hash aggregate (the contingency cells);
    * margins and the full R×C grid (absent cells count as O=0 — they still
    * contribute E) are |langs|·|sources|-bounded at any corpus size. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rows0 = cells.groupBy(col("lang")).agg(sum(col("o")).as("rn"))
    val cols0 = cells.groupBy(col("source")).agg(sum(col("o")).as("cn"))
    // null-safe keys for the same exchange-reuse reason as ksTest (plain
    // equi keys push IsNotNull into the cells subtree), and a NULL lang or
    // source then matches its own grid cell — GROUP BY-consistent
    val cellsR = cells.select(col("lang").as("c_lang"),
      col("source").as("c_source"), col("o"))
    val grid = rows0.crossJoin(cols0)
      .join(cellsR,
        col("lang") <=> col("c_lang") && col("source") <=> col("c_source"), "left")
      .withColumn("o0", coalesce(col("o"), lit(0L)))
    // n/r/c derived from the margin frames (not countDistinct on cells —
    // that branch's distinct-Expand rewrote the shared aggregate and cost a
    // second corpus scan; rows0/cols0 are already in the plan, so these two
    // tiny aggregates reuse their exchanges and the corpus is scanned once).
    // The always-true cn > 0 keeps cn in the count branch's pruned schema.
    val total = rows0.agg(sum(col("rn")).as("n"), count(lit(1)).as("r"))
      .crossJoin(cols0.filter(col("cn") > 0).agg(count(lit(1)).as("c")))
    grid.crossJoin(broadcast(total))
      .withColumn("contrib", expr(
        """CAST((CAST(n AS DECIMAL(38,0)) * o0 - CAST(rn AS DECIMAL(38,0)) * cn)
          |  * (CAST(n AS DECIMAL(38,0)) * o0 - CAST(rn AS DECIMAL(38,0)) * cn)
          |  * 1000000 div (CAST(n AS DECIMAL(38,0)) * rn * cn) AS BIGINT)""".stripMargin))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("contrib")).as("chi2_x1e6"))
      .select(col("n"), ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("chi2_x1e6"),
        // guard: a degenerate corpus (single lang or single source) makes
        // least(r-1, c-1) = 0 — DIVIDE_BY_ZERO under ANSI without this,
        // mirroring the n_rest guard in ksTest and n_pos/n_neg in rocAuc
        when(least(col("r") - 1, col("c") - 1) > 0,
          expr("CAST(chi2_x1e6 div (n * least(r - 1, c - 1)) AS BIGINT)"))
          .otherwise(0L).as("cramer_v2_ppm"))
  }

  /** Gini coefficient (q171) of the corpus token-frequency distribution —
    * the single-number inequality summary of vocabulary usage (0 = every
    * term equally frequent, →1 = a few terms dominate). Tracks tokenizer
    * health across ingests: a jump means boilerplate/templating is flooding
    * the corpus.
    *
    * Exact integer form on ascending frequency ranks: G = (2·Σ i·xᵢ −
    * (n+1)·Σxᵢ) / (n·Σxᵢ), ties broken by term — Σ i·xᵢ is permutation-
    * invariant within a tie group (equal xᵢ), so the tie-break affects
    * nothing but determinism of the intermediate. One corpus-sized hash
    * aggregate (term counts, map-side combinable); the rank window runs on
    * the vocabulary frame, the same accepted bounded-frame shape as
    * q63/q67. */
  def giniTokens(spark: SparkSession, dir: String): DataFrame = {
    val freq = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("x"))
    val w = Window.orderBy(col("x"), col("term"))
    freq.withColumn("i", row_number().over(w))
      .agg(count(lit(1)).as("n_terms"), sum(col("x")).as("total_tokens"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * x")).as("s"))
      .select(col("n_terms"), col("total_tokens"),
        expr("""CAST((2 * s - (CAST(n_terms AS DECIMAL(38,0)) + 1) * total_tokens)
          | * 1000000 div (CAST(n_terms AS DECIMAL(38,0)) * total_tokens) AS BIGINT)"""
          .stripMargin).as("gini_ppm"))
  }

  /** Population stability index (q172) of the document-length distribution
    * between the two doc_id-parity halves of the corpus — the industry-
    * standard drift score, reported PER BIN so the reader sees WHERE the
    * distribution moved, not just that it did. Bins are the deciles of half
    * A (exact counting order statistics, the q152/q163 histogram shape);
    * each row carries both halves' bin shares (exact integer ppm) and the
    * PSI term (p−q)·ln(p/q).
    *
    * Float boundary: the PSI term needs a logarithm, so exact-integer ppm
    * arithmetic stops at the shares; each term is computed from those exact
    * ppm integers and rounded to 6 decimals PER BIN — never summed across
    * bins inside the engines — so cross-engine float determinism needs no
    * summation-order pinning at all (the q139 lesson, made structural).
    * Zero shares take the textbook epsilon treatment — a 1-ppm floor on BOTH
    * shares inside the term (shares in the output stay exact) — so one-sided
    * bins, exactly where drift is most extreme, dominate the score instead of
    * silently contributing 0. Tied decile bounds are deduplicated, so bin ids
    * are stable 1..k with no skipped/collapsed ids.
    *
    * Scale shape: decile bounds live on the distinct-length frame; the
    * 9-value bounds array broadcasts to a corpus-sized projection (bin =
    * 1 + |{b < v}| via a HOF filter over the literal-sized array); both
    * halves aggregate in ONE conditional-sum pass (the q148 shape). */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.documents(spark, dir)
      .select((col("doc_id") % 2 === 0).as("is_a"), col("n_chars").as("v"))
    // ONE corpus aggregate — the per-value (cnt_a, cnt_b) histogram — feeds
    // the bounds, the per-bin counts (weighted by histogram rows, not a
    // rebinned second scan), and the totals; pruning-stable schemas let
    // ReuseExchange collapse the three paths onto a single scan
    val h = v.groupBy(col("v")).agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cnt_b"))
    // the cumulative-A frame carries B-only values too (cnt_a = 0 rows);
    // they add nothing to cum and can never become a bound (min picks the
    // smaller A-value that first reached the threshold), so bounds are
    // unchanged. The always-true cnt_b >= 0 keeps cnt_b in this branch's
    // pruned schema (see ksTest).
    val bounds = dedupedDecileBounds(h.filter(col("cnt_b") >= 0), "v", "cnt_a")
    val counts = h.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("1 + size(filter(bounds, b -> v > b))").cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt_a")).as("cnt_a"), sum(col("cnt_b")).as("cnt_b"))
    val totals = h.agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        expr("CAST(cnt_a * 1000000 div n_a AS BIGINT)").as("p_ppm"),
        expr("CAST(cnt_b * 1000000 div n_b AS BIGINT)").as("q_ppm"))
      .withColumn("p_adj", greatest(col("p_ppm"), lit(1L)))
      .withColumn("q_adj", greatest(col("q_ppm"), lit(1L)))
      .withColumn("psi_term",
        round((col("p_adj") - col("q_adj")).cast("double") / lit(1000000.0) *
          log(col("p_adj").cast("double") / col("q_adj").cast("double")), 6))
      .drop("p_adj", "q_adj")
      .orderBy("bin")
  }
}
