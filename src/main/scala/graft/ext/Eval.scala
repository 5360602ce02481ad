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
}
