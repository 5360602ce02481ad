package graft

import graft.ext.Eval
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the eval & calibration operators (q160-q163):
  * every expected value below is derived on paper in the comments, so a
  * regression in rank/tie/guard arithmetic fails against a number a human
  * can re-check. */
class EvalSpec extends SparkSuite {

  private def writeDocs(path: String, rows: Seq[(Long, String, String, String, Long)]): String = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$path/documents.parquet")
    path
  }

  test("roc auc: tied scores get average ranks (U computed on paper)") {
    // scores (en-marker counts): pos {3, 1}, neg {2, 1}
    // pairs won by pos: (3>2)=1, (3>1)=1, (1<2)=0, (1=1)=0.5  → AUC = 2.5/4
    val dir = writeDocs("/tmp/graft_eval_auc", Seq(
      (0L, "the a of", "en", "s", 8L),    // score 3, pos
      (1L, "the x y", "en", "s", 7L),     // score 1, pos
      (2L, "the a x", "de", "s", 7L),     // score 2, neg
      (3L, "the x z", "de", "s", 7L)))    // score 1, neg
    val r = Eval.rocAuc(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    // doubled rank sums: score1 group (c=2,p=1,minrank=1): 2·1+1 = 3;
    // score3 (minrank=4): 8 → sum2 = 11; u2 = 11 − n_pos(n_pos+1) = 5
    assert(r.getAs[Long]("u2") == 5)
    assert(r.getAs[Long]("auc_ppm") == 625000) // 5e6 / 8
  }

  test("roc auc: single-class input hits the zero-denominator guard") {
    val dir = writeDocs("/tmp/graft_eval_auc0", Seq(
      (0L, "the a of", "en", "s", 8L),
      (1L, "the x y", "en", "s", 7L)))
    val r = Eval.rocAuc(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_neg") == 0 && r.getAs[Long]("auc_ppm") == 0)
  }

  test("truncation kappa: known confusion matrix (kappa = 2/5 on paper)") {
    // doc1: spanish head, english tail → full=en, half=es
    // doc2: english throughout → en/en;  doc3: spanish throughout → es/es
    // cells {(en,es):1,(en,en):1,(es,es):1}: n=3, diag=2,
    // rows {en:2,es:1}, cols {en:1,es:2} → Σrow·col = 4
    // κ = (3·2 − 4)/(9 − 4) = 2/5
    val t1 = "el la de y que los the a of and is to in the a of and is to in"
    val t2 = "the a of and the a of and"
    val t3 = "el la que los el la que los"
    val dir = writeDocs("/tmp/graft_eval_kappa", Seq(
      (0L, t1, "en", "s", t1.length.toLong),
      (1L, t2, "en", "s", t2.length.toLong),
      (2L, t3, "es", "s", t3.length.toLong)))
    val r = Eval.truncationKappa(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 3 && r.getAs[Long]("sum_diag") == 2)
    assert(r.getAs[Long]("sum_rowcol") == 4)
    assert(r.getAs[Long]("po_ppm") == 666666 && r.getAs[Long]("pe_ppm") == 444444)
    assert(r.getAs[Long]("kappa_ppm") == 400000)
  }

  test("truncation kappa: perfect single-class agreement hits the pe=1 guard") {
    val dir = writeDocs("/tmp/graft_eval_kappa1", Seq(
      (0L, "the a of and", "en", "s", 12L),
      (1L, "the a the a", "en", "s", 11L)))
    val r = Eval.truncationKappa(spark, dir).collect()(0)
    // all four predictions are 'en': Σrow·col = n² → chance agreement is
    // total, kappa undefined → guarded to 0
    assert(r.getAs[Long]("sum_diag") == 2 && r.getAs[Long]("kappa_ppm") == 0)
  }

  test("pareto frontier: strict-both dominance, equal x never dominates") {
    // (x = n_chars, y = distinct tokens): A(10,3) B(20,2) C(15,1) D(20,3)
    // C is dominated by D (20>15, 3>1); B survives (nothing strictly longer
    // has strictly more diversity); A survives (D is longer but not more
    // diverse than A's 3)
    val dir = writeDocs("/tmp/graft_eval_pareto", Seq(
      (0L, "a b c", "en", "s", 10L),
      (1L, "a b", "en", "s", 20L),
      (2L, "a", "en", "s", 15L),
      (3L, "x y z", "en", "s", 20L)))
    val kept = Eval.paretoFrontier(spark, dir).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(0L, 1L, 3L))
  }

  test("score calibration: uniform two-source fixture maps deciles exactly") {
    // source sA has n_chars 1..10, sB has 11..20 → sA's k-th decile value is
    // k with corpus fraction k/20; sB's is 10+k at (10+k)/20
    val rows = (1 to 10).map(i => (i.toLong, s"t$i", "en", "sA", i.toLong)) ++
      (11 to 20).map(i => (i.toLong, s"t$i", "en", "sB", i.toLong))
    val dir = writeDocs("/tmp/graft_eval_calib", rows)
    val out = Eval.scoreCalibration(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("decile")) ->
        ((r.getAs[Long]("value"), r.getAs[Long]("corpus_ppm")))).toMap
    assert(out.size == 18)
    assert(out(("sA", 1L)) == ((1L, 50000L)))
    assert(out(("sA", 9L)) == ((9L, 450000L)))
    assert(out(("sB", 5L)) == ((15L, 750000L)))
    assert(out(("sB", 9L)) == ((19L, 950000L)))
  }

  test("ks test: two-source fixture, D = 1/2 on paper") {
    // sA lengths {1,2}, sB lengths {2,3}; merged grid {1,2,3}.
    // For sA (n_src=2, n_rest=2): cum_src = 1,2,2; cum_rest = 0,1,2
    // diff·(n_src·n_rest) = |1·2−0·2|, |2·2−1·2|, |2·2−2·2| = 2,2,0 → max 2
    // D = 2 / (2·2) = 1/2 → 500000 ppm (and sB is symmetric)
    val dir = writeDocs("/tmp/graft_eval_ks", Seq(
      (0L, "t", "en", "sA", 1L), (1L, "t", "en", "sA", 2L),
      (2L, "t", "en", "sB", 2L), (3L, "t", "en", "sB", 3L)))
    val out = Eval.ksTest(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_src"), r.getAs[Long]("n_rest"), r.getAs[Long]("d_ppm")))).toMap
    assert(out("sA") == ((2L, 2L, 500000L)))
    assert(out("sB") == ((2L, 2L, 500000L)))
  }

  test("ks test: single source hits the n_rest=0 guard") {
    val dir = writeDocs("/tmp/graft_eval_ks0", Seq(
      (0L, "t", "en", "sA", 1L), (1L, "t", "en", "sA", 5L)))
    val r = Eval.ksTest(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_rest") == 0 && r.getAs[Long]("d_ppm") == 0)
  }

  test("chi square: 2x2 fixture, chi2 = 2 and V2 = 1/4 on paper") {
    // cells (en,s1)=3 (en,s2)=1 (es,s1)=1 (es,s2)=3; n=8, all margins 4,
    // E=2 per cell → χ² = 4·(1)²/2 = 2; per-cell integer contribution
    // (8·O − 16)²·10⁶ div (8·4·4) = 64·10⁶ div 128 = 500000 ×4 = 2000000
    // V² = χ²/(n·min(r−1,c−1)) = 2/8 → 250000 ppm
    val rows = Seq.fill(3)(("en", "s1")) ++ Seq(("en", "s2")) ++
      Seq(("es", "s1")) ++ Seq.fill(3)(("es", "s2"))
    val dir = writeDocs("/tmp/graft_eval_chi2", rows.zipWithIndex.map {
      case ((l, s), i) => (i.toLong, "t", l, s, 5L) })
    val r = Eval.chiSquare(spark, dir).collect()(0)
    assert(r.getAs[Long]("n") == 8 && r.getAs[Long]("dof") == 1)
    assert(r.getAs[Long]("chi2_x1e6") == 2000000)
    assert(r.getAs[Long]("cramer_v2_ppm") == 250000)
  }

  test("chi square: a NULL lang is its own category (GROUP BY-consistent r and dof)") {
    val s = spark; import s.implicits._
    // langs {en, NULL} x sources {s1, s2}: r must count the NULL group -> 2
    Seq((0L, "t", Option("en"), "s1", 5L), (1L, "t", Option("en"), "s2", 5L),
      (2L, "t", Option.empty[String], "s1", 5L), (3L, "t", Option.empty[String], "s2", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet("/tmp/graft_eval_chinull/documents.parquet")
    val r = Eval.chiSquare(spark, "/tmp/graft_eval_chinull").collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("dof") == 1,
      "r = 2 including the NULL-lang category, c = 2")
    assert(r.getAs[Long]("chi2_x1e6") == 0, "perfectly balanced table")
  }

  test("source ablation: an all-NULL-lang source counts 0 en docs, never NULL") {
    val s = spark; import s.implicits._
    Seq((0L, "t", Option.empty[String], "sA", 10L),
      (1L, "t", Option("en"), "sB", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet("/tmp/graft_eval_ablnull/documents.parquet")
    val out = Eval.sourceAblation(spark, "/tmp/graft_eval_ablnull").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("en_share_rest_ppm")).toMap
    // removing sA leaves only the en doc -> 1000000; removing sB leaves the
    // NULL-lang doc, which counts as 0 en (not NULL) -> 0
    assert(out("sA") == 1000000L && out("sB") == 0L)
  }

  test("chi square: single-source corpus hits the least(r-1,c-1)=0 guard") {
    val dir = writeDocs("/tmp/graft_eval_chi0", Seq(
      (0L, "t", "en", "s1", 5L), (1L, "t", "en", "s1", 5L), (2L, "t", "es", "s1", 5L)))
    val r = Eval.chiSquare(spark, dir).collect()(0)
    // one column: every cell O equals its expected value → χ² = 0; the V²
    // divisor n·least(r−1,0) is 0 — guarded to 0 instead of DIVIDE_BY_ZERO
    assert(r.getAs[Long]("dof") == 0 && r.getAs[Long]("chi2_x1e6") == 0)
    assert(r.getAs[Long]("cramer_v2_ppm") == 0)
  }

  test("gini tokens: frequencies {1,3} give G = 1/4; uniform gives 0") {
    // counts a=3, b=1 → ascending ranks b:1, a:2; S = 1·1 + 2·3 = 7
    // G = (2·7 − 3·4)/(2·4) = 2/8 = 1/4 → 250000 ppm
    val dir = writeDocs("/tmp/graft_eval_gini", Seq((0L, "a a a b", "en", "s", 7L)))
    val r = Eval.giniTokens(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_terms") == 2 && r.getAs[Long]("total_tokens") == 4)
    assert(r.getAs[Long]("gini_ppm") == 250000)
    val dir2 = writeDocs("/tmp/graft_eval_gini0", Seq((0L, "a b a b", "en", "s", 7L)))
    assert(Eval.giniTokens(spark, dir2).collect()(0).getAs[Long]("gini_ppm") == 0)
  }

  test("psi drift: tied decile bounds dedupe to stable bins, terms on paper") {
    // half A (even ids): nine 1s + one 2 → all nine decile bounds are 1,
    // deduped to [1] → bin 1 = {v ≤ 1}, bin 2 = {v = 2}
    // half B (odd ids): five 1s + five 2s
    // bin1: p=900000 q=500000 → 0.4·ln(1.8); bin2: p=100000 q=500000 →
    // (−0.4)·ln(0.2) — both positive, rounded to 6 per bin
    val a = (0 until 10).map(i => ((2 * i).toLong, "t", "en", "s",
      if (i < 9) 1L else 2L))
    val b = (0 until 10).map(i => ((2 * i + 1).toLong, "t", "en", "s",
      if (i < 5) 1L else 2L))
    val dir = writeDocs("/tmp/graft_eval_psi", a ++ b)
    val out = Eval.psiDrift(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("p_ppm"), r.getAs[Long]("q_ppm"), r.getAs[Double]("psi_term")))).toMap
    assert(out.size == 2)
    assert(out(1L)._1 == 900000L && out(1L)._2 == 500000L)
    assert(out(1L)._3 == BigDecimal(0.4 * math.log(1.8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._3 == BigDecimal(-0.4 * math.log(0.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("psi drift: one-sided bin gets the 1-ppm floor, not a silent 0") {
    // A: five 1s → bounds [1]; B: four 1s + one 2 → bin 2 exists only in B
    // p_ppm = 0 floored to 1 inside the term: (1−200000)/10⁶ · ln(1/200000)
    // ≈ 2.441202 — the drift-dominating bin now dominates the score
    val a = (0 until 5).map(i => ((2 * i).toLong, "t", "en", "s", 1L))
    val b = (0 until 5).map(i => ((2 * i + 1).toLong, "t", "en", "s",
      if (i < 4) 1L else 2L))
    val dir = writeDocs("/tmp/graft_eval_psi0", a ++ b)
    val out = Eval.psiDrift(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("p_ppm"), r.getAs[Long]("q_ppm"), r.getAs[Double]("psi_term")))).toMap
    assert(out(2L)._1 == 0L && out(2L)._2 == 200000L)
    val expected = BigDecimal((1.0 - 200000.0) / 1e6 * math.log(1.0 / 200000.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(2L)._3 == expected && out(2L)._3 > 2.4)
  }

  test("reliability bins: two-score fixture, rates and deduped bounds on paper") {
    // five docs score 1 (1 positive), five docs score 3 (4 positive):
    // cum at score 1 is 5 → deciles 1..5 bound at 1, 6..9 at 3 → bounds [1,3]
    // bin1 = {score ≤ 1}: rate 1/5, mean 1.000; bin2 = {score 3}: 4/5, 3.000
    val rows = (0 until 5).map(i => (i.toLong, "the x", if (i == 0) "en" else "de", "s", 5L)) ++
      (5 until 10).map(i => (i.toLong, "the a of", if (i == 5) "de" else "en", "s", 8L))
    val dir = writeDocs("/tmp/graft_eval_rel", rows)
    val out = Eval.reliabilityBins(spark, dir).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Long]("pos_rate_ppm"),
          r.getAs[Long]("mean_score_milli")))).toMap
    assert(out.size == 2)
    assert(out(1L) == ((5L, 1L, 200000L, 1000L)))
    assert(out(2L) == ((5L, 4L, 800000L, 3000L)))
  }

  test("source ablation: complement arithmetic on paper; single-source guard") {
    // sA: lengths {10, 20}, langs {en, de}; sB: length {30}, en
    // corpus: n=3, len 60, en 2 → full mean 20.000
    // without sA: mean 30000 milli, en 1000000 ppm (1/1)
    // without sB: mean (60−30)/2 = 15000, en (2−1)/2 = 500000
    val dir = writeDocs("/tmp/graft_eval_abl", Seq(
      (0L, "t", "en", "sA", 10L), (1L, "t", "de", "sA", 20L),
      (2L, "t", "en", "sB", 30L)))
    val out = Eval.sourceAblation(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_removed"), r.getAs[Long]("mean_chars_milli_full"),
          r.getAs[Long]("mean_chars_milli_rest"), r.getAs[Long]("en_share_rest_ppm")))).toMap
    assert(out("sA") == ((2L, 20000L, 30000L, 1000000L)))
    assert(out("sB") == ((1L, 20000L, 15000L, 500000L)))
    val dir2 = writeDocs("/tmp/graft_eval_abl1", Seq((0L, "t", "en", "sA", 10L)))
    val r = Eval.sourceAblation(spark, dir2).collect()(0)
    assert(r.getAs[Long]("mean_chars_milli_rest") == 0 &&
      r.getAs[Long]("en_share_rest_ppm") == 0)
  }
}
