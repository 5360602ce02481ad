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
}
