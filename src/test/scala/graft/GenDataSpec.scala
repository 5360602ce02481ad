package graft

import org.apache.spark.sql.functions._

/** Law validation for the deterministic SF generator — the fixture the
  * cross-SF growth gate runs on. Round 8 changed the document token draw
  * from uniform-31 to Zipf(s=0.5) over a Heaps-growing vocabulary
  * (V(m) = 31·√m), so the laws pinned here are the ones the dedup /
  * similarity measurements depend on:
  *  - planted exact-dup and near-dup structure at the driver fixture's
  *    RATES, with the near-dup Jaccard ≥ 0.875 / never-exactly-1 law;
  *  - token draw follows the planted Zipf law (head-rank shares match the
  *    inverse-CDF p_k = (√k − √(k−1))/√V);
  *  - vocabulary grows with the multiplier and rank→word is stable (a
  *    larger fixture only APPENDS tail words, so cross-SF comparisons see
  *    the same head vocabulary).
  */
class GenDataSpec extends SparkSuite {

  test("vocabSize: Heaps growth anchored at 31") {
    assert(GenData.vocabSize(0.1) == 31)
    assert(GenData.vocabSize(1.0) == 31)
    assert(GenData.vocabSize(10.0) == 98)
    assert(GenData.vocabSize(100.0) == 310)
  }

  test("token draw: Zipf(s=0.5) head shares and vocabulary coverage") {
    val s = spark; import s.implicits._
    // ~55k tokens at V = vocabSize(10) = 98
    val toks = spark.range(0L, 1000L, 1L, 4)
      .select(explode(GenData.toksOf(col("id"), GenData.vocabSize(10.0)))
        .as("tok"))
    val counts = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // inverse-CDF law: P(rank k) = (sqrt(k) - sqrt(k-1)) / sqrt(V)
    def p(k: Int, v: Int) = (math.sqrt(k) - math.sqrt(k - 1)) / math.sqrt(v)
    // rank 1 = "a", rank 2 = "agg" (base vocab order); ±25% sampling slack
    assert(math.abs(counts("a") / total - p(1, 98)) < 0.25 * p(1, 98),
      s"head token share ${counts("a") / total} vs law ${p(1, 98)}")
    assert(math.abs(counts("agg") / total - p(2, 98)) < 0.25 * p(2, 98))
    // heavier head than tail: rank-1 share ≫ uniform 1/98
    assert(counts("a") / total > 3.0 / 98)
    // tail words exist and are word-like synthetics ("a1".."window2", ...)
    val distinct = counts.keySet
    assert(distinct.exists(_.matches("[a-z]+[0-9]+")), "no synthetic tail words")
    // coverage: most of the 98-word space realized in 55k draws (tail ranks
    // near V have p ≈ 1/(2·98·√98) ≈ 5e-4 → expected ~28 draws each)
    assert(distinct.size > 85 && distinct.size <= 98,
      s"distinct=${distinct.size}, want (85, 98]")
  }

  test("rank→word stable across multipliers (growth only appends tail words)") {
    val s = spark; import s.implicits._
    // same (doc, position) prefix tokens agree between V(1) and V(10)
    // WHERE the drawn rank is within the smaller vocabulary; ranks are the
    // same uniform u either way only when u² lands proportionally — the
    // stability contract is rank→word, so check via wordOf equivalence:
    // every token drawn at V=31 is one of the 31 base words, and the SAME
    // hash draw at V=98 maps to a rank ≤ 98 whose word extends the base
    // vocab (never renames it)
    val v31 = spark.range(0L, 200L, 1L, 2)
      .select(explode(GenData.toksOf(col("id"), 31)).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(v31.forall(t => !t.exists(_.isDigit)), "V=31 must draw only base words")
    val v98 = spark.range(0L, 200L, 1L, 2)
      .select(explode(GenData.toksOf(col("id"), 98)).as("tok"))
      .distinct().collect().map(_.getString(0)).toSet
    // ranks 1-31 carry √(31/98) ≈ 56% of the draw mass at V=98, so every
    // base word appears: the head vocabulary persists as V grows
    assert(v31.subsetOf(v98), s"missing head words: ${v31 -- v98}")
  }

  test("generated fixture at mult=0.2: planted dup laws hold under the Zipf draw") {
    val out = "/tmp/graft_genspec"
    rmTree(out)
    GenData.gen(spark, out, 0.2) // 1000 docs — two exact-dup ids (89, 714)
    val docs = spark.read.parquet(s"$out/documents.parquet")
      .select(col("doc_id"), col("text"))
    val byId = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 1000)

    // exact dups: id % 625 == 89 copies id - 84
    for (id <- Seq(89L, 714L))
      assert(byId(id) == byId(id - 84), s"exact dup $id != ${id - 84}")

    // near dups: id % 100 in [90, 94] copies id - 90 minus trailing token;
    // 3-gram shingle Jaccard (L-3)/(L-2) >= 0.875, never exactly 1
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val nearIds = (0L until 1000L).filter(i => i % 100 >= 90 && i % 100 <= 94)
    assert(nearIds.size == 50, "near-dup rate: 5% of docs")
    var exact = 0
    nearIds.foreach { id =>
      val (a, b) = (byId(id), byId(id - 90))
      assert(a == b.split(" ").dropRight(1).mkString(" "),
        s"near dup $id must be ${id - 90} minus its trailing token")
      val (sa, sb) = (shingles(a), shingles(b))
      val j = (sa & sb).size.toDouble / (sa | sb).size
      assert(j >= 0.875, s"near-dup $id Jaccard $j < 0.875")
      if (a == b) exact += 1
    }
    assert(exact == 0, "near dups must never be exact (lengths differ)")

    // doc length law: 10..100 tokens for plain docs (9..99 for mutated)
    val lens = byId.values.map(_.split(" ").length)
    assert(lens.min >= 9 && lens.max <= 100, s"len range ${lens.min}..${lens.max}")
    rmTree(out)
  }
}
