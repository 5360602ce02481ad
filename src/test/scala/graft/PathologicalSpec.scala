package graft

import org.apache.spark.sql.functions._

/** Adversarial-input hardening for the text-operator family (VERDICT r7
  * #7): the catalog's fixtures are well-formed; real corpora carry NUL
  * bytes, lone surrogates, megabyte single-token lines, empty and
  * whitespace-only docs, control characters, and astral-plane text. This
  * spec runs the full text family — tokenization/quality, fingerprint +
  * exact dedup, MinHash shingle/banding, ExactSubstr long-repeat spans +
  * rewrite, homoglyph skeleton, and sequence packing — over a planted
  * pathological corpus and pins (a) no crash anywhere and (b) the
  * documented behavior per class:
  *
  *  - empty / whitespace-only text: Spark's `split(" ")` KEEPS empty-string
  *    tokens (limit -1) — operators count them rather than crash; docs
  *    below the 3-token shingle floor (empty, single-token) emit no bands,
  *    while a whitespace-only doc legitimately bands on empty-token
  *    shingles.
  *  - NUL bytes and control chars: carried verbatim through tokenization
  *    (a token is any non-space run); fingerprint/skeleton treat them as
  *    ordinary code points — deterministic, not dropped.
  *  - lone surrogate: survives Spark's UTF8String round-trip (stored as
  *    its WTF-8-style byte form), hashes deterministically, and never
  *    equals a well-formed doc's fingerprint.
  *  - megabyte single token: one token, length-bounded paths (packing,
  *    token stats) stay linear — no per-char explode anywhere.
  *  - astral plane (emoji, CJK, combining marks): tokenized by spaces
  *    only; skeleton's NFKC handles them without exception.
  */
class PathologicalSpec extends SparkSuite {

  private val dir = "/tmp/graft_patho"

  private def plant(): Unit = {
    val s = spark; import s.implicits._
    rmTree(dir)
    val big = "x" * 1000000 // 1 MB single token, no spaces
    val docs = Seq(
      (0L, "", "en", "s0"), // empty
      (1L, "   ", "en", "s0"), // whitespace-only
      (2L, "a\u0000b \u0000 c\u0000", "en", "s0"), // NUL bytes
      (3L, "\uD800 lone high surrogate \uDC00 lone low", "en", "s0"),
      (4L, big, "en", "s1"), // megabyte single token
      (5L, "\t\r tab cr  control chars ", "en", "s1"),
      (6L, "😀 中文 日本語 ≋ café mañana 𝔘𝔫𝔦 ﬃ", "zh", "s1"), // astral + NFKC food
      (7L, "the quick brown fox jumps over the lazy dog today", "en", "s2"),
      (8L, "the quick brown fox jumps over the lazy dog today", "en", "s2"), // exact dup of 7
      (9L, ("repeat me five tokens now " * 3) + "tail marker here", "en", "s2") // planted long repeat
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("token stats / quality / lang-id survive all pathological classes") {
    plant()
    val stats = graft.ext.TextStats.tokenStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(stats.size == 10, "every doc scored, none dropped or crashed")
    // empty text: split yields one empty-string token (documented Java law)
    assert(stats(0L).getAs[Long]("n_tokens") >= 0L)
    // the megabyte token is ONE token
    assert(stats(4L).getAs[Long]("n_tokens") == 1L)
    val qual = graft.ext.TextStats.qualityScore(spark, dir).collect()
    assert(qual.length == 10)
    val langs = graft.ext.TextStats.langId(spark, dir).collect()
    assert(langs.length == 10)
  }

  test("fingerprint + exact dedup: deterministic on NULs/surrogates; finds only the planted pair") {
    plant()
    val dups = graft.ext.TextStats.exactDedup(spark, dir).collect()
    // one fp group per distinct NORMALIZED text: the planted pair 7/8
    // collapses, and so do the empty and whitespace-only docs — the
    // fingerprint's normText collapses whitespace, so both hash as ""
    // (documented normalization, the behavior a real cleaner wants).
    // No malformed doc ever aliases a clean one.
    assert(dups.length == 8, s"expected 8 fp groups, got ${dups.length}")
    val pairs = dups.filter(_.getAs[Long]("n_copies") == 2L)
      .map(_.getAs[Long]("survivor_doc_id")).toSet
    assert(pairs == Set(0L, 7L),
      s"dup groups must be {empty,whitespace} and {7,8}: $pairs")
    // fingerprints are deterministic: recompute equals itself even for the
    // surrogate/NUL docs (UTF8String round-trip is stable)
    val fp1 = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ext.TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp2 = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ext.TextStats.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp1 == fp2)
    assert(fp1.values.toSeq.distinct.size == 8,
      "only the planted pair and the whitespace-normalized pair collide")
  }

  test("MinHash bands + candidate pairs: sub-shingle docs emit nothing, no crash") {
    plant()
    val bands = graft.ext.Dedup.minhashBands(spark, dir).collect()
    assert(bands.nonEmpty)
    // docs below shingle width must not band: empty text and the megabyte
    // line are ONE token each. The whitespace-only doc DOES band — Spark's
    // split keeps trailing empty strings (limit -1), so "   " is four
    // empty tokens ≥ the 3-token shingle floor: documented, not a crash.
    val banded = bands.map(_.getAs[Long]("doc_id")).toSet
    assert(!banded.contains(0L) && !banded.contains(4L),
      s"sub-shingle docs must not produce bands: $banded")
    assert(banded.contains(1L), "whitespace-only doc bands (empty-token shingles)")
    val pairs = graft.ext.Dedup.minhashCandidatePairs(spark, dir).collect()
    // the planted exact pair is the only certain candidate
    assert(pairs.exists(r => r.getAs[Long]("doc_a") == 7L && r.getAs[Long]("doc_b") == 8L),
      "planted exact pair must surface as a candidate")
  }

  test("ExactSubstr spans + rewrite: planted repeat found, malformed docs pass through verbatim") {
    plant()
    val spans = graft.ext.Dedup.longRepeatSpans(spark, dir).collect()
    val spanDocs = spans.map(_.getAs[Long]("doc_id")).toSet
    assert(spanDocs.contains(9L), "the planted 5-token repeat must be detected")
    assert(!spanDocs.contains(4L), "a 1-token doc has no k-gram to repeat")
    val rewritten = graft.ext.Dedup.repeatCutRewrite(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rewritten.size == 10, "rewrite keeps every doc")
    assert(rewritten(4L).getAs[String]("clean_text") == "x" * 1000000,
      "repeat-free megabyte token passes through verbatim")
  }

  test("homoglyph skeleton: NFKC over astral/NULs/surrogates completes; packing conserves tokens") {
    plant()
    // graft_skeleton directly over every pathological text — must evaluate
    val sk = graft.engine.Tables.documents(spark, dir)
      .select(col("doc_id"), expr("graft_skeleton(text)").as("sk")).collect()
    assert(sk.length == 10 && sk.forall(_.getAs[String]("sk") != null))
    // NFKC folds the ligature and fullwidth forms in doc 6
    val s6 = sk.find(_.getLong(0) == 6L).get.getString(1)
    assert(s6.contains("ffi"), s"NFKC must fold ﬃ: $s6")
    // sequence packing over the pathological corpus: token conservation
    val manifest = graft.ext.TextStats.sequencePacking(spark, dir).collect()
    val manTokens = manifest.map(_.getAs[Long]("n_tokens")).sum
    val docTokens = graft.engine.Tables.documents(spark, dir)
      .select(sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(manTokens == docTokens, s"packing lost tokens: $manTokens != $docTokens")
    rmTree(dir)
  }
}
