package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Near-duplicate detection operators (MinHash+LSH, SimHash, n-gram Jaccard)
  * over the `documents` table.
  *
  * Scale design: all three avoid the O(n²) all-pairs comparison.
  *  - MinHash/LSH: ONE md5 per distinct shingle, expanded into `numSeeds`
  *    independent hash slots with a universal-hash family
  *    h_i(x) = (a_i·H(x) + b_i) mod p (p = 2³¹−1, H = 28-bit md5 prefix) —
  *    integer arithmetic both engines compute exactly. All 12 minima fold in a
  *    single hash aggregate (no seed explode), bands pack 2 slots into one
  *    64-bit value, and candidate pairs come from per-bucket id lists — the
  *    signature pipeline runs ONCE, not once per join side.
  *  - SimHash: one explode + one aggregate per doc; grouping on the signature
  *    finds exact-signature buckets.
  *  - n-gram Jaccard: evaluated only on candidate pairs, never all pairs.
  *
  * At 100 TB the shuffle keys are the band buckets; a hot band (boilerplate
  * text) skews that aggregate — AQE skew handling applies, and the band value
  * can be salted with a shingle-count suffix if needed.
  *
  * Hashing is md5-based (not Spark's murmur/xxhash) so the DuckDB oracle can
  * recompute identical values.
  */
object Dedup {

  /** Universal-hash modulus (2³¹ − 1, prime). */
  val P: Long = 2147483647L

  /** 12 fixed (a, b) seed pairs → 6 bands × 2 rows. Arbitrary odd constants
    * < 2³¹; the oracle SQL embeds the same values. */
  val seedsAB: Seq[(Long, Long)] = Seq(
    (1099087573L, 98764321L), (2034674923L, 1122334455L),
    (1293847261L, 778899001L), (1847265431L, 445566771L),
    (1555555557L, 246813579L), (1777777781L, 135792467L),
    (1234567891L, 987654323L), (1987654321L, 123456791L),
    (1357913579L, 864208642L), (1468024681L, 975319753L),
    (1696969697L, 314159265L), (1818181819L, 271828183L))

  /** words → distinct 3-word shingles, 1-based indexing to mirror DuckDB lists. */
  private val shingles: Column = expr(
    """array_distinct(transform(sequence(1, size(words)-2),
      |  i -> concat_ws(' ', element_at(words, i), element_at(words, i+1), element_at(words, i+2))))""".stripMargin)

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(shingles).as("sh"))

  /** Per-document MinHash band hashes: (doc_id, band_idx 0..5, band_hash). */
  def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val sigCols = seedsAB.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % P).as(s"s$i")
    }
    val bandCols = (0 until 6).map { j =>
      (col(s"s${2 * j}") * P + col(s"s${2 * j + 1}")).as(s"band$j")
    }
    val stackExpr = (0 until 6).map(j => s"$j, band$j").mkString("stack(6, ", ", ", ") AS (band_idx, band_hash)")
    docShingles(spark, dir)
      // ONE md5 per (doc, shingle); 28-bit prefix → integer hash base
      .select(col("doc_id"), conv(substring(md5(col("sh")), 1, 7), 16, 10).cast("long").as("h"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), expr(stackExpr))
      .orderBy("doc_id", "band_idx")
  }

  /** LSH candidate pairs: documents sharing >= 1 band hash. Pairs are generated
    * from per-bucket sorted id lists (collect_list + pair explode), so the
    * signature pipeline is evaluated once — no self-join recompute. */
  def minhashCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    minhashBands(spark, dir)
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> named_struct('doc_a', x, 'doc_b', y))))""".stripMargin)).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")

  /** 16-bit SimHash per document from the first 4 md5 hex digits of each token
    * (with multiplicity — standard frequency-weighted SimHash). */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h16", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
    val bitSums = (0 until 16).map { b =>
      sum(when(shiftright(col("h16"), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"bit$b")
    }
    val sig = (0 until 16).map { b =>
      when(col(s"bit$b") > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
    toks.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), sig.cast("int").as("simhash16"))
      .orderBy("doc_id")
  }

  /** n-gram (3-word shingle) Jaccard similarity on candidate pairs.
    * Candidates here are consecutive doc_ids — a deterministic, oracle-checkable
    * stand-in; the production path feeds [[minhashCandidatePairs]] output in. */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir) // already distinct per (doc, shingle)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = counts.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
      .join(counts.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        col("doc_b") === col("doc_a") + 1)
    val common = sh.select(col("doc_id").as("doc_a"), col("sh"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_b") === col("doc_a") + 1)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs.join(common, Seq("doc_a", "doc_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .select(
        col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"))
      .orderBy("doc_a")
  }
}
