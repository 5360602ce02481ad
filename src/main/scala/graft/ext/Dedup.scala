package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Near-duplicate detection operators (MinHash+LSH, SimHash, n-gram Jaccard)
  * over the `documents` table.
  *
  * Scale design: all three avoid the O(n²) all-pairs comparison.
  *  - MinHash/LSH: per-doc signatures are a narrow shuffle-free projection +
  *    one hash aggregate; candidate generation is an equi-join on band hashes,
  *    so the shuffle key is the band bucket, not the document. At 100 TB a hot
  *    band (e.g. boilerplate docs) would skew that join — AQE skew-join splits
  *    it, and the band hash can be salted with a shingle-count suffix if needed.
  *  - SimHash: one explode + one aggregate per doc, then grouping on the
  *    64→16-bit signature finds exact-signature buckets.
  *  - n-gram Jaccard: evaluated only on candidate pairs (here: consecutive
  *    doc_ids as the deterministic stand-in for LSH candidates), never all pairs.
  *
  * Hashing is md5-based (not Spark's murmur/xxhash) so the DuckDB oracle can
  * recompute identical values; MinHash uses the *lexicographic* min of seeded
  * md5 hex strings — any total order over a uniform hash family preserves the
  * MinHash collision property, and string ordering is engine-portable.
  */
object Dedup {

  private val numSeeds = 12 // 6 bands x 2 rows per band
  private val numBands = 6

  /** words → distinct 3-word shingles, 1-based indexing to mirror DuckDB lists. */
  private val shingles: Column = expr(
    """array_distinct(transform(sequence(1, size(words)-2),
      |  i -> concat_ws(' ', element_at(words, i), element_at(words, i+1), element_at(words, i+2))))""".stripMargin)

  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(shingles).as("sh"))

  /** Per-document MinHash band hashes: `numSeeds` signature slots grouped into
    * `numBands` bands of 2 rows. Output (doc_id, band_idx, band_hash). */
  def minhashBands(spark: SparkSession, dir: String): DataFrame =
    docShingles(spark, dir)
      .select(col("doc_id"), col("sh"), explode(expr(s"sequence(0, ${numSeeds - 1})")).as("seed"))
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(md5(concat(col("sh"), lit("#"), col("seed")))).as("sig"))
      .withColumn("band_idx", expr("seed div 2").cast("int"))
      .groupBy(col("doc_id"), col("band_idx"))
      .agg(md5(concat(
        max(when(col("seed") % 2 === 0, col("sig"))),
        max(when(col("seed") % 2 === 1, col("sig"))))).as("band_hash"))
      .orderBy("doc_id", "band_idx")

  /** LSH candidate pairs: documents sharing >= 1 band hash. The join key is the
    * (band_idx, band_hash) bucket — this is the step that makes near-dup
    * detection feasible at 100 TB (bucket join instead of all-pairs). */
  def minhashCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val bands = minhashBands(spark, dir)
    val a = bands.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

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
