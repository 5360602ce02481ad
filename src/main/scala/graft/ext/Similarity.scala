package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths, mirroring how a production vector pipeline scales:
  *  - [[cosineTopK]]: brute-force exact top-k — the small-query-set baseline.
  *    The (tiny) query set is broadcast against one linear pass over the
  *    corpus; ranking shuffles only (n_queries × corpus_partition) candidate
  *    rows on query_id. Linear in corpus size → works at any SF, but cost
  *    grows with |queries| × |corpus|.
  *  - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH — the 100 TB path.
  *    Each vector hashes to an 8-bit bucket in one projection pass (no
  *    shuffle); candidate generation is an equi-join on the bucket, so search
  *    cost is |queries| × |bucket|, ~1/256 of brute force per plane-octet.
  *    Hyperplane signs are derived from md5 parity (deterministic, no RNG
  *    state), so the DuckDB oracle reproduces them exactly.
  *
  * Dot products run as higher-order `aggregate`/`zip_with` column expressions
  * over double-cast elements — no UDFs, stays in codegen.
  */
object Similarity {

  /** embedding as array<double> plus its L2 norm. */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", expr("sqrt(aggregate(v, CAST(0 AS DOUBLE), (a, x) -> a + x * x))"))

  private val dotExpr =
    "aggregate(zip_with(qv, nv, (x, y) -> x * y), CAST(0 AS DOUBLE), (a, x) -> a + x)"

  /** Exact brute-force cosine top-k for query vectors vec_id < nQueries. */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val all = vecs(spark, dir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val corpus = all.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(corpus)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic ±1 hyperplane component for (plane p, 1-based dim d):
    * parity of the last md5 hex digit of "p,d". */
  private def signExpr(p: Int): String =
    s"(CASE WHEN conv(substring(md5(concat('$p', ',', CAST(d AS STRING))), 32, 1), 16, 10) % 2 = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"

  /** 8-bit LSH bucket per vector: bit p = sign-projection onto hyperplane p. */
  def lshBuckets(spark: SparkSession, dir: String, nPlanes: Int = 8): DataFrame = {
    val proj = (0 until nPlanes).map { p =>
      s"aggregate(transform(sequence(1, size(v)), d -> element_at(v, d) * ${signExpr(p)}), CAST(0 AS DOUBLE), (a, x) -> a + x)"
    }
    val bucket = proj.zipWithIndex
      .map { case (e, p) => s"(CASE WHEN $e > 0 THEN ${1 << p} ELSE 0 END)" }
      .mkString(" + ")
    vecs(spark, dir)
      .select(col("vec_id"), col("v"), col("nrm"), expr(bucket).cast("int").as("bucket"))
  }

  /** ANN top-k: exact cosine ranking restricted to the query's LSH bucket. */
  def annTopK(spark: SparkSession, dir: String, k: Int = 3, nQueries: Int = 20): DataFrame = {
    val all = lshBuckets(spark, dir)
    val q = all.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val corpus = all.select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("nrm").as("nn"), col("bucket"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q).join(corpus, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", expr(dotExpr) / (col("qn") * col("nn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("neighbor_id"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Bucket histogram — the observability query for LSH balance (skew here is
    * what would motivate salting at scale). */
  def lshBucketStats(spark: SparkSession, dir: String): DataFrame =
    lshBuckets(spark, dir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy("bucket")
}
