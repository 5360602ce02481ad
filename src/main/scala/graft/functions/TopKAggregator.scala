package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k best (value, key) pairs per partition
  * and merges trimmed buffers — so a global top-k shuffles only
  * k·numPartitions rows instead of sorting the full dataset the way
  * `Window.orderBy(...desc)` does (which collapses everything into ONE task).
  * At 100 TB that's the difference between a broadcast-sized merge and an
  * un-runnable single-partition sort.
  *
  * Ordering: value desc, key asc (total order → deterministic, matches the
  * window-based form and the DuckDB oracle tie-break).
  */
final case class KeyedValue(key: Long, value: Double)

class TopKAggregator(k: Int)
    extends Aggregator[KeyedValue, List[KeyedValue], Seq[KeyedValue]] {

  private val ord: Ordering[KeyedValue] =
    Ordering.by((kv: KeyedValue) => (-kv.value, kv.key))

  override def zero: List[KeyedValue] = Nil

  override def reduce(buf: List[KeyedValue], in: KeyedValue): List[KeyedValue] =
    trim(in :: buf)

  override def merge(a: List[KeyedValue], b: List[KeyedValue]): List[KeyedValue] =
    trim(a ::: b)

  override def finish(buf: List[KeyedValue]): Seq[KeyedValue] = buf.sorted(ord)

  private def trim(l: List[KeyedValue]): List[KeyedValue] = l.sorted(ord).take(k)

  override def bufferEncoder: Encoder[List[KeyedValue]] = Encoders.kryo[List[KeyedValue]]
  override def outputEncoder: Encoder[Seq[KeyedValue]] = Encoders.kryo[Seq[KeyedValue]]
}

/** One per-key row-count record ([[graft.engine.Skew.keyShares]], q102). */
final case class KeyedCount(key: Long, n: Long)

/** Single-pass key-share sketch: the k heaviest keys by row count AND the
  * grand total in ONE aggregation over the per-key count frame — the
  * [[JoinCardAggregator]] shape (q178's sf100 fix) applied to the generic
  * top-N-with-share profile, retiring the `crossJoin(broadcast(total))`
  * form whose total branch re-ran the fact-scale count lineage as a
  * separate broadcast job (VERDICT r9 #4 sweep). Partial state is k rows +
  * one long per partition; merge volume k·numPartitions.
  *
  * Ordering: n desc, key asc — the total order the relational
  * `ORDER BY n_rows DESC, key LIMIT k` oracle applies. */
class TopKCountAggregator(k: Int)
    extends Aggregator[KeyedCount, (List[KeyedCount], Long), (Seq[KeyedCount], Long)] {

  private val ord: Ordering[KeyedCount] =
    Ordering.by((kc: KeyedCount) => (-kc.n, kc.key))

  override def zero: (List[KeyedCount], Long) = (Nil, 0L)

  override def reduce(buf: (List[KeyedCount], Long), in: KeyedCount): (List[KeyedCount], Long) =
    (trim(in :: buf._1), buf._2 + in.n)

  override def merge(a: (List[KeyedCount], Long), b: (List[KeyedCount], Long)): (List[KeyedCount], Long) =
    (trim(a._1 ::: b._1), a._2 + b._2)

  override def finish(buf: (List[KeyedCount], Long)): (Seq[KeyedCount], Long) =
    (buf._1.sorted(ord), buf._2)

  private def trim(l: List[KeyedCount]): List[KeyedCount] = l.sorted(ord).take(k)

  override def bufferEncoder: Encoder[(List[KeyedCount], Long)] =
    Encoders.kryo[(List[KeyedCount], Long)]
  override def outputEncoder: Encoder[(Seq[KeyedCount], Long)] =
    Encoders.kryo[(Seq[KeyedCount], Long)]
}

/** One per-key degree record of a join-cardinality estimate (q178). */
final case class JoinDegree(key: Long, rows_a: Long, rows_b: Long, join_rows: Long)

/** Single-pass join-cardinality sketch: the k heaviest keys by predicted
  * join output AND the total predicted rows in ONE aggregation over the
  * per-key degree frame. The round-8 form computed the total with a
  * `crossJoin(broadcast(total))` — which re-executed the whole degree
  * pipeline (two full shuffles live on disk at once; the sf100 run died on
  * "No space left on device" inside exactly that doubled shuffle). Folding
  * the running total into the top-k buffer makes the lineage single-pass by
  * construction: per-partition partial (k rows + one long), merge volume
  * k·numPartitions, one output row.
  *
  * Ordering: join_rows desc, key asc — the same total order the relational
  * `ORDER BY join_rows DESC, key LIMIT k` oracle applies. */
class JoinCardAggregator(k: Int)
    extends Aggregator[JoinDegree, (List[JoinDegree], Long), (Seq[JoinDegree], Long)] {

  private val ord: Ordering[JoinDegree] =
    Ordering.by((jd: JoinDegree) => (-jd.join_rows, jd.key))

  override def zero: (List[JoinDegree], Long) = (Nil, 0L)

  override def reduce(buf: (List[JoinDegree], Long), in: JoinDegree): (List[JoinDegree], Long) =
    (trim(in :: buf._1), buf._2 + in.join_rows)

  override def merge(a: (List[JoinDegree], Long), b: (List[JoinDegree], Long)): (List[JoinDegree], Long) =
    (trim(a._1 ::: b._1), a._2 + b._2)

  override def finish(buf: (List[JoinDegree], Long)): (Seq[JoinDegree], Long) =
    (buf._1.sorted(ord), buf._2)

  private def trim(l: List[JoinDegree]): List[JoinDegree] = l.sorted(ord).take(k)

  override def bufferEncoder: Encoder[(List[JoinDegree], Long)] =
    Encoders.kryo[(List[JoinDegree], Long)]
  override def outputEncoder: Encoder[(Seq[JoinDegree], Long)] =
    Encoders.kryo[(Seq[JoinDegree], Long)]
}

/** One scored term of one document ([[graft.ext.TextStats.tfidfTopTerms]],
  * q63). */
final case class DocTermScore(doc_id: Long, term: String, tf: Long, df: Long,
    score: Double)

/** Per-document top-k TF-IDF terms in ONE aggregation (q63, round 10). The
  * window form shuffled the full (doc, term) stream TWICE — once into the
  * tf groupBy, once into the per-doc rank window — ~125 GB of exchange at
  * 50 M docs, which is what filled the disk in the sf1000 probe. Exploded
  * doc rows are PARTITION-LOCAL (explode never crosses partitions), so a
  * trimming partial aggregate reduces each doc to k structs map-side and
  * the per-doc exchange carries k rows per doc instead of the doc's whole
  * vocabulary — ~100× less exchange mass, and the shape a 100 TB corpus
  * needs (per-doc state never exceeds k).
  *
  * Ordering: score desc, term asc — the exact total order of the window
  * form (`row_number over (partition by doc order by score desc, term)`),
  * on the UNROUNDED double score, so ranks are bit-identical. Term ties
  * compare UTF-8 BYTES (unsigned), not JVM chars: Spark's UTF8String and
  * DuckDB's varchar both order strings by UTF-8 code points, while String's
  * natural order is UTF-16 code-unit order — the two disagree exactly on
  * supplementary (non-BMP) characters, where surrogates (0xD800-0xDFFF)
  * sort BELOW later BMP chars in UTF-16 but their UTF-8 encoding (0xF0+)
  * sorts above (round-10 ADVICE). */
class TfIdfTopKAggregator(k: Int)
    extends Aggregator[DocTermScore, List[DocTermScore], Seq[DocTermScore]] {

  private val ord: Ordering[DocTermScore] = new Ordering[DocTermScore] {
    override def compare(a: DocTermScore, b: DocTermScore): Int = {
      val c = java.lang.Double.compare(b.score, a.score) // desc
      if (c != 0) c
      else java.util.Arrays.compareUnsigned(
        a.term.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  override def zero: List[DocTermScore] = Nil

  override def reduce(buf: List[DocTermScore], in: DocTermScore): List[DocTermScore] =
    trim(in :: buf)

  override def merge(a: List[DocTermScore], b: List[DocTermScore]): List[DocTermScore] =
    trim(a ::: b)

  override def finish(buf: List[DocTermScore]): Seq[DocTermScore] = buf.sorted(ord)

  private def trim(l: List[DocTermScore]): List[DocTermScore] = l.sorted(ord).take(k)

  override def bufferEncoder: Encoder[List[DocTermScore]] = Encoders.kryo[List[DocTermScore]]
  override def outputEncoder: Encoder[Seq[DocTermScore]] = Encoders.kryo[Seq[DocTermScore]]
}
