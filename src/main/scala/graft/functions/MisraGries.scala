package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitter sketch as a typed, MERGEABLE aggregator — the
  * scale-safe first pass of exact heavy-hitter detection. The buffer holds at
  * most k (term, count) slots plus the exact total item count; the classic
  * guarantee (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS 2012) is that every term with true frequency > n/k
  * SURVIVES in the final buffer, regardless of partition order or merge tree
  * shape. Counts in the buffer are noisy (up to n/k under-counted) — callers
  * MUST treat the output as a candidate set and re-count exactly in a second
  * pass (see [[graft.ext.TextStats.heavyHitters]]), which restores full
  * determinism: the verified output is independent of how partitions merged.
  *
  * Why this beats a full groupBy at 100 TB: the shuffle carries only
  * k·numPartitions slots (k is hundreds), not the full term cardinality; the
  * driver receives ≤ k candidates. The second pass shuffles only rows
  * matching the broadcast candidate set.
  */
final case class MgBuffer(counts: mutable.HashMap[String, Long], var n: Long)

class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MgBuffer, (Seq[String], Long)] {

  override def zero: MgBuffer = MgBuffer(mutable.HashMap.empty, 0L)

  override def reduce(b: MgBuffer, t: String): MgBuffer = {
    b.n += 1
    b.counts.get(t) match {
      case Some(c) => b.counts.update(t, c + 1)
      case None if b.counts.size < k => b.counts.update(t, 1L)
      case None =>
        // decrement-all: every slot loses 1, emptied slots are freed; the
        // unseen item is "cancelled" against k existing singletons
        val dead = b.counts.iterator.filter(_._2 == 1L).map(_._1).toList
        dead.foreach(b.counts.remove)
        b.counts.mapValuesInPlace((_, c) => c - 1)
    }
    b
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    b.counts.foreach { case (t, c) => a.counts.update(t, a.counts.getOrElse(t, 0L) + c) }
    a.n += b.n
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest count from every slot, drop <= 0 —
      // the mergeable-summaries trim that preserves the > n/k guarantee
      val cut = a.counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = a.counts.iterator.filter(_._2 <= cut).map(_._1).toList
      dead.foreach(a.counts.remove)
      a.counts.mapValuesInPlace((_, c) => c - cut)
    }
    a
  }

  /** Candidate terms (sorted for determinism of the driver-side array) and
    * the EXACT total item count n, both from the single pass. */
  override def finish(b: MgBuffer): (Seq[String], Long) =
    (b.counts.keys.toSeq.sorted, b.n)

  override def bufferEncoder: Encoder[MgBuffer] = Encoders.kryo[MgBuffer]
  override def outputEncoder: Encoder[(Seq[String], Long)] =
    Encoders.kryo[(Seq[String], Long)]
}
