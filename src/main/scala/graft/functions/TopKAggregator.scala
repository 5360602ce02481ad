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
