package graft

import org.scalatest.funsuite.AnyFunSuite

/** Governance tests for Bench's environmental-flag attribution (VERDICT
  * r12 #3): `SPARK_GRAFT_ATTRIBUTED_FLAGS` must not be a free pass — an
  * attribution is accepted only when the run's OWN recorded evidence
  * supports the claimed mechanism, and never past 1.5× the bound. The
  * accept case uses the real q93 sf1000 numbers (the one attribution
  * round 12 validated by hand: 12.19× vs bound 12, 35 GB exchange +
  * 15.2 GB fixture against a 33.5 GB recorded cache line at min pass —
  * `bench_sf1000_text.json`), so the gate is known to pass the artifact
  * it was designed around.
  */
class BenchAttributionSpec extends AnyFunSuite {

  private val q93Reason =
    "io(exchange_gb=35) distinct-shingle exchange through one virtio device"
  private val q93Fixture = 15248719400L // bench_sf1000_text.json env block
  private val q93BcKb = 32733144L

  test("accepts the corroborated q93-shaped attribution (ratio under cap, working set exceeds recorded cache)") {
    val v = Bench.checkAttribution(q93Reason, Some(12.186), 12.0,
      q93Fixture, Some(q93BcKb))
    assert(v.accepted, v.note)
    assert(v.exchangeGb == 35.0)
  }

  test("rejects past the 1.5x cap regardless of reason — a large regression cannot be waved through") {
    val v = Bench.checkAttribution(q93Reason, Some(12.0 * 1.5 + 0.1), 12.0,
      q93Fixture, Some(q93BcKb))
    assert(!v.accepted)
    assert(v.note.contains("cap"), v.note)
  }

  test("accepts exactly at the cap boundary (<=, not <)") {
    val v = Bench.checkAttribution(q93Reason, Some(12.0 * Bench.AttributionCapFactor),
      12.0, q93Fixture, Some(q93BcKb))
    assert(v.accepted, v.note)
  }

  test("rejects when the claimed working set fits the recorded page cache — the named mechanism could not operate") {
    // 2 GB exchange + 15 GB fixture against a 33.5 GB cache: everything the
    // query touched was cache-resident, so an I/O attribution is untrue
    val v = Bench.checkAttribution(
      "io(exchange_gb=2) small exchange", Some(12.186), 12.0,
      q93Fixture, Some(q93BcKb))
    assert(!v.accepted)
    assert(v.note.contains("fits the recorded page cache"), v.note)
  }

  test("rejects a free-text reason with no machine-readable evidence claim") {
    val v = Bench.checkAttribution(
      "the box was slow that day", Some(12.186), 12.0, q93Fixture, Some(q93BcKb))
    assert(!v.accepted)
    assert(v.note.contains("machine-readable"), v.note)
  }

  test("rejects when no buff/cache reading exists at the query's min pass") {
    val v = Bench.checkAttribution(q93Reason, Some(12.186), 12.0, q93Fixture, None)
    assert(!v.accepted)
    assert(v.note.contains("buff/cache"), v.note)
  }

  test("rejects a ratio-less flag (base failed) — nothing to attribute") {
    val v = Bench.checkAttribution(q93Reason, None, 12.0, q93Fixture, Some(q93BcKb))
    assert(!v.accepted)
    assert(v.note.contains("base"), v.note)
  }

  test("fractional exchange_gb parses; malformed evidence values do not") {
    assert(Bench.checkAttribution("io(exchange_gb=0.5) tiny", Some(11.0), 12.0,
      40L << 30, Some(1L << 20)).accepted) // 0.5G+40G > 1GB cache
    assert(!Bench.checkAttribution("io(exchange_gb=lots) huge", Some(11.0), 12.0,
      40L << 30, Some(1L << 20)).accepted)
  }
}
