package graft

import org.apache.spark.sql.functions._
import graft.engine.Layout

/** Z-order layout: key correctness against an independent Morton
  * implementation, and the clustered-write property that makes it matter —
  * non-overlapping per-file Z ranges (tight min/max footer stats on BOTH
  * interleaved columns). */
class LayoutSpec extends SparkSuite {

  /** Independent reference Morton interleave (bit-twiddling, not column ops). */
  private def morton(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
    }

  test("zValue matches an independent Morton implementation") {
    val s = spark; import s.implicits._
    val pairs = for (a <- Seq(0L, 1L, 2L, 7L, 255L, 256L, 65535L); b <- Seq(0L, 1L, 3L, 100L, 65535L))
      yield (a, b)
    val out = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b").as("z")).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("z") == morton(r.getAs[Long]("a"), r.getAs[Long]("b")),
        s"mismatch at (${r.get(0)}, ${r.get(1)})")
    }
    // interleave is a bijection on 16+16 bits: distinct inputs → distinct keys
    assert(out.map(_.getAs[Long]("z")).distinct.length == pairs.length)
  }

  test("zValue fails loudly on keys outside [0, 2^bits) instead of silently aliasing") {
    val s = spark; import s.implicits._
    val df = Seq((65536L, 1L), (-1L, 1L)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(Layout.zValue($"a", $"b").as("z")).collect()
    }
    assert(e.getMessage.contains("zValue: key outside"),
      s"expected the in-column guard to raise, got: ${e.getMessage}")
  }

  test("zorderWrite: per-file Z ranges are non-overlapping (clustered layout)") {
    val dir = "/root/testdata/sf0.001"
    val path = "/tmp/graft_test_zorder"
    rmTree(path)
    Layout.zorderWrite(
      graft.engine.Tables.customer(spark, dir), "c_custkey", "c_nationkey", path, numFiles = 4)
    val files = spark.read.parquet(path)
      .withColumn("z", Layout.zValue(col("c_custkey"), col("c_nationkey")))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min("z").as("zmin"), max("z").as("zmax"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[Long]("zmin"), r.getAs[Long]("zmax"), r.getAs[Long]("n")))
      .sortBy(_._1)
    assert(files.length >= 2, "the clustered write produced multiple files")
    files.sliding(2).foreach {
      case Array((_, max1, _), (min2, _, _)) =>
        assert(max1 <= min2, s"file Z ranges overlap: $files")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(files.map(_._3).sum == graft.engine.Tables.customer(spark, dir).count())
  }

  test("compact: a fragmented directory rewrites to the computed file count, rows intact") {
    val dir = "/root/testdata/sf0.001"
    val frag = "/tmp/graft_test_frag"
    val out = "/tmp/graft_test_compacted"
    rmTree(frag); rmTree(out)
    val orders = graft.engine.Tables.orders(spark, dir)
    orders.repartition(32).write.parquet(frag)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(frag).length == 32, "fixture: fragmented input")
    val totalBytes = parquetFiles(frag).map(_.length).sum
    val n = Layout.compact(spark, frag, out, targetFileBytes = totalBytes / 4 + 1)
    assert(n >= 2 && n <= 8, s"expected a single-digit target, got $n")
    assert(parquetFiles(out).length == n, "output file count matches the computed target")
    assert(spark.read.parquet(out).count() == orders.count())
  }

  test("compact sizes a Hive-partitioned layout recursively (no 0-byte collapse)") {
    val dir = "/root/testdata/sf0.001"
    val part = "/tmp/graft_test_part_compact"
    val out = "/tmp/graft_test_part_compacted"
    rmTree(part); rmTree(out)
    Layout.partitionedOrdersWrite(spark, dir, part)
    // tiny target forces multiple files IF the recursive listing saw the
    // real bytes; the old flat listing computed bytes=0 -> always 1 file
    val n = Layout.compact(spark, part, out, targetFileBytes = 16 << 10)
    assert(n >= 2, s"partitioned input must not collapse to one file, got $n")
    assert(spark.read.parquet(out).count() ==
      graft.engine.Tables.orders(spark, dir).count())
  }

  test("rendezvous shards: steal-only invariant — every mover lands on the new shard") {
    val dir = "/root/testdata/sf0.001"
    val a = Layout.rendezvousAssignments(spark, dir, n = 8)
    val rows = a.collect()
    assert(rows.nonEmpty)
    // adding shard 8 can only STEAL: a changed assignment is always -> 8
    rows.foreach { r =>
      val (b, aft) = (r.getAs[Long]("shard_before"), r.getAs[Long]("shard_after"))
      assert(b >= 0 && b < 8 && aft >= 0 && aft <= 8)
      if (b != aft) assert(aft == 8L, s"mover went $b -> $aft, not to the new shard")
    }
    // movement is ~1/9 of docs, nothing like mod-N's 8/9 reshuffle
    val moved = rows.count(r =>
      r.getAs[Long]("shard_before") != r.getAs[Long]("shard_after"))
    assert(moved > 0 && moved < rows.length / 4,
      s"expected ~1/9 movement, got $moved of ${rows.length}")
    // the audit rollup agrees with the per-doc assignments
    val audit = Layout.rendezvousShards(spark, dir).collect()
      .map(r => r.getAs[Long]("shard_before") -> r.getAs[Long]("n_moved")).toMap
    val byShard = rows.groupBy(_.getAs[Long]("shard_before"))
      .map { case (k, v) => k -> v.count(r =>
        r.getAs[Long]("shard_after") != k).toLong }
    assert(audit == byShard)
  }

  test("q183 delete amplification: both strategies reconcile with a direct recompute") {
    val dir = "/root/testdata/sf0.001"
    val out = Layout.deleteAmplification(spark, dir).collect()
      .map(r => r.getAs[String]("strategy") -> r).toMap
    val orders = graft.engine.Tables.orders(spark, dir)
    val nDel = orders.filter(col("o_orderkey") % 13 === 0).count()
    val dv = out("deletion_vector")
    val cow = out("copy_on_write")
    assert(dv.getAs[Long]("rows_written") == nDel &&
      dv.getAs[Long]("rows_deleted") == nDel)
    assert(dv.getAs[Long]("write_amp_ppm") == 1000000L,
      "deletion vectors write exactly the deleted rows")
    assert(cow.getAs[Long]("files_touched") == dv.getAs[Long]("files_touched"))
    assert(cow.getAs[Long]("write_amp_ppm") >= 1000000L)
    // cow rows_written == all rows of files containing >= 1 delete
    val cowRows = orders.select(
      expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT) div 30").as("f"),
      (col("o_orderkey") % 13 === 0).cast("long").as("d"))
      .groupBy(col("f")).agg(count(lit(1)).as("n"), sum(col("d")).as("nd"))
      .filter(col("nd") > 0).agg(sum(col("n"))).head().getLong(0)
    assert(cow.getAs[Long]("rows_written") == cowRows)
  }
}
