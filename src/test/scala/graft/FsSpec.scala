package graft

/** Contracts of the [[graft.engine.Fs]] read-resolution memo (round-13
  * optimization; hardened per round-13 ADVICE): eviction on application end
  * so stopped sessions cannot leak resolved plans, and a directory signature
  * that detects same-name in-place rewrites by size even when mtime
  * granularity hides them. */
class FsSpec extends SparkSuite {

  test("readParquet memo: entries for a context drop on eviction and re-resolve cleanly") {
    val dir = "/tmp/graft_fs_spec/t1"
    rmTree(dir)
    spark.range(5).write.mode("overwrite").parquet(dir)
    assert(graft.engine.Fs.readParquet(spark, dir).count() == 5)
    assert(graft.engine.Fs.readMemoSize > 0, "read resolution is memoized")
    // the same routine the per-context ApplicationEnd listener invokes —
    // exercising it directly (stopping the shared test session would kill
    // every later suite in this JVM)
    graft.engine.Fs.evictFor(spark.sparkContext)
    assert(graft.engine.Fs.readMemoSize == 0,
      "all entries riding the ended context are evicted")
    // memo re-populates and serves correct data after eviction
    assert(graft.engine.Fs.readParquet(spark, dir).count() == 5)
    assert(graft.engine.Fs.readMemoSize > 0)
  }

  test("pathSig: a same-name same-mtime rewrite with different length changes the signature") {
    val dir = new java.io.File("/tmp/graft_fs_spec/t2")
    rmTree(dir.getPath)
    dir.mkdirs()
    val f = new java.io.File(dir, "part-000")
    val mt = 1700000000000L // fixed mtime: simulate a rewrite inside the mtime granularity window
    java.nio.file.Files.writeString(f.toPath, "abc")
    assert(f.setLastModified(mt) && dir.setLastModified(mt))
    val s1 = graft.engine.Fs.pathSig(dir.getPath)
    java.nio.file.Files.writeString(f.toPath, "abcdef")
    assert(f.setLastModified(mt) && dir.setLastModified(mt))
    val s2 = graft.engine.Fs.pathSig(dir.getPath)
    assert(s1 != s2, "file LENGTH must be folded into the signature")
  }
}
