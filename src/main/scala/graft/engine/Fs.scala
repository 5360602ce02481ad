package graft.engine

/** Local-filesystem scratch helpers shared by the scratch-dir lifecycles in
  * [[graft.ext.Dedup]], [[Bucketing]], and the test suites (one definition —
  * the four previous copies each lacked the null guard below).
  *
  * These are for JVM-local scratch/warehouse paths only. Anything that may
  * live on a non-local filesystem (e.g. gold partition directories at cluster
  * scale) must go through Hadoop's `FileSystem` API instead — see
  * [[graft.streaming.IncrementalPipeline.refreshGoldOrderYears]].
  */
object Fs {

  private val scratchDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => scratchDirs.forEach(rmTree)))

  /** JVM-lifetime scratch dir (shutdown-hook reclaimed) for operators that
    * materialize intermediate or roundtrip data (partitioned/ORC/bucketed
    * sinks, iterative label snapshots). Mirrors the lifecycle of
    * [[graft.ext.Dedup]]'s private Scratch: a returned lazy frame may still
    * read the dir, so eager deletion is unsafe; the hook reclaims it at JVM
    * exit. */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    scratchDirs.add(p)
    p
  }

  /** Recursively delete `path`; no-op if absent. `listFiles` returns null on
    * an IO error or a concurrent delete — guarded, so one bad directory
    * cannot abort a caller iterating over many (the Dedup shutdown hook
    * cleans its whole queue on one thread). */
  def rmTree(path: String): Unit = rm(new java.io.File(path))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
    f.delete(): Unit
  }
}
