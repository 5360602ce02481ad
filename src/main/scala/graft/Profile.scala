package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement harness for the optimization rounds (guide §1): per-JOB
  * wall-clock breakdown of selected catalog queries, after a warm pass, under
  * the SAME session configuration as [[Bench]]. A 235-query bench total only
  * says WHICH query is slow; this says which job/stage inside it — the
  * empirical half of the guide's measure-first loop.
  *
  * Usage: runMain graft.Profile <name-substring>[,<substring>...] [passes]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sel = args.headOption.map(_.split(',').toSeq).getOrElse(Seq.empty)
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val fixtureBytes = {
      def sz(f: java.io.File): Long =
        if (java.nio.file.Files.isSymbolicLink(f.toPath)) 0L
        else if (f.isDirectory) Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
        else f.length()
      sz(new java.io.File(sfDir))
    }
    val initParts = math.min(4096L,
      math.max(cpus.toLong, fixtureBytes / (8L << 20))).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.maxResultSize", "2g")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initParts.toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "52428800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level capture: (jobId, description, nanos, nStages, nTasks)
    case class Rec(id: Int, desc: String, var ms: Double = 0, var stages: Int = 0)
    val jobs = new scala.collection.mutable.ArrayBuffer[Rec]()
    val starts = new scala.collection.mutable.HashMap[Int, (Long, String, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val d = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts(js.jobId) = (System.nanoTime(), d, js.stageInfos.size)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(je.jobId).foreach { case (t0, d, ns) =>
          val r = Rec(je.jobId, d, (System.nanoTime() - t0) / 1e6, ns)
          jobs += r
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    val names = SparkEntry.queries.toSeq
      .filter(kv => sel.isEmpty || sel.exists(kv._1.contains)).sortBy(_._1)
    // warm pass (codegen + at-rest index builds), untimed
    names.foreach { case (n, fn) =>
      try materialize(fn(spark, sfDir)) catch {
        case t: Throwable => System.err.println(s"[profile] warm $n: ${t.getMessage}")
      }
    }
    for (p <- 1 to passes; (n, fn) <- names) {
      jobs.clear()
      val t0 = System.nanoTime()
      try {
        materialize(fn(spark, sfDir))
        val total = (System.nanoTime() - t0) / 1e9
        println(f"\n== $n pass $p: $total%.3f s, ${jobs.size} jobs ==")
        val sumJobs = jobs.map(_.ms).sum
        jobs.foreach { r =>
          println(f"  job ${r.id}%4d  ${r.ms}%8.1f ms  stages=${r.stages}%2d  ${r.desc.take(90)}")
        }
        println(f"  [jobs sum ${sumJobs / 1000}%.3f s; gaps (plan/driver) ${total - sumJobs / 1000}%.3f s]")
      } catch {
        case t: Throwable => System.err.println(s"[profile] $n: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
