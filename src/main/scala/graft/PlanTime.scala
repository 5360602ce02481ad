package graft

import org.apache.spark.sql.SparkSession

/** Planning-time probe (optimization round, guide §7.3: driver-side
  * single-threaded work): for selected queries, time the Catalyst phases —
  * DataFrame construction (analysis) and executedPlan (optimization +
  * physical planning) — WITHOUT executing, after a warm execution. Separates
  * the per-invocation driver cost from job time: the bench re-plans every
  * query on every pass, so this cost is paid 2-3× per query per bench run.
  *
  * Usage: runMain graft.PlanTime [name-substring[,substring...]] [reps]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sel = args.headOption.map(_.split(',').toSeq).getOrElse(Seq.empty)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "52428800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.toSeq
      .filter(kv => sel.isEmpty || sel.exists(kv._1.contains)).sortBy(_._1)
    // one warm execution (codegen, at-rest indexes, FileIndex caches inside fn)
    names.foreach { case (n, fn) =>
      try fn(spark, sfDir).queryExecution.toRdd.count() catch {
        case t: Throwable => System.err.println(s"[plantime] warm $n: ${t.getMessage}")
      }
    }
    println(f"${"query"}%-34s constr_ms analyz_ms optim_ms phys_ms total_ms")
    var sums = Array.fill(5)(0.0)
    names.foreach { case (n, fn) =>
      var best = Array.fill(5)(Double.MaxValue)
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // construction incl. eager analysis per op
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.analyzed
        val t2 = System.nanoTime()
        qe.optimizedPlan
        val t3 = System.nanoTime()
        qe.executedPlan
        val t4 = System.nanoTime()
        val cur = Array((t1-t0)/1e6, (t2-t1)/1e6, (t3-t2)/1e6, (t4-t3)/1e6, (t4-t0)/1e6)
        for (i <- 0 until 5) if (cur(i) < best(i)) best(i) = cur(i)
      }
      for (i <- 0 until 5) sums(i) += best(i)
      println(f"$n%-34s ${best(0)}%8.1f ${best(1)}%8.1f ${best(2)}%8.1f ${best(3)}%8.1f ${best(4)}%8.1f")
    }
    println(f"${"TOTAL"}%-34s ${sums(0)}%8.1f ${sums(1)}%8.1f ${sums(2)}%8.1f ${sums(3)}%8.1f ${sums(4)}%8.1f")
    spark.stop()
  }
}
