package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected catalog queries
  * so pushdown / broadcast / codegen coverage can be reviewed (and regressions
  * spotted) without a notebook. Usage: runMain graft.Explain [queryName...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false") // static plans: show codegen spans + join picks
      .config("spark.sql.autoBroadcastJoinThreshold", "52428800")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    val dir = "/root/testdata/sf0.001"
    if (args.headOption.contains("--summary")) { summary(spark, dir); spark.stop(); return }
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }

  /** One line per catalog query: shuffle count, join strategies, codegen spans,
    * scan-level pushdown — the audit table behind PLANS.md.
    *
    * Counting is over the formatted explain's DETAIL headers (`"(n) NodeName"`)
    * only — the tree section prints every operator a second time, and a plain
    * substring match would also conflate shuffle `Exchange` with
    * `BroadcastExchange`/`ReusedExchange`. */
  private def summary(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.execution.ExplainMode
    println("| query | shuffles | bcast | BHJ | SMJ | TakeOrdered | WSCG spans | pushed filters |")
    println("|---|---|---|---|---|---|---|---|")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted"))
        def node(name: String) =
          s"(?m)^\\(\\d+\\) $name(?: \\[|$$)".r.findAllIn(p).size
        val pushed = p.linesIterator
          .count(l => l.contains("PushedFilters: [") && !l.contains("PushedFilters: []"))
        val wscg = "codegen id : (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
        println(s"| $n | ${node("Exchange")} | ${node("BroadcastExchange")} " +
          s"| ${node("BroadcastHashJoin")} | ${node("SortMergeJoin")} " +
          s"| ${if (p.contains("TakeOrderedAndProject")) "y" else ""} " +
          s"| $wscg | $pushed |")
      } catch {
        case e: Throwable =>
          println(s"| $n | err:${e.getClass.getSimpleName} | | | | | | |")
      }
    }
  }
}
