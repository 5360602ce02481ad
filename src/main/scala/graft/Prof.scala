object Prof {
  def main(a: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q12_share_of_total","q18_quality_gate","q14_set_ops","q03_per_order_agg_join")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"$name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
