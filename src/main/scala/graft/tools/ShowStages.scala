package graft.tools

/** One-off: executed (post-AQE) distinct shuffle-stage counts for named
  * queries, under the TestSpark-equivalent config (PlanAuditSpec's
  * executedStageBudget regeneration aid). */
object ShowStages {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.disk.memo", "0")
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val c = raw"ShuffleQueryStage (\d+)".r.findAllMatchIn(s).map(_.group(1)).toSet.size
      println(s"STAGE $n $c")
    }
    spark.stop()
  }
}
