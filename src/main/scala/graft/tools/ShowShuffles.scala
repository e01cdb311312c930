package graft.tools

/** Regenerates PlanAuditSpec's shuffle-budget map: prints the printed-plan
  * Exchange count for every driver query under the EXACT TestSpark session
  * config (plan shapes — join strategy, partitioning — depend on it).
  *
  *   sbt "runMain graft.tools.ShowShuffles /root/testdata/sf0.001"
  *     | grep ^SHUF | awk '{print "    \"" $2 "\" -> " $3 ","}'
  */
object ShowShuffles {
  def main(args: Array[String]): Unit = {
    // plan shapes must match the TEST environment, which pins the disk
    // artifact memo off (see build.sbt)
    System.setProperty("graft.disk.memo", "0")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        plan.linesIterator.count { l =>
          l.dropWhile(c => !c.isLetter).startsWith("Exchange ")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[shuffles] $name failed: ${e.getMessage}"); -1
      }
      println(s"SHUF $name $n")
    }
    spark.stop()
  }
}
