package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query timer (not part of the driver contract): runs the
  * named `SparkEntry.queries` entries under the Bench-equivalent session
  * config, printing each rep's wall — the manual measure-don't-guess loop
  * while optimizing one operator (Bench itself stays the round's record
  * of truth). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the Bench warm-up: JIT + codegen paths
    spark.range(1000000).selectExpr("count(md5(cast(id as string)))").collect()
    args.foreach { n =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
