package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness: run a single named query from [[SparkEntry.queries]]
  * all-cold (fresh session, no shared-artifact reuse from earlier queries)
  * and print its wall time. Args: <name> [sfDir] [reps].
  *
  *   sbt "runMain graft.RunOne j1_shred_counts /root/testdata/sf0.1 2"
  *
  * Rep 1 is the cold time (charged with any shared artifact builds the
  * query faults in); later reps measure the steady-state plan.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same untimed JVM/codegen warmup as Bench
    spark.range(1000000).selectExpr("count(md5(cast(id as string)))").collect()
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name rep$i: $dt%.3f s")
      dt
    }
    println(f"[runone] $name cold=${times.head}%.3f warm_min=${times.min}%.3f sf=$sfDir")
    spark.stop()
  }
}
