package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump harness for the optimization rounds: write the
  * `.explain("formatted")` output of each named query from
  * [[SparkEntry.queries]] to `<outDir>/<name>.txt`, under the same session
  * configuration the bench uses, so committed plan files match what the
  * bench actually executes. Args: <outDir> <name> [name...].
  *
  *   sbt "runMain graft.ExplainOne plans/r16 x_butterfly x_triangles"
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainOne <outDir> <name> [name...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $name$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
