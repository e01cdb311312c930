package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Kv
import graft.operators.Shred
import graft.sources.StarDocs

/** Break j4_subtree_counts into its stages and time each warm, to find
  * where the ~3 s steady-state goes. */
object ProfileJ4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[j4] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm the artifacts once (charged to "fault")
    val nodes = time("fault: Shred.nodes(StarDocs.docs)") {
      val n = Shred.nodes(StarDocs.docs(spark, sfDir)); n.count(); n
    }
    (1 to 2).foreach { i =>
      time(s"rep$i nodes.count") { nodes.count() }
      time(s"rep$i subtreeKeys") { Kv.subtreeKeys(nodes, "lineitem_li7_1").count() }
      time(s"rep$i cascadeDelete count") {
        Kv.cascadeDelete(nodes, "lineitem_li7_1").count()
      }
      time(s"rep$i full j4 groupBy noop") {
        Kv.cascadeDelete(nodes, "lineitem_li7_1")
          .groupBy(col("relName").as("rel_name")).agg(count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    Kv.cascadeDelete(nodes, "lineitem_li7_1")
      .groupBy(col("relName").as("rel_name")).agg(count(lit(1)).as("n"))
      .explain("formatted")
    spark.stop()
  }
}
