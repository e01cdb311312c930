package graft.tools

import graft.operators._
import graft.sources.{StarDocs, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the shared document pipeline (not part
  * of the driver contract; run manually while optimizing). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", String.valueOf(64L * 1024 * 1024))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("count(md5(cast(id as string)))").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("docs_compute_nocache") {
      val d = StarDocs.docs(spark, sfDir)
      StarDocs.invalidate(spark) // unpersists the memoized entry
      d.write.format("noop").mode("overwrite").save()
    }
    time("docs_assembly") {
      StarDocs.docs(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    time("docs_assembly_again") {
      StarDocs.docs(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val docs = StarDocs.docs(spark, sfDir)
    var typed: Map[String, org.apache.spark.sql.DataFrame] = null
    time("shred_materialize") {
      typed = Shred.shredTyped(docs)
      typed("").write.format("noop").mode("overwrite").save()
    }
    time("shred_children_noop") {
      typed("lineitems").write.format("noop").mode("overwrite").save()
      typed("lineitems.part").write.format("noop").mode("overwrite").save()
    }
    time("renest") {
      Renest(typed, docs.schema).write.format("noop").mode("overwrite").save()
    }
    time("renest_flatten") {
      val back = Renest(typed, docs.schema)
      back.select(col("objectId").as("order_id"), col("o_orderstatus"),
          col("o_totalprice"), explode(col("lineitems")).as("li"))
        .select(col("order_id"), col("o_orderstatus"), col("o_totalprice"),
          col("li.objectId").as("li_id"), col("li.l_quantity").as("qty"),
          col("li.part.p_brand").as("brand"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
