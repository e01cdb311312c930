package graft

import graft.operators.Shred
import graft.sources.{NodeStore, StarDocs}
import org.apache.spark.sql.functions._

/** Verifies the 100 TB physical design claim, not just results: joins over
  * the bucketed nodes table must plan WITHOUT a shuffle exchange on either
  * side (the ES-routing analogue — SURVEY.md §4 row 1). */
class NodeStoreSpec extends SparkSpec {

  test("bucketed nodes table plans exchange-free routing joins") {
    val nodes = Shred.nodes(StarDocs.docs(spark, sf))
    NodeStore.writeBucketed(nodes, "nodes_bucketed", buckets = 8)
    val stored = NodeStore.read(spark, "nodes_bucketed")

    // force a real join (no broadcast) to expose the shuffle behavior
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val hot = NodeStore.hasChildLocal(stored, "order",
        col("relName") === "order_lineitem" &&
          get_json_object(col("payload"), "$.l_quantity").cast("double") > 45)
      val plan = hot.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected bucket-local join, got:\n$plan")
      // and it still computes the right answer (same as the shuffled path)
      val shuffled = {
        val parents = nodes.where(col("relName") === "order")
        val children = nodes.where(col("relName") === "order_lineitem" &&
          get_json_object(col("payload"), "$.l_quantity").cast("double") > 45)
        parents.alias("a").join(children.alias("b"),
          col("a.rootKey") === col("b.rootKey") &&
            col("a.key") === col("b.parentKey"), "left_semi")
      }
      assert(hot.count() == shuffled.count())
      assert(hot.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS nodes_bucketed")
    }
  }
}
