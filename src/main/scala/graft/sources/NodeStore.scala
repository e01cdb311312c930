package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the nodes table at scale — the Spark analogue of the
  * reference's ES shard routing (`elasticSearch.ts:135-147`: children are
  * routed to the parent's shard so parent/child joins never scatter).
  *
  * The nodes table is written **bucketed and sorted by `rootKey`**: every
  * document tree lives in one bucket, so
  *  - renest joins (child → parent on `rootKey` + `parentKey`),
  *  - has_child / has_parent semi-joins on `rootKey`,
  *  - cascading deletes (anti-join on `rootKey`)
  * all plan as bucket-local sort-merge joins with NO shuffle exchange on
  * either side — verified by `NodeStoreSpec` asserting the physical plan
  * is exchange-free. At 100 TB with 1000 executors this is the difference
  * between a full-cluster shuffle of the nodes table per query and a
  * purely node-local join.
  *
  * Partition-count guidance: buckets ≈ total-data / 256 MB, capped by
  * what the driver can track (`spark.sql.shuffle.partitions` sized to
  * match so AQE coalescing doesn't fight the bucketing).
  */
object NodeStore {

  /** Write the J1 output bucketed by the routing key. */
  def writeBucketed(nodes: DataFrame, table: String, buckets: Int = 8): Unit =
    nodes.write
      .bucketBy(buckets, "rootKey")
      .sortBy("rootKey", "key")
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Routing-local has_child: parents with a matching DIRECT child
    * (`__c.parentKey === __p.key` — rootKey alone would return every
    * parent sharing a TREE with any match, not the matching child's own
    * parent). The rootKey equi-term keeps the join co-partitioned on the
    * table's bucketing, so it still plans without an exchange
    * (`requireAllClusterKeysForCoPartition=false` lets the subset
    * clustering satisfy the two-key join). */
  def hasChildLocal(nodes: DataFrame, parentRel: String, childPred: org.apache.spark.sql.Column): DataFrame = {
    val parents = nodes.where(col("relName") === parentRel)
    val children = nodes.where(childPred)
    parents.alias("__p").join(children.alias("__c"),
      col("__p.rootKey") === col("__c.rootKey") &&
        col("__p.key") === col("__c.parentKey"), "left_semi")
  }
}
