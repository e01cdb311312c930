package graft

import graft.operators._
import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY.md §3 end-to-end: the reference's request lifecycle (POST →
  * async index → GET/304 → PATCH/412 → search → cascade DELETE) composed
  * from the engine modules — validation gates, shred, changelog stream
  * with the AvailableNow barrier, renest, canonical ETags, merge-patch,
  * has_child search and cascading delete, in one flow. */
class LifecycleSpec extends SparkSpec {
  import PlanFixture._

  test("full document lifecycle: POST → index → GET → PATCH → search → DELETE") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_life").toString
    val log = s"$dir/log"; new java.io.File(log).mkdirs()

    // ---- POST /plan: validate (M5/M6), key gate (M7), create gate (M8) ----
    val incoming = Seq(
      planJson("A", Seq(("1", "Yearly physical", 175.0), ("2", "well baby", 20.0))),
      planJson("B", Seq(("3", "dental", 30.0))),
      """{"objectType":"plan","creationDate":"31-02-2020"}""" // invalid: no id, bad date
    ).toDF("json")
    val (valid, rejects) = Validate.partition(incoming, "json", schemaJson)
    assert(valid.count() == 2 && rejects.count() == 1) // the 400 path

    // shred (J1) + publish to the changelog (ST1), then run the stream
    // with the AvailableNow barrier (ST2-ST4) — the reference's RabbitMQ +
    // 200 ms poll loop collapsed into one blocking call
    val docs0 = docs(spark, valid.collect().map(_.getString(0)).toSeq)
    val postLog = Shred.nodes(docs0)
      .select(to_json(struct(
        monotonically_increasing_id().as("seq"), lit("insert").as("op"),
        col("key"), col("payload").as("doc"))).as("line"))
      .collect().map(_.getString(0)).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$log/post.json"), postLog)
    Ingest.run(spark, log, s"$dir/state", s"$dir/ckpt")
    val kv = Ingest.readState(spark, s"$dir/state")
    assert(kv.count() == 13) // plan A: 8 nodes (2 services), plan B: 5 (1 service)

    // ---- GET /plan/A: renest (J2) + canonical ETag (M2), then 304 (M3) ----
    val typed = Shred.shredTyped(docs0)
    val renested = Renest(typed, docs0.schema)
    val tagged = Etag.withEtag(renested)
    val etagA = tagged.where(col("__key") === "plan_A").select("__etag").head().getString(0)
    val reread = Etag.conditionalRead(tagged,
      Seq(("plan_A", etagA)).toDF("key", "ifNoneMatch"))
    assert(reread.select("status").head().getInt(0) == 304)

    // ---- PATCH /plan/A: If-Match gate (M4) then merge-patch (M1) ----
    val gate = Etag.conditionalWrite(tagged,
      Seq(("plan_A", etagA), ("plan_A", "stale")).toDF("key", "ifMatch"))
      .collect().map(r => r.getString(1) -> r.getInt(2)).toMap
    assert(gate(etagA) == 200 && gate("stale") == 412)
    val patch = docs(spark, Seq(
      """{"objectId":"A","objectType":"plan","planType":"outNetwork"}"""))
    val patched = MergePatch(renested, patch)
    assert(patched.where(col("objectId") === "A").select("planType")
      .head().getString(0) == "outNetwork")
    // the canonical ETag changed → subsequent If-None-Match with the old
    // tag now returns 200 (fresh read)
    val etagA2 = Etag.withEtag(patched).where(col("__key") === "plan_A")
      .select("__etag").head().getString(0)
    assert(etagA2 != etagA)

    // ---- GET /allParentsHaving?type=service&name=dental (P4) ----
    val nodes = Shred.nodes(docs0)
    val services = nodes.where(col("relName") === "planservice_service")
      .withColumn("name", get_json_object(col("payload"), "$.name"))
    val hits = Search.hasChildEquals(
      nodes.where(col("relName") === "plan"), services,
      "key", "rootKey", Seq(("name", "dental")))
    assert(hits.select("objectId").collect().map(_.getString(0)).toSet == Set("B"))

    // ---- DELETE /plan/B: cascade (J4) on the KV state via routing ----
    val nodesAfter = Kv.cascadeDeleteRoot(nodes, "plan_B")
    assert(nodesAfter.count() == 8)
    assert(nodesAfter.select("rootKey").distinct().head().getString(0) == "plan_A")
  }
}
