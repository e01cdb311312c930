package graft

import graft.streaming.Ingest
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ST1–ST5 end-to-end: a JSON-file changelog driven through the real
  * Structured Streaming pipeline with `Trigger.AvailableNow` as the
  * read-your-writes barrier (FIXTURES.md §A.4 replay fixture). */
class StreamingSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_stream").toString

  test("changelog stream applies with last-writer-wins and delete") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"plan_A","doc":"{\"v\":1}"}
        |{"seq":2,"op":"update","key":"plan_A","doc":"{\"v\":2}"}
        |{"seq":3,"op":"insert","key":"plan_B","doc":"{\"v\":9}"}
        |{"seq":4,"op":"delete","key":"plan_B","doc":null}
        |{"seq":5,"op":"insert","key":"plan_C","doc":"{\"v\":7}"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    val got = spark.read.parquet(state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("plan_A" -> """{"v":2}""", "plan_C" -> """{"v":7}"""))
  }

  test("ST4 barrier: a second batch arriving later is applied on next run; replay is idempotent") {
    val dir = tmp(); val state = s"$dir/state"; val ckpt = s"$dir/ckpt"
    val log = s"$dir/log"; new java.io.File(log).mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$log/b1.json"),
      """{"seq":1,"op":"insert","key":"k1","doc":"a"}""" + "\n")
    Ingest.run(spark, log, state, ckpt)
    assert(spark.read.parquet(state).count() == 1)
    // late-arriving batch
    Files.writeString(java.nio.file.Paths.get(s"$log/b2.json"),
      """{"seq":2,"op":"update","key":"k1","doc":"b"}
        |{"seq":3,"op":"insert","key":"k2","doc":"c"}
        |""".stripMargin)
    Ingest.run(spark, log, state, ckpt)
    val got = spark.read.parquet(state).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("k1" -> "b", "k2" -> "c"))
    // replay the WHOLE log from scratch on a fresh checkpoint: same state
    // (at-least-once convergence, FIXTURES.md A.4)
    val state2 = s"$dir/state2"
    Ingest.run(spark, log, state2, s"$dir/ckpt2")
    val got2 = spark.read.parquet(state2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got2 == got)
  }

  test("applyBatch is idempotent (batch applied twice == once)") {
    import spark.implicits._
    val batch = Seq((1L, "insert", "a", "1"), (2L, "update", "a", "2"),
      (3L, "insert", "b", "3"), (4L, "delete", "c", null))
      .toDF("seq", "op", "key", "doc")
    val empty = batch.select("key", "doc").limit(0)
    val once = Ingest.applyBatch(empty, batch)
    val twice = Ingest.applyBatch(once, batch)
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("ST5: DLQ splits invalid rows without losing them") {
    import spark.implicits._
    val batch = Seq((1L, "insert", "a", """{"k":1}"""), (2L, "insert", "b", "not json"))
      .toDF("seq", "op", "key", "doc")
    val (ok, dlq) = Ingest.withDlq(batch, get_json_object(col("doc"), "$.k").isNotNull)
    assert(ok.count() == 1 && dlq.count() == 1)
    assert(dlq.select("key").head().getString(0) == "b")
  }
}
