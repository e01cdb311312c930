package graft

import graft.sources.{Io, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S12 breadth: interchange connectors round-trip losslessly and the
  * DLQ reader quarantines malformed lines instead of failing the job. */
class IoSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_io").toString

  test("documents round-trip losslessly through JSONL and CSV") {
    val docs = Tables.documents(spark, sf).persist()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(docs.columns.map(col): _*).collect().map(_.toSeq).toSet
      val want = rows(docs)
      val dir = tmp()
      Io.writeJsonl(docs, s"$dir/j")
      assert(rows(Io.readJsonl(spark, s"$dir/j", docs.schema)) == want, "jsonl")
      Io.writeCsv(docs, s"$dir/c")
      assert(rows(Io.readCsv(spark, s"$dir/c", docs.schema)) == want, "csv")
      Io.writeOrc(docs, s"$dir/o")
      assert(rows(Io.readOrc(spark, s"$dir/o", docs.schema)) == want, "orc")
    } finally docs.unpersist()
  }

  test("ORC scan pushes predicates and prunes columns like parquet") {
    val docs = Tables.documents(spark, sf)
    val dir = tmp()
    Io.writeOrc(docs, s"$dir/o")
    val q = Io.readOrc(spark, s"$dir/o", docs.schema)
      .where(col("doc_id") === 7L).select("doc_id", "lang")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"predicate must reach the ORC scan:\n$scan")
    assert(!scan.contains("text#") || !scan.contains("ReadSchema: struct<doc_id:bigint,lang:string,text"),
      "projection must prune unselected columns")
    assert(q.count() == docs.where(col("doc_id") === 7L).count())
  }

  test("DLQ reader splits malformed JSONL lines without losing either side") {
    val dir = tmp(); new java.io.File(s"$dir/in").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/feed.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"x"}
        |this is not json at all
        |{"seq":2,"op":"update","key":"b","doc":"y"}
        |{"seq":3,"op":  <-- truncated
        |""".stripMargin)
    val (good, dlq) = Io.readJsonlWithDlq(spark, s"$dir/in",
      graft.streaming.Ingest.changelogSchema)
    assert(good.select("seq").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val bad = dlq.collect().map(_.getString(0)).toSet
    assert(bad == Set("this is not json at all", """{"seq":3,"op":  <-- truncated"""),
      s"dlq captured: $bad")
  }

  test("DLQ handles stay executable across a cache-invalidate sweep") {
    // the split is lineage-truncated at read time, so a Caches.invalidate
    // landing BEFORE the caller's first action cannot strand the dlq
    // handle on the raw JSON source (which rejects a corrupt-column-only
    // projection with an AnalysisException)
    val dir = tmp(); new java.io.File(s"$dir/in").mkdirs()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/feed.json"),
      """{"seq":1,"op":"insert","key":"a","doc":"x"}
        |broken line
        |""".stripMargin)
    val (good, dlq) = Io.readJsonlWithDlq(spark, s"$dir/in",
      graft.streaming.Ingest.changelogSchema)
    Caches.invalidate(spark) // sweep BEFORE any action on the handles
    assert(dlq.collect().map(_.getString(0)).toSeq == Seq("broken line"))
    assert(good.count() == 1L)
  }
}
