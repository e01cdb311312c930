package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared SparkSession for all suites (one JVM-wide session; suites run
  * sequentially under sbt's forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // routing-key (rootKey) partitioning must satisfy joins keyed on
      // (parentKey, rootKey) — subset co-partitioning, disabled by default
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}

class TablesSpec extends SparkSpec {
  test("all fixture tables load and are non-empty") {
    graft.sources.Tables.all.foreach { t =>
      val df = graft.sources.Tables.load(spark, sf, t)
      assert(df.count() > 0, s"table $t is empty")
      assert(df.schema.nonEmpty, s"table $t has no schema")
    }
  }
}

class CachesSpec extends SparkSpec {
  import org.apache.spark.storage.StorageLevel
  test("Caches.invalidate releases memoized artifacts; they rebuild on demand") {
    val docs = graft.sources.StarDocs.docs(spark, sf)
    graft.operators.Shred.shredTyped(docs)
    assert(graft.ext.Dedup.minhashSignatures(
      graft.sources.Tables.documents(spark, sf)).count() > 0)
    assert(docs.storageLevel != StorageLevel.NONE)
    Caches.invalidate(spark)
    assert(docs.storageLevel == StorageLevel.NONE)
    // memos re-fault transparently after the sweep
    assert(graft.sources.StarDocs.docs(spark, sf).count() > 0)
  }
}
