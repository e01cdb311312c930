package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._

/** Z-order layout + zone-map pruning: correctness (pruning is loss-free),
  * effectiveness (candidate zones are a small fraction), physical file
  * skipping (a zone-partitioned write is read with partition pruning), and
  * the locality property that justifies Z-order over a 1-D sort (BOTH
  * dimensions' per-zone extents stay tight). */
class LayoutSpec extends SparkSpec {

  // the SHIPPED layout under test — same construction and constants the
  // x_zorder_* queries use (a private copy here would keep passing after
  // a retune while the shipped layout drifted)
  private val ZBits = SparkEntryLay.ZBits
  private def laid = SparkEntryLay.laidOrders(spark, sf)
  private val ranges = Seq(
    ("day", SparkEntryLay.QDayLo.toDouble, SparkEntryLay.QDayHi.toDouble),
    ("price", SparkEntryLay.QPriceLo, SparkEntryLay.QPriceHi))
  private def hit = col("day").between(SparkEntryLay.QDayLo, SparkEntryLay.QDayHi) &&
    col("price").between(SparkEntryLay.QPriceLo, SparkEntryLay.QPriceHi)

  test("zone ids stay within [0, 4^bits) and quantize clamps out-of-range input") {
    val mm = laid.agg(min("zone"), max("zone")).collect().head
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << (2 * ZBits)))
    import spark.implicits._
    val q = Seq(-5.0, 0.0, 2404.0, 99999.0).toDF("v")
      .select(Layout.quantize(col("v"), SparkEntryLay.DayLo, SparkEntryLay.DayHi, ZBits).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 0L, 31L, 31L), s"clamping broke: $q")
  }

  test("zone-map pruning is loss-free and scans a small fraction of zones") {
    val l = laid.persist()
    try {
      val stats = Layout.zoneMap(l, "zone", Seq("day", "price")).persist()
      val cand = Layout.pruneCandidates(stats, ranges)
      val candZones = cand.select("zone").collect().map(_.getLong(0)).toSet
      val nZones = stats.count()
      // effectiveness: the rectangle covers ~5% of the space; candidates
      // must stay well under the full zone census
      assert(candZones.size < nZones * 0.25,
        s"pruning ineffective: ${candZones.size} of $nZones zones")
      // loss-free: rows matching the predicate inside candidate zones ==
      // rows matching the predicate over the full table
      val viaPruned = l.where(col("zone").isin(candZones.toSeq: _*)).where(hit)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      val direct = l.where(hit)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(viaPruned == direct, "pruned scan lost or invented rows")
      stats.unpersist()
    } finally l.unpersist()
  }

  test("zone-partitioned write is read with physical partition pruning (file skipping)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    laid.select("o_orderkey", "day", "price", "zone")
      .write.mode("overwrite").partitionBy("zone").parquet(dir)
    val table = spark.read.parquet(dir)
    val stats = Layout.zoneMap(table, "zone", Seq("day", "price"))
    // the read-back partition column is inferred as int — normalize
    val candZones = Layout.pruneCandidates(stats, ranges)
      .select(col("zone").cast("long")).collect().map(_.getLong(0)).toSeq
    val pruned = table.where(col("zone").isin(candZones: _*))
    val allFiles = table.inputFiles.length.toLong
    // execute THIS plan and read the scan's own numFiles metric — the
    // ground truth of what the FileIndex actually listed after pruning
    val qe = pruned.queryExecution
    qe.executedPlan.executeCollect()
    val scan = qe.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec leaf"))
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles > 0 && readFiles < allFiles / 4,
      s"no file skipping: read $readFiles of $allFiles files")
    val planStr = qe.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [") && planStr.contains("zone"),
      "zone filter did not reach the scan as a partition filter")
    // and the pruned read still returns every matching row
    assert(pruned.where(hit).count() == table.where(hit).count())
  }

  test("zone maps maintain incrementally: batch stats merge == full rebuild") {
    // an ingest batch computes stats over ITS rows only; the stored zone
    // map folds them in with min/min, max/max, count-sum — no history
    // rescan. Split by order parity as the "old corpus" / "new batch".
    val l = laid.persist()
    try {
      val whole = Layout.zoneMap(l, "zone", Seq("day", "price"))
      val parts = Seq(col("o_orderkey") % 2 === 0, col("o_orderkey") % 2 === 1)
        .map(p => Layout.zoneMap(l.where(p), "zone", Seq("day", "price")))
      val merged = parts.reduce(_.unionByName(_))
        .groupBy("zone").agg(
          sum("n_rows").as("n_rows"),
          min("min_day").as("min_day"), max("max_day").as("max_day"),
          min("min_price").as("min_price"), max("max_price").as("max_price"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("zone", "n_rows", "min_day", "max_day", "min_price", "max_price")
          .collect().map(_.toSeq).toSet
      assert(rows(whole) == rows(merged), "zone-map merge law broke")
    } finally l.unpersist()
  }

  test("Z-order keeps BOTH dimensions tight where a 1-D sort leaves one unbounded") {
    // equal zone budgets (64 each) so the comparison is layout shape, not
    // zone count: Z spends 3 bits per dimension; the 1-D sort spends all
    // 6 on day (a finer day sort — its BEST case for day stats)
    val l = laid
      .withColumn("z64", Layout.zValue(
        Layout.quantize(col("day"), SparkEntryLay.DayLo, SparkEntryLay.DayHi, 3),
        Layout.quantize(col("price"), SparkEntryLay.PriceLo, SparkEntryLay.PriceHi, 3), 3))
      .withColumn("dayzone", Layout.quantize(col("day"), SparkEntryLay.DayLo, SparkEntryLay.DayHi, 6))
      .persist()
    try {
      def avgExtent(zcol: String, dim: String): Double =
        Layout.zoneMap(l, zcol, Seq(dim))
          .agg(avg(col(s"max_$dim") - col(s"min_$dim"))).collect().head.getDouble(0)
      val zPrice = avgExtent("z64", "price")
      val dayPrice = avgExtent("dayzone", "price")
      // a day-sorted layout knows nothing about price: its zones span
      // ~the whole price range; Z-order zones must be far tighter
      assert(zPrice < dayPrice * 0.25,
        s"z-order price extent $zPrice not << day-sort extent $dayPrice")
      // …while day extents stay bounded by the 3-bit cell width (~300
      // days + sparse-sample slack), nothing like the full 2405-day range
      val zDay = avgExtent("z64", "day")
      assert(zDay < SparkEntryLay.DayHi / 8 * 1.2, s"z-order day extent too loose: $zDay")
    } finally l.unpersist()
  }
}
