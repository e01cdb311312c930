package graft

import graft.ext.Sketches
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def terms = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"),
      (col("doc_id") % 4).as("shard"))

  test("per-shard HLL sketches union to a near-exact corpus distinct count") {
    val sketches = Sketches.hllByGroup(terms, col("term"), "shard")
    assert(sketches.count() == 4)
    val est = Sketches.unionEstimate(sketches).collect().head.getLong(0)
    val exact = terms.select("term").distinct().count()
    val err = math.abs(est.toDouble - exact) / exact
    assert(err < 0.05, s"estimate $est vs exact $exact (err $err)")
  }

  test("incremental maintenance: a new shard's sketch unions in without rescanning old shards") {
    val old = Sketches.hllByGroup(terms.where(col("shard") < 3), col("term"), "shard")
      .persist() // stands in for the stored sketch table
    old.count()
    val incr = Sketches.hllByGroup(terms.where(col("shard") === 3), col("term"), "shard")
    val est = Sketches.unionEstimate(old.unionByName(incr)).collect().head.getLong(0)
    val full = Sketches.unionEstimate(Sketches.hllByGroup(terms, col("term"), "shard"))
      .collect().head.getLong(0)
    // sketch union is exact over sketches: incrementally-built == rebuilt
    assert(est == full, s"incremental $est != full rebuild $full")
    old.unpersist()
  }

  test("count-min: merge law, one-sided bound, exactness at wide width") {
    import spark.implicits._
    val a = Seq("x", "x", "y", "z", "x", "y").toDF("term")
    val b = Seq("y", "w", "w").toDF("term")
    val all = a.unionByName(b)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // sketch of the union == bucket-wise sum of the shards' sketches
    // (width rides along in the group key, so a mis-merged pair of
    // different-width sketches surfaces as distinct rows, not silence)
    val whole = Sketches.cmsTable(all, col("term"), depth = 3, width = 8)
    val merged = Sketches.cmsTable(a, col("term"), 3, 8)
      .unionByName(Sketches.cmsTable(b, col("term"), 3, 8))
      .groupBy("d", "bucket", "width").agg(sum("counter").as("counter"))
      .select("d", "bucket", "counter", "width")
    assert(rows(whole) == rows(merged))
    val probes = Seq("x", "y", "z", "w", "absent").toDF("term")
    val exact = Map("x" -> 3L, "y" -> 3L, "z" -> 1L, "w" -> 2L, "absent" -> 0L)
    // narrow sketch: estimates may collide upward but never undercount;
    // (depth, width) derive from the table — no repeated build params
    val est8 = Sketches.cmsEstimate(whole, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) => assert(est8(t) >= n, s"$t: ${est8(t)} < $n") }
    // the merged table estimates identically to the whole-build one
    val estM = Sketches.cmsEstimate(merged, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estM == est8)
    // wide sketch: no collisions at this cardinality -> exact counts
    val wide = Sketches.cmsTable(all, col("term"), 3, 4096)
    val estW = Sketches.cmsEstimate(wide, probes, col("term"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(estW == exact)
    // a table mixing widths (bad merge) fails loudly instead of undercounting
    val bad = whole.unionByName(wide)
    val err = intercept[IllegalArgumentException] {
      Sketches.cmsEstimate(bad, probes, col("term"))
    }
    assert(err.getMessage.contains("mixes widths"))
  }

  test("quantile sketch (approx_percentile) tracks exact percentiles") {
    val vals = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("value"))
    val Seq(a50, a99) = vals
      .agg(approx_percentile(col("value"), array(lit(0.5), lit(0.99)), lit(1000)))
      .collect().head.getSeq[Double](0).toSeq
    val Seq(e50, e99) = vals
      .agg(percentile(col("value"), array(lit(0.5), lit(0.99))))
      .collect().head.getSeq[Double](0).toSeq
    assert(math.abs(a50 - e50) <= math.abs(e50) * 0.05 + 1e-9)
    assert(math.abs(a99 - e99) <= math.abs(e99) * 0.05 + 1e-9)
  }
}
