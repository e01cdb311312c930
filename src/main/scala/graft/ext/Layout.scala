package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout statistics for scan pruning (north-star extension; the
  * reference has no analogue — its "layout" is whatever order ES returns
  * documents in): Z-order multi-dimensional clustering plus per-zone
  * min/max zone maps, the mechanism behind Delta/Iceberg-style file
  * skipping. At 100 TB the scan you never run is the cheapest operator in
  * the engine: a writer that clusters rows by the interleaved-bit Z-value
  * of the query dimensions gives every file/zone a TIGHT min/max rectangle
  * in ALL of those dimensions at once (a 1-D sort gives a tight range in
  * one dimension and useless full-range stats in every other), so a
  * multi-dimensional predicate prunes to ~the rectangle's volume fraction
  * of zones instead of scanning everything.
  *
  * Everything is integer/deterministic (quantization is fixed-width
  * arithmetic, no learned boundaries) so the DuckDB oracle replays the
  * zone assignment bit-for-bit, and zone stats are BOUNDED metadata (one
  * row per zone, ≤ 4^bits rows) — the table a 1000-executor driver
  * actually collects to plan a scan, exactly like parquet row-group
  * min/max footers.
  */
object Layout {

  /** Fixed-width quantization of `c` onto `[0, 2^bits)`: bucket i covers
    * `[lo + i·(hi−lo)/2^bits, …)`, values outside [lo, hi] clamp to the
    * edge buckets. Pure arithmetic — `(c−lo)·2^bits/(hi−lo)` in IEEE
    * double then floor — so both engines compute identical cells (the
    * multiply happens BEFORE the divide: for integer-valued inputs the
    * product is exact, and the single rounding site is shared). */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = (1L << bits).toDouble
    val q = floor((c.cast("double") - lit(lo)) * lit(cells) / lit(hi - lo))
    least(lit((1L << bits) - 1), greatest(lit(0L), q.cast("long")))
  }

  /** Morton/Z-value of two quantized cells: bit i of `a` lands at bit
    * 2i+1, bit i of `b` at bit 2i. A sum of `2·bits` disjoint-bit terms —
    * codegen'd shifts/masks, no UDF — mirroring the published Z-order
    * curve definition (Morton 1966; the interleave used by Delta Lake's
    * OPTIMIZE ZORDER BY). Rows close on the curve are close in BOTH
    * dimensions, which is what makes per-zone min/max rectangles tight. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)

  /** Per-zone min/max/count over the layout dimensions: the zone map a
    * writer persists next to the data (≤ 4^bits rows — bounded metadata).
    * One map-side-combinable aggregation; no joins, no windows. */
  def zoneMap(laid: DataFrame, zoneCol: String, dims: Seq[String]): DataFrame =
    laid.groupBy(col(zoneCol))
      .agg(count(lit(1)).as("n_rows"),
        dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)

  /** Zones whose stat rectangle intersects the query rectangle — the
    * candidate list a scan planner feeds into file skipping. Interval
    * intersection per dimension; a zone map row can only be excluded if
    * its whole rectangle misses, so pruning is loss-free by construction
    * (every matching row's zone intersects — its values are INSIDE its
    * zone's rectangle). */
  def pruneCandidates(stats: DataFrame, ranges: Seq[(String, Double, Double)]): DataFrame =
    stats.where(ranges.map { case (d, qlo, qhi) =>
      col(s"min_$d") <= qhi && col(s"max_$d") >= qlo
    }.reduce(_ && _))

  /** Scalar form of the same interval-intersection rule — the ONE
    * definition a driver-side planner applies to collected stats rows
    * (x_zorder_prune) so it cannot drift from [[pruneCandidates]]'s
    * relational form. A zone with NULL stats (no rows observed for the
    * dimension) is never a candidate — matching the Column form, where
    * a NULL comparison is filtered out. */
  def intersects(minV: Option[Double], maxV: Option[Double],
                 qlo: Double, qhi: Double): Boolean =
    (minV, maxV) match {
      case (Some(mn), Some(mx)) => mn <= qhi && mx >= qlo
      case _ => false
    }
}
