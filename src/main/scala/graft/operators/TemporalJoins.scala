package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time joins — the two classic operators Spark's built-in join
  * strategies don't express efficiently (a raw non-equi join plans as a
  * BroadcastNestedLoop/cartesian, which is quadratic work per key):
  *
  *  - [[asofLastBefore]]: for every left row, the single most recent right
  *    row at-or-before its timestamp (feature-store / attribution lookups
  *    with point-in-time correctness).
  *  - [[rangeCount]]: for every left row, the number of right rows whose
  *    timestamp falls in a fixed offset window around it.
  *
  * Neither exists in the reference (its query surface is ES-style
  * predicates); these serve the training-data side of the engine, where
  * "last state as of t" and "activity within [t−Δ, t)" are the standard
  * feature shapes.
  */
object TemporalJoins {

  /** As-of (backward) join without any join operator at all: both sides
    * are unioned and sorted once per key, and a running `last(_, ignoreNulls)`
    * window carries the most recent right payload forward onto each left
    * row. Cost at any scale: ONE hash-partition shuffle by `key` + a
    * per-partition sort — no pair enumeration, no range explosion, and
    * skewed keys degrade to a sort instead of a quadratic blowup.
    *
    * The right payload travels as a single struct so the matched columns
    * are atomic (all from the same right row — per-column `last` could mix
    * rows when payload fields are null). Ties: a right row at exactly the
    * left timestamp matches (inclusive); among right rows sharing a
    * (key, t) the greatest `tieCol` wins — not via a pre-dedup pass (that
    * would cost a second shuffle of the right side by (key, t)) but by
    * adding `tieCol` to the one window's sort, so the running last()
    * lands on it for free. `tieCol` must be unique per (key, t) for the
    * result to be deterministic (an event-id column is the usual choice).
    *
    * Column contract: `right`'s non-key columns (its payload, including
    * `rt`) must not collide with left column names — rename on the way in.
    */
  def asofLastBefore(left: DataFrame, right: DataFrame, key: Seq[String],
                     lt: String, rt: String, tieCol: String,
                     maxGapSec: Option[Long] = None): DataFrame =
    asofCore(left, right, key, lt, rt, tieCol, backward = true, maxGapSec)

  /** Forward as-of: the EARLIEST right row at-or-after each left
    * timestamp (conversion attribution, next-state lookups). Same
    * union+window machinery as [[asofLastBefore]] with the time sort
    * reversed — in descending order the running last() lands on the
    * smallest `rt ≥ lt`. */
  def asofFirstAfter(left: DataFrame, right: DataFrame, key: Seq[String],
                     lt: String, rt: String, tieCol: String,
                     maxGapSec: Option[Long] = None): DataFrame =
    asofCore(left, right, key, lt, rt, tieCol, backward = false, maxGapSec)

  private def asofCore(left: DataFrame, right: DataFrame, key: Seq[String],
                       lt: String, rt: String, tieCol: String,
                       backward: Boolean, maxGapSec: Option[Long]): DataFrame = {
    val payload = right.columns.filterNot(key.contains).toSeq
    require(payload.forall(!left.columns.contains(_)),
      s"right payload ${payload.mkString(",")} collides with left columns")
    val rStruct = right.withColumn("__p", struct(payload.map(col): _*))
    val pType = rStruct.schema("__p").dataType
    val tieType = right.schema(tieCol).dataType
    val leftOwn = left.columns.filterNot(key.contains).toSeq

    val lSide = left.select(
      key.map(col) ++ leftOwn.map(col) :+
        col(lt).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast(tieType).as("__tie") :+
        lit(null).cast(pType).as("__p"): _*)
    val rSide = rStruct.select(
      key.map(col) ++
        leftOwn.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        col(rt).as("__t") :+ lit(0).as("__side") :+
        col(tieCol).as("__tie") :+ col("__p"): _*)

    // right rows sort before a left row with the identical timestamp
    // (side 0 < 1 in BOTH directions), so the running last() sees them —
    // inclusive as-of either way; left rows carry a null payload and
    // therefore never pollute it. Left rows' __tie is null — their
    // relative order among themselves cannot change what the running
    // last() observes.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((if (backward) col("__t") else col("__t").desc) +:
        Seq(col("__side"), col("__tie")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // staleness bound (feature-store freshness contract): a match farther
    // than the gap is no match, applied to the struct so all payload
    // columns null together
    val gated = maxGapSec match {
      case Some(g) => matched.withColumn("__m",
        when(abs(unix_micros(col("__t")) -
          unix_micros(col("__m").getField(rt))) <= g * 1000000L, col("__m")))
      case None => matched
    }
    gated.select(key.map(col) ++ leftOwn.map(col) ++
      payload.map(p => col("__m").getField(p).as(p)): _*)
  }

  /** Count right rows with `rt` in `[lt + lowerSec, lt + upperSec)` for
    * every left row, as a pure equi-join: right rows are bucketed into
    * fixed time bins of exactly the window width, each left row probes the
    * (at most) two bins its window can overlap, and the precise interval
    * check rides along as a residual join condition. Catalyst plans this
    * as an ordinary hash/sort-merge join on `(key, bin)` — never a
    * nested-loop — so it scales like any other keyed join, and a right row
    * can match a given left row in only one of its two probed bins (bins
    * are disjoint), so nothing double-counts. Left rows with no match
    * survive with a zero count.
    *
    * Skew: a single (key, bin) holding l left and r right rows emits l·r
    * pre-aggregation join rows — intrinsic to exact interval counting, and
    * the (key, bin) granularity already dices a hot key across time. AQE's
    * skew-join split handles residual hot cells; if one entity's
    * single-window activity alone overwhelms a task, salt the right side
    * (duplicate each left probe across the salt range) before widening
    * anything else. */
  def rangeCount(left: DataFrame, right: DataFrame, key: Seq[String],
                 lt: String, rt: String, lowerSec: Long, upperSec: Long,
                 leftIdCols: Seq[String], outCol: String = "n_matches"): DataFrame = {
    require(upperSec > lowerSec, "empty interval")
    val w = (upperSec - lowerSec) * 1000000L
    val rKeyed = right.select(
      key.map(col) :+ unix_micros(col(rt)).as("__rt") :+ lit(1).as("__one"): _*)
      .withColumn("__bin", floorDiv(col("__rt"), w))
    val lo = unix_micros(col(lt)) + lowerSec * 1000000L
    val lKeyed = left
      .withColumn("__lo", lo).withColumn("__hi", lo + w)
      .withColumn("__bin", explode(array(floorDiv(col("__lo"), w),
        floorDiv(col("__lo"), w) + 1)))
    // explicit aliases: left and right are often projections of the SAME
    // table (self-attribution), which trips Spark's ambiguous-self-join
    // detection under df("col") references
    val cond = key.map(k => col(s"__gl.$k") === col(s"__gr.$k")).reduce(_ && _) &&
      col("__gl.__bin") === col("__gr.__bin") &&
      col("__gr.__rt") >= col("__gl.__lo") && col("__gr.__rt") < col("__gl.__hi")
    lKeyed.alias("__gl").join(rKeyed.alias("__gr"), cond, "left_outer")
      .groupBy(leftIdCols.map(c => col(s"__gl.$c")): _*)
      .agg(count(col("__gr.__one")).as(outCol))
  }

  /** Floor division that stays correct for pre-epoch timestamps (Spark's
    * integral `/` truncates toward zero; bins must floor toward −∞ or the
    * two bins around zero collide). */
  private def floorDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))) / b).cast("long")
}
