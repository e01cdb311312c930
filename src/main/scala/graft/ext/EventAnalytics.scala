package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream — the ordered funnel
  * and cohort-retention operators a product-analytics workload runs
  * beside the temporal joins (north-star extension; the reference has no
  * events surface — its closest analogue is the per-type hit counting of
  * SURVEY §2.3 P8).
  *
  * Scale design: both operators reduce to user-keyed aggregations and
  * equi joins — one partitioning (the user key) carries every stage, no
  * windows, no per-user unbounded state. A funnel of k steps is k
  * map-side-combinable `min` aggregations chained through k−1 user-keyed
  * joins whose build sides shrink monotonically (each step's survivors);
  * retention is two aggregations and one join. Nothing here materializes
  * per-event state beyond the shuffles Catalyst already plans. */
object EventAnalytics {

  /** Ordered-funnel completion: for `steps` event types s₁…s_k, count
    * the users who performed them in strict timestamp order. Semantics
    * are GREEDY-EARLIEST (the standard funnel definition): step 1's
    * anchor is the user's earliest s₁ event, step i's the earliest s_i
    * event strictly after the step-(i−1) anchor. Greedy-earliest is
    * maximal for strict ordering — choosing the earliest anchor only
    * widens later steps' options — so a user completes the funnel here
    * iff ANY strictly-increasing assignment of their events exists.
    *
    * Returns one row PER STEP — `(step_idx, step, n_users)` — including
    * zero-user steps (a global count, not a groupBy, so an empty funnel
    * tail still reports), making drop-off ratios directly readable.
    *
    * Relational shape: step i is `min(ts)` over the type-s_i slice
    * joined to step i−1's survivors on the user key with a `ts >`
    * residual — aggregation before join, so each join's build side is at
    * most one row per surviving user, never raw events. */
  def funnel(events: DataFrame, steps: Seq[String], tsCol: String = "ts",
             userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    def slice(st: String) = events.where(col(typeCol) === st)
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    val reached = steps.tail.scanLeft(
      slice(steps.head).groupBy("__u").agg(min(col("__ts")).as("__t"))) {
      (prev, st) =>
        slice(st).join(prev, Seq("__u"))
          .where(col("__ts") > col("__t"))
          .groupBy("__u").agg(min(col("__ts")).as("__t"))
    }
    reached.zip(steps).zipWithIndex.map { case ((r, st), i) =>
      r.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Windowed funnel (the ClickHouse-`windowFunnel` form): like
    * [[funnel]], but a completion only counts if the WHOLE chain fits
    * inside `windowMicros` (first-step anchor → level-i event). The
    * un-windowed funnel overstates conversion on long histories — a
    * signup in January "converting" via a purchase in December is not a
    * funnel the product team means — so the windowed form is what
    * conversion dashboards actually plot.
    *
    * Exactness: level i is reachable within W iff SOME chain has
    * `t_i − t_1 ≤ W`; intermediate events lie between the endpoints, so
    * only the endpoint span binds, and maximizing the anchor `t_1` per
    * prefix decides reachability. That max is a RUNNING maximum over the
    * user's event stream in `(ts, event_id)` order: `b₀` = max anchor
    * strictly before the current row, `b₁` = running max of `b₀` taken
    * at step-2 rows, … — so the whole k-step DP is k chained running-max
    * window passes over ONE user-partitioned sort (one exchange + one
    * sort, k stacked WindowExecs with fixed per-row state; no
    * collect_list, no per-user arrays).
    * Order is the `(ts, event_id)` TOTAL order — deliberately: it keeps
    * the DP deterministic under equal timestamps (documented divergence
    * from [[funnel]]'s pure strictly-greater-ts rule) — and the windowed
    * reach is monotone (a level-i chain's prefix certifies level i−1).
    *
    * Returns `(step_idx, step, n_users)` like [[funnel]], counting users
    * whose windowed reach is ≥ each step. */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
                     windowMicros: Long, tsCol: String = "ts",
                     userCol: String = "user_id",
                     typeCol: String = "event_type"): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    // __b(i) = running max, over strictly-preceding rows, of the best
    // anchor of a chain reaching level i+1; __b0 anchors at step-1 rows
    // (shared with funnelLatency via funnelChain)
    val withB = funnelChain(events, steps, tsCol, userCol, typeCol)
    // row-level reach: a step-i row completes level i iff its chain
    // anchor exists and the endpoint span fits the window
    val lvl = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0) when(col(typeCol) === st, lit(1L))
      else when(col(typeCol) === st && col(s"__b${i - 1}").isNotNull &&
        col("__t") - col(s"__b${i - 1}") <= windowMicros, lit((i + 1).toLong))
    }.reduce((a, b) => greatest(a, b))
    // group on the ORIGINAL user column: the window already partitioned
    // by it, so the reach aggregation is exchange-free (renaming first
    // cost a second user shuffle)
    val reach = withB.select(col(userCol), lvl.as("__lvl"))
      .groupBy(col(userCol)).agg(max(col("__lvl")).as("__reach"))
    steps.zipWithIndex.map { case (st, i) =>
      reach.where(col("__reach") >= (i + 1))
        .agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step_idx"), lit(st).as("step"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Time-to-convert distribution for the FULL funnel: each completing
    * user's MINIMUM chain span (first-step anchor → final step), bucketed
    * into latency bands — the "how fast do users convert" histogram next
    * to [[funnelWindowed]]'s "how many". Exactness rides on the same
    * running-max DP: the anchor column maximizes `t₁` per prefix, so
    * `t − b` at a final-step row IS the minimum span of any chain ending
    * there, and the per-user min over rows is the user's true minimum
    * conversion time (integer micros end to end — no float, full
    * oracle). Users whose best span exceeds the last band edge land in
    * the overflow band (`band_micros = −1`); non-completing users do not
    * report. Bands must be ascending; per-user state is one long. */
  def funnelLatency(events: DataFrame, steps: Seq[String],
                    bandsMicros: Seq[Long], tsCol: String = "ts",
                    userCol: String = "user_id",
                    typeCol: String = "event_type"): DataFrame = {
    require(bandsMicros.nonEmpty && bandsMicros == bandsMicros.sorted &&
      bandsMicros.forall(_ > 0), s"bands must be ascending positive: $bandsMicros")
    // reuse the windowed DP with an unbounded window: only the span
    // arithmetic differs
    val chained = funnelChain(events, steps, tsCol, userCol, typeCol)
    val span = col("__t") - col(s"__b${steps.size - 2}")
    val best = chained
      .where(col(typeCol) === steps.last &&
        col(s"__b${steps.size - 2}").isNotNull)
      .select(col(userCol), span.as("__span"))
      .groupBy(col(userCol)).agg(min(col("__span")).as("__best"))
    val band = bandsMicros.foldRight(lit(-1L)) { (edge, rest) =>
      when(col("__best") <= edge, lit(edge)).otherwise(rest)
    }
    best.groupBy(band.as("band_micros"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** The shared anchor-DP columns of [[funnelWindowed]] and
    * [[funnelLatency]]: `__t` (event micros) and `__b0 … __b(k−2)`
    * running-max anchors, stacked over one user-partitioned sort. */
  private def funnelChain(events: DataFrame, steps: Seq[String],
                          tsCol: String, userCol: String,
                          typeCol: String): DataFrame = {
    require(steps.size >= 2, s"a funnel chain needs >= 2 steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct event types, got $steps")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = events.where(col(typeCol).isin(steps: _*))
      .withColumn("__t", unix_micros(col(tsCol)))
    (1 until steps.size).foldLeft(
      base.withColumn("__b0",
        max(when(col(typeCol) === steps.head, col("__t"))).over(w))) {
      (df, i) =>
        if (i == steps.size - 1) df
        else df.withColumn(s"__b$i",
          max(when(col(typeCol) === steps(i), col(s"__b${i - 1}"))).over(w))
    }
  }

  /** Event-path trigrams (the "top user paths" report): counts of each
    * ordered triple of CONSECUTIVE same-user event types where each hop
    * arrives within `maxGapMicros` of the previous event — the
    * flow-analysis view of the event stream (which three-step journeys
    * actually happen), complementing the funnel's fixed-target view.
    * Consecutive means adjacent in the user's `(ts, event_id)` order:
    * an intervening event of ANY type breaks the triple, which is what
    * distinguishes a path report from a funnel.
    *
    * One user-partitioned sort with two `lead` passes, then a
    * map-side-combinable count; output is bounded by |event types|³
    * rows, independent of event volume. */
  def eventPaths(events: DataFrame, maxGapMicros: Long, tsCol: String = "ts",
                 userCol: String = "user_id",
                 typeCol: String = "event_type"): DataFrame = {
    require(maxGapMicros > 0, s"gap bound must be positive, got $maxGapMicros")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
    val t = unix_micros(col(tsCol))
    val tri = events
      .withColumn("__t", t)
      .withColumn("__t2", lead(col(typeCol), 1).over(w))
      .withColumn("__t3", lead(col(typeCol), 2).over(w))
      .withColumn("__g1", lead(col("__t"), 1).over(w) - col("__t"))
      .withColumn("__g2", lead(col("__t"), 2).over(w) - lead(col("__t"), 1).over(w))
      .where(col("__t2").isNotNull && col("__t3").isNotNull &&
        col("__g1") <= maxGapMicros && col("__g2") <= maxGapMicros)
    tri.groupBy(col(typeCol).as("step1"), col("__t2").as("step2"),
        col("__t3").as("step3"))
      .agg(count(lit(1)).as("n_paths"))
  }

  /** Gap-bounded sequential episodes over a POSITIONED event relation
    * `(user_id, event_type, rn)` (one `row_number` per user in the
    * caller's canonical ordering — pass a stored/memoized relation so
    * the sort is paid once per corpus): the top-k length-`length`
    * episodes where each step follows the previous within `maxGap`
    * POSITIONS (noise events in between are skipped; gap 1 = contiguous
    * paths). The gap is EXPANDED into explicit `(rn + 1..g)` keys so
    * every hop is a pure EQUI-join on (user, position) — candidate
    * volume gap^(length−1)·N, linear in the corpus, where the naive
    * user-keyed range join goes per-user quadratic. `length` is a
    * parameter, not a query shape (r14 item 8): the hop join FOLDS, one
    * leg per step, each leg the same shuffle key. Output columns
    * `step1..stepN, n_occurrences`, total-ordered top-k. */
  def episodesTopK(ordered: DataFrame, maxGap: Int, length: Int,
                   topK: Int): DataFrame = {
    require(maxGap >= 1, s"maxGap must be >= 1, got $maxGap")
    require(length >= 2 && length <= 6,
      s"episode length $length outside [2, 6] — candidate volume is " +
        "gap^(length-1) per event; longer episodes need sampling first")
    val gaps = array((1 to maxGap).map(lit): _*)
    val next = ordered.select(col("user_id"), col("rn").as("__rn"),
      col("event_type").as("__next"))
    var acc = ordered.select(col("user_id"),
      array(col("event_type")).as("__steps"), col("rn").as("__rn"))
    for (_ <- 2 to length) {
      acc = acc
        .select(col("user_id"), col("__steps"), explode(gaps).as("__g"),
          col("__rn"))
        .select(col("user_id"), col("__steps"),
          (col("__rn") + col("__g")).as("__rn"))
        .join(next, Seq("user_id", "__rn"))
        .select(col("user_id"),
          concat(col("__steps"), array(col("__next"))).as("__steps"),
          col("__rn"))
    }
    episodeRollup(acc, length, topK)
  }

  /** Time-gap episodes — the wall-clock companion of [[episodesTopK]]
    * (r14 item 5): each step follows the previous within `maxGapMicros`
    * of EVENT TIME (order on (ts, event_id) so simultaneous events chain
    * deterministically). The range predicate is turned into an equi-join
    * by BANDED TIME BUCKETS of width = the gap: an event in bucket b can
    * only be followed within the gap by events in buckets {b, b+1}, so
    * the left side explodes to those two keys and the hop joins on
    * (user, bucket) with the exact gap/order residual — candidate volume
    * is bounded by per-(user, bucket) occupancy, never per-user
    * quadratic. Negative epochs would floor-vs-truncate differently; the
    * engine's fixtures are post-1970 and the valve below keeps it
    * honest. Output matches [[episodesTopK]]. */
  def episodesTimeTopK(events: DataFrame, maxGapMicros: Long, length: Int,
                       topK: Int, tsCol: String = "ts",
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    require(maxGapMicros > 0, s"gap must be positive, got $maxGapMicros")
    require(length >= 2 && length <= 6,
      s"episode length $length outside [2, 6]")
    // in-row valve: DIV truncates toward zero, so a pre-epoch timestamp
    // would land in the WRONG band and silently drop pairs — fail by name
    val t = when(unix_micros(col(tsCol)) < 0, raise_error(lit(
      "episodesTimeTopK: pre-1970 timestamp — banded bucketing assumes " +
        "non-negative epochs"))).otherwise(unix_micros(col(tsCol)))
    val e = events.select(col(userCol).as("user_id"), t.as("__t"),
      col(idCol).as("__id"), col(typeCol).as("event_type"))
    val next = e.select(col("user_id"),
      expr(s"__t DIV $maxGapMicros").as("__bkt"),
      col("event_type").as("__next"), col("__t").as("__t2"),
      col("__id").as("__id2"))
    var acc = e.select(col("user_id"), array(col("event_type")).as("__steps"),
      col("__t"), col("__id"))
    for (_ <- 2 to length) {
      acc = acc
        .select(col("user_id"), col("__steps"), col("__t"), col("__id"),
          explode(array(expr(s"__t DIV $maxGapMicros"),
            expr(s"__t DIV $maxGapMicros") + 1)).as("__bkt"))
        .join(next, Seq("user_id", "__bkt"))
        .where(col("__t2") - col("__t") <= maxGapMicros &&
          (col("__t2") > col("__t") ||
            (col("__t2") === col("__t") && col("__id2") > col("__id"))))
        .select(col("user_id"),
          concat(col("__steps"), array(col("__next"))).as("__steps"),
          col("__t2").as("__t"), col("__id2").as("__id"))
    }
    episodeRollup(acc, length, topK)
  }

  /** Shared episode tail: project the step array to `step1..stepN`
    * columns, count occurrences, total-order the top-k. */
  private def episodeRollup(acc: DataFrame, length: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val named = acc.select(
      (1 to length).map(i => col("__steps")(i - 1).as(s"step$i")): _*)
    named.groupBy((1 to length).map(i => col(s"step$i")): _*)
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc +:
        (1 to length).map(i => col(s"step$i")): _*)
      .limit(topK)
  }

  /** Last-touch revenue attribution: every purchase credits its value to
    * the user's most recent touch event (any of `touchTypes`) within
    * `lookbackSec`; purchases with no touch inside the lookback land in
    * the `(none)` bucket, so the report always partitions total revenue.
    * This is the composition the as-of join exists for
    * ([[graft.operators.TemporalJoins.asofLastBefore]] with its
    * staleness gate = the attribution lookback) plus one
    * map-side-combinable aggregation — bounded output (one row per
    * channel + the none bucket). Ties (two touches at one timestamp)
    * resolve to the larger event id, the as-of join's deterministic
    * tiebreak. Money stays in DECIMAL(18,2) until the final cast. */
  def attributionLastTouch(events: DataFrame, purchaseType: String,
                           touchTypes: Seq[String], lookbackSec: Long,
                           tsCol: String = "ts", userCol: String = "user_id",
                           typeCol: String = "event_type"): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(purchaseType),
      s"touch types must be non-empty and exclude the purchase type")
    val p = events.where(col(typeCol) === purchaseType)
      .select(col(userCol), col(tsCol), col("event_id"), col("value"))
    val t = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol).as("touch_ts"),
        col("event_id").as("touch_id"), col(typeCol).as("channel"))
    graft.operators.TemporalJoins.asofLastBefore(p, t, Seq(userCol),
        tsCol, "touch_ts", "touch_id", maxGapSec = Some(lookbackSec))
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("attributed_value"))
  }

  /** Cohort retention at day granularity: users cohort by the calendar
    * day of their FIRST event; each `(cohort, day_offset)` cell counts
    * the cohort's users active (≥1 event) on cohort-day + offset. The
    * classic retention triangle — `day_offset = 0` is cohort size by
    * construction (every user is active on their first day).
    *
    * Two map-side-combinable aggregations (first-day per user, distinct
    * active (user, day) pairs) and one user-keyed join; the output is
    * bounded by cohorts × horizon days, not by users or events. */
  def retentionCohorts(events: DataFrame, tsCol: String = "ts",
                       userCol: String = "user_id"): DataFrame = {
    val firsts = events.groupBy(col(userCol).as("__u"))
      .agg(date_trunc("day", min(col(tsCol))).as("cohort"))
    val active = events
      .select(col(userCol).as("__u"), date_trunc("day", col(tsCol)).as("__d"))
      .distinct()
    // (user, day) is distinct and cohort is functional on user, so the
    // plain count IS the distinct active-user count per cell
    active.join(firsts, Seq("__u"))
      .groupBy(col("cohort"),
        datediff(col("__d"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Daily + rolling-window active users, EXACTLY, with the scalable
    * sliding-distinct shape: dedupe to (day, user) once, then EXPAND each
    * pair to the `windowDays` window-end days it supports (a 7-row
    * explode — data volume ×window, but every operator stays an
    * equi-shuffle aggregation; the naive day⋈range join is a nested-loop
    * or a per-day re-scan, and a count_distinct over a sliding WINDOW
    * frame doesn't exist). Reported days are those with ≥1 event (inner
    * join with the daily side), so the trailing window never invents
    * days past the data. At 100 TB the (day, user) dedup is the one real
    * shuffle — days are a bounded dimension; for windows too wide to
    * expand, the HLL daily-sketch merge ([[Sketches.hllTable]] family)
    * is the documented approximate path. */
  def activeUsers(events: DataFrame, windowDays: Int = 7,
                  tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be ≥ 1")
    val du = events.select(to_date(col(tsCol)).as("day"),
      col(userCol).as("__u")).distinct()
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val rolling = du
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("__off"),
        col("day"), col("__u"))
      .select(date_add(col("day"), col("__off")).as("day"), col("__u"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("rolling"))
    dau.join(rolling, Seq("day"))
  }

  /** The documented approximate path for window widths too large to
    * expand at the (day, user) grain ([[activeUsers]]'s explode): sketch
    * each day ONCE (one corpus-pass HLL agg, output bounded by DAYS),
    * then roll windows by merging the day-level sketches — the window
    * expansion happens on the bounded day relation (sketch bytes ×
    * window), so widening the window scales with days, never with users
    * or events. A 365-day rolling MAU over 10¹⁰ events merges 365
    * kilobyte-sized registers per reported day instead of exploding
    * every (day, user) pair 365×. The exact DAU rides in the same
    * relation so the estimate's error is visible; reported days are
    * event-bearing days only, same as the exact path. */
  def activeUsersHll(events: DataFrame, windowDays: Int = 7, lgK: Int = 12,
                     tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be ≥ 1")
    val du = events.select(to_date(col(tsCol)).as("day"),
      col(userCol).as("__u")).distinct()
    val daily = du.groupBy("day")
      .agg(hll_sketch_agg(col("__u"), lit(lgK)).as("__sk"),
        count(lit(1)).as("dau_exact"))
    val rolling = daily
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("__off"),
        col("day"), col("__sk"))
      .select(date_add(col("day"), col("__off")).as("day"), col("__sk"))
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"), lit(true)))
        .as("rolling_est"))
    daily.select(col("day"), col("dau_exact"),
        hll_sketch_estimate(col("__sk")).as("dau_est"))
      .join(rolling, Seq("day"))
  }

  /** Behavioral anomaly report: the days a user's spend ran more than
    * `factor`× their own cross-day average. The test is the
    * division-free `day_sum · days_active > factor · total` (all
    * DECIMAL/integer arithmetic — exact and associative, so the flags
    * are bit-identical across engines and partitionings; a ratio of
    * doubles could flip a boundary day between the run and its oracle).
    *
    * Two map-side-combinable aggregations plus one user-keyed join of
    * bounded relations (≤ users·days rows); no windows, no skew cliff —
    * a hot user only widens its own day rows. */
  def anomalousDays(events: DataFrame, factor: Int = 3,
                    tsCol: String = "ts", userCol: String = "user_id",
                    valCol: String = "value"): DataFrame = {
    require(factor >= 1, s"factor=$factor must be ≥ 1")
    val daily = events.groupBy(col(userCol),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valCol).cast("decimal(18,2)")).as("__day_sum"))
    val perUser = daily.groupBy(col(userCol))
      .agg(count(lit(1)).as("days_active"), sum(col("__day_sum")).as("__total"))
    daily.join(perUser, Seq(userCol))
      .where(col("__day_sum") * col("days_active") > lit(factor) * col("__total"))
      .select(col(userCol), col("day"), col("n_events"),
        col("__day_sum").cast("double").as("day_value"),
        col("days_active"), col("__total").cast("double").as("user_total"))
  }
}
