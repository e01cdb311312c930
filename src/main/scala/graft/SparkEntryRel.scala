package graft

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sixth query batch: multi-dimensional reporting — ROLLUP / CUBE /
  * GROUPING SETS / pivot / unpivot. These are the report shapes a corpus
  * dashboard asks for (totals with subtotals, marginal breakdowns,
  * wide-vs-long reshapes), and each has a specific SCALE property worth
  * pinning:
  *
  *  - ROLLUP/CUBE/GROUPING SETS plan ONE scan: Catalyst's `Expand`
  *    replicates each input row once per grouping set BEFORE the
  *    aggregation, so partial (map-side) aggregation still applies and
  *    the corpus is read once — not once per set the way a UNION ALL of
  *    per-set GROUP BYs would read it. The exchange count stays that of
  *    a single aggregate; the replication factor (#sets, ≤ 4 here) is
  *    the entire extra cost and is independent of data volume.
  *  - `grouping()` flags ride in the aggregate output, so NULL-as-total
  *    rows stay distinguishable from genuine NULL group values — the
  *    invariant that makes the report safely joinable downstream.
  *  - pivot turns a BOUNDED, EXPLICITLY LISTED value set into columns —
  *    one aggregation, no per-value scans; listing the values (never
  *    inferring them) is what keeps the schema static and the plan free
  *    of the extra distinct-values job Spark otherwise runs.
  *  - unpivot (melt) is a zero-shuffle projection — each row expands to
  *    #metrics rows map-side.
  *
  * All money/value sums are exact integer cents (floor(x·100 + 0.5),
  * IEEE multiply-add + floor — no rounding-mode dependence), so every
  * report hash-matches the DuckDB oracle exactly. */
object SparkEntryRel {

  /** Exact-cents projection shared by the reports and (textually) their
    * oracles. */
  private def cents(c: org.apache.spark.sql.Column) =
    floor(c * 100.0 + 0.5).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_rollup_revenue" -> { (s, dir) =>
      // status → (status, returnflag) revenue rollup with grouping flags:
      // one lineitem⋈orders join, one Expand(3 sets)+agg — the corpus is
      // scanned once however many subtotal levels the report carries
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .rollup(col("o_orderstatus"), col("l_returnflag"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("l_returnflag")).cast("long").as("g_flag"),
          sum(cents(col("l_extendedprice"))).as("rev_cents"),
          count(lit(1)).as("n_items"))
    },
    "x_cube_events" -> { (s, dir) =>
      // full (event_type × month) cube incl. both marginals and the
      // grand total — 4 grouping sets, still ONE scan of events
      Tables.events(s, dir)
        .withColumn("m", month(col("ts")))
        .cube(col("event_type"), col("m"))
        .agg(grouping(col("event_type")).cast("long").as("g_type"),
          grouping(col("m")).cast("long").as("g_m"),
          count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
    },
    "x_grouping_sets" -> { (s, dir) =>
      // two independent marginal reports (by status, by priority) in one
      // scan — the GROUPING SETS form of what would otherwise be two
      // full-table aggregations unioned together
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping(col("o_orderstatus")).cast("long").as("g_status"),
          grouping(col("o_orderpriority")).cast("long").as("g_prio"),
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
    },
    "x_pivot_returnflag" -> { (s, dir) =>
      // wide report: revenue per linestatus with one column per return
      // flag — values EXPLICITLY listed (A/N/R), so the plan is a single
      // aggregation with a static schema and no inference job
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(cents(col("l_extendedprice"))))
    },
    "x_unpivot_metrics" -> { (s, dir) =>
      // long-form reshape of a wide per-status metric row — melt is a
      // map-side projection (each row → #metrics rows), zero shuffles
      // beyond the pre-aggregation that builds the wide relation
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("sum_cents"),
          max(cents(col("o_totalprice"))).as("max_cents"))
        .unpivot(Array(col("o_orderstatus")),
          Array(col("n_orders"), col("sum_cents"), col("max_cents")),
          "metric", "value")
    },
  )

  def oracleSql: Map[String, String] = Map(
    "x_rollup_revenue" ->
      ("SELECT o_orderstatus, l_returnflag, " +
        "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, " +
        "CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag, " +
        "CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents, " +
        "CAST(count(*) AS BIGINT) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY ROLLUP (o_orderstatus, l_returnflag)"),

    "x_cube_events" ->
      ("WITH e AS (SELECT event_type, CAST(month(ts) AS INTEGER) AS m, value FROM events) " +
        "SELECT event_type, m, " +
        "CAST(GROUPING(event_type) AS BIGINT) AS g_type, " +
        "CAST(GROUPING(m) AS BIGINT) AS g_m, " +
        "CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents " +
        "FROM e GROUP BY CUBE (event_type, m)"),

    "x_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, " +
        "CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status, " +
        "CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio, " +
        "CAST(count(*) AS BIGINT) AS n_orders, " +
        "CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents " +
        "FROM orders " +
        "GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"),

    // CASE WHEN without ELSE sums to NULL for absent combinations — the
    // same NULL the pivot emits
    "x_pivot_returnflag" ->
      ("SELECT l_linestatus, " +
        "CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS \"A\", " +
        "CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS \"N\", " +
        "CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) END) AS BIGINT) AS \"R\" " +
        "FROM lineitem GROUP BY l_linestatus"),

    "x_unpivot_metrics" ->
      ("WITH w AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, " +
        "CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents, " +
        "CAST(max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents " +
        "FROM orders GROUP BY 1) " +
        "SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM w " +
        "UNION ALL SELECT o_orderstatus, 'sum_cents' AS metric, sum_cents AS value FROM w " +
        "UNION ALL SELECT o_orderstatus, 'max_cents' AS metric, max_cents AS value FROM w"),
  )
}
