package graft

import org.apache.spark.sql.functions._

/** Multi-dimensional reporting semantics: subtotal rows must be exact
  * aggregates of their leaves, grouping flags must disambiguate
  * NULL-as-total from genuine NULLs, pivot cells must equal the long-form
  * aggregation, and the plan must carry the one-scan `Expand` shape the
  * family's scale argument rests on. */
class RelReportSpec extends SparkSpec {

  private def rollup = SparkEntry.queries("x_rollup_revenue")(spark, sf)

  test("rollup: the grand total and per-status subtotals are exact sums of their leaves") {
    val rows = rollup.collect()
    val leaves = rows.filter(r => r.getLong(2) == 0L && r.getLong(3) == 0L)
    val subtotals = rows.filter(r => r.getLong(2) == 0L && r.getLong(3) == 1L)
    val totals = rows.filter(r => r.getLong(2) == 1L && r.getLong(3) == 1L)
    assert(totals.length == 1, "exactly one grand-total row")
    assert(totals.head.getLong(4) == leaves.map(_.getLong(4)).sum)
    assert(totals.head.getLong(5) == leaves.map(_.getLong(5)).sum)
    // every status subtotal = the sum of that status's leaves
    subtotals.foreach { st =>
      val mine = leaves.filter(_.getString(0) == st.getString(0))
      assert(st.getLong(4) == mine.map(_.getLong(4)).sum,
        s"subtotal mismatch for status ${st.getString(0)}")
    }
    // rollup (not cube): no flag-only-on-status rows
    assert(rows.forall(r => !(r.getLong(2) == 1L && r.getLong(3) == 0L)))
  }

  test("rollup/cube/grouping-sets plan the one-scan Expand shape") {
    for (q <- Seq("x_rollup_revenue", "x_cube_events", "x_grouping_sets")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"),
        s"$q must aggregate all grouping sets off ONE scan via Expand")
    }
  }

  test("cube: all four grouping-set classes present; grand total counts every event") {
    val rows = SparkEntry.queries("x_cube_events")(spark, sf).collect()
    val classes = rows.map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(classes == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    val total = rows.filter(r => r.getLong(2) == 1L && r.getLong(3) == 1L)
    val nEvents = sources.Tables.events(spark, sf).count()
    assert(total.length == 1 && total.head.getLong(4) == nEvents)
  }

  test("grouping sets: two marginals only, each accounting for every order") {
    val rows = SparkEntry.queries("x_grouping_sets")(spark, sf).collect()
    val nOrders = sources.Tables.orders(spark, sf).count()
    val byStatus = rows.filter(r => r.getLong(2) == 0L && r.getLong(3) == 1L)
    val byPrio = rows.filter(r => r.getLong(2) == 1L && r.getLong(3) == 0L)
    assert(byStatus.length + byPrio.length == rows.length,
      "no leaf or grand-total sets beyond the two requested marginals")
    assert(byStatus.map(_.getLong(4)).sum == nOrders)
    assert(byPrio.map(_.getLong(4)).sum == nOrders)
  }

  test("pivot cells equal the long-form aggregation; absent combinations stay NULL") {
    val wide = SparkEntry.queries("x_pivot_returnflag")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val long = sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_linestatus"), col("l_returnflag"))
      .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val flags = Seq("A", "N", "R")
    for ((status, row) <- wide; (f, i) <- flags.zipWithIndex) {
      val cell = if (row.isNullAt(i + 1)) None else Some(row.getLong(i + 1))
      assert(cell == long.get((status, f)),
        s"pivot cell ($status, $f) must match the long-form sum")
    }
  }

  test("unpivot emits one long row per (status, metric) matching the wide relation") {
    val rows = SparkEntry.queries("x_unpivot_metrics")(spark, sf).collect()
    val statuses = rows.map(_.getString(0)).distinct
    assert(rows.length == statuses.length * 3)
    val m = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    statuses.foreach { st =>
      assert(m((st, "sum_cents")) >= m((st, "max_cents")),
        "a sum of positive cents bounds its max")
      assert(m((st, "n_orders")) > 0L)
    }
  }
}
