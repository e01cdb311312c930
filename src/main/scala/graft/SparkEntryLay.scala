package graft

import graft.ext.{Audit, Curation, Dedup, Layout, Sketches}
import graft.functions.TextFunctions
import graft.sources.{Lake, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth query batch (round 10): the data-layout / scan-statistics family
  * — Z-order clustering + zone-map pruning (the file-skipping machinery a
  * 100 TB table lives or dies by) and the KMV bottom-k sketch whose set
  * algebra (union / Jaccard / intersection) HLL binaries cannot express.
  * Merged into [[SparkEntry.queries]]; same oracle conventions. */
object SparkEntryLay {

  // ---------- Z-order layout constants (shared verbatim by the oracle
  // AND by LayoutSpec — the spec must validate the layout the queries
  // ship, not a private copy) ----------
  /** o_orderdate spans 1995-01-01..2001-08-01 → day ∈ [0, 2404]. */
  private[graft] val DayLo = 0.0
  private[graft] val DayHi = 2405.0
  /** o_totalprice spans ~1013..499979. */
  private[graft] val PriceLo = 1000.0
  private[graft] val PriceHi = 500000.0
  /** 5 bits per dimension → ≤ 1024 zones: zone stats stay bounded
    * metadata at any corpus size (zone COUNT is fixed; zone width grows
    * with data — at 100 TB each zone is a file set, not a row set). */
  private[graft] val ZBits = 5
  /** Prune-query rectangle: calendar 1997 × a mid-range price band. */
  private[graft] val QDayLo = 731L
  private[graft] val QDayHi = 1095L
  private[graft] val QPriceLo = 100000.0
  private[graft] val QPriceHi = 200000.0

  /** KMV sketch size. */
  private val KmvK = 128
  private val KmvShards = 16

  /** Corpus-fingerprint hash seed and hashed column order (the order is
    * part of the digest definition — oracle mirrors it verbatim). */
  private val FpSeed = 9200
  private val FpCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** Histogram-sketch bounds for events.value (0..~560 at every sf). */
  private val HistLo = 0.0
  private val HistHi = 600.0
  private val HistBits = 6
  private val HistQs = Seq((1, 2), (9, 10), (99, 100))

  private def dec(c: Column): Column = SparkEntry.dec(c)

  /** orders with the layout columns: day (int days since 1995-01-01),
    * price, and the Z-order zone id. */
  private[graft] def laidOrders(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val day = datediff(col("o_orderdate").cast("date"),
      to_date(lit("1995-01-01"))).cast("long")
    val dq = Layout.quantize(col("day"), DayLo, DayHi, ZBits)
    val pq = Layout.quantize(col("price"), PriceLo, PriceHi, ZBits)
    o.withColumn("day", day).withColumn("price", col("o_totalprice"))
      .withColumn("zone", Layout.zValue(dq, pq, ZBits))
  }

  /** Per-shard DISTINCT hashed-shingle relation (shard, h) — reuses the
    * dedup family's MEMOIZED shingle artifact (one tokenize+hash pass
    * shared with MinHash/LSH/Jaccard/decontamination), assigns the same
    * content-hash shard id the export layout uses ([[Curation.ShardSeed]]),
    * and is ITSELF memoized+persisted per (session, corpus plan): the
    * explode+distinct shuffle runs once, not once per sketch query /
    * per subtree of a query (sketch build, exact-side verify, and the
    * estimate's exact column all read this artifact). */
  private val itemsMemo = new graft.PlanMemo
  private val kmvMemo = new graft.PlanMemo
  private def shardShingles(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.hashedShingleTable(Tables.documents(s, dir))
    itemsMemo(sh, "kmvItems") {
      sh.select(
        (TextFunctions.seededHash(col("doc_id").cast("string"),
          Curation.ShardSeed) % KmvShards).as("shard"),
        explode(col("hs")).as("h"))
        .distinct()
    }
  }

  /** The stored KMV sketch table (shards·k rows), shared by both sketch
    * queries — built once per corpus like every stored-index artifact. */
  private def kmvOf(s: SparkSession, dir: String): DataFrame = {
    val items = shardShingles(s, dir)
    kmvMemo(items, s"kmv$KmvK")(
      Sketches.kmvTable(items, col("h"), "shard", KmvK))
  }

  /** Partition-prune probe languages — shared with the oracle. */
  private[graft] val PruneLangs = Seq("en", "de")

  /** The orders data contract: (rule, Spark predicate, DuckDB predicate)
    * triples — ONE list feeds both engines so the contract can never
    * diverge from its oracle. `price_under_100k` is deliberately
    * violated by the fixture, so the report proves non-zero counts
    * surface instead of vacuous passes. */
  private[graft] val ContractRules: Seq[(String, Column, String)] = Seq(
    ("orderkey_not_null", col("o_orderkey").isNotNull,
      "o_orderkey IS NOT NULL"),
    ("orderkey_positive", col("o_orderkey") > 0, "o_orderkey > 0"),
    ("status_in_domain", col("o_orderstatus").isin("F", "O", "P"),
      "o_orderstatus IN ('F', 'O', 'P')"),
    ("priority_format", col("o_orderpriority").rlike("^[1-5]-"),
      "regexp_matches(o_orderpriority, '^[1-5]-')"),
    ("price_range", col("o_totalprice").between(0.0, 1000000.0),
      "o_totalprice BETWEEN 0 AND 1000000"),
    ("date_in_window",
      col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2002-01-01").cast("timestamp"),
      "o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'"),
    ("price_under_100k", col("o_totalprice") <= 100000.0,
      "o_totalprice <= 100000"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bucketed_join" -> { (s, dir) =>
      // the co-located fact↔fact join: both sides are stored hash-
      // bucketed on the order key, so the merge join reads bucket i of
      // lineitem against bucket i of orders with NO exchange and (one
      // file per bucket, per-bucket sortBy) NO sort — the only shuffle
      // in the whole plan is the final 5-row priority rollup. LakeSpec
      // pins exactly that executed shape. The merge hints make the
      // demonstration independent of the broadcast threshold; money
      // stays decimal-exact until the final cast.
      val l = Lake.bucketed(s, dir, "lineitem", "l_orderkey")
      val o = Lake.bucketed(s, dir, "orders", "o_orderkey")
      l.hint("merge").join(o.hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          count_distinct(col("o_orderkey")).as("n_orders"),
          sum(dec(col("l_extendedprice")) *
              (lit(java.math.BigDecimal.ONE) - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"))
    },
    "x_partition_prune" -> { (s, dir) =>
      // the selective scan against a directory-per-language layout: the
      // lang IN (...) predicate resolves against partition DIRECTORIES
      // during planning, so files of the other languages are never
      // opened. LakeSpec asserts the scan's PartitionFilters and that
      // every file actually read sits under a probed lang= directory.
      Lake.partitioned(s, dir, "documents", "lang")
        .where(col("lang").isin(PruneLangs: _*))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
    },
    "x_expectations" -> { (s, dir) =>
      // the declarative data contract: one scan of orders evaluates
      // every rule (conditional sums over the same pass), unpivoted to
      // one (rule, n_rows, n_violations, pass) row each
      graft.ext.Audit.expectations(Tables.orders(s, dir),
        ContractRules.map(r => (r._1, r._2)))
    },
    "x_schema_evolution" -> { (s, dir) =>
      // lake snapshot merge across an evolved schema: the v1 half of the
      // corpus predates the `lang` column and carries 32-bit char
      // counts; unionByName(allowMissingColumns) backfills the missing
      // column with NULL and widens INT→BIGINT — the read-side contract
      // a 100 TB lake needs when old partitions were written by old jobs
      val docs = Tables.documents(s, dir)
      val v1 = docs.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"),
          col("n_chars").cast("int").as("n_chars"))
      val v2 = docs.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("n_chars"), col("lang"))
      v1.unionByName(v2, allowMissingColumns = true)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          length(col("text")).cast("long").as("text_len"))
    },
    "x_compaction_plan" -> { (s, dir) =>
      // compaction planning over table stats: (lang, source) cell sizes
      // ordered largest-first, binned by running-offset next-fit
      // ((cum − size) DIV target). The window runs over CELL METADATA
      // (≤ langs·sources rows — bounded like the sketch/centroid
      // collects), never over data, so the single-task window frame is
      // structurally fine at any corpus size.
      import org.apache.spark.sql.expressions.Window
      val target = 16384L
      val cells = Tables.documents(s, dir).groupBy("lang", "source")
        .agg(sum(col("n_chars")).as("cell_chars"))
      val w = Window.orderBy(col("cell_chars").desc, col("lang"), col("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.withColumn("cum", sum(col("cell_chars")).over(w))
        .select(col("lang"), col("source"), col("cell_chars"),
          expr(s"(cum - cell_chars) DIV $target").as("bin"))
    },
    "x_mix_temperature" -> { (s, dir) =>
      // temperature-scaled language re-weighting (α = 0.5, the
      // multilingual-sampling standard): weight_ppm ∝ √n_l, flattening
      // head languages so low-resource ones survive the mix. √ stays
      // deterministic (IEEE sqrt is correctly rounded in both engines,
      // then floored to an integer before the ppm division).
      import org.apache.spark.sql.expressions.Window
      val byLang = Tables.documents(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("s", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      // the normalizing total runs as an unpartitioned window over the
      // LANGUAGE table (bounded metadata, like the compaction cells)
      val tot = Window.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      byLang.withColumn("tot", sum(col("s")).over(tot))
        .select(col("lang"), col("n_docs"),
          expr("s * 1000000 DIV tot").as("weight_ppm"))
    },
    "x_salted_join" -> { (s, dir) =>
      // skew-salted join of the fact stream against a 6-row type
      // dimension: event_type alone would hash every row of a type onto
      // ONE reducer, so the join runs on (event_type, salt) with the
      // dimension replicated 8x — the hot key now spans 8 reducers.
      // Result is provably the plain join (oracle); SkewSpec pins the
      // flattened shuffle histogram and the exact-equality law.
      val e = Tables.events(s, dir)
      val dim = e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_total"))
      graft.ext.Skew.saltedJoin(e, dim, Seq("event_type"),
          col("event_id"), salts = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"),
          max(col("type_total")).as("type_total"))
    },
    "x_zorder_zonemap" -> { (s, dir) =>
      // the zone map itself: the per-zone min/max rectangle a writer
      // persists next to the data (≤ 4^bits rows). Tightness of these
      // rectangles IS the layout's value — LayoutSpec quantifies it.
      Layout.zoneMap(laidOrders(s, dir), "zone", Seq("day", "price"))
    },
    "x_zorder_prune" -> { (s, dir) =>
      val laid = laidOrders(s, dir)
      // ONE bounded-metadata collect (≤ 4^bits rows) serves both the
      // zone census and the candidate list — the scan planner reading
      // the stats table to prune FILES, exactly once; interval
      // intersection is driver-side arithmetic over those rows.
      // LayoutSpec proves the same filter skips partition directories
      // on a zone-partitioned write.
      val statRows = Layout.zoneMap(laid, "zone", Seq("day", "price"))
        .select("zone", "min_day", "max_day", "min_price", "max_price")
        .collect()
      val zTotal = statRows.length.toLong
      def num(r: org.apache.spark.sql.Row, name: String): Option[Double] = {
        val i = r.fieldIndex(name)
        if (r.isNullAt(i)) None else Some(r.getAs[Number](i).doubleValue())
      }
      // same intersection rule as Layout.pruneCandidates, scalar form
      val candZones = statRows.collect {
        case r if Layout.intersects(num(r, "min_day"), num(r, "max_day"),
            QDayLo.toDouble, QDayHi.toDouble) &&
          Layout.intersects(num(r, "min_price"), num(r, "max_price"),
            QPriceLo, QPriceHi) => r.getLong(r.fieldIndex("zone"))
      }
      val hit = col("day").between(QDayLo, QDayHi) &&
        col("price").between(QPriceLo, QPriceHi)
      // the pruned scan: only candidate zones are read; equality of
      // n_rows_match/revenue with the oracle's FULL-scan predicate proves
      // pruning lost nothing
      laid.where(col("zone").isin(candZones.toSeq: _*))
        .agg(
          count(lit(1)).as("n_rows_candidate"),
          sum(when(hit, 1L).otherwise(0L)).as("n_rows_match"),
          sum(when(hit, dec(col("price")))).cast("double").as("revenue"))
        .select(lit(zTotal).as("n_zones_total"),
          lit(candZones.length.toLong).as("n_zones_candidate"),
          col("n_rows_candidate"), col("n_rows_match"), col("revenue"))
    },

    "x_corpus_fingerprint" -> { (s, dir) =>
      // per-source order-independent content digest: the cheapest "are
      // these two copies the same corpus?" answer — compare 8-byte shard
      // digests, ship only mismatched shards
      Audit.fingerprintBy(Tables.documents(s, dir), "source", FpCols, FpSeed)
    },
    "x_fk_audit" -> { (s, dir) =>
      // referential-integrity sweep over the star schema. Two dimension
      // sides are deterministically DEGRADED (every 97th customer, every
      // 101st part dropped — the "late-arriving dimension partition"
      // failure) so the audit reports real non-zero orphan counts next
      // to a clean relationship's zero.
      val orders = Tables.orders(s, dir)
      val lineitem = Tables.lineitem(s, dir)
      val cust = Tables.customer(s, dir).where(col("c_custkey") % 97 =!= 0)
      val part = Tables.part(s, dir).where(col("p_partkey") % 101 =!= 0)
      Audit.fkOrphans("orders->customer", orders, "o_custkey", cust, "c_custkey")
        .unionByName(Audit.fkOrphans("lineitem->orders", lineitem, "l_orderkey",
          orders, "o_orderkey"))
        .unionByName(Audit.fkOrphans("lineitem->part", lineitem, "l_partkey",
          part, "p_partkey"))
    },

    "x_table_stats" -> { (s, dir) =>
      // ANALYZE-style table statistics — the per-column relation a
      // planner reads to size joins (broadcast vs shuffle) and to seed
      // zone-map/range decisions. Exact NDVs here (Catalyst plans the
      // multi-distinct agg with one Expand — the standard ANALYZE
      // shape); at corpus scale the same relation swaps in the sketch
      // family's estimators (HLL/KMV), which is why both live beside it.
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("o_custkey")).as("ndv_custkey"),
        count_distinct(col("o_orderstatus")).as("ndv_status"),
        count_distinct(col("o_orderpriority")).as("ndv_priority"),
        sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("nulls_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
    },

    "x_sketch_histogram" -> { (s, dir) =>
      // mergeable equi-width histogram (the quantile analogue of the CMS
      // table): quantile estimates at bin resolution, all-integer
      val h = Sketches.histogramTable(Tables.events(s, dir), col("value"),
        HistLo, HistHi, HistBits)
      Sketches.histogramQuantiles(h, HistQs)
    },

    "x_sketch_kmv" -> { (s, dir) =>
      // per-export-shard distinct-shingle estimate from the stored
      // bottom-k sketch, pinned next to the recomputed exact count (the
      // same estimate-vs-exact contract as x_sketch_hll / x_sketch_cms)
      val items = shardShingles(s, dir)
      val kmv = kmvOf(s, dir)
      val est = Sketches.kmvEstimate(kmv, "shard", KmvK)
      val exact = items.groupBy("shard")
        .agg(count(lit(1)).as("n_exact"))
      est.join(exact, Seq("shard"))
        .select("shard", "n_exact", "n_topk", "kth_h", "est_distinct")
    },
    "x_sketch_kmv_jaccard" -> { (s, dir) =>
      // cross-shard vocabulary overlap from SKETCHES ALONE (shards²·k
      // bounded rows — never the corpus): the set-algebra capability HLL
      // lacks; exact Jaccard recomputed alongside makes the error
      // oracle-visible
      val items = shardShingles(s, dir)
      val kmv = kmvOf(s, dir)
      val est = Sketches.kmvPairJaccard(kmv, "shard", KmvK)
      val exact = Sketches.pairJaccardExact(items, "shard")
      est.join(exact, Seq("g_a", "g_b"))
        .select("g_a", "g_b", "n_topk", "est_common", "est_jaccard_ppm",
          "est_only_a", "est_only_b", "est_only_a_ppm", "est_only_b_ppm",
          "n_inter", "n_union", "exact_jaccard_ppm")
    },
    "x_sketch_kmv_containment" -> { (s, dir) =>
      // directional overlap Jaccard cannot see: a shard fully CONTAINED
      // in another scores near-zero Jaccard but 100% containment — the
      // quote/partial-scrape signature. Same union-sample algebra, same
      // stored sketches; exact containments recomputed alongside
      val items = shardShingles(s, dir)
      val kmv = kmvOf(s, dir)
      val est = Sketches.kmvPairContainment(kmv, "shard", KmvK)
      val exact = Sketches.pairContainmentExact(items, "shard")
      est.join(exact, Seq("g_a", "g_b"))
        .select("g_a", "g_b", "n_topk", "est_common",
          "est_contain_a_ppm", "est_contain_b_ppm",
          "n_inter", "n_a", "n_b",
          "exact_contain_a_ppm", "exact_contain_b_ppm")
    }
  )

  // ---------- oracle SQL ----------

  private val mmP = TextFunctions.MinhashP
  private val daySql = "date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)"

  private def quantSql(v: String, lo: Double, hi: Double, bits: Int): String = {
    val cells = (1L << bits).toDouble
    s"least(${(1L << bits) - 1}, greatest(0, CAST(floor((CAST($v AS DOUBLE) - $lo) * $cells / ${hi - lo}) AS BIGINT)))"
  }

  private def zSql(a: String, b: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})")
      .mkString("(", " + ", ")")

  /** orders CTE with day/price/zone — mirrors [[laidOrders]] bit-for-bit. */
  private val zCte =
    s"WITH base AS (SELECT $daySql AS day, o_totalprice AS price FROM orders), " +
      s"z AS (SELECT day, price, ${zSql(quantSql("day", DayLo, DayHi, ZBits), quantSql("price", PriceLo, PriceHi, ZBits), ZBits)} AS zone FROM base)"

  private val statsCte =
    "st AS (SELECT zone, CAST(count(*) AS BIGINT) AS n_rows, " +
      "min(day) AS min_day, max(day) AS max_day, " +
      "min(price) AS min_price, max(price) AS max_price FROM z GROUP BY zone)"

  /** shard/shingle-hash CTE shared by the KMV oracles — mirrors
    * [[shardShingles]] (same shingle SQL as the dedup-family oracles, same
    * shard hash as x_shard_stats). */
  private val kmvHsCte = {
    val shardSql =
      s"${SparkEntryExt.seedHashSql(Curation.ShardSeed.toString, "CAST(doc_id AS VARCHAR)")} % $KmvShards"
    s"WITH sh AS (SELECT doc_id, unnest(${SparkEntryExt.shinglesSql()}) AS s FROM documents), " +
      s"hs AS (SELECT DISTINCT $shardSql AS shard, (('0x' || substr(md5(s), 1, 15)))::BIGINT % $mmP AS h FROM sh)"
  }

  /** mirrors [[Audit.fingerprintBy]]'s injective payload: each part
    * length-prefixed `V<len>:<value>`, NULL → `N`, concatenated in
    * declaration order. */
  private val fpPayloadSql = FpCols
    .map(c => s"(CASE WHEN CAST($c AS VARCHAR) IS NULL THEN 'N' " +
      s"ELSE 'V' || CAST(length(CAST($c AS VARCHAR)) AS VARCHAR) || ':' || CAST($c AS VARCHAR) END)")
    .mkString(" || ")

  private def fkAuditLegSql(rel: String, child: String, childKey: String,
                            parentSub: String, parentKey: String): String =
    // NULL child keys are "optional FK unset", not orphans — reported in
    // their own column (mirrors Audit.fkOrphans' convention)
    s"SELECT '$rel' AS relationship, CAST(count(*) AS BIGINT) AS n_child, " +
      s"CAST(sum(CASE WHEN c.$childKey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys, " +
      s"CAST(sum(CASE WHEN c.$childKey IS NOT NULL AND p.$parentKey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans " +
      s"FROM $child c LEFT JOIN (SELECT DISTINCT $parentKey FROM $parentSub) p " +
      s"ON p.$parentKey = c.$childKey"

  def oracleSql: Map[String, String] = Map(
    "x_bucketed_join" ->
      ("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items, " +
        "CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"),

    "x_partition_prune" ->
      (s"SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc FROM documents " +
        s"WHERE lang IN (${PruneLangs.map(l => s"'$l'").mkString(", ")}) " +
        "GROUP BY 1, 2"),

    "x_expectations" -> {
      // same rule list, same NULL-fails-the-expectation coalesce
      val sums = ContractRules.zipWithIndex.map { case ((_, _, sql), i) =>
        s"CAST(sum(CASE WHEN coalesce($sql, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v$i"
      }.mkString(", ")
      val branches = ContractRules.zipWithIndex.map { case ((name, _, _), i) =>
        s"SELECT '$name' AS rule, n AS n_rows, v$i AS n_violations, v$i = 0 AS pass FROM t"
      }.mkString(" UNION ALL ")
      s"WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n, $sums FROM orders) $branches"
    },

    // the evolved-schema read: v1 rows surface NULL lang and widened
    // counts — spelled as the explicit NULL/cast union the engine's
    // unionByName performs
    "x_schema_evolution" ->
      ("SELECT doc_id, NULL AS lang, CAST(CAST(n_chars AS INTEGER) AS BIGINT) " +
        "AS n_chars, CAST(length(text) AS BIGINT) AS text_len " +
        "FROM documents WHERE doc_id % 2 = 0 " +
        "UNION ALL SELECT doc_id, lang, n_chars, CAST(length(text) AS BIGINT) " +
        "AS text_len FROM documents WHERE doc_id % 2 = 1"),

    "x_compaction_plan" ->
      ("WITH cells AS (SELECT lang, source, CAST(sum(n_chars) AS BIGINT) " +
        "AS cell_chars FROM documents GROUP BY 1, 2), " +
        "c AS (SELECT lang, source, cell_chars, CAST(sum(cell_chars) OVER (" +
        "ORDER BY cell_chars DESC, lang, source " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum " +
        "FROM cells) " +
        "SELECT lang, source, cell_chars, (cum - cell_chars) // 16384 AS bin FROM c"),

    "x_mix_temperature" ->
      ("WITH l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS s " +
        "FROM documents GROUP BY 1) " +
        "SELECT lang, n_docs, CAST(s * 1000000 // (SELECT sum(s) FROM l) AS BIGINT) AS weight_ppm " +
        "FROM l"),

    "x_salted_join" ->
      ("WITH dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS type_total " +
        "FROM events GROUP BY 1) " +
        "SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events, " +
        "CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, " +
        "max(d.type_total) AS type_total " +
        "FROM events e JOIN dim d ON e.event_type = d.event_type GROUP BY 1"),

    "x_corpus_fingerprint" ->
      (s"SELECT source, CAST(count(*) AS BIGINT) AS n_rows, bit_xor(h) AS xor_sig " +
        s"FROM (SELECT source, ${SparkEntryExt.seedHashSql(FpSeed.toString, fpPayloadSql)} AS h " +
        "FROM documents) GROUP BY source"),

    "x_fk_audit" ->
      (fkAuditLegSql("orders->customer", "orders", "o_custkey",
        "customer WHERE c_custkey % 97 <> 0", "c_custkey") +
        " UNION ALL " +
        fkAuditLegSql("lineitem->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey") +
        " UNION ALL " +
        fkAuditLegSql("lineitem->part", "lineitem", "l_partkey",
          "part WHERE p_partkey % 101 <> 0", "p_partkey")),

    "x_table_stats" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_rows, " +
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_custkey, " +
        "CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv_status, " +
        "CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS ndv_priority, " +
        "CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_price, " +
        "min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, " +
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key FROM orders"),

    "x_zorder_zonemap" ->
      (s"$zCte, $statsCte SELECT zone, n_rows, min_day, max_day, min_price, max_price FROM st"),

    "x_zorder_prune" ->
      (s"$zCte, $statsCte, " +
        s"cand AS (SELECT zone FROM st WHERE min_day <= $QDayHi AND max_day >= $QDayLo " +
        s"AND min_price <= $QPriceHi AND max_price >= $QPriceLo), " +
        "pruned AS (SELECT z.* FROM z JOIN cand USING (zone)) " +
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM st) AS n_zones_total, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_zones_candidate, " +
        "CAST(count(*) AS BIGINT) AS n_rows_candidate, " +
        s"CAST(sum(CASE WHEN day BETWEEN $QDayLo AND $QDayHi AND price BETWEEN $QPriceLo AND $QPriceHi THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_match, " +
        s"CAST(sum(CASE WHEN day BETWEEN $QDayLo AND $QDayHi AND price BETWEEN $QPriceLo AND $QPriceHi THEN CAST(price AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue " +
        "FROM pruned"),

    "x_sketch_histogram" -> {
      val binSql = quantSql("value", HistLo, HistHi, HistBits)
      val legs = HistQs.map { case (num, den) =>
        s"SELECT ${num * 1000 / den} AS q_permille, CAST(min(bin) AS BIGINT) AS q_bin, " +
          s"CAST(min(total) AS BIGINT) AS n_total FROM c WHERE cum * $den >= total * $num"
      }.mkString(" UNION ALL ")
      s"WITH h AS (SELECT $binSql AS bin, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1), " +
        "c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum, " +
        s"sum(cnt) OVER () AS total FROM h) $legs"
    },

    "x_sketch_kmv" ->
      (s"$kmvHsCte, " +
        "rk AS (SELECT shard, h, row_number() OVER (PARTITION BY shard ORDER BY h) AS rk FROM hs), " +
        s"top AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_topk, max(h) AS kth_h FROM rk WHERE rk <= $KmvK GROUP BY shard), " +
        "ex AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_exact FROM hs GROUP BY shard) " +
        "SELECT t.shard, ex.n_exact, t.n_topk, t.kth_h, " +
        s"CASE WHEN t.n_topk < $KmvK THEN t.n_topk ELSE (${(KmvK - 1).toLong * mmP}) // t.kth_h END AS est_distinct " +
        "FROM top t JOIN ex USING (shard)"),

    "x_sketch_kmv_jaccard" ->
      (kmvPairCte +
        "SELECT e.g_a, e.g_b, e.n_topk, e.est_common, (1000000 * e.est_common) // e.n_topk AS est_jaccard_ppm, " +
        "e.est_only_a, e.est_only_b, " +
        "(1000000 * e.est_only_a) // e.n_topk AS est_only_a_ppm, " +
        "(1000000 * e.est_only_b) // e.n_topk AS est_only_b_ppm, " +
        "x.n_inter, x.n_union, (1000000 * x.n_inter) // x.n_union AS exact_jaccard_ppm " +
        "FROM est e JOIN exact x USING (g_a, g_b)"),

    "x_sketch_kmv_containment" ->
      (kmvPairCte +
        // directional algebra over the same sample/exact CTEs: the
        // sample's A members partition into {both, only-A}, so
        // C(A in B) = common / (common + only_a); NULL when the sample
        // holds no A member (mirrors Sketches.kmvPairContainment)
        "SELECT e.g_a, e.g_b, e.n_topk, e.est_common, " +
        "(1000000 * e.est_common) // nullif(e.est_common + e.est_only_a, 0) AS est_contain_a_ppm, " +
        "(1000000 * e.est_common) // nullif(e.est_common + e.est_only_b, 0) AS est_contain_b_ppm, " +
        "x.n_inter, x.n_a, x.n_b, " +
        "(1000000 * x.n_inter) // x.n_a AS exact_contain_a_ppm, " +
        "(1000000 * x.n_inter) // x.n_b AS exact_contain_b_ppm " +
        "FROM est e JOIN exact x USING (g_a, g_b)")
  )

  /** Shared CTE chain of the KMV pair oracles: union-sample estimate CTE
    * (`est`) + exact set-statistics CTE (`exact` — one h-keyed self-join
    * for intersections, group sizes, inclusion-exclusion union),
    * mirroring [[Sketches.kmvPairJaccard]] / [[Sketches.pairSetStatsExact]]
    * bit-for-bit. */
  private def kmvPairCte: String =
    s"$kmvHsCte, " +
      "rk AS (SELECT shard, h, row_number() OVER (PARTITION BY shard ORDER BY h) AS rk FROM hs), " +
      s"sk AS (SELECT shard, h FROM rk WHERE rk <= $KmvK), " +
      "pairs AS (SELECT a.shard AS g_a, b.shard AS g_b FROM (SELECT DISTINCT shard FROM hs) a " +
      "JOIN (SELECT DISTINCT shard FROM hs) b ON a.shard < b.shard), " +
      "uni AS (SELECT p.g_a, p.g_b, s.h, " +
      "max(CASE WHEN s.shard = p.g_a THEN 1 ELSE 0 END) AS in_a, " +
      "max(CASE WHEN s.shard = p.g_b THEN 1 ELSE 0 END) AS in_b " +
      "FROM pairs p JOIN sk s ON s.shard = p.g_a OR s.shard = p.g_b GROUP BY 1, 2, 3), " +
      "topu AS (SELECT *, row_number() OVER (PARTITION BY g_a, g_b ORDER BY h) AS rk FROM uni), " +
      s"est AS (SELECT g_a, g_b, CAST(count(*) AS BIGINT) AS n_topk, CAST(sum(in_a * in_b) AS BIGINT) AS est_common, " +
      "CAST(sum(in_a * (1 - in_b)) AS BIGINT) AS est_only_a, CAST(sum(in_b * (1 - in_a)) AS BIGINT) AS est_only_b " +
      s"FROM topu WHERE rk <= $KmvK GROUP BY 1, 2), " +
      "sizes AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM hs GROUP BY shard), " +
      "inter AS (SELECT a.shard AS g_a, b.shard AS g_b, CAST(count(*) AS BIGINT) AS n_inter " +
      "FROM hs a JOIN hs b ON a.h = b.h AND a.shard < b.shard GROUP BY 1, 2), " +
      "exact AS (SELECT p.g_a, p.g_b, coalesce(i.n_inter, 0) AS n_inter, " +
      "sa.n AS n_a, sb.n AS n_b, " +
      "sa.n + sb.n - coalesce(i.n_inter, 0) AS n_union " +
      "FROM pairs p LEFT JOIN inter i USING (g_a, g_b) " +
      "JOIN sizes sa ON sa.shard = p.g_a JOIN sizes sb ON sb.shard = p.g_b) " +
      ""
}
