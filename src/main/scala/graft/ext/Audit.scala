package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-integrity audits for corpus-scale tables (north-star extension;
  * the reference's only integrity machinery is the per-document key/shape
  * gate, M7): content fingerprints for replica/version equality and
  * referential-integrity sweeps for relationship health. Both are the
  * checks a 100 TB ingest runs BEFORE a training job spends a cluster-day
  * on corrupted input.
  */
object Audit {

  /** Order-independent content fingerprint per group: `(grp, n_rows,
    * xor_sig)` where `xor_sig` is the XOR-fold of a 60-bit content hash
    * of each row's chosen columns. XOR is commutative/associative ⇒ the
    * digest is identical under ANY partitioning, row order, or merge
    * tree (map-side combinable, fixed 8-byte state — the cheapest
    * possible "are these two copies the same corpus?" answer: compare
    * shard digests, ship only mismatched shards). Rows must be UNIQUE on
    * the hashed columns (include the primary key): XOR cancels an even
    * number of identical rows, so a duplicated+dropped pair would go
    * unseen on a multiset — with a key column present every row is
    * distinct and the digest is a faithful set fingerprint; `n_rows`
    * independently pins cardinality.
    *
    * The payload encoding is INJECTIVE: each part is length-prefixed
    * (`V<len>:<value>`, NULL → `N`), so a delimiter character inside a
    * value cannot alias two distinct rows ('a|b','c' vs 'a','b|c') and a
    * NULL is distinct from '' — a '' → NULL rewrite (the classic CSV
    * round-trip hazard) flips the digest instead of hiding. Same rule
    * PlanMemo.tag applies to memo keys, same reason. */
  def fingerprintBy(df: DataFrame, groupCol: String, cols: Seq[String],
                    seed: Int): DataFrame = {
    val payload = concat(cols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(lit("V"), length(s).cast("string"), lit(":"), s))
    }: _*)
    df.select(col(groupCol), TextFunctions.seededHash(payload, seed).as("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("xor_sig"))
  }

  /** Referential-integrity sweep: orphan count for one child→parent
    * relationship. One left-outer join on the key — broadcast when the
    * parent's key column is dimension-sized, shuffle-hash/SMJ otherwise
    * (Catalyst's call); the result is one row of bounded metadata per
    * relationship, so a full star-schema audit is a union of these.
    *
    * NULL convention: a NULL child key is an OPTIONAL FK left unset, not
    * a dangling reference — NULL never equi-joins, so counting it as an
    * orphan would conflate "not set" with "referenced parent missing".
    * `n_orphans` therefore counts only NON-NULL keys with no parent, and
    * NULL keys are reported separately as `n_null_keys` so a nullable-FK
    * table's audit row still surfaces them. */
  def fkOrphans(rel: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__present", lit(1))
    // one outer join + one agg yields child/null/orphan counts in a
    // single pass (a separate anti-join + count pair would need a 1-row
    // join to reassemble — a nested-loop shape PlanAuditSpec bans)
    child.select(col(childKey).as("__k"))
      .join(p, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(col("__k").isNotNull && col("__present").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
      .select(lit(rel).as("relationship"), col("n_child"),
        col("n_null_keys"), col("n_orphans"))
  }

  /** Declarative data-contract evaluation: `rules` is a list of named
    * row predicates; ONE corpus scan computes every rule's violation
    * count (each is a map-side-combinable conditional sum over the same
    * pass), then a literal-array explode unpivots the single result row
    * into `(rule, n_rows, n_violations, pass)` — bounded output, one
    * row per rule.
    *
    * NULL convention: a predicate evaluating to NULL (e.g. a range test
    * on a NULL column) counts as a VIOLATION — an expectation that
    * cannot be affirmed is not met. Spell `isNull`-tolerant rules
    * explicitly (`c.isNull || c.between(...)`) where NULL is allowed. */
  /** Integer-exact distribution drift between two cohorts of one
    * relation (corpus snapshot A vs B, last week vs this week): histogram
    * both cohorts per `group` over `bucket` in ONE scan (conditional
    * sums), then report the cross-multiplied L1 distance
    * Σ_b |c_A(b)·n_B − c_B(b)·n_A| per group — the total-variation
    * numerator scaled by n_A·n_B, kept in BIGINT so no division touches
    * the compare (divide by n_A·n_B·2 off-engine for the [0,1] TV
    * distance). Output is group-bounded: (group, n_a, n_b, n_buckets,
    * l1_cross). Counts ≤ 2^31 keep every product well inside Long.
    *
    * This is the drift monitor a training pipeline runs between corpus
    * versions: a big l1_cross on a feature histogram means the new
    * snapshot shifted distribution and downstream mixes need re-weighing.
    * Two map-side-combinable aggregations — no joins on data. */
  def histogramDrift(df: DataFrame, group: Column, bucket: Column,
                     inA: Column): DataFrame = {
    val h = df.groupBy(group.as("grp"), bucket.as("__b"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("__ca"),
        sum(when(inA, 0L).otherwise(1L)).as("__cb"))
    val tot = h.groupBy("grp")
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    h.join(tot, Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        count(lit(1)).as("n_buckets"),
        sum(abs(col("__ca") * col("__nb") - col("__cb") * col("__na")))
          .as("l1_cross"))
  }

  /** Parent↔child monetary reconciliation in EXACT integer cents: for
    * each parent row, compare a stored rollup column against the sum
    * re-derived from its children, and report per `reportBy` group the
    * mismatch census (n_parents, n_mismatch, sum/max absolute diff).
    * Cents come from `floor(x·100 + 0.5)` — IEEE double multiply-add
    * and floor are exactly specified, so both engines derive identical
    * integers without any decimal-rounding-mode dependence (round()
    * half-up vs half-even is exactly the cross-engine trap this avoids).
    * Parents with NO children reconcile against 0 (left join +
    * coalesce), so dropped-children corruption is visible instead of
    * silently excluded. One child-side rollup shuffle + one key join;
    * the report is group-bounded. */
  def moneyReconcile(parents: DataFrame, parentKey: Column, stored: Column,
                     children: DataFrame, childKey: Column, amount: Column,
                     reportBy: Column): DataFrame = {
    def cents(c: Column) = floor(c * lit(100.0) + lit(0.5)).cast("long")
    val kids = children.groupBy(childKey.as("__k"))
      .agg(sum(cents(amount)).as("__kid_cents"))
    parents.select(reportBy.as("grp"), parentKey.as("__k"),
        cents(stored).as("__stored_cents"))
      .join(kids, Seq("__k"), "left")
      .select(col("grp"),
        (col("__stored_cents") - coalesce(col("__kid_cents"), lit(0L))).as("__d"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_parents"),
        sum(when(col("__d") =!= 0L, 1L).otherwise(0L)).as("n_mismatch"),
        sum(abs(col("__d"))).as("sum_abs_diff_cents"),
        max(abs(col("__d"))).as("max_abs_diff_cents"))
  }

  /** Pre-join explosion audit: for an intended `left ⋈ right` equi-join,
    * report the `topK` keys by OUTPUT contribution (n_left·n_right) —
    * the report you run BEFORE shipping a 100 TB join, because one hot
    * key that would put 10^10 rows on a single reducer is visible here
    * for the cost of two map-side-combinable counts over key-cardinality
    * data. Keys over a salting threshold go to [[graft.ext.Skew]]'s
    * salted path; the rest join plain. Two-phase top-k (partition-local
    * rank, then a final rank over ≤ partitions·topK survivors) — no
    * global sort, no single-task window over key-cardinality data. Ties
    * break on key for a deterministic oracle. */
  def joinSkewReport(left: DataFrame, leftKey: Column,
                     right: DataFrame, rightKey: Column,
                     topK: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 1, s"joinSkewReport(topK=$topK)")
    val lc = left.groupBy(leftKey.as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(rightKey.as("key")).agg(count(lit(1)).as("n_right"))
    val contrib = lc.join(rc, Seq("key"))
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("out_rows"))
    val local = Window.partitionBy(col("__pid"))
      .orderBy(col("out_rows").desc, col("key"))
    val global = Window.orderBy(col("out_rows").desc, col("key"))
    contrib.withColumn("__pid", spark_partition_id())
      .withColumn("__lrk", row_number().over(local)).where(col("__lrk") <= topK)
      .withColumn("__rk", row_number().over(global)).where(col("__rk") <= topK)
      .drop("__pid", "__lrk", "__rk")
  }

  /** Changelog completeness audit: did every sequence number in the feed
    * arrive exactly once? Consumers resuming from an offset can only
    * trust their fold if the ingested range is CONTIGUOUS — a dropped
    * batch shows up here as a gap long before it shows up as a wrong
    * aggregate. Works per fixed-width `bucketSize` segment of the
    * sequence space, so the report stays bounded (segments, not rows)
    * and the window is KEYED by bucket — gap detection is one
    * lag-over-(bucket, seq) pass plus one agg, both shuffling on the
    * bucket key; no global sort, no single-task window. Boundary gaps
    * BETWEEN buckets are attributed to the later bucket via each
    * bucket's expected range [bucket·size, min(hi, next observed)) —
    * kept internal-only here: `n_missing` counts holes strictly inside
    * a bucket's observed [lo, hi] span, the signature a lost micro-batch
    * leaves (whole missing buckets surface as absent report rows, which
    * the bounded report makes obvious). Duplicates are counted
    * separately (`n_dups`), not conflated with gaps. */
  def seqGapAudit(log: DataFrame, seqCol: Column, bucketSize: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketSize >= 2, s"bucketSize=$bucketSize")
    val rows = log.select(seqCol.cast("long").as("__seq"))
      .select(expr(s"__seq DIV $bucketSize").as("bucket"), col("__seq"))
    val dups = rows.groupBy("bucket")
      .agg(count(lit(1)).as("__n_rows"))
    val d = rows.distinct()
    val w = Window.partitionBy("bucket").orderBy("__seq")
    val gapped = d.withColumn("__prev", lag(col("__seq"), 1).over(w))
      .withColumn("__gap",
        when(col("__prev").isNotNull && col("__seq") - col("__prev") > 1L,
          col("__seq") - col("__prev") - 1L).otherwise(0L))
    gapped.groupBy("bucket")
      .agg(count(lit(1)).as("n_distinct"), min("__seq").as("lo"),
        max("__seq").as("hi"),
        sum(when(col("__gap") > 0L, 1L).otherwise(0L)).as("n_gaps"),
        sum(col("__gap")).as("n_missing"))
      .join(dups, Seq("bucket"))
      .select(col("bucket"), col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("n_distinct")).as("n_dups"),
        col("lo"), col("hi"), col("n_gaps"), col("n_missing"))
  }

  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "an empty contract audits nothing")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names: ${rules.map(_._1)}")
    val aggs = rules.map { case (n, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$n")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val pairs = rules.map { case (n, _) =>
      struct(lit(n).as("rule"), col(s"__v_$n").as("nv"))
    }
    row.select(col("__n"), explode(array(pairs: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("__n").as("n_rows"),
        col("r.nv").as("n_violations"), (col("r.nv") === 0L).as("pass"))
  }
}
