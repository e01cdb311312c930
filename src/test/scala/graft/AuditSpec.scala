package graft

import graft.ext.Audit
import org.apache.spark.sql.functions._

/** Corpus fingerprints and referential-integrity sweeps: the digest is
  * partition/order-independent and mergeable, flips on any single-row
  * tamper, and the FK audit counts exactly the orphans. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("id", "payload")
  private def fp(df: org.apache.spark.sql.DataFrame) =
    Audit.fingerprintBy(df, "grp", cols, seed = 42)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("fingerprint is order/partition independent and merges by xor") {
    val rows = (1L to 100L).map(i => (i % 4, i, s"payload-$i"))
    val a = rows.toDF("grp", "id", "payload")
    val shuffled = scala.util.Random.shuffle(rows).toDF("grp", "id", "payload")
      .repartition(7)
    assert(fp(a) == fp(shuffled), "digest depends on order/partitioning")
    // merge law: xor of split digests == whole digest, counts add
    val whole = fp(rows.map { case (_, i, p) => (0L, i, p) }.toDF("grp", "id", "payload"))(0L)
    val halves = Seq(rows.filter(_._2 <= 50), rows.filter(_._2 > 50))
      .map(h => fp(h.map { case (_, i, p) => (0L, i, p) }.toDF("grp", "id", "payload"))(0L))
    assert((halves(0)._1 + halves(1)._1, halves(0)._2 ^ halves(1)._2) == whole,
      "xor merge law broke")
  }

  test("fingerprint flips on a single-character tamper and on a dropped row") {
    val base = (1L to 50L).map(i => (0L, i, s"payload-$i")).toDF("grp", "id", "payload")
    val tampered = (1L to 50L).map(i => (0L, i, if (i == 37) "payload-37x" else s"payload-$i"))
      .toDF("grp", "id", "payload")
    val dropped = (1L to 50L).filter(_ != 37).map(i => (0L, i, s"payload-$i"))
      .toDF("grp", "id", "payload")
    assert(fp(base)(0L)._2 != fp(tampered)(0L)._2, "tamper went unseen")
    assert(fp(base)(0L)._2 != fp(dropped)(0L)._2, "dropped row went unseen")
  }

  test("fk audit counts exactly the orphans; clean relationship reports zero") {
    val child = Seq((1L, 10L), (2L, 20L), (3L, 99L), (4L, 20L), (5L, 98L))
      .toDF("id", "fk")
    val parent = Seq(10L, 20L, 30L).toDF("k")
    val got = Audit.fkOrphans("child->parent", child, "fk", parent, "k")
      .collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (("child->parent", 5L, 0L, 2L)))
    val clean = Audit.fkOrphans("clean", child, "fk",
      child.select(col("fk")), "fk").collect().head
    assert(clean.getLong(3) == 0L)
  }

  test("fk audit reports NULL child keys as unset, never as orphans") {
    // optional-FK convention: NULL never equi-joins, so counting it as an
    // orphan would conflate "not set" with "referenced parent missing"
    val child = Seq((1L, Some(10L)), (2L, None), (3L, Some(99L)), (4L, None))
      .toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("k")
    val got = Audit.fkOrphans("opt", child, "fk", parent, "k").collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) == ((4L, 2L, 1L)),
      s"want (n_child=4, n_null_keys=2, n_orphans=1), got $got")
  }

  test("expectations: one scan, NULL fails the rule, pass flags exact") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Some(1L), "a"), (Some(-2L), "b"), (None, "a"))
      .toDF("v", "tag")
    val got = Audit.expectations(df, Seq(
      ("v_not_null", col("v").isNotNull),
      ("v_positive", col("v") > 0), // NULL row must count as a violation
      ("tag_in_domain", col("tag").isin("a", "b"))))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got("v_not_null") == ((3L, 1L, false)))
    assert(got("v_positive") == ((3L, 2L, false)), "NULL comparison must fail the rule")
    assert(got("tag_in_domain") == ((3L, 0L, true)))
    intercept[IllegalArgumentException] {
      Audit.expectations(df, Seq(("dup", col("v").isNotNull), ("dup", col("v") > 0)))
    }
    intercept[IllegalArgumentException] {
      Audit.expectations(df, Seq.empty)
    }
  }

  test("histogramDrift: zero for identical cohorts, 2·na·nb for disjoint ones") {
    import org.apache.spark.sql.functions.col
    // identical shape A/B (same buckets, same proportions) → l1_cross 0
    val same = Seq(("g", 1L, true), ("g", 1L, false), ("g", 2L, true),
      ("g", 2L, false)).toDF("grp", "b", "ina")
    val r1 = Audit.histogramDrift(same, col("grp"), col("b"), col("ina"))
      .collect().head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(4)) == ((2L, 2L, 0L)))
    // disjoint support → Σ|ca·nb − cb·na| = na·nb + nb·na = 2·na·nb
    val disj = Seq(("g", 1L, true), ("g", 1L, true), ("g", 2L, false))
      .toDF("grp", "b", "ina")
    val r2 = Audit.histogramDrift(disj, col("grp"), col("b"), col("ina"))
      .collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4)) ==
      ((2L, 1L, 2L, 4L)))
  }

  test("moneyReconcile: exact cents, childless parents reconcile against zero") {
    import org.apache.spark.sql.functions.col
    val parents = Seq((1L, 10.00, "a"), (2L, 5.55, "a"), (3L, 2.00, "b"))
      .toDF("k", "stored", "grp")
    val children = Seq((1L, 4.00), (1L, 6.00), (2L, 5.54))
      .toDF("ck", "amt")
    val got = Audit.moneyReconcile(parents, col("k"), col("stored"),
        children, col("ck"), col("amt"), col("grp"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // grp a: order 1 matches to the cent, order 2 is 1 cent short
    assert(got("a") == ((2L, 1L, 1L, 1L)), s"got ${got("a")}")
    // grp b: no children → the full 200 cents is the visible diff
    assert(got("b") == ((1L, 1L, 200L, 200L)), s"got ${got("b")}")
  }

  test("joinSkewReport: exact top-k by output contribution, key-tiebroken") {
    import org.apache.spark.sql.functions.col
    val left = (Seq.fill(6)(10L) ++ Seq.fill(3)(20L) ++ Seq(30L, 40L))
      .toDF("k")
    val right = (Seq.fill(2)(10L) ++ Seq.fill(5)(20L) ++ Seq(30L, 50L))
      .toDF("j")
    val got = Audit.joinSkewReport(left, col("k"), right, col("j"), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // contributions: 10→6·2=12, 20→3·5=15, 30→1·1=1; 40/50 unmatched
    assert(got.toSeq == Seq((10L, 6L, 2L, 12L), (20L, 3L, 5L, 15L)))
    // deterministic tie-break on key: two keys with equal out_rows keep
    // the smaller key
    val l2 = Seq(1L, 2L, 3L).toDF("k")
    val r2 = Seq(1L, 2L, 3L).toDF("j")
    val ties = Audit.joinSkewReport(l2, col("k"), r2, col("j"), topK = 2)
      .collect().map(_.getLong(0)).sorted
    assert(ties.toSeq == Seq(1L, 2L))
  }

  test("seqGapAudit: holes, duplicates, and bucket boundaries counted exactly") {
    import spark.implicits._
    // bucket 0 (size 10): seqs 1,2,3,5,6,9 with 3 delivered twice
    //   -> 7 rows, 1 dup, gaps (3->5)=1 and (6->9)=2: n_gaps 2, missing 3
    // bucket 1: 12 alone -> clean single row
    val feed = Seq(1L, 2L, 3L, 3L, 5L, 6L, 9L, 12L).toDF("seq")
    val got = Audit.seqGapAudit(feed, col("seq"), bucketSize = 10L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got(0L) == ((7L, 1L, 1L, 9L, 2L, 3L)))
    assert(got(1L) == ((1L, 0L, 12L, 12L, 0L, 0L)))
    // a contiguous feed audits clean in every bucket
    val clean = Audit.seqGapAudit((0L to 25L).toDF("seq"), col("seq"), 10L)
      .collect()
    assert(clean.forall(r => r.getLong(2) == 0L && r.getLong(5) == 0L &&
      r.getLong(6) == 0L))
  }
}
