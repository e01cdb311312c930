package graft

import graft.ext.Skyline

/** The bucket-pruned skyline against the ICDE'01 definition applied
  * brute-force: for every bucket width the prune is allowed, the output
  * must be EXACTLY the definitional frontier — the prune is a performance
  * path, never a semantics knob. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** The definition: p survives iff no q dominates it (q no worse on
    * both criteria, strictly better on at least one). */
  private def refSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)], width: Long,
                  maxSurvivors: Long = Skyline.MaxSurvivors,
                  parts: Int = 5): Set[(Long, Long, Long)] =
    Skyline.skyline2d(pts.toDF("id", "x", "y").repartition(parts),
        "id", "x", "y", width, maxSurvivors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("skyline equals the definitional frontier for every bucket width") {
    val rnd = new scala.util.Random(2024)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val expected = refSkyline(pts)
    assert(expected.nonEmpty)
    // width 1 (finest prune), mid, and wider-than-range (single bucket —
    // the pure same-bucket quadratic path) must all agree exactly
    for (w <- Seq(1L, 37L, 5000L))
      assert(run(pts, w) == expected, s"width=$w")
  }

  test("adversarial frontier (every point non-dominated) survives whole") {
    // under (min x, max y), y = x is the adversarial diagonal: cheaper
    // points are always also lower-valued, so NO point dominates another
    // and the full set is the skyline — the worst case for the prune
    val pts = (0L to 99L).map(i => (i, i, i))
    assert(refSkyline(pts) == pts.toSet, "fixture sanity")
    assert(run(pts, 10L) == pts.toSet)
  }

  test("incomparable ties are kept: duplicates and equal-on-one-axis points") {
    val pts = Seq(
      (1L, 10L, 10L), (2L, 10L, 10L), // exact duplicates — both kept
      (3L, 10L, 5L),                  // dominated by 1/2 (same x, lower y)
      (4L, 5L, 10L),                  // dominates nothing of 1/2? same y, lower x → dominates 1 and 2
      (5L, 20L, 20L))                 // higher y — incomparable with 4
    // 4 dominates 1, 2 (x strictly lower, y equal) and 3; 5 survives on y
    assert(run(pts, 7L) == Set((4L, 5L, 10L), (5L, 20L, 20L)))
    assert(run(pts, 7L) == refSkyline(pts))
    // drop point 4: the duplicates 1 and 2 are mutually incomparable
    // (equal on both) — the ICDE'01 semantics keeps both
    val noFour = pts.filterNot(_._1 == 4L)
    assert(run(noFour, 7L) == Set((1L, 10L, 10L), (2L, 10L, 10L), (5L, 20L, 20L)))
  }

  test("the survivor valve fails loudly instead of committing a quadratic join") {
    // the y = x diagonal defeats the prune entirely: all 100 survive it
    val pts = (0L to 99L).map(i => (i, i, i))
    intercept[IllegalArgumentException] { run(pts, 10L, maxSurvivors = 50L) }
    // at exactly the survivor count it completes
    assert(run(pts, 10L, maxSurvivors = 100L) == pts.toSet)
  }

  test("negative coordinates: truncating DIV buckets stay monotone, frontier exact") {
    // Spark's DIV truncates toward zero, so negative x values bucket
    // differently than a flooring division would — but bucket intervals
    // remain DISJOINT and ORDERED (bucket m < n ⇒ every x in m < every
    // x in n), which is all the prefix-prune proof needs. Pin it.
    val rnd = new scala.util.Random(1234)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(400).toLong - 200L, rnd.nextInt(400).toLong - 200L))
    val expected = refSkyline(pts)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 25L, 10000L))
      assert(run(pts, w) == expected, s"width=$w")
  }

  test("partitioning does not change the frontier") {
    val rnd = new scala.util.Random(88)
    val pts = (1L to 300L).map(i =>
      (i, rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
    val expected = refSkyline(pts)
    assert(run(pts, 16L, parts = 1) == expected)
    assert(run(pts, 16L, parts = 11) == expected)
  }
}
