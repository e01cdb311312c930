package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench rig's self-defense math (the part that decides
  * whether a recorded median is trusted or re-measured) — pure functions,
  * no Spark session. The rig exists because two rounds of records were
  * distorted by external box load; its own logic must not be the next
  * source of a wrong number. */
class BenchLogicSpec extends AnyFunSuite {

  test("median: odd, even, single") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("median: any failed rep poisons the set") {
    assert(Bench.median(Seq(1.0, -1.0, 2.0)) == -1.0)
    assert(Bench.median(Seq(-1.0)) == -1.0)
  }

  test("anomalous: warm median meaningfully above cold flags; margin absorbs noise") {
    // the r12 smoking guns must flag
    assert(Bench.anomalous(med = 14.8, cold = 2.2), "j2_renest_flat case")
    assert(Bench.anomalous(med = 3.0, cold = 0.7), "m2_etag_canonical case")
    // normal warm-faster-than-cold must not
    assert(!Bench.anomalous(med = 0.5, cold = 2.0))
    // sub-second timer noise inside the margin must not
    assert(!Bench.anomalous(med = 0.18, cold = 0.1))
    // equal times must not
    assert(!Bench.anomalous(med = 1.0, cold = 1.0))
  }

  test("anomalous: failures are failures, never anomalies") {
    assert(!Bench.anomalous(med = -1.0, cold = 2.0))
    assert(!Bench.anomalous(med = 2.0, cold = -1.0))
  }
}
