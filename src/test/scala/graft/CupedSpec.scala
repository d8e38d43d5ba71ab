package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics

/** Pins the CUPED arithmetic on a planted 4-user experiment with a
  * hand-computed θ, and the invariant CUPED must preserve by
  * construction: the adjustment is a zero-sum reshuffle between arms
  * (the pooled weighted mean of adjusted outcomes equals the raw
  * pooled mean exactly), plus the SRM guardrail's integer verdict on
  * both sides of the 3.84 line.
  */
class CupedSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-06-01 10:$m%02d:$s%02d")

  test("planted experiment reproduces the hand-computed theta and lifts") {
    import spark.implicits._
    // X (pre cents) = [100,200,300,400], Y (post) = [200,400,610,820]
    // → θ = 414000/200000 = 2.07; raw lift 4.15 collapses to 0.01
    val ev = Seq(
      (1L, ts(0), 0L, "t", 1.00), (2L, ts(2), 0L, "t", 2.00),
      (3L, ts(1), 2L, "t", 2.00), (4L, ts(3), 2L, "t", 4.00),
      (5L, ts(0), 1L, "t", 3.00), (6L, ts(2), 1L, "t", 6.10),
      (7L, ts(1), 3L, "t", 4.00), (8L, ts(3), 3L, "t", 8.20)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Analytics.cupedOn(ev).collect().head
    assert(r.getAs[Long]("n_users") === 4L)
    assert(math.abs(r.getAs[Double]("theta") - 2.07) < 1e-12)
    assert(r.getAs[Double]("rho2") > 0.999 && r.getAs[Double]("rho2") <= 1.0)
    assert(math.abs(r.getAs[Double]("lift_raw") - 4.15) < 1e-12)
    assert(math.abs(r.getAs[Double]("lift_adj") - 0.01) < 1e-9)
    // zero-sum invariant: pooled adjusted mean == pooled raw mean
    val pooledAdj = (2 * r.getAs[Double]("adj_mean_a") +
      2 * r.getAs[Double]("adj_mean_b")) / 4
    val pooledRaw = (2 * r.getAs[Double]("mean_y_a") +
      2 * r.getAs[Double]("mean_y_b")) / 4
    assert(math.abs(pooledAdj - pooledRaw) < 1e-9)
  }

  test("SRM verdict flips exactly past the 3.84 critical value") {
    import spark.implicits._
    def users(even: Int, odd: Int, tag: String) =
      ((0 until even).map(i => 2L * i) ++
        (0 until odd).map(i => 2L * i + 1)).zipWithIndex.map {
        case (u, i) => (i.toLong, ts(0, i % 60), u, tag, 1.0)
      }
    val ev = (users(3, 1, "balanced") ++ users(30, 2, "broken"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Analytics.srmOn(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("chi2"), r.getAs[Boolean]("srm_flag"))).toMap
    assert(got("balanced") === ((1.0, false)))    // (3-1)²/4 = 1.0
    assert(got("broken") === ((24.5, true)))      // (30-2)²/32 = 24.5
  }
}
