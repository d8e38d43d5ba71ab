package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Corpus

/** Pins the data-constrained epoch planner's conservation laws on a
  * skewed corpus where the repeat cap BINDS:
  *
  *  1. BUDGET — Σ alloc_final = budget exactly (the one-pass
  *     proportional redistribution serves the whole budget: leftover
  *     ≤ spare because budget ≤ cap × corpus).
  *  2. CAP — no source exceeds cap × its size; a capped source lands
  *     exactly on cap epochs; an uncapped source gets ≥ its uniform
  *     target.
  *  3. REFERENCE — the whole plan matches a plain-Scala fold of the
  *     same integer-exact arithmetic.
  */
class EpochPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one tiny source (cap binds: 4x its size < uniform target) and
  // three large ones
  private def word(i: Int) = s"w$i"
  private val docs: Seq[(Long, String, String)] = {
    def doc(id: Long, n: Int, src: String) =
      (id, Seq.tabulate(n)(word).mkString(" "), src)
    Seq(doc(0L, 10, "tiny")) ++
      (1L to 8L).map(i => doc(i, 40, "big1")) ++
      (9L to 16L).map(i => doc(i, 50, "big2")) ++
      (17L to 24L).map(i => doc(i, 60, "big3"))
  }

  private lazy val got = Corpus.epochPlan(
    docs.toDF("doc_id", "text", "source"))
    .select("source", "n_tokens", "target_tokens", "alloc_capped",
      "alloc_final", "epochs", "capped")
    .as[(String, Long, Long, Long, Double, Double, Boolean)]
    .collect().map(r => r._1 -> r).toMap

  test("budget conservation and cap laws") {
    val sizes = Map("tiny" -> 10L, "big1" -> 320L, "big2" -> 400L,
      "big3" -> 480L)
    val corpus = sizes.values.sum
    val budget = Corpus.EpochBudgetX * corpus
    assert(got.keySet === sizes.keySet)
    for ((s, n) <- sizes) assert(got(s)._2 === n, s"size $s")
    assert(math.abs(got.values.map(_._5).sum - budget.toDouble) < 1e-6,
      "full budget served")
    for ((s, r) <- got) {
      assert(r._5 <= Corpus.EpochCap * r._2 + 1e-9, s"$s cap")
      assert(math.abs(r._6 - r._5 / r._2.toDouble) < 1e-12)
    }
    assert(got("tiny")._7, "tiny source capped")
    assert(got("tiny")._6 === Corpus.EpochCap.toDouble,
      "capped source trains exactly cap epochs")
    for (s <- Seq("big1", "big2", "big3")) {
      assert(!got(s)._7)
      assert(got(s)._5 >= got(s)._3.toDouble, "uncapped gets >= target")
    }
  }

  test("plan matches the plain-Scala reference fold") {
    val sizes = got.view.mapValues(_._2).toMap
    val corpus = sizes.values.sum
    val budget = Corpus.EpochBudgetX * corpus
    val target = budget / sizes.size
    val cap = sizes.view.mapValues(_ * Corpus.EpochCap).toMap
    val a1 = sizes.map { case (s, _) => s -> math.min(target, cap(s)) }
    // toSeq: mapping over a key Set would dedupe equal spare terms
    val spare = sizes.keys.toSeq.map(s => cap(s) - a1(s)).sum
    val leftover = budget - a1.values.sum
    for (s <- sizes.keys) {
      val fin = a1(s).toDouble +
        leftover.toDouble * ((cap(s) - a1(s)).toDouble / spare.toDouble)
      assert(math.abs(got(s)._5 - fin) < 1e-9, s"$s alloc_final")
      assert(got(s)._4 === a1(s), s"$s alloc_capped")
      assert(got(s)._3 === target, s"$s target")
    }
  }

  test("a zero-token source reports epochs 0.0, never NaN") {
    import spark.implicits._
    // "void" docs tokenize to nothing: n_tokens = 0, capacity = 0,
    // alloc 0 — the epochs division is 0.0/0.0, which must be the
    // explicit 0.0 (engine-independent), not NaN (whose SQL parity
    // hangs on DuckDB's ieee_floating_point_ops setting)
    val docs = (
      (0L until 6L).map(id => (id, s"some real tokens here $id", "real")) ++
        (10L until 13L).map(id => (id, "", "void"))
    ).toDF("doc_id", "text", "source")
    val rows = Corpus.epochPlan(docs)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet === Set("real", "void"))
    val v = rows("void")
    assert(v.getAs[Long]("n_tokens") === 0L)
    assert(v.getAs[Double]("epochs") === 0.0)
    assert(!v.getAs[Double]("epochs").isNaN)
    assert(rows("real").getAs[Double]("epochs") > 0.0)
  }
}
