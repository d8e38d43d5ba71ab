package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Dedup, Similarity}

/** A zero-quantized embedding (all |components| < 0.0005) has no
  * direction: its cosine against anything is 0/sqrt(0) = NaN, and
  * NaN sorts ABOVE every real value under both engines' NaN-greatest
  * ordering — so without the n2 > 0 guards a zero vector would rank
  * as neighbor #1 everywhere and pass every >= tau filter. The
  * driver testdata has no zero vectors, so this path needs its own
  * fixture.
  */
class DegenerateVectorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // the SRP bucket pipeline is built for EmbDim-length vectors
  private def vec(head: Float*): Seq[Float] =
    head ++ Seq.fill(Dedup.EmbDim - head.size)(0.0f)

  // vec 0, 1: probes with direction; vec 5: zero vector; rest corpus
  private def embs = Seq(
    (0L, vec(1.0f, 0.2f, 0.0f, 0.1f), 0L),
    (1L, vec(0.9f, 0.3f, 0.1f, 0.0f), 0L),
    (5L, vec(0.0001f, -0.0002f, 0.0f, 0.0004f), 0L),
    (9L, vec(0.8f, 0.1f, 0.2f, 0.1f), 0L),
    (10L, vec(-0.5f, 0.4f, 0.3f, 0.2f), 0L))
    .toDF("vec_id", "embedding", "label")

  test("zero vector is never a neighbor and never NaN-ranks") {
    for (out <- Seq(Similarity.topKBruteForce(embs),
        Similarity.topKAnnLsh(embs))) {
      val rows = out.collect()
      assert(rows.nonEmpty)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == 5L))
      assert(rows.forall(r => !r.getAs[Double]("cos_sim").isNaN))
      // rank 1 is a real best neighbor, not a NaN artifact
      assert(rows.filter(_.getAs[Long]("rk") == 1L)
        .forall(_.getAs[Double]("cos_sim") > 0.5))
    }
  }

  test("zero vector emits no threshold or near-dup pairs") {
    val pairs = Similarity.pairsAboveThreshold(embs).collect()
    assert(pairs.forall(r => r.getAs[Long]("vec_id_a") != 5L &&
      r.getAs[Long]("vec_id_b") != 5L))
    assert(pairs.forall(r => !r.getAs[Double]("cos_sim").isNaN))
    val dups = Dedup.embeddingPairs(embs).collect()
    assert(dups.forall(r => r.getAs[Long]("vec_id_a") != 5L &&
      r.getAs[Long]("vec_id_b") != 5L))
  }

  test("an all-zero label reports zero quantization error, not NaN") {
    val zeroLabel = Seq(
      (0L, vec(0.0001f), 7L),
      (1L, vec(1.0f, 0.5f), 8L))
      .toDF("vec_id", "embedding", "label")
    val stats = Similarity.int8QuantStats(zeroLabel).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("err_ppm")).toMap
    assert(stats(7L) == 0.0 && !stats(8L).isNaN)
  }
}
