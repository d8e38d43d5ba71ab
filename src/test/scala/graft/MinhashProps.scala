package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.ml.Dedup

/** Property checks for the MinHash/LSH and SimHash candidate
  * generators — the guarantees the dedup family's "never all-pairs"
  * claim rests on. All deterministic (no statistical-accuracy
  * assertions, which would flake by design).
  */
object MinhashProps extends Properties("graft.minhash") {
  private lazy val spark = SparkTestSession.spark

  private val shingle: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
  private val shingleSet: Gen[Set[String]] =
    Gen.nonEmptyListOf(shingle).map(_.toSet)

  private def sigDF(sets: Map[Long, Set[String]]) = {
    import spark.implicits._
    Dedup.minhashSignatures(
      sets.toSeq.flatMap { case (id, ss) => ss.map(id -> _) }
        .toDF("doc_id", "shingle"))
  }

  private def decodeSigs(
      sigs: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    sigs.collect()
      .map(r => r.getLong(0) -> (1 until r.length).map(r.getLong)).toMap

  private def collectSigs(sets: Map[Long, Set[String]]): Map[Long, Seq[Long]] =
    decodeSigs(sigDF(sets))

  property("signature is a function of the shingle SET") =
    Prop.forAll(shingleSet, Gen.nonEmptyListOf(Gen.chooseNum(0, 50))) {
      (ss, dupPicks) =>
        import spark.implicits._
        val base = ss.toSeq.map(0L -> _)
        // re-insert random duplicates in a different order: a min
        // aggregate over the family hashes must not see any of it
        val withDups = new scala.util.Random(42).shuffle(
          base ++ dupPicks.map(i => base(i % base.size)))
        collectSigs(Map(0L -> ss)) == decodeSigs(
          Dedup.minhashSignatures(withDups.toDF("doc_id", "shingle")))
    }

  property("minhash is monotone under shingle-set growth") =
    Prop.forAll(shingleSet, shingleSet) { (a, extra) =>
      val sigs = collectSigs(Map(0L -> a, 1L -> (a ++ extra)))
      sigs(0L).zip(sigs(1L)).forall { case (mhA, mhSuper) => mhSuper <= mhA }
    }

  property("identical shingle sets are always LSH candidates") =
    Prop.forAll(shingleSet) { ss =>
      val pairs = Dedup.candidatePairs(
        Dedup.bandBuckets(sigDF(Map(0L -> ss, 1L -> ss))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs == Set((0L, 1L))
    }

  // --- SimHash pigeonhole (pure JVM: mirrors Dedup.simhashNearPairs
  //     band extraction on arbitrary signatures) ---------------------

  private def bandValues(sig: Long): Seq[Long] =
    (0 until Dedup.WideBands).map(b =>
      (sig >>> (b * Dedup.WideBandBits)) & ((1L << Dedup.WideBandBits) - 1))

  private val sig60: Gen[Long] = Gen.chooseNum(0L, (1L << Dedup.WideBits) - 1)
  private val flips: Gen[Set[Int]] =
    Gen.chooseNum(0, Dedup.MaxHamming).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, Dedup.WideBits - 1)).map(_.toSet))

  property("hamming <= MaxHamming implies a shared band (pigeonhole)") =
    Prop.forAll(sig60, flips) { (sig, bits) =>
      val sig2 = bits.foldLeft(sig)((s, b) => s ^ (1L << b))
      val hamming = java.lang.Long.bitCount(sig ^ sig2)
      hamming <= Dedup.MaxHamming &&
        bandValues(sig).zip(bandValues(sig2)).exists { case (x, y) => x == y }
    }
}
