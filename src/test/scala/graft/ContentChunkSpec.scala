package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.ml.Corpus

/** Pins content-defined chunking against an INDEPENDENT plain-Scala
  * fold (java MessageDigest md5, no shared Spark code), plus the two
  * laws that make it the edit-robust chunking:
  *
  *  1. REFERENCE — contentChunks reproduces the fold bit-exactly:
  *     same boundaries (trailing 3-token window hash ≡ 0 mod 8),
  *     same chunk ids/starts/sizes, same fingerprints.
  *  2. PARTITION — chunks tile the token stream: per doc the sizes
  *     sum to n_tokens and each chunk starts where the previous one
  *     ended.
  *  3. EDIT ROBUSTNESS — under a one-token prefix insertion every
  *     chunk AFTER the first boundary survives with its exact
  *     fingerprint (boundaries are functions of local content, so
  *     they re-synchronize one window past the edit), and the
  *     chunkRobustness gauge reports content ≥ fixed.
  */
class ContentChunkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Plain-Scala content-defined chunking over one token list:
    * (chunk_id, chunk_start 1-based, tokens).
    */
  private def refChunks(toks: Seq[String]): Seq[(Long, Long, Seq[String])] = {
    val w = Corpus.ContentWindow
    val bounds = (1 to toks.length).map { i =>
      i >= w && refHash(toks.slice(i - w, i).mkString(" ")) %
        Corpus.ContentMask == 0
    }
    val ids = bounds.scanLeft(0L)((acc, b) => if (b) acc + 1 else acc)
    toks.zipWithIndex
      .map { case (t, i0) => (ids(i0), i0 + 1L, t) }
      .groupBy(_._1).toSeq
      .map { case (cid, rows) =>
        (cid, rows.map(_._2).min, rows.sortBy(_._2).map(_._3))
      }
      .sortBy(_._1)
  }

  private val rnd = new scala.util.Random(17)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private val docs: Seq[(Long, String, String)] = (0L until 40L).map { id =>
    val n = 5 + rnd.nextInt(56)
    val txt = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (id, txt, s"src${id % 3}")
  }
  private lazy val df = docs.toDF("doc_id", "text", "source")

  test("contentChunks matches the plain-Scala reference fold") {
    val got = Corpus.contentChunks(df)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_tokens", "chunk_fp")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val want = docs.flatMap { case (id, txt, _) =>
      refChunks(Portable.normTextJvm(txt).split(" ").toSeq.filter(_.nonEmpty))
        .map { case (cid, start, toks) =>
          (id, cid, start, toks.length.toLong, refHash(toks.mkString(" ")))
        }
    }.toSet
    assert(got === want)
  }

  test("chunks tile the token stream exactly") {
    val rows = Corpus.contentChunks(df)
      .select("doc_id", "chunk_id", "chunk_start", "chunk_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    for ((id, chunks) <- rows) {
      val n = docs.find(_._1 == id).get._2.split("\\s+").count(_.nonEmpty)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._4).sum === n.toLong, s"doc $id sizes")
      assert(sorted.head._3 === 1L, s"doc $id first start")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + a._4, s"doc $id contiguity")
        case _ =>
      }
    }
  }

  test("prefix edit preserves every chunk after the first boundary") {
    val shifted = df.withColumn("text", concat(lit("zzz "), col("text")))
    val orig = Corpus.contentChunks(df)
      .select("doc_id", "chunk_id", "chunk_fp")
      .as[(Long, Long, Long)].collect()
    val after = Corpus.contentChunks(shifted)
      .select("doc_id", "chunk_fp")
      .as[(Long, Long)].collect().toSet
    val lost = orig.filter { case (id, cid, fp) =>
      cid >= 1 && !after.contains((id, fp))
    }
    assert(lost.isEmpty,
      s"non-first chunks must survive a prefix edit, lost: ${lost.take(5).toSeq}")
  }

  test("chunkRobustness: content beats the fixed grid, rows consistent") {
    val r = Corpus.chunkRobustness(df)
      .select("method", "n_docs", "n_fps", "n_preserved", "preserved_ratio")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet === Set("content", "fixed"))
    val c = r("content"); val f = r("fixed")
    assert(c._5 > f._5, "content-defined must preserve more than fixed grid")
    for (t <- Seq(c, f)) {
      assert(t._4 <= t._3)
      assert(math.abs(t._5 - t._4.toDouble / t._3.toDouble) < 1e-12)
    }
  }
}
