package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

/** phashFamilies must close the near-pair graph TRANSITIVELY: a
  * drift chain A≈B≈C (hamming 1 and 2) joins A and C into one family
  * even though hamming(A,C)=3 exceeds the pair threshold — the
  * census (`multimodal_phash`) sees only immediate neighborhoods,
  * the family view is its transitive hull.
  */
class PhashFamiliesSpec extends AnyFunSuite {
  import SparkTestSession._

  /** 4×4 24-bpp BMP whose aHash is exactly `mask`: each 4×4 grid
    * cell is one pixel; bit k bright (240) iff mask bit k set, else
    * dark (16) — any non-degenerate mask separates around the mean.
    * Stride 12 needs no padding.
    */
  private def bmpWithHash(mask: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(54 + 48).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(102)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(4).putInt(4).putShort(1).putShort(24)
      .putInt(0).putInt(48).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (storageRow <- 0 until 4; c <- 0 until 4; _ <- 0 until 3) {
      val imageRow = 3 - storageRow
      val bit = imageRow * 4 + c
      bb.put(if ((mask & (1 << bit)) != 0) 240.toByte else 16.toByte)
    }
    bb.array()
  }

  test("drift chain merges transitively; isolated hash stays a singleton") {
    import spark.implicits._
    // A=0x0003, B=0x0007 (hamming 1 from A), C=0x001F (hamming 2 from
    // B, 3 from A), D=0xF000 (far from everything); C appears twice
    val docs = Seq(
      (1L, bmpWithHash(0x0003)),
      (2L, bmpWithHash(0x0007)),
      (3L, bmpWithHash(0x001F)),
      (4L, bmpWithHash(0x001F)),
      (5L, bmpWithHash(0xF000))).toDF("doc_id", "payload")
    val out = Binary.phashFamilies(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set(0x0003L, 0xF000L))
    // the chain family: 3 distinct hashes, 4 images, canonical doc 1
    assert(out(0x0003L) === ((3L, 4L, 1L)))
    // the far hash is its own family
    assert(out(0xF000L) === ((1L, 1L, 5L)))
  }

  test("family image mass reconciles with the census's group sizes") {
    val docs = Binary.mediaPayload(Tables.load(spark, sf, "documents"))
    val fams = Binary.phashFamilies(docs).collect()
    val census = SparkEntry.queries("multimodal_phash")(spark, sf).collect()
    // every image lands in exactly one family
    assert(fams.map(_.getAs[Long]("n_images")).sum ===
      census.map(_.getAs[Long]("n_images")).sum)
    // families never outnumber distinct hashes
    assert(fams.length <= census.length)
    // a hash with zero near neighbors in the census is a singleton
    // family; with neighbors, its family holds >= 2 hashes
    val famSize = fams.map(r =>
      r.getLong(0) -> r.getAs[Long]("n_hashes")).toMap
    census.filter(_.getAs[Long]("n_near_hashes") == 0).foreach { r =>
      famSize.get(r.getLong(0)).foreach(sz => assert(sz === 1L))
    }
  }
}
