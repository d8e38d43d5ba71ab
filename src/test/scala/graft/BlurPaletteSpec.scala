package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary

/** Pins the two image-census parsers against hand-authored BMPs and
  * the generator's closed-form content bytes: a constant image has a
  * ZERO Laplacian everywhere (var_lap = 0 exactly — the blur gate's
  * fixed point) and a single palette cell; a generator image's
  * moments tie out against a driver-side recompute from
  * (id·31 + k) % 256 in CONTENT order, proving the storage-order
  * walk's mirror invariance.
  */
class BlurPaletteSpec extends AnyFunSuite {

  /** 3×3 24-bpp BMP with every pixel byte = `v` (stride pads 9→12). */
  private def constBmp(v: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(90).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(90)
      .putShort(0).putShort(0).putInt(54)
    bb.putInt(40).putInt(3).putInt(3).putShort(1).putShort(24)
      .putInt(0).putInt(36).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (r <- 0 until 3; c <- 0 until 12)
      bb.put(if (c < 9) v.toByte else 0.toByte)
    bb.array()
  }

  test("constant image: zero Laplacian variance, one palette cell") {
    val b = Binary.parseBlur(1L, constBmp(100)).get
    assert((b.width, b.height, b.n_interior) === ((3L, 3L, 1L)))
    assert((b.sum_lap, b.sum_lap_sq) === ((0L, 0L)))
    assert(b.var_lap === Some(0.0))
    val p = Binary.parsePalette(1L, constBmp(100)).get
    // 100 ÷ 64 = 1 per channel → cell 1·16 + 1·4 + 1 = 21
    assert((p.n_pixels, p.n_cells_used, p.top_cell, p.top_count)
      === ((9L, 1L, 21L, 9L)))
    assert(p.top_share === 1.0)
  }

  test("generator image moments tie out against the content formula") {
    val id = 6L // 6 % 3 == 0 → image; w = 10, h = 6
    val (w, h) = ((4 + id % 13).toInt, (3 + id % 7).toInt)
    def s(x: Int, y: Int): Long = (0 until 3).map { ch =>
      java.lang.Math.floorMod(id * 31 + (y.toLong * w + x) * 3 + ch, 256L)
    }.sum
    val laps = for {
      y <- 1 until h - 1; x <- 1 until w - 1
    } yield 4 * s(x, y) - s(x - 1, y) - s(x + 1, y) - s(x, y - 1) - s(x, y + 1)
    val b = Binary.parseBlur(id, Binary.encodeMedia(id)).get
    assert(b.n_interior === laps.size.toLong)
    assert(b.sum_lap === laps.sum)
    assert(b.sum_lap_sq === laps.map(l => l * l).sum)
    // palette recount from the same formula
    val cells = (for (y <- 0 until h; x <- 0 until w) yield {
      def byte(ch: Int) =
        java.lang.Math.floorMod(id * 31 + (y.toLong * w + x) * 3 + ch, 256L)
      (byte(0) / 64) * 16 + (byte(1) / 64) * 4 + byte(2) / 64
    }).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val p = Binary.parsePalette(id, Binary.encodeMedia(id)).get
    assert(p.n_cells_used === cells.size.toLong)
    val top = cells.toSeq.minBy { case (c, n) => (-n, c) }
    assert((p.top_cell, p.top_count) === ((top._1, top._2)))
    // non-image payloads contribute no row
    assert(Binary.parseBlur(7L, Binary.encodeMedia(7L)).isEmpty)
    assert(Binary.parsePalette(7L, Binary.encodeMedia(7L)).isEmpty)
  }
}
