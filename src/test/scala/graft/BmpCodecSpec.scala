package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.BmpCodec

/** The BMP codec: canonical layout bytes, strict-parser rejection of
  * corrupted headers, exact bottom-up/pad recovery across widths, and
  * the hand-checked 2:1 box filter. */
class BmpCodecSpec extends SparkSpec {

  test("writes the canonical 24-bit layout and round-trips pixels") {
    // 3x2 image: rows [10,20,30] / [40,50,60]; rowSize = 12 (9 + 3 pad)
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val bmp = BmpCodec.write(px, 3, 2)
    assert(bmp.length == 54 + 12 * 2)
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    // bottom-up: first stored row is the LAST image row (40,50,60),
    // each pixel B=G=R
    assert(bmp.slice(54, 63).toSeq ==
      Seq[Byte](40, 40, 40, 50, 50, 50, 60, 60, 60))
    assert(bmp.slice(63, 66).toSeq == Seq[Byte](0, 0, 0), "row pad")
    val (w, h, back) = BmpCodec.pixels(bmp)
    assert((w, h) == (3, 2) && back.toSeq == px.toSeq)
  }

  test("decode stats are exact across widths (pad arithmetic varies)") {
    for (w <- 1 to 9) {
      val px = Array.tabulate(w * 3)(i => (i * 7 % 251).toByte)
      val f = BmpCodec.decode(99L, BmpCodec.write(px, w, 3))
      val vals = px.map(_ & 0xff)
      assert(f.n_pixels == w * 3 && f.sum_lum == vals.map(_.toLong).sum &&
        f.peak_lum == vals.max.toLong, s"width $w")
    }
  }

  test("strict parser rejects corrupted headers and truncated files") {
    val good = BmpCodec.write(Array[Byte](1, 2, 3, 4), 2, 2)
    def corrupt(pos: Int, v: Byte): Array[Byte] = {
      val b = good.clone(); b(pos) = v; b
    }
    for ((bad, what) <- Seq(
        (corrupt(0, 'X'.toByte), "magic"),
        (corrupt(2, (good(2) + 1).toByte), "file size field"),
        (corrupt(14, 12.toByte), "DIB header size"),
        (corrupt(28, 8.toByte), "bits per pixel"),
        (corrupt(30, 1.toByte), "compression"),
        (corrupt(34, (good(34) + 1).toByte), "biSizeImage"),
        (good.dropRight(1), "truncated pixel array"),
        (good.take(40), "truncated header")))
      assert(intercept[IllegalArgumentException] {
        BmpCodec.decode(1L, bad)
      }.getMessage.contains("not a 24-bit BMP"), s"must reject $what")
    // and the uncorrupted artifact still parses
    assert(BmpCodec.decode(1L, good).n_pixels == 4L)
  }

  test("2:1 box filter matches hand computation, including edge blocks") {
    // 3x3: blocks (0,0)=mean(1,2,4,5)=3, (1,0)=mean(3,6)=4,
    //      (0,1)=mean(7,8)=7, (1,1)=mean(9)=9
    val px = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val (out, w2, h2) = BmpCodec.resize2(px, 3, 3)
    assert((w2, h2) == (2, 2))
    assert(out.toSeq == Seq[Byte](3, 4, 7, 9))
  }

  test("query surfaces agree with a driver-side recount at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val texts = Tables.documents(spark, d).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(0 + 1)).toSeq
    val want = texts.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val w = (id % 29 + 3).toInt
      val h = bytes.length / w
      Option.when(h >= 1) {
        val vals = bytes.take(w * h).map(b => (b & 0xff).toLong)
        (id, vals.sum, vals.max)
      }
    }.sortBy(_._1)
    val got = Multimodal.qImageDecode(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.nonEmpty)
  }
}
