package graft

import graft.functions.Multimodal

/** Multimodal binary plumbing: deterministic fake decode, frame
  * sampling, per-frame kernel features — asserted against a local
  * recompute of the same bytes. */
class MultimodalSpec extends SparkSpec {

  test("blob structure is self-consistent and deterministic") {
    (0L until 20L).foreach { i =>
      val d = Multimodal.makeBlob(i)
      val w = d.media(4) & 0xff
      val h = d.media(8) & 0xff
      val f = d.media(12) & 0xff
      assert(d.n_bytes == 16 + w * h * f, s"doc $i size")
      assert(d.media.length == d.n_bytes)
      val again = Multimodal.makeBlob(i)
      assert(d.media.sameElements(again.media), s"doc $i determinism")
    }
  }

  test("distributed frame features match a local recompute") {
    implicit val s = spark
    val docs = Multimodal.mediaTable(spark, 30)
    val got = Multimodal.frameFeatures(docs).collect()
      .map(ff => (ff.doc_id, ff.frame) -> ff).toMap
    (0L until 30L).foreach { i =>
      val d = Multimodal.makeBlob(i)
      val w = d.media(4) & 0xff
      val h = d.media(8) & 0xff
      val frames = d.media(12) & 0xff
      (0 until frames).foreach { f =>
        val ff = got((d.doc_id, f))
        assert(ff.width == w && ff.height == h)
        val pixels = (0 until w * h)
          .map(p => d.media(16 + f * w * h + p) & 0xff)
        assertClose(ff.mean_px, pixels.sum.toDouble / (w * h),
          s"mean ${d.doc_id}/$f")
        assert(ff.max_px == pixels.max)
      }
    }
    assert(got.size == (0L until 30L).map(i =>
      Multimodal.makeBlob(i).media(12) & 0xff).sum)
  }

  /** A deterministic RGB test image: channel values are pure functions
    * of (x, y). Returns (png bytes, expected integer luma plane). */
  private def testPng(w: Int, h: Int): (Array[Byte], Array[Int]) = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val luma = new Array[Int](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7 + y * 13) % 256
      val g = (x * 31 + y * 3 + 100) % 256
      val b = (x * 5 + y * 41 + 200) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      luma(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "png encoder")
    (bos.toByteArray, luma)
  }

  test("REAL codec: a PNG decodes through the same kernels as the fake " +
    "(features + 2x2 resize), bit-exact vs a direct luma recompute") {
    implicit val s = spark
    import spark.implicits._
    val (png, luma) = testPng(13, 9) // odd dims: resize drops edge row/col
    val doc = Multimodal.MediaDoc("png_0", png, "image/png", png.length)
    // decode dispatch picks the imageio path off the PNG magic
    val dec = Multimodal.decode(doc)
    assert(dec.w == 13 && dec.h == 9 && dec.frames.length == 1)
    assert(dec.frames(0).sameElements(luma), "luma plane mismatch")
    // the DISTRIBUTED kernels on a real image
    val ds = spark.createDataset(Seq(doc))
    val ff = Multimodal.frameFeatures(ds).collect()
    assert(ff.length == 1)
    assertClose(ff(0).mean_px, luma.sum.toDouble / luma.length, "png mean")
    assert(ff(0).max_px == luma.max)
    var hsh = 1469598103934665603L
    luma.foreach(v => hsh = (hsh ^ v) * 1099511628211L)
    assert(ff(0).frame_hash == hsh, "png frame hash")
    val rf = Multimodal.resizedFeatures(ds).collect()
    assert(rf.length == 1 && rf(0).w2 == 6 && rf(0).h2 == 4)
    val cells = for (cy <- 0 until 4; cx <- 0 until 6) yield {
      val p = (2 * cy) * 13 + 2 * cx
      luma(p) + luma(p + 1) + luma(p + 13) + luma(p + 13 + 1)
    }
    assert(rf(0).pool_checksum == cells.map(_.toLong).sum)
    assertClose(rf(0).max_pooled, cells.max / 4.0, "png max pooled")
  }

  test("frame stride samples every k-th frame") {
    implicit val s = spark
    val docs = Multimodal.mediaTable(spark, 20)
    val all = Multimodal.frameFeatures(docs, 1).collect()
    val sampled = Multimodal.frameFeatures(docs, 2).collect()
    assert(sampled.forall(_.frame % 2 == 0))
    val expected = all.count(_.frame % 2 == 0)
    assert(sampled.length == expected)
  }
}
