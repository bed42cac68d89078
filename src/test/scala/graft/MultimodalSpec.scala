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
