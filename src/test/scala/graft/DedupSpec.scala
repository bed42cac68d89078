package graft

import graft.queries.{DedupQueries, EmbedQueries}

/** LSH ANN quality: the bucketed top-k is a correct-by-construction
  * subset search; measure its recall against the exact brute force on
  * the driver test embeddings. */
class DedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("LSH top-k recall vs exact brute force; candidates honestly " +
    "bucket-restricted") {
    val exact = EmbedQueries.qEmbedTopk(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("a_id")),
        r.getLong(r.fieldIndex("b_id")))).toSet
    val ann = DedupQueries.qAnnLshTopk(spark, sf).collect()
      .map(r => (r.getLong(r.fieldIndex("a_id")),
        r.getLong(r.fieldIndex("b_id")))).toSet
    assert(exact.nonEmpty && ann.nonEmpty)
    val hits = ann.intersect(exact).size
    val recall = hits.toDouble / exact.size
    info(f"LSH recall@3 = $recall%.3f (${exact.size} exact pairs, " +
      f"${ann.size} ann pairs)")
    // multi-table LSH (L=16, k=4): expected recall ≈ 0.9 for the test
    // embeddings' neighbor distances (cos 0.3–0.43)
    assert(recall >= 0.5, f"recall $recall%.3f below the LSH design point")
  }

  test("simhash banding is lossless: banded pairs == brute-force pairs " +
    "at Hamming <= 2 (pigeonhole over 6/5/5-bit bands)") {
    // one query run: pairs AND the per-doc fingerprint map both come
    // from the same collected rows (a_id/ha, b_id/hb columns)
    val rows = DedupQueries.qSimhash(spark, sf).collect()
    val got = rows.map(r => (r.getLong(r.fieldIndex("a_id")),
      r.getLong(r.fieldIndex("b_id")))).toSet
    val fps = rows.flatMap(r => Seq(
      r.getLong(r.fieldIndex("a_id")) -> r.getLong(r.fieldIndex("ha")),
      r.getLong(r.fieldIndex("b_id")) -> r.getLong(r.fieldIndex("hb"))))
      .toMap
    // any pair present in got must satisfy the distance bound…
    got.foreach { case (a, b) =>
      val d = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(d <= 2, s"pair ($a,$b) at hamming $d")
    }
    // …and every close pair among emitted docs must be in got (the
    // banding may never lose one — pigeonhole guarantee)
    val ids = fps.keys.toSeq.sorted
    for (i <- ids.indices; j <- i + 1 until ids.length) {
      val (a, b) = (ids(i), ids(j))
      if (java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 2)
        assert(got.contains((a, b)), s"banding lost close pair ($a,$b)")
    }
    info(s"${got.size} pairs, ${ids.size} docs cross-checked")
  }

  test("minhash LSH candidates contain every exact duplicate pair") {
    // exact dupes (same text) must collide in ALL bands => always
    // candidates => present in q_minhash_lsh output with jaccard 1.0
    val dupes = graft.core.Tables.documents(spark, sf)
      .selectExpr("md5(text) AS h", "doc_id")
      .collect().groupBy(_.getString(0)).values
      .filter(_.length > 1)
      .flatMap { g =>
        val ids = g.map(_.getLong(1)).sorted
        ids.combinations(2).map(p => (p(0), p(1)))
      }.toSet
    val found = DedupQueries.qMinhashLsh(spark, sf).collect()
      .map(r => ((r.getLong(r.fieldIndex("a_id")),
        r.getLong(r.fieldIndex("b_id"))),
        r.getDouble(r.fieldIndex("jaccard")))).toMap
    dupes.foreach { p =>
      assert(found.contains(p), s"exact dupe pair $p missed by LSH")
      assertClose(found(p), 1.0, s"jaccard of exact dupe $p")
    }
    info(s"${dupes.size} exact-duplicate pairs all recovered")
  }
}
