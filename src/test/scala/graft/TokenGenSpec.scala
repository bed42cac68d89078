package graft

import graft.core.TokenGen
import org.apache.spark.sql.functions._

/** Generator parity vs the numpy mirror (tools/gen_fixtures.py →
  * fixtures/gen.json) plus the per-row token-array equality invariant
  * required by BASELINE.json input_hint. */
class TokenGenSpec extends SparkSpec {

  private val fx = fixture("gen")

  test("makeDoc matches the numpy mirror bit-for-bit") {
    val docs = fx.get("docs")
    (0 until docs.size()).foreach { k =>
      val d = docs.get(k)
      val i = d.get("i").asLong()
      val doc = TokenGen.makeDoc(i, skewed = false)
      assert(doc.doc_id == d.get("doc_id").asText(), s"doc_id($i)")
      assert(doc.n_tok == d.get("n_tok").asInt(), s"n_tok($i)")
      assert(doc.source == d.get("source").asText(), s"source($i)")
      assert(doc.tokens.length == doc.n_tok)
      val head = larr(d.get("tokens_head")).map(_.toInt)
      assert(doc.tokens.take(head.length).toSeq == head, s"tokens_head($i)")
      assert(doc.tokens.map(_.toLong).sum == d.get("tok_sum").asLong(),
        s"tok_sum($i)")
      assert(doc.tokens.min == d.get("tok_min").asInt(), s"tok_min($i)")
      assert(doc.tokens.max == d.get("tok_max").asInt(), s"tok_max($i)")
    }
  }

  test("skew knob: 1% of docs are 32x longer, per the mirror") {
    val sk = fx.get("skewed")
    (0 until sk.size()).foreach { k =>
      val i = sk.get(k).get("i").asLong()
      assert(TokenGen.nTok(i, skewed = true) == sk.get(k).get("n_tok").asInt())
      assert(TokenGen.nTok(i, skewed = true) ==
        TokenGen.nTok(i, skewed = false) * 32)
    }
  }

  test("distributed generation equals local materialization") {
    val rows = TokenGen.docs(spark, 50, numPartitions = 7).collect()
    assert(rows.length == 50)
    rows.foreach { doc =>
      val i = doc.doc_id.stripPrefix("doc_").toLong
      val local = TokenGen.makeDoc(i, skewed = false)
      assert(doc.tokens.sameElements(local.tokens), s"tokens($i)")
      assert(doc.n_tok == local.n_tok && doc.source == local.source)
    }
  }

  test("per-row invariant: n_tok = size(tokens); explode→regroup = source") {
    val docs = TokenGen.docs(spark, 40, numPartitions = 3).cache()
    val bad = docs.where(col("n_tok") =!= size(col("tokens"))).count()
    assert(bad == 0, "n_tok != size(tokens)")

    // Token-array equality gate (input_hint): re-collect the exploded view
    // ordered by ts and compare to the source array, every row.
    val regrouped = TokenGen.points(docs)
      .groupBy(col("entity_id"))
      .agg(transform(array_sort(collect_list(struct(col("ts"), col("value")))),
        s => s.getField("value").cast("int")).as("rebuilt"))
    val mismatches = docs
      .join(regrouped, col("doc_id") === col("entity_id"))
      .where(not(col("tokens") === col("rebuilt")))
      .count()
    assert(mismatches == 0, "exploded view does not round-trip to tokens")
    docs.unpersist()
  }
}
