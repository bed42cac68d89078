package graft

import graft.functions.{Hash64, Kmv}
import graft.queries.CurationQueries
import org.apache.spark.sql.functions._

/** Corpus-curation operators: the KMV bottom-k sketch (vs brute force,
  * under adversarial partitionings, and its estimator bound) and the
  * deterministic hash split (disjoint/exhaustive, growth-stable,
  * approximately 80/10/10).
  */
class CurationSpec extends SparkSpec {

  private def bruteKth(values: Seq[Long], k: Int): Array[Long] =
    values.distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      .take(k).toArray

  // deterministic pseudo-random longs (splitmix stream, full 64-bit range)
  private def stream(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => graft.core.TokenGen.mix(seed + i))

  test("kmv sketch == brute-force bottom-k, any partitioning") {
    import spark.implicits._
    val vals = stream(5000, 7L) ++ stream(5000, 7L) // every value twice
    val expect = bruteKth(vals, 64)
    for (parts <- Seq(1, 7)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(Kmv.sketch(64)(col("h")).as("ks"))
        .collect()(0).getSeq[Long](0).toArray
      assert(got.sameElements(expect), s"parts=$parts")
    }
  }

  test("kmv handles groups smaller than k exactly") {
    import spark.implicits._
    val vals = stream(10, 3L)
    val got = vals.toDF("h").repartition(3)
      .agg(Kmv.sketch(64)(col("h")).as("ks"))
      .collect()(0).getSeq[Long](0).toArray
    assert(got.sameElements(bruteKth(vals, 64)))
    assert(got.length == 10)
  }

  test("kmv estimator lands within 4/sqrt(k) of the true distinct count") {
    import spark.implicits._
    // 20k distinct hashes (md5_64 of distinct strings — the query's
    // actual hash family), k = 64 → relative se ~ 1/8
    val n = 20000
    val df = (0 until n).map(i => s"shingle_$i").toDF("s")
      .select(Hash64.md5_64(col("s")).as("h"))
    val ks = df.agg(Kmv.sketch(64)(col("h")).as("ks"))
      .collect()(0).getSeq[Long](0)
    val uTop32 = ks.last >>> 32
    val est = (63L << 32) / uTop32
    assert(math.abs(est.toDouble / n - 1.0) < 0.5, s"est=$est n=$n")
  }

  test("tfidf top-terms: ≤3 rows/doc, scores non-increasing, " +
    "rank-equivalent to rational tf*idf") {
    val out = CurationQueries.qTfidfTopterms(spark, "/root/testdata/sf0.01")
      .collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.length <= 3, s"doc $doc has ${sorted.length} rows")
      assert(sorted.map(_.getLong(1)).sameElements(
        (1L to sorted.length)), s"doc $doc ranks not dense")
      // scores non-increasing in rank; ties broken by term ascending
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getLong(5), b.getLong(5))
          assert(sa > sb ||
            (sa == sb && a.getString(2) < b.getString(2)), s"doc $doc")
        case _ =>
      }
      // integer score is exactly tf * (1e12 div df)
      rows.foreach { r =>
        assert(r.getLong(5) == r.getLong(3) * (1000000000000L / r.getLong(4)))
      }
    }
  }

  test("hash split is disjoint, exhaustive, ~80/10/10, growth-stable") {
    val dir = "/root/testdata/sf0.01"
    val out = CurationQueries.qSampleSplit(spark, dir).cache()
    try {
      val n = out.count()
      assert(out.select("doc_id").distinct().count() == n)
      // buckets in range; split labels consistent with buckets
      assert(out.where(col("bucket") < 0 || col("bucket") > 99).count() == 0)
      val frac = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
      assert(math.abs(frac("train") - 0.8) < 0.08, frac)
      assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06, frac)
      assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, frac)
      // growth stability: the assignment of a doc is a pure function of
      // doc_id — recomputing over any subset agrees on shared ids
      val sub = CurationQueries.qSampleSplit(spark, dir)
        .where(col("doc_id") < 100).select("doc_id", "split")
      val joined = out.select(col("doc_id"), col("split").as("s0"))
        .join(sub, "doc_id")
      assert(joined.where(col("s0") =!= col("split")).count() == 0)
      assert(joined.count() == out.where(col("doc_id") < 100).count())
    } finally out.unpersist()
  }

  test("gopher repetition metrics replay a scala brute force exactly") {
    val sf = "/root/testdata/sf0.001"
    val texts = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = CurationQueries.qGopherRepetition(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val n = ws.length
      // top = max count, ties to the lexicographically greatest gram
      def top(gs: Array[String]): (Int, String) = {
        val byCnt = gs.groupBy(identity).view.mapValues(_.length)
        byCnt.map { case (g, c) => (c, g) }.max
      }
      val (twc, tw) = top(ws)
      val sumChars = ws.map(_.length).sum
      assert(r.getLong(r.fieldIndex("n_words")) == n)
      assert(r.getDouble(r.fieldIndex("ttr")) ==
        ws.distinct.length.toDouble / n)
      assert(r.getString(r.fieldIndex("top_word")) == tw)
      assert(r.getLong(r.fieldIndex("top_word_cnt")) == twc)
      assert(r.getDouble(r.fieldIndex("top_word_char_frac")) ==
        (twc * tw.length).toDouble / sumChars)
      val bgs = ws.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toArray
      val (tbc, tb) = top(bgs)
      assert(r.getString(r.fieldIndex("top_bigram")) == tb)
      assert(r.getLong(r.fieldIndex("top_bigram_cnt")) == tbc)
      assert(r.getDouble(r.fieldIndex("top_bigram_frac")) ==
        tbc.toDouble / (n - 1))
      val dupf = 1.0 - bgs.distinct.length.toDouble / (n - 1)
      assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == dupf)
      val ttr = ws.distinct.length.toDouble / n
      val twcf = (twc * tw.length).toDouble / sumChars
      assert(r.getBoolean(r.fieldIndex("keep")) ==
        (ttr >= 0.30 && twcf <= 0.10 && dupf <= 0.10))
    }
    // the plan is map-only before the ordered output: no aggregate, no
    // join — the 100-TB posture the scaladoc claims
    val plan = CurationQueries.qGopherRepetition(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "repetition filter grew a join")
    assert(!plan.toLowerCase.contains("hashaggregate"),
      "repetition filter grew an aggregate")
  }

  test("unigram logprob replays the corpus-LM brute force exactly") {
    val sf = "/root/testdata/sf0.001"
    val texts = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = texts.values.flatMap(_.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = counts.values.sum
    // math.round = floor(x+0.5) == Spark's HALF_UP for the non-negative
    // lattice values here (ln(T/c) >= 0)
    val rows = CurationQueries.qUnigramLogprob(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val nll = ws.map(w => math.round(
        math.log(t.toDouble / counts(w)) * 1000000.0 + 1.0e-3)).sum
      assert(r.getLong(r.fieldIndex("n_words")) == ws.length)
      assert(r.getLong(r.fieldIndex("nll_u6")) == nll,
        s"doc ${r.getLong(0)}")
      assert(r.getDouble(r.fieldIndex("mean_nll")) ==
        nll.toDouble / (ws.length * 1000000L))
    }
    // rare-word docs must score strictly higher than stereotyped ones:
    // monotone sanity of the filtering axis
    val scores = rows.map(r => r.getDouble(r.fieldIndex("mean_nll")))
    assert(scores.max > scores.min, "degenerate score distribution")
  }

  test("stratified sample balances languages and replays its hash rule") {
    val sf = "/root/testdata/sf0.001"
    val out = CurationQueries.qStratifiedSample(spark, sf).collect()
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val cLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val target = cLang.values.min
    // exact membership replay: pmod(md5_64("strat|"||id), c_lang) < target
    val expect = docs.filter { case (id, lang) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"strat|$id".getBytes("UTF-8"))
      val h = java.nio.ByteBuffer.wrap(md).getLong(0)
      val m = ((h % cLang(lang)) + cLang(lang)) % cLang(lang)
      m < target
    }.map(_._1).toSet
    assert(out.map(_.getLong(0)).toSet == expect, "membership diverged")
    // every language lands within 4·sqrt(target) of the target count
    val kept = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    cLang.keys.foreach { l =>
      assert(math.abs(kept.getOrElse(l, 0) - target) <=
        4 * math.sqrt(target.toDouble), s"$l: ${kept.get(l)} vs $target")
    }
  }

  test("source caps keep exactly the bottom-16 by unsigned hash per source") {
    val sf = "/root/testdata/sf0.001"
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(md).getLong(0)
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // brute force: per source, the <=16 docs with the smallest hashes
    // in UNSIGNED order (Kmv's retention order)
    val expect = docs.groupBy(_._2).flatMap { case (_, ds) =>
      ds.map(d => (h64(s"cap|${d._1}"), d._1))
        .sortWith((a, b) => java.lang.Long.compareUnsigned(a._1, b._1) < 0)
        .take(16).map(_._2).toSeq
    }.toSet
    val out = CurationQueries.qSourceCaps(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSet == expect, "kept set diverged")
    // every kept row's hash is <=u its source threshold, and each
    // source keeps min(16, n_src) docs
    val bySrc = out.groupBy(_.getString(1))
    val nSrc = docs.groupBy(_._2).view.mapValues(_.length).toMap
    bySrc.foreach { case (s, rows) =>
      assert(rows.length == math.min(16, nSrc(s)), s"$s cap count")
      rows.foreach { r =>
        assert(java.lang.Long.compareUnsigned(
          r.getLong(r.fieldIndex("h")), r.getLong(r.fieldIndex("kth"))) <= 0)
      }
    }
    // the 100-TB posture: the threshold comes from the bounded KMV
    // aggregator, NOT a per-source sort/window over the corpus
    val plan = CurationQueries.qSourceCaps(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cap grew an unbounded window")
  }

  test("chunk dedup replays a corpus-wide brute force exactly") {
    val sf = "/root/testdata/sf0.001"
    val texts = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(t: String): Seq[String] = {
      val ws = t.split(" ", -1)
      (0 to ws.length - 8 by 8).map(i => ws.slice(i, i + 8).mkString(" "))
    }
    val occ = texts.values.flatMap(chunksOf)
      .groupBy(identity).view.mapValues(_.size).toMap
    val rows = CurationQueries.qChunkDedup(spark, sf).collect()
    assert(rows.length == texts.size, "a doc row went missing")
    var dupTotal = 0L
    rows.foreach { r =>
      val cs = chunksOf(texts(r.getLong(0)))
      val nDup = cs.count(occ(_) >= 2)
      assert(r.getLong(r.fieldIndex("n_chunks")) == cs.length)
      assert(r.getLong(r.fieldIndex("n_dup")) == nDup)
      if (cs.nonEmpty) {
        assert(r.getDouble(r.fieldIndex("dup_frac")) ==
          nDup.toDouble / cs.length)
        assert(r.getBoolean(r.fieldIndex("keep")) ==
          (nDup.toDouble / cs.length <= 0.25))
      } else {
        assert(r.isNullAt(r.fieldIndex("dup_frac")))
        assert(r.isNullAt(r.fieldIndex("keep")))
      }
      dupTotal += nDup
    }
    assert(dupTotal > 0, "corpus has no duplicated chunks — degenerate")
  }

  test("chunk rewrite keeps exactly the globally-first chunk instances") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    // global first instance == lexicographically smallest (doc_id, p):
    // a single ordered sweep reproduces the argmin rule
    val seen = scala.collection.mutable.Set[String]()
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val nc = ws.length / 8
      val keptChunks = (0 until nc).flatMap { p =>
        val c = ws.slice(p * 8, p * 8 + 8)
        if (seen.add(c.mkString(" "))) Some((p, c)) else None
      }
      val tail = ws.drop(nc * 8)
      id -> (nc, keptChunks.length,
        (keptChunks.flatMap(_._2) ++ tail).mkString(" "))
    }.toMap
    val rows = CurationQueries.qChunkRewrite(spark, sf).collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val (nc, nKept, clean) = expect(r.getLong(0))
      assert(r.getLong(r.fieldIndex("n_chunks")) == nc)
      assert(r.getLong(r.fieldIndex("n_kept")) == nKept,
        s"doc ${r.getLong(0)}")
      assert(r.getString(r.fieldIndex("text_clean")) == clean,
        s"doc ${r.getLong(0)}")
    }
    // the corpus must actually exercise the drop path
    assert(expect.values.exists(v => v._2 < v._1),
      "no doc lost a chunk — degenerate corpus")
  }

  test("token budget keeps exactly the half-mass hash prefix per language") {
    val sf = "/root/testdata/sf0.001"
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(md).getLong(0)
    }
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    // brute force: ONE signed-order prefix sum per language (the naive
    // single window the two-level plan must reproduce exactly)
    val expect: Map[Long, (Long, Long)] =
      docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
        val budget = ds.map(_._3).sum / 2
        var cum = 0L
        ds.map(d => (h64(s"budget|${d._1}"), d._1, d._3))
          .sortBy(t => (t._1, t._2)).toSeq
          .flatMap { case (_, id, nt) =>
            val keep = cum < budget
            cum += nt
            if (keep) Some(id -> (cum - nt, budget)) else None
          }
      }.toMap
    val q = CurationQueries.qTokenBudget(spark, sf)
    val rows = q.collect()
    assert(rows.length == expect.size, "kept-set size diverged")
    rows.foreach { r =>
      val (cumB, budget) = expect(r.getLong(0))
      assert(r.getLong(r.fieldIndex("cum_before")) == cumB,
        s"doc ${r.getLong(0)} cum_before")
      assert(r.getLong(r.fieldIndex("budget")) == budget)
    }
    // rule is non-degenerate both ways: some docs kept, some dropped
    assert(rows.nonEmpty && rows.length < docs.length)
    // the big-side window must be bucket-partitioned (bounded fan-in):
    // every WindowExec over more than one partition key, none keyed by
    // lang alone except the 4096-row bucket-offset window
    val wins = q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.toString)
    }
    assert(wins.exists(_.length == 2),
      "doc-level window lost its bucket partition key")
  }

  test("source overlap matrix replays a brute-force chunk-set intersect") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    // per source: the set of distinct 8-word chunk STRINGS (hashing is
    // injective here, so string sets reproduce the hash-set counts)
    val sets: Map[String, Set[String]] = docs.groupBy(_._1).map {
      case (src, ds) =>
        src -> ds.flatMap { case (_, t) =>
          val ws = t.split(" ", -1)
          (0 until ws.length / 8).map(p =>
            ws.slice(p * 8, p * 8 + 8).mkString(" "))
        }.toSet
    }
    val srcs = sets.keys.toSeq.sorted
    val expect = (for {
      a <- srcs; b <- srcs if a < b
      shared = (sets(a) & sets(b)).size if shared > 0
    } yield (a, b) -> (shared.toLong, sets(a).size.toLong,
        sets(b).size.toLong)).toMap
    val rows = CurationQueries.qSourceOverlap(spark, sf).collect()
    assert(rows.length == expect.size, "pair-row count diverged")
    rows.foreach { r =>
      val (sh, na, nb) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == sh && r.getLong(3) == na && r.getLong(4) == nb,
        s"pair ${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(5) == sh.toDouble / math.min(na, nb))
    }
    assert(rows.nonEmpty, "no cross-source chunk sharing — degenerate")
  }

  // greedy left-to-right non-overlapping merge of (a, b) in syms
  private def bpeMergeOnce(syms: List[String], a: String, b: String)
  : List[String] = syms match {
    case x :: y :: rest if x == a && y == b =>
      (a + b) :: bpeMergeOnce(rest, a, b)
    case x :: rest => x :: bpeMergeOnce(rest, a, b)
    case Nil => Nil
  }

  private def bpeBrute(wf: Seq[(String, Long)], k: Int)
  : Seq[(Int, String, String, Long)] = {
    var vocab = wf.map { case (w, tf) => (w.split("").toList, tf) }
    (1 to k).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, tf) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + tf)
      }
      val ((a, b), cnt) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head
      vocab = vocab.map { case (syms, tf) => (bpeMergeOnce(syms, a, b), tf) }
      (r, a, b, cnt)
    }
  }

  test("BPE merge rounds replay a brute-force greedy trainer exactly") {
    val sf = "/root/testdata/sf0.001"
    val wf = graft.core.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expect = bpeBrute(wf, 3)
    val rows = CurationQueries.qBpeMerges(spark, sf).collect()
    assert(rows.length == 3)
    rows.zip(expect).foreach { case (r, (rd, a, b, cnt)) =>
      assert(r.getInt(0) == rd)
      assert(r.getString(1) == a && r.getString(2) == b,
        s"round $rd pair: got (${r.getString(1)},${r.getString(2)}) " +
          s"expected ($a,$b)")
      assert(r.getLong(3) == cnt, s"round $rd count")
      assert(r.getString(4) == a + b)
    }
  }

  test("BPE tokenize counts match a brute-force apply of the merges") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val wf = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val merges = bpeBrute(wf, 3)
    def segment(w: String): Int = {
      var syms = w.split("").toList
      merges.foreach { case (_, a, b, _) => syms = bpeMergeOnce(syms, a, b) }
      syms.length
    }
    val segCache = wf.map { case (w, _) => w -> segment(w) }.toMap
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      id -> (ws.length.toLong, ws.map(segCache(_).toLong).sum,
        ws.map(_.length.toLong).sum)
    }.toMap
    val rows = CurationQueries.qBpeTokenize(spark, sf).collect()
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (nw, nt, nc) = expect(r.getLong(0))
      assert(r.getLong(r.fieldIndex("n_words")) == nw, s"doc ${r.getLong(0)}")
      assert(r.getLong(r.fieldIndex("n_tokens")) == nt,
        s"doc ${r.getLong(0)} tokens")
      assert(r.getLong(r.fieldIndex("n_chars")) == nc)
      assert(r.getDouble(r.fieldIndex("chars_per_token")) ==
        nc.toDouble / nt)
    }
    // merges must actually compress: tokens < chars for some doc
    assert(expect.values.exists(v => v._2 < v._3),
      "no compression anywhere — merges did not apply")
  }

  test("BPE greedy rewrite handles overlapping runs (aaa + (a,a) -> aa,a)") {
    import spark.implicits._
    // 'aaaa' merges to aa,aa; 'aaa' to aa,a — the overlap case the
    // delimiter-wrapped replace must reproduce. Weight 'aaaa' so (a,a)
    // wins round 1, then (aa,aa) wins round 2 via the 'aaaa' words.
    val wf = Seq(("aaaa", 10L), ("aaa", 3L), ("ab", 1L)).toDF("w", "tf")
    val rows = graft.operators.Bpe.mergeRounds(wf, 2).collect()
    // round 1: pair (a,a) count = 10*3 + 3*2 = 36
    assert(rows(0).getString(1) == "a" && rows(0).getString(2) == "a")
    assert(rows(0).getLong(3) == 36L)
    // after rewrite: aaaa -> [aa,aa], aaa -> [aa,a], ab -> [a,b]
    // round 2 pairs: (aa,aa)=10, (aa,a)=3, (a,b)=1 -> (aa,aa) wins
    assert(rows(1).getString(1) == "aa" && rows(1).getString(2) == "aa")
    assert(rows(1).getLong(3) == 10L)
  }

  test("json props aggregation replays a scala json parse exactly") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "props").collect()
      .map(r => (r.getString(0),
        """-?\d+""".r.findFirstIn(r.getString(1)).get.toLong))
    val rows = graft.queries.CoreQueries.qJsonProps(spark, sf).collect()
    val byType = ev.groupBy(_._1)
    assert(rows.length == byType.size)
    rows.foreach { r =>
      val ks = byType(r.getString(0)).map(_._2)
      assert(r.getLong(r.fieldIndex("n")) == ks.length)
      assert(r.getLong(r.fieldIndex("n_parsed")) == ks.length)
      assert(r.getLong(r.fieldIndex("k_sum")) == ks.sum)
      assert(r.getLong(r.fieldIndex("k_min")) == ks.min)
      assert(r.getLong(r.fieldIndex("k_max")) == ks.max)
      assert(r.getDouble(r.fieldIndex("k_avg")) ==
        ks.sum.toDouble / ks.length)
    }
  }
}
