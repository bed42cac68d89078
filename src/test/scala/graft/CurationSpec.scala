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
}
