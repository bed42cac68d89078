package graft.queries

import graft.core.Tables
import graft.functions.{Hash64, Kmv}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs before any
  * model sees a byte: deterministic dataset splitting and sketched
  * distinct counting. Both are map-dominant by design — the split is a
  * stateless projection (zero shuffle beyond the ordered write) and the
  * KMV sketch moves ≤ k longs per (group × partition) — so they are the
  * operators that survive a 100-TB corpus unchanged.
  *
  * All outputs are integer/string-typed: exact on both engines, no
  * rounding. Hash identity is [[Hash64.md5_64]] (same scheme as the
  * dedup battery), replayed in DuckDB as unsigned HUGEINT.
  */
object CurationQueries {

  /** KMV sketch size: k smallest distinct hashes per group. */
  private val K = 64

  /** (K-1) * 2^32 — the estimator numerator over the TOP-32 bits of the
    * k-th minimum hash. Working in the top-32-bit domain keeps the
    * estimate in exact BIGINT integer division on both engines (a
    * double division would double-round differently than DuckDB's
    * HUGEINT floor-div); the truncation costs < 1 part in 2^32 of
    * estimator precision — noise next to KMV's own ~1/sqrt(k) error. */
  private val Numer = (K - 1).toLong << 32

  /** Deterministic train/val/test assignment: split = f(salt, doc_id)
    * only — stable under corpus growth (a doc's split never changes
    * when other docs arrive, unlike percentile- or random()-based
    * splits), reproducible across engines, and map-only (the 100-TB
    * plan is scan → project → write; no exchange, no state).
    * 80/10/10 by pmod(hash, 100). Reference has no split op; this is
    * the training-pipeline brief (dataset curation). */
  def qSampleSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = Hash64.md5_64(concat(lit("split|"), col("doc_id").cast("string")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), h.as("h"),
        pmod(h, lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .orderBy(col("doc_id"))
  }

  /** Per-language distinct word-3-shingle count (the statistic that
    * sizes a MinHash dedup pass): exact countDistinct (verification
    * tier — shuffles the full distinct set) next to the [[Kmv]]
    * bottom-k sketch (scale tier — ≤ K longs per group × partition).
    * kth_hash is the sketch's largest retained hash (signed view),
    * est_distinct the KMV estimate (exact when the group has < K
    * distinct shingles). Shingling is the dedup battery's scheme
    * ([[DedupQueries.shingleHashes]]): per-row `transform`, hashed
    * map-side, so shingle strings never enter an exchange. The oracle
    * replays the sketch as the rank-K row over the distinct hashes,
    * so the bounded Aggregator is hash-checked bit-for-bit. */
  def qDistinctKmv(spark: SparkSession, dir: String): DataFrame = {
    // source = the dedup battery's MATERIALIZED shingle store
    // (DedupQueries.minhashStore, staged once per input dir through the
    // bucketed feature-store sink): the 3-shingle md5 pass is shared
    // with q_minhash_lsh instead of recomputed here — the same
    // Hash64.md5_64 domain the oracle replays. lang attaches by joining
    // the narrow doc_id → lang projection (size-based broadcast at gate
    // scale, shuffle equi-join at corpus scale).
    val (sh, _) = DedupQueries.minhashStore(spark, dir)
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val hashes = sh.join(langs, "doc_id")
      .select(col("lang"), col("shh").as("h"))
    val nk = size(col("ks"))
    hashes.groupBy(col("lang"))
      .agg(countDistinct(col("h")).as("n_exact"),
        Kmv.sketch(K)(col("h")).as("ks"))
      .select(col("lang"), col("n_exact"),
        element_at(col("ks"), nk).as("kth_hash"),
        when(nk < K, nk.cast("long"))
          .otherwise(expr(s"$Numer div greatest(" +
            s"shiftrightunsigned(element_at(ks, $K), 32), 1L)"))
          .as("est_distinct"))
      .orderBy(col("lang"))
  }

  /** TF-IDF keyword extraction, exact-integer variant: top-3 terms per
    * doc by score = tf · (10^12 div df) — rank-equivalent to the
    * classical tf·(N/df) for any fixed corpus (N is a constant factor)
    * but computed entirely in BIGINT integer division, so the ranking
    * cannot flip on a last-ulp libm difference between engines (ln()
    * differs across libms; an exact-integer monotone surrogate makes
    * the top-k hash-checkable). Ties break on term ascending. Plan:
    * explode → partial-agg tf → df agg → term equi-join (size-based
    * broadcast at gate scale, shuffle join at corpus scale) → per-doc
    * top-3 window. */
  def qTfidfTopterms(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score", expr("tf * (1000000000000L div df)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"),
        col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  // ---------------------------------------------------------------------

  private val U63 = BigInt(1) << 63
  private val U64 = BigInt(1) << 64

  /** HUGEINT [0, 2^64) → signed BIGINT (two's complement). */
  private def signed(x: String): String =
    s"(CASE WHEN $x >= $U63 THEN $x - $U64 ELSE $x END)::BIGINT"

  /** [[Hash64.md5_64]] dual in unsigned HUGEINT domain. */
  private def md5u64(e: String): String =
    s"(('0x' || substr(md5($e), 1, 16))::UBIGINT)::HUGEINT"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_split" -> (qSampleSplit _),
    "q_distinct_kmv" -> (qDistinctKmv _),
    "q_tfidf_topterms" -> (qTfidfTopterms _))

  val oracle: Map[String, String] = Map(
    "q_sample_split" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    ${signed(md5u64("'split|' || doc_id::VARCHAR"))} AS h
         |  FROM documents),
         |b AS (SELECT doc_id, lang, h, ((h % 100) + 100) % 100 AS bucket
         |      FROM s)
         |SELECT doc_id, lang, h, bucket,
         |  CASE WHEN bucket < 80 THEN 'train'
         |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "q_distinct_kmv" ->
      s"""WITH t AS (
         |  SELECT lang, string_split(text, ' ') AS ws FROM documents),
         |g AS (
         |  SELECT lang, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh
         |  FROM t, unnest(generate_series(1, len(ws) - 2)) AS u(i)),
         |w AS (SELECT DISTINCT lang, ${md5u64("sh")} AS hu FROM g),
         |r AS (
         |  SELECT lang, hu,
         |    row_number() OVER (PARTITION BY lang ORDER BY hu) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS nd
         |  FROM w)
         |SELECT lang, nd AS n_exact, ${signed("hu")} AS kth_hash,
         |  CASE WHEN nd < $K THEN nd
         |       ELSE (${Numer}::HUGEINT
         |             // greatest(hu // 4294967296, 1))::BIGINT END
         |    AS est_distinct
         |FROM r WHERE rk = least(nd, $K)
         |ORDER BY lang""".stripMargin,
    "q_tfidf_topterms" ->
      """WITH w AS (
        |  SELECT doc_id, u.word AS term
        |  FROM documents, unnest(string_split(text, ' ')) AS u(word)),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    tf.tf * (1000000000000 // df.df) AS score
        |  FROM tf JOIN df USING (term)),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, rk, term, tf, df, score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)
}
