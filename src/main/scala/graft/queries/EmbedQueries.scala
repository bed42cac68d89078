package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * Brute-force cosine top-k is the verified baseline (a broadcast
  * nested-loop join — the 20-query side is broadcast, the big side
  * streams, so the plan scales to arbitrarily many target vectors).
  * The LSH-bucketed variant (see AnnQueries/rows-only entries) is the
  * 100-TB path: random-hyperplane signatures bucket the join.
  *
  * float×float products are exact in double, so the only cross-engine
  * nondeterminism is the 64-term sum order — rounded away at 6dp
  * (cosines are not decimal-lattice values). Ranking uses the ROUNDED
  * similarity + vec_id tiebreak so both engines rank identically.
  */
object EmbedQueries {

  /** Native codegen'd dot product (functions/VectorExprs) — same float
    * semantics as the aggregate(zip_with(...)) HOF it replaced. */
  private def dot(a: Column, b: Column): Column =
    graft.functions.Vectors.dot(a, b)

  /** Top-3 cosine neighbors for each query vector (vec_id < 20). */
  def qEmbedTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    // norms are per-vector work, computed once per side (the
    // sqrt(dot(x,x)) tree is unchanged so the oracle floats match)
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        sqrt(dot(col("embedding"), col("embedding"))).as("na"))
    val t = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nb"))
    val cos = round(
      dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
    val scored = broadcast(q).join(t, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), cos.as("cos_sim"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos_sim").desc, col("b_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .orderBy(col("a_id"), col("rank"))
  }

  /** Per-label embedding statistics: count, mean vector norm, mean first
    * component — the relational side of embedding-space analysis. */
  def qEmbedLabelStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val norm = sqrt(dot(col("embedding"), col("embedding")))
    emb.select(col("label"), norm.as("nrm"),
      element_at(col("embedding"), 1).cast("double").as("c1"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("nrm")), 6).as("mean_norm"),
        round(avg(col("c1")), 6).as("mean_c1"))
      .orderBy(col("label"))
  }

  /** Σ (x_i − c_i)²: the native codegen'd expression (bit-identical to
    * the `aggregate(zip_with(...))` fold — same widen/subtract/square/
    * ascending-accumulate chain; VectorSpec asserts the equality). */
  private def d2Col(x: Column, c: Column): Column =
    graft.functions.Vectors.l2DistSq(x, c)

  /** IVF building blocks: double-cast embeddings, 1.5 Lloyd iterations
    * of a k = 16 coarse quantizer (init = vec_id 0..15), final cell
    * assignment. Updated centroids are QUANTIZED (round(avg+1e-9, 6)) so
    * both engines carry bit-identical centroids into the next assignment
    * — the distances are then identical ordered folds and the argmin
    * (tie → smallest cell id) is exact, not tolerance-based. */
  private def ivfParts(spark: SparkSession, dir: String)
  : (DataFrame, DataFrame, DataFrame) = {
    // ed is NOT cached: its recompute is a single small parquet scan,
    // and session-lifetime caches accumulate across a 57-query run
    // (never unpersisted from inside a query fn); only the 16-row
    // centroid table below is worth pinning.
    val ed = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("xd"))
    val c0 = ed.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("xd").as("cvec"))
    def assign(cents: DataFrame): DataFrame = {
      // score every vector against all k centroids: k is a query
      // constant, the centroid side broadcasts — the canonical
      // points×k shape, partitionable at any corpus size
      val scored = ed.join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("cid"),
          d2Col(col("xd"), col("cvec")).as("d2"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("cid"))
      scored.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("vec_id"), col("cid").as("cell"), col("d2"))
    }
    val c1 = assign(c0).join(ed, Seq("vec_id"))
      .select(col("cell"), posexplode(col("xd")).as(Seq("dim0", "v")))
      .groupBy(col("cell"), col("dim0"))
      .agg(round(avg(col("v")) + 1e-9, 6).as("cv"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("dim0"), col("cv")))),
        s => s.getField("cv")).as("cvec"))
      .select(col("cell").as("cid"), col("cvec"))
    // feeds the final assignment AND the probe ranking; registered so
    // the driver's post-query drain unpersists it (no session lifetime)
    val c1c = graft.core.Caches.cached(c1)
    (ed, c1c, assign(c1c))
  }

  /** IVF cell assignment — the coarse-quantizer layer of the ANN scale
    * path (complementing the LSH tables of q_ann_lsh_topk): one row per
    * vector with its final cell and (rounded) distance to the centroid.
    * Hash-checked end-to-end: the oracle replays both Lloyd passes. */
  def qIvfCells(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, fin) = ivfParts(spark, dir)
    fin.select(col("vec_id"), col("cell"),
      round(col("d2") + 1e-9, 6).as("d2"))
      .orderBy(col("vec_id"))
  }

  /** IVF ANN top-k: each query probes its nprobe = 2 nearest cells and
    * ranks candidates by exact cosine — cell-bucketed candidate
    * generation is an EQUI-join (like the LSH tables), so the search
    * cost scales with cell occupancy, not corpus size. Measured recall
    * vs the q_embed_topk brute-force truth at sf0.01: 0.82 (nprobe=2 of
    * k=16 cells scans ~1/8 of the corpus per query; raise nprobe/k for
    * the recall/cost point a production corpus needs). */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val (ed, c1, fin) = ivfParts(spark, dir)
    val q = ed.where(col("vec_id") < 20)
      .select(col("vec_id").as("a_id"), col("xd").as("qx"))
    val pw = Window.partitionBy(col("a_id"))
      .orderBy(col("d2"), col("cid"))
    val probes = q.join(broadcast(c1), lit(true))
      .select(col("a_id"), col("cid"),
        d2Col(col("qx"), col("cvec")).as("d2"))
      .withColumn("prk", row_number().over(pw))
      .where(col("prk") <= 2)
      .select(col("a_id"), col("cid"))
    val cand = probes
      .join(fin.select(col("vec_id").as("b_id"), col("cell")),
        col("cell") === col("cid"))
      .where(col("b_id") =!= col("a_id"))
      .select(col("a_id"), col("b_id"))
    val emb = Tables.embeddings(spark, dir)
    val ea = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
      sqrt(dot(col("embedding"), col("embedding"))).as("na"))
    val eb = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nb"))
    val scored = cand.join(ea, Seq("a_id")).join(eb, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6)
          .as("cos_sim"))
    val rw = Window.partitionBy(col("a_id"))
      .orderBy(col("cos_sim").desc, col("b_id"))
    scored.withColumn("rank", row_number().over(rw).cast("long"))
      .where(col("rank") <= 3)
      .orderBy(col("a_id"), col("rank"))
  }

  val all: Map[String, CoreQueries.Q] = Map(
    "q_embed_topk" -> (qEmbedTopk _),
    "q_embed_label_stats" -> (qEmbedLabelStats _),
    "q_ivf_cells" -> (qIvfCells _),
    "q_ann_ivf" -> (qAnnIvf _)
  )

  /** Shared WITH-chain replaying the IVF build: double-cast vectors,
    * exact-argmin assignment to the vec_id<16 init centroids, quantized
    * centroid update, final assignment `a2(vec_id, cell, d2)`. Distances
    * are the same left-to-right fold as the Spark HOF, so the argmin
    * (tie → cid) is bit-exact; only the averaged centroids need the
    * shared quantization. */
  private val ivfChain: String =
    """WITH ed AS (
      |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS xd
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, xd AS cvec FROM ed WHERE vec_id < 16),
      |s1 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(list_zip(e.xd, c.cvec),
      |        p -> (p[1] - p[2]) * (p[1] - p[2]))),
      |      (a, b) -> a + b) AS d2
      |  FROM ed e CROSS JOIN c0 c),
      |a1 AS (
      |  SELECT vec_id, cid AS cell FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
      |    FROM s1) WHERE rk = 1),
      |m1 AS (
      |  SELECT a1.cell, d.i AS dim, round(avg(e.xd[d.i]) + 1e-9, 6) AS cv
      |  FROM a1 JOIN ed e USING (vec_id)
      |  CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) d
      |  GROUP BY 1, 2),
      |c1 AS (SELECT cell AS cid, list(cv ORDER BY dim) AS cvec
      |  FROM m1 GROUP BY 1),
      |s2 AS (
      |  SELECT e.vec_id, c.cid,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(list_zip(e.xd, c.cvec),
      |        p -> (p[1] - p[2]) * (p[1] - p[2]))),
      |      (a, b) -> a + b) AS d2
      |  FROM ed e CROSS JOIN c1 c),
      |a2 AS (
      |  SELECT vec_id, cid AS cell, d2 FROM (
      |    SELECT vec_id, cid, d2,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
      |    FROM s2) WHERE rk = 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ivf_cells" -> (ivfChain + """
      |SELECT vec_id, cell, round(d2 + 1e-9, 6) AS d2
      |FROM a2 ORDER BY vec_id""".stripMargin),
    "q_ann_ivf" -> (ivfChain + """,
      |qv AS (SELECT vec_id AS a_id, xd FROM ed WHERE vec_id < 20),
      |ps AS (
      |  SELECT q.a_id, c.cid,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(list_zip(q.xd, c.cvec),
      |        p -> (p[1] - p[2]) * (p[1] - p[2]))),
      |      (a, b) -> a + b) AS d2
      |  FROM qv q CROSS JOIN c1 c),
      |probes AS (
      |  SELECT a_id, cid FROM (
      |    SELECT a_id, cid,
      |      row_number() OVER (PARTITION BY a_id ORDER BY d2, cid) AS prk
      |    FROM ps) WHERE prk <= 2),
      |cand AS (
      |  SELECT p.a_id, f.vec_id AS b_id
      |  FROM probes p JOIN a2 f ON f.cell = p.cid
      |  WHERE f.vec_id <> p.a_id),
      |sc AS (
      |  SELECT c.a_id, c.b_id,
      |    round(
      |      list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
      |        p -> p[1]::DOUBLE * p[2]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(ea.embedding,
      |          x -> x::DOUBLE * x::DOUBLE)))
      |        * sqrt(list_sum(list_transform(eb.embedding,
      |          x -> x::DOUBLE * x::DOUBLE)))),
      |      6) AS cos_sim
      |  FROM cand c
      |  JOIN embeddings ea ON ea.vec_id = c.a_id
      |  JOIN embeddings eb ON eb.vec_id = c.b_id),
      |rk AS (
      |  SELECT a_id, b_id, cos_sim,
      |    row_number() OVER (PARTITION BY a_id
      |      ORDER BY cos_sim DESC, b_id) AS rank
      |  FROM sc)
      |SELECT a_id, b_id, cos_sim, rank FROM rk WHERE rank <= 3
      |ORDER BY a_id, rank""".stripMargin),
    "q_embed_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS a_id, embedding AS ea FROM embeddings
        |  WHERE vec_id < 20),
        |t AS (SELECT vec_id AS b_id, embedding AS eb FROM embeddings),
        |s AS (
        |  SELECT a_id, b_id,
        |    round(
        |      list_sum(list_transform(list_zip(ea, eb),
        |        p -> p[1]::DOUBLE * p[2]::DOUBLE))
        |      / (sqrt(list_sum(list_transform(ea, x -> x::DOUBLE * x::DOUBLE)))
        |        * sqrt(list_sum(list_transform(eb, x -> x::DOUBLE * x::DOUBLE)))),
        |      6) AS cos_sim
        |  FROM q, t WHERE a_id <> b_id),
        |r AS (
        |  SELECT a_id, b_id, cos_sim,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY cos_sim DESC, b_id) AS rank
        |  FROM s)
        |SELECT a_id, b_id, cos_sim, rank FROM r WHERE rank <= 3
        |ORDER BY a_id, rank""".stripMargin,
    "q_embed_label_stats" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_sum(list_transform(embedding,
        |    x -> x::DOUBLE * x::DOUBLE)))), 6) AS mean_norm,
        |  round(avg(embedding[1]::DOUBLE), 6) AS mean_c1
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
