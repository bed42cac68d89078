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

  val all: Map[String, CoreQueries.Q] = Map(
    "q_embed_topk" -> (qEmbedTopk _),
    "q_embed_label_stats" -> (qEmbedLabelStats _)
  )

  val oracle: Map[String, String] = Map(
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
