package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-gate visibility for the streaming layer: run a real
  * Structured Streaming job to completion inside the query builder and
  * hand its materialized result to the same DuckDB oracle as the batch
  * dual. Through round 3 the streaming duals were spec-only
  * (StreamingSpec ≡ batch); this puts one on the hash gate.
  */
object StreamQueries {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val active = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile private var lastSink: Option[(SparkSession, String)] = None

  /** Exact dedup THROUGH THE STREAMING ENGINE: the documents table is
    * re-written as 8 parquet chunks and replayed as a file-source
    * stream 2 files per micro-batch, so the streaming aggregation
    * (groupBy content_hash → count + min doc_id) accumulates state
    * across 4 incremental batches; Trigger.AvailableNow drains the
    * backlog and the memory sink (complete mode) holds the final
    * aggregates. Deterministic by construction — streaming `count`/
    * `min` are batch-split-invariant, unlike first-arrival
    * dropDuplicates — so the output equals q_dedup_exact row-for-row
    * and shares its oracle semantics. Complete-mode state is the
    * bounded-reprocessing configuration; the unbounded-stream posture
    * (watermarked dropDuplicatesWithinWatermark, horizon-bounded
    * state) is the StreamOps.dedupStream dual, spec-verified. */
  def qDedupStream(spark: SparkSession, dir: String): DataFrame = {
    // invocation-keyed staging dir under a fixed per-process parent;
    // the parent is cleared only when THIS is the sole live invocation
    // (Bench re-runs must not accrete chunks, but a concurrent
    // invocation's in-flight replay dir must not be yanked either)
    val seq = sinkSeq.incrementAndGet()
    val root = {
      val parent = new org.apache.hadoop.fs.Path(
        System.getProperty("java.io.tmpdir"), "graft_dedup_stream")
      val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (active.incrementAndGet() == 1) fs.delete(parent, true)
      new org.apache.hadoop.fs.Path(parent, s"run_$seq").toString
    }
    Tables.documents(spark, dir).repartition(8)
      .write.mode("overwrite").parquet(s"$root/in")
    val schema = Tables.documents(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(s"$root/in")
    val agg = stream
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("rep_doc"))
    // unique memory-sink name per invocation (the returned DataFrame
    // stays lazily readable after this builder returns); the previous
    // invocation's sink view is dropped so repeated runs don't accrete
    // — but only while its owning session is still alive (a stopped
    // ladder session's catalog throws; its view died with the session)
    lastSink.foreach { case (s, n) =>
      if (!s.sparkContext.isStopped)
        try s.catalog.dropTempView(n) catch { case _: Throwable => () }
    }
    val name = s"graft_dedup_stream_$seq"
    try {
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally active.decrementAndGet()
    lastSink = Some((spark, name))
    spark.table(name).orderBy(col("content_hash"))
  }

  val all: Map[String, CoreQueries.Q] = Map(
    "q_dedup_stream" -> (qDedupStream _))

  // identical semantics to the batch q_dedup_exact — deliberately the
  // same oracle text: the streaming engine must reproduce it exactly
  val oracle: Map[String, String] = Map(
    "q_dedup_stream" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS rep_doc
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)
}
