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
  private val activeByParent =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicInteger]()
  private val lastSinks =
    new java.util.concurrent.ConcurrentHashMap[
      String, (SparkSession, String)]()

  /** Invocation-keyed staging dir under a fixed per-process parent;
    * the parent is cleared only when THIS is the sole live invocation
    * of its query (Bench re-runs must not accrete replay chunks, but a
    * concurrent invocation's in-flight dir must not be yanked either).
    * Callers MUST pair with [[releaseStaging]]. */
  private def stagingRoot(spark: SparkSession, parentName: String,
                          seq: Int): String = {
    val parent = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"), parentName)
    val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ctr = activeByParent.computeIfAbsent(parentName,
      _ => new java.util.concurrent.atomic.AtomicInteger(0))
    if (ctr.incrementAndGet() == 1) fs.delete(parent, true)
    new org.apache.hadoop.fs.Path(parent, s"run_$seq").toString
  }

  private def releaseStaging(parentName: String): Unit =
    activeByParent.get(parentName).decrementAndGet()

  /** Run `body` (which starts and drains a streaming query) with the
    * session's shuffle partitions — and with them the streaming STATE
    * partition count, which unlike batch shuffles is NOT AQE-coalesced:
    * every micro-batch launches one task and one state-store delta file
    * per partition — set to the scale-adaptive `defaultParallelism`
    * (= cores locally, = executor slots on a cluster) instead of the
    * session's fixed batch value (128 here). For the bounded replay
    * harness the state is KBs; 128 partitions × batches of per-file
    * state-store open/commit/fsync was the dominant cost of both
    * streaming gate queries (guide §2.2: fewer, larger partitions). A
    * production stream sizes this to state volume instead — the knob
    * stays `spark.sql.shuffle.partitions` at stream start either way.
    * Restored before returning, so the batch plan downstream (and every
    * other query) still plans with the session's configured value. */
  private def withStreamStatePartitions[T](spark: SparkSession)
                                          (body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, spark.sparkContext.defaultParallelism)
    try body finally spark.conf.set(key, prev)
  }

  /** Run the chunk-write jobs in parallel (they are independent
    * map-only writes — guide §2.6 overlapping independent jobs), then
    * stamp each target file with a strictly increasing mtime IN CHUNK
    * ORDER: FileStreamSource replays by (modification time, path), and
    * sequential writes used to encode the order in mtimes as a side
    * effect — parallel completion order must not change the replay
    * order, so the stamp makes it explicit. */
  private def writeAllChunks(spark: SparkSession,
                             jobs: Seq[(() => Unit, String)]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(jobs.size, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val fs = scala.concurrent.Future.sequence(
        jobs.map { case (j, _) => scala.concurrent.Future(j()) })
      scala.concurrent.Await.result(fs,
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    val hconf = spark.sparkContext.hadoopConfiguration
    val base = System.currentTimeMillis() - jobs.size * 1000L
    jobs.map(_._2).zipWithIndex.foreach { case (target, i) =>
      val p = new org.apache.hadoop.fs.Path(target)
      p.getFileSystem(hconf).setTimes(p, base + i * 1000L, -1)
    }
  }

  /** Drop the previous invocation's memory-sink view (repeated runs
    * must not accrete temp views) — but only while its owning session
    * is still alive: a stopped ladder session's catalog throws, and
    * its view died with the session anyway. */
  private def dropPrevSink(key: String): Unit = {
    val prev = lastSinks.get(key)
    if (prev != null) {
      val (s, n) = prev
      if (!s.sparkContext.isStopped)
        try s.catalog.dropTempView(n) catch { case _: Throwable => () }
    }
  }

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
    val seq = sinkSeq.incrementAndGet()
    val root = stagingRoot(spark, "graft_dedup_stream", seq)
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
    // stays lazily readable after this builder returns)
    dropPrevSink("dedup")
    val name = s"graft_dedup_stream_$seq"
    try {
      withStreamStatePartitions(spark) {
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
    } finally releaseStaging("graft_dedup_stream")
    lastSinks.put("dedup", (spark, name))
    spark.table(name).orderBy(col("content_hash"))
  }

  /** Write `df` as ONE parquet file at `target` (a file path, not a
    * dir): the file-source replay needs one file per chunk so
    * maxFilesPerTrigger=1 delivers exactly one chunk per micro-batch,
    * in chunk order (FileStreamSource batches by modification time
    * with path tie-break; chunks are written sequentially AND named in
    * lexicographic chunk order, so both keys agree). */
  private def writeOneFile(df: DataFrame, target: String): Unit = {
    val stage = target + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(stage))
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file in $stage"))
    fs.rename(part, new org.apache.hadoop.fs.Path(target))
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }

  /** The POINT-IN-TIME AS-OF JOIN through the streaming engine — the
    * flagship operator's streaming dual on the hash gate (spec-only
    * through round 4): non-error events (left) and error events
    * (reference side) are each re-written as 4 TIME-RANGE chunks and
    * replayed as two file-source streams, 1 chunk per micro-batch, so
    * [[graft.streaming.StreamOps.streamingAsOf]]'s per-entity O(1)
    * reference state accumulates across 4 incremental batches. Because
    * the chunks partition TIME with shared boundaries on both streams,
    * every micro-batch delivers a complete closed ts range and the
    * in-order scan reproduces the batch backward-inclusive as-of join
    * exactly — the output is hash-compared to q_asof_join's DuckDB
    * `ASOF LEFT JOIN` oracle verbatim. The result is invariant to
    * WHERE the cuts fall (any shared time partition replays
    * identically), so the cuts come from one exact-percentile
    * aggregate over ts and each chunk write is a map-only filtered
    * scan — no global-order window, which would single-partition-sort
    * the whole table once per chunk write. The left point's `value`
    * slot carries event_id (the payload the batch query outputs);
    * ref_ts/ref_value surface as last_err_us/last_err_value. */
  def qAsofStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val seq = sinkSeq.incrementAndGet()
    val root = stagingRoot(spark, "graft_asof_stream", seq)
    try {
      val ev = Tables.events(spark, dir).select(
        col("user_id").cast("string").as("entity_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts"),
        col("event_type"), col("value"), col("event_id"))
      // 3 interior cuts = exact ts quartiles (longs below 2^53 are
      // exact in double); chunk k = [cut(k-1), cut(k)) with ±∞ rails —
      // every row lands in exactly one chunk even under heavy ties
      // (equal cuts just leave a middle chunk empty)
      val cuts = ev.agg(expr("percentile(ts, array(0.25, 0.5, 0.75))"))
        .head.getSeq[Double](0)
      val lo = Double.NegativeInfinity +: cuts
      val hi = cuts :+ Double.PositiveInfinity
      // the 8 chunk writes are independent map-only jobs — run them
      // concurrently and stamp replay order explicitly (writeAllChunks);
      // jobs are listed in per-source chunk order so the mtime stamp
      // reproduces the sequential write order exactly
      val chunkJobs: Seq[(() => Unit, String)] =
        (1 to 4).flatMap { k =>
          val inChunk = col("ts").cast("double") >= lo(k - 1) &&
            col("ts").cast("double") < hi(k - 1)
          val lTgt = s"$root/left/c$k.parquet"
          val rTgt = s"$root/right/c$k.parquet"
          Seq(
            (() => writeOneFile(ev
              .where(inChunk && col("event_type") =!= "error")
              .select(col("entity_id"), col("ts"),
                col("event_id").cast("double").as("value"),
                lit("ev").as("source")), lTgt), lTgt),
            (() => writeOneFile(ev
              .where(inChunk && col("event_type") === "error")
              .select(col("entity_id"), col("ts"), col("value"),
                lit("err").as("source")), rTgt), rTgt))
        }
      writeAllChunks(spark, chunkJobs)
      val sch = org.apache.spark.sql.Encoders.product[graft.core.SeqPoint]
        .schema
      def src(side: String) = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$root/$side").as[graft.core.SeqPoint]
      val enriched =
        graft.streaming.StreamOps.streamingAsOf(src("left"), src("right"))(spark)
      dropPrevSink("asof")
      val name = s"graft_asof_stream_$seq"
      withStreamStatePartitions(spark) {
        val q = enriched.writeStream.format("memory").queryName(name)
          .outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      lastSinks.put("asof", (spark, name))
      spark.table(name).select(
        col("entity_id").cast("bigint").as("user_id"),
        col("value").cast("bigint").as("event_id"),
        col("ref_value").as("last_err_value"),
        col("ref_ts").as("last_err_us"))
        .orderBy(col("user_id"), col("event_id"))
    } finally releaseStaging("graft_asof_stream")
  }

  val all: Map[String, CoreQueries.Q] = Map(
    "q_dedup_stream" -> (qDedupStream _),
    "q_asof_stream" -> (qAsofStream _))

  // identical semantics to the batch duals — deliberately the same
  // oracle texts: the streaming engine must reproduce them exactly
  val oracle: Map[String, String] = Map(
    "q_dedup_stream" ->
      """SELECT md5(text) AS content_hash, count(*) AS n_copies,
        |  min(doc_id) AS rep_doc
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q_asof_stream" -> CoreQueries.oracle("q_asof_join"))
}
