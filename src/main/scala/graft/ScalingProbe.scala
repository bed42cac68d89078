package graft

import graft.operators.{AsOf, Sessionize}
import graft.pipeline.FeaturePipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall times of the flagship pipeline at a given
  * core count — locates the stage that fails to scale. Not part of the
  * driver contract. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val tokensPath = args.lift(1)
      .getOrElse("/tmp/graft_bench_tokens_20000")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_PARTS", "128").toInt)
      .config("spark.sql.adaptive.enabled", "true")
      // preserve cached-plan partitioning so the as-of join reuses the
      // entity layout instead of re-exchanging (Spark 4 default runs AQE
      // over caches, discarding their partitioning)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.storage.memoryMapThreshold",
        sys.env.getOrElse("PROBE_MMAP", "2m"))
      .config("spark.shuffle.file.buffer",
        sys.env.getOrElse("PROBE_BUF", "32k"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("PROBE_COMPRESS", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def points: DataFrame = spark.read.parquet(tokensPath)
      .select(col("doc_id").as("entity_id"),
        posexplode(col("tokens")).as(Seq("pos", "tok")))
      .select(col("entity_id"), col("pos").cast("long").as("ts"),
        col("tok").cast("double").as("value"))
    val cfg = FeaturePipeline.Config(64L, 32L, 4L, 8L, Some(128L))

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // untimed warm-up: codegen + JIT + shuffle paths
    FeaturePipeline.run(spark, points, "entity_id", "ts", "value", cfg)
      .write.format("noop").mode("overwrite").save()
    println("[probe] warm-up done")

    time("read+explode")(points)
    // no tieCols needed: token points have ts = position, unique per
    // entity by construction (ties are impossible); events-based callers
    // pass event_id (see PipelineQueries)
    time("sessionize")(Sessionize.withSessionId(
      points.repartitionByRange(col("entity_id"), col("ts"))
        .sortWithinPartitions(col("entity_id"), col("ts")),
      "entity_id", "ts", cfg.sessionGap))
    time("window_feats")(FeaturePipeline.windowFeatures(
      points, "entity_id", "ts", "value", cfg))
    val laid = points
    val feats = FeaturePipeline.windowFeatures(
      laid, "entity_id", "ts", "value", cfg)
      .where(col("n_points") >= 1)
      .select(col("entity_id"), (col("window_start") + cfg.wsize).as("ts"),
        col("f_mean"), col("f_std"))
    time("asof_only")(AsOf.joinBackward(laid, feats, "entity_id", "ts",
      cfg.maxStaleness, "f_"))
    time("asof_native")(graft.plans.AsOfJoinNative.joinBackward(
      spark, laid, feats.columns.filterNot(Set("entity_id", "ts"))
        .foldLeft(feats) { (df, c) => df.withColumnRenamed(c, s"f_$c") },
      "entity_id", "ts", cfg.maxStaleness))
    time("full")(FeaturePipeline.run(spark, points, "entity_id", "ts",
      "value", cfg))
    time("full_composed")(FeaturePipeline.run(spark, points, "entity_id",
      "ts", "value", cfg.copy(nativeAsOf = false)))
    spark.stop()
  }
}
