package graft.pipeline

import graft.operators.{AsOf, Sessionize, Windows}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship end-to-end pipeline (north rule): point-in-time / as-of
  * join + windowed feature transform over (entity, ts, value) sequence
  * points — sessionize → anchored rolling features (statistical moments +
  * HRV-style successive-difference features) → as-of join of each point
  * to the latest COMPLETED window → gap-aware backfill. One feature
  * vector per entity×timestamp.
  *
  * Zero temporal leakage by construction: a window's features become
  * visible at `window_start + wsize` (when the window closes), and the
  * backward as-of join only attaches rows with availability ts <= point
  * ts, so no feature ever sees a point later than the row it lands on.
  *
  * Scale notes (SURVEY.md §7.5): the per-entity layout shuffle happens
  * once (`repartitionByRange(entity, ts)`); window features use the
  * bucket-decomposed equi-groupBy (map-side combinable, no range-join
  * rescans); the as-of join is the union+running-last trick (one shuffle,
  * no join explosion); AQE splits skewed entities.
  */
object FeaturePipeline {

  /** @param wsize         window length (ts units)
    * @param wstep         window stride (ts units)
    * @param minWindowLen  windows with fewer points emit NULL features
    * @param sessionGap    gap threshold for sessionize / backfill gating
    * @param maxStaleness  as-of tolerance: a feature older than this is
    *                      not carried forward (gap-aware fill limit)
    * @param nativeAsOf    use the custom Catalyst merge operator
    *                      (plans.AsOfJoinNative) for stage 3 instead of
    *                      the union+window composition — identical
    *                      semantics (AsOfNativeSpec), sorts each side
    *                      separately instead of the interleaved union
    */
  final case class Config(wsize: Long, wstep: Long, minWindowLen: Long,
                          sessionGap: Long, maxStaleness: Option[Long],
                          nativeAsOf: Boolean = true)

  /** Stage 2 (scale path): two-level bucket rollup.
    *
    * Instead of exploding every point to its ⌈wsize/wstep⌉ overlapping
    * windows (shuffle volume = overlap·|points|), points first collapse
    * into TUMBLING buckets of width wstep — a map-side-combinable
    * groupBy producing |span|/wstep rows per entity — and each window
    * k then combines its R = wsize/wstep consecutive buckets. Shuffle
    * volume drops from overlap·|points| to ~|points|/avg_bucket_size +
    * R·|buckets|; at 100 TB that is the difference between reshuffling
    * the table R times over and reshuffling a per-mille-scale summary.
    *
    * Decomposability: count/sum/sumsq/min/max combine trivially. The
    * rmssd pair gate (both endpoints inside the window) decomposes by
    * PAIR LAG: a successive pair whose previous point sits L buckets
    * back is included in window k = b − j iff L <= j, so each bucket
    * carries cumulative-by-lag pair sums dcum[0..R−1] and window k
    * picks dcum[b − k] — exact slice semantics, no approximation.
    * (Equality with [[windowFeatures]] is asserted in PipelineSpec.)
    *
    * Requires wsize % wstep == 0 (integral overlap degree R).
    */
  def windowFeaturesRolled(points: DataFrame, entityCol: String,
                           tsCol: String, valueCol: String,
                           cfg: Config): DataFrame = {
    require(cfg.wsize % cfg.wstep == 0 && cfg.wsize >= cfg.wstep,
      "rolled path needs wsize = R * wstep, R >= 1")
    val r = (cfg.wsize / cfg.wstep).toInt
    val s = cfg.wstep
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    val we = Window.partitionBy(col(entityCol))
    val pts = points.select(col(entityCol), col(tsCol),
      col(valueCol).as("__v"),
      lag(col(tsCol), 1).over(w).as("__prev_ts"),
      (col(valueCol) - lag(col(valueCol), 1).over(w)).as("__d"),
      min(col(tsCol)).over(we).as("__first"),
      max(col(tsCol)).over(we).as("__last"))
    val b = floor((col(tsCol) - col("__first")) / s).cast("long")
    val prevB = floor((col("__prev_ts") - col("__first")) / s).cast("long")
    val lagB = (b - prevB).cast("int")

    // level 1: tumbling-bucket rollup (map-side combinable)
    val lagSums = (0 until r).flatMap { j =>
      Seq(
        sum(when(col("__lag").isNotNull && col("__lag") <= j,
          col("__d") * col("__d"))).as(s"__d2_$j"),
        sum(when(col("__lag").isNotNull && col("__lag") <= j, 1L))
          .as(s"__c_$j"))
    }
    val bucketAggs = Seq(
      count(lit(1)).as("__cnt"),
      sum(col("__v")).as("__s1"),
      sum(col("__v") * col("__v")).as("__s2"),
      min(col("__v")).as("__mn"),
      max(col("__v")).as("__mx"),
      first(col("__first")).as("__first"),
      first(col("__last")).as("__last")) ++ lagSums
    val buckets = pts
      .withColumn("__b", b)
      .withColumn("__lag", when(lagB <= r - 1, lagB))
      .groupBy(col(entityCol), col("__b"))
      .agg(bucketAggs.head, bucketAggs.tail: _*)

    // level 2: each bucket feeds its R windows (fan-out R on the SMALL
    // bucket table); j = b − k selects the lag-cumulative pair sums
    val kGridMax = floor((col("__last") - col("__first") - 1) / s)
    val fan = buckets.withColumn("__j",
      explode(sequence(lit(0), lit(r - 1))))
      .withColumn("__k", col("__b") - col("__j"))
      .where(col("__k") >= 0 && col("__k") <= kGridMax)
    val dSel = element_at(
      array((0 until r).map(j => col(s"__d2_$j")): _*), col("__j") + 1)
    val cSel = element_at(
      array((0 until r).map(j => col(s"__c_$j")): _*), col("__j") + 1)
    val perWindow = fan
      .withColumn("__dsel", dSel)
      .withColumn("__csel", cSel)
      .groupBy(col(entityCol), col("__k"))
      .agg(
        sum(col("__cnt")).as("n_points"),
        first(col("__first")).as("__first"),
        sum(col("__s1")).as("__S1"),
        sum(col("__s2")).as("__S2"),
        min(col("__mn")).as("__MN"),
        max(col("__mx")).as("__MX"),
        sum(col("__dsel")).as("__D2"),
        sum(col("__csel")).as("__C"))

    // full grid incl. empty windows, then minWindowLen gating — same
    // output contract as the direct path
    val grid = points.groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .where(col("__last") > col("__first"))
      .withColumn("__k", explode(sequence(lit(0L),
        floor((col("__last") - col("__first") - 1) / s).cast("long"))))
      .select(col(entityCol), col("__k"), col("__first"))
    val joined = grid.join(perWindow.drop("__first"),
      Seq(entityCol, "__k"), "left")
    val nOk = coalesce(col("n_points"), lit(0L)) >= cfg.minWindowLen
    val nP = col("n_points")
    joined.select(col(entityCol) +:
      (col("__first") + col("__k") * s).as("window_start") +:
      coalesce(col("n_points"), lit(0L)).as("n_points") +:
      Seq(
        when(nOk, col("__S1") / nP).as("f_mean"),
        when(nOk, sqrt(col("__S2") / nP -
          (col("__S1") / nP) * (col("__S1") / nP))).as("f_std"),
        when(nOk, col("__MN")).as("f_min"),
        when(nOk, col("__MX")).as("f_max"),
        when(nOk, sqrt(col("__D2") / col("__C"))).as("f_rmssd")): _*)
  }

  /** Stage 2 (reference path): per-(entity, window) features over the
    * anchored grid via per-point window explode. Integer-exact sums when
    * `value` is integral; rmssd counts only successive pairs fully
    * inside the window (numpy slice semantics). */
  def windowFeatures(points: DataFrame, entityCol: String, tsCol: String,
                     valueCol: String, cfg: Config): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol))
    val pts = points.select(col(entityCol), col(tsCol),
      col(valueCol).as("__v"),
      lag(col(tsCol), 1).over(w).as("__prev_ts"),
      (col(valueCol) - lag(col(valueCol), 1).over(w)).as("__d"))
    Windows.anchoredWindowsWith(pts, entityCol, tsCol,
      cfg.wsize, cfg.wstep, cfg.minWindowLen) { ws =>
      val inWin = col("__prev_ts").isNotNull && col("__prev_ts") >= ws
      val v = col("__v")
      Seq(
        (sum(v) / count(lit(1))).as("f_mean"),
        sqrt(sum(v * v) / count(lit(1)) -
          (sum(v) / count(lit(1))) * (sum(v) / count(lit(1))))
          .as("f_std"),
        min(v).as("f_min"),
        max(v).as("f_max"),
        sqrt(sum(when(inWin, col("__d") * col("__d"))) /
          sum(when(inWin, 1L))).as("f_rmssd"))
    }
  }

  /** Full pipeline over long-format points. Output: one row per input
    * point with session id, the attached feature vector, and its
    * provenance timestamp (`feature_ts` = when the window closed).
    *
    * @param checkpoint optional (root dir) — stages write/resume
    *                   checkpoints with per-partition lineage sidecars
    */
  def run(spark: SparkSession, points: DataFrame, entityCol: String,
          tsCol: String, valueCol: String, cfg: Config,
          checkpoint: Option[String] = None,
          numRangePartitions: Int = 0): DataFrame = {

    def stage(name: String)(df: => DataFrame): DataFrame = checkpoint match {
      case Some(root) => Pipeline.stage(spark, root, name)(df)
      case None => df
    }

    // Stage 1: layout + sessionize. ONE range shuffle on (entity, ts);
    // everything downstream is co-partitioned by entity.
    val laidPlan = stage("s1_sessionized") {
      val base =
        if (numRangePartitions > 0)
          points.repartitionByRange(numRangePartitions,
            col(entityCol), col(tsCol))
        else points.repartitionByRange(col(entityCol), col(tsCol))
      Sessionize.withSessionId(
        base.sortWithinPartitions(col(entityCol), col(tsCol)),
        entityCol, tsCol, cfg.sessionGap)
    }
    // Stage 1 feeds THREE consumers (window features, grid bounds, the
    // as-of left side); without a checkpoint the lazy plan would re-run
    // the explode+shuffle per consumer — persist instead (checkpointed
    // runs already re-read the materialized parquet).
    val laid =
      if (checkpoint.isDefined) laidPlan
      else laidPlan.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Stage 2: windowed features on the anchored per-entity grid — via
    // the bucket rollup whenever the grid is regular (wsize = R·wstep),
    // falling back to the per-point explode otherwise.
    val feats = stage("s2_features") {
      val wf =
        if (cfg.wsize % cfg.wstep == 0 && cfg.wsize >= cfg.wstep)
          windowFeaturesRolled(laid, entityCol, tsCol, valueCol, cfg)
        else windowFeatures(laid, entityCol, tsCol, valueCol, cfg)
      wf
        .where(col("n_points") >= 1) // empty grid slots carry no state
        .select(col(entityCol),
          (col("window_start") + cfg.wsize).as(tsCol), // availability ts
          col("window_start").as("win_start"),
          col("n_points").as("n"),
          col("f_mean").as("mean"), col("f_std").as("std"),
          col("f_min").as("vmin"), col("f_max").as("vmax"),
          col("f_rmssd").as("rmssd"))
    }

    // Stage 3: point-in-time join + staleness-gated carry-forward.
    stage("s3_vectors") {
      if (cfg.nativeAsOf) {
        // native operator drops the right keys; carry the availability
        // ts explicitly as payload for provenance
        val prefixed = feats.columns
          .filterNot(Set(entityCol, tsCol))
          .foldLeft(feats.withColumn("feature_ts", col(tsCol))) {
            (df, c) => df.withColumnRenamed(c, s"f_$c")
          }
        graft.plans.AsOfJoinNative.joinBackward(spark, laid, prefixed,
          entityCol, tsCol, cfg.maxStaleness)
      } else {
        AsOf.joinBackward(laid, feats, entityCol, tsCol,
          tolerance = cfg.maxStaleness, rightPrefix = "f_")
          .withColumnRenamed("f_ts", "feature_ts")
      }
    }
  }
}
