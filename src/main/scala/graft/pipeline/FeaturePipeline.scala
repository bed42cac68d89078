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
  * once (hash `repartition(entity)` + in-partition (entity, ts) sort —
  * the layout the sessionize window consumes exchange-free); window
  * features use the
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
    * @param tieCols       columns breaking (entity, ts) ordering ties in
    *                      the sessionize stage — pass the source's unique
    *                      id (e.g. event_id) whenever timestamps can
    *                      repeat per entity, or session assignment is
    *                      retry-nondeterministic (same hazard the
    *                      q_sessionize/q_backfill queries close)
    */
  final case class Config(wsize: Long, wstep: Long, minWindowLen: Long,
                          sessionGap: Long, maxStaleness: Option[Long],
                          nativeAsOf: Boolean = true,
                          tieCols: Seq[String] = Nil)

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

    // level 2: densify buckets to the full per-entity range, then
    // combine each window's R consecutive buckets as a SUM OF LEADS
    // window expression: window k (anchored at bucket k) takes bucket
    // k+j's stats — and its lag<=j cumulative pair sums — via lead(_, j).
    // Crucially this PRESERVES hash(entity) partitioning (groupBy on
    // (entity, k) would not), so the downstream as-of join needs no
    // exchange of either side. Dense rows make lead offsets == bucket
    // offsets even across empty buckets, and give empty windows their
    // grid row for free.
    val bounds = buckets.groupBy(col(entityCol)).agg(
      min(col("__first")).as("__first"), max(col("__last")).as("__last"))
      .where(col("__last") > col("__first"))
    val dense = bounds
      .withColumn("__b", explode(sequence(lit(0L),
        floor((col("__last") - col("__first")) / s).cast("long"))))
      .join(buckets.drop("__first", "__last"),
        Seq(entityCol, "__b"), "left")
    val wLead = Window.partitionBy(col(entityCol)).orderBy(col("__b"))
    def atJ(name: String, j: Int): Column =
      if (j == 0) col(name) else lead(col(name), j).over(wLead)
    def sumJ(f: Int => Column): Column =
      (0 until r).map(f).reduce(_ + _)
    val nPts = sumJ(j => coalesce(atJ("__cnt", j), lit(0L)))
    val s1 = sumJ(j => coalesce(atJ("__s1", j), lit(0.0)))
    val s2 = sumJ(j => coalesce(atJ("__s2", j), lit(0.0)))
    val mns = (0 until r).map(j => atJ("__mn", j))
    val mxs = (0 until r).map(j => atJ("__mx", j))
    val mn = if (r == 1) mns.head else least(mns: _*)
    val mx = if (r == 1) mxs.head else greatest(mxs: _*)
    val d2 = sumJ(j => coalesce(atJ(s"__d2_$j", j), lit(0.0)))
    val cEff = sumJ(j => coalesce(atJ(s"__c_$j", j), lit(0L)))
    val kGridMax = floor((col("__last") - col("__first") - 1) / s)
    val nOk = nPts >= cfg.minWindowLen
    dense.select(col(entityCol),
      (col("__first") + col("__b") * s).as("window_start"),
      col("__b"), kGridMax.as("__kmax"),
      nPts.as("n_points"),
      when(nOk, s1 / nPts).as("f_mean"),
      when(nOk, sqrt(s2 / nPts - (s1 / nPts) * (s1 / nPts))).as("f_std"),
      when(nOk, mn).as("f_min"),
      when(nOk, mx).as("f_max"),
      when(nOk && cEff > 0, sqrt(d2 / cEff)).as("f_rmssd"))
      .where(col("__b") <= col("__kmax"))
      .drop("__b", "__kmax")
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

    // Stage 1: layout + sessionize. ONE HASH shuffle on the entity:
    // the sessionize window requires ClusteredDistribution(entity), so
    // hash(entity) partitioning is reused exchange-free, and the
    // within-partition sort on (entity, ts, ties) satisfies the
    // window's required ordering. (Rounds 1–5 range-partitioned on
    // (entity, ts) first — but RangePartitioning(entity, ts) does NOT
    // satisfy the window's entity clustering (an entity can straddle a
    // range boundary), so Catalyst inserted a second full exchange
    // right after it: the physical plan shuffled every point TWICE
    // before the first window. Plan evidence:
    // plans/r06/flagship_s1_{before,after}.txt. Skew is unchanged — a
    // hot entity always lands in one window partition either way —
    // and guide §2.4 is the motivation: two operations keyed the same
    // way share one exchange.)
    val laidPlan = stage("s1_sessionized") {
      val base =
        if (numRangePartitions > 0)
          points.repartition(numRangePartitions, col(entityCol))
        else points.repartition(col(entityCol))
      Sessionize.withSessionId(
        base.sortWithinPartitions(
          col(entityCol) +: col(tsCol) +: cfg.tieCols.map(col): _*),
        entityCol, tsCol, cfg.sessionGap, tieCols = cfg.tieCols)
    }
    // Stage 1 feeds THREE consumers (window features, grid bounds, the
    // as-of left side); without a checkpoint the lazy plan would re-run
    // the explode+shuffle per consumer — persist instead (checkpointed
    // runs already re-read the materialized parquet).
    val laid =
      if (checkpoint.isDefined) laidPlan
      else graft.core.Caches.persisted(laidPlan,
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
