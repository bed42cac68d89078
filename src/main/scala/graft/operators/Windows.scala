package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** The windowing engine (reference: pymhealth src/mhealth/util/windows.py —
  * SURVEY.md §2.1). Two window families:
  *
  * 1. COUNT windows (`view`/`rolling_apply`, windows.py:20-95): size w,
  *    step s over row positions; trailing partial windows are DROPPED;
  *    window count = (N−w)//s + 1.
  *
  * 2. TIME-ANCHORED windows (`get_indices`/`nonuniform_rolling_apply`,
  *    windows.py:162-220): the anchor grid starts at the entity's FIRST
  *    timestamp (NOT the epoch — Spark's `window()` is wrong here),
  *    `starts = arange(first, last, wstep)`, each window is
  *    [start, start+wsize) (searchsorted-left), and windows with fewer
  *    than `minWindowLen` points yield NULL features (reference: NaN,
  *    windows.py:153-156) — including completely empty grid windows.
  *
  * Scale strategy for overlapping time windows: instead of a range join
  * (which Spark would plan as equi-join + residual rescan), each point is
  * bucket-decomposed — exploded to the ≤ ⌈wsize/wstep⌉ window indices k
  * that contain it — turning the range join into an EQUI groupBy on
  * (entity, k). The fan-out factor is the window overlap degree, which is
  * a query constant, not data-dependent; partial aggregation (map-side
  * combine) collapses it before the shuffle.
  */
object Windows {

  /** Count-based windows. Emits one row per window anchor with the caller's
    * window aggregates evaluated over rows [anchor, anchor+wsize−1].
    *
    * @param aggs given the frame spec (already rowsBetween(0, wsize−1)),
    *             return named output columns, e.g.
    *             `spec => Seq(avg($"v").over(spec).as("mean"))`
    */
  def countWindows(df: DataFrame, entityCol: String, orderCol: String,
                   wsize: Int, wstep: Int,
                   aggs: WindowSpec => Seq[Column]): DataFrame = {
    val wOrd = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
    val frame = wOrd.rowsBetween(0, wsize - 1)
    val n = Window.partitionBy(col(entityCol))
    val rn0 = row_number().over(wOrd) - 1
    df.withColumn("__rn0", rn0)
      .withColumn("__n", count(lit(1)).over(n))
      .select(col(entityCol) +: col(orderCol) +: col("__rn0") +:
        col("__n") +: aggs(frame): _*)
      .where(col("__rn0") % wstep === 0 && col("__rn0") <= col("__n") - wsize)
      .withColumn("window_index", (col("__rn0") / wstep).cast("long"))
      .drop("__rn0", "__n")
  }

  /** Time-anchored grid windows over a LONG ts column.
    *
    * Output: one row per (entity, window_start) for the FULL grid, with
    * `n_points` (0 for empty windows) and the caller's aggregates, which
    * are NULLed when n_points < minWindowLen.
    *
    * @param aggs aggregate expressions over the point columns (groupBy
    *             form), e.g. `Seq(avg($"v").as("mean"))`; names preserved.
    */
  def anchoredWindows(points: DataFrame, entityCol: String, tsCol: String,
                      wsize: Long, wstep: Long, minWindowLen: Long,
                      aggs: Seq[Column]): DataFrame =
    anchoredWindowsWith(points, entityCol, tsCol, wsize, wstep,
      minWindowLen)(_ => aggs)

  /** Like [[anchoredWindows]], but the aggregate builder receives the
    * window-start column, so slice-exact aggregates can gate on it — e.g.
    * rmssd must only count successive-diff pairs whose BOTH points lie in
    * the window (prev_ts >= window_start), matching a numpy slice diff. */
  def anchoredWindowsWith(points: DataFrame, entityCol: String,
                          tsCol: String, wsize: Long, wstep: Long,
                          minWindowLen: Long)
                         (aggsOf: Column => Seq[Column]): DataFrame = {
    val aggs = aggsOf(col("__first") + col("__k") * wstep)
    require(wsize > 0 && wstep > 0)
    val we = Window.partitionBy(col(entityCol))
    val pts = points
      .withColumn("__first", min(col(tsCol)).over(we))
      .withColumn("__last", max(col(tsCol)).over(we))
    // window k covers ts iff k*wstep <= ts-first < k*wstep + wsize
    val off = col(tsCol) - col("__first")
    val kMax = floor(off / wstep)
    val kMin = greatest(floor((off - wsize) / wstep) + 1, lit(0L))
    // grid bound: starts strictly before last ts (arange semantics)
    val kGridMax = floor((col("__last") - col("__first") - 1) / wstep)
    // Guard: a point can fall past the last grid window (e.g. the final
    // point under tumbling windows) => kMin > cap, and Spark's sequence()
    // would generate a DESCENDING range instead of an empty one.
    val kMinL = kMin.cast("long")
    val kCapL = least(kMax, kGridMax).cast("long")
    val exploded = pts
      .withColumn("__k", explode(when(kMinL <= kCapL,
        sequence(kMinL, kCapL)).otherwise(array().cast("array<long>"))))
    val aggCols = count(lit(1)).as("n_points") +:
      first(col("__first")).as("__first") +: aggs
    val perWindow = exploded
      .groupBy(col(entityCol), col("__k"))
      .agg(aggCols.head, aggCols.tail: _*)

    // Full grid (covers empty windows): one row per entity × k in
    // [0, kGridMax]; tiny relative to points, built from the bounds agg.
    val grid = points.groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .where(col("__last") > col("__first"))
      .withColumn("__k", explode(sequence(lit(0L),
        floor((col("__last") - col("__first") - 1) / wstep).cast("long"))))
      .select(col(entityCol), col("__k"), col("__first"))

    val aggNames = perWindow.columns
      .filterNot(Set(entityCol, "__k", "n_points", "__first")).toSeq
    val joined = grid.join(
      perWindow.drop("__first"), Seq(entityCol, "__k"), "left")
    val outAggs = aggNames.map(a =>
      when(coalesce(col("n_points"), lit(0L)) >= minWindowLen, col(a))
        .as(a))
    joined.select(col(entityCol) +:
      (col("__first") + col("__k") * wstep).as("window_start") +:
      coalesce(col("n_points"), lit(0L)).as("n_points") +:
      outAggs: _*)
  }
}
