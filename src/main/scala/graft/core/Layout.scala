package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers (SURVEY.md §7.1 "core.layout"): the one range
  * shuffle every per-entity pipeline starts with, the salting pattern
  * for skew-heavy entity aggregations, and the AQE presets the engine
  * assumes.
  */
object Layout {

  /** Range-partition by (entity, ts) and sort within partitions — the
    * canonical layout for window specs and merge scans. One shuffle;
    * everything ordered downstream reuses it. */
  def byEntityTime(df: DataFrame, entityCol: String, tsCol: String,
                   numPartitions: Int = 0): DataFrame = {
    val r =
      if (numPartitions > 0)
        df.repartitionByRange(numPartitions, col(entityCol), col(tsCol))
      else df.repartitionByRange(col(entityCol), col(tsCol))
    r.sortWithinPartitions(col(entityCol), col(tsCol))
  }

  /** Two-phase salted aggregation for hot keys: phase 1 groups on
    * (key, salt) — spreading a hot entity over `nSalts` reducers with
    * map-side combine — phase 2 merges the partials per key.
    *
    * @param partials commutative partial aggregates, e.g.
    *                 `Seq(count(lit(1)).as("n"), sum($"v").as("s"))`
    * @param merge    how to merge each partial column in phase 2, BY
    *                 NAME, e.g. `Map("n" -> sum _, "s" -> sum _)`
    * @param saltCols columns whose content derives the salt — pass a
    *                 stable unique key (e.g. event_id) when the data can
    *                 contain fully-duplicate rows: a whole-row hash maps
    *                 duplicates of a hot key onto ONE salt, defeating the
    *                 spread this helper exists for. Defaults to all
    *                 columns (fine for distinct-ish rows).
    */
  def saltedAgg(df: DataFrame, keyCol: String, nSalts: Int,
                partials: Seq[Column],
                merge: Map[String, Column => Column],
                saltCols: Seq[String] = Nil): DataFrame = {
    require(nSalts > 1)
    // Salt derives from stable row CONTENT, never from
    // monotonically_increasing_id(): an indeterminate salt re-assigns
    // rows to different (key, salt) groups when a stage is retried
    // after shuffle-fetch failure — the classic double-count/loss
    // hazard.
    val basis = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    val salted = df.withColumn("__salt",
      pmod(hash(basis.map(col): _*), lit(nSalts)))
    val phase1 = salted.groupBy(col(keyCol), col("__salt"))
      .agg(partials.head, partials.tail: _*)
    val mergeCols = phase1.columns
      .filterNot(Set(keyCol, "__salt")).toSeq
      .map(c => merge(c)(col(c)).as(c))
    phase1.groupBy(col(keyCol)).agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** AQE presets the engine is designed against (runtime coalescing,
    * skew-join splitting). Spark enables AQE by default in 4.x; this
    * pins the skew knobs explicitly for clusters that changed them. */
  def aqePresets(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
  }
}
