package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Detrended fluctuation analysis (reference: pymhealth
  * src/mhealth/generic/timedom.py:196-235 — SURVEY.md §2.3).
  *
  * Semantics (order-1 detrend, as the reference default):
  *   profile = cumsum(x − mean(x)) per entity;
  *   for each window size w with step s = max(int(w·(100−overlap)/100), 1):
  *     count windows of the profile (trailing partials dropped),
  *     per window: OLS line fit residual SSR → rms = sqrt(SSR/w);
  *   F(w) = mean(rms); exponent = OLS-slope of log F on log w.
  *
  * Physical plan: one entity-window pass for the profile, then each row
  * explodes to its (w, k) window memberships — fan-out = Σ ceil(w/s) per
  * row, a QUERY CONSTANT (1 per size at overlap 0) — making the window
  * fold an equi-groupBy with map-side partial aggregation. SSR uses the
  * closed form Syy − Sxy²/Sxx (within-window x = 0..w−1), so the whole
  * thing is codegen'd aggregate arithmetic: no UDFs, no collects, two
  * shuffles total (entity layout + per-window groupBy).
  */
object Dfa {

  def exponent(points: DataFrame, entityCol: String, orderCol: String,
               valueCol: String, windows: Seq[Int],
               overlap: Double = 0.0): DataFrame = {
    require(windows.nonEmpty && windows.forall(_ >= 3))
    val we = Window.partitionBy(col(entityCol))
    val wOrd = we.orderBy(col(orderCol))
    val prof = points
      .withColumn("__mean", avg(col(valueCol)).over(we))
      .withColumn("__n", count(lit(1)).over(we))
      .withColumn("__p", sum(col(valueCol) - col("__mean"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__i", row_number().over(wOrd) - 1)

    // explode each profile row to its (w, k) memberships
    val wk = windows.map { w =>
      val s = math.max((w * (100.0 - overlap) / 100.0).toInt, 1)
      // row __i is in window k iff k*s <= __i < k*s + w and window fits:
      // k <= (N - w) / s  (trailing partials dropped)
      val kMax = least(floor((col("__i")) / s),
        floor((col("__n") - w) / s))
      val kMin = greatest(floor((col("__i") - w) / s) + 1, lit(0L))
      val ks = when(kMin.cast("long") <= kMax.cast("long"),
        sequence(kMin.cast("long"), kMax.cast("long")))
        .otherwise(array().cast("array<long>"))
      struct(lit(w).as("w"), lit(s).as("s"), ks.as("ks"))
    }
    val exploded = prof
      .withColumn("__wk", explode(array(wk: _*)))
      .withColumn("__k", explode(col("__wk.ks")))
      .select(col(entityCol), col("__wk.w").as("__w"),
        col("__k"),
        (col("__i") - col("__k") * col("__wk.s")).cast("double").as("__x"),
        col("__p").as("__y"))

    // per (entity, w, k): SSR = Syy − Sxy²/Sxx over (x, y)
    val g = exploded.groupBy(col(entityCol), col("__w"), col("__k")).agg(
      count(lit(1)).as("__m"),
      sum(col("__x")).as("__sx"), sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__y")).as("__sy"), sum(col("__y") * col("__y")).as("__syy"),
      sum(col("__x") * col("__y")).as("__sxy"))
    val m = col("__m")
    val cxx = col("__sxx") - col("__sx") * col("__sx") / m
    val cyy = col("__syy") - col("__sy") * col("__sy") / m
    val cxy = col("__sxy") - col("__sx") * col("__sy") / m
    val ssr = greatest(cyy - cxy * cxy / cxx, lit(0.0))
    val rms = g.select(col(entityCol), col("__w"),
      sqrt(ssr / col("__w")).as("__rms"))

    // F(w) = mean(rms); exponent = slope of log F over log w
    val fw = rms.groupBy(col(entityCol), col("__w"))
      .agg(avg(col("__rms")).as("__F"))
    fw.groupBy(col(entityCol)).agg(
      regr_slope(log(col("__F")), log(col("__w").cast("double")))
        .as("dfa_exponent"),
      count(lit(1)).as("n_window_sizes"))
  }
}
