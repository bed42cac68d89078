package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Long-memory / fractal estimators (reference: pymhealth
  * src/mhealth/generic/timedom.py:238-299 — SURVEY.md §2.3).
  *
  * hurst: tau(l) = sqrt(stddev_pop(x[l:] − x[:−l])) for each lag l, then
  * H = 2 · OLS-slope of ln(tau) on ln(l) (the reference's o1fit,
  * timedom.py:262-279, as closed-form normal equations).
  *
  * Physical plan: the lag-difference pairs come from exploding each point
  * to (point, l) — a query-constant fan-out of (maxLag−minLag) — and one
  * equi self-join on (entity, rn − l); both sides hash-partition on
  * entity, the per-(entity, lag) moments reduce map-side, and the final
  * per-entity fit is a tiny second aggregate. No window rescans, no
  * driver collection; survives arbitrary entity counts.
  */
object Fractal {

  /** Hurst exponent per entity. Lags l in [minLag, maxLagExclusive) —
    * reference default arange(2, 64). */
  def hurst(points: DataFrame, entityCol: String, orderCol: String,
            valueCol: String, minLag: Int = 2,
            maxLagExclusive: Int = 64): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(orderCol))
    val pts = points.select(col(entityCol),
      col(valueCol).cast("double").as("__v"),
      row_number().over(w).as("__rn"))
    val lagged = pts.withColumn("__l",
      explode(sequence(lit(minLag), lit(maxLagExclusive - 1))))
    val base = pts.select(col(entityCol).as("__e2"),
      col("__rn").as("__rn2"), col("__v").as("__v2"))
    val diffs = lagged.join(base,
      col(entityCol) === col("__e2") &&
        col("__rn2") === col("__rn") - col("__l"))
      .select(col(entityCol), col("__l"), (col("__v") - col("__v2")).as("__d"))
    val tau = diffs.groupBy(col(entityCol), col("__l")).agg(
      count(lit(1)).as("__n"), sum(col("__d")).as("__s1"),
      sum(col("__d") * col("__d")).as("__s2"))
      .select(col(entityCol), log(col("__l").cast("double")).as("__lx"),
        log(sqrt(sqrt(col("__s2") / col("__n") -
          (col("__s1") / col("__n")) * (col("__s1") / col("__n"))))).as("__ly"))
    tau.groupBy(col(entityCol)).agg(
      count(lit(1)).as("__k"), sum(col("__lx")).as("__sx"),
      sum(col("__lx") * col("__lx")).as("__sxx"),
      sum(col("__ly")).as("__sy"),
      sum(col("__lx") * col("__ly")).as("__sxy"))
      .select(col(entityCol),
        ((col("__k") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__k") * col("__sxx") - col("__sx") * col("__sx")) * 2.0)
          .as("hurst"))
  }
}
