package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** HRV interval features (reference: pymhealth src/mhealth/heart/hrv.py —
  * SURVEY.md §2.3). The "nni" series is any per-entity ordered double
  * column; successive differences come from `lag` over the caller's entity
  * window. Population std everywhere (numpy ddof=0).
  */
object Hrv {

  private val invSqrt2 = 1.0 / math.sqrt(2.0)

  /** sdnn = stddev_pop(nni) (hrv.py:49-62). */
  def sdnn(nni: Column): Column = stddev_pop(nni)

  /** rmssd = sqrt(mean(diff²)) (hrv.py:138-146). diff column has NULL at the
    * first row, which avg() skips — matching numpy's n−1 diffs. */
  def rmssd(diff: Column): Column = sqrt(avg(diff * diff))

  /** ssd = Σ diff (telescopes to last−first, hrv.py:149-157). */
  def ssd(diff: Column): Column = sum(diff)

  /** sdsd = stddev_pop(diff) (hrv.py:160-169). */
  def sdsd(diff: Column): Column = stddev_pop(diff)

  /** pnnX = Σ(|diff| > x) / (n−1) with n = len(nni) (hrv.py:111-135). */
  def pnnx(diff: Column, x: Double): Column =
    sum(when(abs(diff) > x, 1).otherwise(0)) /
      (count(lit(1)) - lit(1)).cast("double")

  /** csi_sd1 = stddev_pop(diff)/√2 (hrv.py:207-217). */
  def csiSd1(diff: Column): Column = stddev_pop(diff) * invSqrt2

  /** csi_sd2 = stddev_pop(x[i]+x[i−1])/√2 (hrv.py:220-231). */
  def csiSd2(pairSum: Column): Column = stddev_pop(pairSum) * invSqrt2

  /** lorenz_csi = sd1/sd2 (hrv.py:234-243). */
  def lorenzCsi(sd1: Column, sd2: Column): Column = sd1 / sd2

  /** lorenz_cvi = log10(sd1·sd2) (hrv.py:246-250). */
  def lorenzCvi(sd1: Column, sd2: Column): Column = log10(sd1 * sd2)

  /** lorenz_mcsi = sd1²/sd2 (hrv.py:253-266). */
  def lorenzMcsi(sd1: Column, sd2: Column): Column = (sd1 * sd1) / sd2

  /** diff helper: nni − lag(nni) over the entity window. */
  def nniDiff(nni: Column, w: WindowSpec): Column = nni - lag(nni, 1).over(w)

  /** pair-sum helper for sd2: nni + lag(nni). */
  def nniPairSum(nni: Column, w: WindowSpec): Column =
    nni + lag(nni, 1).over(w)
}
