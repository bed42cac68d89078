package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Time-domain signal features (reference: pymhealth
  * src/mhealth/generic/timedom.py, heart/ppg.py, heart/qrs.py — SURVEY.md
  * §2.2/2.3). All are lag/lead `Column` expressions over a per-entity
  * ordered WindowSpec — pure codegen, no UDFs; the only shuffle is the one
  * range partitioning the caller already did for the entity sort.
  */
object TimeDomain {

  /** Central difference gradient with one-sided edges
    * (timedom.py:11-31): out[i] = (x[i+1]−x[i−1])/2, edges fall back to
    * forward/backward single difference. */
  def gradient(v: Column, w: WindowSpec): Column = {
    val prev = lag(v, 1).over(w)
    val next = lead(v, 1).over(w)
    when(prev.isNull && next.isNull, lit(0.0))
      .when(prev.isNull, next - v)   // first row: x[1]-x[0]
      .when(next.isNull, v - prev)   // last row:  x[n-1]-x[n-2]
      .otherwise((next - prev) / 2.0)
  }

  /** Zero-crossing flag (timedom.py:34-49): clamp |x|≤th to 0, then xor of
    * sign(x>0) between adjacent samples. First row = false. */
  def zeroCrossing(v: Column, threshold: Double, w: WindowSpec): Column = {
    val clamped = when(abs(v) <= threshold, 0.0).otherwise(v)
    val pos = clamped > 0.0
    val prevPos = lag(pos, 1).over(w)
    when(prevPos.isNull, lit(false)).otherwise(pos =!= prevPos)
  }

  /** |diff| term for line_length = Σ|x[i]−x[i−1]| (timedom.py:67-78);
    * aggregate with sum() — first row contributes nothing. */
  def absDiff(v: Column, w: WindowSpec): Column =
    abs(v - lag(v, 1).over(w))

  /** Successive difference x[i]−x[i−1] (NULL at first row). */
  def diff1(v: Column, w: WindowSpec): Column = v - lag(v, 1).over(w)

  /** slope_sum telescoped (ppg.py:28-42): Σ dx[i−w:i] == x[i]−x[i−w] for
    * w ≤ i < n−1, else 0. rn is the 1-based row_number over the same order;
    * n the partition row count. */
  def slopeSum(v: Column, wsize: Int, rn: Column, n: Column,
               w: WindowSpec): Column =
    when(rn > wsize && rn < n, v - lag(v, wsize).over(w)).otherwise(0.0)

  /** Centered moving average with zero-padded edges (qrs.py:19-22 —
    * convolve(x, ones(w)/w, 'same')): sum over rows
    * [i−⌈(w−1)/2⌉, i+⌊(w−1)/2⌋] divided by constant w (NOT avg — the
    * edge windows are shorter but the divisor stays w, replicating the
    * zero padding). */
  def movingAverage(v: Column, wsize: Int, wOrdered: WindowSpec): Column = {
    val lo = -math.ceil((wsize - 1) / 2.0).toInt
    val hi = math.floor((wsize - 1) / 2.0).toInt
    sum(v).over(wOrdered.rowsBetween(lo, hi)) / wsize.toDouble
  }

  /** Pan–Tompkins differentiator as shipped (qrs.py:12-16): the kernel
    * [1,2,0,−2,−1][:-4] truncates to [1] ⇒ x/8. Preserved bug-for-bug. */
  def ptDifferentiate(v: Column): Column = v / 8.0

  /** Strict local max (qrs.py:200-212): x[i−1] < x[i] > x[i+1]; false at
    * edges (no neighbor). */
  def isPeak(v: Column, w: WindowSpec): Column = {
    val prev = lag(v, 1).over(w)
    val next = lead(v, 1).over(w)
    prev.isNotNull && next.isNotNull && v > prev && v > next
  }

  /** Hjorth activity = var_pop(x) (timedom.py:81-94). Aggregate. */
  def hjorthActivity(v: Column): Column = var_pop(v)

  /** Hjorth mobility = sqrt(var_pop(grad)/var_pop(x)) (timedom.py:97-112).
    * Caller pre-computes the gradient column (needs a window). */
  def hjorthMobility(v: Column, grad: Column): Column =
    sqrt(var_pop(grad) / var_pop(v))

  /** Hjorth complexity = mobility(grad)/mobility(x) (timedom.py:133-148). */
  def hjorthComplexity(v: Column, grad: Column, grad2: Column): Column =
    sqrt(var_pop(grad2) / var_pop(grad)) / sqrt(var_pop(grad) / var_pop(v))
}
