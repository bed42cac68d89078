package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** numpy-parity statistical aggregates (reference: pymhealth
  * src/mhealth/generic/stats.py — see SURVEY.md §2.3).
  *
  * Parity rules baked in:
  *  - std/var are POPULATION (ddof=0) — `stddev_pop`/`var_pop`, never sample.
  *  - skewness is biased g1 = m3/m2^1.5, 0 when variance is 0
  *    (stats.py:97-110); kurtosis is NON-excess B2 = m4/m2², 0 when var 0
  *    (stats.py:113-126); kurtosis_excess guard yields −3 (stats.py:129-139).
  *  - percentiles are exact linear-interpolation (numpy default) — Spark's
  *    exact `percentile`, NOT approx_percentile.
  *  - mode ties break to the SMALLEST value (stats.py:62-94).
  *
  * Higher moments are expressed through RAW moments (E[x^k]) so the DuckDB
  * oracle SQL can be written with the identical algebra — both engines then
  * agree to ~1e-12 relative, which survives the shared 6-dp rounding.
  * All of these are plain `Column` aggregate expressions: they stay inside
  * whole-stage codegen and work under groupBy OR window specs unchanged.
  */
object Stats {

  /** Central moment m_k from raw moments, k in 2..4. */
  def m2(v: Column): Column = avg(v * v) - pow(avg(v), 2)
  def m3(v: Column): Column =
    avg(v * v * v) - lit(3) * avg(v) * avg(v * v) + lit(2) * pow(avg(v), 3)
  def m4(v: Column): Column =
    avg(v * v * v * v) - lit(4) * avg(v) * avg(v * v * v) +
      lit(6) * pow(avg(v), 2) * avg(v * v) - lit(3) * pow(avg(v), 4)

  def varPop(v: Column): Column = var_pop(v)
  def stdPop(v: Column): Column = stddev_pop(v)

  /** drange = max − min (stats.py:34-45). */
  def drange(v: Column): Column = max(v) - min(v)

  /** IQR = p75 − p25, numpy linear interpolation (stats.py:48-59). */
  def iqr(v: Column): Column =
    percentile(v, lit(0.75)) - percentile(v, lit(0.25))

  def median(v: Column): Column = percentile(v, lit(0.5))

  /** Population skewness g1; 0 when variance is 0 (stats.py:97-110). */
  def skewnessPop(v: Column): Column = {
    val mm2 = m2(v)
    when(mm2 === 0.0, 0.0).otherwise(m3(v) / pow(mm2, 1.5))
  }

  /** Non-excess kurtosis B2 = m4/m2²; 0 when variance is 0
    * (stats.py:113-126). */
  def kurtosisNonExcess(v: Column): Column = {
    val mm2 = m2(v)
    when(mm2 === 0.0, 0.0).otherwise(m4(v) / (mm2 * mm2))
  }

  /** Excess kurtosis per reference semantics: kurtosis(x) − 3 including the
    * var=0 guard, so a constant series yields −3 (stats.py:129-139). */
  def kurtosisExcess(v: Column): Column = kurtosisNonExcess(v) - lit(3.0)

  /** Coefficient of variation = stddev_pop / mean (stats.py:142-153). */
  def coeffVar(v: Column): Column = stddev_pop(v) / avg(v)

  /** Shannon entropy of a value treated as a weight vector, with the
    * reference's epsilon-inside-the-sum form (information.py:10-20):
    * p_i = v_i/Σv + 1e-30; H = −Σ p ln p.
    * Two-pass by construction: caller supplies `total` (a window/group sum
    * column or a joined scalar). */
  def entropyTerm(v: Column, total: Column): Column = {
    val p = v / total + lit(1e-30)
    -(p * log(p))
  }
}
