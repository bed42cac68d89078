package graft.signal

/** Sample entropy (reference: pymhealth src/mhealth/generic/information.py
  * :23-113 — SURVEY.md §2.3). Reimplemented from the definition the
  * reference's run-length algorithm computes (verified equivalent in
  * SignalSpec against the numpy mirror):
  *
  * with template length m (= reference `mm`, default 2), tolerance
  * r = rFactor·σ_pop (σ overridable), over template start positions
  * u < v in [0, n−m−1]:
  *   B = #{(u,v): max_{k<m}   |x[u+k]−x[v+k]| < r}
  *   A = #{(u,v): max_{k<m+1} |x[u+k]−x[v+k]| < r}
  * sampen = −ln(A/B).  O(n²) pairwise scan with early exit; intended for
  * bounded per-window/per-doc arrays (never a whole unbounded series).
  */
object SampEn {

  def sampen(x: Array[Double], mm: Int = 2, rFactor: Double = 0.2,
             sd: Option[Double] = None): Double = {
    val n = x.length
    if (n < mm + 2) return Double.NaN
    val sigma = sd.getOrElse {
      var s = 0.0
      var i = 0
      while (i < n) { s += x(i); i += 1 }
      val m = s / n
      var v = 0.0
      i = 0
      while (i < n) { v += (x(i) - m) * (x(i) - m); i += 1 }
      math.sqrt(v / n)
    }
    val r = rFactor * sigma
    var a = 0L
    var b = 0L
    val last = n - mm - 1 // template start bound (both A and B share it)
    var u = 0
    while (u <= last) {
      var v = u + 1
      while (v <= last) {
        var k = 0
        var ok = true
        while (ok && k < mm) {
          if (math.abs(x(u + k) - x(v + k)) >= r) ok = false
          k += 1
        }
        if (ok) {
          b += 1
          if (math.abs(x(u + mm) - x(v + mm)) < r) a += 1
        }
        v += 1
      }
      u += 1
    }
    if (b == 0 || a == 0) Double.NaN else -math.log(a.toDouble / b)
  }
}
