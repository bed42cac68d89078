package graft.signal

/** PPG pulse-onset detection — physionet algorithm (Zong et al. 2003;
  * reference: pymhealth src/mhealth/heart/ppg.py — SURVEY.md §2.6). */
object Ppg {

  /** slope_sum (ppg.py:28-42): out[i] = Σ dx[i−w:i] for w <= i < n−1,
    * else 0 — telescopes to x[i] − x[i−w]. */
  def slopeSum(x: Array[Double], w: Int): Array[Double] = {
    val out = new Array[Double](x.length)
    var i = w
    while (i < x.length - 1) {
      out(i) = x(i) - x(i - w)
      i += 1
    }
    out
  }

  private def std(x: Array[Double], from: Int, until: Int): Double = {
    val n = until - from
    var s = 0.0
    var i = from
    while (i < until) { s += x(i); i += 1 }
    val m = s / n
    var v = 0.0
    i = from
    while (i < until) { v += (x(i) - m) * (x(i) - m); i += 1 }
    math.sqrt(v / n)
  }

  private def mean(x: Array[Double], from: Int, until: Int): Double = {
    var s = 0.0
    var i = from
    while (i < until) { s += x(i); i += 1 }
    s / (until - from)
  }

  private def median10(x: Array[Double]): Double = {
    val s = x.sorted
    (s(4) + s(5)) / 2.0
  }

  /** physionet_decision_rule (ppg.py:45-93): adaptive threshold from the
    * first 10 s (th = mean + 2σ; detect above th − σ initially, th − 2σ
    * after updates), 10-slot amplitude ring buffer re-thresholding via
    * median, eye-closing skip of 3·w150 − 1 samples after each onset;
    * the last 10 s are never scanned (reference's loop bound, :70);
    * optional backtracking preserved (default off, as the reference). */
  def physionetDecisionRule(x: Array[Double], samplingRate: Int,
                            backtracking: Double = 0.0): Array[Int] = {
    val n = x.length
    val warm = math.min(n, samplingRate * 10)
    var th = 2 * std(x, 0, warm) + mean(x, 0, warm)
    var thSubStd = th - std(x, 0, warm)
    // 150 ms in samples: the reference's int(sr / (1000/150)) is TRUE
    // division then trunc = floor(0.15·sr); Scala's 1000/150 would
    // integer-divide to 6 and give sr/6 (~0.167·sr) instead.
    val w150 = (samplingRate * 150) / 1000
    val onsets = Array.newBuilder[Int]
    var i = w150
    var j = 0
    var backtrack = 0
    var ampsIdx = 0
    val prevAmps = Array.fill(10)(th)
    while (i < n - samplingRate * 10) {
      if (x(i) > thSubStd) {
        var largest = i - w150
        var k = math.max(0, i - w150)
        val end = math.min(n, i + w150)
        var best = Double.NegativeInfinity
        while (k < end) {
          if (x(k) > best) { best = x(k); largest = k }
          k += 1
        }
        j = largest
        onsets += j
        i += 3 * w150 - 1
        ampsIdx = (ampsIdx + 1) % 10
        prevAmps(ampsIdx) = x(largest)
        th = median10(prevAmps)
        thSubStd = th - 2 * std(prevAmps, 0, 10)
        backtrack = j
      }
      i += 1
      if (backtracking != 0.0 && j < i - samplingRate * 10) {
        th = 3 * mean(x, j + samplingRate,
          math.min(n, j + samplingRate * 11))
        java.util.Arrays.fill(prevAmps, th)
        i = backtrack + w150
        backtrack += samplingRate * 5
      }
    }
    onsets.result()
  }

  /** Full PPG → onsets pipeline (pulse_onset_physionet, ppg.py:11-25):
    * bandpass 0.5–20 Hz → slope_sum(w150) → decision rule. */
  def pulseOnsetPhysionet(ppg: Array[Double], samplingRate: Int): Array[Int] = {
    val c = Butterworth.design(5,
      Seq(0.5 / (samplingRate / 2.0), 20.0 / (samplingRate / 2.0)),
      Butterworth.Bandpass)
    val w = (samplingRate * 150) / 1000
    physionetDecisionRule(
      slopeSum(Butterworth.filtfilt(c, ppg), w), samplingRate)
  }
}
