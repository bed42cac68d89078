package graft.signal

/** ECG R-peak detection — the Pan–Tompkins / Hamilton–Tompkins family
  * (reference: pymhealth src/mhealth/heart/qrs.py — SURVEY.md §2.6,
  * EP1 in §3). Pure array functions; distributed via
  * [[PerEntity.apply]] (per-entity sorted scan, the only operator class
  * in the engine that materializes a bounded per-entity array).
  */
object Qrs {

  /** Pan–Tompkins differentiator as shipped (qrs.py:12-16): the kernel
    * [1,2,0,−2,−1][:-4] truncates to [1], so the convolution reduces to
    * x/8. Preserved bug-for-bug. */
  def ptDifferentiate(x: Array[Double]): Array[Double] = x.map(_ / 8.0)

  /** convolve(x, ones(w)/w, mode='same'): centered mean, zero-padded
    * edges (qrs.py:19-22). */
  def movingAverage(x: Array[Double], w: Int): Array[Double] = {
    val lo = math.ceil((w - 1) / 2.0).toInt
    val hi = math.floor((w - 1) / 2.0).toInt
    Array.tabulate(x.length) { i =>
      var s = 0.0
      var j = math.max(0, i - lo)
      val end = math.min(x.length - 1, i + hi)
      while (j <= end) { s += x(j); j += 1 }
      s / w
    }
  }

  /** Bandpass 5–15 Hz → differentiate → square → MA(0.2·fs)
    * (filter_pan_tompkins, qrs.py:41-56). */
  def filterPanTompkins(ecg: Array[Double], fs: Double): Array[Double] = {
    val c = Butterworth.design(5,
      Seq(5.0 / (fs / 2), 15.0 / (fs / 2)), Butterworth.Bandpass)
    val f = ptDifferentiate(Butterworth.filtfilt(c, ecg)).map(v => v * v)
    movingAverage(f, (0.2 * fs).toInt)
  }

  /** Bandpass 3–25 Hz → |differentiate| → MA(0.08·fs)
    * (filter_hamilton_tompkins, qrs.py:107-113). */
  def filterHamiltonTompkins(ecg: Array[Double], fs: Double): Array[Double] = {
    val c = Butterworth.design(5,
      Seq(3.0 / (fs / 2), 25.0 / (fs / 2)), Butterworth.Bandpass)
    val f = ptDifferentiate(Butterworth.filtfilt(c, ecg)).map(math.abs)
    movingAverage(f, (0.08 * fs).toInt)
  }

  /** Strict local maxima indices (find_peaks, qrs.py:200-212). */
  def findPeaks(x: Array[Double]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 1
    while (i < x.length - 1) {
      if (x(i) > x(i - 1) && x(i) > x(i + 1)) out += i
      i += 1
    }
    out.result()
  }

  /** Hamilton–Tompkins decision rule (qrs.py:116-197): 12-slot QRS and
    * noise peak buffers (both initialized to index 0, matching the
    * reference's zeros-init), adaptive threshold
    * dth = mean(fecg[noise]) + 0.3125·(mean(fecg[qrs]) − mean(fecg[noise])),
    * local-max-in-±200ms gate, both-gradients-in-±50ms baseline-drift
    * rejection, T-wave rejection within 360 ms via half-amplitude slope
    * comparison, and search-back acceptance at ≥1.5·avg RR with dth/2.
    *
    * Documented divergence: the reference slices with the FLOAT
    * `fs*0.05` inside is_twave (qrs.py:166-171), which raises under
    * numba nopython whenever that branch is reached; we use the intended
    * int truncation.
    */
  def decisionRuleHamiltonTompkins(fecg: Array[Double], peaks: Array[Int],
                                   fs: Double, buf: Int = 12,
                                   th: Double = 0.3125): Array[Int] = {
    val n = fecg.length
    val bufQrs = new Array[Int](buf)
    val bufNoise = new Array[Int](buf)
    var iQrs = 0
    var iNoise = 0
    var dth = 0.0
    var prevP = 0
    var nQrs = 0

    def localMaxima(p: Int, lim: Int): Boolean = {
      var mx = Double.NegativeInfinity
      var j = math.max(0, p - lim)
      val end = math.min(n, p + lim)
      while (j < end) { if (fecg(j) > mx) mx = fecg(j); j += 1 }
      fecg(p) >= mx
    }

    def bothGradients(p: Int): Boolean = {
      val lim = (fs * 0.05).toInt
      val start = math.max(0, p - lim)
      val end = math.min(n, p + lim)
      var pos = false
      var neg = false
      var i = start + 1
      while (i < end) {
        if (fecg(i) < fecg(i - 1)) neg = true
        else if (fecg(i) > fecg(i - 1)) pos = true
        if (pos && neg) return true
        i += 1
      }
      false
    }

    def maxDiff(center: Int, lim: Int): Double = {
      val start = math.max(0, center - lim)
      val end = math.min(n, center + lim)
      var mx = Double.NegativeInfinity
      var i = start + 1
      while (i < end) {
        val d = fecg(i) - fecg(i - 1)
        if (d > mx) mx = d
        i += 1
      }
      mx
    }

    def isTwave(p1: Int, p2: Int): Boolean = {
      val lim50 = (fs * 0.05).toInt
      p1 != 0 && (p2 - p1) < fs * 0.36 &&
        maxDiff(p2, lim50) < 0.5 * maxDiff(p1, lim50)
    }

    def sufficientTimeSinceRr(p1: Int, p2: Int): Boolean = {
      if (nQrs <= 1) return false
      val sorted = bufQrs.sorted
      var s = 0.0
      var i = 1
      while (i < buf) { s += sorted(i) - sorted(i - 1); i += 1 }
      val avgRr = s / (buf - 1)
      fecg(p2) > 0.5 * dth && p2 - p1 >= 1.5 * avgRr
    }

    def bufMean(b: Array[Int]): Double = {
      var s = 0.0
      var i = 0
      while (i < buf) { s += fecg(b(i)); i += 1 }
      s / buf
    }

    val out = Array.newBuilder[Int]
    peaks.foreach { p =>
      val isQrs = localMaxima(p, (fs * 0.2).toInt) &&
        ((fecg(p) > dth && bothGradients(p) && !isTwave(prevP, p)) ||
          sufficientTimeSinceRr(prevP, p))
      if (isQrs) {
        bufQrs(iQrs % buf) = p
        iQrs += 1
        out += p
        prevP = p
        nQrs += 1
      } else {
        bufNoise(iNoise % buf) = p
        iNoise += 1
      }
      dth = bufMean(bufNoise) + th * (bufMean(bufQrs) - bufMean(bufNoise))
    }
    out.result()
  }

  /** Full ECG → R-peak pipeline (rpeaks_hamilton_tompkins, qrs.py:59-104). */
  def rpeaksHamiltonTompkins(ecg: Array[Double], fs: Double): Array[Int] = {
    val fecg = filterHamiltonTompkins(ecg, fs)
    decisionRuleHamiltonTompkins(fecg, findPeaks(fecg), fs)
  }
}
