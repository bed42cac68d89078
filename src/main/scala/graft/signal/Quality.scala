package graft.signal

/** Cardiac signal-quality scoring (reference: pymhealth
  * src/mhealth/heart/quality.py — SURVEY.md §2.6): each beat's slice
  * (±sr/2 around its peak) is Pearson-correlated against a ring buffer
  * of nearby beat slices; quality = mean correlation.
  *
  * Reference quirks preserved/documented:
  *  - the buffer fill and ring index hardcode 24 rows regardless of the
  *    `buf_size` parameter (quality.py:30,38) — preserved;
  *  - for early beats the buffer holds FUTURE beats 1..23 (filled before
  *    the scan) — preserved (it is look-ahead by construction);
  *  - the last beat's pad length uses `peaks[1]` where `peaks[-1]` was
  *    clearly intended (quality.py:41) — preserved, as for any signal
  *    with peaks[1]+sr/2 < n it reduces to the normal slice;
  *  - `beat_correlation_bi` (quality.py:46-101) contains a
  *    non-incrementing edge loop (infinite when peaks[0] <= sr/2), an
  *    index-by-peak-value store, and a stale-slice tail — we implement
  *    its INTERIOR semantics (max of prev-buffer and succ-buffer mean
  *    correlation) and document the divergence at the edges.
  */
object Quality {

  /** Mean/std-normalized dot product of each buffer row against y;
    * NaN rows propagate NaN (skipped by the nanmean caller);
    * zero-variance rows yield 0 (quality.py:7-19). */
  private def corrMulti(buf: Array[Array[Double]], y: Array[Double]): Array[Double] = {
    val m = y.length
    val ym = y.sum / m
    var yv = 0.0
    var i = 0
    while (i < m) { yv += (y(i) - ym) * (y(i) - ym); i += 1 }
    val ystdLen = math.sqrt(yv / m) * m
    buf.map { row =>
      if (row(0).isNaN) Double.NaN
      else {
        val rm = row.sum / m
        var rv = 0.0
        var s = 0.0
        var j = 0
        while (j < m) {
          rv += (row(j) - rm) * (row(j) - rm)
          s += (row(j) - rm) * (y(j) - ym)
          j += 1
        }
        val denom = math.sqrt(rv / m) * ystdLen
        if (denom == 0.0) 0.0 else s / denom
      }
    }
  }

  private def nanMean(xs: Array[Double]): Double = {
    var s = 0.0
    var n = 0
    xs.foreach(v => if (!v.isNaN) { s += v; n += 1 })
    if (n == 0) Double.NaN else s / n
  }

  /** Slice with zero fill outside the signal — keeps every buffer row at
    * exactly `until − from` samples (the reference instead requires all
    * buffered peaks to be interior; numpy would raise on a short row). */
  private def slice(x: Array[Double], from: Int, until: Int): Array[Double] = {
    val out = new Array[Double](until - from)
    var i = math.max(0, from)
    val end = math.min(x.length, until)
    while (i < end) { out(i - from) = x(i); i += 1 }
    out
  }

  /** Per-peak mean correlation vs the 24-slot beat ring buffer
    * (quality.py:22-43). Requires >= 24 peaks (as the reference's
    * unconditional fill loop does). */
  def beatCorrelation(x: Array[Double], peaks: Array[Int],
                      samplingRate: Int): Array[Double] = {
    require(peaks.length >= 24, "reference fill loop assumes >= 24 peaks")
    // odd sr would make slices 2·(sr/2) = sr−1 long vs sr-long buffer
    // rows (the reference's numpy row assignment would raise there too)
    require(samplingRate % 2 == 0, "samplingRate must be even")
    val hsr = samplingRate / 2
    val buf = Array.fill(24)(Array.fill(samplingRate)(Double.NaN))
    val quality = new Array[Double](peaks.length)

    for (i <- 1 until 24)
      buf(i) = slice(x, peaks(i) - hsr, peaks(i) + hsr)

    // first beat: zero-left-padded slice (reference quality.py:32-33)
    quality(0) = nanMean(corrMulti(buf,
      slice(x, peaks(0) - hsr, peaks(0) + hsr)))

    for (i <- 1 until peaks.length - 1) {
      val arr = slice(x, peaks(i) - hsr, peaks(i) + hsr)
      quality(i) = nanMean(corrMulti(buf, arr))
      buf(i % 24) = arr
    }

    // last beat: right-pad; the reference bounds the pad with peaks[1]
    // (quality.py:41) — preserved verbatim
    val last = peaks.last
    val aN = new Array[Double](samplingRate)
    val tail = slice(x, last - hsr,
      last + math.min(hsr, x.length - peaks(1)))
    System.arraycopy(tail, 0, aN, 0, math.min(tail.length, samplingRate))
    quality(peaks.length - 1) = nanMean(corrMulti(buf, aN))
    quality
  }

  /** Bidirectional variant, INTERIOR semantics (quality.py:46-101):
    * quality = max(mean corr vs previous buf_size beats, mean corr vs
    * following buf_size beats). Edge beats (first buf_size−1, and any
    * whose slice clips the signal) yield NaN here where the reference's
    * edge handling is non-terminating/ill-indexed. */
  def beatCorrelationBi(x: Array[Double], peaks: Array[Int],
                        samplingRate: Int, bufSize: Int = 12): Array[Double] = {
    val hsr = samplingRate / 2
    val n = x.length
    val quality = Array.fill(peaks.length)(Double.NaN)
    val prevBuf = Array.fill(bufSize)(Array.fill(samplingRate)(0.0))
    val succBuf = Array.fill(bufSize)(Array.fill(samplingRate)(0.0))
    for (i <- 1 until math.min(bufSize, peaks.length))
      succBuf(i) = slice(x, peaks(i) - hsr, peaks(i) + hsr)

    var i = math.min(bufSize, peaks.length) - 1
    while (i < peaks.length && peaks(i) + hsr <= n && peaks(i) > hsr) {
      val arr = slice(x, peaks(i) - hsr, peaks(i) + hsr)
      val prev = nanMean(corrMulti(prevBuf, arr))
      val succ = nanMean(corrMulti(succBuf, arr))
      quality(i) = math.max(prev, succ)
      prevBuf(i % bufSize) = arr
      if (i + bufSize < peaks.length &&
        peaks(i + bufSize) < n - samplingRate)
        succBuf(i % bufSize) =
          slice(x, peaks(i + bufSize) - hsr, peaks(i + bufSize) + hsr)
      else if (i + bufSize >= peaks.length)
        succBuf(i % bufSize) = Array.fill(samplingRate)(0.0)
      i += 1
    }
    quality
  }
}
