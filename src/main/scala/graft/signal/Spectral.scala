package graft.signal

import breeze.linalg.DenseVector
import breeze.math.Complex
import breeze.signal.{fourierTr, iFourierTr}

/** Frequency-domain features (reference: pymhealth src/mhealth/fft/,
  * src/mhealth/generic/frequency/ — SURVEY.md §2.8). FFT backend is
  * Breeze (the engine analog of the reference's FFTW-with-numpy-fallback
  * kernel substitution, SURVEY.md §4); the type-1 NUFFT follows the
  * Dutt–Rokhlin (1993) / Greengard–Lee (2004) Gaussian-gridding scheme
  * the reference uses (nufft.py:42-99). Verified against a DIRECT
  * non-uniform DFT oracle in numpy (independent of the fast algorithm).
  */
object Spectral {

  def fft(x: Array[Double]): Array[Complex] =
    fourierTr(DenseVector(x.map(Complex(_, 0)))).toArray

  def ifft(x: Array[Complex]): Array[Complex] =
    iFourierTr(DenseVector(x)).toArray

  /** Frequency grid for M bins: df·[−M/2, …, M − M/2) (nufftfreqs). */
  def nufftFreqs(m: Int, df: Double = 1.0): Array[Double] =
    Array.tabulate(m)(i => df * (i - m / 2))

  /** Dutt–Rokhlin oversampled-grid parameters from target precision. */
  private[signal] def gridParams(m: Int, eps: Double): (Int, Int, Double) = {
    require(eps > 1e-33 && eps < 1e-1, "eps must satisfy 1e-33 < eps < 1e-1")
    val ratio = if (eps > 1e-11) 2 else 3
    val msp = (-math.log(eps) / (math.Pi * (ratio - 1) / (ratio - 0.5))
      + 0.5).toInt
    val mr = math.max(ratio * m, 2 * msp)
    val tau = math.Pi * (msp / (ratio * (ratio - 0.5))) / (m.toDouble * m)
    (msp, mr, tau)
  }

  /** Type-1 NUFFT: F(k) = (1/N)·Σ_j c_j·e^{i·k·df·x_j} for the M
    * frequencies of [[nufftFreqs]], via Gaussian spreading onto an
    * oversampled uniform grid + one FFT + deconvolution. */
  def nufft1d1(x: Array[Double], c: Array[Double], m: Int,
               df: Double = 1.0, eps: Double = 1e-15): Array[Complex] = {
    val (msp, mr, tau) = gridParams(m, eps)
    val n = x.length
    val twoPi = 2 * math.Pi
    val hx = twoPi / mr

    // spread each sample's Gaussian onto the oversampled grid
    val grid = Array.fill(mr)(Complex(0, 0))
    val kernelTail = Array.tabulate(msp + 1)(j =>
      math.exp(-math.pow(math.Pi * j / mr, 2) / tau))
    var i = 0
    while (i < n) {
      val xiRaw = (x(i) * df) % twoPi
      val xi0 = if (xiRaw < 0) xiRaw + twoPi else xiRaw
      val cell = 1 + (xi0 / hx).toInt
      val xi = xi0 - hx * cell
      val e1 = math.exp(-0.25 * xi * xi / tau)
      val e2 = math.exp(xi * math.Pi / (mr * tau))
      var e2pow = 1.0
      var mm = 0
      while (mm < msp) {
        val up = Math.floorMod(cell + mm, mr)
        grid(up) += Complex(c(i) * e1 * e2pow * kernelTail(mm), 0)
        e2pow *= e2
        val down = Math.floorMod(cell - mm - 1, mr)
        grid(down) += Complex(c(i) * e1 / e2pow * kernelTail(mm + 1), 0)
        mm += 1
      }
      i += 1
    }

    // iflag >= 0 convention: inverse FFT (carries the 1/Mr scale)
    val spectrum = ifft(grid)
    val half = m / 2
    val reordered = new Array[Complex](m)
    for (j <- 0 until half) reordered(j) = spectrum(mr - half + j)
    for (j <- half until m) reordered(j) = spectrum(j - half)

    // deconvolve the Gaussian kernel
    val ks = nufftFreqs(m)
    Array.tabulate(m) { j =>
      reordered(j) * (math.sqrt(math.Pi / tau) *
        math.exp(tau * ks(j) * ks(j)) / n)
    }
  }

  /** first index with arr[i] >= x, else len (density.py:9-14). */
  def firstIndex(arr: Array[Double], x: Double): Int = {
    var i = 0
    while (i < arr.length) {
      if (x <= arr(i)) return i
      i += 1
    }
    arr.length
  }

  /** Σ|psd| over lower <= f <= upper, both inclusive (hrv.py:173-179). */
  def powerBand(psd: Array[Double], freqs: Array[Double],
                lower: Double, upper: Double): Double = {
    var s = 0.0
    var i = 0
    while (i < psd.length) {
      if (freqs(i) >= lower && freqs(i) <= upper) s += math.abs(psd(i))
      i += 1
    }
    s
  }

  /** argmax frequency within [lower, upper) — the offset-correct
    * density.py:17-32 variant (the hrv.py:182-189 sibling forgets the
    * lidx offset; divergence documented in SURVEY.md §2.3). */
  def peakFrequency(psd: Array[Double], freqs: Array[Double],
                    lower: Double, upper: Double): Double = {
    val lidx = firstIndex(freqs, lower)
    val uidx = math.min(firstIndex(freqs, upper), psd.length)
    if (lidx >= uidx) return Double.NaN // empty [lower, upper) band
    var best = lidx
    var i = lidx
    while (i < uidx) {
      if (psd(i) > psd(best)) best = i
      i += 1
    }
    freqs(best)
  }

  /** band power / total |psd| (hrv.py:192-198). */
  def relativePowerBand(psd: Array[Double], freqs: Array[Double],
                        lower: Double, upper: Double): Double =
    powerBand(psd, freqs, lower, upper) / psd.map(math.abs).sum
}
