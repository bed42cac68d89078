package graft.signal

import breeze.math.Complex

/** Butterworth IIR filter design + zero-phase forward-backward filtering,
  * re-implemented from the published definitions to match scipy's
  * `butter` + `filtfilt` semantics (reference wraps scipy:
  * pymhealth src/mhealth/generic/filters.py:8-35 — SURVEY.md §2.6).
  *
  * Design path: analog Butterworth prototype poles → frequency pre-warp
  * (bilinear, fs=2) → lp2lp / lp2hp / lp2bp pole-zero transform →
  * bilinear z-transform → polynomial coefficients (b, a).
  *
  * Correctness oracle (no scipy in this environment): the bilinear
  * transform preserves the analytic Butterworth magnitude response
  * exactly at warped frequencies, so FiltersSpec checks
  * |H(e^jw)|² == 1/(1 + (tan(w/2)/tan(wc/2))^2N) pointwise — an
  * exact closed form, not a golden array.
  */
object Butterworth {

  final case class Coeffs(b: Array[Double], a: Array[Double])

  sealed trait FType
  case object Lowpass extends FType
  case object Highpass extends FType
  case object Bandpass extends FType

  /** Design an order-N digital Butterworth filter.
    * @param wn normalized cutoff(s) in (0, 1), 1 = Nyquist (scipy's Wn)
    */
  def design(order: Int, wn: Seq[Double], ftype: FType): Coeffs = {
    require(order >= 1 && wn.forall(w => w > 0 && w < 1))
    val fs = 2.0
    // analog prototype: poles -exp(j·pi·m/(2N)), m = -N+1, -N+3, ... N-1
    val proto = (0 until order).map { k =>
      val m = -order + 1 + 2 * k
      -Complex(math.cos(math.Pi * m / (2 * order)),
        math.sin(math.Pi * m / (2 * order)))
    }.toArray
    val warped = wn.map(w => 2.0 * fs * math.tan(math.Pi * w / fs))

    val (zeros, poles, gain) = ftype match {
      case Lowpass =>
        val wo = warped.head
        (Array.empty[Complex], proto.map(_ * wo),
          math.pow(wo, order))
      case Highpass =>
        val wo = warped.head
        val p = proto.map(Complex(wo, 0) / _)
        val z = Array.fill(order)(Complex(0, 0))
        // k_hp = k · real(prod(-z_proto)/prod(-p_proto)), prototype zeros empty
        (z, p, realProdRatio(Array.empty, proto))
      case Bandpass =>
        val Seq(wl, wh) = warped
        val bw = wh - wl
        val wo = math.sqrt(wl * wh)
        val pLp = proto.map(_ * (bw / 2))
        val p = pLp.flatMap { c =>
          val s = (c * c - Complex(wo * wo, 0)).pow(Complex(0.5, 0))
          Array(c + s, c - s)
        }
        val z = Array.fill(order)(Complex(0, 0))
        (z, p, math.pow(bw, order))
    }

    // bilinear z-transform, fs = 2
    val fs2 = 2.0 * fs
    val zZ = zeros.map(c => (Complex(fs2, 0) + c) / (Complex(fs2, 0) - c)) ++
      Array.fill(poles.length - zeros.length)(Complex(-1, 0))
    val pZ = poles.map(c => (Complex(fs2, 0) + c) / (Complex(fs2, 0) - c))
    val num = zeros.map(Complex(fs2, 0) - _)
      .foldLeft(Complex(1, 0))(_ * _)
    val den = poles.map(Complex(fs2, 0) - _)
      .foldLeft(Complex(1, 0))(_ * _)
    val kZ = gain * (num / den).re

    Coeffs(poly(zZ).map(_ * kZ), poly(pZ))
  }

  /** real(prod(-z)/prod(-p)) — highpass gain correction. */
  private def realProdRatio(z: Array[Complex], p: Array[Complex]): Double = {
    val nz = z.map(c => -c).foldLeft(Complex(1, 0))(_ * _)
    val np = p.map(c => -c).foldLeft(Complex(1, 0))(_ * _)
    (nz / np).re
  }

  /** Expand prod(x - r_i) to real coefficients (roots in conjugate pairs). */
  private def poly(roots: Array[Complex]): Array[Double] = {
    var coeffs = Array(Complex(1, 0))
    roots.foreach { r =>
      val next = new Array[Complex](coeffs.length + 1)
      java.util.Arrays.fill(next.asInstanceOf[Array[AnyRef]], Complex(0, 0))
      for (i <- coeffs.indices) {
        next(i) += coeffs(i)
        next(i + 1) -= coeffs(i) * r
      }
      coeffs = next
    }
    coeffs.map(_.re)
  }

  /** Direct-form-II-transposed linear filter with initial state zi
    * (modified in place to the final state). */
  def lfilter(c: Coeffs, x: Array[Double], zi: Array[Double]): Array[Double] = {
    val n = math.max(c.a.length, c.b.length)
    val b = java.util.Arrays.copyOf(c.b, n)
    val a = java.util.Arrays.copyOf(c.a, n)
    val y = new Array[Double](x.length)
    var m = 0
    while (m < x.length) {
      val xm = x(m)
      val ym = b(0) * xm + zi(0)
      var i = 0
      while (i < n - 2) {
        zi(i) = b(i + 1) * xm + zi(i + 1) - a(i + 1) * ym
        i += 1
      }
      zi(n - 2) = b(n - 1) * xm - a(n - 1) * ym
      y(m) = ym
      m += 1
    }
    y
  }

  /** Steady-state initial conditions for a unit step (scipy lfilter_zi):
    * solve (I − companion(a)ᵀ) zi = b[1:] − a[1:]·b[0]. */
  def lfilterZi(c: Coeffs): Array[Double] = {
    val n = math.max(c.a.length, c.b.length)
    val b = java.util.Arrays.copyOf(c.b, n)
    val a = java.util.Arrays.copyOf(c.a, n)
    val m = n - 1
    // IminusA[i][j] = delta_ij - companion(a).T[i][j]
    // companion(a)[0][j] = -a[j+1]/a[0]; companion[i][i-1] = 1 (i>=1)
    // => companion.T[j][0] = -a[j+1]/a[0]; companion.T[i-1][i] = 1
    val mat = Array.ofDim[Double](m, m)
    for (i <- 0 until m; j <- 0 until m) {
      val compT =
        (if (j == 0) -a(i + 1) / a(0) else 0.0) +
          (if (j == i + 1) 1.0 else 0.0)
      mat(i)(j) = (if (i == j) 1.0 else 0.0) - compT
    }
    val rhs = Array.tabulate(m)(i => b(i + 1) - a(i + 1) * b(0))
    solve(mat, rhs)
  }

  /** Gaussian elimination with partial pivoting (tiny systems, m <= 2N). */
  private def solve(mat: Array[Array[Double]], rhs: Array[Double]): Array[Double] = {
    val m = rhs.length
    val a = mat.map(_.clone())
    val b = rhs.clone()
    for (col <- 0 until m) {
      var piv = col
      for (r <- col + 1 until m)
        if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      val d = a(col)(col)
      for (r <- col + 1 until m) {
        val f = a(r)(col) / d
        for (cc <- col until m) a(r)(cc) -= f * a(col)(cc)
        b(r) -= f * b(col)
      }
    }
    val x = new Array[Double](m)
    for (i <- m - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until m) s -= a(i)(j) * x(j)
      x(i) = s / a(i)(i)
    }
    x
  }

  /** Zero-phase forward-backward filter, scipy filtfilt defaults:
    * odd extension, padlen = 3·max(len(a), len(b)), lfilter_zi-scaled
    * initial conditions each pass. */
  def filtfilt(c: Coeffs, x: Array[Double]): Array[Double] = {
    val ntaps = math.max(c.a.length, c.b.length)
    val edge = ntaps * 3
    require(x.length > edge,
      s"filtfilt needs input longer than padlen=$edge, got ${x.length}")
    val n = x.length
    val ext = new Array[Double](n + 2 * edge)
    for (i <- 0 until edge) ext(i) = 2 * x(0) - x(edge - i)
    System.arraycopy(x, 0, ext, edge, n)
    for (i <- 0 until edge) ext(edge + n + i) = 2 * x(n - 1) - x(n - 2 - i)

    val zi = lfilterZi(c)
    val zi1 = zi.map(_ * ext(0))
    val fwd = lfilter(c, ext, zi1)
    val rev = fwd.reverse
    val zi2 = zi.map(_ * rev(0))
    val bwd = lfilter(c, rev, zi2).reverse
    java.util.Arrays.copyOfRange(bwd, edge, edge + n)
  }

  /** |H(e^{jw})|² from (b, a) — used by the analytic-response tests. */
  def magSq(c: Coeffs, w: Double): Double = {
    def evalPoly(p: Array[Double]): Complex = {
      var acc = Complex(0, 0)
      var i = 0
      while (i < p.length) {
        // z^{-i} = e^{-j w i}
        acc += Complex(math.cos(-w * i), math.sin(-w * i)) * p(i)
        i += 1
      }
      acc
    }
    val h = evalPoly(c.b) / evalPoly(c.a)
    h.re * h.re + h.im * h.im
  }
}
