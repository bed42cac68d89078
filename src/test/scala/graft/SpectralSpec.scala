package graft

import graft.core.TokenGen
import graft.signal.Spectral

/** Frequency-domain verification: FFT vs numpy goldens; the fast NUFFT
  * vs an exact DIRECT non-uniform DFT oracle (independent algorithm);
  * band-power features vs fixture (fixtures/spectral.json). */
class SpectralSpec extends SparkSpec {

  private val fx = fixture("spectral")

  private lazy val xc = {
    val x = TokenGen.makeDoc(9, skewed = false).tokens.take(256)
      .map(_.toDouble)
    val m = x.sum / x.length
    x.map(_ - m)
  }

  test("fft matches numpy (head coefficients + |F| sum)") {
    val f = Spectral.fft(xc)
    assertAllClose(f.take(8).map(_.re).toIndexedSeq,
      darr(fx.get("fft_re_head")), "re", rtol = 1e-9)
    assertAllClose(f.take(8).map(_.im).toIndexedSeq,
      darr(fx.get("fft_im_head")), "im", rtol = 1e-9)
    assertClose(f.map(_.abs).sum, fx.get("psd_sum").asDouble(), "psd sum",
      rtol = 1e-9)
  }

  test("power_band / peak_frequency / relative_power over the positive " +
    "half-spectrum") {
    val f = Spectral.fft(xc)
    val n = xc.length / 2
    val fs = fx.get("fs").asDouble()
    val freqs = Array.tabulate(n)(i => i * fs / xc.length)
    val psd = f.take(n).map(_.abs)
    assertClose(Spectral.powerBand(psd, freqs, 5, 15),
      fx.get("band_power_5_15").asDouble(), "band power", rtol = 1e-9)
    assertClose(Spectral.peakFrequency(psd, freqs, 5, 15),
      fx.get("peak_freq_5_15").asDouble(), "peak freq")
    assertClose(Spectral.relativePowerBand(psd, freqs, 5, 15),
      fx.get("rel_power_half_5_15").asDouble(), "relative", rtol = 1e-9)
  }

  test("nufft1d1 matches the exact direct non-uniform DFT") {
    val t2 = TokenGen.makeDoc(2, skewed = false).tokens.take(128)
    val ts = t2.map(t => 1L + (t % 97)).scanLeft(0L)(_ + _).drop(1)
      .map(_ * 0.001)
    val mean = t2.map(_.toDouble).sum / t2.length
    val c = t2.map(_.toDouble - mean)
    val m = fx.get("nufft_m").asInt()
    val got = Spectral.nufft1d1(ts, c, m)
    val wantRe = darr(fx.get("nufft_re"))
    val wantIm = darr(fx.get("nufft_im"))
    val scale = darr(fx.get("nufft_abs")).max
    got.zipWithIndex.foreach { case (g, i) =>
      // eps=1e-15 gridding: compare against the exact sum at 1e-9 of
      // the spectrum's magnitude scale
      assert(math.abs(g.re - wantRe(i)) <= 1e-9 * scale, s"re[$i]")
      assert(math.abs(g.im - wantIm(i)) <= 1e-9 * scale, s"im[$i]")
    }
  }

  test("nufftfreqs + firstIndex semantics") {
    assert(Spectral.nufftFreqs(6).toSeq == Seq(-3.0, -2.0, -1.0, 0.0, 1.0, 2.0))
    assert(Spectral.nufftFreqs(5).toSeq == Seq(-2.0, -1.0, 0.0, 1.0, 2.0))
    val arr = Array(1.0, 2.0, 4.0, 8.0)
    assert(Spectral.firstIndex(arr, 3.0) == 2)
    assert(Spectral.firstIndex(arr, 8.0) == 3)
    assert(Spectral.firstIndex(arr, 9.0) == 4)
  }
}
