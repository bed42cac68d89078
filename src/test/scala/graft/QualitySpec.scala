package graft

import graft.signal.Quality

/** Beat-correlation quality properties: clean periodic beats score ~1,
  * a corrupted beat scores visibly lower, in both variants. */
class QualitySpec extends SparkSpec {

  private val sr = 64
  private val period = 80
  private val nBeats = 40
  private val n = period * (nBeats + 1)

  private def beatShape(ph: Int): Double =
    math.exp(-0.5 * math.pow((ph - 40.0) / 6.0, 2)) +
      0.3 * math.exp(-0.5 * math.pow((ph - 58.0) / 10.0, 2))

  private def signal(corruptBeat: Option[Int]): (Array[Double], Array[Int]) = {
    val x = Array.tabulate(n)(i => beatShape(i % period))
    corruptBeat.foreach { b =>
      val start = b * period
      for (i <- start until math.min(n, start + period))
        x(i) = if ((i / 3) % 2 == 0) 1.0 else -1.0 // square-wave noise
    }
    val peaks = (0 until nBeats).map(b => b * period + 40).toArray
    (x, peaks)
  }

  test("clean periodic beats correlate ~1; corrupted beat drops") {
    val (clean, peaks) = signal(None)
    val q = Quality.beatCorrelation(clean, peaks, sr)
    assert(q.length == peaks.length)
    // interior beats past the ring warm-up
    (24 until peaks.length - 1).foreach { i =>
      assert(q(i) > 0.99, s"clean beat $i quality ${q(i)}")
    }
    val (dirty, peaks2) = signal(Some(30))
    val q2 = Quality.beatCorrelation(dirty, peaks2, sr)
    assert(q2(30) < 0.7, s"corrupted beat quality ${q2(30)}")
  }

  test("bidirectional variant: interior max(prev, succ) correlation") {
    val (dirty, peaks) = signal(Some(30))
    val q = Quality.beatCorrelationBi(dirty, peaks, sr)
    (12 until peaks.length - 12).foreach { i =>
      if (i != 30) assert(q(i) > 0.9, s"beat $i quality ${q(i)}")
    }
    assert(q(30) < 0.7, s"corrupted beat quality ${q(30)}")
    // edges are NaN by documented divergence
    assert(q(0).isNaN)
  }

  test("zero-variance reference slice contributes 0, not NaN") {
    val x = Array.fill(64 * 60)(0.0) // flat signal
    val peaks = (0 until 30).map(b => b * 100 + 50).toArray
    val q = Quality.beatCorrelation(x, peaks, sr)
    // all-zero slices: denom 0 => corr 0 => mean 0
    assert(q.forall(v => v == 0.0), q.take(5).mkString(","))
  }
}
