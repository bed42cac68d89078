package graft

import graft.core.TokenGen
import graft.functions.Hrv
import graft.operators.Windows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HRV interval features vs numpy goldens (fixtures/hrv.json; reference
  * pymhealth src/mhealth/heart/hrv.py). nni in ms, derived from doc 4. */
class HrvSpec extends SparkSpec {

  private val fx = fixture("hrv")
  private lazy val nni: Seq[Double] =
    TokenGen.makeDoc(4, skewed = false).tokens.take(300)
      .map(t => 800.0 + (t % 400)).toSeq
  private lazy val df = valuesDf(nni)
  private val v = col("value")
  private def w = Window.partitionBy(col("entity_id")).orderBy(col("ts"))

  test("fixture data lines up") {
    assert(nni.length == fx.get("n").asInt())
    assertAllClose(nni.take(8), darr(fx.get("nni_head")), "head")
  }

  test("single-level HRV aggregates — allclose vs numpy") {
    val d = Hrv.nniDiff(v, w)
    val ps = Hrv.nniPairSum(v, w)
    val withDiff = df.select(v, d.as("d"), ps.as("ps"))
    val row = withDiff.agg(
      Hrv.sdnn(v).as("sdnn"),
      Hrv.rmssd(col("d")).as("rmssd"),
      Hrv.ssd(col("d")).as("ssd"),
      Hrv.sdsd(col("d")).as("sdsd"),
      Hrv.pnnx(col("d"), 50.0).as("pnn50"),
      Hrv.csiSd1(col("d")).as("sd1"),
      Hrv.csiSd2(col("ps")).as("sd2")).collect()(0)
    val keys = Seq("sdnn", "rmssd", "ssd", "sdsd", "pnn50",
      "csi_sd1", "csi_sd2")
    keys.zipWithIndex.foreach { case (k, i) =>
      assertClose(row.getDouble(i), fx.get(k).asDouble(), k)
    }
    val sd1 = row.getDouble(5)
    val sd2 = row.getDouble(6)
    assertClose(sd1 / sd2, fx.get("lorenz_csi").asDouble(), "csi")
    assertClose(math.log10(sd1 * sd2), fx.get("lorenz_cvi").asDouble(), "cvi")
    assertClose(sd1 * sd1 / sd2, fx.get("lorenz_mcsi").asDouble(), "mcsi")
  }

  test("sdann + sdnni: tumbling segments anchored at first index " +
    "(hrv.py:65-108) via anchoredWindows") {
    // index = cumsum(nni) in ns (unit 'ms' → td_factor 1e6), exact longs
    val wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    val pts = df.select(col("entity_id"),
      (sum(v).over(wcum) * 1e6).cast("long").as("ts"), v)
    val interval = 30000000000L // 30 s in ns
    val segs = Windows.anchoredWindows(pts, "entity_id", "ts",
      interval, interval, minWindowLen = 1,
      Seq(avg(v).as("m"), stddev_pop(v).as("sd")))
    val rows = segs.orderBy(col("window_start")).collect()
    assert(rows.length == fx.get("n_segments").asInt(), "n_segments")
    val means = rows.map(r => if (r.isNullAt(3)) Double.NaN
      else r.getDouble(3)).toIndexedSeq
    assertAllClose(means.take(6), darr(fx.get("seg_means_head")),
      "segment means")
    val out = segs.agg(stddev_pop(col("m")).as("sdann"),
      avg(col("sd")).as("sdnni")).collect()(0)
    assertClose(out.getDouble(0), fx.get("sdann").asDouble(), "sdann")
    assertClose(out.getDouble(1), fx.get("sdnni").asDouble(), "sdnni")
  }
}
