package graft

import graft.core.TokenGen
import graft.operators.Windows
import org.apache.spark.sql.functions._

/** Window-engine semantics vs the numpy mirror of get_indices /
  * nonuniform_rolling_apply / view (fixtures/windows.json; reference
  * pymhealth src/mhealth/util/windows.py — SURVEY.md §2.1). */
class WindowsSpec extends SparkSpec {

  private val fx = fixture("windows")

  // non-uniform index: ts = cumsum(1 + tok % 97) over doc 2
  private lazy val (ts, vals) = {
    val toks = TokenGen.makeDoc(2, skewed = false).tokens
    val gaps = toks.map(t => 1L + (t % 97))
    val cum = gaps.scanLeft(0L)(_ + _).drop(1)
    (cum.toIndexedSeq, toks.map(_.toDouble).toIndexedSeq)
  }

  private lazy val df = {
    import spark.implicits._
    ts.zip(vals).map { case (t, x) => ("e", t, x) }
      .toDF("entity_id", "ts", "value")
  }

  test("fixture data lines up") {
    assert(vals.length == fx.get("n").asInt())
    assert(ts.take(8) == larr(fx.get("ts_head")))
  }

  test("anchored grid windows: full grid, counts, NaN under " +
    "min_window_len — allclose vs nonuniform_rolling_apply") {
    val out = Windows.anchoredWindows(df, "entity_id", "ts",
      wsize = fx.get("wsize").asLong(), wstep = fx.get("wstep").asLong(),
      minWindowLen = fx.get("min_window_len").asLong(),
      Seq(avg(col("value")).as("m"), stddev_pop(col("value")).as("sd")))
      .orderBy(col("window_start"))
    val rows = out.collect()
    assert(rows.length == fx.get("n_windows").asInt(), "grid size")
    val counts = rows.map(_.getLong(2)).toIndexedSeq
    assert(counts == larr(fx.get("counts")), "window point counts")
    def dcol(i: Int) = rows.map(r =>
      if (r.isNullAt(i)) Double.NaN else r.getDouble(i)).toIndexedSeq
    assertAllClose(dcol(3), darr(fx.get("nu_mean")), "mean")
    assertAllClose(dcol(4), darr(fx.get("nu_std")), "std")
    // grid spacing: window_start = first + k*wstep
    val starts = rows.map(_.getLong(1))
    assert(starts.head == ts.head)
    assert(starts.toSeq == starts.indices.map(k =>
      ts.head + k.toLong * fx.get("wstep").asLong()))
  }

  test("count windows: (N−w)//s + 1 windows, partials dropped — " +
    "allclose vs view()") {
    val out = Windows.countWindows(df, "entity_id", "ts",
      wsize = fx.get("cw_w").asInt(), wstep = fx.get("cw_s").asInt(),
      spec => Seq(avg(col("value")).over(spec).as("m")))
      .orderBy(col("window_index"))
    val rows = out.collect()
    assert(rows.length == fx.get("cw_n").asInt(), "window count")
    val means = rows.map(r => r.getDouble(rows.head.fieldIndex("m")))
      .toIndexedSeq
    assertAllClose(means, darr(fx.get("cw_mean")), "count-window means")
  }

  test("zero temporal leakage: dropping future points leaves past " +
    "windows unchanged") {
    val wsize = fx.get("wsize").asLong()
    val wstep = fx.get("wstep").asLong()
    val cutoff = ts(ts.length / 2)
    val full = Windows.anchoredWindows(df, "entity_id", "ts", wsize, wstep,
      3, Seq(avg(col("value")).as("m")))
      .where(col("window_start") + wsize <= cutoff)
      .orderBy(col("window_start")).collect()
    val truncated = Windows.anchoredWindows(
      df.where(col("ts") <= cutoff), "entity_id", "ts", wsize, wstep,
      3, Seq(avg(col("value")).as("m")))
      .where(col("window_start") + wsize <= cutoff)
      .orderBy(col("window_start")).collect()
    assert(full.length == truncated.length && full.length > 10)
    full.zip(truncated).foreach { case (a, b) =>
      assert(a.getLong(1) == b.getLong(1))
      assert(a.getLong(2) == b.getLong(2))
      val av = if (a.isNullAt(3)) Double.NaN else a.getDouble(3)
      val bv = if (b.isNullAt(3)) Double.NaN else b.getDouble(3)
      assertClose(av, bv, s"window ${a.getLong(1)}")
    }
  }
}
