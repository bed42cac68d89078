package graft

import graft.api.MHealth
import graft.signal.{Butterworth, Qrs}
import org.apache.spark.sql.functions._

/** The migration facade (api.MHealth) vs the kernels it wraps: the
  * DataFrame surface must reproduce the array semantics per entity. */
class ApiSpec extends SparkSpec {

  import spark.implicits._

  private lazy val series: Seq[(String, Long, Double)] = {
    val a = graft.core.TokenGen.makeDoc(3, skewed = false)
      .tokens.take(400).map(_.toDouble)
    val b = graft.core.TokenGen.makeDoc(5, skewed = false)
      .tokens.take(300).map(_.toDouble)
    a.zipWithIndex.map { case (v, i) => ("a", i.toLong, v) } ++
      b.zipWithIndex.map { case (v, i) => ("b", i.toLong, v) }
  }

  test("Filters.butterworth == per-entity filtfilt kernel") {
    implicit val s = spark
    val df = series.toDF("entity_id", "ts", "value")
    val got = MHealth.Filters.butterworth(df, "entity_id", "ts", "value",
      freq = 128, cutoff = Seq(3, 25), Butterworth.Bandpass)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val c = Butterworth.design(5, Seq(3.0 / 64, 25.0 / 64),
      Butterworth.Bandpass)
    Seq("a", "b").foreach { e =>
      val vs = series.filter(_._1 == e).sortBy(_._2).map(_._3).toArray
      val exp = Butterworth.filtfilt(c, vs)
      assert(vs.length >= 100, s"fixture too short for $e")
      exp.indices.foreach { i =>
        assert(got((e, i.toLong)) == exp(i), s"$e@$i not bit-equal")
      }
    }
  }

  test("QrsApi.rpeaksHamiltonTompkins == array kernel, per entity") {
    val df = series.toDF("entity_id", "ts", "value")
    val got = MHealth.QrsApi.rpeaksHamiltonTompkins(
      df, "entity_id", "ts", "value", fs = 128)
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    Seq("a", "b").foreach { e =>
      val vs = series.filter(_._1 == e).sortBy(_._2).map(_._3).toArray
      val exp = Qrs.rpeaksHamiltonTompkins(vs, 128.0).map(_.toLong).toSeq
      assert(got.getOrElse(e, Nil) == exp, s"peaks differ for $e")
    }
  }

  test("HrvApi.timeDomain matches direct formulas on a known series") {
    val nni = Seq(800.0, 810.0, 790.0, 805.0, 795.0, 820.0, 780.0, 800.0)
    val df = nni.zipWithIndex.map { case (v, i) => ("e", i.toLong, v) }
      .toDF("entity_id", "ts", "nni")
    val row = MHealth.HrvApi.timeDomain(df, "entity_id", "ts", "nni")
      .head()
    val mean = nni.sum / nni.length
    val sdnn = math.sqrt(nni.map(v => (v - mean) * (v - mean)).sum /
      nni.length)
    val diffs = nni.zip(nni.tail).map { case (a, b) => b - a }
    val rmssd = math.sqrt(diffs.map(d => d * d).sum / diffs.length)
    assertClose(row.getAs[Double]("sdnn"), sdnn, "sdnn")
    assertClose(row.getAs[Double]("rmssd"), rmssd, "rmssd")
    assertClose(row.getAs[Double]("ssd"), diffs.sum, "ssd")
  }

  test("AccelApi.linearFilter == per-axis highpass filtfilt") {
    implicit val s = spark
    val n = 200
    val rows = (0 until n).map { i =>
      ("e", i.toLong, math.sin(i / 5.0) + 1.0, math.cos(i / 7.0),
        0.5 * math.sin(i / 3.0))
    }
    val df = rows.toDF("entity_id", "ts", "ax", "ay", "az")
    val got = MHealth.AccelApi.linearFilter(df, "entity_id", "ts",
      Seq("ax", "ay", "az"), freq = 128)
      .collect()
      .map(r => (r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val c = Butterworth.design(5, Seq(0.5 / 64), Butterworth.Highpass)
    Seq("ax" -> rows.map(_._3), "ay" -> rows.map(_._4),
      "az" -> rows.map(_._5)).foreach { case (axis, vs) =>
      val exp = Butterworth.filtfilt(c, vs.toArray)
      (0 until n).foreach { i =>
        assert(got((axis, i.toLong)) == exp(i), s"$axis@$i differs")
      }
    }
  }

  test("AccelApi.axisFilter survives ':' inside entity ids " +
    "(axis-first key encoding)") {
    implicit val s = spark
    val rows = (0 until 60).map { i =>
      ("site:12", i.toLong, math.sin(i / 3.0), math.cos(i / 4.0))
    }
    val df = rows.toDF("entity_id", "ts", "ax", "ay")
    val got = MHealth.AccelApi.gravityFilter(df, "entity_id", "ts",
      Seq("ax", "ay"), freq = 64)
    val ents = got.select("entity_id").distinct()
      .collect().map(_.getString(0)).toSet
    val axes = got.select("axis").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ents == Set("site:12"), s"entity mangled: $ents")
    assert(axes == Set("ax", "ay"), s"axes mangled: $axes")
  }

  test("StatsApi.profile and LocationApi distances are sane") {
    val df = Seq(("e", 1.0), ("e", 2.0), ("e", 3.0), ("e", 4.0))
      .toDF("entity_id", "v")
    val p = MHealth.StatsApi.profile(df, "entity_id", "v").head()
    assertClose(p.getAs[Double]("mean"), 2.5, "mean")
    assertClose(p.getAs[Double]("drange"), 3.0, "drange")
    assertClose(p.getAs[Double]("median"), 2.5, "median")

    val loc = Seq(("e", 0L, 51.5, -0.1), ("e", 1L, 51.5, -0.1),
      ("e", 2L, 51.6, -0.1))
      .toDF("entity_id", "ts", "lat", "lon")
    val d = MHealth.LocationApi.successiveDistance(
      loc, "entity_id", "ts", "lat", "lon")
      .where(col("ts") === 2).head().getAs[Double]("distance")
    assert(d > 10 && d < 12.5, s"0.1 deg lat should be ~11.1 km, got $d")
  }

  test("QrsApi.inferFs reads the first-gap spacing per entity " +
    "(qrs.py:102 semantics, irregular tail ignored)") {
    // entity a: 8 ms spacing in micros => 125 Hz; entity b: 4 ms =>
    // 250 Hz with an IRREGULAR later gap the reference would ignore too
    val df = Seq(
      ("a", 0L), ("a", 8000L), ("a", 16000L),
      ("b", 0L), ("b", 4000L), ("b", 50000L))
      .toDF("entity_id", "ts")
    val fs = MHealth.QrsApi.inferFs(df, "entity_id", "ts")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fs("a") == 125.0, s"a: ${fs("a")}")
    assert(fs("b") == 250.0, s"b: ${fs("b")}")
  }
}
