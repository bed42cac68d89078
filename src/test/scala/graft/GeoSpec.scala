package graft

import graft.functions.Geo
import org.apache.spark.sql.functions._

/** Haversine goldens ported verbatim from the reference's only unit-test
  * module (pymhealth tests/location/test_distance.py:7-58). */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  private val points = Seq(
    (0.1532, 86.675),
    (33.123, 21.541),
    (41.507483, -99.436554),
    (38.504048, -98.315949),
    (51.5074, 0.1278),
    (41.3851, 2.1734))

  test("scalar haversine (test_distance.py:16-23)") {
    val df = Seq((points(0)._1, points(0)._2, points(1)._1, points(1)._2))
      .toDF("lat1", "lon1", "lat2", "lon2")
    val d = scalar(df.select(
      Geo.haversine($"lat1", $"lon1", $"lat2", $"lon2", Geo.TwoRTestGoldens)))
    assertClose(d, 7704.777296228049, "d01", rtol = 1e-9)
  }

  test("code-parity constant: default 2r = 12742.018 scales the golden " +
    "by 12742.018/12742 (reference code/test inconsistency, documented)") {
    val df = Seq((points(0)._1, points(0)._2, points(1)._1, points(1)._2))
      .toDF("lat1", "lon1", "lat2", "lon2")
    val d = scalar(df.select(
      Geo.haversine($"lat1", $"lon1", $"lat2", $"lon2")))
    assertClose(d, 7704.777296228049 * (Geo.TwoR / Geo.TwoRTestGoldens),
      "scaled", rtol = 1e-9)
  }

  test("elementwise haversine (test_distance.py:26-34)") {
    val expected = Seq(7704.77729623, 9756.94118642, 347.32834804,
      7275.82114826, 1136.28562666)
    val df = points.init.zip(points.tail).map { case ((a1, o1), (a2, o2)) =>
      (a1, o1, a2, o2)
    }.zipWithIndex.map { case ((a1, o1, a2, o2), i) => (i, a1, o1, a2, o2) }
      .toDF("i", "lat1", "lon1", "lat2", "lon2")
    val got = df.orderBy($"i").select(
      Geo.haversine($"lat1", $"lon1", $"lat2", $"lon2", Geo.TwoRTestGoldens))
      .collect().map(_.getDouble(0)).toIndexedSeq
    // reference asserts 7 decimals (npt.assert_almost_equal default)
    assertAllClose(got, expected, "elementwise", rtol = 1e-8)
  }

  test("vector vs fixed point (test_distance.py:37-45)") {
    val expected = Seq(7704.77729623, 15341.98217643, 15686.42408015,
      9755.32422594, 9537.84258146)
    val (fl, fo) = points.head
    val df = points.tail.zipWithIndex.map { case ((a, o), i) => (i, a, o) }
      .toDF("i", "lat", "lon")
    val got = df.orderBy($"i")
      .select(Geo.haversine(lit(fl), lit(fo), $"lat", $"lon", Geo.TwoRTestGoldens))
      .collect().map(_.getDouble(0)).toIndexedSeq
    assertAllClose(got, expected, "vector", rtol = 1e-8)
  }

  test("outer product: 6×6 all-pairs via crossJoin " +
    "(test_distance.py:48-58)") {
    val expected = Seq(
      Seq(0.0, 7704.77729623, 15341.98217643, 15686.42408015, 9755.32422594, 9537.84258146),
      Seq(7704.77729623, 0.0, 9756.94118642, 9918.88428512, 2677.52968247, 1938.58116302),
      Seq(15341.98217643, 9756.94118642, 0.0, 347.32834804, 7096.01276647, 7898.26438152),
      Seq(15686.42408015, 9918.88428512, 347.32834804, 0.0, 7275.82114826, 8034.9315799),
      Seq(9755.32422594, 2677.52968247, 7096.01276647, 7275.82114826, 0.0, 1136.28562666),
      Seq(9537.84258146, 1938.58116302, 7898.26438152, 8034.9315799, 1136.28562666, 0.0))
    val a = points.zipWithIndex.map { case ((la, lo), i) => (i, la, lo) }
      .toDF("i", "lat1", "lon1")
    val b = points.zipWithIndex.map { case ((la, lo), j) => (j, la, lo) }
      .toDF("j", "lat2", "lon2")
    val got = a.crossJoin(broadcast(b))
      .select($"i", $"j",
        Geo.haversine($"lat1", $"lon1", $"lat2", $"lon2", Geo.TwoRTestGoldens).as("d"))
      .orderBy($"i", $"j").collect()
    got.foreach { r =>
      assertClose(r.getDouble(2), expected(r.getInt(0))(r.getInt(1)),
        s"(${r.getInt(0)},${r.getInt(1)})", rtol = 1e-8, atol = 1e-6)
    }
  }
}
