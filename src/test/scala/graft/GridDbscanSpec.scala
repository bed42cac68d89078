package graft

import graft.operators.GridDbscan
import org.apache.spark.sql.functions._

/** Grid-DBSCAN semantics (core / border / noise, canonical min-cell
  * labels) plus the fixed-round convergence claim the oracle's unrolled
  * CTE chain relies on. */
class GridDbscanSpec extends SparkSpec {

  import spark.implicits._

  test("hand fixture: dense blob = core, adjacent sparse cell = border, " +
    "far sparse cell = noise; two blobs at distance 2 stay separate") {
    // entity u: blob A = 6 points in cell (0,0); cell (1,1) holds 1
    //   point (border via adjacency to A); cell (5,5) holds 1 point
    //   (noise); blob B = 5 points in cell (3,0) — NOT adjacent to A
    //   (Chebyshev distance 3) => second cluster.
    val rows =
      (1 to 6).map(i => ("u", i, 0, 0)) ++
        Seq(("u", 7, 1, 1)) ++
        Seq(("u", 8, 5, 5)) ++
        (9 to 13).map(i => ("u", i, 3, 0))
    val df = rows.toDF("user_id", "id", "cx", "cy")
    val out = GridDbscan.label(df, "user_id", minPts = Some(4))
      .select($"id", $"cluster", $"is_core")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    def code(cx: Long, cy: Long) =
      (cx + 1000000L) * 2000000L + (cy + 1000000L)
    val labelA = code(0, 0)
    val labelB = code(3, 0)
    (1 to 6).foreach(i => assert(out(i) == (labelA, true), s"blob A pt $i"))
    assert(out(7) == (labelA, false), "adjacent sparse cell is border of A")
    assert(out(8) == (-1L, false), "far sparse cell is noise")
    (9 to 13).foreach(i => assert(out(i) == (labelB, true), s"blob B pt $i"))
  }

  test("chained core cells merge into one component labeled by the " +
    "minimum cell code; propagation rounds bound the reachable diameter") {
    // a 6-cell diagonal chain of core cells: component diameter 5
    val chain = (0 until 6).flatMap(k =>
      (1 to 4).map(i => ("u", k * 10 + i, k, k)))
    val df = chain.toDF("user_id", "id", "cx", "cy")
    val full = GridDbscan.label(df, "user_id", minPts = Some(4), rounds = 8)
      .select($"cluster").distinct().as[Long].collect().toSet
    val minCode = (0L + 1000000L) * 2000000L + (0L + 1000000L)
    assert(full == Set(minCode),
      s"chain must collapse to the min cell code: $full")
    // too few rounds => the far end cannot reach label 0 yet
    val truncated = GridDbscan
      .label(df, "user_id", minPts = Some(4), rounds = 2)
      .select($"cluster").distinct().as[Long].collect().toSet
    assert(truncated.size > 1,
      "2 rounds should not fully merge a diameter-5 chain")
  }

  test("q_location_dbscan corpus: 8 rounds have converged (labels at " +
    "R == labels at R+1) and the output has real density structure") {
    // the same synthetic points the gate query builds (home/work/scatter)
    val m = col("event_id") % 10
    val li = when(m < 6,
      lit(8000) + col("user_id") * 97 % 1000 + col("event_id") * 13 % 120)
      .when(m < 8,
        lit(3000) + col("user_id") * 53 % 1000 + col("event_id") * 17 % 120)
      .otherwise(col("event_id") * 37 % 17000)
    val lo = when(m < 6,
      lit(20000) + col("user_id") * 61 % 1000 + col("event_id") * 19 % 120)
      .when(m < 8,
        lit(30000) + col("user_id") * 41 % 1000 + col("event_id") * 23 % 120)
      .otherwise(col("event_id") * 73 % 36000)
    val pts = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"), li.as("li"), lo.as("lo"))
      .withColumn("cx", expr("li DIV 100") - 85)
      .withColumn("cy", expr("lo DIV 100") - 180)
    def labels(rounds: Int): Map[(Long, Long), Long] =
      GridDbscan.label(pts, "user_id", rounds = rounds)
        .select($"user_id", $"event_id", $"cluster")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val r8 = labels(8)
    assert(r8 == labels(9), "8 rounds did not reach the fixpoint")
    val perUser = r8.groupBy(_._1._1).map { case (u, g) =>
      val cs = g.values.filter(_ >= 0).toSet.size
      val noise = g.values.count(_ == -1L)
      (u, cs, noise, g.size)
    }
    perUser.foreach { case (u, cs, noise, n) =>
      assert(cs >= 1, s"user $u found no cluster")
      assert(noise > 0 && noise < n, s"user $u noise degenerate: $noise/$n")
    }
    info(f"${perUser.size} users, " +
      f"mean clusters ${perUser.map(_._2).sum.toDouble / perUser.size}%.1f, " +
      f"mean noise share ${perUser.map(p => p._3.toDouble / p._4).sum /
        perUser.size}%.2f")
  }
}
