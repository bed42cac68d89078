package graft

import graft.core.TokenGen
import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: brute-force oracle, inclusive boundary,
  * tolerance, and the zero-temporal-leakage property (north rule). */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic inputs from the token generator: 3 entities; left = a
  // regular query grid, right = sparse updates at pseudo-random times.
  private val entities = Seq("a", "b", "c")
  private lazy val leftRows = for {
    (e, ei) <- entities.zipWithIndex
    t <- 0L until 120L by 3L
  } yield (e, t, s"q$ei-$t")
  private lazy val rightRows = for {
    (e, ei) <- entities.zipWithIndex
    k <- 0 until 14
    t = TokenGen.hash3(7L, ei.toLong, k.toLong) % 120L
      match { case x => if (x < 0) x + 120 else x }
  } yield (e, t, TokenGen.token(ei.toLong, k.toLong).toDouble)

  private lazy val left = leftRows.toDF("entity_id", "ts", "tag")
  // dedup equal (entity, ts) on the right: keep max value, mirroring
  // last-at-equal-ts nondeterminism out of the test
  private lazy val right = rightRows.toDF("entity_id", "ts", "v")
    .groupBy($"entity_id", $"ts").agg(max($"v").as("v"))

  private def bruteForce(tolerance: Option[Long]): Map[(String, Long), Option[(Long, Double)]] = {
    val r = right.collect().map(x =>
      (x.getString(0), x.getLong(1), x.getDouble(2)))
    leftRows.map { case (e, t, _) =>
      val candidates = r.filter(x => x._1 == e && x._2 <= t &&
        tolerance.forall(tol => t - x._2 <= tol))
      val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(_._2) match { case (_, rt, rv) => (rt, rv) })
      (e, t) -> best
    }.toMap
  }

  private def runJoin(tolerance: Option[Long]) =
    AsOf.joinBackward(left, right, "entity_id", "ts", tolerance)
      .collect().map { row =>
        val key = (row.getString(0), row.getLong(1))
        val matched = if (row.isNullAt(row.fieldIndex("right_ts"))) None
          else Some((row.getLong(row.fieldIndex("right_ts")),
            row.getDouble(row.fieldIndex("right_v"))))
        key -> matched
      }.toMap

  test("matches the brute-force oracle (unbounded)") {
    val got = runJoin(None)
    val want = bruteForce(None)
    assert(got.size == leftRows.size, "row count")
    want.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
  }

  test("matches the brute-force oracle (tolerance = 7)") {
    val got = runJoin(Some(7L))
    val want = bruteForce(Some(7L))
    want.foreach { case (k, v) => assert(got(k) == v, s"key $k") }
  }

  test("boundary is inclusive: right row at exactly left.ts matches") {
    val l = Seq(("e", 10L, "x")).toDF("entity_id", "ts", "tag")
    val r = Seq(("e", 10L, 1.5)).toDF("entity_id", "ts", "v")
    val out = AsOf.joinBackward(l, r, "entity_id", "ts").collect()(0)
    assert(out.getLong(out.fieldIndex("right_ts")) == 10L)
    assert(out.getDouble(out.fieldIndex("right_v")) == 1.5)
  }

  test("zero temporal leakage: future right rows never affect the past") {
    val cutoff = 60L
    val fullPast = runJoin(None).filter { case ((_, t), _) => t < cutoff }
    // drop all right rows at ts >= cutoff and re-run
    val truncated = AsOf.joinBackward(left.where($"ts" < cutoff),
      right.where($"ts" < cutoff), "entity_id", "ts")
      .collect().map { row =>
        val key = (row.getString(0), row.getLong(1))
        val matched = if (row.isNullAt(row.fieldIndex("right_ts"))) None
          else Some((row.getLong(row.fieldIndex("right_ts")),
            row.getDouble(row.fieldIndex("right_v"))))
        key -> matched
      }.toMap
    assert(fullPast == truncated,
      "as-of results before the cutoff changed when future rows were added")
  }

  test("left rows with no prior right row get NULL payload") {
    val l = Seq(("e", 5L, "x")).toDF("entity_id", "ts", "tag")
    val r = Seq(("e", 50L, 1.0)).toDF("entity_id", "ts", "v")
    val out = AsOf.joinBackward(l, r, "entity_id", "ts").collect()(0)
    assert(out.isNullAt(out.fieldIndex("right_ts")))
    assert(out.isNullAt(out.fieldIndex("right_v")))
  }
}
