package graft

import graft.operators.{AsOf, Sessionize, Windows}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized property tests (scalacheck): engine operators vs naive
  * in-memory oracles on arbitrary inputs — the generator explores edge
  * shapes the fixtures don't (single points, heavy duplicates at a ts,
  * gaps larger than windows, all-equal values). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  /** Seeded exploration without the scalatest-scalacheck bridge (not in
    * the offline cache): draw `n` deterministic samples from a Gen. */
  private def forSamples[T](gen: Gen[T], n: Int = 12)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(40)
    (0 until n).foreach { i =>
      gen(params, Seed(42L + i * 1000L)).foreach(body)
    }
  }

  private val seriesGen: Gen[List[(Long, Double)]] = for {
    n <- Gen.choose(1, 60)
    gaps <- Gen.listOfN(n, Gen.choose(1L, 30L))
    vals <- Gen.listOfN(n, Gen.choose(-50, 50).map(_.toDouble))
  } yield gaps.scanLeft(0L)(_ + _).drop(1).zip(vals)

  test("anchored windows: engine == naive fold for random gappy series") {
    val g = for {
      series <- seriesGen
      wsize <- Gen.choose(2L, 20L)
      wstep <- Gen.choose(1L, 10L)
      minLen <- Gen.choose(1L, 4L)
    } yield (series, wsize, wstep, minLen)
    forSamples(g) { case (series, wsize, wstep, minLen) =>
        if (series.map(_._1).distinct.size == series.size) {
          val df = series.map { case (t, v) => ("e", t, v) }
            .toDF("entity_id", "ts", "value")
          val got = Windows.anchoredWindows(df, "entity_id", "ts",
            wsize, wstep, minLen, Seq(avg($"value").as("m")))
            .collect().map(r => r.getLong(1) ->
              (r.getLong(2), if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
            .toMap
          // oracle
          val ts = series.map(_._1).sorted
          val byTs = series.toMap
          val first = ts.head
          val last = ts.last
          val want =
            if (last == first) Map.empty[Long, (Long, Double)]
            else (0L to ((last - first - 1) / wstep)).map { k =>
              val start = first + k * wstep
              val in = ts.filter(t => t >= start && t < start + wsize)
              val m =
                if (in.size >= minLen && in.nonEmpty)
                  in.map(byTs).sum / in.size
                else Double.NaN
              start -> (in.size.toLong, m)
            }.toMap
          assert(got.keySet == want.keySet,
            s"grid: ${got.keySet} vs ${want.keySet}")
          want.foreach { case (start, (n, m)) =>
            assert(got(start)._1 == n, s"n@$start")
            assertClose(got(start)._2, m, s"mean@$start", rtol = 1e-9)
          }
        }
    }
  }

  test("as-of join: engine == naive latest-match for random inputs") {
    val rightGen = for {
      n <- Gen.choose(0, 30)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 100L),
        Gen.choose(-9, 9).map(_.toDouble)))
    } yield rows.groupBy(_._1).map { case (t, vs) => (t, vs.head._2) }.toList
    val g = for {
      left <- seriesGen
      right <- rightGen
      tol <- Gen.option(Gen.choose(1L, 25L))
    } yield (left, right, tol)
    forSamples(g) { case (left, right, tol) =>
        if (right.nonEmpty) {
          val l = left.map { case (t, v) => ("e", t, v) }
            .toDF("entity_id", "ts", "lv")
          val r = right.map { case (t, v) => ("e", t, v) }
            .toDF("entity_id", "ts", "v")
          val got = AsOf.joinBackward(l, r, "entity_id", "ts", tol)
            .collect().map { row =>
              row.getLong(row.fieldIndex("ts")) ->
                (if (row.isNullAt(row.fieldIndex("right_v"))) None
                 else Some(row.getDouble(row.fieldIndex("right_v"))))
            }.toMap
          left.foreach { case (t, _) =>
            val cand = right.filter { case (rt, _) =>
              rt <= t && tol.forall(x => t - rt <= x)
            }
            val want = if (cand.isEmpty) None
              else Some(cand.maxBy(_._1)._2)
            assert(got(t) == want, s"ts=$t tol=$tol")
          }
        }
    }
  }

  test("sessionize: ids equal the naive gap scan; backfill never " +
    "crosses a session") {
    val g = Gen.zip(seriesGen, Gen.choose(1L, 20L))
    forSamples(g) { case (series, gap) =>
        if (series.nonEmpty) {
          val df = series.map { case (t, v) => ("e", t, v) }
            .toDF("entity_id", "ts", "value")
          val got = Sessionize.withSessionId(df, "entity_id", "ts", gap)
            .orderBy($"ts").collect()
            .map(r => r.getLong(1) -> r.getLong(3)).toMap
          val ts = series.map(_._1).sorted
          var sid = 0L
          var prev = Option.empty[Long]
          val want = ts.map { t =>
            prev.foreach(p => if (t - p > gap) sid += 1)
            prev = Some(t)
            t -> sid
          }.toMap
          assert(got == want)
        }
    }
  }

  test("sessionize with tieCols: tied (entity, ts) rows are deterministic " +
    "and ties never change session values") {
    // inject heavy ties: every ts duplicated 3x with distinct event ids
    val g = Gen.zip(seriesGen, Gen.choose(1L, 20L))
    forSamples(g) { case (series, gap) =>
        if (series.nonEmpty) {
          val rows = series.flatMap { case (t, v) =>
            Seq(("e", t, 3 * t, v), ("e", t, 3 * t + 1, v + 1),
              ("e", t, 3 * t + 2, v + 2))
          }
          val df = rows.toDF("entity_id", "ts", "event_id", "value")
          def run() = Sessionize
            .withSessionId(df, "entity_id", "ts", gap,
              tieCols = Seq("event_id"))
            .orderBy($"ts", $"event_id").collect()
            .map(r => (r.getLong(1), r.getLong(2)) -> r.getLong(4))
            .toMap
          val got = run()
          assert(got == run(), "two runs disagree under ties")
          // tied rows share the session id of their timestamp, which must
          // equal the naive gap scan over distinct timestamps
          val ts = series.map(_._1).distinct.sorted
          var sid = 0L
          var prev = Option.empty[Long]
          val want = ts.map { t =>
            prev.foreach(p => if (t - p > gap) sid += 1)
            prev = Some(t)
            t -> sid
          }.toMap
          got.foreach { case ((t, _), s) =>
            assert(s == want(t), s"ts=$t gap=$gap")
          }
        }
    }
  }
}
