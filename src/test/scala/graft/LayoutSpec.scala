package graft

import graft.core.{Layout, TokenGen}
import org.apache.spark.sql.functions._

/** Layout/skew helpers: salted aggregation equals direct aggregation;
  * range layout preserves data and in-partition order. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("saltedAgg equals the direct groupBy on a skewed key") {
    val docs = TokenGen.docs(spark, 30, skewed = true)
    val pts = TokenGen.points(docs) // skewed: 1% docs 32x longer
    val direct = pts.groupBy($"entity_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"),
        max($"value").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val salted = Layout.saltedAgg(pts, "entity_id", nSalts = 8,
      Seq(count(lit(1)).as("n"), sum($"value").as("s"),
        max($"value").as("mx")),
      Map("n" -> (sum(_)), "s" -> (sum(_)), "mx" -> (max(_))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (n, s, m)) =>
      val (dn, ds, dm) = direct(k)
      assert(n == dn, s"count@$k")
      assertClose(s, ds, s"sum@$k", rtol = 1e-12)
      assert(m == dm, s"max@$k")
    }
  }

  test("byEntityTime preserves rows and sorts within partitions") {
    val pts = TokenGen.points(TokenGen.docs(spark, 10))
    val laid = Layout.byEntityTime(pts, "entity_id", "ts", 6)
    assert(laid.count() == pts.count())
    val violations = laid.mapPartitions { it =>
      var prev: Option[(String, Long)] = None
      var bad = 0
      it.foreach { r =>
        val cur = (r.getString(0), r.getLong(1))
        prev.foreach { p =>
          if (p._1 > cur._1 || (p._1 == cur._1 && p._2 > cur._2)) bad += 1
        }
        prev = Some(cur)
      }
      Iterator.single(bad)
    }.collect().sum
    assert(violations == 0, s"$violations out-of-order rows")
  }
}
