package graft

import graft.core.TokenGen
import graft.functions.Stats
import org.apache.spark.sql.functions._

/** Statistical aggregates vs numpy goldens (fixtures/stats.json; reference
  * semantics pymhealth src/mhealth/generic/stats.py + information.py). */
class StatsSpec extends SparkSpec {

  private val fx = fixture("stats")
  private lazy val df =
    valuesDf(TokenGen.makeDoc(3, skewed = false).tokens.map(_.toDouble).toSeq)
  private val v = col("value")

  test("population moments, range, percentiles — allclose vs numpy") {
    val row = df.agg(
      count(lit(1)).as("n"),
      avg(v).as("mean"),
      var_pop(v).as("var_pop"),
      stddev_pop(v).as("std_pop"),
      Stats.skewnessPop(v).as("skew"),
      Stats.kurtosisNonExcess(v).as("kurt"),
      Stats.kurtosisExcess(v).as("kurt_ex"),
      Stats.iqr(v).as("iqr"),
      Stats.median(v).as("median"),
      percentile(v, lit(0.25)).as("p25"),
      percentile(v, lit(0.75)).as("p75"),
      Stats.drange(v).as("drange"),
      Stats.coeffVar(v).as("cv")
    ).collect()(0)
    assert(row.getLong(0) == fx.get("n").asLong())
    val checks = Seq(
      "mean" -> "mean", "var_pop" -> "var_pop", "std_pop" -> "std_pop",
      "skew" -> "skew_g1", "kurt" -> "kurt_b2", "kurt_ex" -> "kurt_excess",
      "iqr" -> "iqr", "median" -> "median", "p25" -> "p25", "p75" -> "p75",
      "drange" -> "drange", "cv" -> "coeff_var")
    checks.zipWithIndex.foreach { case ((_, fxKey), i) =>
      assertClose(row.getDouble(i + 1), fx.get(fxKey).asDouble(), fxKey)
    }
  }

  test("zero-variance guards: skew 0, kurtosis 0, excess −3 (stats.py)") {
    val const = valuesDf(Seq.fill(10)(5.0))
    val row = const.agg(
      Stats.skewnessPop(v), Stats.kurtosisNonExcess(v),
      Stats.kurtosisExcess(v)).collect()(0)
    assertClose(row.getDouble(0), fx.get("const_skew").asDouble(), "skew0")
    assertClose(row.getDouble(1), fx.get("const_kurt").asDouble(), "kurt0")
    assertClose(row.getDouble(2), fx.get("const_kurt_excess").asDouble(),
      "kurtex0")
  }

  test("mode tie-break → smallest value (stats.py:62-94)") {
    val ties = valuesDf(Seq(3.0, 1.0, 2.0, 3.0, 1.0))
    val counts = ties.groupBy(v.as("value")).agg(count(lit(1)).as("cnt"))
    val mode = counts.agg(
      max_by(col("value"), struct(col("cnt"), -col("value")))).collect()(0)
      .getDouble(0)
    assert(mode == fx.get("mode_ties").asDouble())
  }

  test("entropy: epsilon-inside-the-sum form (information.py:10-20)") {
    val x = TokenGen.makeDoc(5, skewed = false).tokens.take(64)
      .map(t => t.toDouble + 1.0)
    assert(x.length == fx.get("entropy_n").asInt())
    val df5 = valuesDf(x.toSeq)
    val total = scalar(df5.agg(sum(v)))
    val h = scalar(df5.agg(sum(Stats.entropyTerm(v, lit(total)))))
    assertClose(h, fx.get("entropy").asDouble(), "entropy")
  }
}
