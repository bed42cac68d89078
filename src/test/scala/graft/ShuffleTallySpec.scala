package graft

import graft.core.ShuffleTally
import org.apache.spark.sql.functions._

/** The shuffle tally must attribute bytes to the measured region:
  * a groupBy job writes shuffle data, a map-only job writes none. */
class ShuffleTallySpec extends SparkSpec {

  import spark.implicits._

  test("tally sees shuffle bytes for an aggregation and none for a " +
    "map-only job") {
    val tally = ShuffleTally.install(spark.sparkContext)
    val df = (1 to 20000).map(i => (i % 100, i.toDouble)).toDF("k", "v")

    val (_, agg) = tally.measure(spark.sparkContext) {
      df.groupBy(col("k")).agg(sum(col("v"))).write
        .format("noop").mode("overwrite").save()
    }
    assert(agg.shuffleWriteBytes > 0,
      s"groupBy produced no shuffle bytes: $agg")

    val (_, mapOnly) = tally.measure(spark.sparkContext) {
      df.select(col("k") + 1, col("v") * 2).write
        .format("noop").mode("overwrite").save()
    }
    assert(mapOnly.shuffleWriteBytes == 0,
      s"map-only job tallied shuffle bytes: $mapOnly")
  }
}
