package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (delete before end of round): simhash phase
  * timing at bench-like settings. */
object DbgSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.documents(spark, dir)
    t("warm")(noop(docs))
    (1 to 2).foreach { i =>
      t(s"fp64 agg $i")(noop(DedupQueries.simhash64Fingerprints(docs)))
      t(s"simhash64 full $i")(noop(DedupQueries.qSimhash64(spark, dir)))
      graft.core.Caches.drain()
      t(s"fp16 agg $i")(noop(DedupQueries.simhashFingerprints(docs)))
      t(s"simhash full $i")(noop(DedupQueries.qSimhash(spark, dir)))
      graft.core.Caches.drain()
    }
    spark.stop()
  }
}
