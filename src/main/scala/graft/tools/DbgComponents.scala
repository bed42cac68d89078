package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (delete before end of round): phase timing for
  * q_dup_components. */
object DbgComponents {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
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
    val store = t("stage store")(
      DedupQueries.minhashStore(spark, dir))
    t("pairs materialize")(
      graft.queries.DedupQueries.qMinhashLsh(spark, dir)
        .write.format("noop").mode("overwrite").save())
    graft.core.Caches.drain()
    (1 to 2).foreach { i =>
      val df = t(s"builder $i")(
        graft.queries.DedupQueries.qDupComponents(spark, dir))
      t(s"materialize $i (rounds=${graft.operators.Components.lastRounds})")(
        df.write.format("noop").mode("overwrite").save())
      graft.core.Caches.drain()
    }
    spark.stop()
  }
}
