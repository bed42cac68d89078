package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (delete before end of round): embed-neardup-lsh
  * phase timing at bench-like settings. */
object DbgNeardup {
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
    val emb = graft.core.Tables.embeddings(spark, dir)
    t("warm")(noop(emb))
    (1 to 3).foreach { i =>
      t(s"full $i")(noop(DedupQueries.qEmbedNeardupLsh(spark, dir)))
      graft.core.Caches.drain()
      t(s"minhash $i")(noop(DedupQueries.qMinhashLsh(spark, dir)))
      graft.core.Caches.drain()
      t(s"gopher $i")(noop(CurationQueries.qGopherRepetition(spark, dir)))
      graft.core.Caches.drain()
    }
    spark.stop()
  }
}
