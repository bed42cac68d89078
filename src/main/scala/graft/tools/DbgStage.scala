package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DbgStage {
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
    // warm the JVM on an unrelated job first
    t("warm scan")(spark.read.parquet(s"$dir/documents.parquet").write
      .format("noop").mode("overwrite").save())
    t("warm write")(spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet("/tmp/dbg_warm_out"))
    val p = "/tmp/dbg_stage_store"
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
    val sh = DedupQueries.shingleHashes(
      graft.core.Tables.documents(spark, dir))
    t("shingle write")(
      graft.core.Sinks.writeBucketed(sh, s"$p/shingles", "doc_id", "shh", 32))
    val shBack = spark.read.parquet(s"$p/shingles")
      .select(col("doc_id"), col("shh"))
    t("sig write")(
      graft.core.Sinks.writeBucketed(DedupQueries.signatures(shBack),
        s"$p/signatures", "doc_id", "doc_id", 32))
    // warm repeats: cost with JIT/codegen already warm
    fs.delete(new org.apache.hadoop.fs.Path(p + "2"), true)
    t("shingle write warm 32b")(
      graft.core.Sinks.writeBucketed(sh, s"${p}2/shingles", "doc_id", "shh", 32))
    fs.delete(new org.apache.hadoop.fs.Path(p + "3"), true)
    t("shingle write warm 4b")(
      graft.core.Sinks.writeBucketed(sh, s"${p}3/shingles", "doc_id", "shh", 4))
    val shBack3 = spark.read.parquet(s"${p}3/shingles")
      .select(col("doc_id"), col("shh"))
    t("sig write warm 4b")(
      graft.core.Sinks.writeBucketed(DedupQueries.signatures(shBack3),
        s"${p}3/signatures", "doc_id", "doc_id", 4))
    t("kmv after")(CurationQueries.qDistinctKmv(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("kmv warm")(CurationQueries.qDistinctKmv(spark, dir)
      .write.format("noop").mode("overwrite").save())
    graft.core.Caches.drain()
    spark.stop()
  }
}
