package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time and/or explain individual SparkEntry queries.
  *
  * Usage: runMain graft.QTime <sfDir> <query>[,<query>...] [--explain]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_REPS (default 2; the
  * first pass is an untimed warm-up, remaining passes print secs each).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val explain = args.contains("--explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) {
        println(s"\n===== $name =====")
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        graft.core.Caches.drain() // query-scoped caches (see Caches)
        graft.core.Caches.assertEmpty(spark)
        if (r > 1) println(f"$name run$r: $s%.2f s")
        else println(f"$name warmup: $s%.2f s")
      }
    }
    spark.stop()
  }
}
