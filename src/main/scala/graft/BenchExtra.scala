package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Supplementary bench (guide §1.4): per-query noop-sink isolation with
  * STRUCTURAL metrics a noisy shared host cannot distort — Spark job
  * count, stage count, task count, shuffle bytes — plus wall time for
  * reference. The frozen `graft.Bench` is the driver's instrument; this
  * main exists for optimization work: sequential job/stage counts are
  * the dominant cost at gate scale and the fleet-level lever at 100 TB
  * (every stage is a scheduling barrier; every job is a driver
  * round-trip). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_REPS (timed reps after one warm-up, default 1),
  * SPARK_GRAFT_QUERIES (comma list; default all).
  */
object BenchExtra {

  private final class Tally extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs += 1; stages += j.stageInfos.size
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    val shuffle = graft.core.ShuffleTally.install(spark.sparkContext)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        spark.sparkContext.setJobDescription(name)
        def one(): Double = {
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[extra] $name failed: ${e.getMessage}") }
          val s = (System.nanoTime() - t0) / 1e9
          graft.core.Caches.drain()
          s
        }
        one() // warm-up (JIT + codegen + store staging)
        val (j0, s0, k0) = (tally.jobs, tally.stages, tally.tasks)
        val (times, delta) = {
          val (ts, d) = shuffle.measure(spark.sparkContext) {
            (1 to reps).map(_ => one())
          }
          (ts, d)
        }
        val (j1, s1, k1) = (tally.jobs, tally.stages, tally.tasks)
        (name, times.min,
          (j1 - j0) / reps, (s1 - s0) / reps, (k1 - k0) / reps,
          delta.shuffleWriteBytes / 1e6 / reps)
      }
    println("query,secs_min,jobs,stages,tasks,shuffle_mb")
    rows.foreach { case (n, t, j, s, k, sh) =>
      println(f"$n,$t%.2f,$j,$s,$k,$sh%.2f")
    }
    spark.stop()
  }
}
