package graft

import graft.pipeline.FeaturePipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: dump formatted physical plans of the flagship pipeline and
  * representative queries — the plan-review artifact (PLANS_r1.md). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      // preserve cached-plan partitioning so the as-of join reuses the
      // entity layout instead of re-exchanging (Spark 4 default runs AQE
      // over caches, discarding their partitioning)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }

    val points = spark.read.parquet("/tmp/graft_bench_tokens_40000")
      .select(col("doc_id").as("entity_id"),
        posexplode(col("tokens")).as(Seq("pos", "tok")))
      .select(col("entity_id"), col("pos").cast("long").as("ts"),
        col("tok").cast("double").as("value"))
    val cfg = FeaturePipeline.Config(64L, 32L, 4L, 8L, Some(128L))
    dump("flagship_pipeline",
      FeaturePipeline.run(spark, points, "entity_id", "ts", "value", cfg))
    dump("pushdown_probe",
      graft.core.Tables.lineitem(spark, sf)
        .where(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_quantity")))
    dump("q_feature_pipeline",
      graft.queries.PipelineQueries.qFeaturePipeline(spark, sf))
    spark.stop()
  }
}
