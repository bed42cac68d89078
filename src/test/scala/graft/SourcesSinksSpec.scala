package graft

import graft.core.{Sinks, Tables}
import org.apache.spark.sql.functions._

/** Multi-format source reads (graft.source.format) and the bucketed
  * feature-store sink: full-fidelity round-trips and scan-level
  * partition pruning. */
class SourcesSinksSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("csv / json / orc sources round-trip the events table exactly " +
    "(micro timestamps, shortest-repr doubles, sidecar schemas)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val truth = spark.read.parquet(s"$sf/events.parquet")
    val want = canon(truth)
    Seq("csv", "json", "orc").foreach { fmt =>
      Tables.copyTo(spark, sf, "events", dir, fmt)
      spark.conf.set("graft.source.format", fmt)
      try {
        val got = Tables.events(spark, dir)
        assert(got.schema == truth.schema,
          s"$fmt schema drifted: ${got.schema.toDDL}")
        assert(canon(got) == want, s"$fmt round-trip not exact")
      } finally spark.conf.unset("graft.source.format")
    }
    // unknown format fails loudly, not silently-as-parquet
    spark.conf.set("graft.source.format", "avro")
    try intercept[IllegalArgumentException] {
      Tables.events(spark, dir).collect()
    } finally spark.conf.unset("graft.source.format")
  }

  test("DSv2 catalog round-trip: V2 CTAS through createTable, read back " +
    "as a BatchScan via the Tables.t catalog seam — results identical") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.core.GraftParquetCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cat.root", wh)
    try {
      val truth = spark.read.parquet(s"$sf/events.parquet")
      // genuine V2 CTAS: plans CreateTableAsSelect against the catalog
      truth.writeTo("graft_cat.db.events").create()
      assert(new java.io.File(s"$wh/db/events").listFiles()
        .exists(_.getName.endsWith(".parquet")), "CTAS wrote no files")
      // the production seam: Tables.t resolves <catalog>.<db>.<name>
      spark.conf.set("graft.catalog", "graft_cat")
      spark.conf.set("graft.catalog.db", "db")
      val back = try Tables.events(spark, "IGNORED_WHEN_CATALOG_SET")
      finally {
        spark.conf.unset("graft.catalog")
        spark.conf.unset("graft.catalog.db")
      }
      assert(back.schema == truth.schema,
        s"catalog schema drifted: ${back.schema.toDDL}")
      // the read is the DSv2 path (BatchScan), not the V1 file scan
      val plan = back.queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.datasources.v2.BatchScanExec]),
        s"catalog read did not plan a DSv2 BatchScan:\n$plan")
      assert(canon(back) == canon(truth), "catalog round-trip not exact")
      // catalog surface: list / exists / rename / drop
      val cat = spark.sessionState.catalogManager.catalog("graft_cat")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      val ns = Array("db")
      val id = org.apache.spark.sql.connector.catalog.Identifier
        .of(ns, "events")
      assert(cat.listTables(ns).map(_.name).toSeq == Seq("events"))
      assert(cat.tableExists(id))
      val id2 = org.apache.spark.sql.connector.catalog.Identifier
        .of(ns, "events2")
      cat.renameTable(id, id2)
      assert(!cat.tableExists(id) && cat.tableExists(id2))
      assert(canon(spark.read.table("graft_cat.db.events2")) ==
        canon(truth), "rename lost rows")
      assert(cat.dropTable(id2) && !cat.tableExists(id2))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_cat")
      spark.conf.unset("spark.sql.catalog.graft_cat.root")
    }
  }

  test("csv source round-trips hostile text cells: embedded newlines, " +
    "quotes, delimiters (multiLine read path)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val truth = Seq(
      (0L, "plain text"),
      (1L, "line one\nline two\nline three"),
      (2L, "a \"quoted\" phrase, with commas"),
      (3L, "trailing newline\n"),
      (4L, "\n leading, and \"all\" of, it\n mixed"))
      .toDF("doc_id", "text")
    truth.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.copyTo(spark, dir, "documents", dir, "csv")
    spark.conf.set("graft.source.format", "csv")
    try {
      val got = Tables.documents(spark, dir)
      // csv read is always-nullable; compare names+types, not nullability
      assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        truth.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        got.schema.toDDL)
      assert(canon(got) == canon(truth),
        "hostile csv cells bled rows or mangled quotes")
      assert(got.count() == 5, "embedded newlines split records")
    } finally spark.conf.unset("graft.source.format")
  }

  test("bucketed sink: entity rows co-locate in one bucket dir and an " +
    "entity scan prunes partitions at the directory level") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val path = s"$dir/events_store"
    val events = spark.read.parquet(s"$sf/events.parquet")
    Sinks.writeBucketed(events, path, "user_id", "ts", nBuckets = 8)

    val back = spark.read.parquet(path)
    assert(back.count() == events.count(), "row count drifted")
    // every entity maps to exactly one bucket
    val multi = back.groupBy(col("user_id"))
      .agg(countDistinct(col("bucket")).as("nb"))
      .where(col("nb") > 1).count()
    assert(multi == 0, "an entity spans multiple buckets")

    val anyUser = events.select(col("user_id")).head().get(0)
    val scan = Sinks.entityScan(spark, path, "user_id", 8, anyUser)
    val expected = events.where(col("user_id") === lit(anyUser)).count()
    assert(scan.count() == expected, "pruned scan lost rows")
    // a lookup literal of a WIDER type must still hash into the right
    // bucket (murmur3 hashes Int 5 and Long 5 differently — the scan
    // casts to the stored column type first)
    val widened = anyUser match {
      case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
      case other => other
    }
    assert(Sinks.entityScan(spark, path, "user_id", 8, widened).count()
      == expected, "type-widened lookup pruned to the wrong bucket")
    // the partition predicate must reach the scan (directory pruning)
    val plan = scan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
      s"no partition filter in:\n$plan")
  }
}
