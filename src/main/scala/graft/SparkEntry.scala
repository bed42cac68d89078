package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's operator inventory (one entry per implemented
  * operator family, SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL the driver runs on the same parquet tables. Column names and
  * rounding are aligned on both sides (see Tables.roundDoubles).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full windowed-feature pipeline (rolling stats per entity). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.qRollingStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.EmbedQueries.all ++
      graft.queries.SeqQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.EmbedQueries.oracle ++
      graft.queries.SeqQueries.oracle
}
