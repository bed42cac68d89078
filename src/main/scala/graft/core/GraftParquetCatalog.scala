package graft.core

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A real DataSourceV2 `TableCatalog` backed by parquet directories —
  * the local stand-in for the production Iceberg catalog (SURVEY §2.0:
  * no iceberg-spark-runtime jar ships in `/opt/spark/jars`, so the
  * catalog-read seam in [[Tables.t]] was untestable through round 4).
  * Registering
  *
  * {{{
  * spark.sql.catalog.<name>      = graft.core.GraftParquetCatalog
  * spark.sql.catalog.<name>.root = /path/to/warehouse
  * }}}
  *
  * makes `<name>.<db>.<table>` resolve through the standard V2 catalog
  * machinery: `spark.read.table` plans a DSv2 `BatchScan` (not the V1
  * file path), `df.writeTo(...).create()` runs a genuine V2 CTAS
  * through [[createTable]] + the table's WriteBuilder. Tables are
  * `ParquetTable` (Spark's own DSv2 FileTable), one directory per
  * identifier under `root/<namespace...>/<table>`; schema comes from
  * the parquet footers on load. This proves the engine's read/write
  * path is catalog-agnostic — swapping in Iceberg is a config change.
  *
  * Scope: list/load/create/drop/rename; `alterTable` is unsupported
  * (the engine never evolves schemas in place — stages write new
  * tables).
  */
class GraftParquetCatalog extends TableCatalog {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catName

  private def fs(p: Path) = p.getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  private def dirOf(ident: Identifier): Path =
    new Path((root +: ident.namespace.toSeq :+ ident.name)
      .mkString(Path.SEPARATOR))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((root +: namespace.toSeq).mkString(Path.SEPARATOR))
    val f = fs(ns)
    if (!f.exists(ns)) Array.empty
    else f.listStatus(ns).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    fs(d).exists(d)
  }

  override def loadTable(ident: Identifier): Table = {
    val d = dirOf(ident)
    if (!fs(d).exists(d)) throw new NoSuchTableException(ident)
    ParquetTable(ident.name, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(d.toString), None,
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "GraftParquetCatalog does not support partition transforms")
    val d = dirOf(ident)
    val f = fs(d)
    if (f.exists(d)) throw new TableAlreadyExistsException(ident)
    f.mkdirs(d)
    // the CTAS write goes through this returned table's WriteBuilder;
    // the declared schema seeds it (later loads infer from footers)
    ParquetTable(ident.name, SparkSession.active,
      CaseInsensitiveStringMap.empty(), Seq(d.toString), Some(schema),
      classOf[ParquetFileFormat])
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "GraftParquetCatalog tables are immutable — write a new table")

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    val f = fs(d)
    f.exists(d) && f.delete(d, true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val (o, n) = (dirOf(oldIdent), dirOf(newIdent))
    val f = fs(o)
    if (!f.exists(o)) throw new NoSuchTableException(oldIdent)
    if (f.exists(n)) throw new TableAlreadyExistsException(newIdent)
    f.mkdirs(n.getParent)
    f.rename(o, n)
  }
}
