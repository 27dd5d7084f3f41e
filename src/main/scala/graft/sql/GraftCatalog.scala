package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graftbridge.ParquetTableBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.etl.Warehouse
import java.nio.file.{Files, Path, Paths}
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 catalog over a graft [[Warehouse]] — the warehouse's
  * tables as first-class SQL relations:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.root = /path/to/warehouse
  *
  *   SELECT * FROM graft.corpus WHERE lang = 'en'
  *   SELECT * FROM graft.corpus VERSION AS OF 7      -- catalog time travel
  *   SHOW TABLES IN graft
  * }}}
  *
  * Resolution is snapshot-isolated exactly like the programmatic API:
  * `loadTable` pins the table's live generation directory (or, for
  * `VERSION AS OF n`, the directory the retained catalog-manifest
  * version `n` recorded — [[Warehouse.snapshotAt]]), and every later
  * commit flips pointers to NEW directories, so a running SQL query can
  * never observe a half-swapped table. The scan itself is the stock
  * parquet DSv2 table over that one immutable directory — full filter
  * pushdown, column pruning, and vectorized reads for free.
  *
  * The catalog is deliberately READ-ONLY: warehouse mutations must go
  * through [[Warehouse]]'s append/merge/replace commits, which enforce
  * the single-writer lock, generation flips, and transactional catalog.
  * A SQL `INSERT` writing parquet straight into a generation directory
  * would bypass all three, so every write path here refuses loudly.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var format: String = "parquet"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"set spark.sql.catalog.$name.root to a graft warehouse directory"))
    format = Option(options.get("format")).getOrElse("parquet")
  }

  override def name(): String = catalogName

  // resolution state lives on disk; the Warehouse handle is stateless and
  // cheap, so construct per call against the active session
  private def wh = new Warehouse(SparkSession.active, root, format = format)

  private def requireDefaultNs(ns: Array[String]): Unit =
    if (ns.nonEmpty) throw new NoSuchNamespaceException(ns)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireDefaultNs(namespace)
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) Array.empty
    else {
      val w = wh
      Warehouse.listDir(dir)
        .filter(Files.isDirectory(_))
        .map(_.getFileName.toString)
        .filterNot(_.startsWith("_"))     // _catalog and friends
        .filter(w.exists)
        .map(t => Identifier.of(Array.empty, t))
        .toArray
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && wh.exists(ident.name())

  override def loadTable(ident: Identifier): Table =
    resolved(ident, wh.currentDir(ident.name()))

  /** `VERSION AS OF n` — resolve through retained catalog-manifest
    * version `n`. Non-numeric versions and tables outside the manifest
    * are unknown; versions beyond the retention horizon raise with the
    * horizon in the message. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val v =
      try version.toLong
      catch { case _: NumberFormatException => throw new NoSuchTableException(ident) }
    resolved(ident, wh.snapshotAt(v).currentDir(ident.name()))
  }

  /** `TIMESTAMP AS OF t` — the newest retained commit at or before `t`
    * (manifest versions record their commit wall-clock). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val v = wh.versionAt(timestampMicros / 1000L).getOrElse(
      throw new NoSuchTableException(ident))
    resolved(ident, wh.snapshotAt(v).currentDir(ident.name()))
  }

  override def loadTable(ident: Identifier,
                         privileges: util.Set[TableWritePrivilege]): Table =
    throw new UnsupportedOperationException(
      s"catalog '$catalogName' is read-only: write through graft.etl.Warehouse " +
        "(append/merge/replace), which enforces the single-writer lock and " +
        "atomic generation commits")

  private def resolved(ident: Identifier, dir: Option[Path]): Table = {
    requireDefaultNs(ident.namespace())
    dir match {
      case Some(d) =>
        ParquetTableBridge.create(s"$catalogName.${ident.name()}",
          SparkSession.active, d.toString, format)
      case None => throw new NoSuchTableException(ident)
    }
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"catalog '$catalogName' is read-only: mutate through graft.etl.Warehouse")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = readOnly

  // single flat namespace: the warehouse root
  override def defaultNamespace(): Array[String] = Array.empty
  override def listNamespaces(): Array[Array[String]] = Array(Array.empty[String])
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireDefaultNs(namespace)
    Array.empty
  }
  override def namespaceExists(namespace: Array[String]): Boolean = namespace.isEmpty
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireDefaultNs(namespace)
    new util.HashMap[String, String]()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = readOnly
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = readOnly
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = readOnly
}
