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
  * WRITES route through [[Warehouse]], never around it: `INSERT INTO`
  * lowers to [[Warehouse.append]], `INSERT OVERWRITE` to
  * [[Warehouse.replace]], `CREATE TABLE` / CTAS commit an empty
  * generation then insert, and `DROP TABLE` is [[Warehouse.drop]] — so
  * every SQL mutation gets the same single-writer lock, fresh-
  * generation write, and atomic pointer/catalog flip as the
  * programmatic API, and time travel keeps working across SQL commits.
  * The lowering is the DSv2 V1Write bridge: the insert arrives as one
  * DataFrame and the Warehouse owns the actual file layout (a writer
  * that streamed parquet straight into a generation directory would
  * bypass the commit protocol). ADDITIVE schema evolution (`ALTER
  * TABLE ... ADD COLUMN`) commits a widened generation with zero data
  * rewrite ([[Warehouse.widen]]); every other evolution (drop, rename,
  * retype, reposition), table renames, and partition transforms in
  * `CREATE TABLE` stay unsupported and refuse loudly.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var format: String = "parquet"
  private var retention: Int = 2

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"set spark.sql.catalog.$name.root to a graft warehouse directory"))
    format = Option(options.get("format")).getOrElse("parquet")
    // MUST match the programmatic writers' retention: every commit GCs
    // manifest versions past its own horizon, so a catalog committing
    // with a shorter one would age out versions a longer-retention
    // Warehouse handle still promises for time travel
    retention = Option(options.get("retention")).map(_.toInt).getOrElse(2)
  }

  override def name(): String = catalogName

  // resolution state lives on disk; the Warehouse handle is stateless and
  // cheap, so construct per call against the active session
  private def wh = new Warehouse(SparkSession.active, root,
    catalogRetention = retention, format = format)

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
    loadTable(ident)

  private def resolved(ident: Identifier, dir: Option[Path]): Table = {
    requireDefaultNs(ident.namespace())
    dir match {
      case Some(d) =>
        // a generation evolved by Warehouse.widen mixes narrow and wide
        // footers; the marker switches inference to footer-merge so the
        // widened schema (with null-filled added columns) is what SQL
        // sees. Pre-evolution generations (time travel) have no marker
        // and read their own narrow schema at one-footer cost. A
        // PARTITIONED widened generation's added columns live only in
        // the _graft_schema sidecar (hidden from discovery and from
        // footer merging), so its resolution is explicit: sidecar data
        // schema + the discovered partition columns.
        val widened = Files.exists(d.resolve(Warehouse.WidenedMarker))
        val sidecar = d.resolve(Warehouse.SchemaSidecar)
        val explicitSchema =
          if (!widened || !Files.exists(sidecar)) None
          else {
            val spark = SparkSession.active
            val dataSchema =
              spark.read.format(format).load(sidecar.toString).schema
            val partCols = spark.read.format(format).load(d.toString)
              .schema.fields.filterNot(f =>
                dataSchema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
            Some(org.apache.spark.sql.types.StructType(
              dataSchema.fields ++ partCols))
          }
        new WritableGraftTable(
          ParquetTableBridge.create(s"$catalogName.${ident.name()}",
            SparkSession.active, d.toString, format,
            mergeSchema = widened && explicitSchema.isEmpty,
            schema = explicitSchema),
          ident.name(), () => wh, d)
      case None => throw new NoSuchTableException(ident)
    }
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"catalog '$catalogName' does not support this operation: mutate " +
      "through graft.etl.Warehouse")

  /** `CREATE TABLE` / the create leg of CTAS: commit an EMPTY generation
    * carrying the declared schema through the normal Warehouse commit
    * (FileFormatWriter always emits at least one schema-bearing file, so
    * the parquet footer IS the stored schema); CTAS's insert then lands
    * through the returned table's write path. Partition transforms are
    * refused — partitioned layouts are a Warehouse write option, not a
    * table property the SQL surface can guarantee on later inserts. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    requireDefaultNs(ident.namespace())
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      s"catalog '$catalogName' does not support partition transforms in " +
        "CREATE TABLE; write partitioned data through Warehouse.append/replace")
    // TBLPROPERTIES have nowhere to live (generations carry data, not
    // metadata) — refusing loudly beats dropping them on the floor.
    // Spark itself injects reserved keys (provider/owner) on every
    // CREATE; only those pass.
    val userProps = properties.keySet().asScala
      .filterNot(Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER))
    if (userProps.nonEmpty) throw new UnsupportedOperationException(
      s"catalog '$catalogName' does not support table properties: " +
        userProps.toSeq.sorted.mkString(", "))
    val spark = SparkSession.active
    // exists-check and first-generation commit under ONE lock hold —
    // two racing CREATE/CTAS statements must not both pass and merge
    val created = wh.createIfAbsent(ident.name(),
      spark.createDataFrame(new util.ArrayList[org.apache.spark.sql.Row](),
        schema))
    if (!created) throw new org.apache.spark.sql.catalyst.analysis
      .TableAlreadyExistsException(Seq(catalogName, ident.name()))
    loadTable(ident)
  }

  /** `ALTER TABLE ... ADD COLUMN(S)` — the one schema evolution a
    * 100 TB generation-committed warehouse supports naturally: the new
    * generation hard-links the old files and adds ONE zero-row file
    * carrying the widened schema ([[Warehouse.widen]] — no data
    * rewrite); readers footer-merge and null-fill. Everything else
    * (drops, renames, type changes, repositioning, comments) would
    * require rewriting or re-interpreting committed files and is
    * refused loudly. Added columns must be top-level nullable, appended
    * at the end (parquet has no column order to renegotiate). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    requireDefaultNs(ident.namespace())
    val adds = changes.map {
      case a: TableChange.AddColumn => a
      case other => throw new UnsupportedOperationException(
        s"catalog '$catalogName' supports only ADD COLUMN in ALTER " +
          s"TABLE, not ${other.getClass.getSimpleName}; rewrite through " +
          "graft.etl.Warehouse.replace")
    }
    val newCols = StructType(adds.map { a =>
      if (a.fieldNames().length != 1) throw new UnsupportedOperationException(
        s"catalog '$catalogName' supports only top-level ADD COLUMN, " +
          s"not nested field ${a.fieldNames().mkString(".")}")
      if (a.position() != null) throw new UnsupportedOperationException(
        s"catalog '$catalogName' appends added columns at the end; " +
          "FIRST/AFTER would re-order committed parquet files")
      if (!a.isNullable) throw new UnsupportedOperationException(
        s"added column ${a.fieldNames()(0)} must be nullable — existing " +
          "rows have nothing to backfill it with but null")
      val f = org.apache.spark.sql.types
        .StructField(a.fieldNames()(0), a.dataType(), nullable = true)
      if (a.comment() != null) f.withComment(a.comment()) else f
    }.toArray)
    wh.widen(ident.name(), newCols)
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean = {
    requireDefaultNs(ident.namespace())   // same error surface as loads
    wh.drop(ident.name())
  }
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

/** The catalog's table handle: reads delegate wholesale to the stock
  * file-source table pinned at its one immutable generation directory;
  * writes go through the DSv2 V1Write bridge, where the insert arrives
  * as a single DataFrame and lowers onto [[Warehouse.append]] (INSERT
  * INTO) or [[Warehouse.replace]] (INSERT OVERWRITE / truncate) — the
  * Warehouse, not Spark's file committer, owns file layout, locking and
  * the atomic generation flip. `BATCH_WRITE` is deliberately absent from
  * the capability set (and `V1_BATCH_WRITE` present) so planning can
  * only ever choose the bridge path. */
private final class WritableGraftTable(delegate: Table, tableName: String,
                                       wh: () => Warehouse, genDir: Path)
    extends Table with SupportsRead with SupportsWrite {
  import org.apache.spark.sql.connector.write._
  import org.apache.spark.sql.connector.read.ScanBuilder

  override def name(): String = delegate.name()
  override def schema(): StructType = delegate.schema()
  override def partitioning(): Array[Transform] = delegate.partitioning()
  override def properties(): util.Map[String, String] = delegate.properties()

  override def capabilities(): util.Set[TableCapability] = {
    val caps = new util.HashSet[TableCapability](delegate.capabilities())
    caps.remove(TableCapability.BATCH_WRITE)
    caps.add(TableCapability.V1_BATCH_WRITE)
    caps.add(TableCapability.TRUNCATE)
    caps.add(TableCapability.OVERWRITE_BY_FILTER)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.asInstanceOf[SupportsRead].newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a partitioned generation (col=value subdirectories, written
    // programmatically with partitionBy) cannot take an unpartitioned
    // SQL batch: the new files would land at the generation root beside
    // the partition dirs — a mixed layout partition discovery rejects,
    // with the old rows' partition values living only in dir names.
    // Refuse loudly, like createTable refuses partition transforms.
    val partitioned = Files.isDirectory(genDir) &&
      Warehouse.listDir(genDir).exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.contains("="))
    if (partitioned) throw new UnsupportedOperationException(
      s"table '$tableName' has a partitioned layout; SQL INSERT cannot " +
        "preserve it — write through Warehouse.append/replace with " +
        "partitionBy")
    new WriteBuilder with SupportsOverwrite {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter])
          : WriteBuilder =
        if (filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue))
          truncate()
        else throw new UnsupportedOperationException(
          "graft tables support whole-table INSERT OVERWRITE only; " +
            "row-level overwrites go through Warehouse.mergeReplace")
      override def build(): Write = new V1Write {
        override def toInsertableRelation
            : org.apache.spark.sql.sources.InsertableRelation =
          new org.apache.spark.sql.sources.InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                                ignored: Boolean): Unit =
              if (overwrite) wh().replace(tableName, data)
              else wh().append(tableName, data)
          }
      }
    }
  }
}
