package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.orc.OrcTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into Spark's built-in file DataSource V2 tables. The graft
  * SQL catalog resolves a warehouse table to one immutable generation
  * directory and then delegates ALL read machinery — schema/partition
  * inference, filter pushdown, column pruning, vectorized scans — to the
  * stock `ParquetTable`/`OrcTable`, rather than re-implementing a file
  * scan. The classes are public bytecode but live in `execution`
  * packages, so the construction sits here with the other
  * `org.apache.spark.sql` internals bridges. */
object ParquetTableBridge {
  /** `mergeSchema` unions the footers at schema inference — required
    * for generations evolved by `Warehouse.widen`, where pre-evolution
    * files lack the added columns and a single arbitrary footer would
    * otherwise decide the table's SQL schema. Off by default: the
    * catalog turns it on only for generations carrying the widened
    * marker, so unevolved tables keep one-footer resolution cost.
    * `schema` overrides inference entirely (partition columns included)
    * — the catalog passes it for PARTITIONED widened generations, whose
    * added columns live in a sidecar no footer merge can see. */
  def create(name: String, spark: SparkSession, path: String,
             format: String = "parquet",
             mergeSchema: Boolean = false,
             schema: Option[org.apache.spark.sql.types.StructType] = None)
      : Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    if (mergeSchema) opts.put("mergeSchema", "true")
    val map = new CaseInsensitiveStringMap(opts)
    format match {
      case "parquet" =>
        ParquetTable(name, spark, map, Seq(path), userSpecifiedSchema = schema,
          fallbackFileFormat = classOf[ParquetFileFormat])
      case "orc" =>
        OrcTable(name, spark, map, Seq(path), userSpecifiedSchema = schema,
          fallbackFileFormat = classOf[OrcFileFormat])
      case other =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
  }
}
