package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge into Spark's built-in parquet DataSource V2 table. The graft
  * SQL catalog resolves a warehouse table to one immutable generation
  * directory and then delegates ALL read machinery — schema/partition
  * inference, filter pushdown, column pruning, vectorized scans — to the
  * stock `ParquetTable`, rather than re-implementing a file scan. The
  * class is public bytecode but lives in an `execution` package, so the
  * construction sits here with the other `org.apache.spark.sql`
  * internals bridges. */
object ParquetTableBridge {
  def create(name: String, spark: SparkSession, path: String): Table = {
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", path)
    ParquetTable(name, spark, new CaseInsensitiveStringMap(opts),
      Seq(path), userSpecifiedSchema = None,
      fallbackFileFormat = classOf[ParquetFileFormat])
  }
}
