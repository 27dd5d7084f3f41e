package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for the 100 TB path: directory partitioning for
  * pruning, bucketing for shuffle-free joins.
  *
  * Partitioning: fact tables laid out as `<root>/<col>=<value>/...` so a
  * filter on the partition column becomes a DIRECTORY listing, not a data
  * scan — `.explain` shows it as `PartitionFilters`, and the scan's
  * "files read" drops to the matching partitions only. Choose low-to-mid
  * cardinality columns (study, event date) — never a unique key, which
  * would produce one file per row.
  *
  * Bucketing: both join sides pre-hashed into the same number of buckets
  * on the join key at WRITE time, so the join at READ time is already
  * co-partitioned — no exchange on either side. This is the standard
  * answer to "this fact-fact join shuffles 100 TB every night": pay the
  * shuffle once when writing, never again. Bucketed tables go through
  * the session catalog (`saveAsTable`) because the bucket metadata lives
  * in the table definition, not the parquet files.
  */
object Layout {

  /** Write `df` partitioned by `cols` (directory layout -> pruning). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Write `df` as a bucketed catalog table on `bucketCol`. Sorting within
    * buckets additionally enables merge-join without a sort. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortBucket: Boolean = true,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(buckets, bucketCol)
    (if (sortBucket) w.sortBy(bucketCol) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Derived day-partition column for event-time layouts. */
  def dayOf(tsCol: String): org.apache.spark.sql.Column =
    to_date(col(tsCol)).as("p_day")

  /** Compact a parquet directory's small files: rewrite to ~`targetBytes`
    * per file (computed from the current on-disk size) via tmp-dir + swap.
    * Incremental appends accumulate one file per task per batch; at scale
    * the scan cost becomes dominated by file-open overhead long before
    * data volume — periodic compaction is the standard fix. Partitioned
    * layouts pass their `partitionCols` so the directory structure (and
    * pruning) survives the rewrite.
    */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    val onDisk = Files.walk(dir).filter(Files.isRegularFile(_))
      .mapToLong(Files.size(_)).sum()
    val nFiles = math.max(1, math.ceil(onDisk.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = Paths.get(path + ".__compact")
    val writer = df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    val old = Paths.get(path + ".__old")
    Files.move(dir, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    Files.walk(old).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
  }
}
