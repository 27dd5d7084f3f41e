package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Morton (Z-order) code: interleave the low `bits` bits of two
    * non-negative integer dimensions, bit i of x landing at position 2i
    * and bit i of y at 2i+1. Built from shift/and/add only (the summed
    * bit positions are disjoint, so + IS bitwise-or) — every term is
    * engine-portable integer arithmetic that an external SQL engine
    * replays bit-identically.
    *
    * Inputs outside `[0, 2^bits)` are CLAMPED to the nearest boundary
    * before interleaving (monotone saturation, `greatest`/`least` —
    * still portable integer ops). Silent truncation would interleave
    * the dropped high bits' neighbours into the same code and quietly
    * degrade the clustering to near-random; clamping instead collapses
    * the out-of-range tail into the boundary bucket, which keeps every
    * in-range code exact and the layout's pruning intact. Domains wider
    * than `bits` bits should still be mapped down by the caller (the
    * boundary bucket absorbs the whole tail otherwise). */
  def mortonCode(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits")
    val hi = lit((1L << bits) - 1)
    val xc = least(greatest(x.cast("long"), lit(0L)), hi)
    val yc = least(greatest(y.cast("long"), lit(0L)), hi)
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xc, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yc, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Z-order clustering: range-partition and sort by the Morton code of
    * two dimensions, so every output file covers a TIGHT 2-D bounding
    * box and parquet min/max stats prune scans filtered on EITHER (or
    * both) dimension. A 1-D sort layout gives perfect pruning on its
    * sort column and none on the second; Z-order trades a little of the
    * first dimension's locality for bounded ranges in both — the
    * standard answer to "this 100 TB table is filtered by two columns
    * and we can only sort by one". The range partitioning samples the
    * z-value distribution, so skewed dimensions still split evenly. */
  def zorderBy(df: DataFrame, x: org.apache.spark.sql.Column,
               y: org.apache.spark.sql.Column,
               numFiles: Int, bits: Int = 16): DataFrame = {
    // the z-value rides the partitioner and sort as an expression, so
    // the caller's schema passes through untouched (a temp column would
    // silently clobber a same-named input column)
    val z = mortonCode(x, y, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** [[zorderBy]] + write: one parquet file per range, each with tight
    * two-dimensional min/max stats. */
  def writeZordered(df: DataFrame, path: String,
                    x: org.apache.spark.sql.Column,
                    y: org.apache.spark.sql.Column,
                    numFiles: Int, bits: Int = 16,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    zorderBy(df, x, y, numFiles, bits).write.mode(mode).parquet(path)

  /** Compact a parquet directory's small files: rewrite to ~`targetBytes`
    * per file (computed from the current on-disk size) via tmp-dir + swap.
    * Incremental appends accumulate one file per task per batch; at scale
    * the scan cost becomes dominated by file-open overhead long before
    * data volume — periodic compaction is the standard fix. Partitioned
    * layouts pass their `partitionCols` so the directory structure (and
    * pruning) survives the rewrite.
    *
    * All filesystem access goes through the Hadoop `FileSystem` API
    * resolved from the path's scheme, so the same call works on local
    * disk, HDFS, or an object store (where `rename` is a copy, not
    * atomic — callers needing atomicity on S3-style stores should
    * compact behind a table-format commit instead). */
  def compact(spark: SparkSession, path: String,
              partitionCols: Seq[String] = Nil,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    var onDisk = 0L
    val it = fs.listFiles(dir, true)
    while (it.hasNext) { val st = it.next(); if (st.isFile) onDisk += st.getLen }
    val nFiles = math.max(1, math.ceil(onDisk.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = new Path(path + ".__compact")
    val writer = df.repartition(nFiles).write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    val old = new Path(path + ".__old")
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compact: rename $dir -> $old failed")
    if (!fs.rename(tmp, dir)) { // roll back so the data stays readable
      fs.rename(old, dir)
      throw new java.io.IOException(s"compact: rename $tmp -> $dir failed")
    }
    fs.delete(old, true)
  }
}
