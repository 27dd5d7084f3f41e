package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Parquet-backed warehouse with the reference's three sink disciplines:
  *
  *  - idempotent append  (`ON CONFLICT DO NOTHING`, reference `db.py:41-58`,
  *    `db.py:88-100`)  -> within-batch keep-first dedup + left-anti join
  *    against existing keys, then append;
  *  - merge-upsert      (`ON CONFLICT DO UPDATE`, reference `db.py:110-127`)
  *    -> full-outer join + per-column combine, snapshot rewrite;
  *  - plain append      (reference `db.py:102-107`).
  *
  * Plain parquet has no transactional row-level merge, so merges are
  * copy-on-write snapshot swaps (write `<table>.tmp`, atomic-ish rename).
  * At cluster scale this slots behind the same interface as a Delta/Iceberg
  * `MERGE INTO`, which rewrites only affected files; the operator algebra
  * (anti-join insert set, full-outer combine) is identical. Fact tables are
  * partitioned by `study_id` so a merge or selective read touches only the
  * studies present in the incoming batch.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  private def dir(table: String): Path = Paths.get(root, table)

  def exists(table: String): Boolean = {
    val d = dir(table)
    // _SUCCESS-less empty dirs from failed writes count as absent
    Files.isDirectory(d) && Files.list(d).findFirst().isPresent
  }

  /** Read a table; empty DataFrame with the declared schema when absent. */
  def read(table: String, schema: StructType): DataFrame =
    if (exists(table)) spark.read.schema(schema).parquet(dir(table).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Plain append (quality reports, reference `db.py:102-107`). */
  def append(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir(table).toString)
  }

  /** Idempotent append: `INSERT ... ON CONFLICT (keys) DO NOTHING`.
    *
    * Within-batch duplicates keep the FIRST row by `orderCol` (Postgres
    * keeps the first conflicting row of the statement); cross-batch
    * duplicates are dropped via left-anti join on the existing key set.
    * The anti-join reads only the key columns of the existing table
    * (column-pruned parquet scan).
    */
  def appendIfAbsent(table: String, schema: StructType, df: DataFrame,
                     keys: Seq[String], orderCol: String,
                     partitionBy: Seq[String] = Nil,
                     dedupWithinBatch: Boolean = true): Long = {
    val keyCols = keys.map(col)
    val firstPerKey = if (!dedupWithinBatch) df else
      // keep-FIRST by orderCol, like Postgres keeping the first
      // conflicting row of an INSERT batch. min_by instead of a
      // row_number window: the window shuffles AND sorts the whole batch,
      // while the aggregate partial-combines map-side and carries one
      // buffered row per key through the shuffle. orderCol is unique per
      // key within a batch (file row number), so the argmin is exact.
      df.groupBy(keyCols: _*)
        .agg(min_by(struct(schema.fieldNames.map(col): _*), col(orderCol))
          .as("__first"))
        .select(col("__first.*"))
    val deduped = firstPerKey.select(schema.fieldNames.map(col): _*)
    val fresh =
      if (!exists(table)) deduped
      else deduped.join(
        prunedToIncoming(read(table, schema), deduped,
          partitionBy.filter(keys.contains)).select(keyCols: _*),
        keys, "left_anti")
    // single action: append and count what landed
    val staged = fresh.cache()
    val n = staged.count()
    if (n > 0) append(table, staged, partitionBy)
    staged.unpersist()
    n
  }

  /** Merge-upsert: full-outer combine of the existing table with `incoming`
    * on `keys`, then snapshot-rewrite. `combine` receives (existing,
    * incoming) DataFrames pre-aliased "old"/"new" and must produce the new
    * table contents.
    */
  def mergeReplace(table: String, schema: StructType,
                   incoming: DataFrame,
                   combine: (DataFrame, DataFrame) => DataFrame,
                   partitionBy: Seq[String] = Nil): Unit = {
    val merged =
      if (!exists(table)) incoming
      else combine(read(table, schema).alias("old"), incoming.alias("new"))
    replace(table, merged.select(schema.fieldNames.map(col): _*), partitionBy)
  }

  /** Restrict `existing` to the partition values present in `incoming` —
    * the anti-join/merge scan then prunes to only the directories a batch
    * can possibly conflict with. Valid whenever the partition columns are
    * part of the conflict key (same key => same partition). The distinct
    * partition values are collected to the driver: they are bounded by
    * the batch's partition count (a handful of studies), never by data
    * size. */
  private def prunedToIncoming(existing: DataFrame, incoming: DataFrame,
                               pruneCols: Seq[String]): DataFrame =
    pruneCols.foldLeft(existing) { (d, c) =>
      val vals = incoming.select(col(c)).distinct().collect().map(_.get(0))
      d.filter(col(c).isin(vals: _*))
    }

  /** Partition-scoped merge-upsert: like [[mergeReplace]], but reads and
    * rewrites ONLY the partitions present in the incoming batch — the
    * other partition directories are never opened, never rewritten. This
    * is the property that keeps a nightly merge touching one study's data
    * from re-shuffling a 100 TB warehouse. Requires the partition columns
    * to be a prefix of the merge key semantics (same key => same
    * partition), which holds for every warehouse table here.
    */
  def mergeReplacePartitions(table: String, schema: StructType,
                             incoming: DataFrame,
                             combine: (DataFrame, DataFrame) => DataFrame,
                             partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "use mergeReplace for unpartitioned tables")
    if (!exists(table)) {
      replace(table, incoming.select(schema.fieldNames.map(col): _*), partitionCols)
      return
    }
    val scoped = prunedToIncoming(read(table, schema), incoming, partitionCols)
    val merged = combine(scoped.alias("old"), incoming.alias("new"))
      .select(schema.fieldNames.map(col): _*)
    // write the merged scope to a tmp dir, then swap ONLY those partition
    // directories into the live table (same no-self-overwrite discipline
    // as replace(), at partition granularity)
    val tmp = Paths.get(root, table + ".__ptmp")
    deleteRecursively(tmp)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
      .parquet(tmp.toString)
    partitionDirs(tmp, partitionCols.length).foreach { rel =>
      val target = dir(table).resolve(rel)
      val old = Paths.get(target.toString + ".__old")
      deleteRecursively(old)
      Files.createDirectories(target.getParent)
      if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
      Files.move(tmp.resolve(rel), target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
    }
    deleteRecursively(tmp)
  }

  /** Relative `col=value[/col=value...]` paths of the leaf partition dirs
    * under `base`, `depth` partition levels deep. */
  private def partitionDirs(base: Path, depth: Int): Seq[Path] = {
    def walk(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else Files.list(p).iterator().asScala.toSeq
        .filter(q => Files.isDirectory(q) && q.getFileName.toString.contains("="))
        .flatMap(walk(_, d - 1))
    walk(base, depth).map(base.relativize)
  }

  /** Overwrite a table via tmp-dir + swap so we never read and clobber the
    * same files in one job (parquet self-overwrite is undefined). */
  def replace(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val tmp = Paths.get(root, table + ".__tmp")
    deleteRecursively(tmp)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    val target = dir(table)
    val old = Paths.get(root, table + ".__old")
    deleteRecursively(old)
    if (Files.exists(target)) Files.move(target, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
