package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.charset.StandardCharsets.UTF_8
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
  * Snapshot isolation: every table is a set of immutable GENERATION
  * directories plus a tiny `_current` pointer file naming the live one —
  * the same shape as a Delta/Iceberg version pointer, which is how the
  * reference's transactional visibility (Postgres, `db.py:12-17`) maps
  * onto plain parquet. Writers assemble the next generation off to the
  * side — rewritten partitions written fresh, untouched partitions
  * carried over as hard links (O(touched-partition) data, O(files)
  * metadata; the local analogue of manifest reuse) — then flip
  * `_current` with ONE atomic rename. Readers resolve `_current` once
  * per read, so a query planned before a merge keeps its entire
  * pre-merge snapshot and can never observe a half-swapped table. The
  * superseded generation is retained for one flip (older ones are GC'd),
  * bounding staleness for in-flight readers. Concurrent WRITERS to one
  * table are out of scope, as in the reference's one-ETL-service design —
  * and enforced: every mutation runs under a per-table pid lock file
  * (stale locks of crashed writers are taken over), so a second live
  * writer fails fast instead of interleaving flips and GC.
  * Fact tables are partitioned by `study_id` so a merge or selective
  * read touches only the studies present in the incoming batch.
  */
final class Warehouse(spark: SparkSession, val root: String) {

  private def tableRoot(table: String): Path = Paths.get(root, table)
  private def ptrPath(table: String): Path = tableRoot(table).resolve("_current")

  /** The live generation's data directory, if the table exists. */
  def currentDir(table: String): Option[Path] = {
    val p = ptrPath(table)
    if (!Files.exists(p)) None
    else Some(tableRoot(table).resolve(new String(Files.readAllBytes(p), UTF_8).trim))
  }

  def exists(table: String): Boolean = currentDir(table).isDefined

  /** Read a table; empty DataFrame with the declared schema when absent.
    * The snapshot is pinned at this call: later merges flip `_current` to
    * a NEW directory and never mutate the one this scan resolved. */
  def read(table: String, schema: StructType): DataFrame =
    currentDir(table) match {
      case Some(d) => spark.read.schema(schema).parquet(d.toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  // --------------------------------------------------------- writer locking

  /** Single-writer guard. Concurrent writers to one table are out of
    * scope (the reference is one ETL service), but a misconfigured second
    * writer must fail FAST — two interleaved commits could GC a
    * generation a reader pinned. Every mutating entry point runs under:
    *
    *  - an in-process reentrant lock per table path (so nested calls —
    *    appendIfAbsent → append → replace — re-enter, and two threads of
    *    ONE process serialize instead of failing); and
    *  - a cross-process lock FILE created atomically (`CREATE_NEW`)
    *    holding the owner pid. A lock whose owner process is gone — a
    *    crashed writer's leftover — is taken over; a lock held by a LIVE
    *    other process raises, loudly, before anything is touched.
    */
  private def withTableLock[T](table: String)(f: => T): T = {
    val local = Warehouse.localLock(tableRoot(table).toAbsolutePath.toString)
    local.lock()
    try {
      if (local.getHoldCount > 1) f       // nested call: outer frame owns the file lock
      else {
        Files.createDirectories(tableRoot(table))
        val lockFile = tableRoot(table).resolve("_lock")
        val pid = ProcessHandle.current().pid()
        def tryAcquire(): Boolean =
          try {
            Files.write(lockFile, pid.toString.getBytes(UTF_8),
              java.nio.file.StandardOpenOption.CREATE_NEW)
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        if (!tryAcquire()) {
          val owner =
            try new String(Files.readAllBytes(lockFile), UTF_8).trim.toLong
            catch { case _: Exception => -1L }
          val ownerAlive = owner > 0 && owner != pid &&
            ProcessHandle.of(owner).isPresent && ProcessHandle.of(owner).get().isAlive
          if (ownerAlive) throw new IllegalStateException(
            s"table '$table' is locked by live writer pid $owner ($lockFile); " +
              "concurrent writers to one table are not supported")
          Files.deleteIfExists(lockFile)  // stale: crashed writer (or our own pid)
          if (!tryAcquire()) throw new IllegalStateException(
            s"lost the takeover race for stale lock $lockFile")
        }
        try f finally Files.deleteIfExists(lockFile)
      }
    } finally local.unlock()
  }

  // ------------------------------------------------------ generation plumbing

  private def genName(p: Path): String = p.getFileName.toString

  private def nextGenDir(table: String): Path = {
    val seq = currentDir(table)
      .map(d => genName(d).stripPrefix("g").toLong + 1).getOrElse(1L)
    tableRoot(table).resolve(f"g$seq%09d")
  }

  /** Atomically flip `_current` to `newGen`, then GC every generation
    * except the new one and its immediate predecessor (kept so reads
    * planned just before the flip stay valid). */
  private def commit(table: String, newGen: Path): Unit = {
    val keep = (currentDir(table).map(genName) ++ Seq(genName(newGen))).toSet
    val tmp = tableRoot(table).resolve("_current.tmp")
    Files.write(tmp, genName(newGen).getBytes(UTF_8))
    Files.move(tmp, ptrPath(table), StandardCopyOption.ATOMIC_MOVE)
    Files.list(tableRoot(table)).iterator().asScala.toList
      .filter(p => Files.isDirectory(p) && genName(p).startsWith("g") &&
        !keep(genName(p)))
      .foreach(deleteRecursively)
  }

  /** Hard-link `src`'s tree into `dst`, skipping relative paths accepted
    * by `skip`. Links share the immutable parquet files across
    * generations — no data copy; falls back to a real copy on
    * filesystems without hard links. Existing targets (e.g. `_SUCCESS`)
    * are left alone. */
  private def linkTree(src: Path, dst: Path,
                       skip: Path => Boolean = _ => false): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val rel = src.relativize(p)
      if (rel.toString.nonEmpty && !skip(rel)) {
        val t = dst.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else if (!Files.exists(t)) {
          Files.createDirectories(t.getParent)
          try Files.createLink(t, p)
          catch { case _: UnsupportedOperationException => Files.copy(p, t) }
        }
      }
    }

  /** Overwrite a table: write the new contents as a fresh generation and
    * flip the pointer. Readers of the old generation are undisturbed —
    * there is no in-place overwrite anywhere, so the parquet
    * self-overwrite hazard does not arise even when `df` reads from this
    * very table. */
  def replace(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    withTableLock(table) {
      val gen = nextGenDir(table)
      deleteRecursively(gen)            // stale dir from a crashed writer
      val w = df.write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(gen.toString)
      commit(table, gen)
    }

  /** Plain append (quality reports, reference `db.py:102-107`). The batch
    * is written beside the live generation and becomes visible in one
    * pointer flip — never file-by-file. */
  def append(table: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit =
    withTableLock(table) {
      currentDir(table) match {
        case None => replace(table, df, partitionBy)
        case Some(cur) =>
          val gen = nextGenDir(table)
          deleteRecursively(gen)
          val w = df.write.mode(SaveMode.Overwrite)
          (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
            .parquet(gen.toString)
          linkTree(cur, gen)            // carry the existing files over
          commit(table, gen)
      }
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
                     dedupWithinBatch: Boolean = true): Long = withTableLock(table) {
    val keyCols = keys.map(col)
    val firstPerKey = if (!dedupWithinBatch) df else
      // keep-FIRST by orderCol, like Postgres keeping the first
      // conflicting row of an INSERT batch. min_by instead of a
      // row_number window: the window shuffles AND sorts the whole batch,
      // while the aggregate partial-combines map-side and carries one
      // buffered row per key through the shuffle. orderCol is unique per
      // key within a batch (file row number), so the argmin is exact.
      df.groupBy(keyCols: _*)
        .agg(min_by(struct(schema.fieldNames.toSeq.map(col): _*), col(orderCol))
          .as("__first"))
        .select(col("__first.*"))
    val deduped = firstPerKey.select(schema.fieldNames.toSeq.map(col): _*)
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
                   partitionBy: Seq[String] = Nil): Unit = withTableLock(table) {
    val merged =
      if (!exists(table)) incoming
      else combine(read(table, schema).alias("old"), incoming.alias("new"))
    replace(table, merged.select(schema.fieldNames.toSeq.map(col): _*), partitionBy)
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
      val vals = incoming.select(col(c)).distinct().collect()
        .map(_.get(0)).toIndexedSeq
      d.filter(col(c).isin(vals: _*))
    }

  /** Partition-scoped merge-upsert: like [[mergeReplace]], but reads and
    * REWRITES only the partitions present in the incoming batch — the
    * untouched partition directories carry into the next generation as
    * hard links, never re-read, never re-shuffled, never copied. This is
    * the property that keeps a nightly merge touching one study's data
    * from rewriting a 100 TB warehouse. Requires the partition columns
    * to be part of the merge key semantics (same key => same partition),
    * which holds for every warehouse table here.
    */
  def mergeReplacePartitions(table: String, schema: StructType,
                             incoming: DataFrame,
                             combine: (DataFrame, DataFrame) => DataFrame,
                             partitionCols: Seq[String]): Unit = withTableLock(table) {
    require(partitionCols.nonEmpty, "use mergeReplace for unpartitioned tables")
    currentDir(table) match {
      case None =>
        replace(table, incoming.select(schema.fieldNames.toSeq.map(col): _*), partitionCols)
      case Some(cur) =>
        val scoped = prunedToIncoming(read(table, schema), incoming, partitionCols)
        val merged = combine(scoped.alias("old"), incoming.alias("new"))
          .select(schema.fieldNames.toSeq.map(col): _*)
        val tmp = tableRoot(table).resolve(".merge-tmp")
        deleteRecursively(tmp)
        merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*)
          .parquet(tmp.toString)
        val rewritten = partitionDirs(tmp, partitionCols.length)
        val gen = nextGenDir(table)
        deleteRecursively(gen)
        Files.createDirectories(gen)
        linkTree(cur, gen, skip = rel => rewritten.exists(rel.startsWith))
        rewritten.foreach { rel =>
          Files.createDirectories(gen.resolve(rel).getParent)
          Files.move(tmp.resolve(rel), gen.resolve(rel),
            StandardCopyOption.ATOMIC_MOVE)
        }
        deleteRecursively(tmp)
        commit(table, gen)
    }
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

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}

object Warehouse {
  // one reentrant lock per table path, process-wide: threads of the same
  // process serialize on a table; separate processes go through the lock
  // file in withTableLock
  private val localLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()
  private def localLock(key: String): java.util.concurrent.locks.ReentrantLock =
    localLocks.computeIfAbsent(key, _ => new java.util.concurrent.locks.ReentrantLock())
}
