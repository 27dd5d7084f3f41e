package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.etl.Warehouse
import scala.jdk.CollectionConverters._

/** Per-stream high-water commit records — the Delta `txnAppId`/`txnVersion`
  * pattern shared by every streaming sink in this engine. The stream id is
  * its checkpoint location PLUS an identity marker created inside the
  * checkpoint directory: within one checkpoint batch ids are strictly
  * monotonic, so ONE max per stream is a complete replay record and the
  * table stays one tiny row per stream. Identity-by-path alone is not
  * enough — a wiped-and-recreated checkpoint restarts batch numbering at
  * 0, and the OLD high-water mark would silently no-op the new
  * incarnation's first N batches (data loss wearing a replay guard's
  * clothes). The marker file gives every checkpoint incarnation a fresh
  * uuid, so a recreated checkpoint is a NEW stream; replays of the old
  * incarnation's data heal through the sinks' keyed appends.
  *
  * ADDITIVE sinks (the Count-Min grid, the inverted index — state
  * merged by addition, not keyed append) cannot heal a re-read: after a
  * checkpoint wipe the file source re-delivers everything and addition
  * would double-count history, silently and permanently. For those,
  * `effectivelyOnce(additive = true)` REFUSES a new incarnation whose
  * path already has commit records from an older incarnation — the
  * operator must reset the accumulated table together with the
  * checkpoint (or keep the checkpoint intact), and the refusal says so
  * instead of corrupting counts.
  *
  * == Per-batch cost ==
  *
  * The table is one tiny row per stream, but every micro-batch consults
  * it (replay guard), appends to it (high-water record), and — for
  * additive sinks — prefix-scans it (incarnation refusal). Running each
  * of those as a Spark read is three cluster jobs of pure fixed cost
  * per batch, which dominates small-batch throughput. So this object
  * keeps ONE in-memory copy of the committed table per warehouse root,
  * revalidated per use against the table's committed GENERATION NAME
  * ([[Warehouse.committedGenName]] — local metadata, no scan): names
  * strictly increase and generations are immutable, so an unchanged
  * name proves the cached rows are exact, and ANY foreign write —
  * another JVM's stream on the same warehouse, a test's manual row
  * surgery — changes the name and forces a reload. Cache updates are
  * COMMIT-COUPLED ([[Warehouse.onCommit]], applied under the table
  * lock): an aborted transaction never touches the cache, so a crash
  * between staging and the catalog flip leaves both the store and the
  * cache at the old high-water and the batch replays. Steady state is
  * zero control-table reads per batch; the only control-plane Spark
  * job left is the one-file write of the updated table.
  *
  * == Identity spelling migration ==
  *
  * The stream id's path half is CANONICALIZED (scheme added, dots
  * collapsed — see [[canonical]]); rows written before canonicalization
  * existed are keyed on the raw caller-supplied path string. Every
  * reader here therefore matches BOTH spellings — raw and canonical,
  * same uuid — and [[record]] migrates the row to the canonical key on
  * first touch (the raw-keyed row is folded into the canonical one via
  * max). Without this, an upgrade would orphan the old row: the last
  * batch would look uncommitted (re-applied — duplicated rows in
  * additive sinks) and stale-incarnation refusals and resets would
  * miss it.
  *
  * The merge-upsert runs under the table's writer lock, so streams
  * sharing a warehouse never clobber each other's mark. */
object StreamCommits {

  val schema: StructType = StructType(Seq(
    StructField("stream_id", StringType), StructField("batch_id", LongType)))

  private val Table = "_stream_commits"

  /** One canonical spelling per checkpoint directory: qualified against
    * its filesystem (scheme + authority added, trailing slash and `.`/
    * `..` segments collapsed, relative paths resolved against the FS
    * working directory). Every consumer of the path-as-identity goes
    * through this (plus the raw-spelling compatibility match above), so
    * `dir`, `dir/` and `file:///...dir` all name the SAME stream.
    * Without it, a reset called with a differently-spelled path would
    * wipe the accumulated tables yet delete zero commit rows, leaving
    * the incarnation refusal in place after the data is already gone. */
  private def canonical(spark: SparkSession, checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString
  }

  /** The incarnation uuid persisted INSIDE the checkpoint. The marker
    * lives on the CHECKPOINT's filesystem (Hadoop FS API, like Spark's
    * own checkpoint files) — a driver-local marker for an hdfs:// or
    * s3a:// checkpoint would survive a wipe of the real checkpoint
    * (resurrecting the stale high-water mark, the exact data-loss bug
    * the marker exists to fix) and would invent a fresh identity
    * whenever the driver moves hosts. Exclusive create keeps concurrent
    * racers agreeing on one uuid. Never cached in this JVM: a wiped-and-
    * recreated checkpoint mid-process must be seen as a NEW incarnation
    * the moment it happens. */
  private def incarnationUuid(spark: SparkSession, checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val marker = new org.apache.hadoop.fs.Path(p, "_graft_stream_identity")
    if (!fs.exists(marker))
      try {
        val out = fs.create(marker, /* overwrite = */ false)
        try out.write(
          java.util.UUID.randomUUID().toString.getBytes("UTF-8"))
        finally out.close()
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Canonical-first spellings of this checkpoint incarnation's stream
    * id (head is what [[record]] writes); pre-canonicalization rows are
    * keyed on the raw tail spelling. */
  private def idSpellings(spark: SparkSession, checkpointDir: String): Seq[String] = {
    val uuid = incarnationUuid(spark, checkpointDir)
    Seq(canonical(spark, checkpointDir) + "#" + uuid,
      checkpointDir + "#" + uuid).distinct
  }

  /** Both path prefixes (canonical and raw) that identify rows of ANY
    * incarnation over `checkpointDir`. */
  private def pathPrefixes(spark: SparkSession, checkpointDir: String): Seq[String] =
    Seq(canonical(spark, checkpointDir) + "#", checkpointDir + "#").distinct

  // ----------------------------------------------------- committed-row cache

  private final case class Snapshot(gen: Option[String], rows: Map[String, Long])
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Snapshot]()

  /** The committed contents of `_stream_commits`, from the cache when its
    * generation fingerprint still matches the store, reloaded otherwise
    * (one tiny collect — once per JVM per root in the steady state). A
    * racing flip between the fingerprint read and the reload can only
    * mislabel the snapshot with an OLDER name, which the next call's
    * fingerprint check detects and reloads — the cache self-heals, never
    * silently diverges. */
  private def committedRows(wh: Warehouse): Map[String, Long] = {
    val gen = wh.committedGenName(Table)
    val c = cache.get(wh.rootKey)
    if (c != null && c.gen == gen) c.rows
    else {
      val rows: Map[String, Long] =
        if (gen.isEmpty) Map.empty
        else wh.read(Table, schema).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      cache.put(wh.rootKey, Snapshot(gen, rows))
      rows
    }
  }

  /** Publish `rows` as the table's new contents: one single-file write
    * (the table is a row per stream — parallelism would be pure
    * overhead), cache updated at COMMIT time under the table lock. */
  private def writeRows(wh: Warehouse, rows: Map[String, Long]): Unit = {
    val df = wh.spark.createDataFrame(
      rows.toSeq.sorted.map { case (s, b) => Row(s, b) }.asJava, schema)
      .coalesce(1)
    wh.replace(Table, df)
    wh.onCommit(() => cache.put(wh.rootKey,
      Snapshot(wh.committedGenName(Table), rows)))
  }

  def alreadyCommitted(wh: Warehouse, checkpointDir: String,
                       batchId: Long): Boolean = {
    val ids = idSpellings(wh.spark, checkpointDir)
    val rows = committedRows(wh)
    ids.flatMap(rows.get).exists(_ >= batchId)
  }

  def record(spark: SparkSession, wh: Warehouse,
             checkpointDir: String, batchId: Long): Unit = {
    val ids = idSpellings(spark, checkpointDir)
    // the lock brackets the whole read-modify-write (inside a transaction
    // it is held to the commit), so interleaved streams on one warehouse
    // never clobber each other's mark
    wh.locked(Table) {
      val rows = committedRows(wh)
      val hw = (batchId +: ids.flatMap(rows.get)).max
      // drop the legacy raw-spelling row (if any) into the canonical key:
      // the spelling migration the class doc describes
      writeRows(wh, rows -- ids.tail + (ids.head -> hw))
    }
  }

  /** For additive sinks: a NEW checkpoint incarnation over a path that
    * already recorded commits under an OLDER incarnation means the
    * source will re-deliver history that addition cannot deduplicate —
    * refuse loudly (a lookup in the cached committed rows, free per
    * batch). */
  private def requireNoOlderIncarnation(wh: Warehouse,
                                        checkpointDir: String): Unit = {
    val ids = idSpellings(wh.spark, checkpointDir).toSet
    val prefixes = pathPrefixes(wh.spark, checkpointDir)
    val stale = committedRows(wh).keysIterator.exists(k =>
      prefixes.exists(k.startsWith) && !ids(k))
    require(!stale,
      s"checkpoint $checkpointDir was wiped and recreated, but this " +
        "sink accumulates by ADDITION — re-reading the source would " +
        "double-count everything already merged. Either restore the " +
        "original checkpoint, or reset the accumulated table via " +
        "StreamCommits.resetAdditiveSink (a bare table wipe is NOT " +
        "enough: the old incarnation's commit rows keyed on this path " +
        "would keep refusing every batch).")
  }

  /** Operator-confirmed reset of an additive sink: wipe the accumulated
    * table(s) AND the old incarnations' commit rows for `checkpointDir`
    * in ONE transaction, so the next incarnation starts from genuinely
    * empty state. This is the remediation [[requireNoOlderIncarnation]]'s
    * refusal points at — dropping the table alone would leave the stale
    * `_stream_commits` rows (keyed on the old incarnation id) refusing
    * every batch of the new incarnation forever. The CURRENT
    * incarnation's row (if any) is cleared too: with the tables empty,
    * its high-water mark would silently no-op the re-read that is the
    * whole point of the reset. Rows under BOTH path spellings go. */
  def resetAdditiveSink(wh: Warehouse, checkpointDir: String,
                        tables: String*): Unit = wh.transact {
    tables.foreach { t =>
      // drop() is refused inside a transaction (it would race the
      // deferred catalog flip), so the wipe is a replace-with-empty on
      // the live schema — same one-flip visibility as the commit rows
      if (wh.exists(t)) {
        val cur = wh.currentDir(t).get
        val empty = wh.spark.read.format(wh.format).load(cur.toString).limit(0)
        wh.replace(t, empty)
      }
    }
    if (wh.exists(Table)) {
      val prefixes = pathPrefixes(wh.spark, checkpointDir)
      wh.locked(Table) {
        val rows = committedRows(wh)
        writeRows(wh,
          rows.filterNot { case (k, _) => prefixes.exists(k.startsWith) })
      }
    }
  }

  /** Shared store-geometry guard for the MinHash signature stores: a
    * store written with a different hash-family width silently NEVER
    * pairs (bands slice past the array; zip_with null-pads the
    * estimate), so near-dups would pass unrecognized forever. The scan
    * is whole-store min/max width plus a null count — NOT one sampled
    * row, because a store that became width-mixed before this guard
    * existed could pass on whichever row the sample happened to hit.
    * That makes it O(store), so sinks run it through [[SigWidthGuard]],
    * which pays the scan once per store and persists the verified
    * width as a generation marker for O(1) checks ever after — in this
    * JVM and any other. (Shingle-k mismatches are undetectable from
    * the data and must be kept apart by table name — document-level
    * contract.) */
  def requireSigWidth(wh: Warehouse, table: String, sigSchema: StructType,
                      numHashes: Int, context: String): Unit = {
    import org.apache.spark.sql.functions.{max, min, size, sum, when}
    // Null sig rows are counted separately so they surface as their own
    // message instead of a confusing "-1-wide signatures".
    val r = wh.read(table, sigSchema)
      .agg(min(size(col("sig"))).as("lo"), max(size(col("sig"))).as("hi"),
        sum(when(col("sig").isNull, 1L).otherwise(0L)).as("nulls"))
      .collect()(0)
    if (!r.isNullAt(2) && r.getLong(2) > 0) throw new IllegalArgumentException(
      s"$table holds ${r.getLong(2)} null-signature rows — the store is " +
        "corrupt; repair or rebuild it before streaming against it")
    if (!r.isNullAt(0)) {
      val (lo, hi) = (r.getInt(0), r.getInt(1))
      require(lo == numHashes && hi == numHashes,
        s"$table holds ${if (lo == hi) s"$lo-wide" else s"mixed $lo..$hi-wide"} " +
          s"signatures, $context hashes $numHashes — mixed hash families " +
          "can never pair; align numHashes or use a separate store table")
    }
  }

  /** Name of the verified-width marker a [[SigWidthGuard]] drops into a
    * signature store's generation directory after a passed full scan.
    * Underscore-prefixed so data scans ignore it; [[Warehouse]]'s
    * linkTree carries it into every later APPEND generation, while a
    * replace (including [[resetAdditiveSink]]'s wipe) writes a fresh
    * directory and so naturally invalidates it. */
  private[stream] val SigWidthMarker = "_graft_sig_width"

  /** Per-batch width guard for the MinHash signature stores, O(1) in
    * the steady state: after the first passed [[requireSigWidth]] scan
    * the verified width is PERSISTED as a [[SigWidthMarker]] file in
    * the store's current generation, so every later check — this
    * stream's next batch, a second sink instance, or a writer in a
    * DIFFERENT JVM — is one local file read instead of an O(store)
    * scan or a trust-me induction argument. Because the check is now
    * free it runs on EVERY batch (not once per instance), so a
    * misconfigured concurrent writer that goes through a guard is
    * refused at its very next batch; the marker certifies only
    * guard-routed writers — a rogue append that bypasses the guard
    * entirely is undetectable without rescanning, the same
    * document-level contract as shingle-k. The store's creating sink
    * writes no marker up front (it has nothing to scan); the first
    * check that sees the store marker-less pays one scan of the
    * still-small store and publishes the marker. Marker publication is
    * best-effort: a racing generation flip strands it in a superseded
    * directory and the next check simply rescans. */
  final class SigWidthGuard(table: String, sigSchema: StructType,
                            numHashes: Int, context: String) {
    // full-scan count, exposed so specs can pin the O(1) steady state
    private[stream] var fullScans = 0
    def check(wh: Warehouse): Unit =
      wh.currentDir(table).foreach { dir =>
        val marker = dir.resolve(SigWidthMarker)
        val verified =
          try {
            if (java.nio.file.Files.exists(marker))
              Some(java.nio.file.Files.readString(marker).trim)
            else None
          } catch { case scala.util.control.NonFatal(_) => None }
        verified match {
          case Some(w) =>
            require(w == numHashes.toString,
              s"$table is a verified $w-wide signature store, $context " +
                s"hashes $numHashes — mixed hash families can never pair; " +
                "align numHashes or use a separate store table")
          case None =>
            requireSigWidth(wh, table, sigSchema, numHashes, context)
            fullScans += 1
            try java.nio.file.Files.writeString(marker, numHashes.toString)
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
  }

  /** The effectively-once micro-batch frame every streaming sink in this
    * package shares: ONE warehouse transaction wrapping the replay
    * guard, the batch body (skipped for empty batches — no phantom
    * reports or empty generations), and the high-water record. Extracted
    * because five hand-rolled copies had drifted (one kept the guard
    * OUTSIDE the transaction); the guard's placement is now
    * un-driftable. `additive = true` adds the wiped-checkpoint refusal
    * for sinks whose merge is addition (see the object doc). */
  def effectivelyOnce(spark: SparkSession, wh: Warehouse,
                      checkpointDir: String, batchId: Long,
                      batch: DataFrame, additive: Boolean = false)
                     (body: DataFrame => Unit): Unit = {
    // The micro-batch engine hands `batch` bound to a cloned session with
    // AQE force-disabled (required for the STREAMING plan's stateful
    // operators — but every query the body derives from `batch` is a
    // plain BATCH query, where AQE is exactly what a micro-batch needs:
    // post-shuffle partition coalescing so a small batch doesn't schedule
    // `spark.sql.shuffle.partitions` near-empty tasks per exchange, and
    // runtime broadcast of the batch side of store joins). Re-enable it
    // on the clone: IncrementalExecution never applies AQE to the
    // STREAMING plan regardless of the conf (its stateful exchanges
    // plan REQUIRED_BY_STATEFUL_OPERATOR, with no AdaptiveSparkPlan) —
    // pinned empirically in StreamingPipelineSpec's AQE-reach test so a
    // Spark upgrade that changes this fails loudly there.
    batch.sparkSession.conf.set("spark.sql.adaptive.enabled", "true")
    wh.transact {
      if (!alreadyCommitted(wh, checkpointDir, batchId)) {
        if (additive) requireNoOlderIncarnation(wh, checkpointDir)
        // Empty-batch guard WITHOUT a per-batch Spark job where
        // possible: a file-source batch lists its backing files
        // driver-side (inputFiles), so files-present means "possibly
        // non-empty — run the body" at zero cost; the body's sinks
        // already no-op on zero fresh rows (appendIfAbsent writes no
        // generation for n=0), so a files-present-but-all-corrupt batch
        // just runs a cheap empty pipeline. Only a batch with NO
        // backing files (a memory-source test stream, or a genuinely
        // file-less trigger) pays the old isEmpty action — the
        // file-less trigger is exactly the case the guard exists for.
        if (batch.inputFiles.nonEmpty || !batch.isEmpty) body(batch)
        record(spark, wh, checkpointDir, batchId)
      }
    }
  }
}
