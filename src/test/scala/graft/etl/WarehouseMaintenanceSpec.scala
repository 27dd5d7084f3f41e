package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Pins for the warehouse maintenance surface: OPTIMIZE-style small-file
  * compaction (streaming appends each land their own part-files; the
  * rewrite must shrink the file count without changing the row set),
  * range-clustered rewrites (per-file sort-key ranges must be disjoint,
  * the property parquet footer-stats skipping rests on), and catalog
  * time travel (snapshotAt must resolve a retained commit's exact
  * cross-table state, with per-table GC keeping its generations alive). */
class WarehouseMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", IntegerType)))

  private def parquetFiles(gen: Path): List[Path] =
    Files.walk(gen).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .toList

  test("optimizeTable compacts streaming-append debris without changing the rows") {
    val wh = new Warehouse(spark, tmpDir("whopt").toString)
    // 12 micro-batch appends, 4 shuffle partitions each: many small files
    (0 until 12).foreach { b =>
      wh.append("t", (0 until 40).map(i => (b * 40 + i, b))
        .toDF("id", "v").repartition(4))
    }
    val before = parquetFiles(wh.currentDir("t").get)
    assert(before.size >= 12, s"expected small-file debris, got ${before.size}")
    val rowsBefore = wh.read("t", schema).collect().map(r => (r.getInt(0), r.getInt(1))).sorted

    wh.optimizeTable("t", schema)   // default 128 MiB target -> one file here
    val after = parquetFiles(wh.currentDir("t").get)
    assert(after.size == 1, s"expected 1 compacted file, got ${after.size}")
    val rowsAfter = wh.read("t", schema).collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(rowsAfter.sameElements(rowsBefore))
  }

  test("a sortBy rewrite gives files disjoint key ranges (footer-stats skipping)") {
    val wh = new Warehouse(spark, tmpDir("whsort").toString)
    // ids deliberately scattered across appends so the unsorted layout
    // interleaves every file's id range
    (0 until 8).foreach { b =>
      wh.append("t", (0 until 100).map(i => (i * 8 + b, b)).toDF("id", "v"))
    }
    wh.optimizeTable("t", schema, sortBy = Seq("id"),
      targetBytesPerFile = 2048)    // tiny target -> several output files
    val files = parquetFiles(wh.currentDir("t").get)
    assert(files.size >= 2, s"tiny target should yield several files: ${files.size}")
    val ranges = files.map { f =>
      val mm = spark.read.schema(schema).parquet(f.toString)
        .agg(min("id"), max("id")).head
      (mm.getInt(0), mm.getInt(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $ranges")
      case _ => ()
    }
    assert(wh.read("t", schema).count() == 800)
  }

  test("schema evolution on read: an added column reads as null over old generations") {
    val wh = new Warehouse(spark, tmpDir("whevo").toString)
    wh.replace("t", (0 until 20).map(i => (i, i * 2)).toDF("id", "v"))
    val evolved = StructType(schema.fields :+ StructField("tag", StringType))
    // old generation under the widened schema: new column all-null
    assert(wh.read("t", evolved).filter(col("tag").isNull).count() == 20)
    // an append under the widened schema coexists with carried-over old
    // files; rows keep their own generation's physical schema
    wh.append("t", Seq((100, 7, "x")).toDF("id", "v", "tag"))
    val r = wh.read("t", evolved)
    assert(r.count() == 21)
    assert(r.filter(col("tag") === "x").select("id").head.getInt(0) == 100)
    assert(r.filter(col("tag").isNull).count() == 20)
  }

  test("optimizeTable on a WIDENED table refuses a stale narrow schema " +
    "and compacts to uniform wide files under the full one") {
    val wh = new Warehouse(spark, tmpDir("whoptevo").toString)
    wh.replace("t", (0 until 20).map(i => (i, i * 2)).toDF("id", "v"))
    wh.widen("t", StructType(Seq(StructField("tag", StringType))))
    val evolved = StructType(schema.fields :+ StructField("tag", StringType))
    wh.append("t", Seq((100, 7, "x")).toDF("id", "v", "tag"))
    // routine compaction under the pre-evolution schema would silently
    // drop tag='x' — it must refuse instead
    val e = intercept[IllegalArgumentException] {
      wh.optimizeTable("t", schema)
    }
    assert(e.getMessage.contains("tag"), e.getMessage)
    // under the full schema it compacts; the evolved value survives and
    // the rewritten generation is schema-uniform (no marker needed —
    // every footer now carries the wide schema)
    wh.optimizeTable("t", evolved)
    val r = wh.read("t", evolved)
    assert(r.count() == 21 &&
      r.filter(col("tag") === "x").count() == 1 &&
      r.filter(col("tag").isNull).count() == 20)
    assert(!java.nio.file.Files.exists(
      wh.currentDir("t").get.resolve("_graft_widened")))
  }

  test("widen works in place on a PARTITIONED table: sidecar schema, " +
    "null-fill, pruning intact, appends carry it, time travel narrow") {
    val wh = new Warehouse(spark, tmpDir("whevopart").toString,
      catalogRetention = 4)
    wh.transact {
      wh.replace("t", (0 until 10).map(i => (i, i % 3)).toDF("id", "v"),
        partitionBy = Seq("v"))
    }                                                                  // v1
    val preWiden = wh.currentDir("t").get
    wh.transact {
      wh.widen("t", StructType(Seq(StructField("tag", StringType))))
    }                                                                  // v2
    // zero data rewrite: every pre-widen parquet file is hard-linked, the
    // only new data bytes are the zero-row sidecar schema file
    val gen = wh.currentDir("t").get
    assert(Files.exists(gen.resolve("_graft_schema")), "sidecar missing")
    assert(parquetFiles(gen).count(p =>
      !p.startsWith(gen.resolve("_graft_schema"))) ==
      parquetFiles(preWiden).size)
    // reads null-fill the added column; partition pruning stays intact
    // (the sidecar must be invisible to partition discovery)
    val evolvedPart = StructType(Seq(
      StructField("id", IntegerType), StructField("tag", StringType),
      StructField("v", IntegerType)))
    val r = wh.read("t", evolvedPart)
    assert(r.count() == 10 && r.filter(col("tag").isNull).count() == 10)
    val pruned = r.filter(col("v") === 1)
    assert(pruned.count() == 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^]]*v[^]]*=[^]]*1[^]]*\\].*"),
      s"partition pruning lost after widen: $plan")
    // an append (narrow or wide) carries the sidecar + marker forward
    wh.append("t", Seq((100, "x", 1)).toDF("id", "tag", "v"),
      partitionBy = Seq("v"))
    assert(Files.exists(wh.currentDir("t").get.resolve("_graft_schema")))
    val r2 = wh.read("t", evolvedPart)
    assert(r2.count() == 11 && r2.filter(col("tag") === "x").count() == 1)
    // a SECOND widen folds the first's sidecar-only column in (it exists
    // in no data footer) and still refuses collisions with any column,
    // partition column included
    wh.widen("t", StructType(Seq(StructField("score", DoubleType))))
    val sidecarSchema = spark.read.parquet(
      wh.currentDir("t").get.resolve("_graft_schema").toString).schema
    assert(sidecarSchema.fieldNames.toSeq == Seq("id", "tag", "score"),
      sidecarSchema.treeString)
    intercept[IllegalArgumentException] {
      wh.widen("t", StructType(Seq(StructField("tag", StringType))))
    }
    intercept[IllegalArgumentException] {
      wh.widen("t", StructType(Seq(StructField("v", IntegerType))))
    }
    // time travel across the evolution boundary reads v1's narrow world
    assert(wh.snapshotAt(1).read("t",
      StructType(Seq(StructField("id", IntegerType),
        StructField("v", IntegerType)))).count() == 10)
    // optimize under a stale narrow schema refuses (the sidecar column
    // is in NO footer — the refusal must still see it); under the full
    // schema it compacts to uniform wide files and retires the sidecar
    val full = StructType(evolvedPart.fields.patch(2,
      Seq(StructField("score", DoubleType)), 0))
    val e = intercept[IllegalArgumentException] {
      wh.optimizeTable("t", evolvedPart, partitionBy = Seq("v"))
    }
    assert(e.getMessage.contains("score"), e.getMessage)
    wh.optimizeTable("t", full, partitionBy = Seq("v"))
    val opt = wh.currentDir("t").get
    assert(!Files.exists(opt.resolve("_graft_schema")) &&
      !Files.exists(opt.resolve("_graft_widened")))
    val r3 = wh.read("t", full)
    assert(r3.count() == 11 && r3.filter(col("tag") === "x").count() == 1)
  }

  test("widen on an ORC warehouse refuses: no footer-merge inference " +
    "exists to read a mixed-schema ORC generation") {
    val wh = new Warehouse(spark, tmpDir("whevoorc").toString,
      format = "orc")
    wh.replace("t", (0 until 5).map(i => (i, i)).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      wh.widen("t", StructType(Seq(StructField("tag", StringType))))
    }
    assert(e.getMessage.contains("parquet"), e.getMessage)
  }

  test("widen composes inside a transaction: contents and widened " +
    "schema flip in one commit") {
    val wh = new Warehouse(spark, tmpDir("whtxnevo").toString,
      catalogRetention = 4)
    wh.transact {
      wh.replace("t", (0 until 10).map(i => (i, i * 2)).toDF("id", "v"))
    }                                                                  // v1
    val evolved = StructType(schema.fields :+ StructField("tag", StringType))
    wh.transact {
      // read-your-own-writes: widen links the generation staged by the
      // replace in THIS transaction, and both publish in one flip
      wh.replace("t", (0 until 5).map(i => (i, i * 3)).toDF("id", "v"))
      wh.widen("t", StructType(Seq(StructField("tag", StringType))))
    }                                                                  // v2
    val r = wh.read("t", evolved)
    assert(r.count() == 5 && r.filter(col("v") === 12).count() == 1 &&
      r.filter(col("tag").isNull).count() == 5)
    // the pre-transaction version still reads its own narrow world
    assert(wh.snapshotAt(1).read("t", schema).count() == 10)
  }

  test("changesBetween yields the exact keyed change feed of two commits") {
    val wh = new Warehouse(spark, tmpDir("whcdc").toString, catalogRetention = 4)
    // null-keyed rows have no identity: the UNCHANGED (null, 5) must not
    // appear at all (and never cross-product with the other null row),
    // while the (null, 6) -> (null, 61) change surfaces as delete+insert
    def row(id: Integer, v: Integer) = (id, v)
    wh.transact {
      wh.replace("t", Seq(row(1, 10), row(2, 20), row(3, 30),
        row(null, 5), row(null, 6)).toDF("id", "v"))
    }                                                              // v1
    wh.transact {
      wh.replace("t", Seq(row(1, 10), row(3, 99), row(4, 40),
        row(null, 5), row(null, 61)).toDF("id", "v"))
    }                                                              // v2: del 2, upd 3, ins 4
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getInt(0)),
        r.getInt(1), r.getString(2))
    }.toSet
    val keyed = rows(wh.changesBetween("t", schema, 1, 2, keys = Seq("id")))
    assert(keyed == Set(
      (Some(4), 40, "insert"), (Some(2), 20, "delete"),
      (Some(3), 30, "update_preimage"), (Some(3), 99, "update_postimage"),
      (None, 61, "insert"), (None, 6, "delete")))
    // unchanged rows never appear (keyed row 1 and null-keyed 5)
    assert(!keyed.exists(_._1.contains(1)) && !keyed.exists(_._2 == 5))
    // keyless multiset diff: the update degrades to delete+insert
    val flat = rows(wh.changesBetween("t", schema, 1, 2))
    assert(flat == Set(
      (Some(4), 40, "insert"), (Some(3), 99, "insert"),
      (Some(2), 20, "delete"), (Some(3), 30, "delete"),
      (None, 61, "insert"), (None, 6, "delete")))
    // a table absent from the older manifest diffs against empty
    wh.transact { wh.replace("u", Seq((7, 70)).toDF("id", "v")) }  // v3
    val born = wh.changesBetween("u", schema, 2, 3, keys = Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(2))).toSet
    assert(born == Set((7, "insert")))
  }

  test("a pinned snapshot's resolution rules are frozen at creation") {
    val wh = new Warehouse(spark, tmpDir("whfreeze").toString, catalogRetention = 4)
    def batch(v: Int) = (0 until 10).map(i => (i, v)).toDF("id", "v")
    wh.transact { wh.replace("a", batch(1)) }     // v1
    wh.replace("u", batch(7))                     // plain write: u never transacted
    val pinned = wh.snapshotAt(1)
    assert(pinned.read("u", schema).agg(max("v")).head.getInt(0) == 7)
    // u now enters the catalog; the ALREADY-PINNED snapshot keeps its
    // creation-time rule (live-pointer fallback) — it must never flip to
    // reading u as empty mid-lifetime
    wh.transact { wh.replace("u", batch(8)) }     // v2
    assert(pinned.exists("u"))
    assert(pinned.read("u", schema).agg(max("v")).head.getInt(0) == 8)
    // a FRESH snapshot of v1 sees the new rule: u is catalog-managed now
    // and absent from v1's manifest, so at v1 it reads as nonexistent
    assert(!wh.snapshotAt(1).exists("u"))
    assert(wh.snapshotAt(2).read("u", schema).agg(max("v")).head.getInt(0) == 8)
  }

  test("snapshotAt time-travels to any retained commit; older versions raise") {
    val wh = new Warehouse(spark, tmpDir("whtt").toString, catalogRetention = 4)
    def batch(v: Int) = (0 until 30).map(i => (i, v)).toDF("id", "v")
    def vOf(s: Warehouse.Snapshot, t: String): Int =
      s.read(t, schema).agg(max("v")).head.getInt(0)

    wh.transact { wh.replace("a", batch(1)); wh.replace("b", batch(1)) } // v1
    wh.transact { wh.replace("a", batch(2)) }                            // v2
    wh.transact { wh.replace("a", batch(3)); wh.replace("b", batch(3)) } // v3
    assert(wh.catalogVersions() == Seq(1L, 2L, 3L))

    // each retained version resolves its exact cross-table state — v2
    // must pair a's second write with b's FIRST, and the generations it
    // pins must have survived the later commits' GC
    assert(vOf(wh.snapshotAt(1), "a") == 1 && vOf(wh.snapshotAt(1), "b") == 1)
    assert(vOf(wh.snapshotAt(2), "a") == 2 && vOf(wh.snapshotAt(2), "b") == 1)
    assert(vOf(wh.snapshotAt(3), "a") == 3 && vOf(wh.snapshotAt(3), "b") == 3)

    // TIMESTAMP AS OF resolution: each manifest records its commit
    // wall-clock; a timestamp resolves to the newest commit at or
    // before it, and one before the first commit resolves to nothing
    val whT = new Warehouse(spark, tmpDir("whts").toString, catalogRetention = 4)
    val before = System.currentTimeMillis() - 1
    Thread.sleep(3)
    whT.transact { whT.replace("a", batch(1)) }
    Thread.sleep(3)
    val mid = System.currentTimeMillis()
    Thread.sleep(3)
    whT.transact { whT.replace("a", batch(2)) }
    assert(whT.versionAt(before).isEmpty)
    assert(whT.versionAt(mid).contains(1L))
    assert(whT.versionAt(System.currentTimeMillis()).contains(2L))
    assert(vOf(whT.snapshotAt(whT.versionAt(mid).get), "a") == 1)

    // default retention (2) drops the horizon as commits land
    val wh2 = new Warehouse(spark, tmpDir("whtt2").toString)
    wh2.transact { wh2.replace("a", batch(1)) }
    wh2.transact { wh2.replace("a", batch(2)) }
    wh2.transact { wh2.replace("a", batch(3)) }
    assert(wh2.catalogVersions() == Seq(2L, 3L))
    assert(vOf(wh2.snapshotAt(2), "a") == 2)
    intercept[IllegalArgumentException] { wh2.snapshotAt(1) }
  }
}
