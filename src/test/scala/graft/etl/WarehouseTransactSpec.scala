package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins for the warehouse's multi-table commit protocol: a
  * [[Warehouse.transact]] block must publish every table it touched in
  * ONE atomic catalog flip (all-or-nothing, no reader-visible
  * intermediate), an aborted block must leave no trace, and a
  * [[Warehouse#snapshot]] must keep resolving the pre-commit pair even
  * while transactions land. This is the cross-table half of the
  * transactional visibility the reference gets from Postgres
  * (`db.py:12-17`); the single-table half is WarehouseSnapshotSpec. */
class WarehouseTransactSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("v", IntegerType)))

  private def batch(v: Int, n: Int = 50) =
    (0 until n).map(i => (i, v)).toDF("id", "v")

  private def readV(wh: Warehouse, t: String): Set[Int] =
    wh.read(t, schema).select("v").distinct().as[Int].collect().toSet

  test("a transaction commits N tables in one flip; an abort publishes nothing") {
    val wh = new Warehouse(spark, tmpDir("whtx").toString)
    wh.replace("a", batch(0))
    wh.replace("b", batch(0))

    // abort: both writes staged, then the block throws — neither table
    // may change and the staged generation dirs must be gone
    intercept[RuntimeException] {
      wh.transact {
        wh.replace("a", batch(1))
        wh.replace("b", batch(1))
        sys.error("boom")
      }
    }
    assert(readV(wh, "a") == Set(0) && readV(wh, "b") == Set(0))
    Seq("a", "b").foreach { t =>
      val gens = Files.list(Paths.get(wh.root, t)).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("g")).toList
      assert(gens == List("g000000001"), s"$t staged dirs not cleaned: $gens")
    }

    // commit: inside the block reads see the staged state
    // (read-your-own-writes); outside, both tables flip together
    wh.transact {
      wh.replace("a", batch(2))
      assert(readV(wh, "a") == Set(2))            // own staged write
      wh.append("b", batch(2))                    // append also stages
      assert(readV(wh, "b") == Set(0, 2))
    }
    assert(readV(wh, "a") == Set(2) && readV(wh, "b") == Set(0, 2))

    // after the abort and the commit, plain single-table writes still work
    // (locks were released) and keep the catalog entry current
    wh.replace("a", batch(3))
    assert(readV(wh, "a") == Set(3))
  }

  test("a snapshot pins the cross-table state across a later transaction") {
    val wh = new Warehouse(spark, tmpDir("whsnap").toString)
    wh.transact { wh.replace("a", batch(1)); wh.replace("b", batch(1)) }

    val snap = wh.snapshot()
    // a second transaction flips both tables under the snapshot
    wh.transact { wh.replace("a", batch(2)); wh.replace("b", batch(2)) }

    // live reads see the new pair; the snapshot still sees the OLD pair
    // for both tables — never v=1 for one and v=2 for the other
    assert(readV(wh, "a") == Set(2) && readV(wh, "b") == Set(2))
    val sa = snap.read("a", schema).select("v").distinct().as[Int].collect().toSet
    val sb = snap.read("b", schema).select("v").distinct().as[Int].collect().toSet
    assert(sa == Set(1) && sb == Set(1), s"snapshot torn: a=$sa b=$sb")
  }

  test("a reader polling two tables never straddles a transaction's commit") {
    val wh = new Warehouse(spark, tmpDir("whrace").toString)
    wh.transact { wh.replace("a", batch(0)); wh.replace("b", batch(0)) }

    @volatile var done = false
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val reader = new Thread(() => {
      while (!done) {
        try {
          val snap = wh.snapshot()
          val va = snap.read("a", schema).agg(max("v")).head.getInt(0)
          val vb = snap.read("b", schema).agg(max("v")).head.getInt(0)
          if (va != vb) violations.add(s"straddled commit: a=$va b=$vb")
        } catch {
          case e: Throwable => violations.add(s"read failed: ${e.getMessage}")
        }
      }
    })
    reader.start()
    try {
      (1 to 5).foreach { g =>
        wh.transact { wh.replace("a", batch(g)); wh.replace("b", batch(g)) }
      }
    } finally { done = true; reader.join(120000) }
    assert(violations.isEmpty, violations.asScala.mkString("; "))
  }

  test("nested transactions are refused; a live foreign lock aborts the block cleanly") {
    val wh = new Warehouse(spark, tmpDir("whnest").toString)
    intercept[IllegalArgumentException] { wh.transact { wh.transact { () } } }

    wh.transact { wh.replace("a", batch(1)); wh.replace("b", batch(1)) }
    // another LIVE writer holds table b's OS file lock: the transaction
    // must fail when it first touches b, and its staged write to a must
    // be rolled back — not half-committed
    val lock = Paths.get(wh.root, "b", "_lock")
    val foreign = java.nio.channels.FileChannel.open(lock,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE)
    val held = foreign.tryLock()
    try {
      intercept[IllegalStateException] {
        wh.transact { wh.replace("a", batch(9)); wh.replace("b", batch(9)) }
      }
    } finally { held.release(); foreign.close() }
    assert(readV(wh, "a") == Set(1) && readV(wh, "b") == Set(1))
  }

  test("transaction state is visible across instances over one root") {
    val root = tmpDir("whxinst").toString
    val wh = new Warehouse(spark, root)
    wh.transact { wh.replace("a", batch(1)) }
    wh.transact {
      wh.replace("a", batch(2))
      // a FRESH instance over the same root (the SQL catalog constructs
      // one per statement) must see this thread's open transaction:
      // nesting refuses, and drop refuses rather than committing a
      // manifest-minus-entry that races the deferred flip
      val other = new Warehouse(spark, root)
      intercept[IllegalArgumentException] { other.transact { () } }
      intercept[IllegalArgumentException] { other.drop("a") }
    }
    assert(readV(wh, "a") == Set(2))
    // and the state is gone once the block closes: the fresh instance
    // can transact (and drop) normally afterwards
    val other2 = new Warehouse(spark, root)
    other2.transact { other2.replace("b", batch(3)) }
    assert(other2.drop("b") && !other2.exists("b"))
  }
}
