package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The warehouse's generation/pointer/catalog machinery is
  * format-agnostic; this pins that an ORC-backed warehouse gets the SAME
  * semantics AND the same scan qualities (pushdown) parquet gets. */
class FormatsSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  test("ORC warehouse: append-if-absent, merge, transact, time travel") {
    val wh = new Warehouse(spark, tmpDir("wh-orc").toString, format = "orc")
    def rows(ids: Range, grp: String) =
      ids.map(i => (i.toLong, grp, i * 1.5)).toDF("id", "grp", "v")

    assert(wh.appendIfAbsent("t", schema, rows(0 until 10, "a"),
      keys = Seq("id"), orderCol = "id") == 10)
    // replay: all duplicates anti-joined away, no new generation content
    assert(wh.appendIfAbsent("t", schema, rows(0 until 10, "a"),
      keys = Seq("id"), orderCol = "id") == 0)
    assert(wh.read("t", schema).count() == 10)
    // the files on disk really are ORC
    val dir = wh.currentDir("t").get
    assert(Warehouse.walkDir(dir).exists(_.getFileName.toString.endsWith(".orc")))
    assert(!Warehouse.walkDir(dir).exists(_.getFileName.toString.endsWith(".parquet")))

    // multi-table transaction + time travel work unchanged
    wh.transact {
      wh.append("t", rows(10 until 15, "b"))
      wh.replace("u", rows(0 until 3, "c"))
    }
    val v1 = wh.catalogVersions().max
    wh.transact { wh.replace("u", rows(0 until 5, "d")) }
    assert(wh.read("t", schema).count() == 15)
    assert(wh.read("u", schema).count() == 5)
    assert(wh.snapshotAt(v1).read("u", schema).count() == 3)
  }

  test("ORC scans push filters down and the SQL catalog serves ORC tables") {
    val whRoot = tmpDir("wh-orc-sql").toString
    val wh = new Warehouse(spark, whRoot, format = "orc")
    wh.transact {
      wh.replace("m", (0 until 100).map(i => (i.toLong, s"g${i % 5}", i * 1.0))
        .toDF("id", "grp", "v"))
    }
    val scan = wh.read("m", schema).filter(col("id") >= 90)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("90"), plan)
    assert(scan.count() == 10)

    spark.conf.set("spark.sql.catalog.orcwh", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.orcwh.root", whRoot)
    spark.conf.set("spark.sql.catalog.orcwh.format", "orc")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM orcwh.m WHERE id >= 90")
        .head().getLong(0) == 10)
      val sqlPlan = spark.sql("SELECT v FROM orcwh.m WHERE id >= 90")
        .queryExecution.executedPlan.toString
      assert(sqlPlan.contains("PushedFilters") && sqlPlan.contains("90"), sqlPlan)
    } finally {
      spark.conf.unset("spark.sql.catalog.orcwh")
      spark.conf.unset("spark.sql.catalog.orcwh.root")
      spark.conf.unset("spark.sql.catalog.orcwh.format")
    }
  }
}
