package graft.sql

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.AnalysisException

/** The warehouse as a SQL catalog: `graft.<table>` must resolve the live
  * snapshot, `VERSION AS OF n` must resolve retained catalog-manifest
  * versions (cross-table consistently), `SHOW TABLES` must enumerate,
  * and SQL writes must route through the Warehouse commit protocol —
  * INSERT INTO as append, INSERT OVERWRITE as replace, CREATE/CTAS as a
  * fresh-generation commit, DROP as the pointer-removing commit — with
  * time travel still resolving across the SQL commits. Unsupported
  * mutations (ALTER, partition transforms, row-level overwrite) refuse
  * loudly. */
class GraftCatalogSpec extends SparkSpec {

  test("warehouse tables resolve in SQL, with VERSION AS OF time travel; writes refuse") {
    import spark.implicits._
    val root = tmpDir("whsql").toString
    val wh = new Warehouse(spark, root, catalogRetention = 4)
    def batch(v: Int) = (0 until 25).map(i => (i, v)).toDF("id", "v")
    wh.transact { wh.replace("a", batch(1)); wh.replace("b", batch(1)) } // v1
    Thread.sleep(3)
    val betweenCommits = System.currentTimeMillis()
    Thread.sleep(3)
    wh.transact { wh.replace("a", batch(2)) }                            // v2

    // a REAL catalog-wired session (fresh session, shared SparkContext)
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sql = SparkSession.builder()
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.root", root)
      .config("spark.sql.catalog.graft.retention", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      assert(sql ne shared)

      // live reads resolve the current snapshot, with pushdown intact
      assert(sql.sql("SELECT max(v) FROM graft.a").head.getInt(0) == 2)
      assert(sql.sql("SELECT count(*) FROM graft.a WHERE id < 5").head.getLong(0) == 5)

      // time travel: v1 pairs a's FIRST write with b's — and the same
      // query against v2 sees a moved on while b stayed
      assert(sql.sql("SELECT max(v) FROM graft.a VERSION AS OF 1").head.getInt(0) == 1)
      assert(sql.sql(
        """SELECT max(a.v) + max(b.v)
          |FROM graft.a VERSION AS OF 2 a, graft.b VERSION AS OF 2 b""".stripMargin)
        .head.getInt(0) == 3)

      // TIMESTAMP AS OF: a wall-clock between the two commits resolves
      // to the first commit's state
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(betweenCommits))
      assert(sql.sql(
        s"SELECT max(v) FROM graft.a TIMESTAMP AS OF '$ts'").head.getInt(0) == 1)

      // enumeration sees exactly the committed tables (never _catalog)
      val names = sql.sql("SHOW TABLES IN graft").collect()
        .map(_.getAs[String]("tableName")).sorted.toSeq
      assert(names == Seq("a", "b"))

      intercept[AnalysisException] { sql.sql("SELECT * FROM graft.nope").collect() }

      // ---- SQL writes ride the Warehouse commit protocol ----

      // INSERT INTO == transactional append: a new generation committed
      // under the same catalog machinery, so the PRE-insert version is
      // still resolvable afterwards
      sql.sql("INSERT INTO graft.a VALUES (99, 99)")
      assert(sql.sql("SELECT count(*) FROM graft.a").head.getLong(0) == 26)
      assert(sql.sql("SELECT max(v) FROM graft.a").head.getInt(0) == 99)
      assert(sql.sql("SELECT count(*) FROM graft.a VERSION AS OF 2")
        .head.getLong(0) == 25)

      // INSERT OVERWRITE == replace (whole-table), same protections
      sql.sql("INSERT OVERWRITE graft.b VALUES (7, 70), (8, 80)")
      assert(sql.sql("SELECT count(*) FROM graft.b").head.getLong(0) == 2)

      // CTAS: create + insert in the standard two-step; reads back
      sql.sql("CREATE TABLE graft.c AS SELECT id, v * 10 AS v10 FROM graft.a WHERE id < 3")
      assert(sql.sql("SELECT count(*) FROM graft.c").head.getLong(0) == 3)
      assert(sql.sql("SELECT max(v10) FROM graft.c").head.getInt(0) == 20)

      // CREATE TABLE with an explicit schema commits an empty generation
      // whose parquet footer carries the schema; INSERT then lands
      sql.sql("CREATE TABLE graft.d (id INT, label STRING)")
      assert(sql.sql("SELECT count(*) FROM graft.d").head.getLong(0) == 0)
      sql.sql("INSERT INTO graft.d VALUES (1, 'x'), (2, 'y')")
      assert(sql.sql("SELECT count(*) FROM graft.d").head.getLong(0) == 2)
      val names2 = sql.sql("SHOW TABLES IN graft").collect()
        .map(_.getAs[String]("tableName")).sorted.toSeq
      assert(names2 == Seq("a", "b", "c", "d"))

      // the programmatic API sees the SQL commits (one warehouse, one
      // commit protocol)
      assert(wh.read("a", sql.table("graft.a").schema).count() == 26)

      // DROP TABLE: pointer-removing commit; enumeration forgets it
      sql.sql("DROP TABLE graft.c")
      intercept[AnalysisException] { sql.sql("SELECT * FROM graft.c").collect() }
      assert(sql.sql("SHOW TABLES IN graft").collect()
        .map(_.getAs[String]("tableName")).sorted.toSeq == Seq("a", "b", "d"))

      // DROP + re-CREATE must not cannibalize pinned generations: the
      // pre-drop version keeps reading the OLD data even after the new
      // incarnation writes (generation numbering advances past every
      // directory on disk, so the pinned g-dir is never overwritten)
      sql.sql("DROP TABLE graft.a")
      sql.sql("CREATE TABLE graft.a (id INT, v INT)")
      sql.sql("INSERT INTO graft.a VALUES (7, 777)")
      assert(sql.sql("SELECT count(*) FROM graft.a").head.getLong(0) == 1)
      assert(sql.sql("SELECT count(*) FROM graft.a VERSION AS OF 2")
        .head.getLong(0) == 25)
      assert(sql.sql("SELECT max(v) FROM graft.a VERSION AS OF 2")
        .head.getInt(0) == 2)

      // still-unsupported mutations refuse loudly (ADD COLUMN is now
      // supported — see the evolution test — but nothing else is)
      intercept[Exception] { sql.sql("ALTER TABLE graft.a DROP COLUMN v") }
      intercept[Exception] {
        sql.sql("ALTER TABLE graft.a RENAME COLUMN v TO w")
      }
      intercept[Exception] {
        sql.sql("CREATE TABLE graft.p (id INT) PARTITIONED BY (id)")
      }
      // duplicate create refuses
      intercept[Exception] { sql.sql("CREATE TABLE graft.d (id INT)") }
      // TBLPROPERTIES refuse loudly (nowhere to store them) instead of
      // silently dropping; Spark's own reserved provider/owner keys pass
      intercept[Exception] {
        sql.sql("CREATE TABLE graft.p2 (id INT) TBLPROPERTIES ('x'='1')")
      }
      // a partitioned layout refuses SQL INSERT (an unpartitioned batch
      // beside col=value dirs is a mixed layout readers reject) but
      // still READS fine through the catalog
      wh.replace("pt", batch(1), partitionBy = Seq("v"))
      assert(sql.sql("SELECT count(*) FROM graft.pt").head.getLong(0) == 25)
      intercept[Exception] { sql.sql("INSERT INTO graft.pt VALUES (9, 9)") }
      assert(sql.sql("SELECT count(*) FROM graft.pt").head.getLong(0) == 25)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("ALTER TABLE ADD COLUMN: zero-rewrite widening, null-fill, " +
    "evolution survives appends, time travel across the boundary") {
    import spark.implicits._
    val root = tmpDir("whevo").toString
    val wh = new Warehouse(spark, root, catalogRetention = 4)
    wh.transact {
      wh.replace("e", (0 until 10).map(i => (i.toLong, i * 2)).toDF("id", "v"))
    }                                                                    // v1
    val genBefore = wh.currentDir("e").get
    val dataFilesBefore = Warehouse.listDir(genBefore)
      .filter(_.getFileName.toString.endsWith(".parquet")).toSet

    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sql = SparkSession.builder()
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.root", root)
      .config("spark.sql.catalog.graft.retention", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      sql.sql("ALTER TABLE graft.e ADD COLUMN label STRING")

      // the widened table: old columns in order, new column appended,
      // old rows null-filled, nothing lost
      assert(sql.table("graft.e").schema.fieldNames.toSeq ==
        Seq("id", "v", "label"))
      assert(sql.sql("SELECT count(*) FROM graft.e").head.getLong(0) == 10)
      assert(sql.sql("SELECT count(*) FROM graft.e WHERE label IS NULL")
        .head.getLong(0) == 10)

      // ZERO data rewrite: every pre-evolution data file is hard-linked
      // into the widened generation (same inode, not a copy)
      val genAfter = wh.currentDir("e").get
      assert(genAfter != genBefore)
      dataFilesBefore.foreach { f =>
        val linked = genAfter.resolve(f.getFileName.toString)
        assert(java.nio.file.Files.exists(linked), s"missing link $linked")
        assert(java.nio.file.Files.isSameFile(f, linked),
          s"$linked was copied, not hard-linked")
      }

      // wide inserts land; evolution survives the append generation
      sql.sql("INSERT INTO graft.e VALUES (100, 100, 'x')")
      assert(sql.sql("SELECT count(*) FROM graft.e").head.getLong(0) == 11)
      assert(sql.sql("SELECT id FROM graft.e WHERE label = 'x'")
        .head.getLong(0) == 100L)
      assert(sql.sql("SELECT count(*) FROM graft.e WHERE label IS NULL")
        .head.getLong(0) == 10)

      // time travel across the evolution boundary: the pre-evolution
      // version reads its OWN narrow schema
      val v1 = sql.sql("SELECT * FROM graft.e VERSION AS OF 1")
      assert(v1.schema.fieldNames.toSeq == Seq("id", "v"))
      assert(v1.count() == 10)

      // a second widening footer-merges the already-evolved table
      sql.sql("ALTER TABLE graft.e ADD COLUMN score BIGINT")
      assert(sql.table("graft.e").schema.fieldNames.toSeq ==
        Seq("id", "v", "label", "score"))
      assert(sql.sql("SELECT count(*) FROM graft.e WHERE score IS NULL")
        .head.getLong(0) == 11)

      // the programmatic read path null-fills under the explicit wide
      // schema too (one warehouse, one evolution)
      assert(wh.read("e", sql.table("graft.e").schema)
        .filter("label = 'x'").count() == 1)

      // refusals: non-nullable, nested, positioned, duplicate
      intercept[Exception] {
        sql.sql("ALTER TABLE graft.e ADD COLUMN z INT NOT NULL")
      }
      intercept[Exception] {
        sql.sql("ALTER TABLE graft.e ADD COLUMN q INT FIRST")
      }
      intercept[Exception] {
        sql.sql("ALTER TABLE graft.e ADD COLUMN label STRING")
      }
      // unchanged by the failed attempts
      assert(sql.table("graft.e").schema.fieldNames.length == 4)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("ALTER TABLE ADD COLUMN on a PARTITIONED table: sidecar schema " +
    "resolution, null-fill, pruning intact, time travel narrow") {
    import spark.implicits._
    val root = tmpDir("whevopart").toString
    val wh = new Warehouse(spark, root, catalogRetention = 4)
    wh.transact {
      wh.replace("p",
        (0 until 12).map(i => (i.toLong, i % 3)).toDF("id", "v"),
        partitionBy = Seq("v"))
    }                                                                 // v1
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val sql = SparkSession.builder()
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.root", root)
      .config("spark.sql.catalog.graft.retention", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      sql.sql("ALTER TABLE graft.p ADD COLUMN label STRING")
      // resolution = sidecar data schema + DISCOVERED partition column;
      // the sidecar itself must stay invisible to partition discovery
      assert(sql.table("graft.p").schema.fieldNames.toSeq ==
        Seq("id", "label", "v"))
      assert(sql.sql("SELECT count(*) FROM graft.p").head.getLong(0) == 12)
      assert(sql.sql("SELECT count(*) FROM graft.p WHERE label IS NULL")
        .head.getLong(0) == 12)
      // partition pruning still reaches the scan after the evolution
      val q = sql.sql("SELECT id FROM graft.p WHERE v = 1")
      assert(q.count() == 4)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"),
        s"partition pruning lost after partitioned widen: $plan")
      // time travel across the boundary reads v1's own narrow schema
      val v1 = sql.sql("SELECT * FROM graft.p VERSION AS OF 1")
      assert(v1.schema.fieldNames.toSeq == Seq("id", "v") && v1.count() == 12)
      // a second widening folds the sidecar-only column in
      sql.sql("ALTER TABLE graft.p ADD COLUMN score BIGINT")
      assert(sql.table("graft.p").schema.fieldNames.toSeq ==
        Seq("id", "label", "score", "v"))
      assert(sql.sql("SELECT count(*) FROM graft.p WHERE score IS NULL")
        .head.getLong(0) == 12)
      // the programmatic read path agrees under the explicit wide schema
      assert(wh.read("p", sql.table("graft.p").schema)
        .filter("label IS NULL AND v = 2").count() == 4)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
