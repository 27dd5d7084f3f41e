package graft.sql

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.AnalysisException

/** The warehouse as a SQL catalog: `graft.<table>` must resolve the live
  * snapshot, `VERSION AS OF n` must resolve retained catalog-manifest
  * versions (cross-table consistently), `SHOW TABLES` must enumerate,
  * and every write path must refuse — SQL writes would bypass the
  * single-writer lock and the atomic generation commits. */
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

      // every write path refuses: the warehouse's commit discipline is
      // not reachable from SQL
      intercept[Exception] {
        sql.sql("INSERT INTO graft.a VALUES (99, 99)")
      }
      intercept[Exception] { sql.sql("DROP TABLE graft.a") }
      assert(wh.read("a", sql.table("graft.a").schema).count() == 25)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
