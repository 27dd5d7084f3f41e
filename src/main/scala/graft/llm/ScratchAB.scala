package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TEMPORARY one-JVM A/B harness for round-7 decisions (deleted after
  * the measurements are recorded in COVERAGE.md):
  *   1. q100 HITS: r5 form (persist each half-step, no in-loop
  *      unpersist) vs r6 form (library, rescaleEvery=1) vs new
  *      rescaleEvery=2 — all warm, alternating, same JVM.
  *   2. q103 tf-idf join: persisted weight table vs no persist
  *      (exchange reuse carries the shared subtrees).
  */
object ScratchAB {

  // replica of the round-5 HITS loop: persist every half-step, never
  // unpersist in-loop (frames leak until clearCache)
  private def hitsR5(edges: DataFrame, iters: Int,
                     scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def rescaled(scores: DataFrame): DataFrame = {
      val s = scores.persist(StorageLevel.MEMORY_AND_DISK)
      val mxRow = s.agg(max("score")).collect()(0)
      if (mxRow.isNullAt(0)) s
      else {
        val mx = mxRow.get(0).toString
        s.select(col("node"),
          expr(s"CAST(CAST(score AS DECIMAL(38,0)) * ${scale}L" +
            s" div CAST('$mx' AS DECIMAL(38,0)) AS BIGINT)").as("score"))
      }
    }
    def sumDec = sum(col("score").cast("decimal(38,0)")).as("score")
    var hub = nodes.withColumn("score", lit(scale))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = rescaled(hub.join(e, hub("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sumDec))
      hub = rescaled(auth.join(e, auth("node") === e("dst"))
        .groupBy(col("src").as("node")).agg(sumDec))
    }
    nodes
      .join(hub.select(col("node"), col("score").as("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("score").as("auth")), Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  // tf-idf join replica WITHOUT the weight-table persist
  private def tfidfNoPersist(docs: DataFrame, maxDf: Int,
                             tauNum: Long, tauDen: Long): DataFrame = {
    val termCol = Dedup.shingles(col("text"), 3)
    val tf = docs.select(col("doc_id"), explode(termCol).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    val w = tf.join(dfs, Seq("term"))
      .select(col("doc_id"), col("term"),
        expr("tf * (1000000L div df)").as("w"))
    val norms = w.groupBy("doc_id").agg(sum(expr("w * w")).as("norm2"))
    Dedup.pairsFromMembers(w.groupBy("term")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("w"))))
          .as("ms")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("a.w * b.w").as("p"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("p")).as("num"))
      .join(norms.select(col("doc_id").as("id_a"), col("norm2").as("na2")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("norm2").as("nb2")), "id_b")
      .filter(expr(s"CAST(num * ${tauDen}L AS DECIMAL(38,0))" +
        s" * (num * ${tauDen}L) >=" +
        s" CAST(na2 * ${tauNum}L AS DECIMAL(38,0)) * (nb2 * ${tauNum}L)"))
      .select(col("id_a"), col("id_b"), col("num"), col("na2"), col("nb2"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select(concat(lit("p"), col("l_partkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val variants: Seq[(String, () => Long)] = Seq(
      "hits_r5" -> (() => hitsR5(edges, 3).count()),
      "hits_r6_k1" -> (() =>
        graft.operators.GraphRank.hits(edges, 3).count()),
      "hits_k2" -> (() =>
        graft.operators.GraphRank.hits(edges, 3, rescaleEvery = 2).count()),
      "tfidf_persist" -> (() =>
        TextAnalysis.tfidfSimilarityJoin(docs, maxDf = 20,
          tauNum = 1, tauDen = 2).count()),
      "tfidf_nopersist" -> (() =>
        tfidfNoPersist(docs, maxDf = 20, tauNum = 1, tauDen = 2).count())
    )
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    // warm-up lap (unrecorded), then 3 recorded laps, alternating
    // variants each lap so a host stall can't bias one variant
    for (lap <- 0 to 3; (name, fn) <- variants) {
      val t0 = System.nanoTime()
      fn()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      if (lap > 0) times(name) = times(name) :+ s
    }
    for ((name, _) <- variants) {
      val ts = times(name)
      println(f"AB $name%-16s best=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
