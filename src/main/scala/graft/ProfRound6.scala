package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: one-JVM best-of-2 A/B of the round-6 perf changes
  * (HITS lazy rescale, FuzzyJoin hashed variant keys) against the
  * round-5 implementations, inlined here verbatim. This VM's host
  * stalls make cross-JVM comparisons meaningless — see
  * vm-bench-variance. */
object ProfRound6 {

  // ---- round-5 HITS: persist + driver collect of the max per half-step
  private def hitsOld(edges: DataFrame, iters: Int,
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
      auth = rescaled(hub
        .join(e, hub("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sumDec))
      hub = rescaled(auth
        .join(e, auth("node") === e("dst"))
        .groupBy(col("src").as("node")).agg(sumDec))
    }
    nodes
      .join(hub.select(col("node"), col("score").as("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("score").as("auth")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  // ---- round-5 FuzzyJoin: raw string variant keys
  private def fuzzyOld(rows: DataFrame, tau: Int,
                       id: Column, str: Column): DataFrame = {
    val base = rows.filter(id.isNotNull && str.isNotNull)
      .select(id.as("__id"), str.as("__s"))
    val s = col("__s")
    val n = length(s)
    def del1(i: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + 2, n - i - 1))
    def del2(i: Column, j: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + 2, j - i - 1),
        s.substr(j + 2, n - j - 1))
    val empty = array().cast("array<string>")
    val v1 = when(n >= 1,
      transform(sequence(lit(0), n - 1), i => del1(i))).otherwise(empty)
    val v2 =
      if (tau < 2) empty
      else when(n >= 2, flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, n - 1), j => del2(i, j))))
      ).otherwise(empty)
    val variants = base.select(col("__id"), n.as("__len"),
      explode(array_distinct(concat(array(s), v1, v2))).as("__key"))
    val a = variants.select(col("__id").as("a_id"), col("__len").as("__la"),
      col("__key"))
    val b = variants.select(col("__id").as("b_id"), col("__len").as("__lb"),
      col("__key"))
    val cands = a.join(b, Seq("__key"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("__la") - col("__lb")) <= tau)
      .select("a_id", "b_id").distinct()
    cands
      .join(base.select(col("__id").as("a_id"), col("__s").as("__sa")), "a_id")
      .join(base.select(col("__id").as("b_id"), col("__s").as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= tau)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def bestOf2(name: String)(f: => Long): Double = {
      def once(): (Double, Long) = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (t1, n1) = once(); val (t2, n2) = once()
      assert(n1 == n2, s"$name row mismatch $n1 vs $n2")
      val best = math.min(t1, t2)
      println(f"$name%-18s best=$best%6.2f s  (runs $t1%.2f / $t2%.2f)  rows=$n1")
      best
    }

    val cust = spark.read.parquet(s"$dir/customer.parquet")
    cust.count()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val edges = li.select(concat(lit("p"), col("l_partkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst"))
    edges.count()

    bestOf2("hits_old") { hitsOld(edges, 3).count() }
    bestOf2("hits_new") { graft.operators.GraphRank.hits(edges, 3).count() }
    bestOf2("fuzzy_old") {
      fuzzyOld(cust, 1, col("c_custkey"), col("c_name")).count()
    }
    bestOf2("fuzzy_new") {
      graft.operators.FuzzyJoin.editDistanceSelfJoin(
        cust, 1, col("c_custkey"), col("c_name")).count()
    }
    val cust4k = cust.filter(col("c_custkey") < 4000)
    bestOf2("fuzzy4k_old") {
      fuzzyOld(cust4k, 1, col("c_custkey"), col("c_name")).count()
    }
    bestOf2("fuzzy4k_new") {
      graft.operators.FuzzyJoin.editDistanceSelfJoin(
        cust4k, 1, col("c_custkey"), col("c_name")).count()
    }
    spark.stop()
  }
}
