package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.etl.Layout
import graft.llm.{Sketches, TextAnalysis}

/** Corpus-scale soak for the round-6 operators — the scale check the
  * sf0.1 driver bench can't give, one JSON line per phase:
  *
  *  1. sparse tf-idf cosine join over N synthetic documents with ~2%
  *     planted near-duplicate pairs (one substituted token): over a
  *     9973-word hash vocabulary each 58-shingle document is unique, so
  *     a planted pair shares ~55 of its shingles at df=2 while unrelated
  *     docs share nothing under the df cap — the join must return
  *     EXACTLY the planted pairs, proving candidate generation stays
  *     linear (posting groups, never all-pairs) while recall holds;
  *  2. Bloom semi-join of an fMul×N-row fact against a selective dim:
  *     result count must EQUAL the plain broadcast semi-join while the
  *     bitmap alone (checked separately) passes only ~matching rows —
  *     the pre-shuffle kill that matters when the fact side is 100 TB;
  *  3. Z-order layout of N 2-D points vs a 1-D sort layout: count the
  *     files whose min/max stats a second-dimension band probe cannot
  *     exclude — z-order must touch <= half of what the linear layout
  *     touches (file-level stat pruning, the two-column filter story).
  *
  * Usage: `runMain graft.ScaleOpsBench [nDocs]` (default 100000).
  */
object ScaleOpsBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- phase 1: tf-idf join recall + throughput -----------------
    // every 50th doc copies its predecessor with the LAST token
    // substituted -> n/50 planted near-dup pairs (cosine ~ 55/58)
    val planted = (n - 1) / 50
    val seed = when(col("id") % 50 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        concat(
          array_join(transform(sequence(lit(0), lit(58)),
            j => concat(lit("w"), pmod(xxhash64(seed, j), lit(9973)))), " "),
          lit(" "),
          concat(lit("x"), pmod(xxhash64(col("id"), lit(-1)), lit(9973))))
          .as("text"))
      .cache()
    docs.count()                       // exclude synthesis from the timing
    val t0 = System.nanoTime()
    val pairs = TextAnalysis.tfidfSimilarityJoin(docs, maxDf = 20,
        tauNum = 1, tauDen = 2).cache()
    val found = pairs.count()
    val sec1 = (System.nanoTime() - t0) / 1e9
    // the subspace cosine scores a pair by its QUALIFYING terms only, so
    // two docs whose sole qualifying shingle is one chance collision
    // score 1.0 on that one-dimensional evidence — documented behavior,
    // and the exposed norms are exactly the tool to drop thin evidence:
    // planted pairs carry ~56 shared shingles (norm2 ~ 1.4e13), chance
    // colliders one or two (norm2 <= ~5e11)
    val strong = pairs.filter(col("na2") > 1000000000000L &&
      col("nb2") > 1000000000000L).cache()
    val strongN = strong.count()
    val wrong = strong.filter(!(col("id_b") === col("id_a") + 1 &&
      pmod(col("id_b"), lit(50)) === 0)).count()
    println(s"""{"phase":"tfidf_join","docs":$n,"planted":$planted,"found":$found,"strong":$strongN,"wrong":$wrong,"sec":${math.round(sec1 * 100) / 100.0},"docs_per_sec":${(n / sec1).toLong}}""")
    assert(strongN == planted && wrong == 0,
      s"strong=$strongN planted=$planted wrong=$wrong (found=$found)")
    strong.unpersist(); pairs.unpersist(); docs.unpersist()
    // drop the join's internal weight-table persist too, so phase 1's
    // ~5.7M-row cache can't evict phase 2/3 caches and distort them
    spark.catalog.clearCache()

    // ---- phase 2: bloom semi-join at a 20x fact fan-out -----------
    val factN = n * 20
    val dim = spark.range(n / 2).select((col("id") * 7).as("dk")) // sparse keys
    val fact = spark.range(factN).select(col("id").as("fid"),
      pmod(xxhash64(col("id")), lit(n * 4)).as("k")).cache()
    fact.count()
    val t1 = System.nanoTime()
    val viaBloom = Sketches.bloomSemiJoin(fact, col("k"), dim, col("dk")).count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    val exact = fact.join(broadcast(dim), col("k") === col("dk"), "left_semi")
      .count()
    val bits = Sketches.bloomBuild(dim.select(col("dk").as("__k")), col("__k"),
      1 << 20)
    val bloomPass = fact.filter(Sketches.bloomMightContain(bits, col("k")))
      .count()
    println(s"""{"phase":"bloom_semijoin","fact_rows":$factN,"dim_keys":${n / 2},"matches":$viaBloom,"bloom_passed":$bloomPass,"sec":${math.round(sec2 * 100) / 100.0},"fact_rows_per_sec":${(factN / sec2).toLong}}""")
    assert(viaBloom == exact, s"bloom=$viaBloom exact=$exact")
    // the bitmap must do real pre-join killing: false positives bounded
    // (~2.4% of non-matches at 2^20 bits / 50k keys)
    assert(bloomPass < exact + factN / 10,
      s"bloom passed $bloomPass of $factN for $exact matches")
    fact.unpersist()

    // ---- phase 3: z-order two-dimensional file pruning ------------
    val pts = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(1024)).as("x"),
        pmod(xxhash64(col("id"), lit(1L)), lit(1024)).as("y"))
      .cache()
    pts.count()
    def filesTouchingY(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("f"))
        .agg(min("y").as("ymin"), max("y").as("ymax"))
        .filter(col("ymax") >= 256 && col("ymin") < 320).count()
    val t2 = System.nanoTime()
    val zTouch = filesTouchingY(Layout.zorderBy(pts, col("x"), col("y"),
      numFiles = 64, bits = 10))
    val sec3 = (System.nanoTime() - t2) / 1e9
    val linTouch = filesTouchingY(
      pts.repartitionByRange(64, col("x")).sortWithinPartitions(col("x")))
    println(s"""{"phase":"zorder","points":$n,"files":64,"z_files_touched":$zTouch,"linear_files_touched":$linTouch,"sec":${math.round(sec3 * 100) / 100.0}}""")
    assert(zTouch * 2 <= linTouch, s"z=$zTouch linear=$linTouch")
    spark.stop()
  }
}
