package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** Embedding-scale soak for the vector-curation family: synthesize N
  * 64-dim vectors (deterministic hash-derived components — no RNG — with
  * every 20th vector an exact copy of its predecessor), then run the
  * operators a 100 TB curation pass would chain, asserting the planted
  * duplicates are exactly what disappears:
  *
  *  1. deterministic k-means (k=16, 2 Lloyd rounds) — assignment is a
  *     shuffle-free projection, so this phase measures the pure scan+dot
  *     throughput ceiling;
  *  2. SemDeDup at tau=0.999 — an exact copy lands in its original's
  *     cluster by construction (identical vector, identical argmax), so
  *     survivors must equal n minus the planted copies;
  *  3. int8-quantized ANN (32 queries, top-10) — a planted-copy query
  *     must rank its original first even through the quantized ranking.
  *
  * The sf0.1 driver bench proves correctness on 2k vectors; this proves
  * the same plans hold their shape and throughput at 100x that.
  *
  * Usage: `runMain graft.EmbedBench [nVecs]` (default 200000).
  */
object EmbedBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val vecs = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          ((pmod(xxhash64(seed, j), lit(1000000L)).cast("double") / 1e6)
            - lit(0.5)).cast("float")).as("embedding"))
      .cache()
    vecs.count()                       // exclude synthesis from the timing

    val t0 = System.nanoTime()
    val assigned = Similarity.kmeansAssign(vecs, k = 16, iters = 2).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"phase":"kmeans","vecs":$n,"assigned":$assigned,"sec":$sec%.2f,"vecs_per_sec":${(n / sec).toLong}}""")
    assert(assigned == n, s"assigned=$assigned n=$n")

    // phase 2: SemDeDup — exactly the planted copies must drop (random
    // 64-dim vectors never reach cosine 0.999 by chance). The pair stage
    // is ~n^2/(2k) rows, so k GROWS WITH THE CORPUS to hold mean cluster
    // size near ~800 — the documented SemDeDup sizing rule.
    val kc = math.max(256, (n / 800).toInt)
    val t1 = System.nanoTime()
    val kept = Dedup.semDedup(vecs, k = kc, iters = 2, tau = 0.999).count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    val expected = n - (n - 1) / 20
    println(f"""{"phase":"semdedup","vecs":$n,"k":$kc,"survivors":$kept,"expected":$expected,"sec":$sec2%.2f,"vecs_per_sec":${(n / sec2).toLong}}""")
    assert(kept == expected, s"kept=$kept expected=$expected")

    // phase 2b: the nightly-arrivals shape — centroids fixed from the
    // store build, 80% of the corpus pre-assigned as the store, 20%
    // arrives as a batch; cross-boundary copies must be recognized
    // THROUGH the store, and only the batch is ever assigned or compared
    val cut = n * 4 / 5
    val storeVecs = vecs.filter(col("vec_id") < cut)
    val cents = Similarity.kmeansCentroids(storeVecs, k = kc, iters = 2)
    val storeAsg = Similarity.assignTo(storeVecs, cents).cache()
    storeAsg.count()                   // the store pre-exists; not timed
    val batch = vecs.filter(col("vec_id") >= cut)
    val batchN = n - cut
    val t1b = System.nanoTime()
    val incKept = Dedup.semDedupIncremental(storeAsg, batch, cents,
      tau = 0.999).count()
    val sec2b = (System.nanoTime() - t1b) / 1e9
    val expectedBatch = batchN - (((n - 1) / 20) - ((cut - 1) / 20))
    println(f"""{"phase":"semdedup_incremental","store_vecs":$cut,"batch_vecs":$batchN,"survivors":$incKept,"expected":$expectedBatch,"sec":$sec2b%.2f,"batch_vecs_per_sec":${(batchN / sec2b).toLong}}""")
    assert(incKept == expectedBatch, s"kept=$incKept expected=$expectedBatch")

    // phase 3: quantized ANN — 32 queries against the full corpus; the
    // copy at id 20 must find its original at rank 1 through int8 ranking
    val queries = vecs.filter(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val t2 = System.nanoTime()
    val top = Similarity.quantizedTopK(vecs, queries, k = 10).cache()
    val rows = top.count()
    val sec3 = (System.nanoTime() - t2) / 1e9
    val hit = top.filter(col("query_id") === 20 && col("rank") === 1)
      .select(col("vec_id")).head().getLong(0)
    println(f"""{"phase":"quantized_ann","vecs":$n,"queries":32,"rows":$rows,"rank1_for_copy":$hit,"sec":$sec3%.2f,"vecs_per_sec":${(n / sec3).toLong}}""")
    assert(rows == 320, s"rows=$rows")
    assert(hit == 19L, s"rank-1 for the planted copy was $hit, expected 19")
    spark.stop()
  }
}
