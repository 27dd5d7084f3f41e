package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Corpus-scale soak for the production dedup family: synthesize N
  * documents (deterministic hash-derived vocabulary — no RNG — with ~5%
  * planted duplicate pairs), then run the full xxhash64 pipeline
  * end-to-end: shingles -> minhash signatures -> banded LSH (capped
  * degenerate buckets) -> candidate pairs -> connected components ->
  * drop non-representatives. Prints one JSON line with docs/sec.
  *
  * This is the scale check the sf0.1 driver bench can't give: hundreds
  * of thousands of documents through exactly the operators a 100 TB
  * corpus would use, verifying the shuffle volume stays signatures-only
  * and the planted duplicates are the ones that disappear.
  *
  * Usage: `runMain graft.DedupBench [nDocs]` (default 200000).
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // every 20th doc copies its predecessor -> n/20 planted dup pairs;
    // all other docs draw 50 tokens from a 9973-word hash vocabulary
    val seed = when(col("id") % 20 === 0 && col("id") > 0, col("id") - 1)
      .otherwise(col("id"))
    val docs = spark.range(n).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(49)),
          j => concat(lit("w"), pmod(xxhash64(seed, j), lit(9973)))), " ")
          .as("text"))
      .cache()
    docs.count()                       // exclude synthesis from the timing

    val t0 = System.nanoTime()
    val survivors = Dedup.dedupCorpus(docs,
      Dedup.minhashCandidates(docs, numHashes = 32, bands = 8, k = 3,
        threshold = 0.5)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val expected = n - (n - 1) / 20    // planted dups must be the drops
    println(f"""{"docs":$n,"survivors":$survivors,"expected":$expected,"sec":$sec%.2f,"docs_per_sec":${(n / sec).toLong}}""")
    assert(survivors == expected, s"survivors=$survivors expected=$expected")
    spark.stop()
  }
}
