package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Dev tool: stage-by-stage timing of the minhash/simhash pipelines. */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }

    time("normalize+split") {
      docs.select(size(split(Dedup.normalized(col("text")), " ")).as("n"))
        .agg(sum("n")).collect().head.getLong(0)
    }
    time("shingles") {
      docs.select(size(Dedup.shingles(col("text"), 3)).as("n"))
        .agg(sum("n")).collect().head.getLong(0)
    }
    time("explode+hash2") {
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
        .select(xxhash64(col("sh")).as("h1"))
        .filter(col("h1") % 2 === 0).count()
    }
    time("minhashTable") {
      Dedup.minhashTable(docs, 32, 3).count()
    }
    time("minhashCandidates") {
      Dedup.minhashCandidates(docs, 32, 8, 3, 0.4).count()
    }
    time("simhashTable") {
      Dedup.simhashTable(docs, 2).count()
    }
    time("simhashCandidates") {
      Dedup.simhashCandidates(docs, 3).count()
    }
    spark.stop()
  }
}
