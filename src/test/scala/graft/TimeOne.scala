package graft

import org.apache.spark.sql.SparkSession

/** Test-scope: wall-time an arbitrary named probe. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    args.headOption.getOrElse("wp") match {
      case "wp" =>
        val t0 = System.nanoTime()
        val m = graft.llm.WordPiece.wordpieceMerges(docs, k = 5)
        println(s"[time] wp_merges rows=${m.count()} ${(System.nanoTime()-t0)/1e9}%s")
      case "bpe" =>
        val t0 = System.nanoTime()
        val m = graft.llm.TextAnalysis.bpeMerges(docs, k = 5)
        println(s"[time] bpe_merges rows=${m.count()} ${(System.nanoTime()-t0)/1e9}%s")
    }
    spark.stop()
  }
}
