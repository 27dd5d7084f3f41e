package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the (huge) corpus, per-partition scoring, then a global
  * top-k via `TakeOrderedAndProject`-shaped window-free selection.
  *
  * Scale path: random-hyperplane LSH (IVF-like bucketing) — corpus and
  * queries hash into sign-pattern buckets; only same-bucket vectors are
  * scored, turning the n·q scoring into a co-partitioned bucket join.
  * Dot products use `zip_with` + `aggregate` (codegen'd, no UDF).
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k per query vector.
    * `queries`: (query_id, embedding); `corpus`: (vec_id, embedding).
    * The query side is broadcast — corpus never shuffles; the final top-k
    * per query is a window over |queries| × k rows only after local
    * pre-filtering via groupBy-partial `max_by`-style selection.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val scored = corpus.alias("c")
      .join(broadcast(queries.alias("q")),
        if (excludeSelf) col("q.query_id") =!= col("c.vec_id") else lit(true))
      .select(col("q.query_id"), col("c.vec_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Random-hyperplane LSH bucketing: `nPlanes` pseudo-random hyperplanes
    * (deterministic per dimension/plane via a hash-derived weight), bucket
    * key = sign bit-pattern. Probing multiple buckets (the exact bucket
    * plus single-bit flips) trades recall for cost.
    */
  def rpBucket(embedding: Column, dim: Int, nPlanes: Int = 12): Column = {
    // deterministic pseudo-random weight for (plane, dimension): map
    // xxhash64 to [-1, 1) — cheap, reproducible, no driver-side RNG state
    def w(plane: Int, d: Int): Column =
      (xxhash64(lit(plane * 7919 + d)) % 1000000L).cast("double") / 1000000.0
    val bits = (0 until nPlanes).map { p =>
      val proj = (0 until dim).map(d => element_at(embedding, d + 1).cast("double") * w(p, d))
        .reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: score only within matching buckets. Recall is
    * approximate; increase `nPlanes` for smaller buckets or probe flips for
    * higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** IVF-style ANN: partition the corpus into `nLists` cells around
    * deterministic seed centroids (the first `nLists` corpus vectors by
    * id), assign each vector to its nearest centroid once, then probe only
    * the `nProbe` cells nearest each query. Centroid count bounds the
    * assignment cost (|corpus| * nLists dot products, one pass) and
    * probing bounds query cost — the standard coarse-quantizer trade
    * without any ML dependency. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centroids = broadcast(
      corpus.orderBy(col("vec_id")).limit(nLists)
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid")))
    // one pass: nearest centroid per corpus vector
    val assignW = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cell_id").asc)
    val assigned = corpus.join(centroids)
      .select(col("vec_id"), col("embedding"), col("cell_id"),
        cosine(col("embedding"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(assignW))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell_id"))
    // nProbe nearest cells per query
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id").asc)
    val probes = queries.join(centroids)
      .select(col("query_id"), col("embedding").as("q_emb"), col("cell_id"),
        cosine(col("embedding"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("q_emb"), col("embedding")).as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Deterministic per-query top-k: (cosine desc, vec_id asc).
    *
    * Implemented with the bounded-heap [[TopKAggregator]] rather than a
    * `row_number()` window: the window shuffles and sorts EVERY scored
    * row per query; the aggregator's partial aggregation caps map-side
    * state at k rows per (query, partition), so the shuffle is k rows per
    * query per input partition no matter how large the corpus. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    scored
      .groupBy("query_id")
      .agg(topk(col("cosine"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.cosine").as("cosine"))
  }
}

/** Custom typed aggregator (SURVEY §2.11 tier-b extension): bounded
  * top-k by (cosine desc, vec_id asc) with a k-capped buffer, giving
  * map-side-combining top-k selection usable from `groupBy(...).agg`. */
final class TopKAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      TopKAggregator.In, Seq[TopKAggregator.In], Seq[TopKAggregator.In]] {
  import TopKAggregator.In

  override def zero: Seq[In] = Vector.empty

  private def better(a: In, b: In): Boolean =
    a.cosine > b.cosine || (a.cosine == b.cosine && a.vec_id < b.vec_id)

  private def insert(buf: Seq[In], x: In): Seq[In] =
    if (buf.length < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def reduce(buf: Seq[In], x: In): Seq[In] = insert(buf, x)
  override def merge(b1: Seq[In], b2: Seq[In]): Seq[In] = b2.foldLeft(b1)(insert)
  override def finish(r: Seq[In]): Seq[In] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[In]] = bufferEncoder
}

object TopKAggregator {
  final case class In(cosine: Double, vec_id: Long)
}
