package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expr.VectorExprs

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
  *
  * All vector math runs through the native codegen expressions in
  * [[graft.expr.VectorExprs]] (one plan node, tight primitive loop) and
  * every operator precomputes each vector's L2 norm ONCE before any join,
  * so per-pair work is exactly one dot product — never a norm recompute.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VectorExprs.vecDot(a, b)

  def norm(a: Column): Column = VectorExprs.vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** cosine from a precomputed-norm pair: one dot per pair. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force cosine top-k per query vector.
    * `queries`: (query_id, embedding); `corpus`: (vec_id, embedding).
    * The query side is broadcast — corpus never shuffles; the final top-k
    * per query is a bounded-heap aggregation (see [[TopKAggregator]]).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm"))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Random-hyperplane LSH bucketing: `nPlanes` pseudo-random hyperplanes
    * (deterministic per dimension/plane via a hash-derived weight), bucket
    * key = sign bit-pattern — a single native plan node
    * ([[graft.expr.RpBits]]). Probing multiple buckets (the exact bucket
    * plus single-bit flips) trades recall for cost.
    */
  def rpBucket(embedding: Column, dim: Int, nPlanes: Int = 12): Column =
    VectorExprs.rpBits(embedding, dim, nPlanes)

  /** LSH-bucketed ANN top-k: score only within matching buckets. Recall is
    * approximate; increase `nPlanes` for smaller buckets or probe flips for
    * higher recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nPlanes: Int = 8): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm"))
          .as("cosine"))
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
        .select(col("vec_id").as("cell_id"), col("embedding").as("centroid"),
          norm(col("embedding")).as("cent_nrm")))
    // one pass: nearest centroid per corpus vector (norm computed once per
    // vector, not once per (vector, centroid) candidate). Argmax via
    // max_by, NOT a window: the window formulation shuffles and sorts
    // |corpus| x nLists rows, while the aggregate partial-combines
    // map-side and shuffles ONE row per vector — the difference between
    // re-shuffling the corpus nLists-fold and not, at 100 TB. Ordering
    // struct (sim, -cell_id) reproduces (sim desc, cell_id asc) exactly.
    val assigned = corpus
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      .join(centroids)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cell_id"),
        cosinePre(col("embedding"), col("centroid"), col("nrm"), col("cent_nrm"))
          .as("sim"))
      .groupBy("vec_id")
      .agg(
        max_by(struct(col("cell_id"), col("embedding"), col("nrm")),
          struct(col("sim"), -col("cell_id"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.nrm").as("nrm"), col("best.cell_id").as("cell_id"))
    // nProbe nearest cells per query
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id").asc)
    val probes = queries
      .select(col("query_id"), col("embedding").as("q_emb"),
        norm(col("embedding")).as("q_nrm"))
      .join(centroids)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell_id"),
        cosinePre(col("q_emb"), col("centroid"), col("q_nrm"), col("cent_nrm"))
          .as("sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("cell_id"))
    val scored = assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))
          .as("cosine"))
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
