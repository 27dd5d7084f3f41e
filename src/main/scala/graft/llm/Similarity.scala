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

  /** Guarded cosine: a zero-norm side has no direction, so the score is
    * -2.0 — strictly below every real cosine, so zero vectors never win
    * a top-k and never cross a tau — instead of an ANSI divide-by-zero
    * crash (Spark 4 default) or a null poisoning the top-k aggregator's
    * non-nullable buffer. Nonzero inputs evaluate the identical
    * arithmetic, so the SQL oracle replays are unchanged. */
  def cosine(a: Column, b: Column): Column =
    when(norm(a) === 0.0 || norm(b) === 0.0, lit(-2.0))
      .otherwise(dot(a, b) / (norm(a) * norm(b)))

  /** cosine from a precomputed-norm pair: one dot per pair; same
    * zero-norm guard as [[cosine]]. */
  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(-2.0))
      .otherwise(dot(a, b) / (na * nb))

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
              nPlanes: Int = 8, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"),
      rpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
        else lit(true))
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
              nLists: Int = 16, nProbe: Int = 4,
              excludeSelf: Boolean = true): DataFrame = {
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
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
        else lit(true))
      .select(col("query_id"), col("vec_id"),
        cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm"))
          .as("cosine"))
    topKPerQuery(scored, k)
  }

  /** Deterministic Lloyd's k-means over an embedding column, engine-portable.
    *
    * Everything is reproducible bit-for-bit on any engine (the DuckDB
    * oracle recomputes all iterations):
    *   - seeds = the `k` corpus vectors with the smallest `vec_id`
    *     (cluster ids 0..k-1 in that order) — no RNG;
    *   - assignment = argmax cosine, ties to the smallest cluster id;
    *     computed per-row against the centroid set in ONE native plan
    *     node ([[graft.expr.CentroidArgMax]] — k dots in a tight loop,
    *     NO join and NO shuffle; the corpus never moves);
    *   - centroid update sums `floor(component * 1e9 + 0.5)` as exact
    *     integers (order-independent, portable) and divides back in a
    *     fixed op order: `(sum.toDouble / 1e9) / count`. A cluster that
    *     loses every member keeps its previous centroid.
    *
    * Scale: each iteration is one pass over the corpus — a shuffle-free
    * argmax projection plus a partial-aggregated (cluster, dim)-cell sum
    * whose shuffle is `k * dim` rows per input partition. Centroids
    * (`k * dim` doubles) live on the driver, the same bounded-metadata
    * collect the IVF coarse quantizer uses. The integer centroid sums are
    * exact below 2^53 / 1e9 ≈ 9e6 member-components per cluster-cell times
    * whatever slack the double mantissa has left — beyond that (≈ billions
    * of rows per cluster) the final cast rounds identically on both
    * engines but the docstring caveat applies: drop the scale to 1e6.
    *
    * Returns the assignment DataFrame (vec_id, cluster, cosine-to-final-
    * centroid) computed with the final centroids.
    */
  /** Top-k agreement (recall@k) report — the tuning readout every
    * approximate index needs against the exact scan (the y-axis of the
    * FAISS recall-vs-nProbe curve): per query, how many of the exact
    * top-k the approximate candidate list recovered. Pure integer join
    * algebra over two k-rows-per-query tables — the corpus is never
    * re-touched, so the report costs O(queries x k): per-side counts
    * partial-aggregate map-side, the hit join is an equi-join on
    * (query, neighbor). Queries the approximate side missed entirely
    * still report (hits = 0). `recall@k = hits / n_exact`, left to the
    * caller so the report stays exact-integer. */
  def topKAgreement(exact: DataFrame, approx: DataFrame,
                    query: Column = col("query_id"),
                    neighbor: Column = col("vec_id")): DataFrame = {
    // distinct: a caller passing a raw candidate list (a multi-probe
    // union, not a topK output) must not double-count hits through the
    // join's multiplicity — recall can never exceed 1
    val e = exact.select(query.as("query_id"), neighbor.as("__n")).distinct()
    val a = approx.select(query.as("query_id"), neighbor.as("__n")).distinct()
    val nE = e.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
    val nA = a.groupBy("query_id").agg(count(lit(1)).as("n_approx"))
    val hits = e.join(a, Seq("query_id", "__n"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    nE.join(nA, Seq("query_id"), "full_outer")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("hits"), lit(0L)).as("hits"))
  }

  def kmeansAssign(corpus: DataFrame, k: Int, iters: Int,
                   idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame =
    assignTo(corpus, kmeansCentroids(corpus, k, iters, idCol, embCol),
        idCol, embCol)
      .select(col(idCol), col("cluster"), col("cosine"))

  /** Assign every vector to its argmax-cosine centroid (ties to the
    * smallest index) — one native plan node per row, no shuffle.
    * Returns (id, embedding, cluster, cosine). */
  def assignTo(corpus: DataFrame, centroids: Array[Array[Double]],
               idCol: String = "vec_id", embCol: String = "embedding")
      : DataFrame = {
    require(centroids.nonEmpty, "assignTo needs at least one centroid")
    corpus
      .select(col(idCol), col(embCol),
        VectorExprs.centroidArgMax(col(embCol), centroids).as("best"))
      .select(col(idCol), col(embCol),
        col("best.cluster").as("cluster"), col("best.cosine").as("cosine"))
  }

  /** The Lloyd-iteration loop of [[kmeansAssign]], returning the FINAL
    * centroids — the fixed coarse structure an incremental maintainer
    * (e.g. [[Dedup.semDedupIncremental]]) assigns later arrivals
    * against. `k * dim` doubles on the driver (bounded metadata). */
  /** The deterministic smallest-id seed vectors as driver metadata —
    * the ONE seed-collect shared by k-means, the PQ codebook, and the
    * IVF-PQ coarse quantizer (three verbatim copies before). */
  private def seedVectors(corpus: DataFrame, n: Int, idCol: String,
                          embCol: String): Array[Array[Double]] =
    corpus.orderBy(col(idCol)).limit(n).select(col(embCol)).collect()
      .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)

  /** ADC score: sum over the m subspaces of the query LUT entry the
    * corpus code selects — one copy of the 1-based stride arithmetic
    * (it has already been bug-fixed once; two verbatim copies could
    * silently diverge). */
  private def adcScore(lut: Column, codes: Column, m: Int,
                       stride: Int): Column =
    (0 until m).map { j =>
      element_at(lut, lit(j * stride + 1) + element_at(codes, j + 1))
    }.reduce(_ + _)

  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
                      idCol: String = "vec_id", embCol: String = "embedding")
      : Array[Array[Double]] = {
    require(k >= 1 && iters >= 0, s"k=$k iters=$iters")
    val seeds = seedVectors(corpus, k, idCol, embCol)
    require(seeds.nonEmpty, "kmeans needs a non-empty corpus")
    var centroids = seeds
    var it = 0
    while (it < iters) {
      val cells = assignTo(corpus, centroids, idCol, embCol)
        .select(col("cluster"), posexplode(col(embCol)).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
               .cast("decimal(38,0)")).as("s"),
             count(lit(1)).as("c"))
        .collect()
      val byCluster = cells.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (old, cl) =>
        byCluster.get(cl) match {
          case None => old
          case Some(rows) =>
            val comp = old.clone()
            rows.foreach { r =>
              comp(r.getInt(1)) =
                (r.getDecimal(2).doubleValue() / 1e9) / r.getLong(3).toDouble
            }
            comp
        }
      }
      it += 1
    }
    centroids
  }

  /** Per-group mean embedding (class centroids — domain profiles,
    * label prototypes for mislabel mining, diversity scoring). The mean
    * is computed through exact `floor(v*1e9+0.5)` integer sums — the
    * same engine-portable trick [[kmeansAssign]]'s update step uses —
    * so the result is independent of accumulation order and
    * recomputable bit-for-bit by any engine. One explode + one
    * partial-aggregated groupBy of `groups x dim` cells; the array is
    * reassembled with `sort_array`, never a window. */
  def meanEmbedding(df: DataFrame, group: Column,
                    emb: Column = col("embedding")): DataFrame =
    df.select(group.as("group"), posexplode(emb).as(Seq("pos", "v")))
      .groupBy("group", "pos")
      .agg(sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
             .cast("decimal(38,0)")).as("s"),
           count(lit(1)).as("c"))
      .select(col("group"), col("pos"),
        ((col("s").cast("double") / lit(1e9)) / col("c").cast("double"))
          .as("m"))
      .groupBy("group")
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("group"),
        transform(col("pm"), s => s.getField("m")).as("centroid"))

  /** Symmetric int8 quantization of a float embedding: per-vector scale
    * `127 / max(|v|)`, component `floor(v * scale + 0.5)`. Every step is
    * a deterministic IEEE op, so quantized vectors are engine-portable.
    * Zero vectors quantize to zeros. Quantization is the cheap one-time
    * preprocessing pass; the per-pair hot kernel is [[VectorExprs.vecDotInt]]
    * — EXACT integer arithmetic, immune to accumulation order. */
  def quantize(emb: Column, maxAbs: Column): Column = {
    val scale = lit(127.0) / maxAbs
    transform(emb,
      x => when(maxAbs === 0.0, lit(0))
        .otherwise(floor(x.cast("double") * scale + lit(0.5)).cast("int")))
  }

  /** Per-vector max(|component|) — materialize this as its own column
    * before calling [[quantize]], so the max is computed once per vector
    * rather than re-evaluated inside the per-element lambda. */
  def maxAbs(emb: Column): Column =
    array_max(transform(emb, x => abs(x))).cast("double")

  /** Quantized ANN: int8-quantize corpus and queries (4x less state than
    * float32 — at 100 TB the difference between an index that fits
    * executor memory and one that doesn't), rank candidates per query by
    * the approximate integer-dot cosine, then exact-rescore ONLY the
    * surviving top-k with full-precision floats. One NATIVE integer dot
    * ([[graft.expr.VecDotInt]] — exact, accumulation-order-immune, hence
    * fully oracle-able) per scored pair; one float dot per (query x k)
    * survivor. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    excludeSelf: Boolean = true): DataFrame = {
    def quantized(df: DataFrame, id: String, emb: Column): DataFrame =
      df.select(col(id), emb.as("emb"), maxAbs(emb).as("mx"))
        .select(col(id), col("emb"), quantize(col("emb"), col("mx")).as("qv"))
        .withColumn("qn", VectorExprs.vecDotInt(col("qv"), col("qv")))
    val c = quantized(corpus, "vec_id", col("embedding"))
      .select(col("vec_id"), col("qv"), col("qn"))
    val q = quantized(queries, "query_id", col("embedding"))
      .select(col("query_id"), col("qv").as("q_qv"), col("qn").as("q_qn"))
    // excludeSelf assumes queries drawn FROM the corpus (shared id
    // space); disable it when query ids are unrelated to corpus ids, or
    // a coincidental id match would silently hide a valid candidate
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"),
        // zero vectors quantize to zeros (qn = 0): same -2.0 law as
        // [[cosine]] instead of an ANSI division crash
        when(col("q_qn") === 0 || col("qn") === 0, lit(-2.0))
          .otherwise(
            VectorExprs.vecDotInt(col("q_qv"), col("qv")).cast("double") /
              (sqrt(col("q_qn").cast("double")) *
                sqrt(col("qn").cast("double"))))
          .as("cosine"))
    // exact rescore of the <= |queries| * k survivors only (the shared
    // broadcast-side rescore; the corpus never shuffles for it)
    exactRescore(corpus, queries,
      topKPerQuery(scored, k).withColumnRenamed("cosine", "approx_cos"))
  }

  /** Product-quantization codebook: `ks` FULL-LENGTH entries whose `m`
    * subspace windows are trained independently — entry `k`'s window
    * `j` is the Lloyd mean of the subvectors coded `k` in subspace `j`
    * (`iters = 0` = the deterministic smallest-id seeds, the
    * SQL-replayable configuration; each iteration refines every window
    * with the same exact `floor(v*1e9+0.5)` integer-sum update as
    * [[kmeansCentroids]], so trained codebooks are engine-portable
    * too). `ks * dim` doubles of driver metadata. */
  def pqCodebook(corpus: DataFrame, ks: Int, m: Int, iters: Int = 0,
                 idCol: String = "vec_id", embCol: String = "embedding")
      : Array[Array[Double]] = {
    require(ks >= 1 && m >= 1 && iters >= 0, s"ks=$ks m=$m iters=$iters")
    var cb: Array[Array[Double]] = seedVectors(corpus, ks, idCol, embCol)
    require(cb.nonEmpty, "pqCodebook needs a non-empty corpus")
    val dim = cb(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    var it = 0
    while (it < iters) {
      val cells = corpus
        .select(col(embCol).as("emb"),
          graft.expr.VectorExprs.pqCode(col(embCol), cb, m).as("codes"))
        .select(col("emb"), posexplode(col("codes")).as(Seq("j", "code")))
        .select(col("j"), col("code"),
          posexplode(slice(col("emb"), col("j") * lit(sub) + lit(1),
            lit(sub))).as(Seq("p", "v")))
        .groupBy("j", "code", "p")
        .agg(sum(floor(col("v").cast("double") * lit(1e9) + lit(0.5))
               .cast("decimal(38,0)")).as("s"),
             count(lit(1)).as("c"))
        .collect()
      val next = cb.map(_.clone())
      cells.foreach { r =>
        next(r.getInt(1))(r.getInt(0) * sub + r.getInt(2)) =
          (r.getDecimal(3).doubleValue() / 1e9) / r.getLong(4).toDouble
      }
      cb = next
      it += 1
    }
    cb
  }

  /** PQ-ADC approximate top-k: documents live as `m` int codes (8 B/row
    * at m=4 — the 32x storage cut), each query precomputes its
    * `m * ks` asymmetric-distance lookup table ONCE
    * ([[graft.expr.PqLut]]), and every (query, doc) pair costs `m`
    * array lookups instead of a `dim`-term dot. The scan is exhaustive
    * over codes (FAISS IndexPQ shape); compose with the IVF coarse
    * quantizer ([[ivfTopK]]'s cell routing) for the IVF-PQ
    * 100 TB path — the two prune independently. Survivors get an exact
    * cosine rescore (broadcast-sized set, corpus never re-shuffles).
    * Ranking is by ADC score (dot-product surrogate), ties to the
    * smaller vec_id; deterministic end to end, and with `iters = 0`
    * codebooks the whole pipeline — codes, LUTs, scores, ranks —
    * replays in SQL. */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                ks: Int = 8, m: Int = 4, iters: Int = 0,
                excludeSelf: Boolean = true): DataFrame = {
    val cb = pqCodebook(corpus, ks, m, iters)
    // a corpus smaller than ks yields a short codebook; the LUT stride
    // is the ACTUAL entry count, not the requested one
    val stride = cb.length
    val enc = corpus.select(col("vec_id"),
      graft.expr.VectorExprs.pqCode(col("embedding"), cb, m).as("codes"))
    val q = queries.select(col("query_id"),
      graft.expr.VectorExprs.pqLut(col("embedding"), cb, m).as("lut"))
    val adc = adcScore(col("lut"), col("codes"), m, stride)
    val scored = enc.join(broadcast(q),
        if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .select(col("query_id"), col("vec_id"), adc.as("cosine"))
    exactRescore(corpus, queries,
      topKPerQuery(scored, k).withColumnRenamed("cosine", "adc"))
  }

  /** Shared exact-cosine rescore of a broadcast-sized top-k table: the
    * corpus never shuffles — survivors and queries are the broadcast
    * side both times. Appends `exact_cos` to whatever columns `top`
    * carries. */
  private def exactRescore(corpus: DataFrame, queries: DataFrame,
                           top: DataFrame): DataFrame = {
    val keep = top.columns.map(col).toSeq
    corpus.select(col("vec_id"), col("embedding").as("c_emb"))
      .join(broadcast(top), "vec_id")
      .join(broadcast(queries.select(col("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(keep :+ cosine(col("q_emb"), col("c_emb")).as("exact_cos"): _*)
  }

  /** IVF-PQ: the two ANN prunes composed — the 100 TB serving shape
    * (FAISS IndexIVFPQ). The IVF coarse quantizer routes every corpus
    * vector to its argmax-cosine cell in ONE shuffle-free native plan
    * node ([[graft.expr.CentroidArgMax]] — the corpus never moves for
    * assignment), queries probe their `nProbe` nearest cells, and only
    * the probed cells' vectors are scored — as PQ codes via the m-lookup
    * ADC, never as full vectors. The scan therefore touches
    * `nProbe / nLists` of the corpus and reads 8-byte codes instead of
    * 256-byte vectors: the two reductions multiply. Survivors get the
    * exact rescore. Same determinism contract as [[pqAdcTopK]]: with
    * `iters = 0` codebooks everything — cells, probes, codes, ADC
    * scores, ranks, rescores — replays in SQL bit-for-bit. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nLists: Int = 16, nProbe: Int = 4,
                ks: Int = 8, m: Int = 4, iters: Int = 0,
                excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = seedVectors(corpus, nLists, "vec_id", "embedding")
    val cb = pqCodebook(corpus, ks, m, iters)
    val enc = corpus.select(col("vec_id"),
      graft.expr.VectorExprs.centroidArgMax(col("embedding"), cents)
        .getField("cluster").as("cell_id"),
      graft.expr.VectorExprs.pqCode(col("embedding"), cb, m).as("codes"))
    // centroid norms ride the broadcast row, query norms the probe
    // projection — each computed ONCE (the module invariant), not per
    // (query, cell) pair
    val centRows = broadcast(corpus.sparkSession.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq)
      .toDF("cell_id", "centroid")
      .withColumn("cent_nrm", norm(col("centroid"))))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell_id").asc)
    val probes = queries
      .select(col("query_id"),
        graft.expr.VectorExprs.pqLut(col("embedding"), cb, m).as("lut"),
        col("embedding").as("q_emb"), norm(col("embedding")).as("q_nrm"))
      .join(centRows)
      .select(col("query_id"), col("lut"), col("cell_id"),
        cosinePre(col("q_emb"), col("centroid"), col("q_nrm"),
          col("cent_nrm")).as("sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("lut"), col("cell_id"))
    val stride = cb.length // actual codebook size, not the requested ks
    val adc = adcScore(col("lut"), col("codes"), m, stride)
    val scored = enc.join(broadcast(probes), Seq("cell_id"))
      .filter(if (excludeSelf) col("query_id") =!= col("vec_id")
        else lit(true))
      .select(col("query_id"), col("vec_id"), adc.as("cosine"))
    exactRescore(corpus, queries,
      topKPerQuery(scored, k).withColumnRenamed("cosine", "adc"))
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

  // ------------------------------------------------- margin-based mining

  /** Margin-based pair mining (Artetxe & Schwenk 2019 — the CCMatrix /
    * LASER bitext-mining scorer): a pair (a, b) is a mined match when
    * its similarity stands OUT against each side's own neighborhood,
    * not merely when the raw cosine is high — raw-cosine thresholds
    * fail because some vectors (hub points, short sentences) are close
    * to everything. The margin here is the published "distance" variant
    * on integer-quantized cosines, exactly:
    *
    *   `ci = floor(cos * 1e9 + 0.5)`  (one IEEE multiply+add+floor —
    *   bit-identical across engines; every later step is exact integer)
    *   `margin(a,b) = 2k*ci(a,b) - sumA(a) - sumB(b)`
    *
    * where `sumA(a)` is the sum of a's k best `ci` among its scored
    * pairs (ties broken by neighbor id) and `sumB(b)` symmetrically —
    * i.e. `2k` times the distance-margin `cos - (avgK_a + avgK_b)/2`,
    * scaled to integers so sums are order-free and cross-engine exact.
    * Mined pairs are the MUTUAL best (a is b's argmax by (margin desc,
    * id) and vice versa) with `margin >= minMargin`. A side with fewer
    * than k scored neighbors has no denominator and is excluded (in the
    * exact variant that only happens when |A| < k or |B| < k); zero-norm
    * vectors score the guarded -2.0 cosine and never win.
    *
    * Scale shape: this kernel consumes a CANDIDATE pair table. The
    * exact variant ([[marginMine]]) broadcasts the smaller side —
    * all-pairs is the completeness baseline, same contract as
    * [[bruteForceTopK]]; at corpus scale feed LSH/IVF co-bucketed
    * candidates instead ([[marginMineCandidates]]) and the kNN
    * denominators restrict to the candidate graph — the FAISS-mining
    * approximation CCMatrix itself ships. Per-side top-k runs as
    * `row_number <= k` (map-side WindowGroupLimit before either
    * shuffle), so each of the two rank passes moves at most k rows per
    * side key. */
  def marginScores(scored: DataFrame, k: Int,
                   onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k")
    // the pair scoring (one dot per candidate) feeds THREE consumers —
    // both side sums and the join base — so it persists once instead of
    // re-running the dot products per branch (the GraphRank discipline;
    // long-lived callers unpersist via onPersist)
    val sc = scored.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(sc)
    val wa = Window.partitionBy("a_id").orderBy(col("ci").desc, col("b_id"))
    val wb = Window.partitionBy("b_id").orderBy(col("ci").desc, col("a_id"))
    def sideSum(w: org.apache.spark.sql.expressions.WindowSpec,
                key: String, out: String): DataFrame =
      sc.withColumn("__r", row_number().over(w)).filter(col("__r") <= k)
        .groupBy(key).agg(count(lit(1)).as("__n"), sum("ci").as(out))
        .filter(col("__n") === k).drop("__n")
    sc
      .join(sideSum(wa, "a_id", "__sa"), Seq("a_id"))
      .join(sideSum(wb, "b_id", "__sb"), Seq("b_id"))
      .withColumn("margin",
        lit(2L * k) * col("ci") - col("__sa") - col("__sb"))
      .select(col("a_id"), col("b_id"), col("ci"), col("margin"))
  }

  /** [[marginScores]] + the mutual-best mining decision. `pairs` must
    * carry (a_id, b_id, ci). */
  def marginMineFromScored(pairs: DataFrame, k: Int, minMargin: Long,
                           onPersist: DataFrame => Unit = _ => ())
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the margin table likewise feeds three consumers (both argmaxes
    // and the mutual join base) — persist, don't recompute
    val m = marginScores(pairs, k, onPersist).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(m)
    def best(key: String, other: String): DataFrame =
      m.withColumn("__r", row_number().over(
          Window.partitionBy(key).orderBy(col("margin").desc, col(other))))
        .filter(col("__r") === 1).select("a_id", "b_id")
    m.join(best("a_id", "b_id"), Seq("a_id", "b_id"))
      .join(best("b_id", "a_id"), Seq("a_id", "b_id"))
      .filter(col("margin") >= minMargin)
      .select(col("a_id"), col("b_id"), col("ci"), col("margin"))
  }

  /** Integer-quantized guarded cosine for a joined pair of embedding
    * columns with precomputed norms. */
  private def ciCol(ae: Column, be: Column, an: Column, bn: Column): Column =
    floor(cosinePre(ae, be, an, bn) * lit(1e9) + lit(0.5)).cast("long")

  /** Cluster-balanced corpus subset — the DataComp/LAION-style
    * diversity-capping curation stage: assign every vector to its
    * nearest fixed centroid ([[assignTo]] — the k-means state the
    * pipeline already landed), rank within each cluster by the
    * engine's deterministic md5 law ([[Sampling.groupSample]]'s
    * (hash(id), id) order — no RNG, partition-invariant), and KEEP at
    * most `cap` per cluster. Over-represented clusters (boilerplate
    * families, spam templates, near-duplicate scrapes) stop dominating
    * the training mix while rare clusters survive whole — the
    * diversity complement to similarity dedup, which removes pairs but
    * cannot shrink a 10M-doc template cluster of mutually-dissimilar
    * members.
    *
    * Returns EVERY assigned row with (cluster, sample_rank, keep) —
    * capped-out rows stay visible with a null rank for audit (the
    * never-drop-silently discipline); callers filter `keep`. Scale
    * shape: the assignment is a shuffle-free projection against
    * broadcast-literal centroids, persisted once because the rank pass
    * and the audit join both consume it; the rank pass is `row_number
    * <= cap` — map-side WindowGroupLimit, so at most `cap` rows per
    * cluster per partition shuffle — and the audit join is id-keyed. */
  def clusterBalancedSample(corpus: DataFrame,
                            centroids: Array[Array[Double]], cap: Int,
                            onPersist: DataFrame => Unit = _ => ())
      : DataFrame = {
    require(cap >= 1, s"cap=$cap")
    val assigned = assignTo(corpus, centroids)
      .select(col("vec_id"), col("cluster"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(assigned)
    val kept = Sampling.groupSample(assigned, col("cluster"),
      col("vec_id"), cap)
    assigned
      .join(kept.select(col("vec_id"), col("sample_rank")),
        Seq("vec_id"), "left")
      .withColumn("keep", col("sample_rank").isNotNull)
      .select(col("vec_id"), col("cluster"), col("sample_rank"), col("keep"))
  }

  /** Embedding outlier detection — the LAION-style "far from every
    * centroid" quality filter: a vector whose cosine to its OWN
    * nearest centroid sits more than `sigmas` standard deviations
    * below that cluster's mean is flagged (mislabeled pairs, garbage
    * embeddings, encoder failures — the population each cluster's own
    * distribution defines, which no global threshold can: clusters
    * differ in tightness exactly like languages differ in LM score,
    * the q167 lesson).
    *
    * Exact integer law (the bucket-outliers discipline — no float
    * variance, no libm sqrt): with `ci = floor(cos*1e9 + 0.5)`,
    * per-cluster `n`, `S = Σci`, `Q = Σci²`, a vector is an outlier
    * iff `n·ci < S` AND `(S − n·ci)² > sigmas²·(n·Q − S²)` — the
    * one-sided `x < μ − kσ` test with denominators cleared, every
    * quantity exact in decimal(38) (Q ≤ n·1e18: fine through
    * billion-row clusters). A 1-vector cluster has zero variance and
    * flags nothing; a zero-norm vector lands in cluster 0 with
    * cosine 0 ([[graft.expr.VectorExprs.CentroidArgMax]]'s documented
    * no-direction law) — far below any coherent cluster's mean, so it
    * flags whenever its cluster is tight enough to see it.
    *
    * Scale shape: assignment is the shuffle-free broadcast-literal
    * projection (persisted once — the moment pass and the flag join
    * both consume it); cluster moments are one partial-aggregated
    * groupBy to ≤|centroids| rows, broadcast back. */
  def embeddingOutliers(corpus: DataFrame, centroids: Array[Array[Double]],
                        sigmas: Int = 2,
                        onPersist: DataFrame => Unit = _ => ())
      : DataFrame = {
    require(sigmas >= 1, s"sigmas=$sigmas")
    val assigned = assignTo(corpus, centroids)
      .select(col("vec_id"), col("cluster"),
        floor(col("cosine") * lit(1e9) + lit(0.5)).cast("long").as("ci"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(assigned)
    val moments = assigned.groupBy("cluster").agg(
      count(lit(1)).as("__n"),
      sum(expr("CAST(ci AS DECIMAL(38,0))")).as("__s"),
      sum(expr("CAST(ci AS DECIMAL(38,0)) * ci")).as("__q"))
    assigned.join(broadcast(moments), Seq("cluster"))
      .withColumn("is_outlier", expr(
        s"""__n * ci < __s AND
           |  (__s - __n * ci) * (__s - __n * ci) >
           |    ${sigmas.toLong * sigmas} * (__n * __q - __s * __s)"""
          .stripMargin))
      .select(col("vec_id"), col("cluster"), col("ci"), col("is_outlier"))
  }

  /** Johnson–Lindenstrauss random projection of the embedding column
    * to `outDim` dimensions ([[graft.expr.RpProject]] — [[rpBucket]]'s
    * exact signed weight law, left-fold accumulation, bit-identical
    * cross-engine; the LSH bits ARE this projection's sign pattern).
    * JL preserves pairwise geometry at outDim = O(log n / eps²); at
    * corpus scale the point is cost — a 64→8 projection shrinks every
    * downstream pairwise pass 8× and the projected table becomes the
    * cheap first-stage filter. One narrow codegen'd projection: no
    * shuffle, the corpus never moves. */
  def jlProject(vectors: DataFrame, dim: Int, outDim: Int,
                id: Column = col("vec_id"),
                embedding: Column = col("embedding")): DataFrame =
    vectors.select(id.as("vec_id"),
      VectorExprs.rpProject(embedding, dim, outDim).as("projected"))

  /** JL distortion audit: over a deterministic pair panel (all pairs
    * among `vec_id < panel`), the quantized cosine in the ORIGINAL
    * space vs the PROJECTED space and their absolute error — the
    * empirical check that the cheap space ranks like the true space,
    * run BEFORE a pipeline trusts [[jlProject]]'s output as a
    * first-stage filter. Cosines quantize exactly like the ANN family
    * (`floor(cos·1e9 + 0.5)` after bit-identical IEEE steps), so the
    * report is exact integers. Panel-sized by construction: both
    * sides broadcast, pairs = panel²/2 — an audit, never a
    * corpus-scale pass. */
  def jlDistortionReport(vectors: DataFrame, dim: Int, outDim: Int,
                         panel: Long = 24): DataFrame = {
    require(panel >= 2, s"panel=$panel")
    val base = vectors.filter(col("vec_id") < panel)
      .select(col("vec_id"), col("embedding"),
        VectorExprs.rpProject(col("embedding"), dim, outDim).as("proj"))
    val a = base.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("proj").as("pa"))
    val b = base.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("proj").as("pb"))
    def q(c: Column): Column = floor(c * lit(1e9) + lit(0.5)).cast("long")
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        q(dot(col("ea"), col("eb")) /
          (norm(col("ea")) * norm(col("eb")))).as("cos_orig"),
        q(dot(col("pa"), col("pb")) /
          (norm(col("pa")) * norm(col("pb")))).as("cos_proj"))
      .withColumn("err", abs(col("cos_orig") - col("cos_proj")))
  }

  /** Hard-negative mining for contrastive/embedding training — the
    * DPR/ANCE recipe: in-batch random negatives are too easy, so the
    * trainer wants, per anchor, the corpus vectors that are SIMILAR
    * but wrong. For each anchor this returns the k best corpus
    * vectors by quantized cosine ([[ciCol]]'s `floor(cos*1e9+0.5)` —
    * exact integers after one bit-identical IEEE step) inside a
    * similarity BAND: `ci < hiCi` (the near-duplicate ceiling — above
    * it a "negative" is probably an unlabeled positive, the classic
    * false-negative poisoning) and `ci >= loCi` (the triviality floor
    * — far-away vectors teach nothing), minus any explicitly-known
    * positive pairs (`positives`: (query_id, vec_id), anti-joined).
    * Ranking is deterministic: (ci desc, vec_id asc).
    *
    * Composes with itself: `k = 1` with no exclusions mines the band
    * argmax as the retrieved positive; feeding that back via
    * `positives` yields the negatives below it. Scale shape: anchors
    * and positives broadcast (both query-set-sized — the
    * [[bruteForceTopK]] contract); the corpus never shuffles, the
    * band filter prunes before the bounded-heap top-k, and the heap
    * caps map-side state at k per (anchor, partition). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, k: Int,
                    loCi: Long, hiCi: Long,
                    positives: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k=$k")
    require(loCi < hiCi, s"empty band: loCi=$loCi hiCi=$hiCi")
    val c = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("c_nrm"))
    val q = anchors.select(col("query_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_nrm"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        ciCol(col("q_emb"), col("embedding"), col("q_nrm"), col("c_nrm"))
          .as("ci"))
      .filter(col("ci") >= loCi && col("ci") < hiCi)
    val banded = positives.fold(scored)(p =>
      scored.join(broadcast(p.select("query_id", "vec_id")),
        Seq("query_id", "vec_id"), "left_anti"))
    // ci <= 1e9 << 2^53: exact through the double-typed bounded heap
    topKPerQuery(banded.withColumn("cosine", col("ci").cast("double")), k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("cosine").cast("long").as("ci"))
  }

  /** Exact margin mining: ALL pairs A x B scored, side B broadcast —
    * use when one side fits an executor (the completeness baseline and
    * the oracle's form); at scale use [[marginMineCandidates]]. */
  def marginMine(a: DataFrame, b: DataFrame, k: Int = 4,
                 minMargin: Long = Long.MinValue,
                 id: Column = col("vec_id"),
                 emb: Column = col("embedding"),
                 onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    val aN = a.select(id.as("a_id"), emb.as("__ae"), norm(emb).as("__an"))
    val bN = b.select(id.as("b_id"), emb.as("__be"), norm(emb).as("__bn"))
    val pairs = aN.crossJoin(broadcast(bN))
      .select(col("a_id"), col("b_id"),
        ciCol(col("__ae"), col("__be"), col("__an"), col("__bn")).as("ci"))
    marginMineFromScored(pairs, k, minMargin, onPersist)
  }

  /** Candidate-pruned margin mining: score only the supplied candidate
    * pairs (e.g. [[rpBucket]] co-bucketed ids — one equi-join, never
    * all-pairs) and mine with kNN denominators restricted to the
    * candidate graph, the standard ANN-mining approximation. With
    * candidates = all pairs this equals [[marginMine]] exactly
    * (spec-pinned). `candidates`: (a_id, b_id). */
  def marginMineCandidates(candidates: DataFrame, a: DataFrame, b: DataFrame,
                           k: Int = 4, minMargin: Long = Long.MinValue,
                           id: Column = col("vec_id"),
                           emb: Column = col("embedding"),
                           onPersist: DataFrame => Unit = _ => ())
      : DataFrame = {
    val aN = a.select(id.as("a_id"), emb.as("__ae"), norm(emb).as("__an"))
    val bN = b.select(id.as("b_id"), emb.as("__be"), norm(emb).as("__bn"))
    val pairs = candidates.select("a_id", "b_id").distinct()
      .join(aN, Seq("a_id")).join(bN, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        ciCol(col("__ae"), col("__be"), col("__an"), col("__bn")).as("ci"))
    marginMineFromScored(pairs, k, minMargin, onPersist)
  }
}

/** Custom typed aggregator (SURVEY §2.11 tier-b extension): bounded
  * top-k by (cosine desc, vec_id asc) with a k-capped buffer, giving
  * map-side-combining top-k selection usable from `groupBy(...).agg`. */
final class TopKAggregator(k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      TopKAggregator.In, Seq[TopKAggregator.In], Seq[TopKAggregator.In]] {
  // driver-side: k = 0 would otherwise hit Vector.empty.last inside an
  // executor task with an opaque stack trace
  require(k >= 1, s"top-k needs k >= 1, got $k")
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
