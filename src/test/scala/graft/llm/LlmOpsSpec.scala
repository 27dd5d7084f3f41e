package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sanity + property checks for the training-data-pipeline operators. */
class LlmOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "completely different content about spark engines and data"),
    (3L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (4L, "short text")
  ).toDF("doc_id", "text")

  test("KMV sketch: exact below k, within 2/sqrt(k) relative error above") {
    import org.apache.spark.sql.functions.{col, lit}
    // 7 distinct values < k=16 -> sketch returns the exact count
    val small = (0 until 200).map(i => ("g", i % 7)).toDF("g", "v")
    val exactRow = Sketches.kmvDistinct(small, Seq(col("g")), col("v"), k = 16)
      .collect().head
    assert(exactRow.getAs[Double]("kmv_est") == 7.0)
    // 5000 distinct values >> k=64 -> estimate within ~2/sqrt(k) (25%)
    val big = (0 until 5000).map(i => ("g", i)).toDF("g", "v")
    val est = Sketches.kmvDistinct(big, Seq(col("g")), col("v"), k = 64)
      .collect().head.getAs[Double]("kmv_est")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est")
    // merge path: the same data pre-split into many partitions agrees
    val est2 = Sketches.kmvDistinct(big.repartition(13), Seq(col("g")), col("v"),
      k = 64).collect().head.getAs[Double]("kmv_est")
    assert(est == est2)   // deterministic regardless of partitioning
  }

  test("approx quantiles: GK rank error within n/accuracy of exact") {
    import org.apache.spark.sql.functions.col
    // group a: 1..2000, group b: 1..500 — values ARE their rank, so a
    // returned value v has rank v and the GK bound is directly checkable
    val rows = (1 to 2000).map(v => ("a", v.toLong)) ++
      (1 to 500).map(v => ("b", v.toLong))
    val df = rows.toDF("g", "v").repartition(7)
    val ps = Seq(0.25, 0.5, 0.9)
    val acc = 100
    val got = Sketches.approxQuantiles(df, Seq(col("g")), col("v"), ps, acc)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    for ((g, n) <- Seq("a" -> 2000, "b" -> 500); p <- ps) {
      val v = got(g).getAs[Long](s"q_${(p * 100).round}")
      val bound = n.toDouble / acc + 1  // GK guarantee (+1 rank slack)
      assert(math.abs(v - p * n) <= bound, s"$g p=$p got $v n=$n")
      assert(got(g).getAs[Long]("cnt") == n)
    }
    // accuracy >= n degrades to exact: the sketch keeps every value
    val exact = Sketches.approxQuantiles(df, Seq(col("g")), col("v"),
        Seq(0.5), accuracy = 10000)
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("q_50")).toMap
    assert(exact("a") == 1000L && exact("b") == 250L)
  }

  test("exact dedup groups identical normalized text, keeps min id") {
    val d = Dedup.exact(docs).collect()
    assert(d.length == 4) // 0 and 3 collapse
    val dup = d.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("minhash estimate tracks true jaccard for near-dups and finds exact dups") {
    val cands = Dedup.minhashCandidates(docs, numHashes = 32, bands = 16,
      k = 2, threshold = 0.3).collect()
    val pairs = cands.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup always found
    val est = cands.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 3L)
      .get.getAs[Double]("est_jaccard")
    assert(est == 1.0)
    // near-dup 0-1: true 2-shingle jaccard is high; banding at r=2 should catch it
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L)))
  }

  test("in-row minhashSigs == relational minhashTable, bit-identically") {
    // the streaming sinks' shuffle-free form must produce the exact
    // signatures already in every store written by the groupBy form
    val viaTable = Dedup.minhashTable(docs, numHashes = 32, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    val viaRow = Dedup.minhashSigs(docs, numHashes = 32, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(viaRow.toSeq == viaTable.toSeq)
    // shingle-less docs emit no row, exactly like the groupBy form
    import spark.implicits._
    val short = Seq((7L, "one two"), (8L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.minhashSigs(short, 32, k = 3).collect().map(_.getLong(0))
      .toSeq == Seq(8L))
  }

  test("portable hash families behave like the xxhash64 ones") {
    val cands = Dedup.minhashCandidates(docs, numHashes = 32, bands = 16,
      k = 2, threshold = 0.3, portable = true).collect()
    val pair03 = cands.find(r =>
      r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 3L)
    assert(pair03.exists(_.getAs[Double]("est_jaccard") == 1.0)) // exact dup
    val fp = Dedup.simhashTable(docs, k = 2, portable = true).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fp(0L) == fp(3L))                       // identical docs agree
    assert(fp.values.forall(v => v >= 0 && v < (1L << 56))) // 56-bit domain
    val sims = Dedup.simhashCandidates(docs, maxHammingDistance = 3,
      portable = true).collect()
    assert(sims.exists(r => r.getAs[Long]("id_a") == 0L &&
      r.getAs[Long]("id_b") == 3L && r.getAs[Int]("hamming") == 0))
  }

  test("degenerate LSH bucket: dropped, counted, and the query completes") {
    // 70k docs with IDENTICAL text -> every band maps ALL docs to one
    // bucket; expanding those pairs means ~2.4B rows (and, in the old
    // one-row flatten formulation, a single >2GB array that crashed the
    // executor). The cap must drop the bucket — recording the drop on the
    // observed metric — and the query must complete quickly with 0 pairs.
    val drops = new java.util.concurrent.atomic.AtomicLong(-1)
    val members = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_lsh_drops_")) {
            drops.compareAndSet(-1, 0)
            drops.addAndGet(row.getAs[Long]("dropped_buckets"))
            members.addAndGet(row.getAs[Long]("dropped_members"))
          }
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // 70k identical docs (the degenerate bucket) + three planted
      // near-dup pairs in healthy buckets, like a real corpus
      val degenerate = spark.range(70000).select(col("id").as("doc_id"),
        lit("the same boilerplate navigation text on every page of the site")
          .as("text"))
      val planted = Seq(
        (70000L, "alpha document about spark engines running at scale"),
        (70001L, "alpha document about spark engines running at scale"),
        (70002L, "beta notes on parquet layouts and partition pruning"),
        (70003L, "beta notes on parquet layouts and partition pruning"),
        (70004L, "gamma text covering watermarks in streaming pipelines"),
        (70005L, "gamma text covering watermarks in streaming pipelines")
      ).toDF("doc_id", "text")
      val pairs = Dedup.minhashCandidates(degenerate.unionByName(planted),
          numHashes = 8, bands = 2, k = 3, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the healthy buckets still pair up; the degenerate bucket is capped
      // out, so no pair touches its members
      assert(pairs == Set((70000L, 70001L), (70002L, 70003L), (70004L, 70005L)))
      // metric delivery is async on the listener bus — poll briefly
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (drops.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(drops.get() == 2, s"expected 2 dropped buckets (one per band), got ${drops.get()}")
      assert(members.get() == 140000L, s"members=${members.get()}")
      // the fully-degenerate corpus (every bucket capped out, empty result)
      // must also complete — AQE may fold the empty plan away along with
      // the metric node, so only completion is asserted here
      assert(Dedup.minhashCandidates(degenerate, numHashes = 8, bands = 2,
        k = 3, threshold = 0.0).count() == 0)
    } finally spark.listenerManager.unregister(listener)
  }

  test("xxhash64 LSH families: deterministic across partitionings; est tracks exact") {
    // production-family pin (xxhash64 is not SQL-expressible, so these
    // variants have no DuckDB oracle row — this spec is their gate):
    // results must not depend on partitioning, every exact duplicate must
    // be found with est 1.0, and the signature estimate must track the
    // exact shingle Jaccard within minhash sampling error.
    val corpus = (0 until 60).map { i =>
      val base = s"document number ${i / 3} talks about topic ${i / 3} in some detail " +
        s"with shared vocabulary across variants and enough words to shingle"
      (i.toLong, if (i % 3 == 2) base + " plus a small edit" else base)
    }.toDF("doc_id", "text")
    def mh(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashCandidates(df, numHashes = 32, bands = 8, k = 3, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val one = mh(corpus.repartition(1))
    val many = mh(corpus.repartition(7))
    assert(one == many, "minhash candidates must not depend on partitioning")
    assert(one.nonEmpty)
    // every identical pair (i, i+1 within a group of 3) found at est 1.0
    (0 until 60 by 3).foreach { g =>
      assert(one.get((g.toLong, g + 1L)).contains(1.0), s"identical pair $g missing")
    }
    // estimate vs exact jaccard, on the candidates the production family found
    val cand = Dedup.minhashCandidates(corpus, numHashes = 32, bands = 8,
      k = 3, threshold = 0.3).select(col("id_a"), col("id_b"), col("est_jaccard"))
    val exact = Dedup.ngramJaccard(corpus, cand, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    one.foreach { case (p, est) =>
      assert(math.abs(est - exact(p)) <= 0.35, s"pair $p est=$est exact=${exact(p)}")
    }
    // simhash: same determinism pin
    def sh(df: org.apache.spark.sql.DataFrame) =
      Dedup.simhashCandidates(df, maxHammingDistance = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val s1 = sh(corpus.repartition(1))
    assert(s1 == sh(corpus.repartition(5)))
    (0 until 60 by 3).foreach { g =>
      assert(s1.get((g.toLong, g + 1L)).contains(0), s"identical pair $g hamming != 0")
    }
  }

  test("incremental candidates: store(old) + new batch loses nothing vs full recompute") {
    val corpus = (0 until 60).map { i =>
      val base = s"incremental doc ${i / 3} about subject ${i / 3} with plenty of " +
        "shared filler words to build overlapping shingles for the family"
      (i.toLong, if (i % 3 == 2) base + " slightly edited" else base)
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairSet(Dedup.minhashCandidates(corpus, numHashes = 32,
      bands = 8, k = 3, threshold = 0.3))
    val oldDocs = corpus.filter(col("doc_id") < 40)
    val newDocs = corpus.filter(col("doc_id") >= 40)
    val oldOnly = pairSet(Dedup.minhashCandidates(oldDocs, numHashes = 32,
      bands = 8, k = 3, threshold = 0.3))
    val incr = pairSet(Dedup.incrementalMinhashCandidates(
      Dedup.minhashTable(oldDocs, numHashes = 32, k = 3),
      newDocs, numHashes = 32, bands = 8, k = 3, threshold = 0.3))
    // incremental emits exactly the full-recompute pairs touching a new doc,
    // with identical estimates (signatures are per-doc deterministic)
    assert(incr == full.filter { case ((a, b), _) => a >= 40 || b >= 40 })
    assert(incr.nonEmpty && oldOnly.nonEmpty)
    // and the store's old-old pairs complete the picture
    assert(oldOnly ++ incr == full)
  }

  test("incremental candidates cap degenerate store buckets exactly like a full recompute") {
    // A boilerplate family far over the cap spans the store (30 docs) and
    // the batch (5 docs): the combined bucket size (35) is what a full
    // recompute would see, so BOTH formulations must drop it — the r4
    // shape capped only the new-new expansion and would have emitted
    // 30x5 store-batch pairs here. A genuine near-dup pair (100 old /
    // 101 new) must still come through.
    val boiler = (0 until 14).map(j => s"boil$j").mkString(" ")
    val pairBase = (0 until 14).map(j => s"pairtok$j").mkString(" ")
    val oldDocs = ((0 until 30).map(i => (i.toLong, boiler)) :+
      ((100L, s"$pairBase common"))).toDF("doc_id", "text")
    val newDocs = ((200 until 205).map(i => (i.toLong, boiler)) :+
      ((101L, s"$pairBase edited"))).toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cap = 10
    val full = pairSet(Dedup.minhashCandidates(oldDocs.unionByName(newDocs),
      numHashes = 32, bands = 8, k = 3, threshold = 0.3, maxBucket = cap))
    val incr = pairSet(Dedup.incrementalMinhashCandidates(
      Dedup.minhashTable(oldDocs, numHashes = 32, k = 3), newDocs,
      numHashes = 32, bands = 8, k = 3, threshold = 0.3, maxBucket = cap))
    def touchesNew(a: Long, b: Long) =
      a >= 200 || b >= 200 || a == 101 || b == 101
    assert(incr == full.filter { case ((a, b), _) => touchesNew(a, b) })
    assert(incr.contains((100L, 101L)))            // genuine pair survives
    // no store-batch boilerplate pair leaked past the combined cap
    assert(!incr.keySet.exists { case (a, b) => a < 100 && b >= 200 })
  }

  test("duplicate clusters: components labeled by their minimum doc id") {
    // two components: {1,2,3,9} (chain through 9) and {5,6}; 7-8 pair
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L), (8L, 7L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L)
    def run(threshold: Long) = Dedup.duplicateClusters(edges,
        localThreshold = threshold).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp_id")).toMap
    assert(run(1000000L) == expected)   // driver union-find path
    assert(run(0L) == expected)         // distributed label-propagation path
  }

  test("exact ngram jaccard: identical docs 1.0, disjoint docs 0.0") {
    val pairs = Seq((0L, 3L), (0L, 2L)).toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(docs, pairs, k = 2).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 2L)) == 0.0)
  }

  test("simhash: identical docs have identical fingerprints and hamming 0") {
    val fp = Dedup.simhashTable(docs, k = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toMap
    assert(fp(0L) == fp(3L))
    val cands = Dedup.simhashCandidates(docs, maxHammingDistance = 3).collect()
    val zeroPair = cands.find(r => r.getAs[Long]("id_a") == 0L && r.getAs[Long]("id_b") == 3L)
    assert(zeroPair.exists(_.getAs[Int]("hamming") == 0))
  }

  test("brute-force ANN: self-similar vector ranks first with cosine 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),    // identical direction to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.bruteForceTopK(vecs, queries, k = 3).collect()
    assert(top.head.getAs[Long]("vec_id") == 1L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-12)
    // orthogonal vector ranks last
    assert(top.last.getAs[Long]("vec_id") == 2L)
  }

  test("LSH ANN buckets identical vectors together") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i % 4) 1.0f else 0.01f * i)))
      .toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val res = Similarity.lshTopK(vecs, queries, k = 5, dim = 8, nPlanes = 4)
    // recall is approximate; the invariant is: every returned neighbor
    // shares the query's bucket and scores are valid cosines
    assert(res.filter($"cosine" > 1.0001 || $"cosine" < -1.0001).isEmpty)
  }

  test("embedding near-dup finds identical-direction vectors above threshold") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 0.0f, 0.0f, 0.0f)),    // same direction as 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupLsh(vecs, dim = 4, threshold = 0.95,
        nPlanes = 2).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("margin mining: independent brute-force law replay; mutual-best, " +
    "threshold, short-side exclusion, zero-norm guard, candidates==exact") {
    val K = 2
    val av = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f), 2L -> Array(0.9f, 0.1f, 0.0f),
      4L -> Array(0.0f, 1.0f, 0.0f), 6L -> Array(0.5f, 0.5f, 0.2f),
      8L -> Array(0.0f, 0.0f, 1.0f))
    val bv = Seq(
      1L -> Array(0.95f, 0.05f, 0.0f), 3L -> Array(0.0f, 0.9f, 0.1f),
      5L -> Array(0.6f, 0.4f, 0.1f), 7L -> Array(0.0f, 0.0f, 0.9f),
      9L -> Array(0.1f, 0.9f, 0.0f),
      11L -> Array(0.0f, 0.0f, 0.0f)) // zero norm: guarded, never mined
    val a = av.toDF("vec_id", "embedding")
    val b = bv.toDF("vec_id", "embedding")

    // independent replay — same IEEE accumulation order as VecOps
    def ci(x: Array[Float], y: Array[Float]): Long = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      val c = if (nx == 0.0 || ny == 0.0) -2.0
        else d / (math.sqrt(nx) * math.sqrt(ny))
      math.floor(c * 1e9 + 0.5).toLong
    }
    val pairs = for { (ai, ax) <- av; (bi, bx) <- bv }
      yield (ai, bi, ci(ax, bx))
    def topSum(xs: Seq[(Long, Long)]): Long = // (otherId, ci) -> k-best sum
      xs.sortBy { case (o, c) => (-c, o) }.take(K).map(_._2).sum
    val sa = pairs.groupBy(_._1).view
      .mapValues(ps => topSum(ps.map(p => (p._2, p._3)))).toMap
    val sb = pairs.groupBy(_._2).view
      .mapValues(ps => topSum(ps.map(p => (p._1, p._3)))).toMap
    val margins = pairs.map { case (ai, bi, c) =>
      (ai, bi, c, 2L * K * c - sa(ai) - sb(bi)) }
    def argmax(ps: Seq[(Long, Long)]): Long = // (otherId, margin) -> best
      ps.minBy { case (o, m) => (-m, o) }._1
    val bestA = margins.groupBy(_._1).view
      .mapValues(ps => argmax(ps.map(p => (p._2, p._4)))).toMap
    val bestB = margins.groupBy(_._2).view
      .mapValues(ps => argmax(ps.map(p => (p._1, p._4)))).toMap
    val mutual = margins.filter { case (ai, bi, _, _) =>
      bestA(ai) == bi && bestB(bi) == ai }
    // the fixture engineers a non-mutual best: a=0 and a=2 both point at
    // b=1, so at most one of them can be mutual — the ∩ genuinely prunes
    assert(mutual.size < av.size, mutual)
    assert(!mutual.exists(_._2 == 11L)) // zero-norm never mined

    val got = Similarity.marginMine(a, b, k = K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == mutual.toSet, s"got $got\nexp $mutual")

    // threshold branch: pick the median mutual margin — strictly prunes
    val thr = mutual.map(_._4).sorted.apply(mutual.size / 2)
    val thresholded = Similarity.marginMine(a, b, k = K, minMargin = thr)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expThr = mutual.filter(_._4 >= thr).map(p => (p._1, p._2)).toSet
    assert(thresholded == expThr && thresholded.size < mutual.size)

    // a side with fewer than k scored neighbors has no denominator:
    // k > |B| excludes every a -> empty
    assert(Similarity.marginMine(a, b, k = bv.size + 1).isEmpty)

    // candidate form with candidates == all pairs IS the exact form
    val allCand = for { (ai, _) <- av; (bi, _) <- bv } yield (ai, bi)
    val viaCand = Similarity.marginMineCandidates(
        allCand.toDF("a_id", "b_id"), a, b, k = K).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaCand == mutual.toSet)
  }

  test("embedding outliers: exact cleared-denominator sigma law, planted " +
    "garbage flags, tight clusters and singletons don't, zero-norm flags") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    def run(corpus: Seq[(Long, Array[Float])]) = {
      val got = Similarity.embeddingOutliers(
          corpus.toDF("vec_id", "embedding"), cents, sigmas = 2)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2),
          r.getBoolean(3)))).toMap
      // independent BigInt replay of the law over the engine's own ci
      val byCluster = got.toSeq.groupBy(_._2._1)
      got.foreach { case (id, (cl, ci, flagged)) =>
        val cis = byCluster(cl).map(_._2._2)
        val (n, s) = (BigInt(cis.size), cis.map(BigInt(_)).sum)
        val q = cis.map(c => BigInt(c) * c).sum
        val exp = n * ci < s &&
          (s - n * ci) * (s - n * ci) > 4 * (n * q - s * s)
        assert(flagged == exp, s"vec $id")
      }
      got
    }
    val a = run(Seq(
      1L -> Array(1.0f, 0.01f), 2L -> Array(1.0f, 0.02f),
      3L -> Array(1.0f, 0.015f), 4L -> Array(1.0f, 0.005f),
      5L -> Array(1.0f, 0.025f),
      6L -> Array(0.5f, 0.45f),          // garbage in cluster 0
      9L -> Array(0.0f, 1.0f)))          // cluster 1 singleton: no flag
    assert(a(6L)._3, "planted garbage must flag")
    Seq(1L, 2L, 3L, 4L, 5L).foreach(i => assert(!a(i)._3, s"tight $i"))
    assert(!a(9L)._3, "singleton cluster has zero variance: never flags")
    // zero-norm vector: CentroidArgMax's no-direction law lands it in
    // cluster 0 with cosine 0 — far enough below a tight cluster's
    // mean (8 members) that even its own drag on the variance can't
    // hide it
    val b = run((1L to 8L).map(i =>
      i -> Array(1.0f, 0.001f * i)) :+ (99L -> Array(0.0f, 0.0f)))
    assert(b(99L) == ((0, 0L, true)), b(99L))
  }

  test("vocab growth: md5 value-cut slices, per-term min slice, " +
    "cumulative law; zero-new-term slices and empty docs counted") {
    import graft.llm.TextAnalysis
    def hb(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def slice(id: Long, s: Int): Int = (hb(id) * s / 268435456L).toInt + 1
    // two slices; craft ids so both slices are populated, one doc is
    // empty, and the later slice repeats earlier vocabulary
    val ids = (1L to 40L)
    val s1 = ids.filter(slice(_, 2) == 1).take(3)
    val s2 = ids.filter(slice(_, 2) == 2).take(3)
    assume(s1.size == 3 && s2.size == 3)
    val docs = Seq(
      s1(0) -> "a b c", s1(1) -> "a d", s1(2) -> "",  // slice-1 vocab abcd
      s2(0) -> "a b", s2(1) -> "c d", s2(2) -> "d a") // nothing new
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, slices = 2)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(slice(s1(0), 2)) == ((3L, 5L, 4L, 4L)), got)
    assert(got(slice(s2(0), 2)) == ((3L, 6L, 0L, 4L)), got)
  }

  test("winnowing: independent law replay (windows, rightmost-min ties, " +
    "short-doc single window, sub-k docs empty); the shared-substring " +
    "guarantee holds") {
    import graft.llm.TextAnalysis
    val (k, w) = (3, 4)
    val docs = Seq(
      1L -> "a b a b a b a b",          // repeated grams -> real hash ties
      2L -> "x y z q",                  // g=2 < w: one short window
      3L -> "p q",                      // n < k: no grams, no rows
      4L -> "m n o p q r s t u v",
      5L -> "c c m n o p q r w w")      // shares 6 tokens (w+k-1) with 4
    val got = TextAnalysis.winnowFingerprints(
        docs.toDF("doc_id", "text"), k, w)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSet).toMap

    // independent replay of the published law
    def hb(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def law(text: String): Set[(Int, Long)] = {
      val ts = text.split(" ").toSeq
      if (ts.size < k) return Set.empty
      val grams = ts.sliding(k).map(_.mkString(" ")).map(hb).toVector
      val wp = math.min(w, grams.size)
      (0 to grams.size - wp).flatMap { s =>
        val win = (s until s + wp).map(p => (grams(p), p))
        Seq(win.minBy { case (h, p) => (h, -p) }.swap)
      }.map { case (p, h) => (p, h) }.toSet
    }
    docs.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == law(t), s"doc $id")
    }
    assert(!got.contains(3L))
    // doc 1's repeated "a b a"/"b a b" grams collide — the replay only
    // matches the engine if both picked the RIGHTMOST minimal position
    assert(law(docs.head._2).nonEmpty)

    // the winnowing guarantee: any shared run of >= w+k-1 tokens yields
    // at least one identical selected fingerprint in both documents
    val shared = got(4L).map(_._2) intersect got(5L).map(_._2)
    assert(shared.nonEmpty, s"${got(4L)} / ${got(5L)}")
  }

  test("cluster-balanced sample: md5 rank law per cluster, cap binds " +
    "only where clusters overflow, drops stay visible with null rank") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val corpus = Seq( // 4 vectors near centroid 0, 2 near centroid 1
      10L -> Array(1.0f, 0.1f), 11L -> Array(1.0f, 0.2f),
      12L -> Array(0.9f, 0.1f), 13L -> Array(0.8f, 0.3f),
      20L -> Array(0.1f, 1.0f), 21L -> Array(0.0f, 0.9f))
      .toDF("vec_id", "embedding")
    val got = Similarity.clusterBalancedSample(corpus, cents, cap = 2)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getBoolean(3)))).toMap
    assert(got.keySet == Set(10L, 11L, 12L, 13L, 20L, 21L))
    // cluster 1 is under the cap: both kept, ranks by the md5 law
    def hb(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16)
    }
    def ranks(ids: Seq[Long]): Map[Long, Int] =
      ids.sortBy(i => (hb(i), i)).zipWithIndex
        .map { case (i, r) => i -> (r + 1) }.toMap
    val c1 = ranks(Seq(20L, 21L))
    assert(got(20L) == ((1, c1(20L), true)) &&
      got(21L) == ((1, c1(21L), true)), got)
    // cluster 0 overflows: exactly the 2 smallest (hash, id) keep; the
    // capped-out rows stay visible with null rank and keep=false
    val c0 = ranks(Seq(10L, 11L, 12L, 13L))
    Seq(10L, 11L, 12L, 13L).foreach { i =>
      val exp = if (c0(i) <= 2) ((0, c0(i), true)) else ((0, -1, false))
      assert(got(i) == exp, s"$i: ${got(i)} vs $exp")
    }
  }

  test("hard negatives: band replay — near-dup ceiling, triviality " +
    "floor, positive exclusion reshifts ranks, self never scored") {
    val corpus = Seq(
      0L -> Array(1.0f, 0.0f, 0.0f),   // anchor itself: never scored
      1L -> Array(0.99f, 0.14f, 0.0f), // cos ~0.990 -> above ceiling
      2L -> Array(0.8f, 0.6f, 0.0f),   // cos 0.8    -> in band, best
      3L -> Array(0.7f, 0.71f, 0.1f),  // in band
      4L -> Array(0.6f, 0.8f, 0.0f),   // in band (0.6)
      5L -> Array(0.0f, 1.0f, 0.0f),   // cos 0      -> below floor
      6L -> Array(-1.0f, 0.0f, 0.0f))  // cos -1     -> below floor
      .toDF("vec_id", "embedding")
    val anchors = Seq(0L -> Array(1.0f, 0.0f, 0.0f))
      .toDF("vec_id", "embedding")
      .select($"vec_id".as("query_id"), $"embedding")
    val (lo, hi) = (500000000L, 900000000L)

    def ci(x: Array[Float], y: Array[Float]): Long = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble; i += 1
      }
      math.floor(d / (math.sqrt(nx) * math.sqrt(ny)) * 1e9 + 0.5).toLong
    }
    val a = Array(1.0f, 0.0f, 0.0f)
    val cis = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i =>
      i -> ci(a, Seq(Array(0.99f, 0.14f, 0.0f), Array(0.8f, 0.6f, 0.0f),
        Array(0.7f, 0.71f, 0.1f), Array(0.6f, 0.8f, 0.0f),
        Array(0.0f, 1.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f))(i.toInt - 1)))
    val band = cis.filter { case (_, c) => c >= lo && c < hi }
      .sortBy { case (id, c) => (-c, id) }
    assert(band.map(_._1) == Seq(2L, 3L, 4L)) // 1 above hi, 5/6 below lo

    val got = Similarity.hardNegatives(corpus, anchors, k = 5, lo, hi)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == band.zipWithIndex.map { case ((id, c), i) =>
      (i + 1, id, c) }, got.toSeq)

    // excluding the band argmax as the known positive reshifts ranks:
    // the operator composed with itself at k = 1
    val pos = Similarity.hardNegatives(corpus, anchors, k = 1, lo, hi)
      .select("query_id", "vec_id")
    assert(pos.collect().map(_.getLong(1)).toSeq == Seq(2L))
    val negs = Similarity.hardNegatives(corpus, anchors, k = 5, lo, hi,
        Some(pos)).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toSeq
    assert(negs == Seq((1, 3L), (2, 4L)), negs)
  }

  test("salted aggregation equals the plain groupBy exactly") {
    val df = (1 to 1000).map(i => (i % 7L, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,6)")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = SkewTools.saltedAgg(df, Seq(col("k")), col("v"), 8,
        partial = Seq(count(lit(1)).as("c"), sum(col("v").cast("decimal(18,6)")).as("s")),
        fin = Seq(sum(col("c")).as("n"), sum(col("s")).as("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals the plain join") {
    val big = (1 to 500).map(i => (i % 5L, i)).toDF("k", "payload")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "attr")
    val plain = big.join(small, "k").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val salted = SkewTools.saltedJoin(big, small, "k", 8, col("payload"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("IVF ANN returns valid cosines and finds the identical vector") {
    val vecs = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i % 8) 1.0f else 0.05f * (i % 3)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" === 8L) // same direction as vec 0 family
      .select($"vec_id".as("query_id"), $"embedding")
    val res = Similarity.ivfTopK(vecs, queries, k = 5, nLists = 8, nProbe = 3)
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0001))
    assert(res.map(_.getAs[Int]("rank")).toSeq == (1 to res.length))
  }

  test("PII redaction: each category replaced by its placeholder, counts audit the hits") {
    val rows = Seq(
      "mail john.doe+x@corp.example.org now",
      "call 555-123-4567 or 555-123-4568",
      "server 192.168.1.10 and 10.0.0.1",
      "acct 123456789012 ref 987654321",
      "version 1.2.3 has no pii at all",
      "").toDF("text")
      .select(col("text"), TextAnalysis.redactPii(col("text")).as("red"),
        struct(TextAnalysis.piiCounts(col("text"))
          .map { case (n, c) => c.as(n) }: _*).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    def red(k: String) = rows(k).getString(1)
    def cnt(k: String, f: String) = rows(k).getStruct(2).getAs[Int](f)
    assert(red("mail john.doe+x@corp.example.org now") == "mail <EMAIL> now")
    assert(red("call 555-123-4567 or 555-123-4568") == "call <PHONE> or <PHONE>")
    assert(cnt("call 555-123-4567 or 555-123-4568", "n_phone") == 2)
    assert(red("server 192.168.1.10 and 10.0.0.1") == "server <IP> and <IP>")
    assert(red("acct 123456789012 ref 987654321") == "acct <ID> ref <ID>")
    // 3-segment version strings are not IPv4 and stay untouched
    assert(red("version 1.2.3 has no pii at all") == "version 1.2.3 has no pii at all")
    assert(red("") == "")
    assert(cnt("mail john.doe+x@corp.example.org now", "n_email") == 1)
    assert(cnt("version 1.2.3 has no pii at all", "n_id") == 0)
  }

  test("curation flags: empty, repetitive, and healthy docs flag as expected") {
    val d = Seq(
      (1L, ""),                                                     // empty
      (2L, Seq.fill(40)("spam spam").mkString(" ")),                // one dup bigram over and over
      (3L, "the data pipeline reads a parquet table and writes clean rows " +
        "for every study in this big warehouse with care while another " +
        "job merges daily aggregates")
    ).toDF("doc_id", "text")
    val f = TextAnalysis.curationFlags(d, minWords = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getAs[Int]("n_words") == 0)
    assert(f(1L).getAs[Double]("mean_word_len") == 0.0)
    assert(f(1L).getAs[Int]("keep") == 0)
    // "spam spam spam ..." has 1 distinct bigram out of 79 -> heavy repetition
    assert(f(2L).getAs[Double]("frac_dup_bigrams") > 0.9)
    assert(f(2L).getAs[Double]("frac_unique_words") < 0.05)
    assert(f(2L).getAs[Int]("keep") == 0)                           // no stopwords, repetitive
    assert(f(3L).getAs[Int]("keep") == 1)
    assert(f(3L).getAs[Double]("frac_alpha_words") == 1.0)
    assert(f(3L).getAs[Int]("stop_hits") >= 2)
  }

  test("group sample: deterministic k smallest by hash order, short groups whole") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val rows = (0L until 40L).map(i => (i, if (i % 2 == 0) "a" else "b")) ++
      Seq((100L, "tiny"), (101L, "tiny"),
        (999L, null.asInstanceOf[String]))
    val d = rows.toDF("doc_id", "lang")
    def got(df: org.apache.spark.sql.DataFrame) =
      Sampling.groupSample(df, col("lang"), col("doc_id"), k = 3)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2))).toSet
    val g = got(d)
    // driver replay of the documented order: k smallest (bucket, id)
    val expected = rows.filter(_._2 != null).groupBy(_._2).flatMap {
      case (lang, rs) =>
        rs.map(_._1).sortBy(i => (bucket(i), i)).take(3).zipWithIndex
          .map { case (id, j) => (lang, id, j + 1) }
    }.toSet
    assert(g == expected)
    assert(g.count(_._1 == "a") == 3 && g.count(_._1 == "b") == 3)
    assert(g.count(_._1 == "tiny") == 2)          // short group: all rows
    assert(!g.exists(_._2 == 999L))               // null group excluded
    assert(got(d.repartition(7)) == g)            // partitioning-invariant
  }

  test("cross-corpus candidates: exactly the full recompute's cross pairs") {
    val corpus = (0 until 60).map { i =>
      val base = s"crosscorpus doc ${i / 3} about subject ${i / 3} with plenty " +
        "of shared filler words to build overlapping shingles for the family"
      (i.toLong, if (i % 3 == 2) base + " slightly edited" else base)
    }.toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairSet(Dedup.minhashCandidates(corpus, numHashes = 32,
      bands = 8, k = 3, threshold = 0.3))
    val cross = pairSet(Dedup.crossMinhashCandidates(
      Dedup.minhashTable(corpus.filter(col("doc_id") < 40), numHashes = 32, k = 3),
      Dedup.minhashTable(corpus.filter(col("doc_id") >= 40), numHashes = 32, k = 3),
      numHashes = 32, bands = 8, threshold = 0.3))
    // the slices partition the corpus, so joint bucketing == full
    // bucketing and the cross set is exactly full restricted to
    // one-side-each, with identical estimates; id_a is always the A side
    assert(cross == full.filter { case ((a, b), _) => a < 40 && b >= 40 })
    assert(cross.nonEmpty)
    assert(cross.keySet.forall { case (a, b) => a < 40 && b >= 40 })
  }

  test("stratified sampling is exact, reproducible, and nested in the rate") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    def langOf(i: Int) = if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr"
    val docs = (0 until 400).map(i => (i.toLong, langOf(i))).toDF("doc_id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    val got = ids(Sampling.stratified(docs, col("lang"), col("doc_id"),
      rates, defaultRate = 0.1))
    // exact: the engine's md5-bucket filter equals a driver-side rederivation
    val expected = (0 until 400).filter { i =>
      val rate = rates.getOrElse(langOf(i), 0.1)
      bucket(i.toLong) < rate * 268435456.0
    }.map(_.toLong).toSet
    assert(got == expected && got.nonEmpty && got.size < 400)
    // reproducible under any partitioning
    assert(got == ids(Sampling.stratified(docs.repartition(7), col("lang"),
      col("doc_id"), rates, defaultRate = 0.1)))
    // nested: raising every rate only ever ADDS rows
    val bigger = ids(Sampling.stratified(docs, col("lang"), col("doc_id"),
      Map("en" -> 0.8, "de" -> 0.5), defaultRate = 0.3))
    assert(got.subsetOf(bigger))
  }

  test("token-budget mix: exact greedy prefix per stratum, deterministic, nested") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    def langOf(i: Int) = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"
    def tokOf(i: Int) = 5 + i % 7
    val docs = (0 until 300).map(i => (i.toLong, langOf(i), tokOf(i)))
      .toDF("doc_id", "lang", "n_tok")
    val budgets = Map("en" -> 120L, "de" -> 60L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = ids(Sampling.tokenBudgetMix(docs, col("lang"), col("doc_id"),
      col("n_tok"), budgets, defaultBudget = 40L))
    // exact: the engine's windowed prefix equals a driver-side rederivation
    val expected = (0 until 300).groupBy(langOf).flatMap { case (lang, is) =>
      val budget = budgets.getOrElse(lang, 40L)
      var cum = 0L
      is.sortBy(i => (bucket(i.toLong), i.toLong))
        .takeWhile { i => cum += tokOf(i); cum <= budget }
    }.map(_.toLong).toSet
    assert(got == expected && got.nonEmpty && got.size < 300)
    assert(got == ids(Sampling.tokenBudgetMix(docs.repartition(7), col("lang"),
      col("doc_id"), col("n_tok"), budgets, defaultBudget = 40L)))
    // the bucket count is an implementation knob, never a semantics knob:
    // tiny buckets force many full/boundary/dropped bucket transitions
    assert(got == ids(Sampling.tokenBudgetMix(docs, col("lang"), col("doc_id"),
      col("n_tok"), budgets, defaultBudget = 40L, nBuckets = 3)))
    assert(got == ids(Sampling.tokenBudgetMix(docs.repartition(5), col("lang"),
      col("doc_id"), col("n_tok"), budgets, defaultBudget = 40L, nBuckets = 1024)))
    // nesting: doubled budgets strictly extend the selection
    val bigger = ids(Sampling.tokenBudgetMix(docs, col("lang"), col("doc_id"),
      col("n_tok"), budgets.map { case (k, v) => k -> v * 2 },
      defaultBudget = 80L))
    assert(got.subsetOf(bigger) && bigger.size > got.size)
  }

  test("weighted-priority sampling: exact, deterministic, nested, weight-filtered") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val rows = (0L until 400L).map(i => (i, 1 + (i % 13).toInt))
    val docs = rows.toDF("doc_id", "w")
    def sel(k: Int, d: org.apache.spark.sql.DataFrame = docs) =
      Sampling.weightedPriority(d, col("doc_id"), col("w"), k)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = sel(100)
    // the engine's priority ranking equals an exact driver rederivation —
    // same integer-to-double cast, same IEEE division
    val expected = rows.sortBy { case (i, w) => (bucket(i).toDouble / w, i) }
      .take(100).map(_._1).toSet
    assert(got == expected)
    assert(got == sel(100, docs.repartition(7)))   // partitioning-invariant
    assert(got.subsetOf(sel(200)))                 // nested in k
    // non-positive weights are excluded, never divided by
    val withZero = docs.withColumn("w",
      when(col("doc_id") === 0, 0).otherwise(col("w")))
    assert(!sel(400, withZero).contains(0L))
  }

  test("token-budget mix: exact-boundary buckets, zero-token docs, null ids") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val nB = 4
    def bkt(id: Long): Int = (bucket(id) / (268435456.0 / nB)).toInt
    val allIds = 0L until 120L
    // bucket 1's first two docs in (hash, id) order carry ZERO tokens —
    // with the budget landing EXACTLY on bucket 0's boundary, the old
    // single-window form keeps them (cum == budget <= budget) and the
    // two-phase form must too; a `__off < budget` boundary test drops
    // the whole bucket
    val b1 = allIds.filter(bkt(_) == 1).sortBy(i => (bucket(i), i))
    assert(b1.length >= 3, "need a populated bucket 1 for this pin")
    def tokOf(i: Long): Int = if (b1.take(2).contains(i)) 0 else 3
    // a null-id row (the old window ranked nulls first) consumes budget
    // ahead of every bucket
    val rows = allIds.map(i => (java.lang.Long.valueOf(i), "en", tokOf(i))) :+
      ((null.asInstanceOf[java.lang.Long], "en", 4))
    val docs = rows.toDF("doc_id", "lang", "n_tok")
    val budget = 4L + allIds.filter(bkt(_) == 0).map(tokOf).sum
    val got = Sampling.tokenBudgetMix(docs, col("lang"), col("doc_id"),
        col("n_tok"), Map("en" -> budget), defaultBudget = 0L, nBuckets = nB)
      .select("doc_id").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    // literal greedy prefix in (hash nulls-first, id) order
    var cum = 0L
    val expected = (None +: allIds.sortBy(i => (bucket(i), i)).map(Some(_)))
      .takeWhile { o => cum += o.fold(4)(tokOf(_)); cum <= budget }.toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(b1.take(2).map(i => Some(i): Option[Long]).forall(got),
      "boundary bucket's leading zero-token docs must stay selected")
    assert(got(None), "null-id row must stay selected")
  }

  test("incremental candidates: a doc in both store and batch fills ONE bucket slot") {
    // replay heal: the batch is a subset of the store (its signatures
    // landed, its corpus rows did not). Six identical docs share every
    // band bucket; with maxBucket == 6 the bucket fits EXACTLY — but if
    // healed docs occupied a store slot AND a batch slot the bucket
    // would count 9 members and be dropped, silently losing the heal's
    // candidates (the cap-inexactness failure mode).
    val docs = (0L until 6L).map(i => (i, "same text in every document here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashTable(docs, numHashes = 16, k = 2)
    val batch = sigs.filter(col("doc_id") >= 3)
    val healed = Dedup.incrementalMinhashCandidatesFromSigs(sigs, batch,
        numHashes = 16, bands = 4, threshold = 0.5, maxBucket = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0L until 6L; b <- (a + 1) until 6L
      if a >= 3 || b >= 3                   // pairs touching a batch doc
    } yield (a, b)).toSet
    assert(healed == expected, s"healed=$healed")
  }

  test("text profile: counts and ratios behave on edge inputs") {
    val edge = Seq((0L, ""), (1L, "word"), (2L, "a b c"), (3L, "Hello, world!"))
      .toDF("doc_id", "text")
    val p = TextAnalysis.profile(edge).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(p(0L).getAs[Int]("n_tokens") == 0)
    assert(p(1L).getAs[Int]("n_tokens") == 1)
    assert(p(2L).getAs[Int]("n_tokens") == 3)
    assert(p(3L).getAs[Double]("punct_ratio") > 0.0)
    assert(p(0L).getAs[Double]("quality") >= 0.0)
  }

  test("language id picks the language with most marker hits, 'und' on none") {
    val d = Seq(
      (0L, "the cat is on the mat and that is that"),
      (1L, "der hund ist mit der katze und das ist gut"),
      (2L, "le chat est avec la souris et le chien"),
      (3L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val got = d.select($"doc_id", TextAnalysis.languageId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) == "en"); assert(got(1L) == "de")
    assert(got(2L) == "fr"); assert(got(3L) == "und")
  }

  test("multimodal: metadata never touches blob bytes; stub features deterministic") {
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "text")
    val meta = Multimodal.metadata(media).collect()
    assert(meta.forall(_.getAs[Int]("n_bytes") > 0))
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    assert(f1.map(_.feature.toSeq) sameElements f2.map(_.feature.toSeq))
    assert(f1.head.feature.length == 8)
    // identical payloads -> identical checksums/features (docs 0 and 3)
    val byId = f1.map(f => f.media_id -> f).toMap
    assert(byId(0L).checksum == byId(3L).checksum)
  }

  test("multimodal resize: payload re-dimensioned per partition, metadata updated") {
    val media = Multimodal.asMedia(docs, col("doc_id"), col("text"), "text")
    val resized = Multimodal.resize(spark, media, targetW = 4, targetH = 3)
      .collect().sortBy(_.media_id)
    assert(resized.forall(r => r.width == 4 && r.height == 3))
    assert(resized.forall(_.bytes.length <= 12))   // targetW * targetH cap
    // deterministic: identical inputs (docs 0 and 3) -> identical payloads
    assert(resized(0).bytes.toSeq == resized(3).bytes.toSeq)
    assert(resized.map(_.media_id).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("multimodal image kind decodes REAL pixels (javax.imageio) with stub fallback") {
    import java.awt.image.BufferedImage
    // 2x2 PNG: red, green / blue, white — known channel means and lumas
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val junk = "definitely not an image payload".getBytes("UTF-8")
    val media = Seq((1L, "image", png, 0, 0),
        (2L, "image", junk, 0, 0),       // no reader claims it -> stub
        (3L, "audio", junk, 0, 0))       // non-image kind -> stub
      .toDF("media_id", "kind", "bytes", "width", "height")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.feature).toMap
    val f1 = feats(1L)
    assert(f1(0) == 2.0f && f1(1) == 2.0f)               // width, height
    // each channel averages (255+0+0+255)/4/255 = 0.5 exactly
    assert(f1(2) == 0.5f && f1(3) == 0.5f && f1(4) == 0.5f)
    // 601 lumas: red 76, green 149, blue 29, white 255 -> 3-bucket
    // histogram [2,1,1]/4
    assert(f1(5) == 0.5f && f1(6) == 0.25f && f1(7) == 0.25f)
    // both fallback routes produce the SAME deterministic stub features
    assert(feats(2L).toSeq == feats(3L).toSeq)

    // real resize: 2x2 -> 1x1, payload re-encoded as a decodable 1x1 PNG
    val r = Multimodal.resize(spark,
        media.filter(col("media_id") === 1L), 1, 1).collect().head
    assert(r.width == 1 && r.height == 1)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.bytes))
    assert(back.getWidth == 1 && back.getHeight == 1)
  }

  test("audio fingerprint: envelope-delta law, gain invariance, near-dup pairing") {
    import javax.sound.sampled._
    def wav(samples: Array[Short]): Array[Byte] = {
      val format = new AudioFormat(8000f, 16, 1, true, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), format, samples.length),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // strictly rising amplitude ramp: every window's energy exceeds its
    // predecessor's -> all 64 delta bits set
    val rising = Array.tabulate(6500)(i => (i * 4 + 100).toShort)
    // the same signal at exactly half gain: energies scale by 1/4, no
    // comparison flips
    val half = rising.map(s => (s / 2).toShort)
    // rising with one window's worth of samples zeroed near the middle:
    // a small, localized print difference
    val dented = rising.clone()
    (3200 until 3300).foreach(i => dented(i) = 0)
    // falling ramp: every delta bit clear
    val falling = rising.reverse
    val media = Seq(
      (1L, "audio", wav(rising)), (2L, "audio", wav(half)),
      (3L, "audio", wav(dented)), (4L, "audio", wav(falling)),
      (5L, "audio", wav(Array.tabulate(30)(_.toShort))), // < 65 samples
      (6L, "audio", "not audio".getBytes("UTF-8")))      // undecodable
      .toDF("media_id", "kind", "bytes")
    val fp = Multimodal.audioFingerprint(spark, media).collect()
      .map(r => r.media_id -> r.afp).toMap
    assert(fp(1L).contains(-1L))              // 64 ones
    assert(fp(4L).contains(0L))               // 64 zeros
    assert(fp(2L) == fp(1L), "gain scaling must not move the print")
    val d = java.lang.Long.bitCount(fp(1L).get ^ fp(3L).get)
    assert(d >= 1 && d <= 3, s"dent should flip a few local bits, got $d")
    assert(fp(5L).isEmpty && fp(6L).isEmpty)
    // the generic Hamming pairer finds the planted near-dups and only them
    import spark.implicits._
    val hashes = fp.toSeq.collect { case (id, Some(h)) => (id, h) }
      .toDF("media_id", "dhash")
    val pairs = Multimodal.imageNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected the rising-family near-dups, got $pairs")
  }

  test("multimodal audio kind decodes REAL samples (javax.sound) with stub fallback") {
    import javax.sound.sampled._
    // 16-bit PCM WAV fixtures with exactly-known features
    def wav(format: AudioFormat, samples: Array[Short]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>               // little-endian, as WAV is
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val frames = samples.length / format.getChannels
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), format, frames),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mono = new AudioFormat(8000f, 16, 1, true, false)
    val stereo = new AudioFormat(8000f, 16, 2, true, false)
    // mono square wave flipping every sample at half amplitude:
    // duration 0.5 s, rms = peak = 0.5, zero-crossing rate (n-1)/n
    val square = wav(mono, Array.tabulate(4000)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort))
    // stereo with L = -R: the mono mixdown must cancel to silence
    val cancel = wav(stereo, Array.tabulate(2000)(i =>
      (if (i % 2 == 0) 16384 else -16384).toShort))
    val junk = "definitely not audio".getBytes("UTF-8")
    val media = Seq((1L, "audio", square), (2L, "audio", cancel),
        (3L, "audio", junk), (4L, "video", junk))
      .toDF("media_id", "kind", "bytes")
      .select(col("media_id"), col("kind"), col("bytes"),
        lit(0).as("width"), lit(0).as("height"))
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.feature).toMap

    val sq = feats(1L)
    assert(sq(0) == 0.5f && sq(1) == 8000.0f)     // duration, sample rate
    assert(sq(2) == 0.5f && sq(4) == 0.5f)        // rms, peak
    assert(sq(3) == 3999.0f / 4000.0f)            // zero-crossing rate
    assert(sq(5) == 0.5f && sq(6) == 0.5f && sq(7) == 0.5f) // envelope
    val st = feats(2L)
    assert(st(0) == 0.125f && st(2) == 0.0f && st(4) == 0.0f)
    // undecodable audio and video both take the SAME deterministic stub
    assert(feats(3L).toSeq == feats(4L).toSeq)
  }

  test("multimodal video kind decodes REAL frames (AVI/MJPG, MP4/jpeg, MJPEG stream)") {
    import java.awt.image.BufferedImage
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // ------- byte-builder helpers (spec-correct containers, not echoes
    // of the parser: field layouts follow the AVI RIFF registry and
    // ISO/IEC 14496-12 box definitions)
    def le32(v: Long): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be32(v: Long): Array[Byte] = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def aviChunk(id: String, data: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def aviList(listType: String, inner: Array[Byte]): Array[Byte] =
      aviChunk("LIST", cc(listType) ++ inner)
    def aviMjpg(frames: Seq[Array[Byte]], usPerFrame: Int): Array[Byte] = {
      val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.size) ++ Array.fill(36)(0.toByte) // dwTotalFrames @16
      val hdrl = aviList("hdrl", aviChunk("avih", avih))
      val movi = aviList("movi",
        frames.map(f => aviChunk("00dc", f)).reduce(_ ++ _))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ cc(typ) ++ payload
    def mp4Jpeg(frames: Seq[Array[Byte]], codec: String,
                timescale: Int): Array[Byte] = {
      val ftyp = box("ftyp", cc("isom") ++ be32(512) ++ cc("isom"))
      val mdat = box("mdat", frames.reduce(_ ++ _))
      val mdatPayloadOff = ftyp.length + 8
      val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(frames.size) ++ be32(0x55c40000L))
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++
        Array.fill(13)(0.toByte))
      val sampleEntry = be32(86) ++ cc(codec) ++ Array.fill(78)(0.toByte)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ sampleEntry)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(frames.size) ++
        frames.flatMap(f => be32(f.length)).toArray)
      val stsc = box("stsc", be32(0) ++ be32(1) ++ be32(1) ++
        be32(frames.size) ++ be32(1))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
      val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd ++ hdlr ++ minf)
      val trak = box("trak", mdia)
      val moov = box("moov", trak)
      ftyp ++ mdat ++ moov
    }
    val gray = jpeg(8, 6, 0x808080)
    val bright = jpeg(8, 6, 0xf0f0f0)
    val avi = aviMjpg(Seq(gray, gray, bright), usPerFrame = 40000) // 25 fps
    val mp4 = mp4Jpeg(Seq(gray, bright), codec = "jpeg", timescale = 30)
    // frame 1 carries an EXIF-style APP1 segment EMBEDDING a whole tiny
    // JPEG (a thumbnail): a naive SOI grep would split the frame there
    // — the structural walker must keep it as ONE frame
    val thumb = jpeg(2, 2, 0x102030)
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
      (((thumb.length + 2) >> 8) & 0xff).toByte,
      ((thumb.length + 2) & 0xff).toByte) ++ thumb
    val grayWithThumb = gray.take(2) ++ app1 ++ gray.drop(2)
    // frame 2 carries a legal 0xFF fill byte before its EOI (ISO 10918-1
    // B.1.1.2) and the frames are separated by padding — the walker must
    // handle both
    val brightWithFill = bright.dropRight(2) ++
      Array(0xff.toByte, 0xff.toByte, 0xd9.toByte)
    val mjpegStream = grayWithThumb ++ Array.fill(3)(0.toByte) ++
      brightWithFill
    val h264 = mp4Jpeg(Seq(gray), codec = "avc1", timescale = 30)
    val junk = "definitely not video".getBytes("UTF-8")
    val media = Seq((1L, "video", avi), (2L, "video", mp4),
        (3L, "video", mjpegStream), (4L, "video", h264),
        (5L, "video", junk))
      .toDF("media_id", "kind", "bytes")
      .select(col("media_id"), col("kind"), col("bytes"),
        lit(0).as("width"), lit(0).as("height"))
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.media_id -> f.feature).toMap

    val a = feats(1L)
    assert(a(0) == 3.0f && a(1) == 25.0f)       // frames, container fps
    assert(a(2) == 8.0f && a(3) == 6.0f)        // REAL decoded dimensions
    // 2 gray (luma 128) + 1 near-white frame: mean luma in between,
    // inter-frame motion strictly positive (gray -> bright transition)
    assert(a(4) > 0.45f && a(4) < 0.75f, a.toSeq)
    assert(a(5) > 0.0f, a.toSeq)
    val m = feats(2L)
    assert(m(0) == 2.0f && m(1) == 30.0f)       // mdhd: 2 frames @ 30/s
    assert(m(2) == 8.0f && m(3) == 6.0f)
    val s = feats(3L)
    assert(s(0) == 2.0f && s(1) == 0.0f)        // raw stream: no fps
    assert(s(2) == 8.0f && s(3) == 6.0f)
    // H.264 sample entry has no JDK decoder; junk matches no container:
    // both take the deterministic stub (same features as a non-media
    // kind over the same bytes), NOT zero features
    val stubbed = Multimodal.extractFeatures(spark,
      Seq((4L, "other", h264), (5L, "other", junk))
        .toDF("media_id", "kind", "bytes")
        .select(col("media_id"), col("kind"), col("bytes"),
          lit(0).as("width"), lit(0).as("height"))).collect()
      .map(f => f.media_id -> f.feature).toMap
    assert(feats(4L).toSeq == stubbed(4L).toSeq)
    assert(feats(5L).toSeq == stubbed(5L).toSeq)
  }

  test("image dHash: brightness-invariant perceptual hash, near-dup " +
    "pairs via pigeonhole block LSH") {
    import java.awt.image.BufferedImage
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      (0 until 24).foreach(y => (0 until 32).foreach { x =>
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // base: luma strictly increasing in x (all gradient bits 1), values
    // in [0, 186] so the +20 brightness copy never clamps — gradient
    // SIGNS are preserved exactly, so the perceptual hash is identical
    val base = png((x, _) => x * 6)
    val bright = png((x, _) => x * 6 + 20)
    // structurally opposite: strictly decreasing -> all bits flip
    val opposite = png((x, _) => 186 - x * 6)
    val media = Seq((1L, "image", base), (2L, "image", bright),
        (3L, "image", opposite), (4L, "image", "junk".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val hashes = Multimodal.imageDHash(spark, media).collect()
      .map(r => r.media_id -> r.dhash).toMap
    assert(hashes(1L).isDefined && hashes(1L) == hashes(2L),
      "brightness shift must not move a single gradient bit")
    assert(hashes(4L).isEmpty, "undecodable bytes hash to null")
    assert(java.lang.Long.bitCount(hashes(1L).get ^ hashes(3L).get) == 64,
      "opposite gradients differ in every bit")
    val pairs = Multimodal.imageNearDupPairs(
        Multimodal.imageDHash(spark, media).toDF(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0)), pairs)

    // pigeonhole law pinned on raw hashes: flips spread across
    // DIFFERENT blocks (the adversarial placement — only one block
    // stays equal) must still pair at exactly their distance; a hash
    // past the radius never pairs even when a block matches
    val h0 = 0x0123456789abcdefL
    val within = h0 ^ (1L << 63) ^ (1L << 40) ^ (1L << 20) // blocks 0,1,2
    val beyond = h0 ^ (1L << 63) ^ (1L << 47) ^ (1L << 31) ^
      (1L << 15) ^ (1L << 0)                               // 5 flips
    val raw = Seq((10L, h0), (11L, within), (12L, beyond))
      .toDF("media_id", "dhash")
    val rawPairs = Multimodal.imageNearDupPairs(raw, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rawPairs.contains((10L, 11L, 3)), rawPairs)
    assert(!rawPairs.exists(p => p._1 == 12L || p._2 == 12L), rawPairs)
  }

  test("H.264 container metadata: avcC/SPS bit parse + stts timing, " +
    "no decoding") {
    // ------- independent SPS bit WRITER (ITU-T H.264 §7.3.2.1.1 field
    // order, Exp-Golomb per §9.1) so the parser is tested against the
    // spec, not against itself
    final class BitWriter {
      private val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
      def u1(v: Int): this.type = { bits += (v & 1); this }
      def u(n: Int, v: Int): this.type = {
        (n - 1 to 0 by -1).foreach(i => u1((v >> i) & 1)); this
      }
      def ue(v: Int): this.type = {
        val k = v + 1
        val nBits = 32 - Integer.numberOfLeadingZeros(k)
        (0 until nBits - 1).foreach(_ => u1(0))
        u(nBits, k)
      }
      def se(v: Int): this.type = ue(if (v <= 0) -2 * v else 2 * v - 1)
      /** rbsp_stop_one_bit + byte-align, then EMULATION-PREVENTION
        * escaping (00 00 0x → 00 00 03 0x) exactly as an encoder
        * writes it — exercising the reader's unescape. */
      def rbsp(): Array[Byte] = {
        u1(1)
        while (bits.length % 8 != 0) u1(0)
        val raw = bits.grouped(8)
          .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var zeros = 0
        raw.foreach { b =>
          if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
          out += b
          zeros = if (b == 0) zeros + 1 else 0
        }
        out.toArray
      }
    }
    // baseline profile, 320x240, no cropping
    def spsBaseline(): Array[Byte] = Array(0x67.toByte) ++ // NAL header
      new BitWriter()
        .u(8, 66).u(8, 0).u(8, 30)  // profile/constraints/level
        .ue(0)                      // sps_id
        .ue(0)                      // log2_max_frame_num_minus4
        .ue(0).ue(0)                // poc_type 0 + log2_max_poc_lsb
        .ue(1).u1(0)                // max_ref_frames, gaps flag
        .ue(19).ue(14)              // 20x15 macroblocks = 320x240
        .u1(1)                      // frame_mbs_only
        .u1(1)                      // direct_8x8
        .u1(0)                      // no cropping
        .u1(0)                      // no VUI
        .rbsp()
    // high profile (chroma branch), 1920x1088 coded, cropped to 1080
    def spsHigh(): Array[Byte] = Array(0x67.toByte) ++
      new BitWriter()
        .u(8, 100).u(8, 0).u(8, 40)
        .ue(0)                      // sps_id
        .ue(1)                      // chroma_format_idc 4:2:0
        .ue(0).ue(0)                // bit depths
        .u1(0)                      // qpprime bypass
        .u1(0)                      // no scaling matrix
        .ue(0)                      // log2_max_frame_num_minus4
        .ue(0).ue(0)                // poc_type 0 + log2_max_poc_lsb
        .ue(4).u1(0)
        .ue(119).ue(67)             // 120x68 mbs = 1920x1088
        .u1(1).u1(1)
        .u1(1)                      // frame_cropping_flag
        .ue(0).ue(0).ue(0).ue(4)    // crop bottom 4 * CropUnitY(2) = 8
        .u1(0)
        .rbsp()
    assert(Multimodal.parseSpsDims(spsBaseline().drop(1)).contains((320, 240)))
    assert(Multimodal.parseSpsDims(spsHigh().drop(1)).contains((1920, 1080)))

    // ------- ISO-BMFF fixture with a real avcC + stts (builder follows
    // ISO/IEC 14496-12 / -15 layouts, not the parser)
    def be32(v: Long): Array[Byte] = Array[Byte](
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] =
      Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8) ++ cc(typ) ++ payload
    def mp4H264(sps: Array[Byte], timescale: Int,
                sttsRuns: Seq[(Int, Int)],
                entryDims: Option[(Int, Int)] = None,
                codec: String = "avc1"): Array[Byte] = {
      val ftyp = box("ftyp", cc("isom") ++ be32(512) ++ cc("isom"))
      val avcc = box("avcC", Array[Byte](1, sps(1), sps(2), sps(3),
        0xff.toByte, 0xe1.toByte) ++ be16(sps.length) ++ sps ++
        Array[Byte](0)) // numPps = 0
      // VisualSampleEntry: 78 fixed bytes after size+format; width and
      // height live at +32/+34 (zero unless the fixture sets them, so
      // a passing SPS parse can't be the entry fields in disguise)
      val fixed = Array.fill(78)(0.toByte)
      entryDims.foreach { case (w, h) =>
        be16(w).copyToArray(fixed, 24); be16(h).copyToArray(fixed, 26)
      }
      val sampleEntry =
        be32(86 + (if (codec == "avc1") avcc.length else 0)) ++
          cc(codec) ++ fixed ++
          (if (codec == "avc1") avcc else Array.emptyByteArray)
      val stsd = box("stsd", be32(0) ++ be32(1) ++ sampleEntry)
      val stts = box("stts", be32(0) ++ be32(sttsRuns.size) ++
        sttsRuns.flatMap { case (c, d) => be32(c) ++ be32(d) }.toArray)
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(0))
      val stsc = box("stsc", be32(0) ++ be32(0))
      val stco = box("stco", be32(0) ++ be32(0))
      val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
        be32(timescale) ++ be32(sttsRuns.map(r => r._1 * r._2).sum) ++
        be32(0x55c40000L))
      val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc("vide") ++
        Array.fill(13)(0.toByte))
      val stbl = box("stbl", stsd ++ stts ++ stsz ++ stsc ++ stco)
      val mdia = box("mdia", mdhd ++ hdlr ++ box("minf", stbl))
      ftyp ++ box("moov", box("trak", mdia))
    }
    // 3 frames: 2 at delta 1500 + 1 at 3000, timescale 30000
    // -> 0.2 s, 15 fps
    val h264 = mp4H264(spsBaseline(), timescale = 30000,
      sttsRuns = Seq((2, 1500), (1, 3000)))
    val m = Multimodal.videoContainerMeta(h264).get
    assert(m.codec == "avc1" && m.width == 320 && m.height == 240, m)
    assert(m.nFrames == 3L && m.durationSec == 0.2f && m.fps == 15.0f, m)

    // cropped high-profile SPS through the container
    val cropped = mp4H264(spsHigh(), timescale = 600, Seq((10, 60)))
    val mc = Multimodal.videoContainerMeta(cropped).get
    assert(mc.width == 1920 && mc.height == 1080 && mc.nFrames == 10L, mc)

    // non-AVC codec: dims fall back to the sample entry fields
    val hevc = mp4H264(spsBaseline(), timescale = 600, Seq((5, 60)),
      entryDims = Some((640, 360)), codec = "hvc1")
    val mh = Multimodal.videoContainerMeta(hevc).get
    assert(mh.codec == "hvc1" && mh.width == 640 && mh.height == 360, mh)

    // AVI leg: RIFF walk to avih + the vids strl's strh/strf — an
    // H.264-in-AVI clip still yields full typed metadata, no decode
    def le32(v: Long): Array[Byte] = Array[Byte](
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(t: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(t) ++ inner)
    val avih = chunk("avih", le32(33333) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(90) ++ Array.fill(36)(0.toByte))
    val strh = chunk("strh", cc("vids") ++ cc("H264") ++ le32(0) ++
      le32(0) ++ le32(0) ++ le32(1) ++ le32(30) ++ le32(0) ++ le32(90) ++
      Array.fill(20)(0.toByte))
    val strf = chunk("strf", le32(40) ++ le32(640) ++ le32(480) ++
      Array[Byte](1, 0, 24, 0) ++ cc("H264") ++ Array.fill(20)(0.toByte))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val aviBody = cc("AVI ") ++ hdrl
    val avi = cc("RIFF") ++ le32(aviBody.length) ++ aviBody
    val ma = Multimodal.videoContainerMeta(avi).get
    assert(ma.codec == "H264" && ma.width == 640 && ma.height == 480, ma)
    assert(ma.nFrames == 90L && ma.fps == 30.0f && ma.durationSec == 3.0f, ma)

    // DataFrame surface: typed rows, null metadata for junk — one bad
    // record never fails the batch
    val rows = Multimodal.videoMetadata(spark,
        Seq((1L, "video", h264), (3L, "video", avi),
          (2L, "video", "not a video".getBytes("UTF-8")))
        .toDF("media_id", "kind", "bytes"))
      .collect().map(r => r.media_id -> r).toMap
    assert(rows(1L).codec.contains("avc1") &&
      rows(1L).width.contains(320) && rows(1L).n_frames.contains(3L))
    assert(rows(3L).codec.contains("H264") && rows(3L).fps.contains(30.0f))
    assert(rows(2L).codec.isEmpty && rows(2L).width.isEmpty &&
      rows(2L).n_bytes == 11L)
  }

  // 20 vectors in two well-separated directions (plus id-0/1 seeds in
  // each): k-means with k=2 must split them cleanly.
  private lazy val twoBlobs = (0L until 20L).map { i =>
    val hot = if (i % 2 == 0) 0 else 3
    val v = Array.tabulate(6)(d =>
      (if (d == hot) 1.0f else 0.01f) + i.toFloat * 1e-4f)
    (i, v)
  }.toDF("vec_id", "embedding")

  test("top-k agreement: exact hit counts, zero-hit and missing queries kept") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (3L, 30L)).toDF("query_id", "vec_id")
    val approx = Seq((1L, 11L), (1L, 12L), (1L, 99L),
      (2L, 77L), (2L, 78L)).toDF("query_id", "vec_id")
    val got = Similarity.topKAgreement(exact, approx)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((3L, 3L, 2L)))   // recall 2/3
    assert(got(2L) == ((2L, 2L, 0L)))   // approx found nothing real
    assert(got(3L) == ((1L, 0L, 0L)))   // approx missed the query entirely
    assert(got.size == 3)
  }

  test("pair agreement: orientation- and multiplicity-insensitive counts") {
    val exact = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    // candidates: (2,1) is (1,2) reversed, (3,4) appears twice, (7,8) is
    // a false positive; (5,6) is the one miss
    val cand = Seq((2L, 1L), (3L, 4L), (4L, 3L), (7L, 8L))
      .toDF("id_a", "id_b")
    val r = Dedup.pairAgreement(exact, cand).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_true") == 3L)
    assert(row.getAs[Long]("n_candidates") == 3L) // dedup'd to {1,2},{3,4},{7,8}
    assert(row.getAs[Long]("hits") == 2L)         // {1,2} and {3,4}
  }

  test("pair agreement: empty candidate set still yields one row") {
    val exact = Seq((1L, 2L)).toDF("id_a", "id_b")
    val cand = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val row = Dedup.pairAgreement(exact, cand).collect().head
    assert(row.getAs[Long]("n_true") == 1L)
    assert(row.getAs[Long]("n_candidates") == 0L)
    assert(row.getAs[Long]("hits") == 0L)
  }

  test("banding sweep: nested settings give monotone candidate sets") {
    val sigs = Dedup.minhashTable(docs, numHashes = 32, k = 3,
      portable = true)
    val exact = Dedup.jaccardJoin(docs, tNum = 3, tDen = 5)
    val rows = Dedup.bandingSweep(sigs, exact, Seq(4, 8, 16),
        numHashes = 32, threshold = 0.4, portable = true)
      .collect().map(r => r.getAs[Int]("bands") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("hits")))).toMap
    assert(rows.keySet == Set(4, 8, 16))
    // n_true is setting-independent (one exact pair table)
    assert(rows.values.map(_._1).toSet.size == 1)
    // a band of 2k matching rows contains two matching k-row bands, so
    // nested settings nest their candidate sets: more bands -> looser
    assert(rows(4)._2 <= rows(8)._2 && rows(8)._2 <= rows(16)._2)
    assert(rows(4)._3 <= rows(8)._3 && rows(8)._3 <= rows(16)._3)
    // the fixture's exact dup (0,3) estimates 1.0 -> a hit everywhere
    assert(rows(4)._3 >= 1L)
    intercept[IllegalArgumentException] {
      Dedup.bandingSweep(sigs, exact, Seq(5), numHashes = 32)
    }
    // duplicate settings would duplicate output rows -> rejected
    intercept[IllegalArgumentException] {
      Dedup.bandingSweep(sigs, exact, Seq(8, 8), numHashes = 32)
    }
  }

  test("banding sweep: empty inputs still yield one zero row per setting") {
    val sigs = Dedup.minhashTable(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      numHashes = 32, k = 3, portable = true)
    val exact = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val rows = Dedup.bandingSweep(sigs, exact, Seq(4, 8),
        numHashes = 32, portable = true)
      .collect().map(r => r.getAs[Int]("bands") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("hits")))).toMap
    assert(rows == Map(4 -> ((0L, 0L, 0L)), 8 -> ((0L, 0L, 0L))))
  }

  test("cross-slice pair counts: unordered slice keys, triangular matrix") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val meta = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "a"),
      (5L, "a"), (6L, "a")).toDF("doc_id", "source")
    val got = Dedup.crossSlicePairCounts(pairs, meta)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_pairs")).toMap
    // (1,2)=a-b and (3,4)=b-a both land on the unordered (a,b) key
    assert(got == Map(("a", "b") -> 2L, ("a", "a") -> 1L))
  }

  test("kmeans: deterministic across partitionings, splits separated blobs") {
    val a = Similarity.kmeansAssign(twoBlobs, k = 2, iters = 2)
      .orderBy("vec_id").collect()
    // the two planted directions land in different clusters, consistently
    val byCluster = a.groupBy(_.getAs[Int]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set((0L until 20L by 2).toSet, (1L until 20L by 2).toSet))
    // invariant under physical partitioning (exact doubles included)
    val b = Similarity.kmeansAssign(twoBlobs.repartition(7), k = 2, iters = 2)
      .orderBy("vec_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // every cosine is against the FINAL centroid: within [0, 1] here
    a.foreach(r => assert(r.getAs[Double]("cosine") > 0.0 &&
      r.getAs[Double]("cosine") <= 1.0 + 1e-12))
  }

  test("kmeans: a cluster that loses all members keeps its previous centroid") {
    // all points identical to the id-0 seed -> the id-1 seed cluster goes
    // empty on every iteration; the run must still converge with k
    // centroids and assign everything to cluster 0 (ties break low)
    val same = (0L until 8L).map(i => (i, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssign(same, k = 2, iters = 2).collect()
    assert(a.forall(_.getAs[Int]("cluster") == 0))
  }

  test("semDedup drops exactly the higher-id in-cluster near-duplicates") {
    // ids 100/101: same direction as the even blob -> near-dups of its
    // members; keep-lowest-id must drop them, never the originals
    val dupes = Seq(
      (100L, Array.tabulate(6)(d => if (d == 0) 1.0f else 0.01f)),
      (101L, Array.tabulate(6)(d => if (d == 0) 1.0f else 0.011f)))
      .toDF("vec_id", "embedding")
    val all = twoBlobs.union(dupes)
    val kept = Dedup.semDedup(all, k = 2, iters = 2, tau = 0.999)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!kept.contains(100L) && !kept.contains(101L))
    assert(kept.contains(0L) && kept.contains(1L))
    // below-threshold corpus survives intact
    val keptAll = Dedup.semDedup(twoBlobs, k = 2, iters = 2, tau = 1.1)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(keptAll == (0L until 20L).toSet)
  }

  test("incremental semDedup == one-shot restricted to the batch") {
    val dupes = Seq(
      (100L, Array.tabulate(6)(d => if (d == 0) 1.0f else 0.01f)),
      (101L, Array.tabulate(6)(d => if (d == 3) 1.0f else 0.011f)))
      .toDF("vec_id", "embedding")
    val all = twoBlobs.union(dupes)
    val cents = Similarity.kmeansCentroids(all, k = 2, iters = 2)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getAs[Int]("cluster")).toMap
    val oneShot = ids(Dedup.semDedupWith(all, cents, tau = 0.999))
    // split at id 10: the batch's near-dups (100/101) must recognize
    // their originals THROUGH the store, exactly like the one-shot run
    val store = all.filter(col("vec_id") < 10)
    val batch = all.filter(col("vec_id") >= 10)
    val inc = ids(Dedup.semDedupIncremental(
      Similarity.assignTo(store, cents), batch, cents, tau = 0.999))
    assert(inc == oneShot.filter(_._1 >= 10L))
    assert(!inc.contains(100L) && !inc.contains(101L))
  }

  test("int8 quantization: bounded values, bounded error, zero-vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),          // zero vector
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val q = vecs
      .withColumn("mx", Similarity.maxAbs(col("embedding")))
      .withColumn("q", Similarity.quantize(col("embedding"), col("mx")))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("mx"), r.getSeq[Int](3)))
      .toMap
    // components within [-127, 127]; max-abs element hits exactly +-127
    assert(q(1L)._2 == Seq(64, -32, 16, 127))
    // NOTE -63, not -64: floor(x + 0.5) rounds halves toward +inf
    // (-1.0 scales to -63.5 -> -63), identically in Spark and the oracle
    assert(q(3L)._2 == Seq(-127, 127, 64, -63))
    assert(q(2L)._2 == Seq(0, 0, 0, 0))             // no NaN/div-by-zero
    // dequantization error bound: |v - q*mx/127| <= mx/254 per component
    val v = Array(0.5, -0.25, 0.125, 1.0)
    q(1L)._2.zipWithIndex.foreach { case (qi, i) =>
      assert(math.abs(v(i) - qi * q(1L)._1 / 127.0) <= q(1L)._1 / 254.0 + 1e-12)
    }
  }

  test("kmeans: fewer vectors than clusters degrades to n clusters") {
    val tiny = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssign(tiny, k = 5, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == Map(0L -> 0, 1L -> 1))
  }

  test("mean embedding: exact driver-computed means, partitioning invariant") {
    val df = Seq(
      ("a", Array(1.0f, -2.0f)), ("a", Array(2.0f, 4.0f)),
      ("b", Array(0.5f, 0.5f)))
      .toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.meanEmbedding(d, col("label"))
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val m = run(df)
    assert(m("a") == Seq(1.5, 1.0) && m("b") == Seq(0.5, 0.5))
    assert(run(df.repartition(5)) == m)
  }

  test("jaccard join: equals in-Spark brute force; prefix filter is complete") {
    // 40 docs: pairs (2i, 2i+1) share most of their text when i % 3 == 0
    val rows = (0 until 40).map { i =>
      val base = (0 until 25).map(j => s"w${(i / 2) * 31 + j}").mkString(" ")
      val tail = if (i % 2 == 1 && (i / 2) % 3 == 0) " x y z" else s" u$i v$i"
      (i.toLong, base + tail)
    }
    val docs = rows.toDF("doc_id", "text")
    val got = Dedup.jaccardJoin(docs, tNum = 1, tDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force over the same shingle sets
    val sets = rows.map { case (i, t) =>
      i -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size; uni = (sa | sb).size
      if inter * 2 >= uni
    } yield (ia, ib, inter.toDouble / uni.toDouble)).toSet
    assert(want.nonEmpty && got == want)
  }

  test("containment join: equals brute force; asymmetric; partition invariant") {
    // doc 2i+1 embeds a prefix of doc 2i's text when i % 3 == 0 (short
    // side contained in the long side but far from resemblance); other
    // docs share nothing
    val rows = (0 until 30).flatMap { i =>
      val words = (0 until 24).map(j => s"w${i * 53 + j}")
      if (i % 3 == 0)
        Seq((2L * i, words.mkString(" ")),
          (2L * i + 1, words.take(9).mkString(" ") + s" q$i r$i"))
      else
        Seq((2L * i, words.mkString(" ")),
          (2L * i + 1, (0 until 24).map(j => s"v${i * 53 + j}").mkString(" ")))
    }
    val docs = rows.toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.containmentJoin(df, tNum = 3, tDen = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = run(docs)
    val sets = rows.map { case (i, t) =>
      i -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      inter = (sa & sb).size
      if inter * 5 >= sa.size * 3
    } yield (ia, ib, inter.toDouble / sa.size.toDouble)).toSet
    assert(want.nonEmpty && got == want)
    // the planted pairs are one-directional: short-in-long only
    assert(got.exists { case (a, b, _) => a % 2 == 1 && b == a - 1 })
    assert(!got.exists { case (a, b, _) => a % 2 == 0 && b == a + 1 })
    assert(run(docs.repartition(7)) == got)
  }

  test("token chunking: stride coverage, short-doc single chunk, empty doc none") {
    val d = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")),  // 100 tokens
      (2L, "a b c"),                                     // short: one chunk
      (3L, "")                                           // empty: no chunks
    ).toDF("doc_id", "text")
    val ch = TextAnalysis.chunkTokens(d, chunkSize = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // ceil((100-10)/30) = 3 chunks at offsets 0/30/60; last runs to token 100
    val doc1 = ch.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._2).toSeq == Seq(0, 1, 2))
    assert(doc1.map(_._3).toSeq == Seq(40, 40, 40))
    assert(doc1(2)._4.startsWith("t61 ") && doc1(2)._4.endsWith(" t100"))
    // consecutive chunks share exactly the 10-token overlap
    assert(doc1(0)._4.split(" ").takeRight(10).toSeq ==
      doc1(1)._4.split(" ").take(10).toSeq)
    assert(ch.filter(_._1 == 2L).toSeq == Seq((2L, 0, 3, "a b c")))
    assert(!ch.exists(_._1 == 3L))
  }

  test("sequence packing: exact global offsets, bucket-width and partition invariant") {
    val d = (0L until 50L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n")
    def pack(df: org.apache.spark.sql.DataFrame, width: Long) =
      Sampling.packSequences(df, col("doc_id"), col("n"), ctx = 64,
          bucketWidth = width)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted.toSeq
    val ref = {
      // literal single-stream reference: running sum in id order
      var off = 0L
      (0L until 50L).map { i =>
        val n = 10L + (i % 7); val r = (i, off / 64, off % 64); off += n; r
      }
    }
    assert(pack(d, 8) == ref)
    assert(pack(d, 1000) == ref)               // one bucket == many buckets
    assert(pack(d.repartition(7), 8) == ref)   // physical layout irrelevant
  }

  test("percentile trim: exact integer cutoffs, strata independent, 0..100 identity") {
    // stratum A: values 1..100 once each -> [5,95] keeps exactly 5..95
    // stratum B: all-equal values -> nothing can be trimmed
    val rows = (1 to 100).map(v => ("A", v)) ++ (1 to 10).map(_ => ("B", 7))
    val df = rows.toDF("lang", "n")
    val kept = TextAnalysis.percentileTrim(df, col("lang"), col("n"), 5, 95)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(kept.filter(_._1 == "A").map(_._2).sorted.toSeq == (5 to 95))
    assert(kept.count(_._1 == "B") == 10)
    // [0,100] keeps everything; repartitioning does not change the result
    val all = TextAnalysis.percentileTrim(df.repartition(5), col("lang"),
      col("n"), 0, 100).count()
    assert(all == rows.size)
    // null metric rows are excluded and never distort the cutoffs;
    // a null stratum trims as its own ordinary group
    val withNulls = Seq(
      (Some("A"), Option.empty[Int]),
      (None: Option[String], Some(1)), (None, Some(2)), (None, Some(3)))
      .toDF("lang", "n").union(df.select(col("lang"), col("n")))
    val trimmed = TextAnalysis.percentileTrim(withNulls, col("lang"),
        col("n"), 5, 95)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1)))
    assert(trimmed.filter(_._1.isEmpty).map(_._2).sorted.toSeq == Seq(1, 2, 3))
    assert(trimmed.filter(_._1.contains("A")).map(_._2).sorted.toSeq == (5 to 95))
  }

  test("heavy hitters: exact result, partitioning-invariant, no false negatives") {
    // 10k items: 'hot' is 20% of the stream, 'warm' exactly at the
    // count*threshold > n boundary (excluded — strict inequality),
    // everything else unique noise
    val rows = Seq.fill(2000)("hot") ++ Seq.fill(1000)("warm") ++
      (0 until 7000).map(i => s"u$i")
    val df = rows.toDF("item")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.heavyHitters(d, col("item"), threshold = 10)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run(df.repartition(13))
    assert(got == Map("hot" -> 2000L))        // exact count, warm excluded
    assert(run(df.repartition(3)) == got)     // sketch noise never leaks out
    // threshold 5 (> 2000 needed): nothing qualifies
    assert(Sketches.heavyHitters(df, col("item"), threshold = 5).count() == 0)
  }

  test("kmeans accepts array<double> embeddings too") {
    val d = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)),
        (2L, Array(0.9, 0.1)))
      .toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssign(d, k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a(0L) == 0 && a(1L) == 1 && a(2L) == 0)
  }

  test("quantized ANN: k rows per query, approx in [-1,1], exact rescore real") {
    val emb = twoBlobs
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = Similarity.quantizedTopK(emb, queries, k = 5).collect()
    assert(top.length == 10)
    top.foreach { r =>
      val a = r.getAs[Double]("approx_cos")
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12)   // Cauchy-Schwarz holds in ints
      assert(r.getAs[Long]("vec_id") != r.getAs[Long]("query_id"))
    }
    // the quantized ranking finds the same-direction blob: every top hit
    // for query 0 (even blob) is an even id, with high exact cosine
    top.filter(_.getAs[Long]("query_id") == 0L).foreach { r =>
      assert(r.getAs[Long]("vec_id") % 2 == 0)
      assert(r.getAs[Double]("exact_cos") > 0.99)
    }
  }

  private def spanDocs = {
    val a = (1 to 20).map(i => s"w$i").mkString(" ")               // w1..w20
    val b = ((1 to 5).map(i => s"x$i") ++ (3 to 14).map(i => s"w$i") ++
      (1 to 5).map(i => s"y$i")).mkString(" ")                     // shares w3..w14
    val c = "p q r s t p q r s t"                                  // self-repeat
    val d = (1 to 15).map(i => s"z$i").mkString(" ")               // clean
    Seq((0L, a), (1L, b), (2L, c), (3L, d)).toDF("doc_id", "text")
  }

  test("dupSpans finds the maximal cross-doc shared span at exact bounds") {
    for (portable <- Seq(false, true)) {
      val spans = Dedup.dupSpans(spanDocs, k = 4, portable = portable)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
            r.getAs[Int]("span_tokens")))).groupBy(_._1)
      // docA: w3..w14 is tokens 2..13 (0-based); seeds 2..10 merge to one span
      assert(spans(0L).map(_._2).toSeq == Seq((2, 13, 12)))
      // docB: same 12 shared tokens sit at positions 5..16
      assert(spans(1L).map(_._2).toSeq == Seq((5, 16, 12)))
      // docD shares nothing and repeats nothing
      assert(!spans.contains(3L))
    }
  }

  test("dupSpans marks within-document repetition as one merged span") {
    val spans = Dedup.dupSpans(spanDocs, k = 4)
      .filter(col("doc_id") === 2L).collect()
    // "p q r s t p q r s t": windows 0==5 and 1==6 repeat; seeds {0,1,5,6}
    // merge (max gap 4 == k) into one whole-doc span
    assert(spans.length == 1)
    val r = spans.head
    assert(r.getAs[Int]("span_start") == 0 && r.getAs[Int]("span_end") == 9 &&
      r.getAs[Int]("span_tokens") == 10)
  }

  test("dupSpanStats reports coverage and the keep decision, zeros for clean docs") {
    val stats = Dedup.dupSpanStats(spanDocs, k = 4, maxDupFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac"), r.getAs[Int]("keep"))).toMap
    assert(stats(0L) == ((20, 12L, 0.6, 0)))     // 12/20 duplicated -> drop
    assert(stats(1L) == ((22, 12L, 12.0 / 22.0, 0)))
    assert(stats(2L) == ((10, 10L, 1.0, 0)))     // all self-repeat -> drop
    assert(stats(3L) == ((15, 0L, 0.0, 1)))      // clean -> keep
  }

  test("scrubSpans strips every duplicated span from every copy") {
    val out = Dedup.scrubSpans(spanDocs, k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
          r.getAs[String]("scrubbed"))).toMap
    // docA loses w3..w14 (positions 2..13)
    assert(out(0L) == ((20, 8,
      "w1 w2 " + (15 to 20).map(i => s"w$i").mkString(" "))))
    // docB loses the same shared block (positions 5..16)
    assert(out(1L) == ((22, 10,
      (1 to 5).map(i => s"x$i").mkString(" ") + " " +
        (1 to 5).map(i => s"y$i").mkString(" "))))
    // docC is all self-repetition -> scrubbed to empty
    assert(out(2L) == ((10, 0, "")))
    // docD is untouched, text rebuilt from normalized tokens
    assert(out(3L) == ((15, 15, (1 to 15).map(i => s"z$i").mkString(" "))))
  }

  test("dupSpans is stable under repartitioning") {
    val base = Dedup.dupSpans(spanDocs, k = 4).collect().toSet
    val re = Dedup.dupSpans(spanDocs.repartition(7), k = 4).collect().toSet
    assert(base == re)
  }

  test("shard assignment: dense positions, equals the naive window, invariant") {
    import org.apache.spark.sql.expressions.Window
    val d = (0L until 500L).toDF("id")
    val a = Sampling.shardAssign(d, col("id"), nShards = 4, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // dense 0..count-1 positions per shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet)
    }
    // identical to the naive one-window-per-shard form
    val w = Window.partitionBy(col("shard")).orderBy(col("__hb"), col("id"))
    val naive = d.withColumn("__hb", Sampling.hashBucket(col("id")))
      .withColumn("shard", pmod(col("__hb"), lit(4L)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col("id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == naive)
    // bucket-count and partitioning invariance
    val b3 = Sampling.shardAssign(d, col("id"), 4, nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(b3 == a)
    val rep = Sampling.shardAssign(d.repartition(13), col("id"), 4, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(rep == a)
  }

  test("shard assignment excludes null ids (no deterministic position)") {
    val d = (Seq[Option[Long]](None) ++ (0L until 20L).map(Some(_))).toDF("id")
    val a = Sampling.shardAssign(d, col("id"), nShards = 2)
    assert(a.count() == 20 && a.filter(col("id").isNull).count() == 0)
  }

  test("repetition metrics: exact top-n-gram coverage and keep thresholds") {
    val d = Seq(
      (0L, "a b a b a b a b"),          // top 2-gram "a b" x4 of 7 -> 8/8
      (1L, "x y z w v u t s"),          // all n-grams unique
      (2L, "r r r r r r r r r r"),      // one token repeated: total repetition
      (3L, ""),                         // empty -> all zeros, kept
      (4L, "one two")                   // shorter than n=3,4 -> those are 0
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Double]("top2_frac"),
          r.getAs[Double]("top3_frac"), r.getAs[Double]("top4_frac"),
          r.getAs[Int]("keep"))).toMap
    // doc0: "a b" x4 of 7 bigrams -> 8/8; "a b a" x3 -> 9/8; "a b a b" x3
    // -> 12/8 (overlapping repeats legitimately exceed 1.0); dropped
    assert(m(0L) == ((8, 1.0, 9.0 / 8, 12.0 / 8, 0)))
    // doc1: every n-gram occurs once -> fractions n/8, kept iff all under
    assert(m(1L)._2 == 2.0 / 8 && m(1L)._3 == 3.0 / 8 && m(1L)._4 == 4.0 / 8)
    assert(m(1L)._5 == 0)   // 3/8 = 0.375 > 0.18 -> tiny docs trip the rule
    // doc2: "r r" x9 of 9 bigrams -> full coverage at every n
    assert(m(2L) == ((10, 9 * 2.0 / 10, 8 * 3.0 / 10, 7 * 4.0 / 10, 0)))
    // doc3: empty -> zeros, kept
    assert(m(3L) == ((0, 0.0, 0.0, 0.0, 1)))
    // doc4: one bigram, no 3/4-grams -> top2 = 2/2 = 1.0, others 0
    assert(m(4L) == ((2, 1.0, 0.0, 0.0, 0)))
  }

  test("bloom filter: no false negatives; build matches probe family") {
    val items = (0 until 2000).map(i => s"item-$i").toDF("it")
    val bits = Sketches.bloomBuild(items, col("it"), numBits = 1 << 14)
    // every inserted item passes the membership test
    assert(items.filter(!Sketches.bloomMightContain(bits, col("it"))).count() == 0)
    // items never inserted are overwhelmingly rejected (fp rate, not 100%)
    val absent = (0 until 2000).map(i => s"other-$i").toDF("it")
    val fp = absent.filter(Sketches.bloomMightContain(bits, col("it"))).count()
    assert(fp < 200, s"false-positive count $fp implausibly high")
  }

  test("length-grouped batches equal the single-window rank; invariant") {
    import org.apache.spark.sql.functions.col
    // lengths engineered for ties (same n_tok across many ids) and a
    // short final batch
    val rows = (0L until 107L).map(i => (i, (i % 7) * 10 + 5))
    val df = rows.toDF("doc_id", "n_tok")
    def run(parts: Int) = Sampling.lengthGroupedBatches(
        df.repartition(parts), col("doc_id"), col("n_tok"), batchSize = 16,
        bucketWidth = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // reference: plain global sort by (n_tok, doc_id)
    val ref = rows.sortBy { case (id, t) => (t, id) }.zipWithIndex
      .map { case ((id, t), rk) => id -> ((t, rk.toLong / 16)) }.toMap
    assert(run(1) == ref)
    assert(run(13) == ref)          // partitioning never moves a row
    // every batch except the last is full, and batches are length-sorted
    val byBatch = ref.values.groupBy(_._2).view
      .mapValues(_.map(_._1).toSeq).toMap
    val last = byBatch.keys.max
    assert(byBatch.filter(_._1 != last).forall(_._2.size == 16))
    for (b <- 0L until last)
      assert(byBatch(b).max <= byBatch(b + 1).min)
  }

  test("length batches: ids above 2^53 keep exact buckets; nulls excluded") {
    import org.apache.spark.sql.functions.col
    // adjacent 63-bit snowflake-style ids: a double cast collapses
    // 2^53 and 2^53+1 (the latter is not representable), so a
    // double-division bucketing would merge or shift these; integer
    // floor-division must keep every id distinct and dense-ranked
    val base = (1L << 53)
    val ids = (0L until 20L).map(base + _)
    val rows = ids.map(i => (java.lang.Long.valueOf(i),
      java.lang.Long.valueOf(7L))) :+
      ((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(7L))) :+
      ((java.lang.Long.valueOf(base + 99L), null.asInstanceOf[java.lang.Long]))
    val df = rows.toDF("doc_id", "n_tok")
    val got = Sampling.lengthGroupedBatches(df.repartition(5),
        col("doc_id"), col("n_tok"), batchSize = 4, bucketWidth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // null id / null token rows are excluded, everything else ranked
    assert(got.keySet == ids.toSet)
    // equal lengths tie-break by id: batch = position-in-id-order / 4
    val ref = ids.sorted.zipWithIndex.map { case (id, i) => id -> i.toLong / 4 }
    assert(got == ref.toMap)
    // packSequences on the same id range: offsets are the exact running
    // sum in id order, not a double approximation
    val packed = Sampling.packSequences(
        df.filter(col("doc_id").isNotNull && col("n_tok").isNotNull),
        col("doc_id"), col("n_tok"), ctx = 10, bucketWidth = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sorted
    val refPack = ids.sorted.zipWithIndex.map { case (id, i) =>
      val off = 7L * i; (id, off / 10, off % 10)
    }
    assert(packed.toSeq == refPack)
  }

  test("tfidf similarity join matches a driver replay; partition-invariant") {
    val docs = Seq(
      (0L, "a b c d e"),        // shares "a b c","b c d" with d1
      (1L, "a b c d x"),
      (2L, "z z z q q"),        // shares "z z q","z q q" with d3
      (3L, "y z z q q"),
      (4L, "p q r s t"),        // no shared shingle with anyone
      (5L, "a b c d e")         // exact dup of d0
    ).toDF("doc_id", "text")
    // driver replay of the documented semantics (binary tf, df in
    // [2, maxDf], w = 1e6 div df, exact integer cosine >= 1/2)
    val sh = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").sliding(3).map(_.mkString(" "))
        .toSeq.distinct).toMap
    val df = sh.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val qual = df.filter { case (_, d) => d >= 2 && d <= 20 }
    def w(id: Long) = sh(id).filter(qual.contains)
      .map(t => t -> 1000000L / qual(t)).toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      wa = w(a); wb = w(b)
      shared = wa.keySet & wb.keySet if shared.nonEmpty
      num = shared.toSeq.map(t => BigInt(wa(t)) * wb(t)).sum
      na2 = wa.values.map(v => BigInt(v) * v).sum
      nb2 = wb.values.map(v => BigInt(v) * v).sum
      if num * num * 4 >= na2 * nb2
    } yield (a, b, num.toLong, na2.toLong, nb2.toLong)).toSet
    def run(parts: Int) = TextAnalysis.tfidfSimilarityJoin(
        docs.repartition(parts), maxDf = 20, tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(run(1) == expected)
    assert(run(7) == expected)
    assert(expected.exists { case (a, b, _, _, _) => a == 0L && b == 5L })
    assert(!expected.exists { case (a, b, _, _, _) => a == 4L || b == 4L })
    // leak pin: the operator installs NO cache of its own, so a library
    // caller looping over corpora accumulates nothing (no clearCache
    // needed between calls)
    spark.catalog.clearCache()
    assert(run(3) == expected)
    assert(spark.sharedState.cacheManager.isEmpty,
      "tfidfSimilarityJoin left persisted blocks behind")
    // the production entry point over a PRECOMPUTED term table (the
    // 100 TB shape: tokenize once, land the term rows, consume them per
    // pass) is the same operator — equal output by construction
    val termRows = docs.select(col("doc_id"),
      explode(graft.llm.Dedup.shingles(col("text"), 3)).as("term"))
    assert(TextAnalysis.tfidfSimilarityJoinFromTerms(termRows, maxDf = 20,
        tauNum = 1, tauDen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet == expected)
  }

  test("bloom semi-join equals the plain semi-join and prunes pre-join") {
    val fact = (0L until 5000L).map(i => (i, i % 500)).toDF("id", "k")
    val dim = Seq(3L, 7L, 450L, 499L, 9999L).toDF("dk") // 9999 matches nothing
    val got = Sketches.bloomSemiJoin(fact, col("k"), dim, col("dk"),
        numBits = 1 << 14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.join(dim, col("k") === col("dk"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.nonEmpty && want.forall { case (_, k) =>
      Set(3L, 7L, 450L, 499L).contains(k) })
    // the bitmap alone (before the exact join) already rejects nearly
    // everything: no false negatives, few false positives
    val bits = Sketches.bloomBuild(dim, col("dk"), 1 << 14)
    val pass = fact.filter(Sketches.bloomMightContain(bits, col("k"))).count()
    assert(pass >= want.size && pass < 500, s"bloom passed $pass rows")
  }

  test("bloom decontamination equals the plain exploded-shingle join") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),         // eval
      (1L, "one two three four five six"),                 // eval
      (10L, "x alpha beta gamma delta epsilon y"),         // hits eval 0
      (11L, "one two three four five seven"),              // hits eval 1
      (12L, "totally unrelated content with no overlap at all")
    ).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") >= 10)
    val eval = docs.filter(col("doc_id") < 10)
    val bloom = Dedup.decontaminate(train, eval, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def grams(d: org.apache.spark.sql.DataFrame, as: String) = d.select(
      col("doc_id").as(as), explode(Dedup.shingles(col("text"), 5)).as("g"))
    val plain = grams(train, "train_id").join(grams(eval, "eval_id"), "g")
      .select(col("train_id"), col("eval_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bloom == plain && bloom == Set((10L, 0L), (11L, 1L)))
  }

  test("temperature mix: exact sqrt-weighted rates, clamp, determinism") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val d = (0L until 900L).map(i => (i, if (i < 800) "big" else "small"))
      .toDF("doc_id", "lang")
    val got = Sampling.temperatureMix(d, col("lang"), col("doc_id"),
        targetRows = 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // driver rederivation of the exact rate chain the operator documents
    val wb = math.floor(math.sqrt(800.0) * 1e6).toLong
    val ws = math.floor(math.sqrt(100.0) * 1e6).toLong
    val tw = wb + ws
    def rate(w: Long, n: Long) = math.min(1.0, 300.0 * w / tw / n)
    val expected = (0L until 900L).filter { i =>
      val r = if (i < 800) rate(wb, 800) else rate(ws, 100)
      bucket(i) < r * 268435456.0
    }.toSet
    assert(got == expected)
    // sqrt weighting up-samples the small stratum relative to raw share
    assert(rate(ws, 100) > rate(wb, 800))
    // a tiny stratum clamps at rate 1.0: every row kept
    val d2 = (0L until 501L).map(i => (i, if (i < 500) "big" else "tiny"))
      .toDF("doc_id", "lang")
    val kept2 = Sampling.temperatureMix(d2, col("lang"), col("doc_id"),
        targetRows = 400)
      .filter(col("lang") === "tiny").count()
    assert(kept2 == 1)
  }

  test("temperature mix: general alpha — exact pow-weighted rates, limits") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16)
    }
    val d = (0L until 900L).map(i => (i, if (i < 800) "big" else "small"))
      .toDF("doc_id", "lang")
    // the documented chain with StrictMath.pow — replayed exactly
    def expect(alpha: Double, target: Long): Set[Long] = {
      val wb = math.floor(StrictMath.pow(800.0, alpha) * 1e6).toLong
      val ws = math.floor(StrictMath.pow(100.0, alpha) * 1e6).toLong
      val tw = wb + ws
      def rate(w: Long, n: Long) = math.min(1.0, target.toDouble * w / tw / n)
      (0L until 900L).filter { i =>
        val r = if (i < 800) rate(wb, 800) else rate(ws, 100)
        bucket(i) < r * 268435456.0
      }.toSet
    }
    def got(alpha: Double, target: Long): Set[Long] =
      Sampling.temperatureMixAlpha(d, col("lang"), col("doc_id"),
        targetRows = target, alpha = alpha)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got(0.3, 300) == expect(0.3, 300))
    assert(got(1.0, 300) == expect(1.0, 300))
    // alpha = 1 is the raw mix: both strata share one keep rate, so the
    // small stratum's expected share stays its raw 1/9
    val g1 = got(1.0, 300)
    val smallShare1 = g1.count(_ >= 800).toDouble / g1.size
    // smaller alpha flattens: the small stratum's share must GROW
    val g03 = got(0.3, 300)
    val smallShare03 = g03.count(_ >= 800).toDouble / g03.size
    assert(smallShare03 > smallShare1, s"$smallShare03 !> $smallShare1")
    // alpha = 0.5 delegates to the oracled sqrt path, bit-identically
    assert(got(0.5, 300) ==
      Sampling.temperatureMix(d, col("lang"), col("doc_id"), 300)
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixAlpha(d, col("lang"), col("doc_id"), 300, 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixAlpha(d, col("lang"), col("doc_id"), 300, 1.5)
    }
  }

  test("unimax epoch-capped mix: waterfill law, cap, surplus, guards") {
    val d = Seq.tabulate(40)(i => (i.toLong,
      if (i < 4) "tiny" else if (i < 14) "mid" else "big", 100L))
      .toDF("doc_id", "lang", "n_tok")
    // sizes: tiny 400, mid 1000, big 2600; budget 3000, maxEpochs 2
    // walk: tiny u=1000 cap 800 -> 800 (capped), r=2200
    //       mid  u=1100 cap 2000 -> 1100, r=1100; big u=1100 -> 1100
    val got = Sampling.epochCappedMix(d, col("lang"), col("n_tok"),
        budgetTokens = 3000L, maxEpochs = 2L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == Map(
      "tiny" -> ((400L, 800L, 2000000000L, true)),
      "mid" -> ((1000L, 1100L, 1100000000L, false)),
      "big" -> ((2600L, 1100L, 423076923L, false))))
    // total allocation never exceeds the budget
    assert(got.values.map(_._2).sum <= 3000L)
    // null strata and zero-token strata emit no row
    val d2 = Seq((0L, null.asInstanceOf[String], 5L), (1L, "z", 0L),
      (2L, "a", 10L)).toDF("doc_id", "lang", "n_tok")
    val rows2 = Sampling.epochCappedMix(d2, col("lang"), col("n_tok"),
      budgetTokens = 100L, maxEpochs = 3L).collect()
    assert(rows2.map(_.getString(0)).toSeq == Seq("a"))
    // a: cap 30 < share 100 -> capped at 3 epochs
    assert(rows2.head.getLong(2) == 30L && rows2.head.getBoolean(4))
  }

  test("doremiWeights: clipped excess mean, base-2 EG step, cap, smoothing") {
    // domA: excesses 100/-50 -> clipped sum 100, mean 50 -> shift 5
    // domB: excesses 0/20    -> clipped sum 20,  mean 10 -> shift 1
    // domC: one doc, excess 1000 -> shift capped at 6
    val d = Seq(
      ("A", 100L), ("A", -50L),
      ("B", 0L), ("B", 20L),
      ("C", 1000L),
      (null.asInstanceOf[String], 999L)).toDF("dom", "exc")
    val got = Sampling.doremiWeights(d, col("dom"), col("exc"),
        shiftUnit = 10L, maxShift = 6, smoothPpb = 100000000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // weights: A = 2<<5 = 64, B = 2<<1 = 4, C = 1<<6 = 64; tot = 132
    val (pa, pb, pc) = (64L * 1000000000L / 132L, 4L * 1000000000L / 132L,
      64L * 1000000000L / 132L)
    def sm(p: Long) = 900000000L * p / 1000000000L + 100000000L / 3L
    assert(got == Map(
      "A" -> ((2L, 50L, 5L, pa, sm(pa))),
      "B" -> ((2L, 10L, 1L, pb, sm(pb))),
      "C" -> ((1L, 1000L, 6L, pc, sm(pc)))))
    // null excess counts as zero (clipped), not a dropped doc
    val d2 = Seq(("A", Some(40L)), ("A", None), ("B", Some(0L)))
      .toDF("dom", "exc")
    val g2 = Sampling.doremiWeights(d2, col("dom"), col("exc"),
        shiftUnit = 10L, maxShift = 6)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(g2 == Map("A" -> ((2L, 20L)), "B" -> ((1L, 0L))))
    // all-zero excess: shifts 0, weights = natural proportions
    val g3 = Sampling.doremiWeights(
        Seq(("A", 0L), ("B", 0L), ("B", 0L)).toDF("dom", "exc"),
        col("dom"), col("exc"), shiftUnit = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(g3 == Map("A" -> 333333333L, "B" -> 666666666L))
  }

  test("mixture samplers refuse high-cardinality strata loudly") {
    val d = (0L until (Sampling.MaxStrata.toLong + 5L))
      .toDF("doc_id").withColumn("lang", col("doc_id").cast("string"))
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureMix(d, col("lang"), col("doc_id"), 10)
    }
    assert(e.getMessage.contains("strata"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.epochCappedMix(d.withColumn("n_tok", lit(1L)), col("lang"),
        col("n_tok"), 10L, 1L)
    }
    assert(e2.getMessage.contains("strata"))
  }

  test("null text tokenizes to empty: stats, scrub, repetition report zeros") {
    val d = Seq((0L, "a b c d e"), (1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val st = Dedup.dupSpanStats(d, k = 4).filter(col("doc_id") === 1L)
      .collect().head
    assert(st.getAs[Int]("n_tokens") == 0 &&
      st.getAs[Long]("dup_tokens") == 0L && st.getAs[Int]("keep") == 1)
    val sc = Dedup.scrubSpans(d, k = 4).filter(col("doc_id") === 1L)
      .collect().head
    assert(sc.getAs[Int]("n_kept") == 0 && sc.getAs[String]("scrubbed") == "")
    val rm = TextAnalysis.repetitionMetrics(d).filter(col("doc_id") === 1L)
      .collect().head
    assert(rm.getAs[Int]("n_tokens") == 0 &&
      rm.getAs[Double]("top2_frac") == 0.0 && rm.getAs[Int]("keep") == 1)
  }

  test("repetition metrics with no applicable threshold keep everything") {
    val d = Seq((0L, "x x x x x x")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionMetrics(d, ns = Seq(5)).collect().head
    // n=5 has no configured threshold -> nothing can trip, keep is vacuous
    assert(r.getAs[Double]("top5_frac") > 0.0 && r.getAs[Int]("keep") == 1)
  }

  test("centroid classifier separates disjoint-vocab classes") {
    val d = Seq((1L, "a", "alpha alpha alpha beta"),
      (2L, "b", "gamma gamma gamma beta")).toDF("doc_id", "source", "text")
    val pred = TextAnalysis.centroidClassifier(d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred"), r.getAs[Long]("score"))).toMap
    // class a profile {alpha: 3/4, beta: 1/4}: doc1 scores
    // 3*750000000 + 1*250000000 = 2.5e9 under a, only 250000000 under b
    assert(pred(1L) == (("a", 2500000000L)))
    assert(pred(2L) == (("b", 2500000000L)))
  }

  test("centroid classifier breaks exact score ties by smallest class label") {
    val d = Seq((1L, "u", "t"), (2L, "v", "t")).toDF("doc_id", "source", "text")
    val pred = TextAnalysis.centroidClassifier(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    // both classes have the identical profile {t: 1.0} -> every doc ties
    // at 1e9 under u and v; the deterministic tie-break picks "u"
    assert(pred == Map(1L -> "u", 2L -> "u"))
  }

  test("bigram LM: exact smoothed scores, unseen-bigram floor, short docs dropped") {
    val train = Seq((0L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    // c2: (a,b)=2 (b,a)=1 (b,c)=1; c1: a=2 b=2; V=3
    val toScore = Seq(
      (1L, "a b z a"),   // seen, unseen-w2, unseen-w1 bigrams
      (3L, "solo"),      // single token: no bigram, no row
      (5L, "a b a b")    // pure in-distribution text
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(train, toScore, minScore = 400000000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_score"),
          r.getAs[Boolean]("keep"))).toMap
    // doc 1: p(a,b)=1e9*3/5=600000000, p(b,z)=1e9*1/5=200000000,
    //        p(z,a)=1e9*1/3=333333333 -> mean = 1133333333/3 = 377777777
    assert(got(1L) == ((3L, 377777777L, false)))
    // doc 5: bigrams (a,b)x2 + (b,a): (2*600000000 + 1e9*2/5) div 3
    assert(got(5L) == ((3L, 533333333L, true)))
    assert(!got.contains(3L))
    val again = TextAnalysis.bigramLmScore(train.repartition(5),
        toScore.repartition(3), minScore = 400000000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_score"),
          r.getAs[Boolean]("keep"))).toMap
    assert(again == got)
  }

  test("naive bayes odds: exact smoothed ratios, unseen tokens neutral, empty docs dropped") {
    val labeled = Seq((0L, "a a b", true), (2L, "b c c", false))
      .toDF("doc_id", "text", "is_seed")
    // cp: a=2 b=1 c=0; cn: a=0 b=1 c=2; tp=3 tn=3 V=3 -> both totals 6,
    // so r = 1e9 * (cp+1) div (cn+1): a=3e9, b=1e9, c=333333333, unseen=1e9
    val toScore = Seq(
      (1L, "a b z"), // seen-positive + tie + unseen-neutral
      (3L, "c c"),   // pure negative-class text
      (5L, "")       // zero tokens: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.naiveBayesOdds(labeled, toScore, col("is_seed"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nb_score"),
          r.getAs[Boolean]("keep"))).toMap
    // doc 1: (3e9 + 1e9 + 1e9) div 3 = 1666666666 >= 1e9
    assert(got(1L) == ((3L, 1666666666L, true)))
    // doc 3: 2*333333333 div 2 = 333333333 < 1e9
    assert(got(3L) == ((2L, 333333333L, false)))
    assert(!got.contains(5L))
    val again = TextAnalysis.naiveBayesOdds(labeled.repartition(4),
        toScore.repartition(3), col("is_seed"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nb_score"),
          r.getAs[Boolean]("keep"))).toMap
    assert(again == got)
  }

  test("naive bayes odds: NULL positive counts negative (engine law)") {
    val labeled = Seq((0L, "a", Some(true)), (2L, "b", None))
      .toDF("doc_id", "text", "is_seed")
    // cp: a=1 b=0; cn: a=0 b=1; tp=1 tn=1 V=2 -> totals 3
    // r(b) = 1e9 * 1 * 3 div (2 * 3) = 500000000
    val got = TextAnalysis.naiveBayesOdds(labeled,
        Seq((1L, "b")).toDF("doc_id", "text"), col("is_seed"))
      .collect().head
    assert(got.getAs[Long]("nb_score") == 500000000L &&
      !got.getAs[Boolean]("keep"))
  }

  test("moore-lewis: exact cross-entropy-difference law — in-domain-like " +
    "kept, general-like dropped, bigram-less docs rowless") {
    // in-domain LM trains on "a b a b": c2(a,b)=2 c2(b,a)=1, c1(a)=2
    // c1(b)=1, V=2; general LM on "z q z q" symmetrically
    val inD = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val gen = Seq((1L, "z q z q")).toDF("doc_id", "text")
    val cand = Seq((10L, "a b"), (11L, "z q"), (12L, "m"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.mooreLewisSelect(inD, gen, cand)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("lm_in"), r.getAs[Long]("lm_gen"),
          r.getAs[Long]("ml_delta"), r.getAs[Boolean]("keep"))).toMap
    // doc 10 "a b": in = 1e9*(2+1) div (2+2) = 75e7; gen (unseen) =
    // 1e9*1 div (0+2) = 5e8 -> delta +25e7, kept
    assert(got(10L) == ((750000000L, 500000000L, 250000000L, true)))
    // doc 11 "z q": the mirror -> delta -25e7, dropped
    assert(got(11L) == ((500000000L, 750000000L, -250000000L, false)))
    // doc 12 has no bigram under either LM: no row (length-filter route)
    assert(!got.contains(12L) && got.size == 2)
    // partition-invariant (the exact-integer law is order-free)
    val again = TextAnalysis.mooreLewisSelect(inD.repartition(3),
        gen.repartition(2), cand.repartition(4))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("lm_in"), r.getAs[Long]("lm_gen"),
          r.getAs[Long]("ml_delta"), r.getAs[Boolean]("keep"))).toMap
    assert(again == got)
  }

  test("naive bayes odds: EMPTY labeled seed yields NULL scores, not a crash") {
    // tp = tn = V = 0 makes every ratio's divisor zero; the scaladoc
    // contract is NULL scores (nothing was learned) — under this
    // build's ANSI default an unguarded div would raise per row
    val labeled = Seq.empty[(Long, String, Boolean)]
      .toDF("doc_id", "text", "is_seed")
    val got = TextAnalysis.naiveBayesOdds(labeled,
        Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text"), col("is_seed"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.isNullAt(2), r.isNullAt(3))).toMap
    // every doc still rows out with its token count; score/keep NULL
    assert(got == Map(1L -> ((2L, true, true)), 2L -> ((1L, true, true))))
  }

  test("keep-first span dedup: first copy survives, later copies scrubbed, islands merge") {
    val d = Seq(
      (0L, "p q r s"),      // holds the first occurrences -> untouched
      (1L, "z p q r s"),    // pqr/qrs both non-first -> island [1,4]
      (2L, "m n o m n o"),  // within-doc repeat: second mno scrubbed
      (3L, "")              // zero tokens
    ).toDF("doc_id", "text")
    val got = Dedup.scrubSpansKeepFirst(d, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
          r.getAs[String]("deduped"))).toMap
    assert(got(0L) == ((4, 4, "p q r s")))
    assert(got(1L) == ((5, 1, "z")))
    assert(got(2L) == ((6, 3, "m n o")))
    assert(got(3L) == ((0, 0, "")))
    // corpus-wide: exactly ONE copy of the duplicated window survives
    val survivors = got.values.count(_._3.contains("p q r"))
    assert(survivors == 1)
    // partition invariance of the (doc_id, pos) argmin
    val again = Dedup.scrubSpansKeepFirst(d.repartition(5), k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
          r.getAs[String]("deduped"))).toMap
    assert(again == got)
    // portable md5 hashing selects the same survivors
    val portable = Dedup.scrubSpansKeepFirst(d, k = 3, portable = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Int]("n_kept"),
          r.getAs[String]("deduped"))).toMap
    assert(portable == got)
  }

  test("keep-first span dedup: adjacent non-first windows merge across their gap") {
    // docD's two non-first windows sit at pos 0 and 3 (gap == k) ->
    // ONE island covering the whole doc
    val d = Seq(
      (6L, "u v w t"),
      (7L, "v w t u v w")
    ).toDF("doc_id", "text")
    val got = Dedup.scrubSpansKeepFirst(d, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_kept"), r.getAs[String]("deduped"))).toMap
    assert(got(6L) == ((4, "u v w t")))
    assert(got(7L) == ((0, "")))
  }

  test("jl projection: independent weight-law replay, rpBucket sign consistency") {
    def mk(id: Long, f: Int => Float) = (id, Array.tabulate(64)(f))
    val gens: Seq[(Long, Int => Float)] = Seq(
      0L -> ((i: Int) => (i % 7 - 3).toFloat),
      1L -> ((i: Int) => math.sin(i.toDouble).toFloat),
      2L -> ((_: Int) => 1.0f))
    val vecs = gens.map { case (id, f) => mk(id, f) }.toDF("vec_id", "embedding")
    val got = Similarity.jlProject(vecs, 64, 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    // driver-side replay of the exact weight law + left-fold order
    def w(p: Int, d: Int): Double =
      (org.apache.spark.sql.catalyst.expressions.XXH64
        .hashInt(p * 7919 + d, 42L) % 1000000L).toDouble / 1000000.0
    for ((id, f) <- gens; p <- 0 until 8) {
      var acc = 0.0
      var d = 0
      while (d < 64) { acc += f(d).toDouble * w(p, d); d += 1 }
      assert(got(id)(p) == acc, s"vec $id plane $p")
    }
    // the LSH bits ARE the sign pattern of this projection
    val bits = vecs.select(col("vec_id"),
        graft.expr.VectorExprs.rpBits(col("embedding"), 64, 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, proj) <- got; p <- 0 until 8)
      assert(((bits(id) >> p) & 1L) == (if (proj(p) >= 0) 1L else 0L))
  }

  test("jl distortion report: identical pair ~zero error, panel + pair-order laws") {
    val vecs = Seq(
      (0L, Array.fill(64)(1.0f)),
      (1L, Array.fill(64)(1.0f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (99L, Array.fill(64)(5.0f)) // outside the panel
    ).toDF("vec_id", "embedding")
    val rows = Similarity.jlDistortionReport(vecs, 64, 8, panel = 3).collect()
    assert(rows.length == 3) // pairs (0,1) (0,2) (1,2), vec 99 excluded
    assert(rows.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(rows.forall(r => r.getAs[Long]("err") ==
      math.abs(r.getAs[Long]("cos_orig") - r.getAs[Long]("cos_proj"))))
    val same = rows.find(r => r.getAs[Long]("id_a") == 0L &&
      r.getAs[Long]("id_b") == 1L).get
    // identical vectors: exact 1.0 original cosine (64/(8*8)); the
    // projected cosine may differ by one quantum from sqrt rounding
    assert(same.getAs[Long]("cos_orig") == 1000000000L)
    assert(same.getAs[Long]("err") <= 1L)
  }

  test("novelty score: full match not novel, disjoint doc novel, ties pick smallest sid") {
    val store = Seq(
      (0L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // identical sig to 0 -> nearest tie
      (4L, "apples oranges pears bananas grapes")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta"),            // exact sig match
      (3L, "unrelated vocabulary tokens entirely"), // no shared bucket
      (5L, "xy")                                  // sub-k: no signature
    ).toDF("doc_id", "text")
    val ss = Dedup.minhashTable(store, numHashes = 16, k = 3)
    val ns = Dedup.minhashTable(batch, numHashes = 16, k = 3)
    val got = Dedup.noveltyScore(ss, ns, numHashes = 16, bands = 4,
        tNum = 1, tDen = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_candidates"), Option(r.getAs[Any]("nearest_id")),
          r.getAs[Int]("sig_matches"), r.getAs[Long]("est_ji"),
          r.getAs[Boolean]("is_novel"))).toMap
    assert(got(1L) == ((2L, Some(0L), 16, 1000000000L, false)))
    assert(got(3L) == ((0L, None, 0, 0L, true)))
    assert(!got.contains(5L))
    val again = Dedup.noveltyScore(ss.repartition(5), ns.repartition(3),
        numHashes = 16, bands = 4, tNum = 1, tDen = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_candidates"), Option(r.getAs[Any]("nearest_id")),
          r.getAs[Int]("sig_matches"), r.getAs[Long]("est_ji"),
          r.getAs[Boolean]("is_novel"))).toMap
    assert(again == got)
  }

  test("novelty score: saturated store buckets are excluded from the probe") {
    val store = Seq((0L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val ss = Dedup.minhashTable(store, numHashes = 16, k = 3)
    val ns = Dedup.minhashTable(batch, numHashes = 16, k = 3)
    // every store bucket holds all 3 identical docs > maxBucket=2 ->
    // the probe sees nothing and the exact-duplicate batch doc reads
    // as novel (the documented degenerate-bucket trade)
    val r = Dedup.noveltyScore(ss, ns, numHashes = 16, bands = 4,
      maxBucket = 2).collect().head
    assert(r.getAs[Long]("n_candidates") == 0L &&
      r.getAs[Boolean]("is_novel"))
  }

  test("classifier calibration: exact rank cuts, bucket law, cumulative-from-top") {
    val scored = (1 to 10).map(i =>
        (i.toLong, i * 10L, if (i >= 7) Some(true) else if (i == 1) None
        else Some(false)))
      .toDF("doc_id", "s", "lab")
    // buckets=2: one cut at rank ceil(50*10/100)=5 -> score 50;
    // bucket 1 = scores >= 50 (6 docs, 4 positive), bucket 0 = 4 docs
    // (incl. the NULL label, which counts negative)
    val got = TextAnalysis.classifierCalibration(scored, col("lab"),
        buckets = 2, score = col("s"))
      .collect().map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"),
          r.getAs[Long]("prec_scaled"), r.getAs[Long]("cum_docs"),
          r.getAs[Long]("cum_pos"), r.getAs[Long]("cum_prec_scaled"))).toMap
    assert(got(1) == ((6L, 4L, 666666666L, 6L, 4L, 666666666L)))
    assert(got(0) == ((4L, 0L, 0L, 10L, 4L, 400000000L)))
  }

  test("classifier calibration: total score ties collapse into the top bucket") {
    val scored = (1 to 6).map(i => (i.toLong, 42L, i % 2 == 0))
      .toDF("doc_id", "s", "lab")
    val got = TextAnalysis.classifierCalibration(scored, col("lab"),
      buckets = 2, score = col("s")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Int]("bucket") == 1 &&
      got.head.getAs[Long]("n_docs") == 6L &&
      got.head.getAs[Long]("n_pos") == 3L)
  }

  test("winnow matches: distinct-print counting, stop-print cap, rank cut, self exclusion") {
    // hand-built print sets; print 7 sits in 4 corpus docs -> capped at
    // maxDf=3 and contributes no evidence anywhere
    val corpus = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 7L),
      (11L, 2L), (11L, 3L), (11L, 7L), (12L, 9L), (12L, 7L),
      (13L, 2L), (13L, 7L)).toDF("doc_id", "fp")
    val queries = Seq((1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
      (10L, 1L), (10L, 2L)).toDF("doc_id", "fp")
    val got = TextAnalysis.winnowMatches(corpus, queries,
        topK = 2, maxDf = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("doc_id"), r.getAs[Long]("shared"),
          r.getAs[Long]("q_prints"), r.getAs[Long]("coverage_scaled"))).toMap
    // q1 {2,3,(7 capped),8}: doc10 shares {2,3}, doc11 {2,3}, doc13 {2};
    // topK=2 keeps the two shared=2 docs, id-ordered; q_prints counts
    // the UNCAPPED query set (4)
    assert(got((1L, 1)) == ((10L, 2L, 4L, 500000000L)))
    assert(got((1L, 2)) == ((11L, 2L, 4L, 500000000L)))
    assert(!got.contains((1L, 3)))
    // q10 never matches itself; shared print 2 reaches docs 11 and 13
    assert(got((10L, 1)) == ((11L, 1L, 2L, 500000000L)))
    assert(got((10L, 2)) == ((13L, 1L, 2L, 500000000L)))
  }

  test("winnow matches: the w+k-1 shared-substring guarantee surfaces a match") {
    // docs share the 6-token run "p q r s t u" (= w+k-1 at k=3, w=4) ->
    // winnowing guarantees at least one identical selected fingerprint
    val docs = Seq(
      (0L, "p q r s t u x1 x2 x3 x4"),
      (1L, "y1 y2 p q r s t u y3 y4"),
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k = 3, w = 4)
    val got = TextAnalysis.winnowMatches(fps,
        fps.filter(col("doc_id") === 0L), topK = 5, maxDf = 100)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("shared")).toMap
    assert(got.getOrElse(1L, 0L) >= 1L, "guaranteed fingerprint missing")
    assert(!got.contains(2L), "disjoint doc must not match")
  }

  test("kneser-ney: every branch hand-derived, exact normalization on " +
    "the 1e9 grid, empty train NULLs, partitioning invariance") {
    // train: c2 (a,b)=2 (b,a)=3 (a,c)=1 (a,francisco)=1; ctx a:(4,3)
    // b:(3,1); cont a/b/c/francisco ldiv=1; nbi=4
    val train = Seq((0L, "a b a b a c"), (2L, "b a francisco"))
      .toDF("doc_id", "text")
    val probe = Seq(
      (1L, "a b z a q c"), // discount + zero-cont + unseen-ctx branches
      (3L, "z q z")        // unseen-unseen everywhere -> 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyScore(train, probe,
        minScore = 100000000L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3))).toSeq
    // (a,b): (5*4+9)*1e9//64 = 453125000; (b,z): 0; (z,a): 1e9*1//4;
    // (a,q): 0; (q,c): 1e9*1//4 — mean 953125000/5
    assert(got == Seq((1L, 5L, 190625000L, true),
      (3L, 2L, 0L, false)))
    // KN normalizes exactly: P(.|a) over the continuation vocabulary
    // sums to 1, and 64 | 1e9 so the grid image sums to exactly 1e9
    val singles = Seq((11L, "a b"), (13L, "a c"), (15L, "a francisco"),
      (17L, "a a")).toDF("doc_id", "text")
    val ps = TextAnalysis.kneserNeyScore(train, singles)
      .orderBy("doc_id")
      .collect().map(r => r.getLong(2)).toSeq
    assert(ps == Seq(453125000L, 203125000L, 203125000L, 140625000L))
    assert(ps.sum == 1000000000L)
    // empty train learns nothing: score NULL, keep false at any bar
    val empty = TextAnalysis.kneserNeyScore(train.limit(0), probe)
      .collect().map(r => r.isNullAt(2)).toSeq
    assert(empty == Seq(true, true))
    // partitioning cannot move a score
    val re = TextAnalysis.kneserNeyScore(train.repartition(5),
        probe.repartition(3), minScore = 100000000L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(re == Seq((1L, 190625000L), (3L, 0L)))
  }

  test("stupid backoff: every branch hand-derived, unseen scores zero, short docs drop") {
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    // c3: abc=2 bca=1 cab=1; c2: ab=2 bc=2 ca=1; c1: a=b=c=2; N=6
    val toScore = Seq(
      (1L, "a b c"),    // seen trigram: 1e9*2 div 2 = 1e9
      (3L, "b c a"),    // seen trigram: 1e9*1 div 2 = 5e8
      (7L, "x a b"),    // bigram backoff: 4e8*2 div 2 = 4e8
      (9L, "x y c"),    // unigram backoff: 1.6e8*2 div 6 = 53333333
      (5L, "a b x"),    // unseen everywhere -> 0
      (11L, "ab"),      // < 3 tokens: no row
      (13L, "a b c a")  // mean of 1e9 and 5e8 = 750000000
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScore(train, toScore,
        minScore = 500000000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("sb_score"),
          r.getAs[Boolean]("keep"))).toMap
    assert(got(1L) == ((1L, 1000000000L, true)))
    assert(got(3L) == ((1L, 500000000L, true)))
    assert(got(7L) == ((1L, 400000000L, false)))
    assert(got(9L) == ((1L, 53333333L, false)))
    assert(got(5L) == ((1L, 0L, false)))
    assert(!got.contains(11L))
    assert(got(13L) == ((2L, 750000000L, true)))
    val again = TextAnalysis.stupidBackoffScore(train.repartition(3),
        toScore.repartition(4), minScore = 500000000L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Long]("sb_score"),
          r.getAs[Boolean]("keep"))).toMap
    assert(again == got)
  }

  test("epoch expansion: floor+bernoulli law, exact-integer weights, clamp visible, drops") {
    def h60(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    def jl(x: Long): java.lang.Long = java.lang.Long.valueOf(x)
    val docs = Seq(
      (1L, jl(2500000000L)),        // 2.5 epochs: 2 + bernoulli(0.5)
      (2L, jl(0L)),                 // zero weight: dropped
      (3L, null: java.lang.Long),   // null: dropped
      (4L, jl(10000000000L)),       // 10 epochs vs maxCopies=3: clamped
      (5L, jl(-7L)),                // negative: dropped
      (6L, jl(1000000000L))         // exactly 1.0: one copy, no bernoulli
    ).toDF("doc_id", "w")
    val got = Sampling.epochExpand(docs, col("w"), maxCopies = 3)
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .map { case (id, rows) =>
        id -> ((rows.map(_.getAs[Long]("copy")).sorted.toSeq,
          rows.head.getAs[Long]("n_copies"),
          rows.head.getAs[Boolean]("clamped"))) }
    val d1Expected = 2L + (if (h60(1L) % 1000000000L < 500000000L) 1L else 0L)
    assert(got(1L) == (((1L to d1Expected).toSeq, d1Expected, false)))
    assert(!got.contains(2L) && !got.contains(3L) && !got.contains(5L))
    assert(got(4L) == ((Seq(1L, 2L, 3L), 3L, true)))
    assert(got(6L) == ((Seq(1L), 1L, false)))
  }

  test("rrf fusion: exact integer scores, absent docs score one-sided, doc_id ties") {
    val sysA = Seq(("q1", 10L, 1), ("q1", 20L, 2)).toDF("query_id", "doc_id", "rank")
    val sysB = Seq(("q1", 20L, 1), ("q1", 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = TextAnalysis.rrfFuse(Seq(sysA, sysB), kConst = 60, topK = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rrf_score"), r.getAs[Int]("rank"))).toMap
    // 1e9 div 61 = 16393442, 1e9 div 62 = 16129032
    assert(got(20L) == ((16393442L + 16129032L, 1)))  // in both systems
    assert(got(10L) == ((16393442L, 2)))              // one-sided, rank 1
    assert(got(30L) == ((16129032L, 3)))              // one-sided, rank 2
    // equal fused scores break on doc_id
    val tied = TextAnalysis.rrfFuse(Seq(
      Seq(("q1", 6L, 1), ("q1", 5L, 1)).toDF("query_id", "doc_id", "rank")))
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    assert(tied.toSeq == Seq(5L, 6L))
  }

  test("bm25: exact BigInt rederivation, rank order, absent terms inert") {
    val corpus = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "apple cherry cherry date fig grape"),
      (3L, ""),                           // empty: excluded from N and T
      (4L, "banana banana banana banana")
    ).toDF("doc_id", "text")
    val queries = Seq(
      "qa" -> "apple cherry",
      "qb" -> "apple apple",              // repeated term -> qtf = 2
      "qc" -> "zzz missing")              // no corpus term -> no rows
    val got = TextAnalysis.bm25TopK(corpus, queries, k = 3).collect()
      .map(r => (r.getAs[String]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("score"), r.getAs[Int]("rank"))).toMap

    // driver-side rederivation of the documented kernel
    val toks = Map(0L -> Seq("apple", "banana", "apple"),
      1L -> Seq("banana", "cherry"),
      2L -> Seq("apple", "cherry", "cherry", "date", "fig", "grape"),
      4L -> Seq("banana", "banana", "banana", "banana"))
    val n = BigInt(toks.size); val t = BigInt(toks.values.map(_.size).sum)
    def df(term: String) = BigInt(toks.values.count(_.contains(term)))
    def score(docId: Long, q: Seq[(String, Int)]): BigInt = q.map {
      case (term, qtf) =>
        val tf = BigInt(toks(docId).count(_ == term))
        if (tf == 0) BigInt(0)
        else {
          val d = df(term)
          val idf = (2 * n - 2 * d + 1) * 1000000 / (2 * d + 1)
          val dl = BigInt(toks(docId).size)
          idf * 44 * tf * t * qtf / (20 * tf * t + 6 * t + 18 * dl * n)
        }
    }.sum
    val qa = Seq("apple" -> 1, "cherry" -> 1)
    val qaScores = Seq(0L, 1L, 2L, 4L).map(i => i -> score(i, qa))
      .filter(_._2 > 0).sortBy { case (i, s) => (-s, i) }
    qaScores.take(3).zipWithIndex.foreach { case ((i, s), r) =>
      assert(got(("qa", i)) == ((s.toLong, r + 1)), s"qa doc $i")
    }
    val qb = Seq("apple" -> 2)
    assert(got(("qb", 0L))._1 == score(0L, qb).toLong)
    assert(!got.keys.exists(_._1 == "qc"))
    assert(!got.keys.exists(_._2 == 3L))  // empty doc never scores
    // repartitioning does not change anything (order-independent sums)
    val again = TextAnalysis.bm25TopK(corpus.repartition(7), queries, k = 3)
      .collect().map(r => (r.getAs[String]("query_id"),
        r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("score"), r.getAs[Int]("rank"))).toMap
    assert(again == got)
  }

  test("leak-safe split: clusters never straddle splits; singletons " +
    "match the per-doc hash assignment") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 100
    }
    // 40 docs; edges chain {0,1,2}, pair {10,11}, star {20,21,22,23}
    val d = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L),
      (20L, 21L), (20L, 22L), (20L, 23L)).toDF("id_a", "id_b")
    val got = Dedup.leakSafeSplit(d, edges,
        cuts = Seq("train" -> 80, "validation" -> 90), lastSplit = "test")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got.size == 40)
    // every cluster member shares the representative's split
    for (cluster <- Seq(Seq(0L, 1L, 2L), Seq(10L, 11L),
      Seq(20L, 21L, 22L, 23L))) {
      val assigns = cluster.map(got)
      assert(assigns.toSet.size == 1, s"cluster $cluster split ${assigns}")
      assert(assigns.head._1 == cluster.min) // min-id representative
    }
    // singleton docs: own cluster id, per-doc hash law
    for (i <- (3L until 10L) ++ (12L until 20L) ++ (24L until 40L)) {
      val (cid, split) = got(i)
      assert(cid == i)
      val b = bucket(i)
      val want = if (b < 80) "train" else if (b < 90) "validation" else "test"
      assert(split == want, s"doc $i bucket $b")
    }
    // a clustered doc's split follows the CLUSTER id's bucket, not its own
    val b20 = bucket(20L)
    val want20 =
      if (b20 < 80) "train" else if (b20 < 90) "validation" else "test"
    assert(got(23L)._2 == want20)
    // cuts must ascend strictly, and a non-positive cut (an unreachable
    // split) must fail fast
    intercept[IllegalArgumentException] {
      Dedup.leakSafeSplit(d, edges, Seq("a" -> 90, "b" -> 80), "c")
    }
    intercept[IllegalArgumentException] {
      Dedup.leakSafeSplit(d, edges, Seq("a" -> -5, "b" -> 90), "c")
    }
  }

  test("incremental leak-safe split: inherits stored splits, flags " +
    "merge conflicts, matches the one-shot law on a fresh store") {
    import java.security.MessageDigest
    def bucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 100
    }
    def law(id: Long): String = {
      val b = bucket(id)
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val cuts = Seq("train" -> 80, "validation" -> 90)
    def run(store: Seq[(Long, String)], batch: Seq[Long],
            edges: Seq[(Long, Long)],
            conflicted: Option[Seq[Long]] = None) =
      Dedup.incrementalLeakSafeSplit(
          store.toDF("doc_id", "split"), batch.toDF("doc_id"),
          edges.toDF("id_a", "id_b"), cuts, "test",
          conflictedIds = conflicted.map(_.toDF("doc_id")))
        .collect().map(r => r.getLong(0) ->
          ((r.getString(2), r.getBoolean(3), r.getLong(4), r.getBoolean(5))))
        .toMap

    // 1) fresh store: every batch doc follows the one-shot hash law,
    //    clustered docs by their batch-local representative
    val fresh = run(Seq.empty, Seq(0L, 1L, 2L, 9L), Seq((0L, 1L)))
    assert(fresh(0L) == ((law(0L), false, 0L, false)))
    assert(fresh(1L) == ((law(0L), false, 0L, false))) // rep 0, not own hash
    assert(fresh(2L) == ((law(2L), false, 0L, false)))
    // 2) inheritance beats re-hashing: stored doc 5 was published as
    //    "validation" (whatever its hash says); a new near-dup of it
    //    must land there too
    val inh = run(Seq(5L -> "validation"), Seq(100L), Seq((5L, 100L)))
    assert(inh(100L) == (("validation", true, 1L, false)))
    // 3) a bridge doc merging two stored clusters with different splits
    //    takes the smallest stored member's split and is FLAGGED
    val conf = run(Seq(5L -> "validation", 7L -> "train"), Seq(100L),
      Seq((5L, 100L), (7L, 100L)))
    assert(conf(100L) == (("validation", true, 2L, true)))
    // 4) the stability win over the one-shot law: doc 100 published,
    //    then a SMALLER-id near-dup arrives; one-shot would re-hash the
    //    cluster under rep 50, incremental keeps 100's published split
    val stab = run(Seq(100L -> law(100L)), Seq(50L), Seq((50L, 100L)))
    assert(stab(50L) == ((law(100L), true, 1L, false)))
    // 5) conflict stickiness: doc 7 belongs to a previously-flagged
    //    merge; a later near-dup touching ONLY doc 7 sees one stored
    //    split (n_store_splits = 1) yet must still come back flagged
    val sticky = run(Seq(7L -> "train"), Seq(101L), Seq((7L, 101L)),
      conflicted = Some(Seq(5L, 7L, 100L)))
    assert(sticky(101L) == (("train", true, 1L, true)))
    //    ...and an untainted doc in the same batch stays clean
    val clean2 = run(Seq(7L -> "train"), Seq(101L, 300L),
      Seq((7L, 101L)), conflicted = Some(Seq(5L, 7L, 100L)))
    assert(clean2(300L) == ((law(300L), false, 0L, false)))
  }

  test("collected incremental split == distributed form on every scenario") {
    val cuts = Seq("train" -> 80, "validation" -> 90)
    def both(store: Seq[(Long, String)], batch: Seq[Long],
             edges: Seq[(Long, Long)], conflicted: Option[Seq[Long]]) = {
      val edgesDf = edges.toDF("id_a", "id_b")
      val distr = Dedup.incrementalLeakSafeSplit(
          store.toDF("doc_id", "split"), batch.toDF("doc_id"),
          edgesDf, cuts, "test",
          conflictedIds = conflicted.map(_.toDF("doc_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getBoolean(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1).toSeq
      val comps = Dedup.duplicateClusters(edgesDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val st = Dedup.incrementalLeakSafeSplitCollected(
        store.toDF("doc_id", "split"), batch.toDF("doc_id"), comps,
        cuts, "test", conflictedIds = conflicted.map(_.toDF("doc_id")))
      val coll = st.assignments
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getBoolean(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1).toSeq
      assert(coll == distr, s"store=$store batch=$batch edges=$edges")
      // driver-known conflicted comps == the frame's conflicted clusters
      assert(st.conflictedComps ==
        coll.filter(_._6).map(_._2).toSet)
    }
    both(Seq.empty, Seq(0L, 1L, 2L, 9L), Seq((0L, 1L)), None)
    both(Seq(5L -> "validation"), Seq(100L), Seq((5L, 100L)), None)
    both(Seq(5L -> "validation", 7L -> "train"), Seq(100L),
      Seq((5L, 100L), (7L, 100L)), None)
    both(Seq(100L -> "train"), Seq(50L), Seq((50L, 100L)), None)
    both(Seq(7L -> "train"), Seq(101L, 300L), Seq((7L, 101L)),
      Some(Seq(5L, 7L, 100L)))
    // chain + pair + star with a mixed store and taints, all at once
    both(Seq(1L -> "test", 21L -> "validation", 22L -> "train"),
      (0L until 30L).toSeq,
      Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (20L, 22L)),
      Some(Seq(11L)))
  }

  test("canonical docs: best score wins, ties break to the smaller id") {
    val d = Seq(
      (0L, "aaaa"), (1L, "aaaaaaaa"), (2L, "aaaaaa"),    // cluster 0: 1 wins
      (10L, "bbbb"), (11L, "bbbb"),                      // tie -> 10 wins
      (20L, "solo untouched doc")                        // no edges
    ).toDF("doc_id", "text")
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalDocs(d, edges, score = length(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      0L -> ((1L, 8L, 3L)),    // longest member of {0,1,2}
      10L -> ((10L, 4L, 2L)))) // equal lengths -> smaller id
    // repartitioning cannot change the argmax (struct-max is order-free)
    val again = Dedup.canonicalDocs(d.repartition(7), edges,
        score = length(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(again == got)
    // a fractional score must fail fast, not silently floor (2.9 and
    // 2.1 would tie and flip the argmax to the id tiebreak)
    intercept[IllegalArgumentException] {
      Dedup.canonicalDocs(d, edges, score = length(col("text")) / 2.0)
    }
  }

  test("contamination fraction: exact distinct-gram counts, zero rows " +
    "kept, short docs report n_grams 0") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),      // eval: 2 grams
      (10L, "x alpha beta gamma delta epsilon zeta y"), // 4 grams, 2 dirty
      (11L, "alpha beta gamma delta epsilon"),          // 1 gram, 1 dirty
      (12L, "totally unrelated content with no overlap at all"), // clean
      (13L, "too short")                                 // < 5 tokens
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationFraction(
        docs.filter(col("doc_id") >= 10), docs.filter(col("doc_id") < 10),
        k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      10L -> ((4L, 2L)), 11L -> ((1L, 1L)),
      12L -> ((4L, 0L)), 13L -> ((0L, 0L))))
    // the boolean overlap view agrees with decontaminate's doc set
    val dirty = got.filter(_._2._2 > 0).keySet
    val decon = Dedup.decontaminate(docs.filter(col("doc_id") >= 10),
        docs.filter(col("doc_id") < 10), k = 5)
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(dirty == decon)
  }

  test("contamination spans: chained runs, single-gram islands, the " +
    "minRun filter, multi-diagonal repeats, partitioning invariance") {
    val docs = Seq(
      // eval 0: 8 tokens -> train 10 shares tokens c..h = a 6-token run
      (0L, "c d e f g h q r"),
      // eval 1: shares exactly ONE 5-gram with train 11
      (1L, "v w x y z unrelated tail words"),
      (10L, "a b c d e f g h i j"),
      (11L, "v w x y z completely different ending"),
      (12L, "no shared content in this document at all"),
      // train 13 contains eval 0's run TWICE -> two diagonals
      (13L, "c d e f g h pad pad c d e f g h")
    ).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") >= 10)
    val eval = docs.filter(col("doc_id") < 10)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // default minRun (= k): every sharing pair, incl. the 1-gram island
    val all = collect(Dedup.contaminationSpans(train, eval, k = 5))
    assert(all == Map(
      (10L, 0L) -> ((6L, 1L, 2L)),   // run c..h: starts {0,1} chained
      (11L, 1L) -> ((5L, 1L, 1L)),   // single gram v..z
      (13L, 0L) -> ((6L, 2L, 4L)))) // the run on two diagonals
    // minRun 6 drops the single-gram pair — the q193 law
    val filtered = collect(
      Dedup.contaminationSpans(train, eval, k = 5, minRunTokens = 6))
    assert(filtered == all - ((11L, 1L)))
    // partitioning cannot change any count
    val re = collect(Dedup.contaminationSpans(
      train.repartition(7), eval.repartition(3), k = 5, minRunTokens = 6))
    assert(re == filtered)
  }

  test("dedup savings: per-slice drop counts and weights are exact") {
    val d = Seq(
      (0L, "a", 100L), (1L, "a", 50L), (2L, "a", 30L),  // cluster {0,1,2}
      (10L, "b", 20L), (11L, "b", 25L),                 // cluster {10,11}
      (20L, "a", 7L), (21L, "b", 9L)                    // singletons
    ).toDF("doc_id", "src", "w")
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.dedupSavings(d, edges, slice = col("src"),
        weight = col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // keep-min-id drops 1,2 (cluster 0) and 11 (cluster 10)
    assert(got == Map(
      "a" -> ((4L, 2L, 187L, 80L)),
      "b" -> ((3L, 1L, 54L, 25L))))
    // no edges: nothing dropped, totals intact
    val clean = Dedup.dedupSavings(d, edges.limit(0), col("src"), col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4)))
      .toMap
    assert(clean == Map("a" -> ((0L, 0L)), "b" -> ((0L, 0L))))
    // fractional weights must fail fast (silent floor skews the sums)
    intercept[IllegalArgumentException] {
      Dedup.dedupSavings(d, edges, col("src"), col("w") * 1.5)
    }
  }

  test("cluster size histogram: sizes from components plus the " +
    "singleton mass") {
    val d = (0L until 10L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    // one 3-cluster {0,1,2}, one 2-cluster {5,6} -> 5 singletons
    val edges = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.clusterSizeHistogram(d, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 5L))
    // no edges at all: every doc is a singleton
    val none = Dedup.clusterSizeHistogram(d, edges.limit(0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(none == Map(1L -> 10L))
    // an edge list WIDER than the doc slice (global pairs vs a filtered
    // corpus) must not corrupt the singleton mass: sizes are measured
    // within docs, and a cluster sliced down to one member merges into
    // the size-1 row instead of duplicating the key
    val sliced = Dedup.clusterSizeHistogram(d.filter(col("doc_id") <= 5),
        edges) // {0,1,2} intact, {5,6} loses 6 -> 5 becomes a singleton
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sliced == Map(3L -> 1L, 1L -> 3L)) // docs 3,4 + sliced 5
  }

  test("ngram diversity: exact totals and distinct counts per slice") {
    val d = Seq(
      (0L, "en", "a b a b"),      // 4 toks: uni 4/2, bi 3/2 (ab,ba,ab), tri 2/2
      (1L, "en", "a b"),          // +2 toks: uni distinct stays {a,b}; bi +1 total
      (2L, "de", "x x x"),        // uni 3/1, bi 2/1, tri 1/1
      (3L, "de", null)            // null text: contributes nothing
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.ngramDiversity(d, slice = col("lang"),
        ns = Seq(1, 2, 3))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("en", 1) -> ((6L, 2L)), ("en", 2) -> ((4L, 2L)),
      ("en", 3) -> ((2L, 2L)),
      ("de", 1) -> ((3L, 1L)), ("de", 2) -> ((2L, 1L)),
      ("de", 3) -> ((1L, 1L))))
    // ns must be distinct and positive
    intercept[IllegalArgumentException] {
      TextAnalysis.ngramDiversity(d, col("lang"), Seq(2, 2))
    }
  }

  test("diversified top-k: per-group cap then global cut, deterministic") {
    val d = Seq(
      (0L, "en", 100L), (1L, "en", 90L), (2L, "en", 80L), (3L, "en", 70L),
      (10L, "de", 60L), (11L, "de", 50L), (12L, "de", 40L),
      (20L, "fr", 30L), (21L, "fr", 20L)
    ).toDF("doc_id", "lang", "n")
    def run(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.diversifiedTopK(df, col("lang"),
          Seq(col("n").desc, col("doc_id").asc), k = k, perGroup = 2)
        .collect().map(_.getLong(0)).toSet
    // cap drops en's 3rd/4th and de's 3rd before the global cut
    assert(run(d, 6) == Set(0L, 1L, 10L, 11L, 20L, 21L))
    // tighter k keeps the globally best capped rows only
    assert(run(d, 3) == Set(0L, 1L, 10L))
    assert(run(d.repartition(5), 3) == Set(0L, 1L, 10L))
    // reserved internal name refused
    intercept[IllegalArgumentException] {
      Sampling.diversifiedTopK(d.withColumnRenamed("n", "__rn"),
        col("lang"), Seq(col("doc_id")), k = 1, perGroup = 1)
    }
  }
}
