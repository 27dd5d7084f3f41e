package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in EXACT integer arithmetic.
  *
  * Ranks live on an integer grid (`scale` = 1e12 by default): the
  * uniform start is `scale div n`, each node's per-edge contribution is
  * `rank div outdeg`, and the damped update is
  * `teleport + (dampNum * incoming) div dampDen` with
  * `teleport = ((scale div n) * (dampDen - dampNum)) div dampDen`.
  * Every step is integer add/multiply/floor-divide over positive values,
  * so the result is bit-identical across engines and partitionings
  * (sums of longs are order-independent) — a float PageRank would
  * disagree in the last ulps between engines and even between runs.
  * The flooring loses at most 1 grid unit per node per step (~1e-12 of
  * total mass) — far below any ranking-relevant difference.
  *
  * Semantics: multi-edges weight their target (pass `.distinct()` edges
  * for a simple graph); mass arriving at a dangling node (no out-edges)
  * leaves the system rather than teleporting — the documented "leaked"
  * variant, exact and iteration-count-stable, which keeps the update
  * free of a global dangling-mass term.
  *
  * Scale shape: the edge table is augmented with out-degrees ONCE,
  * repartitioned by source, and PERSISTED (memory-and-disk) — without
  * that, the unrolled lineage recomputes the edge build every
  * iteration; with it, each iteration reads the cached partitions and
  * shuffles only the rank table (|nodes| rows of (node, long)). The
  * node list is persisted for the same reason (it anchors every
  * iteration's left join and the uniform start). Every frame this
  * call persists is reported through `onPersist` — a caller that runs
  * many graphs in one session collects them and unpersists after
  * consuming the result (the default callback keeps the old
  * fire-and-forget behavior). `iters` is expected to be small (4-20);
  * for larger iteration counts pass `checkpointEvery > 0` to
  * localCheckpoint the rank table every that-many iterations — lineage
  * stays bounded and values are bit-identical (the checkpoint only
  * materializes, never re-orders, integer arithmetic).
  */
object GraphRank {

  def pageRank(edges: DataFrame, iters: Int,
               src: Column = col("src"), dst: Column = col("dst"),
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 0,
               onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(iters >= 0, s"iters=$iters")
    require(0 < dampNum && dampNum <= dampDen, s"$dampNum/$dampDen")
    require(checkpointEvery >= 0, s"checkpointEvery=$checkpointEvery")
    val e = edges.select(src.as("src"), dst.as("dst"))
    import org.apache.spark.storage.StorageLevel
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(nodes)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // degree-augmented edges: built once, partitioned by the join key,
    // and cached so the unrolled iterations reshuffle only ranks and
    // never recompute the edge build
    val eDeg = e.join(outdeg, Seq("src")).repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(eDeg)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = scale / n
    val teleport = base * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("rank", lit(base))
    for (i <- 1 to iters) {
      val incoming = ranks
        .join(eDeg, ranks("node") === eDeg("src"))
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("inc"))
      ranks = nodes.join(incoming, Seq("node"), "left")
        .withColumn("rank",
          lit(teleport) +
            expr(s"$dampNum * coalesce(inc, 0L) div $dampDen"))
        .select(col("node"), col("rank"))
      // residency note: each localCheckpoint materializes the rank RDD
      // to MEMORY_AND_DISK; a SUPERSEDED checkpoint's blocks are freed
      // by Spark's ContextCleaner once the old frame is unreferenced
      // (GC-driven, not immediate), so a long run can transiently hold
      // a few node-sized tables beyond the live one. That is bounded
      // metadata at graph-node scale; callers needing deterministic
      // release should raise checkpointEvery rather than rely on GC
      // timing.
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** HITS hubs & authorities, fixed iterations in EXACT integer
    * arithmetic. The classical normalization (divide by the L2 norm)
    * is libm territory; the integer-portable equivalent used here
    * rescales by the MAXIMUM score: `score * scale div max(score)` —
    * same ranking, values pinned to [0, scale], and every operation is
    * an order-independent integer sum, multiply, or floor-divide, so
    * results replay bit-for-bit in SQL. Nodes with no role in a step
    * score 0 (a pure source has authority 0, a pure sink has hub 0).
    *
    * Update per iteration (directed edges u -> v):
    *   auth'(v) = sum of hub(u) over in-edges;
    *   hub'(u)  = sum of auth'(v) over out-edges;
    * each rescaled on its scheduled iterations (below).
    *
    * `rescaleEvery`: iteration `i` of a score type rescales when
    * `i % rescaleEvery == 0` or `i == iters` (so outputs always sit on
    * the [0, scale] grid); between rescales the raw sums carry forward
    * as decimal(38,0). Each rescale costs one driver collect (the max)
    * and one persist, so `rescaleEvery = k` divides both by ~k — the
    * un-rescaled half-steps fuse into the next rescale's job. The
    * trade: raw scores grow by a degree factor per un-rescaled
    * half-step, and the rescale numerator `score * scale` must fit
    * decimal(38,0) — safe while `scale^2 * (product of max degrees
    * across the <= 2*rescaleEvery - 1 un-rescaled half-steps) < 1e38`,
    * e.g. at the default scale a degree bound of ~4e4 for
    * `rescaleEvery = 2`. Overflow is LOUD under ANSI, never silent.
    * Values differ from `rescaleEvery = 1` (flooring happens at
    * different points) but the schedule is part of the operator's
    * deterministic contract and replays exactly in SQL.
    *
    * Scale shape: like [[pageRank]] — the edge table is persisted once
    * and each half-step shuffles only a node-sized score table; the
    * per-rescale max is one row of driver metadata (see the comment in
    * the body for why the driver-free variants measured slower). */
  def hits(edges: DataFrame, iters: Int,
           src: Column = col("src"), dst: Column = col("dst"),
           scale: Long = 1000000000000L,
           rescaleEvery: Int = 1,
           onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    require(rescaleEvery >= 1, s"rescaleEvery=$rescaleEvery")
    import org.apache.spark.storage.StorageLevel
    val e = edges.select(src.as("src"), dst.as("dst"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(e)
    // the hub half-step joins on dst — without a dst-partitioned copy
    // every rescale job re-exchanges the whole edge table by dst,
    // paying ~iters edge-sized shuffles the per-half-step contract
    // ("only a node-sized score table moves") forbids
    val eByDst = e.repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(eByDst)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(nodes)
    // sums and the rescale numerator run in decimal(38,0): a node of
    // in-degree d accumulates up to d * scale, which leaves long range
    // around d ~ 9e6 at the default scale.
    // Each half-step PERSISTS its raw sums and fetches the max as one
    // driver-side literal — bounded metadata (1 row), the same class as
    // pageRank's node count. Both driver-free alternatives were
    // measured and REJECTED: a broadcast max subquery without lineage
    // truncation embeds the whole previous chain in every half-step's
    // plan (2^iters blow-up, minutes at sf0.1), and broadcast +
    // per-half-step localCheckpoint runs 4x slower warm (6.5 s vs
    // 1.6 s at sf0.1) because it schedules two jobs per half-step plus
    // checkpoint block I/O where the collect schedules exactly one job
    // that both materializes the cache and returns the scalar. The
    // iteration is inherently job-sequential either way; the 1-row
    // collect adds no extra pass over data.
    // Returns (rescaled projection, the raw cache behind it): a
    // half-step's cache is consumed by the NEXT iteration's collects,
    // so each iteration unpersists the previous one's pair in-loop and
    // only the final pair — which the returned plan still reads —
    // survives, handed to `onPersist` for the caller to free.
    def rescaled(scores: DataFrame): (DataFrame, DataFrame) = {
      val s = scores.persist(StorageLevel.MEMORY_AND_DISK)
      val mxRow = s.agg(max("score")).collect()(0)
      if (mxRow.isNullAt(0)) (s, s)
      else {
        val mx = mxRow.get(0).toString
        (s.select(col("node"),
          expr(s"CAST(CAST(score AS DECIMAL(38,0)) * ${scale}L" +
            s" div CAST('$mx' AS DECIMAL(38,0)) AS BIGINT)").as("score")), s)
      }
    }
    def sumDec = sum(col("score").cast("decimal(38,0)")).as("score")
    var hub = nodes.withColumn("score", lit(scale))
    var auth: DataFrame = null
    var prevRaws = List.empty[DataFrame]
    for (i <- 1 to iters) {
      // skipped iterations carry the raw decimal sums forward unpersisted
      // — they fuse into the next rescale's single materializing job
      val doRescale = i % rescaleEvery == 0 || i == iters
      val aSum = hub
        .join(e, hub("node") === e("src"))
        .groupBy(col("dst").as("node")).agg(sumDec)
      val hSum0 = (a: DataFrame) => a
        .join(eByDst, a("node") === eByDst("dst"))
        .groupBy(col("src").as("node")).agg(sumDec)
      if (doRescale) {
        val (a, aRaw) = rescaled(aSum)
        auth = a
        val (h, hRaw) = rescaled(hSum0(auth))
        hub = h
        prevRaws.foreach(_.unpersist())
        prevRaws = List(aRaw, hRaw)
      } else {
        auth = aSum
        hub = hSum0(auth)
      }
    }
    prevRaws.foreach(onPersist)
    nodes
      .join(hub.select(col("node"), col("score").as("hub")), Seq("node"), "left")
      .join(auth.select(col("node"), col("score").as("auth")), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
  }

  /** Bounded-hop BFS: the minimum hop count from any seed to every node
    * within `hops` hops (nodes farther away are absent). Deterministic
    * by construction — a node's distance is the level of its first
    * discovery, which no partitioning or evaluation order can change.
    *
    * Scale shape: textbook frontier BFS. Edges are persisted once;
    * each level joins only the CURRENT frontier against them, anti-joins
    * away already-visited nodes, and persists the (node-sized) frontier
    * and visited tables so the unrolled lineage stays linear in `hops`
    * — without those persists every level would recompute the whole
    * cascade below it. The expensive side (edges) never moves after its
    * one repartition. */
  /** Per-node triangle counts on an undirected simple graph — the input
    * to clustering coefficients and community-density measures.
    *
    * Classic degree-ordered orientation (the MapReduce triangle-count
    * of Suri & Vassilvitskii 2011): canonicalize edges to (min, max),
    * orient each from its (degree, node)-smaller endpoint to the
    * larger, enumerate wedges only from each node's OUT-neighbors, and
    * close them with one equi-join back to the oriented edges. The
    * orientation bounds every out-degree by O(sqrt(m)), so the wedge
    * stage — the op's only super-linear term — is
    * sum(outdeg²) <= O(m^1.5) instead of the unbounded sum(deg²) a hub
    * would produce; each triangle is found exactly once (its
    * rank-lowest vertex enumerates the wedge). All joins are hash
    * equi-joins on node keys; counts are exact integers, so the result
    * is engine-portable bit-for-bit.
    */
  def triangleCounts(edges: DataFrame, src: Column = col("src"),
                     dst: Column = col("dst"),
                     onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    val e = edges
      .select(least(src, dst).as("a"), greatest(src, dst).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val ranked = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val ra = struct(col("da").as("d"), col("a").as("n"))
    val rb = struct(col("db").as("d"), col("b").as("n"))
    // u = rank-smaller endpoint (plain node); rv = (deg, node) rank
    // struct of the larger one — carried whole so the wedge stage can
    // order out-neighbors without re-joining degrees
    val o = ranked.select(
      when(ra < rb, col("a")).otherwise(col("b")).as("u"),
      when(ra < rb, rb).otherwise(ra).as("rv"))
    // persisted once: three consumers (both wedge sides + the closing
    // join) would otherwise rebuild edges+degrees three times; reported
    // through onPersist like every other persist in this file, so a
    // caller looping over graphs can free it
    val oc = o.cache()
    onPersist(oc)
    val wedges = oc.alias("x").join(oc.alias("y"),
        col("x.u") === col("y.u") && col("x.rv") < col("y.rv"))
      .select(col("x.u").as("u"), col("x.rv.n").as("p"),
        col("y.rv.n").as("q"))
    val tri = wedges.join(oc.select(col("u").as("p"), col("rv.n").as("q")),
      Seq("p", "q"))
    tri.select(explode(array(col("u"), col("p"), col("q"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Bounded-round weighted shortest paths (min-plus Bellman–Ford /
    * SPFA): exact minimum path WEIGHT from the seed set within
    * `rounds` relaxations — [[bfsDistances]]' weighted sibling, for
    * "how strongly connected, not just how many hops" questions over
    * integer edge weights. Frontier-restricted relaxation is exact: a
    * node whose distance did not improve last round already
    * contributed its relaxations when it last improved (the standard
    * SPFA argument), so each round joins only the improved set against
    * the edge table and min-combines into the node-sized `best` —
    * per-round shuffles are frontier- and node-sized, edges are
    * partitioned and persisted once. All-long arithmetic, so distances
    * replay exactly in SQL. */
  def weightedDistances(edges: DataFrame, seeds: Seq[Long], rounds: Int,
                        src: Column = col("src"), dst: Column = col("dst"),
                        weight: Column = col("w"),
                        onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(rounds >= 0 && seeds.nonEmpty, s"rounds=$rounds seeds=$seeds")
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(src.cast("long").as("src"),
        dst.cast("long").as("dst"), weight.cast("long").as("w"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(e)
    val dist0 = seeds.distinct.toDF("node").withColumn("dist", lit(0L))
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(dist0)
    // Unlike bfsDistances (whose levels all feed the result union),
    // each round's merged table SUPERSEDES the previous one — so the
    // loop materializes the new state (one count per round, the same
    // bounded action shape as the graph ops' rescale collects) and
    // releases the superseded caches in-loop; only the edge table and
    // the final state stay resident.
    var best = dist0
    var frontier = dist0
    var round = 0
    var converged = false
    // fixed-point probe state: distances only ever DECREASE and nodes
    // only ever ADD, so the merged state is unchanged — i.e. the round
    // improved nothing — iff its (row count, dist sum) pair is
    // unchanged. Tracking that pair from the SAME aggregate action that
    // materializes the merged cache halves the per-round action count
    // (the old shape ran merged.count() and then improved.count();
    // measured on q146: the per-round scheduling, not the node-sized
    // data, was the cost — 23 warm jobs). Sums of long distances stay
    // exact in decimal(38).
    def stateProbe(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(col("dist").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    // dist0 is the seed list with dist = 0 — its probe is known on the
    // driver, no action needed
    var probe = (seeds.distinct.size.toLong,
      java.math.BigDecimal.ZERO.setScale(0))
    while (round < rounds && !converged) {
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("d"))
        .groupBy("node").agg(min("d").as("d"))
      val improved = cand.join(best, Seq("node"), "left")
        .filter(col("dist").isNull || col("d") < col("dist"))
        .select(col("node"), col("d").as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      onPersist(improved)
      val merged = best.unionByName(improved)
        .groupBy("node").agg(min("dist").as("dist"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      onPersist(merged)
      // ONE action materializes the merged cache AND reads the
      // fixed-point probe; an unchanged (count, sum) is the empty
      // improved set — no later round can relax anything, so stop.
      val next = stateProbe(merged)
      // compareTo, not equals: BigDecimal.equals is scale-sensitive
      converged = next._1 == probe._1 && next._2.compareTo(probe._2) == 0
      probe = next
      val prevBest = best
      val prevFrontier = frontier
      best = merged
      frontier = improved
      prevBest.unpersist()
      if (prevFrontier ne prevBest) prevFrontier.unpersist()
      round += 1
    }
    // the last round's improved-frontier cache is superseded too — only
    // the edge table and the final state may stay resident
    if (frontier ne best) frontier.unpersist()
    best
  }

  def bfsDistances(edges: DataFrame, seeds: Seq[String], hops: Int,
                   src: Column = col("src"),
                   dst: Column = col("dst"),
                   onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(hops >= 0, s"hops=$hops")
    import org.apache.spark.storage.StorageLevel
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(src.as("src"), dst.as("dst"))
      .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(e)
    // Only each LEVEL is persisted; the cumulative `known` is a plain
    // union of the cached levels, so no row is ever cached twice and
    // lineage stays linear without re-persisting the growing prefix.
    // All levels stay referenced by the result union, so none is
    // superseded — they are all reported to `onPersist` for the caller
    // to free after consuming the result.
    val level0 = seeds.distinct.toDF("node").withColumn("dist", lit(0))
      .persist(StorageLevel.MEMORY_AND_DISK)
    onPersist(level0)
    var known = level0
    var frontier = level0.select("node")
    for (h <- 1 to hops) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(known.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h))
        .persist(StorageLevel.MEMORY_AND_DISK)
      onPersist(next)
      known = known.union(next)
      frontier = next.select("node")
    }
    known
  }
}
