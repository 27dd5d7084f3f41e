package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Exact-arithmetic pins for the integer PageRank. */
class GraphRankSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side BigInt replay of the documented update rule. */
  private def ref(edges: Seq[(String, String)],
                  iters: Int): Map[String, BigInt] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = BigInt(nodes.size)
    val scale = BigInt("1000000000000")
    val base = scale / n
    val tp = base * 15 / 100
    val out = edges.groupBy(_._1).view.mapValues(es => BigInt(es.size)).toMap
    var r = nodes.map(_ -> base).toMap
    for (_ <- 0 until iters) {
      val inc = mutable.Map[String, BigInt]().withDefaultValue(BigInt(0))
      for ((s, d) <- edges) inc(d) += r(s) / out(s)
      r = nodes.map(nd => nd -> (tp + BigInt(85) * inc(nd) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int,
                  parts: Int = 1): Map[String, Long] =
    GraphRank.pageRank(
        edges.toDF("src", "dst").repartition(parts), iters)
      .collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank")).toMap

  test("matches the BigInt reference on cycle + hub + dangling graph") {
    // cycle a->b->c->a, hub pull d->a/e->a, dangling sink a->f (f has no
    // out-edges: its mass leaks, the documented variant), multi-edge d->a
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a",
      "e" -> "a", "a" -> "f", "d" -> "a")
    val expected = ref(edges, 4).map { case (k, v) => k -> v.toLong }
    assert(run(edges, 4) == expected)
    // the hub outranks the pure sources that feed it
    assert(expected("a") > expected("d") && expected("a") > expected("e"))
  }

  test("bfs: first-discovery levels, cycles keep min dist, horizon cuts off") {
    // line a->b->c->d plus a shortcut cycle c->a and an island x->y
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "c" -> "a",
      "x" -> "y").toDF("src", "dst")
    def bfs(hops: Int, seeds: Seq[String], parts: Int = 1) =
      GraphRank.bfsDistances(edges.repartition(parts), seeds, hops)
        .collect().map(r => r.getAs[String]("node") ->
          r.getAs[Int]("dist")).toMap
    assert(bfs(2, Seq("a")) == Map("a" -> 0, "b" -> 1, "c" -> 2))
    // the cycle edge back to the seed must not overwrite dist 0
    assert(bfs(3, Seq("a")) == Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 3))
    // multiple seeds take the closer one; islands stay separate
    assert(bfs(1, Seq("a", "x")) ==
      Map("a" -> 0, "x" -> 0, "b" -> 1, "y" -> 1))
    assert(bfs(0, Seq("a")) == Map("a" -> 0))
    assert(bfs(3, Seq("a"), parts = 7) == bfs(3, Seq("a")))
  }

  test("hits: BigInt reference replay; pure sources/sinks score one-sided") {
    // bipartite-ish: h1 links to both authorities, h2 to one; plus a
    // chain node that is both hub and authority
    val edges = Seq("h1" -> "a1", "h1" -> "a2", "h2" -> "a1", "a1" -> "a2")
    val scale = BigInt("1000000000000")
    // driver replay of the documented half-steps
    def replay(iters: Int): (Map[String, BigInt], Map[String, BigInt]) = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var hub = nodes.map(_ -> scale).toMap
      var auth = Map.empty[String, BigInt]
      def rescale(m: Map[String, BigInt]) = {
        val mx = m.values.max
        m.map { case (k, v) => k -> v * scale / mx }
      }
      for (_ <- 1 to iters) {
        auth = rescale(edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map(e => hub(e._1)).sum })
        hub = rescale(edges.groupBy(_._1).map { case (u, es) =>
          u -> es.map(e => auth(e._2)).sum })
      }
      (hub, auth)
    }
    val (hubRef, authRef) = replay(3)
    val got = GraphRank.hits(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getAs[String]("node") ->
        (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
    for (n <- got.keys) {
      assert(got(n)._1 == hubRef.getOrElse(n, BigInt(0)).toLong, s"hub $n")
      assert(got(n)._2 == authRef.getOrElse(n, BigInt(0)).toLong, s"auth $n")
    }
    // pure sink a2 has hub 0; pure sources h1/h2 have auth 0
    assert(got("a2")._1 == 0L && got("h1")._2 == 0L && got("h2")._2 == 0L)
    // h1 (links to everything) is the top hub
    assert(got("h1")._1 > got("h2")._1)
  }

  test("hits rescaleEvery: scheduled-rescale BigInt replay, last step pinned") {
    val edges = Seq("h1" -> "a1", "h1" -> "a2", "h2" -> "a1", "a1" -> "a2",
      "h2" -> "a2", "a2" -> "a1")
    val scale = BigInt("1000000000000")
    // driver replay with the documented schedule: iteration i of a score
    // type rescales when i % k == 0 or i == iters; raw sums carry over
    def replay(iters: Int, k: Int): (Map[String, BigInt], Map[String, BigInt]) = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      var hub = nodes.map(_ -> scale).toMap
      var auth = Map.empty[String, BigInt]
      def rescale(m: Map[String, BigInt]) = {
        val mx = m.values.max
        m.map { case (n, v) => n -> v * scale / mx }
      }
      for (i <- 1 to iters) {
        val doR = i % k == 0 || i == iters
        auth = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map(e => hub(e._1)).sum }
        if (doR) auth = rescale(auth)
        hub = edges.groupBy(_._1).map { case (u, es) =>
          u -> es.map(e => auth(e._2)).sum }
        if (doR) hub = rescale(hub)
      }
      (hub, auth)
    }
    for ((iters, k) <- Seq((3, 2), (4, 3), (2, 5))) {
      val (hubRef, authRef) = replay(iters, k)
      val got = GraphRank.hits(edges.toDF("src", "dst").repartition(5),
          iters = iters, rescaleEvery = k)
        .collect().map(r => r.getAs[String]("node") ->
          (r.getAs[Long]("hub"), r.getAs[Long]("auth"))).toMap
      for (n <- got.keys) {
        assert(got(n)._1 == hubRef.getOrElse(n, BigInt(0)).toLong,
          s"hub $n iters=$iters k=$k")
        assert(got(n)._2 == authRef.getOrElse(n, BigInt(0)).toLong,
          s"auth $n iters=$iters k=$k")
      }
      // the forced final rescale pins outputs to the [0, scale] grid
      assert(got.values.map(_._1).max == scale.toLong)
      assert(got.values.map(_._2).max == scale.toLong)
    }
  }

  test("iters=0 is the uniform start; partitioning never changes a rank") {
    val edges = Seq("x" -> "y", "y" -> "z", "z" -> "x", "x" -> "z")
    val r0 = run(edges, 0)
    assert(r0.values.toSet == Set(1000000000000L / 3))
    assert(run(edges, 3, parts = 7) == run(edges, 3))
  }

  test("checkpointEvery never changes a rank; iters=50 completes bounded") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "d" -> "a",
      "e" -> "a", "a" -> "f", "d" -> "a")
    def run(iters: Int, every: Int): Map[String, Long] =
      GraphRank.pageRank(edges.toDF("src", "dst"), iters,
          checkpointEvery = every)
        .collect()
        .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank")).toMap
    // checkpointing is value-invariant (it only truncates lineage)
    assert(run(8, 3) == run(8, 0))
    // a long run with bounded lineage completes and matches the replay
    val expected = ref(edges, 50).map { case (k, v) => k -> v.toLong }
    assert(run(50, 5) == expected)
  }

  test("onPersist hands back every cached frame and cleanup unpersists") {
    val edges = Seq("h1" -> "a1", "h1" -> "a2", "h2" -> "a1", "a1" -> "a2")
      .toDF("src", "dst")
    val tracked = mutable.Buffer[org.apache.spark.sql.DataFrame]()
    val base = GraphRank.hits(edges, iters = 2).collect().toSet
    spark.sharedState.cacheManager.clearCache()
    val got = GraphRank.hits(edges, iters = 2, onPersist = tracked += _)
      .collect().toSet
    assert(got == base)
    // edges (by src AND the dst-partitioned copy the hub half-step
    // joins) + nodes + the final iteration's two half-step caches
    // (earlier iterations' caches unpersist in-loop)
    assert(tracked.size == 5)
    tracked.foreach(_.unpersist(blocking = true))
    val bfsTracked = mutable.Buffer[org.apache.spark.sql.DataFrame]()
    GraphRank.bfsDistances(edges, Seq("h1"), hops = 2,
      onPersist = bfsTracked += _).collect()
    assert(bfsTracked.size == 4) // edges + level0 + 2 levels
    bfsTracked.foreach(_.unpersist(blocking = true))
  }

  test("triangles: brute-force equality, loops/dupes/direction ignored") {
    def tri(edges: Seq[(String, String)], parts: Int = 4) = {
      val df = edges.toDF("src", "dst").repartition(parts)
      GraphRank.triangleCounts(df).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // K4 on a-d (every node in C(3,2)=3 triangles), one pendant hung
    // off a, a triangle-free square w-x-y-z, a self loop and duplicate/
    // reversed edges that must not change anything
    val k4 = for {
      Seq(u, v) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (u, v)
    val edges = k4 ++ Seq(("a", "pend"),
      ("w", "x"), ("x", "y"), ("y", "z"), ("z", "w"),
      ("c", "c"), ("b", "a"), ("a", "b"), ("d", "c"))
    val got = tri(edges)
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    assert(tri(edges, parts = 9) == got)
    // brute force on a denser pseudo-random graph: i—j iff (i*31 + j*17)
    // % 5 == 0 over 40 nodes
    val rnd = for {
      i <- 0 until 40; j <- i + 1 until 40
      if (i * 31 + j * 17) % 5 == 0
    } yield (s"n$i", s"n$j")
    val es = rnd.toSet
    def has(u: String, v: String) =
      es.contains((u, v)) || es.contains((v, u))
    val nodes = rnd.flatMap(e => Seq(e._1, e._2)).distinct
    val brute = nodes.map { n =>
      n -> (for {
        Seq(u, v) <- nodes.filter(m => m != n && has(n, m))
          .combinations(2).toSeq
        if has(u, v)
      } yield 1).size.toLong
    }.filter(_._2 > 0).toMap
    assert(brute.nonEmpty && tri(rnd) == brute)
  }
}
