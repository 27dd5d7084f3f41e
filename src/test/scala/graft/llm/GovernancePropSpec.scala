package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the round-9 governance/analytics operators: each
  * drives a ScalaCheck-generated batch through ONE Spark job and
  * compares against a straightforward driver-side reference
  * implementation — the [[graft.expr.ClinicalColsPropSpec]] discipline.
  * These pin the operators' laws over adversarial shapes (dense ties,
  * chain/star components, touching/nested/inverted intervals, empty and
  * null texts) that hand-written fixtures undersample. */
class GovernancePropSpec extends SparkSpec {

  import spark.implicits._

  private def bucket(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 7), 16) % 100
  }
  private def law(key: Long): String = {
    val b = bucket(key.toString)
    if (b < 80) "train" else if (b < 90) "validation" else "test"
  }

  test("leakSafeSplit law on random edge sets: cluster = min reachable, " +
    "split = md5 law of the cluster") {
    val n = 80L
    // b = a + delta mod n keeps the generator total (no filter retries)
    val genEdges = Gen.listOfN(40,
      for { a <- Gen.choose(0L, n - 1); d <- Gen.choose(1L, n - 1) }
        yield (a, (a + d) % n))
    val edges = genEdges.sample.get
    // driver union-find reference
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val expected = (0L until n).map { i =>
      val c = if (parent.contains(i)) find(i) else i
      i -> ((c, law(c)))
    }.toMap
    val got = Dedup.leakSafeSplit(
        (0L until n).toDF("doc_id"), edges.toDF("id_a", "id_b"),
        cuts = Seq("train" -> 80, "validation" -> 90), lastSplit = "test")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got == expected)
  }

  test("rankTransform on dense ties and Long extremes equals the SQL " +
    "rank window") {
    val genRow = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.oneOf(Gen.choose(-5L, 5L), // dense ties
        Gen.oneOf(Long.MinValue, Long.MaxValue, 0L)) // bucket-math stress
    } yield (g, v)
    val rows = Gen.listOfN(300, genRow).sample.get.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    // reference: SQL rank() = 1 + count of strictly-smaller values in
    // the group; n_group = group size
    val byGroup = rows.groupBy(_._2)
    val expected = rows.map { case (i, g, v) =>
      val vs = byGroup(g).map(_._3)
      i -> ((vs.count(_ < v) + 1L, vs.size.toLong))
    }.toMap
    val got = graft.operators.EventAnalytics.rankTransform(
        rows.toDF("id", "g", "v"), col("g"), col("v"), buckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == expected)
  }

  test("intervalCoverage on touching/nested/inverted intervals equals " +
    "the driver sweep") {
    val genIv = for {
      k <- Gen.oneOf("a", "b", "c", "d", "e")
      s <- Gen.choose(0L, 100L)
      len <- Gen.choose(-5L, 20L) // inverted and zero-length included
    } yield (k, s, s + len)
    val rows = Gen.listOfN(250, genIv).sample.get
    val valid = rows.filter { case (_, s, e) => e > s }
    val expected = valid.groupBy(_._1).map { case (k, ivs) =>
      val sorted = ivs.map(t => (t._2, t._3)).sorted
      var covered = 0L; var islands = 0L; var maxEnd = Long.MinValue
      sorted.foreach { case (s, e) =>
        if (maxEnd == Long.MinValue || s > maxEnd) islands += 1
        covered += math.max(0L, e - math.max(s, if (maxEnd == Long.MinValue) s else maxEnd))
        maxEnd = math.max(maxEnd, e)
      }
      k -> ((covered, islands, ivs.size.toLong))
    }
    val got = graft.operators.EventAnalytics.intervalCoverage(
        rows.toDF("k0", "s0", "e0"), col("k0"), col("s0"), col("e0"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("ngramDiversity on random short texts equals driver counts " +
    "(empty strings and nulls included)") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val genDoc = for {
      lang <- Gen.oneOf("en", "de")
      len <- Gen.choose(0, 8)
      toks <- Gen.listOfN(len, word)
    } yield (lang, if (toks.isEmpty) "" else toks.mkString(" "))
    val docs = Gen.listOfN(120, genDoc).sample.get.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) } ++
      Seq((9000L, "en", null: String)) // null text contributes nothing
    val ns = Seq(1, 2, 3)
    // reference mirrors the engine tokenization: split on single
    // spaces, "" tokenizes to one empty token (the collapse-form law)
    def toks(t: String): Array[String] =
      if (t == null) null else t.split(" ", -1)
    val expected = (for {
      lang <- Seq("en", "de"); n <- ns
    } yield {
      val ts = docs.filter(d => d._2 == lang && d._3 != null)
        .map(d => toks(d._3))
      val total = ts.map(a => math.max(0, a.length - n + 1).toLong).sum
      val distinct = ts.flatMap(a =>
        a.sliding(n).filter(_.size == n).map(_.mkString(" "))).toSet.size
      (lang, n) -> ((total, distinct.toLong))
    }).toMap
    val got = TextAnalysis.ngramDiversity(
        docs.toDF("doc_id", "lang", "text"), col("lang"), ns)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }

  test("scrubSpansKeepFirst on random corpora equals the per-window driver law") {
    // tiny alphabet + short docs force heavy window collisions: within-doc
    // repeats, cross-doc chains, and overlapping first/non-first windows —
    // the shapes the hand fixtures undersample
    val k = 3
    val genDoc = for {
      len <- Gen.choose(0, 12)
      ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield ts.mkString(" ")
    val docs = (0L until 60L).map(i => (i, genDoc.sample.get))
    // driver reference: first occurrence per duplicated window = min
    // (doc_id, pos); a token scrubs iff ANY non-first occurrence covers it
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      p <- 0 to ts.length - k
    } yield (ts.slice(p, p + k).mkString(" "), id, p)
    val covered = scala.collection.mutable.Set.empty[(Long, Int)]
    occ.groupBy(_._1).values.foreach { os =>
      if (os.size >= 2)
        os.sortBy(o => (o._2, o._3)).drop(1).foreach { case (_, id, p) =>
          (p until p + k).foreach(j => covered += ((id, j))) }
    }
    val expected = toks.map { case (id, ts) =>
      val kept = ts.zipWithIndex.collect {
        case (tok, j) if !covered((id, j)) => tok }
      id -> ((ts.length, kept.length, kept.mkString(" ")))
    }
    val got = Dedup.scrubSpansKeepFirst(docs.toDF("doc_id", "text"), k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got == expected)
  }

  test("winnowMatches on random corpora equals the driver match law over " +
    "the engine's own fingerprints") {
    val genDoc = for {
      len <- Gen.choose(0, 10)
      ts <- Gen.listOfN(len, Gen.oneOf("u", "v", "w", "x"))
    } yield ts.mkString(" ")
    val docs = (0L until 40L).map(i => (i, genDoc.sample.get))
    val fpsDf = TextAnalysis.winnowFingerprints(
      docs.toDF("doc_id", "text"), k = 2, w = 3)
    val fps = fpsDf.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("fp")))
    val (topK, maxDf) = (3, 4)
    val cp = fps.toSet
    val dfs = cp.groupBy(_._2).collect {
      case (fp, os) if os.size <= maxDf => fp }.toSet
    val queryIds = (0L until 8L).toSet
    val qp = cp.filter(p => queryIds(p._1))
    val qTotals = qp.groupBy(_._1).map { case (q, s) => q -> s.size.toLong }
    // qp/cp are Sets — materialize to Seq first or the yielded
    // (query, doc) pairs dedupe and shared counts collapse to 1
    val shared = (for {
      (qid, fp) <- qp.toSeq if dfs(fp)
      (cid, cfp) <- cp.toSeq if cfp == fp && cid != qid
    } yield (qid, cid)).groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val expected = shared.groupBy(_._1._1).flatMap { case (qid, m) =>
      m.toSeq.map { case ((_, cid), s) => (cid, s) }
        .sortBy { case (cid, s) => (-s, cid) }.take(topK).zipWithIndex
        .map { case ((cid, s), i) =>
          (qid, i + 1) -> ((cid, s, qTotals(qid),
            1000000000L * s / qTotals(qid))) }
    }
    val got = TextAnalysis.winnowMatches(fpsDf,
        fpsDf.filter(col("doc_id") < 8), topK = topK, maxDf = maxDf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("doc_id"), r.getAs[Long]("shared"),
          r.getAs[Long]("q_prints"), r.getAs[Long]("coverage_scaled"))))
      .toMap
    assert(got == expected)
  }
}
