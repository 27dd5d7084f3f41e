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
}
