package graft.operators

import graft.SparkSpec
import graft.llm.{Sketches, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min sketch, PMI collocations, co-occurrence similarity, daily
  * trend, skyline, vocabulary build/encode — each pinned against an
  * independent reference (brute force, a hand replay, or a
  * single-window global form). */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ count-min

  private def termDf(words: Seq[String]): DataFrame = words.toDF("w")

  test("count-min: never undercounts, exact when collision-free") {
    val words = Seq.fill(40)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val items = termDf(new scala.util.Random(7).shuffle(words))
    val exact = words.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    // tight width forces collisions -> estimates are upper bounds
    val tight = Sketches.countMinEstimate(items, Sketches.countMinBuild(
      items, $"w", depth = 2, width = 4), $"w", depth = 2, width = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (w, c) => assert(tight(w) >= c, w) }
    // 3 distinct terms on a 4096-wide grid: collision probability ~0 for
    // this fixed md5 family (verified by the equality itself)
    val wide = Sketches.countMinEstimate(items, Sketches.countMinBuild(
      items, $"w", width = 4096), $"w", width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == exact)
  }

  test("count-min: sketches merge by adding cells") {
    val a = termDf(Seq("x", "y", "x", "z"))
    val b = termDf(Seq("y", "y", "w"))
    val merged = Sketches.countMinBuild(a, $"w", depth = 2, width = 8)
      .unionAll(Sketches.countMinBuild(b, $"w", depth = 2, width = 8))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val direct = Sketches.countMinBuild(a.unionAll(b), $"w",
      depth = 2, width = 8)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty)
  }

  // --------------------------------------------------------- collocations

  test("collocations: exact PMI surrogate, minCount floor, ordering") {
    // "of the" appears 3x; tokens: of=3, the=4, cat=2, a=1, N=13
    val docs = Seq(
      (1L, "of the cat of the"),
      (2L, "of the the cat a")).toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, minCount = 2L, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    // tokens: N=10; of=3, the=4, cat=2, a=1
    // pairs with count >= 2: (of,the)=3, (the,cat)=2
    // pmi(of,the)  = 3*1e6*10 div (3*4) = 2500000
    // pmi(the,cat) = 2*1e6*10 div (4*2) = 2500000
    // tie -> order (pmi desc, w1 asc): "of" < "the"
    assert(got.toSeq == Seq(
      ("of", "the", 3L, 2500000L),
      ("the", "cat", 2L, 2500000L)))
  }

  // ------------------------------------------------------- co-occurrence

  test("co-occurrence: exact cosine surrogate and wholesale basket cap") {
    val inc = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"),          // dup (1,a) collapses
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "b"), (3L, "c"),
      (9L, "a"), (9L, "b"), (9L, "c"), (9L, "d") // dropped: size 4 > cap 3
    ).toDF("basket", "item")
    val dropped = CoOccurrence.droppedBaskets(inc, $"basket", $"item", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dropped.toSeq == Seq((9L, 4L)))
    val got = CoOccurrence.cosineSimilarity(inc, $"basket", $"item",
        minPairs = 2L, maxBasket = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    // on retained baskets {1,2,3}: c_a=2, c_b=3, c_c=2
    // pairs: (a,b)=2, (b,c)=2, (a,c)=1 (below minPairs)
    // cos2(a,b) = 4*1e6 div 6 = 666666; cos2(b,c) = 4*1e6 div 6 = 666666
    assert(got == Set(("a", "b", 2L, 666666L), ("b", "c", 2L, 666666L)))
  }

  // --------------------------------------------------------- daily trend

  test("daily trend: exact OLS sums over the densified series") {
    val events = Seq(
      ("up", "2024-01-01", 1), ("up", "2024-01-03", 3),
      ("down", "2024-01-01", 3), ("down", "2024-01-02", 1)
    ).flatMap { case (g, d, n) => Seq.fill(n)((g, java.sql.Timestamp.valueOf(
      d + " 12:00:00"))) }.toDF("event_type", "ts")
    val got = graft.operators.EventAnalytics.dailyTrend(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // span = 3 days (x = 0,1,2), densified: up = (1,0,3), down = (3,1,0)
    // up:   n=3 Sy=4 Sx=3 Sxx=5 Sxy=6  -> num = 3*6-3*4  = 6,  den = 3*5-9 = 6
    // down: n=3 Sy=4 Sx=3 Sxx=5 Sxy=1  -> num = 3*1-3*4  = -9, den = 6
    assert(got("up") == ((3L, 4L, 6L, 6L)))
    assert(got("down") == ((3L, 4L, -9L, 6L)))
  }

  test("daily trend: single-day group has zero denominator, flat is zero") {
    val events = Seq(("only", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("event_type", "ts")
    val Array(r) = graft.operators.EventAnalytics.dailyTrend(events).collect()
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L) // 1-point fit: 0/0
  }

  // ------------------------------------------------------------- skyline

  private def bruteSkyline(pts: DataFrame): Set[(Long, Long, Long)] = {
    val rows = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) }
    }.toSet
  }

  test("skyline: equals brute-force NOT EXISTS on a pseudo-random cloud") {
    val pts = (1L to 400L).map { i =>
      val x = (i * 37) % 97; val y = (i * 53) % 89
      (i, x, y)
    }
    val df = pts.toDF("id", "x", "y")
    val expected = bruteSkyline(df)
    val got = Skyline.skyline2d(df, $"id", $"x", $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("skyline: exact duplicates of a frontier point all survive") {
    val df = Seq((1L, 0L, 5L), (2L, 5L, 0L), (3L, 0L, 5L), (4L, 3L, 3L),
      (5L, 4L, 4L)).toDF("id", "x", "y")
    // strict dominance: (0,5)==(0,5) don't dominate each other;
    // (4,4) is dominated by (3,3)
    val got = Skyline.skyline2d(df, $"id", $"x", $"y")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("skyline: x span wider than Long stays exact (overflow-safe buckets)") {
    // Long.MinValue sentinels mixed with large positives: `x1 - x0`
    // wraps, so the pre-fix bucket ids were non-monotone in x and the
    // phase-2 prune silently dropped frontier points
    val df = Seq(
      (1L, Long.MinValue, 50L), (2L, Long.MinValue + 7, 40L),
      (3L, -1000L, 30L), (4L, 0L, 25L), (5L, 1000L, 24L),
      (6L, Long.MaxValue - 7, 1L), (7L, Long.MaxValue, 0L),
      (8L, Long.MaxValue, 99L), (9L, 5L, 60L)).toDF("id", "x", "y")
    val got = Skyline.skyline2d(df, $"id", $"x", $"y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteSkyline(df) && got.map(_._1).contains(7L))
  }

  test("skyline: bucket-count invariance (1 bucket == 256 buckets)") {
    val df = (1L to 300L).map(i => (i, (i * 31) % 61, (i * 17) % 71))
      .toDF("id", "x", "y")
    val one = Skyline.skyline2d(df, $"id", $"x", $"y", buckets = 1)
      .collect().map(_.getLong(0)).toSet
    val many = Skyline.skyline2d(df, $"id", $"x", $"y", buckets = 256)
      .collect().map(_.getLong(0)).toSet
    assert(one == many && one == bruteSkyline(df).map(_._1))
  }

  // --------------------------------------------------------------- vocab

  test("vocab: two-phase rank equals the global-window reference") {
    val docs = Seq(
      (1L, "red red red blue blue green green yellow zeta zeta"),
      (2L, "red blue alpha beta gamma zeta")).toDF("doc_id", "text")
    val got = TextAnalysis.buildVocab(docs, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    // counts: red=4, blue=3, green=2, zeta=3, yellow=1(cut), singles cut
    // order (c desc, term): red(4), blue(3), zeta(3), green(2)
    assert(got.toSeq == Seq(("red", 4L, 1L), ("blue", 3L, 2L),
      ("zeta", 3L, 3L), ("green", 2L, 4L)))
  }

  test("vocab: prefix split keeps ids dense and unique at prefixLen=1") {
    val docs = (1L to 50L).map(i => (i, s"a${i % 7} b${i % 5} a${i % 7}"))
      .toDF("doc_id", "text")
    val v = TextAnalysis.buildVocab(docs, minCount = 1L, prefixLen = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ids = v.map(_._3).sorted
    assert(ids.toSeq == (1L to v.length).toSeq)
    // ranks respect (c desc, term asc)
    val sorted = v.sortBy { case (t, c, _) => (-c, t) }.map(_._3)
    assert(sorted.toSeq == (1L to v.length).toSeq)
  }

  // ------------------------------------------------- paths / ab / rollup

  private def ev(u: Long, t: String, typ: String, eid: Long) =
    (eid, java.sql.Timestamp.valueOf(t), u, typ)

  test("top paths: timeline order, eid tiebreak, short users excluded") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", "a", 1),
      ev(1, "2024-01-01 10:01:00", "b", 2),
      ev(1, "2024-01-01 10:02:00", "c", 3),
      ev(1, "2024-01-01 10:03:00", "b", 4),
      // user 2: equal timestamps — order fixed by event_id
      ev(2, "2024-01-01 09:00:00", "a", 10),
      ev(2, "2024-01-01 09:00:00", "b", 11),
      ev(2, "2024-01-01 09:00:00", "c", 12),
      // user 3: too short for a 3-gram
      ev(3, "2024-01-01 08:00:00", "a", 20),
      ev(3, "2024-01-01 08:01:00", "b", 21)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.topPaths(events, n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // user 1: a>b>c, b>c>b; user 2: a>b>c
    assert(got.toSeq == Seq(("a>b>c", 2L), ("b>c>b", 1L)))
  }

  test("kmv rollup: merged sketches equal a direct coarse-group sketch") {
    import graft.llm.Sketches
    val rows = (1L to 500L).map(i => (s"g${i % 5}", i % 137))
      .toDF("g", "v")
    val k = 16
    val fine = rows.groupBy("g")
      .agg(Sketches.kmvMins(k)(Sketches.kmvHash($"v")).as("mins"))
    val rolled = Sketches.kmvRollup(fine, $"mins", Nil, k)
      .select(Sketches.kmvEstimate(k, $"mins").as("est"))
      .collect().head.getDouble(0)
    val direct = rows.agg(
        Sketches.kmvMins(k)(Sketches.kmvHash($"v")).as("mins"))
      .select(Sketches.kmvEstimate(k, $"mins").as("est"))
      .collect().head.getDouble(0)
    assert(rolled == direct) // bit-equal: same k smallest distinct hashes
  }

  test("hll: registers replay the hand-computed md5 law, nulls excluded") {
    import graft.llm.Sketches
    val m = 256
    // hand-replay: the same 60-bit md5 hash, bucket = low 8 bits,
    // rank = 53 - bitlength of the top 52 bits
    def expected(s: String): (Int, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.take(15), 16)
      val v = h >>> 8
      ((h & (m - 1)).toInt, 53 - (64 - java.lang.Long.numberOfLeadingZeros(v)))
    }
    val vals = Seq("alpha", "beta", "gamma", "delta")
    val df = (vals.map(v => ("s1", v)) :+ (("s1", null: String)))
      .toDF("src", "v")
    val got = Sketches.hllRegisters(df, $"v", m, Seq($"src".as("src")))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSet
    val want = vals.map(expected).groupBy(_._1)
      .map { case (b, rs) => (b, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("hll: shard merge by groupBy-max equals the direct global sketch; " +
      "estimate law replays in BigInt") {
    import graft.llm.Sketches
    val m = 256
    val rows = (1L to 800L).map(i => (s"s${i % 3}", s"item-${i % 613}"))
      .toDF("src", "v")
    val perShard = Sketches.hllRegisters(rows, $"v", m, Seq($"src".as("src")))
    val merged = perShard.groupBy($"bucket").agg(max($"r").as("r"))
    val direct = Sketches.hllRegisters(rows, $"v", m)
    assert(merged.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      direct.collect().map(r => (r.getInt(0), r.getInt(1))).toSet)
    // estimate: replay the integer law from the register rows
    val regs = direct.collect().map(r => (r.getInt(0), r.getInt(1)))
    val e = 53
    val s = regs.map { case (_, r) => BigInt(1) << (e - r) }.sum +
      BigInt(m - regs.length) * (BigInt(1) << e)
    val alphaNum = BigInt(7213000L * m)
    val alphaDen = BigInt(10000L) * (1000L * m + 1079L)
    val want = (alphaNum * m * m * (BigInt(1) << e)) / (alphaDen * s)
    val got = Sketches.hllEstimate(direct, m)
      .select($"hll_est").collect().head.getLong(0)
    assert(BigInt(got) == want)
    // and the deterministic estimate is in the right ballpark for the
    // 613 true distincts (1.04/sqrt(256) ~ 6.5% standard error)
    assert(got > 400 && got < 900, s"est $got implausible for 613 distinct")
  }

  test("experiment readout: exact 2x2 table and effect numerators") {
    // conversions: user completes signup -> click within the gap
    val events = (
      (0L until 8L).flatMap { u =>
        Seq(ev(u, "2024-01-01 10:00:00", "signup", u * 10),
          ev(u, "2024-01-01 10:30:00", "click", u * 10 + 1))
      } ++ Seq( // users 100..103: signup only (no conversion)
        ev(100, "2024-01-01 10:00:00", "signup", 9000),
        ev(101, "2024-01-01 10:00:00", "signup", 9001),
        ev(102, "2024-01-01 10:00:00", "signup", 9002),
        ev(103, "2024-01-01 10:00:00", "signup", 9003))
      ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.experimentReadout(events,
      Seq("signup", "click"), maxGapMicros = 3600L * 1000000).collect().head
    val (n0, s0, n1, s1) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    // the md5 assignment splits somehow, but the totals are invariant:
    assert(n0 + n1 == 12L && s0 + s1 == 8L)
    // every converter is an exposed user in its own arm
    assert(s0 <= n0 && s1 <= n1 && n0 > 0 && n1 > 0)
    assert(got.getLong(4) == s1 * n0 - s0 * n1)
    assert(got.getLong(5) == s1 * (n0 - s0) - s0 * (n1 - s1))
  }

  // --------------------------------------- changepoint / seasonality / bitmap

  test("changepoint: step series found exactly, earliest-day tie-break") {
    // g "step": days 1-3 at 0, days 4-6 at 6 -> best split after day 3
    val events = (4 to 6).flatMap(day => Seq.fill(6)(
      ("step", java.sql.Timestamp.valueOf(f"2024-01-0$day 10:00:00")))) ++
      Seq(("step", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))) // 1 on day 1
    val got = EventAnalytics.changepoint(events.toDF("event_type", "ts"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4)))
    // dense: (1,0,0,6,6,6), n=6, S=19
    // t=3: st=1, num=|1*3 - 18*3| = 51, den=9, ratio 5.67 (max)
    assert(got.toSeq == Seq(("step", "2024-01-03", 51L, 9L, 6L)))
  }

  test("weekday profile: exact seasonality index") {
    // 14 days starting Mon 2024-01-01; Mondays get 3 events, rest 1
    val events = (0 until 14).flatMap { off =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(off)
      val n = if (day.getDayOfWeek.getValue == 1) 3 else 1
      Seq.fill(n)(("m", java.sql.Timestamp.valueOf(day.atTime(9, 0))))
    }.toDF("event_type", "ts")
    val got = EventAnalytics.weekdayProfile(events)
      .collect().map(r => r.getInt(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // totals: 14 days, 2*3 + 12*1 = 18 events
    // Monday (dow 1): n=2, sum=6 -> 6*14*1e6 div (2*18) = 2333333
    // others: n=2, sum=2 -> 2*14*1e6 div (2*18) = 777777
    assert(got(1) == ((2L, 6L, 2333333L)))
    (2 to 7).foreach(d => assert(got(d) == ((2L, 2L, 777777L)), s"dow $d"))
  }

  test("segment overlap: bitmap AND equals direct set intersection") {
    // users straddle word boundaries (63/64/128); c shares nobody
    val inc = Seq(
      ("a", 1L), ("a", 63L), ("a", 64L), ("a", 128L),
      ("b", 63L), ("b", 64L), ("b", 999L),
      ("c", 5000L)
    ).map { case (s, u) => (1L, new java.sql.Timestamp(0), u, s) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.segmentOverlap(inc)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "b") -> 2L)) // 63 and 64; c-pairs absent
  }

  test("rank transform: exact min-rank with ties, bucket-count invariant, wide spans") {
    // ties (10,10), a wide-span group with Long extremes (the half-span
    // bucket form), and a null row to exclude
    val rows = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 7L),
      ("a", 4L, 99L), ("b", 5L, Long.MinValue), ("b", 6L, Long.MaxValue),
      ("b", 7L, 0L), ("c", 8L, 5L))
    val d = (rows :+ (null.asInstanceOf[String], 9L, 1L))
      .toDF("g", "id", "v")
    def expected: Set[(Long, Long, Long)] = rows.groupBy(_._1).flatMap {
      case (_, rs) => rs.map { case (_, id, v) =>
        (id, 1L + rs.count(_._3 < v), rs.size.toLong) }
    }.toSet
    def got(buckets: Int) = EventAnalytics.rankTransform(
        d, col("g"), col("v"), buckets)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSet
    assert(got(1024) == expected)
    assert(got(1) == expected)            // single bucket == pure window
    assert(!got(1024).exists(_._1 == 9L)) // null group excluded
  }

  test("segment overlap: a negative user id fails loudly, never collides") {
    // -1 would truncate into word 0 / bit 63 and silently merge with
    // user 63's bit — the operator must error instead
    val inc = Seq(("a", -1L), ("a", 63L), ("b", 63L))
      .map { case (s, u) => (1L, new java.sql.Timestamp(0), u, s) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val ex = intercept[Exception] {
      EventAnalytics.segmentOverlap(inc).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("non-negative user ids")), ex)
  }

  // ------------------------------------------------- weighted shortest paths

  test("weighted paths: multi-hop shortcut beats direct edge, horizon bound") {
    import graft.operators.GraphRank
    // 1 -(10)-> 2; 1 -(2)-> 3 -(2)-> 2  => dist(2) = 4 via the shortcut,
    // found only at round 2; 4 is 3 hops out (dist 6), beyond round 2
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 2L),
      (2L, 4L, 2L)).toDF("src", "dst", "w")
    def run(rounds: Int) =
      GraphRank.weightedDistances(edges, Seq(1L), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == Map(1L -> 0L, 2L -> 10L, 3L -> 2L))
    assert(run(2) == Map(1L -> 0L, 2L -> 4L, 3L -> 2L, 4L -> 12L))
    // round 3 improves 4 through the shortcut path found at round 2
    assert(run(3) == Map(1L -> 0L, 2L -> 4L, 3L -> 2L, 4L -> 6L))
    // fixed point: past round 3 nothing can relax; the single-action
    // (count, dist-sum) convergence probe must stop early AND leave the
    // final state identical — an improvement would change count or
    // strictly lower the sum, an unchanged pair is exactly "improved
    // set empty"
    assert(run(6) == run(3))
  }

  // --------------------------------------------- grouped exact quantiles

  test("group quantiles: order statistics per group, bucket invariance") {
    val df = ((1L to 100L).map(("a", _)) ++ Seq(("b", 5L), ("b", 7L),
      ("b", 7L), ("b", 9L))).toDF("g", "v")
    def run(buckets: Int) =
      EventAnalytics.exactGroupQuantiles(df, $"g", $"v", Seq(25, 50, 90),
          buckets)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap
    val got = run(1024)
    // a: ranks 25/50/90 of 1..100; b (n=4): ranks 1/2/4 -> 5, 7, 9
    assert(got == Map(("a", 25) -> 25L, ("a", 50) -> 50L, ("a", 90) -> 90L,
      ("b", 25) -> 5L, ("b", 50) -> 7L, ("b", 90) -> 9L))
    assert(run(1) == got && run(3) == got)
  }

  test("funnel latency: exact per-transition second percentiles") {
    def e(id: Long, u: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), u, typ)
    // three completers with click latencies 60s, 120s, 600s;
    // one converter with purchase latency 30s
    val events = Seq(
      e(1, 1, "2024-01-01 10:00:00", "signup"),
      e(2, 1, "2024-01-01 10:01:00", "click"),
      e(3, 2, "2024-01-01 10:00:00", "signup"),
      e(4, 2, "2024-01-01 10:02:00", "click"),
      e(5, 2, "2024-01-01 10:02:30", "purchase"),
      e(6, 3, "2024-01-01 10:00:00", "signup"),
      e(7, 3, "2024-01-01 10:10:00", "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.funnelLatency(events,
        Seq("signup", "click", "purchase"), 3600L * 1000000,
        percents = Seq(50, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    // signup->click secs {60, 120, 600}: p50 = rank 2 = 120, p100 = 600
    // click->purchase secs {30}: both ranks -> 30
    assert(got == Map(("signup->click", 50) -> 120L,
      ("signup->click", 100) -> 600L,
      ("click->purchase", 50) -> 30L, ("click->purchase", 100) -> 30L))
  }

  // -------------------------------------------------------------- keyness

  test("keyness: exact rate-ratio scores and per-slice ranking") {
    val docs = Seq(
      (1L, "jargon jargon common", "tech"),
      (2L, "common common plain", "news")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.keyTerms(docs, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // totals: tech n=3, news n=3, n_all=6
    // tech/jargon: a=2 b=0 -> 2*(3+1)*1e6 div (1*3) = 2666666
    // tech/common: a=1 b=2 -> 1*4*1e6 div (3*3)   = 444444
    // news/plain:  a=1 b=0 -> 1*4*1e6 div (1*3)   = 1333333
    // news/common: a=2 b=1 -> 2*4*1e6 div (2*3)   = 1333333
    // news tie 1333333 -> term asc: "common" before "plain"
    assert(got.sortBy(r => (r._1, r._2)).toSeq == Seq(
      ("news", 1, "common", 2L, 1L, 1333333L),
      ("news", 2, "plain", 1L, 0L, 1333333L),
      ("tech", 1, "jargon", 2L, 0L, 2666666L),
      ("tech", 2, "common", 1L, 2L, 444444L)))
  }

  // ------------------------------------------------- skew / kmv-intersect

  test("skew audit: exact top keys, shares, and totals") {
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"cold$i")).toDF("k")
    val got = graft.llm.SkewTools.keySkewAudit(df, $"k", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("hot", 60L, 100L, 12L, 600000L),
      ("warm", 30L, 100L, 12L, 300000L),
      ("cold1", 1L, 100L, 12L, 10000L)))
  }

  test("kmv intersect: exact below k, near-true overlap above") {
    import graft.llm.Sketches
    // A = 1..30, B = 21..50 -> |A∩B| = 10, all < k=64 -> sketches exact
    val rows = ((1L to 30L).map(("A", _)) ++ (21L to 50L).map(("B", _)))
      .toDF("g", "u")
    val sk = rows.groupBy("g")
      .agg(Sketches.kmvMins(64)(Sketches.kmvHash($"u")).as("mins"))
    val Array(r) = Sketches.kmvIntersectEstimates(sk, $"g", $"mins", 64)
      .collect()
    assert((r.getString(0), r.getString(1)) == (("A", "B")))
    assert(r.getDouble(2) == 30.0 && r.getDouble(3) == 30.0 &&
      r.getDouble(4) == 50.0 && r.getDouble(5) == 10.0)
  }

  // ------------------------------------------------------ phrase / rfm

  test("phrase search: exact anchors, repeats, overlaps, repeated-term phrase") {
    val docs = Seq(
      (1L, "big table hash small table hash"),   // 2 hits
      (2L, "table small hash"),                  // words present, no phrase
      (3L, "a b a b a"),                         // "a b a": overlapping x2
      (4L, "table hash")                         // exact doc
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, Seq("table hash", "a b a"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("table hash", 1L) -> 2L,
      ("table hash", 4L) -> 1L,
      ("a b a", 3L) -> 2L))
  }

  test("exact bins: equi-depth cutoffs and full coverage") {
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("v")
    val cuts = EventAnalytics.exactBins(df, $"v", 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cuts == Map(1 -> 20L, 2 -> 40L, 3 -> 60L, 4 -> 80L, 5 -> 100L))
  }

  test("exact bins: bucket-count invariance, duplicates, tiny input") {
    val dup = (Seq.fill(30)(7L) ++ Seq.fill(10)(9L) ++ (100L to 159L))
      .map(Tuple1(_)).toDF("v")
    def cuts(buckets: Int) =
      EventAnalytics.exactBins(dup, $"v", 4, buckets)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val one = cuts(1)
    assert(one == cuts(1024) && one == cuts(7))
    // n=100, ranks 25/50/75/100 over sorted
    // [7 x30, 9 x10, 100..159]: v25=7, v50=109, v75=134, v100=159
    assert(one == Map(1 -> 7L, 2 -> 109L, 3 -> 134L, 4 -> 159L))
    // fewer rows than bins still yields total coverage
    val tiny = Seq(5L, 6L).map(Tuple1(_)).toDF("v")
    val t = EventAnalytics.exactBins(tiny, $"v", 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ranks ceil(k*2/5) = 1,1,2,2,2
    assert(t == Map(1 -> 5L, 2 -> 5L, 3 -> 6L, 4 -> 6L, 5 -> 6L))
  }

  test("rfm: exact metrics and ascending value bins") {
    def e(id: Long, u: Long, t: String, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(t), u, typ, v)
    val events = Seq(
      e(1, 1, "2024-01-01 00:00:00", "purchase", 10.0),
      e(2, 1, "2024-01-05 00:00:00", "purchase", 5.5),
      e(3, 2, "2024-01-09 00:00:00", "purchase", 100.0),
      e(4, 9, "2024-01-11 00:00:00", "browse", 0.0) // horizon, not a buyer
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = graft.operators.EventAnalytics.rfmScores(events, bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // horizon = Jan 11; u1: last Jan 5 -> 6 days, f=2, m=1550
    // u2: last Jan 9 -> 2 days, f=1, m=10000
    // recency bins over {6, 2}: cut1=2, cut2=6 -> u2 bin1, u1 bin2
    // frequency {2, 1}: u2 bin1, u1 bin2; monetary {1550, 10000}: u1=1, u2=2
    assert(got(1L) == ((6L, 2L, 1550L, 2, 2, 1)))
    assert(got(2L) == ((2L, 1L, 10000L, 1, 1, 2)))
  }

  // ------------------------------------------------------------ pit/twap

  test("twap: exact integral, bucket-width invariance, 1-event group") {
    def e(id: Long, t: String, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(t), 1L, typ, v)
    val events = Seq(
      // "m": 10.0 for 60 s, then 20.0 for 30 s, last obs open (excluded)
      e(1, "2024-01-01 00:00:00", "m", 10.0),
      e(2, "2024-01-01 00:01:00", "m", 20.0),
      e(3, "2024-01-01 00:01:30", "m", 7.0),
      e(4, "2024-01-01 00:00:00", "solo", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(bucketUs: Long) = EventAnalytics.twap(events, bucketUs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    val got = run(86400000000L)
    // num = 10e6 * 60e6 + 20e6 * 30e6 = 6e14 + 6e14 = 1.2e15
    assert(got("m") == ((3L, "1200000000000000", 90000000L)))
    assert(got("solo") == ((1L, "0", 0L)))
    // a 10-second bucket forces cross-bucket boundary terms -> same sums
    assert(run(10000000L) == got)
  }

  test("pit semantics: strictly-before as-of never attaches the event's own run") {
    import graft.operators.{AsofJoin, ChangeHistory}
    def e(id: Long, t: String, typ: String) =
      (id, java.sql.Timestamp.valueOf(t), 7L, typ)
    val events = Seq(
      e(1, "2024-01-01 10:00:00", "signup"),
      e(2, "2024-01-01 11:00:00", "purchase"),  // prior state: signup run
      e(3, "2024-01-01 12:00:00", "purchase")   // prior: purchase run (e2)
    ).toDF("event_id", "ts", "user_id", "event_type")
    val hist = ChangeHistory.scd2(events).withColumnRenamed("user_id", "h_user")
    val probes = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
      .withColumn("asof_us", $"us" - 1)
    val got = AsofJoin.backward(probes, hist, "user_id", "h_user",
        "asof_us", "valid_from_us", Seq("version", "value"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(5))).toMap
    assert(got(2L) == Some("signup"))   // not its own purchase run
    assert(got(3L) == Some("purchase")) // e2's run, which started earlier
    // a first-ever event would see NULL: probe strictly before signup
    val first = AsofJoin.backward(
      events.filter($"event_id" === 1)
        .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
        .withColumn("asof_us", $"us" - 1),
      hist, "user_id", "h_user", "asof_us", "valid_from_us",
      Seq("version", "value")).collect()
    assert(first.length == 1 && first.head.isNullAt(5))
  }

  // ----------------------------------------------------------------- BPE

  test("bpe: hand-replayed merges, frequency weighting, greedy scan") {
    // words (post-filter): low x3, lowest x1  -> chars l,o,w,e,s,t
    // round 1 pairs: (l,o)=4 (o,w)=4 (w,e)=1 (e,s)=1 (s,t)=1
    //   tie 4: (l,o) < (o,w) lexicographically -> merge (l,o)
    // round 2: (lo,w)=4 (w,e)=1 (e,s)=1 (s,t)=1 -> merge (lo,w)
    // round 3: (low,e)=1 (e,s)=1 (s,t)=1 -> tie of 1s -> (e,s)
    val docs = Seq((1L, "low low lowest"), (2L, "low")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bpeMerges(docs, k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "l", "o", 4L), (2, "lo", "w", 4L),
      (3, "e", "s", 1L)))
  }

  test("bpe: 'aaa' merges non-overlapping left-to-right") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1: pairs (a,a)=4 -> merge. round 2: each word is [aa, a] ->
    // pair (aa,a)=2 -> merge. round 3: single symbol, supply exhausted.
    val got = graft.llm.TextAnalysis.bpeMerges(docs, k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L)))
  }

  test("bpe: non-ascii words are excluded from training") {
    val docs = Seq((1L, "abc abé abc")).toDF("doc_id", "text")
    val got = graft.llm.TextAnalysis.bpeMerges(docs, k = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "b", 2L))) // only the two "abc"
  }

  test("bpe encode: training corpus reproduces training's final symbol " +
    "state; order, OOV pass-through, and empty docs hold") {
    import graft.llm.TextAnalysis
    // merges on this corpus (hand-replayed above): (l,o), (lo,w), (e,s)
    // -> low = [low], lowest = [low, es, t]
    val docs = Seq(
      (1L, "low low lowest"), (2L, "low"),
      (3L, "lowest abé low"),              // non-alphabet word passes whole
      (4L, ""), (5L, null.asInstanceOf[String])) // encode as (0, "")
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(
      Seq((1L, "low low lowest"), (2L, "low")).toDF("doc_id", "text"), k = 3)
    val got = TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got(1L) == ((5L, "low low low es t")), got(1L))
    assert(got(2L) == ((1L, "low")))
    // document order preserved; abé never split (a,b merge doesn't apply
    // to it — outside the trained alphabet, it is one opaque piece)
    assert(got(3L) == ((5L, "low es t abé low")), got(3L))
    assert(got(4L) == ((0L, "")) && got(5L) == ((0L, "")))
    // encoding ANOTHER corpus applies the tokenizer as trained: unseen
    // words still fold through the merge table from their characters
    val other = Seq((9L, "slow lot")).toDF("doc_id", "text")
    val g2 = TextAnalysis.bpeEncode(other, merges).collect()
      .map(r => (r.getLong(1), r.getString(2))).head
    // slow: s l o w -> s lo w -> s low ; lot: l o t -> lo t
    assert(g2 == ((4L, "s low lo t")), g2)
  }

  test("bpe encode: chunked fold bounds plan depth — a 1.2k-merge table " +
    "encodes (no analyzer/codegen blowup) and equals the small-k path") {
    import graft.llm.TextAnalysis
    val docs = Seq(
      (1L, "low low lowest"), (2L, "slow lot"), (3L, "lowest abé low"))
      .toDF("doc_id", "text")
    val trained = TextAnalysis.bpeMerges(
      Seq((1L, "low low lowest"), (2L, "low")).toDF("doc_id", "text"), k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val single = rows(TextAnalysis.bpeEncode(docs, trained))
    // chunk boundary CROSSING the real merges: the per-chunk state
    // handoff must reproduce the one-plan fold exactly
    val boundary = rows(TextAnalysis.bpeEncode(docs, trained,
      chunkMerges = 2))
    assert(boundary == single, "chunk-boundary handoff diverged")
    // production-scale depth: pad the learned table to 1200 merges with
    // pairs outside the corpus alphabet (law-level no-ops) — a single
    // nested plan at this k dies in the analyzer/codegen; the chunked
    // fold must encode it and reproduce the 3-merge segmentation
    val pad = (4 to 1200).map(i => (i.toLong, s"zz$i", "qq"))
      .toDF("merge_rank", "lhs", "rhs")
    val merges1200 = trained.select(col("merge_rank"), col("lhs"),
      col("rhs")).unionByName(pad)
    val chunked = rows(TextAnalysis.bpeEncode(docs, merges1200))
    assert(chunked == single, "padded 1.2k-merge chunked encode diverged")
  }

  test("bpe budget sweep: prefix law prices each budget, char baseline, pass-through") {
    val docs = Seq((0L, "ab ab b"), (1L, "ab!")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, k = 1) // one merge: a+b
    val got = TextAnalysis.bpeBudgetSweep(docs, merges, steps = Seq(0, 1))
      .collect().map(r => r.getAs[Int]("budget") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("total_pieces"),
          r.getAs[Long]("pieces_per_word_scaled"),
          r.getAs[Long]("piece_vocab"))).toMap
    // budget 0 (chars): ab->2 pieces x2 occ, b->1, ab!->1 whole
    // (non-alphabet pass-through) = 6 pieces over 4 words; vocab {a,b,ab!}
    assert(got(0) == ((4L, 6L, 1500000000L, 3L)))
    // budget 1 (a+b): ab->1 piece -> 4 pieces; vocab {ab,b,ab!}
    assert(got(1) == ((4L, 4L, 1000000000L, 3L)))
    // budgets past the learned table refuse loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeBudgetSweep(docs, merges, steps = Seq(0, 2))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeBudgetSweep(docs, merges, steps = Seq(1, 0))
    }
  }

  test("dsir train/apply split: scoring against the frozen ratio table " +
    "equals the one-shot weights; unseen-everywhere bucket scores neutral") {
    import graft.llm.TextAnalysis
    val B = 16
    val target = Seq((100L, "the cat sat"), (102L, "the cat"))
      .toDF("doc_id", "text")
    val raw = Seq(1L -> "the cat sat", 2L -> "zz qq zz", 5L -> "the dog sat",
      7L -> "cat cat cat").toDF("doc_id", "text")
    val ratio = TextAnalysis.dsirRatioTable(
      TextAnalysis.dsirFeatures(target, B),
      TextAnalysis.dsirFeatures(raw, B), B)
    // the production path (train once, apply to the batch) IS the
    // one-shot law — the delegation cannot drift
    val oneShot = TextAnalysis.dsirWeights(target, raw, buckets = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val applied = TextAnalysis.dsirScore(raw, ratio, B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied == oneShot, s"$applied vs $oneShot")

    // a single-token doc whose bucket NEITHER corpus touched scores the
    // conservative neutral 1e9: find such a word by the md5 replay
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(7), 16) % B
    }
    val touched = (Seq("the cat sat", "the cat", "zz qq zz", "the dog sat",
      "cat cat cat")).flatMap { t =>
      val ts = t.split(" ").toSeq
      (ts ++ ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }).map(bucket)
    }.toSet
    val novel = (1 to 1000).map(i => s"w$i")
      .find(w => !touched.contains(bucket(w)))
    assume(novel.nonEmpty) // 16 buckets, 1000 candidates: practically sure
    val scored = TextAnalysis.dsirScore(
        Seq((9L, novel.get)).toDF("doc_id", "text"), ratio, B)
      .collect().map(r => (r.getLong(1), r.getLong(2))).head
    assert(scored == ((1L, 1000000000L)), scored)
  }

  test("tokenizer fertility: hand-derived per-slice rates, OOV words, " +
    "empty docs, zero-word slice reports NULL rates") {
    import graft.llm.TextAnalysis
    // merges on this train corpus (replayed in the bpe specs):
    // (l,o), (lo,w), (e,s) -> low = [low] (1 piece), lowest = [low,es,t]
    val merges = TextAnalysis.bpeMerges(
      Seq((1L, "low low lowest"), (2L, "low")).toDF("doc_id", "text"), k = 3)
    val docs = Seq(
      (1L, "low low lowest", "en"), // 3 words, 12 chars, 1+1+3=5 pieces
      (2L, "low abé", "fr"),        // abé OOV -> 1 whole piece; 2w 6c 2p
      (4L, "", "fr"),               // empty: contributes only to n_docs
      (6L, "", "zz")                // whole slice empty -> NULL rates
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.tokenizerFertility(docs, merges)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    // en: fertility 1e6*5 div 3 = 1666666; chars/piece 1e6*12 div 5
    assert(got("en") == ((1L, 3L, 12L, 5L, 1666666L, 2400000L)), got("en"))
    // fr: 2 docs (one empty), 2 words, 6 chars, 2 pieces -> 1e6 and 3e6
    assert(got("fr") == ((2L, 2L, 6L, 2L, 1000000L, 3000000L)), got("fr"))
    // zz: no words, no pieces -> rates NULL (never a fake zero)
    assert(got("zz") == ((1L, 0L, 0L, 0L, -1L, -1L)), got("zz"))
  }

  test("ccnet perplexity buckets: per-language exact cuts, head/middle/" +
    "tail law, tie at the cut, scoreless docs excluded") {
    import graft.llm.TextAnalysis
    // train LM: c2(x,x)=4, c2(x,y)=1, c1(x)=5, V=2 -> smoothed p_scaled:
    // (x,x) 5e9 div 7 = 714285714, (x,y) 2e9 div 7 = 285714285, any
    // unseen-w1 bigram 1e9 div 2 = 500000000
    val train = Seq((0L, "x x x x x y")).toDF("doc_id", "text")
    // en scores: d1 714285714, d5 500000000, d3 285714285 — n=3 cuts at
    // ranks ceil(34*3/100)=2 and ceil(67*3/100)=3 -> head/middle/tail;
    // fr (n=2) cuts at ranks 1 and 2 -> d7 head, d9 EQUALS the lo cut ->
    // middle, and fr has no tail: cuts are PER LANGUAGE, never global
    val score = Seq(
      (1L, "x x x", "en"), (3L, "x y", "en"), (5L, "z z", "en"),
      (7L, "x x", "fr"), (9L, "x y", "fr"),
      (11L, "solo", "en"))             // < 2 tokens: no bigram, no row
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.perplexityBuckets(train, score)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == Set(1L, 3L, 5L, 7L, 9L), got)
    assert(got(1L) == (("en", 714285714L, "head")))
    assert(got(5L) == (("en", 500000000L, "middle")))
    assert(got(3L) == (("en", 285714285L, "tail")))
    assert(got(7L) == (("fr", 714285714L, "head")))
    assert(got(9L) == (("fr", 285714285L, "middle")))
  }

  test("dsir: weights match an independent BigInt md5 replay; rank-cut " +
    "keep law with a tie at the cut; empty docs excluded") {
    import graft.llm.TextAnalysis
    val B = 16 // small so hashed features genuinely collide
    val target = Seq((100L, "the cat sat"), (102L, "the cat")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the cat sat"),      // target-like -> high weight
      (2L, "zz qq zz"),         // OOV features (ct=0 smoothing branch)
      (3L, "zz qq zz"),         // identical -> tied weight with doc 2
      (5L, "the dog sat"),      // mixed
      (7L, "cat cat cat"),      // repeated feature occurrences (m > 1)
      (9L, "")                  // no features -> no row
    ).toDF("doc_id", "text")

    // independent replay: md5 bucketer + add-one ratio + occurrence mean
    def toks(t: String): Seq[String] =
      t.toLowerCase.replaceAll("\\s+", " ").split(" ").filter(_.nonEmpty).toSeq
    def feats(t: String): Seq[Long] = {
      val ts = toks(t)
      val fs = ts ++ ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
      fs.map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(f.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(7), 16) % B
      }
    }
    val tFeats = Seq("the cat sat", "the cat").flatMap(feats)
    val rDocs = Seq(1L -> "the cat sat", 2L -> "zz qq zz", 3L -> "zz qq zz",
      5L -> "the dog sat", 7L -> "cat cat cat")
    val rFeats = rDocs.flatMap { case (_, t) => feats(t) }
    val ct = tFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = rFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nt, nr) = (tFeats.size.toLong, rFeats.size.toLong)
    def ratio(b: Long): BigInt =
      (BigInt(1000000000) * (ct.getOrElse(b, 0L) + 1) * (nr + B)) /
        (BigInt(cr(b) + 1) * (nt + B))
    val expWeights = rDocs.map { case (id, t) =>
      val fs = feats(t)
      id -> (fs.map(ratio).sum / fs.size).toLong
    }.toMap

    val got = TextAnalysis.dsirWeights(target, raw, buckets = B)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 7L), got) // doc 9 has no row
    rDocs.foreach { case (id, t) =>
      assert(got(id) == ((feats(t).size.toLong, expWeights(id))),
        s"doc $id: ${got(id)} vs ${expWeights(id)}")
    }
    assert(expWeights(2L) == expWeights(3L)) // the engineered tie

    // keep law: ascending rank cut at ceil((100-keepPct)*n/100); ties at
    // the cut keep extra docs (the perplexityBuckets convention)
    val sorted = expWeights.values.toSeq.sorted
    val cut = sorted((40 * 5 + 99) / 100 - 1)
    val sel = TextAnalysis.dsirSelect(target, raw, keepPct = 60, buckets = B)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    expWeights.foreach { case (id, w) =>
      assert(sel(id) == (w >= cut), s"doc $id keep=${sel(id)} w=$w cut=$cut")
    }
  }

  // ------------------------------------------------------------ PQ / ADC

  private def vec(xs: Double*): Seq[Double] = xs.toSeq

  test("pq: codes are per-window argmin-L2 with ties to the smallest code") {
    import graft.expr.VectorExprs
    // dim 4, m 2 (windows [0,1] and [2,3]); entries chosen so window
    // winners differ and doc 3 ties exactly between codes 0 and 1
    val cb = Array(Array(0.0, 0.0, 1.0, 1.0), Array(1.0, 1.0, 0.0, 0.0))
    val docs = Seq(
      (1L, vec(0.1, 0.0, 0.9, 1.0)),  // w0 -> code 0, w1 -> code 0
      (2L, vec(1.0, 0.9, 0.1, 0.0)),  // w0 -> code 1, w1 -> code 1
      (3L, vec(0.5, 0.5, 0.5, 0.5))   // equidistant -> code 0 twice
    ).toDF("vec_id", "embedding")
    val got = docs.select($"vec_id",
        VectorExprs.pqCode($"embedding", cb, 2).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(got(1L) == List(0, 0) && got(2L) == List(1, 1) &&
      got(3L) == List(0, 0))
  }

  test("pq: ADC equals the exact dot when vectors sit on codebook entries") {
    val cb = Array(Array(1.0, 2.0, 3.0, 4.0), Array(-1.0, 0.5, 2.0, -2.0))
    val corpus = Seq((10L, cb(0).toSeq), (11L, cb(1).toSeq))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, vec(1.0, 1.0, 1.0, 1.0)))
      .toDF("query_id", "embedding")
    val got = graft.llm.Similarity.pqAdcTopK(corpus, queries, k = 5,
        ks = 2, m = 2, iters = 0, excludeSelf = false)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    // vectors ARE codebook entries -> reconstruction is exact, so
    // adc == dot(q, x): dot(q, cb0) = 10, dot(q, cb1) = -0.5
    assert(got(10L) == 10.0 && got(11L) == -0.5)
  }

  test("pq: one Lloyd iteration moves a window to its members' mean") {
    val corpus = Seq(
      (0L, vec(0.0, 0.0)), (1L, vec(10.0, 10.0)),   // the two seeds
      (2L, vec(2.0, 0.0)), (3L, vec(12.0, 10.0))
    ).toDF("vec_id", "embedding")
    val cb = graft.llm.Similarity.pqCodebook(corpus, ks = 2, m = 1,
      iters = 1)
    // cluster 0 = {(0,0),(2,0)} -> mean (1,0); cluster 1 -> (11,10)
    assert(cb(0).toSeq == Seq(1.0, 0.0) && cb(1).toSeq == Seq(11.0, 10.0))
  }

  test("pq: IVF-PQ with every cell probed equals the exhaustive ADC scan") {
    // deterministic pseudo-random corpus, dim 4
    val corpus = (0L until 40L).map { i =>
      (i, vec(((i * 37) % 19).toDouble / 19.0, ((i * 53) % 23).toDouble / 23.0,
        ((i * 71) % 29).toDouble / 29.0, 1.0 + (i % 3).toDouble))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val full = key(graft.llm.Similarity.ivfPqTopK(corpus, queries, k = 5,
      nLists = 4, nProbe = 4, ks = 4, m = 2))
    val exhaustive = key(graft.llm.Similarity.pqAdcTopK(corpus, queries,
      k = 5, ks = 4, m = 2))
    assert(full == exhaustive && full.nonEmpty)
    // and a partial probe returns a subset of the per-query candidates
    val partial = graft.llm.Similarity.ivfPqTopK(corpus, queries, k = 5,
      nLists = 4, nProbe = 1, ks = 4, m = 2)
      .select($"query_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partial.nonEmpty)
  }

  test("pq: corpus smaller than ks uses the short codebook's LUT stride") {
    // 3 vectors, ks = 8 -> codebook has 3 entries; vectors ARE the
    // codebook, so ADC must still equal the exact dot
    val corpus = Seq(
      (0L, vec(1.0, 0.0, 0.0, 2.0)),
      (1L, vec(0.0, 3.0, 1.0, 0.0)),
      (2L, vec(2.0, 2.0, 2.0, 2.0))).toDF("vec_id", "embedding")
    val queries = Seq((0L, vec(1.0, 1.0, 1.0, 1.0)))
      .toDF("query_id", "embedding")
    val got = graft.llm.Similarity.pqAdcTopK(corpus, queries, k = 3,
        ks = 8, m = 2, iters = 0, excludeSelf = false)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(got == Map(0L -> 3.0, 1L -> 4.0, 2L -> 8.0))
  }

  test("kmv rollup: derived/aliased coarse columns resolve") {
    import graft.llm.Sketches
    val rows = (1L to 60L).map(i => (java.sql.Date.valueOf(
      f"2024-0${i % 3 + 1}%d-15"), i % 37)).toDF("d", "v")
    val fine = rows.groupBy("d")
      .agg(Sketches.kmvMins(16)(Sketches.kmvHash($"v")).as("mins"))
    val monthly = Sketches.kmvRollup(fine, $"mins",
      Seq(date_trunc("month", $"d").as("month")), 16)
    assert(monthly.columns.toSeq == Seq("month", "mins") &&
      monthly.count() == 3)
  }

  test("kmv rollup: a coarse column named __h is rejected, not merged") {
    import graft.llm.Sketches
    val rows = (1L to 40L).map(i => (s"g${i % 2}", i % 17)).toDF("__h", "v")
    val fine = rows.groupBy("__h")
      .agg(Sketches.kmvMins(8)(Sketches.kmvHash($"v")).as("mins"))
    val ex = intercept[IllegalArgumentException] {
      Sketches.kmvRollup(fine, $"mins", Seq($"__h"), 8)
    }
    assert(ex.getMessage.contains("__h"))
  }

  test("encode: order restored, OOV -> -1, empty doc -> (0, \"\")") {
    val docs = Seq(
      (1L, "b a b rare"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, minCount = 2L) // b=1, a...
    // counts: b=2, a=1(cut), rare=1(cut) -> vocab = {b -> 1}
    val got = TextAnalysis.encodeCorpus(docs.repartition(5), vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((4L, "1 -1 1 -1")))
    assert(got(2L) == ((0L, "")))
    assert(got(3L) == ((0L, "")))
  }

  // ---------------------------------------------------- interval coverage

  test("interval coverage: overlap, nesting, touch, ties, zero-length") {
    val iv = Seq(
      // user 1: [0,10) ∪ [5,20) merge -> [0,20); [20,30) touches (half-
      // open: contiguous, same island, no gap); [40,50) is a new island
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      // user 2: nested [0,100) ⊃ [10,20) ⊃ [12,18); duplicate [0,100)
      // tie contributes zero; zero-length [50,50) is the empty set and
      // is excluded entirely (n_intervals counts 4, not 5)
      (2L, 0L, 100L), (2L, 10L, 20L), (2L, 12L, 18L), (2L, 0L, 100L),
      (2L, 50L, 50L),
      // user 3: single interval
      (3L, 7L, 9L),
      // user 4: a zero-length [12,12) sits in the gap between [0,10)
      // and [12,20) — it must NOT bridge them into one island (it
      // covers nothing), nor count as an interval
      (4L, 0L, 10L), (4L, 12L, 12L), (4L, 12L, 20L)
    ).toDF("u", "s", "e")
    val got = EventAnalytics.intervalCoverage(iv,
        key = col("u"), start = col("s"), end = col("e"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((40L, 2L, 4L)))   // [0,30) + [40,50); two islands
    assert(got(2L) == ((100L, 1L, 4L)))  // everything inside [0,100)
    assert(got(3L) == ((2L, 1L, 1L)))
    assert(got(4L) == ((18L, 2L, 2L)))   // two separate runs, no bridge
    // invariant under physical partitioning (window is per-key)
    val b = EventAnalytics.intervalCoverage(iv.repartition(7),
        key = col("u"), start = col("s"), end = col("e"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(b == got)
  }

  test("interval coverage: null endpoints and inverted spans excluded") {
    val iv = Seq(
      (Some(1L), Some(0L), Some(10L)),
      (Some(1L), None, Some(5L)),        // null start -> excluded
      (Some(1L), Some(3L), None),        // null end -> excluded
      (None, Some(0L), Some(5L)),        // null key -> excluded
      (Some(1L), Some(9L), Some(4L))     // end < start -> excluded
    ).toDF("u", "s", "e")
    val got = EventAnalytics.intervalCoverage(iv,
        key = col("u"), start = col("s"), end = col("e")).collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 10L && got.head.getLong(3) == 1L)
  }
}
