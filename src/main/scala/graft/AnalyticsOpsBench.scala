package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, Skyline}
import graft.llm.TextAnalysis

/** Corpus-scale soak for the round-8 analytics operators — the scale
  * check the sf0.1 driver bench can't give, one JSON line per phase,
  * each with an EXACT expected answer constructed into the data:
  *
  *  1. skyline over N points: a dense dominated cloud plus a planted
  *     1000-step staircase strictly below the cloud in both dims — the
  *     staircase dominates every cloud point and is mutually
  *     non-dominating, so the exact skyline IS the staircase; the
  *     operator must return precisely those 1000 ids (phase-2 bucket
  *     pruning has to kill ~N points without a self-join);
  *  2. phrase search over N word-salad documents with the phrase
  *     "alpha bravo charlie" planted at a known position in every
  *     200th document — hits must be exactly the planted docs, one
  *     anchor each (every NON-planted doc instead carries the broken
  *     adjacent pair "alpha charlie", so anchor voting is stressed
  *     against near-miss false positives corpus-wide);
  *  3. changepoint over 50 groups x 60 days of step-rate events: each
  *     group's rate triples at a known per-group day (the keep-filter
  *     is uniform per (group, day) block, so the step is clean at any
  *     scale) — every group's detected day must be exactly the day
  *     before its jump;
  *  4. vocabulary rank over a corpus where term w_i appears exactly
  *     (1000 - i) times — the two-phase rank must assign
  *     token_id(w_i) == i + 1 for all 1000 terms;
  *  5. bitmap segment overlap over U users x 8 residue-class segments
  *     (user u in segment i iff u % (i+2) == 0): every pairwise
  *     overlap has the closed form |{u < U : u % lcm == 0}|, checked
  *     for all 28 pairs;
  *  6. rank transform over N rows in 4 groups with every value planted
  *     exactly 5 times in-group — every row's min-rank must equal
  *     5k + 1, verified DISTRIBUTED (no N-row collect);
  *  7. expectations over N rows with closed-form planted violations
  *     (nulls every 1000th id, every u-value duplicated once, 99
  *     out-of-range v residues per 500-block) — each kind's observed
  *     count must equal its closed form exactly.
  *
  * Usage: `runMain graft.AnalyticsOpsBench [nPoints] [nDocs] [nUsers]`
  * (defaults 2e6 / 200k / 1e6).
  */
object AnalyticsOpsBench {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nDocs = args.lift(1).map(_.toLong).getOrElse(200000L)
    val nUsers = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def phase(name: String)(body: => (Boolean, String)): Unit = {
      val t0 = System.nanoTime()
      val (ok, detail) = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"phase":"$name","ok":$ok,"sec":$sec%.2f,$detail}""")
      require(ok, s"$name FAILED: $detail")
    }

    phase("skyline") {
      // cloud in [2e6, 3e6)^2; staircase x = i*10, y = (1000-i)*10
      val cloud = spark.range(nPoints).select(col("id"),
        (pmod(col("id") * 48271L, lit(999983L)) + 2000000L).as("x"),
        (pmod(col("id") * 69621L, lit(999979L)) + 2000000L).as("y"))
      val stairs = spark.range(1000).select((col("id") + nPoints).as("id"),
        (col("id") * 10L).as("x"), ((lit(1000L) - col("id")) * 10L).as("y"))
      val got = Skyline.skyline2d(cloud.unionByName(stairs),
          col("id"), col("x"), col("y"))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = (nPoints until nPoints + 1000L).toSet
      (got == want, s""""skyline_size":${got.size}""")
    }

    phase("phrase-search") {
      val vocab = 997
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 30).map(j =>
            concat(lit("w"), pmod(col("id") * (j * 2 + 7) + j, lit(vocab))))
            :+ when(pmod(col("id"), lit(200)) === 0,
              lit("alpha bravo charlie")).otherwise(lit("alpha charlie")): _*
        ).as("text"))
      val got = TextAnalysis.phraseSearch(docs, Seq("alpha bravo charlie"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val want = (0L until nDocs by 200L).map(_ -> 1L).toMap
      (got == want, s""""phrase_hits":${got.size}""")
    }

    phase("changepoint") {
      // 60 days x 50 groups, ~nPoints/3000 events/day baseline; each
      // group g's rate triples from day 20+g%20 on — the split with the
      // largest mean difference is the day before the jump, exactly
      val perDay = math.max(nPoints / 3000L, 50L)
      val events = spark.range(50L * 60L * perDay)
        .select(pmod(col("id"), lit(50L)).as("g_num"),
          pmod(expr("id div 50"), lit(60L)).as("day"),
          expr("id div 3000").as("block"))
        .withColumn("jump", lit(20L) + pmod(col("g_num"), lit(20L)))
        // keep 1/3 of pre-jump rows, all post-jump rows -> a 3x step
        .filter(col("day") >= col("jump") ||
          pmod(col("block"), lit(3L)) === 0)
        .select(concat(lit("g"), col("g_num")).as("event_type"),
          timestamp_micros(lit(1704067200000000L) +
            col("day") * 86400000000L).as("ts"))
      val got = EventAnalytics.changepoint(events)
        .collect().map(r => r.getString(0) ->
          (r.getDate(1).toLocalDate.toEpochDay -
            java.time.LocalDate.of(2024, 1, 1).toEpochDay))
        .toMap
      val want = (0 until 50).map(g => s"g$g" -> (20L + g % 20 - 1)).toMap
      (got == want, s""""groups":${got.size}""")
    }

    phase("vocab-rank") {
      // term w_i appears exactly (1000 - i) times -> token_id = i + 1
      val rows = spark.range(1000).select(
        concat(lit("w"), format_string("%04d", col("id"))).as("term"),
        (lit(1000L) - col("id")).as("reps"))
        .select(explode(sequence(lit(1L), col("reps"))).as("j"), col("term"))
        .select(monotonically_increasing_id().as("doc_id"),
          col("term").as("text"))
      val got = TextAnalysis.buildVocab(rows, minCount = 1L)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = (0 until 1000)
        .map(i => f"w$i%04d" -> (i + 1L)).toMap
      (got == want, s""""vocab":${got.size}""")
    }

    phase("bitmap-overlap") {
      val segs = (0 until 8).map(i => i + 2)
      val inc = spark.range(nUsers).select(col("id").as("user_id"))
        .select(col("user_id"), explode(array(segs.map(m =>
          when(pmod(col("user_id"), lit(m)) === 0, lit(s"seg$m"))): _*))
          .as("event_type"))
        .filter(col("event_type").isNotNull)
      val got = EventAnalytics.segmentOverlap(inc)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      def lcm(a: Long, b: Long): Long = {
        @annotation.tailrec def gcd(x: Long, y: Long): Long =
          if (y == 0) x else gcd(y, x % y)
        a / gcd(a, b) * b
      }
      val want = (for {
        i <- segs; j <- segs if s"seg$i" < s"seg$j"
      } yield (s"seg$i", s"seg$j") ->
        ((nUsers - 1) / lcm(i, j) + 1)).toMap
      (got == want, s""""pairs":${got.size}""")
    }

    phase("rank-transform") {
      // 4 groups, each value planted exactly 5 times in-group: the
      // min-rank of value k is 5k + 1 for every row, n_group = n/4 —
      // checked DISTRIBUTED (a 2M-row collect would be the anti-pattern
      // the operator exists to avoid)
      val n = nPoints - nPoints % 20
      val df = spark.range(n).select(
        pmod(col("id"), lit(4L)).as("g"),
        ((col("id") / lit(4L)).cast("long") / lit(5L)).cast("long").as("v"))
      val got = EventAnalytics.rankTransform(df, col("g"), col("v"))
      val bad = got.filter(col("rank") =!= col("v") * 5L + 1L ||
        col("n_group") =!= lit(n / 4)).count()
      val cnt = got.count()
      (bad == 0 && cnt == n, s""""rows":$cnt,"bad":$bad""")
    }

    phase("expectations") {
      import graft.operators.Expectations
      import graft.operators.Expectations._
      // violation counts planted with closed forms over n rows:
      // nulls at multiples of 1000; u = id div 2 duplicates every value
      // once; v = id mod 500 out of [0, 400] on residues 401..499
      val n = nPoints
      val df = spark.range(n).select(
        when(pmod(col("id"), lit(1000L)) === 0, lit(null))
          .otherwise(col("id")).cast("long").as("k"),
        (col("id") / lit(2L)).cast("long").as("u"),
        pmod(col("id"), lit(500L)).as("v"))
      val got = Expectations.evaluate(df, Seq(
          NotNull("k_not_null", "k"),
          Unique("u_unique", "u"),
          InRange("v_range", "v", 0L, 400L),
          RowCountBetween("rows", 1L, n)))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getBoolean(3)))).toMap
      val wantNulls = (n - 1) / 1000 + 1
      val wantDup = n - (n + 1) / 2   // u never null; each value twice
      val wantRange = (n / 500) * 99 + math.max(0L, n % 500 - 401)
      val ok = got("k_not_null") == ((wantNulls, false)) &&
        got("u_unique") == ((wantDup, false)) &&
        got("v_range") == ((wantRange, false)) &&
        got("rows") == ((n, true))
      (ok, s""""nulls":${got("k_not_null")._1},"dups":$wantDup,""" +
        s""""range":${got("v_range")._1}""")
    }

    spark.stop()
  }
}
