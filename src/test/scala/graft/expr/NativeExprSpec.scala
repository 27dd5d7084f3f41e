package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the native expressions: interpreted == codegen == the column
  * algebra they replace, plus SQL registration of the whole surface. */
class NativeExprSpec extends SparkSpec {

  import spark.implicits._

  test("WordShingles matches the algebra on generated text (k = 1..4)") {
    import org.scalacheck.Gen
    val word = Gen.oneOf(Gen.alphaStr.map(_.take(6)), Gen.const("a"),
      Gen.const("B"), Gen.const("日本"), Gen.const("x,y."))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val genText = for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n + 1, sep)
    } yield (ss.head + ws.zip(ss.tail).map { case (w, s) => w + s }.mkString).dropRight(0)
    val texts = Gen.listOfN(150, genText).sample.get :+ "" :+ "   " :+ "one"
    (1 to 4).foreach { k =>
      val df = texts.toDF("text")
      val toks = split(regexp_replace(lower(col("text")), "\\s+", " "), " ")
      val m = greatest(size(toks) - (k - 1), lit(0))
      val parts = (0 until k).map(j => slice(toks, lit(j + 1), m))
      val algebra = array_distinct(
        parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y))))
      df.select(col("text"), WordShingles(col("text"), k).as("n"), algebra.as("a"))
        .collect().foreach { r =>
          assert(r.getSeq[String](1) == r.getSeq[String](2),
            s"k=$k text=${r.getString(0).replace("\n", "\\n")}")
        }
    }
  }

  test("WordShingles matches the slice/zip_with/array_distinct formulation") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and trailing  ",
      "MIXED Case\tTabs\nNewlines  collapse",
      "one two",          // fewer tokens than k
      "a b c a b c a b c", // repeats -> distinct
      "", "   ")
    val df = texts.toDF("text")
    // the formulation WordShingles replaced, kept here as the oracle
    val toks = split(regexp_replace(lower(col("text")), "\\s+", " "), " ")
    val m = greatest(size(toks) - 2, lit(0))
    val parts = (0 until 3).map(j => slice(toks, lit(j + 1), m))
    val algebra = array_distinct(
      parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y))))
    val rows = df.select(
      WordShingles(col("text"), 3).as("native"), algebra.as("alg")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r)
    }
  }

  test("VecDot/VecNorm match the zip_with/aggregate formulation bit-exactly") {
    val vecs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.0f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1e-8f, 1e8f, -3.3f), Array(2.2f, -1e-8f, 0.1f)))
      .toDF("a", "b")
    val hofDot = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    vecs.select(VectorExprs.vecDot(col("a"), col("b")).as("n"), hofDot.as("h"),
        VectorExprs.vecNorm(col("a")).as("nn"),
        sqrt(aggregate(zip_with(col("a"), col("a"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("hn"))
      .collect().foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1))
        assert(r.getDouble(2) == r.getDouble(3))
      }
  }

  test("VecDotInt matches the zip_with/aggregate integer formulation exactly") {
    val vecs = Seq(
      (Array(1, 2, 3), Array(4, -5, 6)),
      (Array(127, -127, 127), Array(127, 127, -127)),
      (Array(0, 0, 0), Array(9, 9, 9)))
      .toDF("a", "b")
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
    vecs.select(VectorExprs.vecDotInt(col("a"), col("b")).as("n"), hof.as("h"))
      .collect().foreach { r => assert(r.getLong(0) == r.getLong(1)) }
    // null array -> null; accumulator is long (no int overflow at 127^2 * dim)
    val nulls = Seq((Option.empty[Array[Int]], Option(Array(1, 2)))).toDF("a", "b")
    assert(nulls.select(VectorExprs.vecDotInt(col("a"), col("b"))).head().isNullAt(0))
  }

  test("CentroidArgMax matches the array_position/array_max formulation bit-exactly") {
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.1),
      Array(0.0, 1.0, 0.0, 0.1),
      Array(1.0, 0.0, 0.0, 0.1))   // duplicate of 0: ties must pick 0
    val vecs = Seq(
      Array(0.9f, 0.1f, 0.0f, 0.2f),
      Array(0.1f, 0.8f, 0.3f, 0.0f),
      Array(1.0f, 0.0f, 0.0f, 0.1f),   // exact centroid: cosine 1, tie 0 vs 2
      Array(-1.0f, -1.0f, -1.0f, -1.0f))
      .toDF("e")
    val sims = array(cents.toIndexedSeq.map { c =>
      VectorExprs.vecDot(col("e"), typedLit(c.toSeq)) /
        (VectorExprs.vecNorm(col("e")) *
          lit(math.sqrt(c.map(x => x * x).sum)))
    }: _*)
    val rows = vecs
      .withColumn("best", VectorExprs.centroidArgMax(col("e"), cents))
      .withColumn("sims", sims)
      .select(col("best.cluster"), col("best.cosine"),
        (array_position(col("sims"), array_max(col("sims"))) - 1).cast("int"),
        array_max(col("sims")))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(2), r)
      assert(r.getDouble(1) == r.getDouble(3), r)   // bit-exact, not approx
    }
    assert(rows(2).getInt(0) == 0)   // the tie broke to the first index
    // zero-norm input: defined as (0, 0.0), never NaN
    val z = Seq(Array(0.0f, 0.0f, 0.0f, 0.0f)).toDF("e")
      .select(VectorExprs.centroidArgMax(col("e"), cents).as("b"))
      .select(col("b.cluster"), col("b.cosine")).head()
    assert(z.getInt(0) == 0 && z.getDouble(1) == 0.0)
  }

  test("PolyFingerprint: known values, empty string, unicode codepoints") {
    val r = Seq("", "a", "ab", "日本").toDF("t")
      .select(PolyFingerprint(col("t")).as("fp")).collect().map(_.getLong(0))
    assert(r(0) == 0L)
    assert(r(1) == 'a'.toLong)
    assert(r(2) == ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
    assert(r(3) == (0x65e5L * 31 + 0x672cL) % 1000000007L)
  }

  test("the full native surface is SQL-callable via GraftExtensions") {
    // a REAL extensions-wired session: clear the thread's active/default
    // session so getOrCreate builds a fresh one (same SparkContext) with
    // the production `withExtensions(new GraftExtensions)` applied — this
    // fails if the injectFunction / injectPlannerStrategy wiring is removed
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      assert(ext ne shared, "getOrCreate must have built a fresh session")
      val r = ext.sql(
        """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       vec_dot_int(array(2, 3), array(5, 7)) AS di,
          |       vec_norm(array(3.0D, 4.0D)) AS n,
          |       size(word_shingles('a b c d', 2)) AS s,
          |       poly_fingerprint('ab') AS fp,
          |       parse_bp('120/80').systolic AS sys,
          |       rp_bits(array(1.0F, -2.0F), 2, 4) AS bits,
          |       rp_project(array(1.0F, -2.0F), 2, 4) AS proj""".stripMargin).head()
      assert(r.getAs[Double]("d") == 11.0)
      assert(r.getAs[Long]("di") == 31L)
      assert(r.getAs[Double]("n") == 5.0)
      assert(r.getAs[Int]("s") == 3)
      assert(r.getAs[Long]("fp") == ('a'.toLong * 31 + 'b'.toLong) % 1000000007L)
      assert(r.getAs[Int]("sys") == 120)
      assert(!r.isNullAt(r.fieldIndex("bits")))
      // rp_project is rp_bits' pre-sign projection: the sign pattern of
      // the 4 projected doubles must equal the 4 bits
      val proj = r.getSeq[Double](r.fieldIndex("proj"))
      val bits = r.getAs[Long]("bits")
      assert(proj.length == 4)
      proj.zipWithIndex.foreach { case (v, p) =>
        assert(((bits >> p) & 1L) == (if (v >= 0) 1L else 0L)) }

      // the planner strategy rides the same extension: a native as-of
      // node must plan and execute WITHOUT AsofJoinPlan.register
      import org.apache.spark.sql.graftbridge.ColumnBridge
      import ext.implicits._
      val lp = ColumnBridge.logicalPlan(Seq((1, 10L), (1, 20L)).toDF("k", "t"))
      val rp = ColumnBridge.logicalPlan(Seq((1, 5L, "x")).toDF("k2", "t2", "v"))
      val asof = ColumnBridge.ofRows(ext, graft.plans.AsofJoinNode(lp, rp,
        lp.output(0), lp.output(1), rp.output(0), rp.output(1)))
      assert(asof.collect().length == 2)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
