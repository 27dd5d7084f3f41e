package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests pinning the value-parser column algebra to the Python
  * reference semantics (`etl.py:31-55`). ScalaCheck generators drive the
  * sampling; assertions run over the whole generated batch in one Spark
  * job rather than per-sample sessions. */
class ClinicalColsPropSpec extends SparkSpec {

  import spark.implicits._

  private def evalBp(values: Seq[String]): Map[String, (Option[Int], Option[Int])] =
    values.toDF("value").select(
      col("value"),
      ClinicalCols.bpSystolic(col("value")).as("sys"),
      ClinicalCols.bpDiastolic(col("value")).as("dia"))
      .collect()
      .map(r => r.getString(0) -> (
        Option(r.getAs[Any]("sys")).map(_.asInstanceOf[Int]),
        Option(r.getAs[Any]("dia")).map(_.asInstanceOf[Int]))).toMap

  /** Reference `parse_bp` reimplemented 1:1 for the property oracle. */
  private def refParseBp(s: String): (Option[Int], Option[Int]) = {
    if (s == null || s.isEmpty) return (None, None)
    val parts = s.split("/", -1)
    if (parts.length != 2) return (None, None)
    def toInt(p: String): Option[Int] = {
      val t = p.trim
      if (t.matches("^[+-]?[0-9]+$")) Some(t.toInt) else None
    }
    (toInt(parts(0)), toInt(parts(1))) match {
      case (Some(a), Some(b)) if a >= 50 && a <= 250 && b >= 30 && b <= 200 =>
        (Some(a), Some(b))
      case _ => (None, None)
    }
  }

  test("parse_bp: column algebra matches the reference on generated inputs") {
    val genPart = Gen.oneOf(
      Gen.choose(-50, 400).map(_.toString),
      Gen.alphaStr.map(_.take(4)),
      Gen.const(""), Gen.const(" 120 "), Gen.const("120.5"))
    val genValue = Gen.oneOf(
      for { a <- genPart; b <- genPart } yield s"$a/$b",
      for { a <- genPart; b <- genPart; c <- genPart } yield s"$a/$b/$c",
      genPart)
    val samples = Gen.listOfN(300, genValue).sample.get.distinct
    val got = evalBp(samples)
    samples.foreach { v =>
      assert(got(v) == refParseBp(v), s"for input '$v'")
    }
  }

  test("native ParseBloodPressure expression agrees with the column algebra " +
      "(interpreted AND codegen paths) on generated inputs") {
    val genPart = Gen.oneOf(
      Gen.choose(-50, 400).map(_.toString),
      Gen.alphaStr.map(_.take(4)),
      Gen.const(""), Gen.const(" 120 "), Gen.const("120.5"), Gen.const("+80"))
    val genValue = Gen.oneOf(
      for { a <- genPart; b <- genPart } yield s"$a/$b",
      for { a <- genPart; b <- genPart; c <- genPart } yield s"$a/$b/$c",
      genPart)
    val samples = Gen.listOfN(300, genValue).sample.get.distinct
    val rows = samples.toDF("value").select(
        col("value"),
        ParseBloodPressure(col("value")).as("bp"),
        ClinicalCols.bpSystolic(col("value")).as("sys"),
        ClinicalCols.bpDiastolic(col("value")).as("dia"))
      .collect()
    rows.foreach { r =>
      val native = Option(r.getAs[org.apache.spark.sql.Row]("bp"))
        .map(b => (b.getInt(0), b.getInt(1)))
      val algebra = Option(r.getAs[Any]("sys")).map(s =>
        (s.asInstanceOf[Int], r.getAs[Any]("dia").asInstanceOf[Int]))
      assert(native == algebra, s"for input '${r.getString(0)}'")
    }
  }

  test("parse_bp is SQL-callable via GraftExtensions function registration") {
    // same registration path as spark.sql.extensions, applied to the
    // already-built test session's registry
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_bp", exprs => ParseBloodPressure(exprs.head), "internal")
    val r = spark.sql(
      "SELECT parse_bp('120/80').systolic AS s, parse_bp('120-80') AS bad").head()
    assert(r.getAs[Int]("s") == 120)
    assert(r.isNullAt(1))
  }

  test("explicit pinned cases: both-or-neither, bounds, strict int") {
    val got = evalBp(Seq("120/80", "300/80", "120/250", "49/80", "120-80",
      "120/80/90", "12a/80", "120.5/80", " 120 / 80 ", "+120/80", "/", ""))
    assert(got("120/80") == (Some(120), Some(80)))
    assert(got("300/80") == (None, None))    // sys out of bounds
    assert(got("120/250") == (None, None))   // dia out of bounds
    assert(got("49/80") == (None, None))
    assert(got("120-80") == (None, None))
    assert(got("120/80/90") == (None, None)) // exactly two parts
    assert(got("12a/80") == (None, None))
    assert(got("120.5/80") == (None, None))  // Python int() rejects floats
    assert(got(" 120 / 80 ") == (Some(120), Some(80))) // int() strips
    assert(got("+120/80") == (Some(120), Some(80)))    // int() allows sign
    assert(got("/") == (None, None))
    assert(got("") == (None, None))
  }

  test("to_decimal: trim, empty->null, junk->null, precision kept to 4dp") {
    val vals = Seq("95.5", " 95.5 ", "", "abc", "1e2", "-3.25", "0.00005")
    val got = vals.toDF("v")
      .select(col("v"), ClinicalCols.toDecimal(col("v")).as("d")).collect()
      .map(r => r.getString(0) -> Option(r.getAs[java.math.BigDecimal]("d"))).toMap
    assert(got("95.5").map(_.doubleValue()) == Some(95.5))
    assert(got(" 95.5 ").map(_.doubleValue()) == Some(95.5))
    assert(got("") == None)
    assert(got("abc") == None)
    assert(got("1e2").map(_.doubleValue()) == Some(100.0)) // Decimal('1e2') parses too
    assert(got("-3.25").map(_.doubleValue()) == Some(-3.25))
  }

  test("merge algebra properties: min/max merge is commutative and associative") {
    val triples = Gen.listOfN(300, Gen.choose(-1000.0, 1000.0)).sample.get
      .grouped(3).filter(_.length == 3)
    triples.foreach { case List(x, y, z) =>
      val (a, b, c) = (BigDecimal(x), BigDecimal(y), BigDecimal(z))
      assert(a.min(b) == b.min(a))
      assert(a.min(b).min(c) == a.min(b.min(c)))
      assert(a.max(b) == b.max(a))
    }
  }
}
