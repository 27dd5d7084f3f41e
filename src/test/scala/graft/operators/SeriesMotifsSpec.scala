package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Behavior pins for the time-series motif similarity pipeline. */
class SeriesMotifsSpec extends SparkSpec {

  import spark.implicits._

  // one event per hour per user; users 1 and 2 trace the same sawtooth,
  // user 3 the inverted one — values chosen so equal-width 4-band
  // symbolization is unambiguous (global range [0, 400))
  private def mkEvents = {
    val saw = Seq(0.0, 100.0, 200.0, 300.0, 399.0, 300.0, 200.0, 100.0,
      0.0, 100.0, 200.0, 300.0)
    val inv = saw.map(399.0 - _)
    val rows = for {
      (u, vals) <- Seq((1L, saw), (2L, saw), (3L, inv))
      (v, h) <- vals.zipWithIndex
    } yield (u, Timestamp.valueOf(f"2024-01-01 ${h}%02d:30:00"), v)
    rows.toDF("user_id", "ts", "value")
  }

  test("symbolize: exact integer means and equal-width global bands") {
    val sym = SeriesMotifs.symbolize(mkEvents, col("user_id"), col("ts"),
        col("value"), bucketMillis = 3600000L, alphabet = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // global range: lo = 0, hi = 399000 (scaled); bands of width ~99750
    // value 0 -> 0, 100 -> band 1, 200 -> band 2, 300/399 -> band 3
    val base = sym.keys.map(_._2).min
    assert(sym((1L, base)) == 0L)        // 0.0
    assert(sym((1L, base + 1)) == 1L)    // 100.0
    assert(sym((1L, base + 2)) == 2L)    // 200.0
    assert(sym((1L, base + 3)) == 3L)    // 300.0
    assert(sym((1L, base + 4)) == 3L)    // 399.0
    assert(sym((3L, base)) == 3L)        // inverted start 399.0
  }

  test("motif pairs find the users tracing the same pattern, not the inverse") {
    for (portable <- Seq(false, true)) {
      val sym = SeriesMotifs.symbolize(mkEvents, col("user_id"), col("ts"),
        col("value"), bucketMillis = 3600000L, alphabet = 4)
      val pairs = SeriesMotifs.motifPairs(sym, w = 6, minShared = 3,
          portable = portable)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getAs[Long]("shared_motifs")).toMap
      // users 1 and 2 share every one of their 7 distinct 6-symbol motifs;
      // user 3's inverted series shares none
      assert(pairs.keySet == Set((1L, 2L)))
      assert(pairs((1L, 2L)) == 7L)
    }
  }

  test("ubiquitous motifs are capped out like degenerate LSH buckets") {
    // every user flat at the same value -> all motifs shared by all keys;
    // with maxKeys = 2 and three users, every motif is dropped
    val flat = (for { u <- 1L to 3L; h <- 0 until 8 }
      yield (u, Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), 50.0))
      .toDF("user_id", "ts", "value")
    val sym = SeriesMotifs.symbolize(flat, col("user_id"), col("ts"),
      col("value"), bucketMillis = 3600000L)
    assert(SeriesMotifs.motifPairs(sym, w = 4, minShared = 1, maxKeys = 2)
      .count() == 0)
    // raising the cap admits them again
    assert(SeriesMotifs.motifPairs(sym, w = 4, minShared = 1, maxKeys = 3)
      .count() == 3)
  }

  test("bucket outliers: exact 2-sigma rule flags the spike, not the noise") {
    // user 1: nine buckets at 100 and one at 400 — the spike is far past
    // 2 sigma; user 2: flat series, zero variance, nothing flags
    val rows = ((0 until 9).map(h =>
        (1L, Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), 100.0)) :+
        ((1L, Timestamp.valueOf("2024-01-01 09:00:00"), 400.0))) ++
      (0 until 10).map(h =>
        (2L, Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), 250.0))
    val out = SeriesMotifs.bucketOutliers(rows.toDF("user_id", "ts", "value"),
        col("user_id"), col("ts"), col("value"), bucketMillis = 3600000L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 400000L)))
    // driver rederivation of the exact cross-multiplied rule for the spike:
    // n=10, S=9*100000+400000, dev = n*m - S, flag iff dev^2 > 4(nQ - S^2)
    val ms = Seq.fill(9)(100000L) :+ 400000L
    val n = ms.size.toLong
    val s = ms.sum
    val q = ms.map(m => BigInt(m) * m).sum
    def flagged(m: Long) = {
      val dev = BigInt(n * m - s)
      dev * dev > 4 * (BigInt(n) * q - BigInt(s) * s)
    }
    assert(ms.count(flagged) == 1 && flagged(400000L))
  }

  test("bucket outliers survive large magnitudes (squares never wrap long)") {
    // m ~ 1.6e10 for the spike: m^2 = 2.56e20 overflows Long silently if
    // squared before entering decimal — the flag must still be exact
    val rows = (0 until 9).map(h =>
        (1L, Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00"), 4.0e6)) :+
      ((1L, Timestamp.valueOf("2024-01-01 09:00:00"), 1.6e7))
    val out = SeriesMotifs.bucketOutliers(rows.toDF("user_id", "ts", "value"),
        col("user_id"), col("ts"), col("value"), bucketMillis = 3600000L)
      .collect().map(_.getLong(2))
    assert(out.toSeq == Seq(16000000000L))
    val ms = Seq.fill(9)(4000000000L) :+ 16000000000L
    val n = ms.size.toLong; val s = ms.sum
    val q = ms.map(m => BigInt(m) * m).sum
    def flagged(m: Long) = {
      val dev = BigInt(n) * m - s
      dev * dev > 4 * (BigInt(n) * q - BigInt(s) * s)
    }
    assert(ms.count(flagged) == 1 && flagged(16000000000L))
  }

  test("pre-epoch timestamps bucket by floor, not truncation toward zero") {
    val d = Seq((1L, new Timestamp(-3600000L), 10.0),
        (1L, new Timestamp(-1L), 20.0))
      .toDF("user_id", "ts", "value")
    val b = SeriesMotifs.bucketMeans(d, col("user_id"), col("ts"),
        col("value"), bucketMillis = 3600000L)
      .select("b").collect().map(_.getLong(0)).toSeq
    // both events precede the epoch: floor puts them in bucket -1; a
    // truncating division would claim bucket 0
    assert(b == Seq(-1L))
  }

  test("motif pairs are stable under repartitioning") {
    val sym = SeriesMotifs.symbolize(mkEvents.repartition(7), col("user_id"),
      col("ts"), col("value"), bucketMillis = 3600000L)
    val a = SeriesMotifs.motifPairs(sym, w = 6, minShared = 3)
      .collect().map(_.toSeq).toSet
    val b = SeriesMotifs.motifPairs(sym.repartition(5), w = 6, minShared = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}
