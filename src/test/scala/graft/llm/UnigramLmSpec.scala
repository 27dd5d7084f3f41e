package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the unigram-LM tokenizer's deterministic hard-EM law against an
  * independent plain-Scala reference implementation of the same law —
  * the in-JVM analogue of the DuckDB oracle's replay. */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "banana bandana ban"),
    (1L, "banana banana cabana"),
    (2L, "ban cab anab anana"),
    (3L, "Mixed-CASE token!! banana"),
    (4L, "supercalifragilistic banana ban")   // overlong word (20 > 12)
  ).toDF("doc_id", "text")

  // ------------------------------------------------------ reference law
  private def refWords(texts: Seq[String], maxWordLen: Int)
      : Map[String, Long] =
    texts.flatMap(t => t.toLowerCase.replaceAll("\\s+", " ").split(" "))
      .filter(w => w.nonEmpty && w.matches("^[a-z0-9]+$") &&
        w.length <= maxWordLen)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  private def refSubs(w: String, maxPieceLen: Int): Seq[String] =
    for {
      i <- 0 until w.length
      l <- 1 to math.min(maxPieceLen, w.length - i)
    } yield w.substring(i, i + l)

  private def flog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  private def refCosts(model: Map[String, Long]): Map[String, Long] = {
    val shift = flog2(model.values.sum) + 1
    model.map { case (p, c) => p -> (shift - flog2(c)) }
  }

  /** Viterbi under the engine tie law: min (total, start index). */
  private def refSegment(w: String, costs: Map[String, Long],
                         maxPieceLen: Int): Option[Seq[String]] = {
    val Inf = 1000000000L
    val best = Array.fill(w.length + 1)((Inf, -1, ""))
    best(0) = (0L, -1, "")
    for (j <- 1 to w.length) {
      for (i <- math.max(0, j - maxPieceLen) until j) {
        val p = w.substring(i, j)
        costs.get(p).foreach { c =>
          if (best(i)._1 < Inf) {
            val cand = best(i)._1 + c
            if (cand < best(j)._1 ||
                (cand == best(j)._1 && i < best(j)._2))
              best(j) = (cand, i, p)
          }
        }
      }
    }
    if (best(w.length)._1 >= Inf) None
    else {
      var pos = w.length
      val out = scala.collection.mutable.ListBuffer.empty[String]
      while (pos > 0) { out.prepend(best(pos)._3); pos = best(pos)._2 }
      Some(out.toSeq)
    }
  }

  private def refTrain(texts: Seq[String], vocabSize: Int,
                       maxPieceLen: Int, iters: Int, maxWordLen: Int)
      : Map[String, Long] = {
    val wn = refWords(texts, maxWordLen)
    val cand = wn.toSeq.flatMap { case (w, n) =>
      refSubs(w, maxPieceLen).map(_ -> n) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val multi = cand.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
    val chars = cand.filter(_._1.length == 1).toSeq
    var model = (multi ++ chars).toMap
    for (_ <- 1 to iters) {
      val costs = refCosts(model)
      val uses = wn.toSeq.flatMap { case (w, n) =>
        refSegment(w, costs, maxPieceLen).get.map(_ -> n) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      model = uses.filter(_._1.length >= 2) ++
        model.keys.filter(_.length == 1)
          .map(c => c -> (uses.getOrElse(c, 0L) + 1L))
    }
    model
  }

  private val texts = docs.collect().map(_.getString(1)).toSeq

  test("unigramTrain matches the plain-Scala reference law exactly") {
    val got = UnigramLm.unigramTrain(docs, vocabSize = 8, maxPieceLen = 3,
        iters = 2, maxWordLen = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val model = refTrain(texts, 8, 3, 2, 12)
    val costs = refCosts(model)
    val want = model.toSeq.map { case (p, c) => (p, c, costs(p)) }
      .sortBy(_._1)
    assert(got.toSeq == want)
    // costs strictly positive, chars always covered
    assert(got.forall(_._3 > 0))
    val chars = refWords(texts, 12).keys.flatten.toSet
    assert(chars.map(_.toString).subsetOf(got.map(_._1).toSet))
  }

  test("unigramEncode reconstructs every word and matches the reference") {
    val model = UnigramLm.unigramTrain(docs, vocabSize = 8, maxPieceLen = 3,
      iters = 2, maxWordLen = 12)
    val enc = UnigramLm.unigramEncode(docs, model, maxPieceLen = 3,
      maxWordLen = 12)
    val got = enc.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val refModel = refTrain(texts, 8, 3, 2, 12)
    val costs = refCosts(refModel)
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .filter(_.nonEmpty).toSeq
      val pieces = words.flatMap { w =>
        if (!w.matches("^[a-z0-9]+$") || w.length > 12) Seq(w)
        else refSegment(w, costs, 3).getOrElse(Seq(w))
      }
      assert(got(id) == ((pieces.size.toLong, pieces.mkString(" "))),
        s"doc $id")
      // pieces re-concatenate to the original words
      assert(got(id)._2.replace(" ", "") == words.mkString(""))
    }
  }

  test("apply-time fallbacks: unknown char, non-alphabet, overlong words") {
    val model = UnigramLm.unigramTrain(docs, vocabSize = 8, maxPieceLen = 3,
      iters = 2, maxWordLen = 12)
    val other = Seq((9L, "zzz banana Mixed!! supercalifragilistic"))
      .toDF("doc_id", "text")
    val row = UnigramLm.unigramEncode(other, model, maxPieceLen = 3,
      maxWordLen = 12).collect().head
    val pieces = row.getString(2).split(" ").toSeq
    // 'z' never trained -> whole-word passthrough; same for the
    // non-alphabet and overlong words
    assert(pieces.contains("zzz"))
    assert(pieces.contains("mixed!!"))
    assert(pieces.contains("supercalifragilistic"))
  }

  test("EM prunes unused multi-char pieces; result partition-invariant") {
    val model = UnigramLm.unigramTrain(docs, vocabSize = 8, maxPieceLen = 3,
      iters = 2, maxWordLen = 12).collect()
    val refModel = refTrain(texts, 8, 3, 2, 12)
    // the seed had 8 multi-char pieces; pruning only ever shrinks
    assert(model.count(_.getString(0).length >= 2) <= 8)
    assert(model.map(_.getString(0)).toSet == refModel.keySet)
    val repart = UnigramLm.unigramTrain(docs.repartition(7), vocabSize = 8,
        maxPieceLen = 3, iters = 2, maxWordLen = 12)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(repart == model
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq)
  }
}
