package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the WordPiece tokenizer's laws against an independent
  * plain-Scala reference implementation — the in-JVM analogue of the
  * DuckDB oracle's round replay — plus hand-derived cases proving the
  * likelihood selection differs from BPE's frequency selection and the
  * BERT greedy-match edge cases (longest-first, [UNK], pass-through). */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------ reference law
  private def refWords(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => t.toLowerCase.replaceAll("\\s+", " ").split(" "))
      .filter(w => w.nonEmpty && w.matches("^[a-z0-9]+$"))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  private def seed(w: String): Vector[String] =
    w.zipWithIndex.map { case (c, i) =>
      if (i == 0) c.toString else "##" + c }.toVector

  private def refTrain(texts: Seq[String], k: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var words = refWords(texts).toSeq.map { case (w, n) => (seed(w), n) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val uni = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (syms, n) =>
        syms.foreach(s => uni(s) = uni.getOrElse(s, 0L) + n)
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1))
          pairs(key) = pairs.getOrElse(key, 0L) + n
        }
      }
      if (pairs.isEmpty) done = true
      else {
        val scored = pairs.toSeq.map { case ((a, b), pc) =>
          val s = (BigInt(pc) * 1000000000 / (BigInt(uni(a)) * uni(b)))
            .toLong
          (a, b, pc, s)
        }
        val (a, b, pc, s) = scored.minBy { case (a, b, pc, s) =>
          (-s, -pc, a, b) }
        out += ((r, a, b, pc, s))
        val m = a + b.stripPrefix("##")
        words = words.map { case (syms, n) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { sy =>
            if (acc.nonEmpty && acc.last == a && sy == b)
              acc(acc.size - 1) = m
            else acc += sy
          }
          (acc.toVector, n)
        }
        r += 1
      }
    }
    out.toSeq
  }

  private def refGreedy(w: String, vocab: Set[String]): Seq[String] = {
    var pos = 0
    val ps = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos < w.length) {
      var l = w.length - pos
      var hit = ""
      while (l >= 1 && hit.isEmpty) {
        val cand = (if (pos == 0) "" else "##") + w.substring(pos, pos + l)
        if (vocab(cand)) hit = cand else l -= 1
      }
      if (hit.isEmpty) return Seq("[UNK]")
      ps += hit
      pos += l
    }
    ps.toSeq
  }

  // ---------------------------------------------------------- fixtures
  private val texts = Seq(
    "banana bandana ban ban",
    "banana banana cabana nab",
    "Mixed-CASE token!! banana abcd",
    "dd dd dd dd dd qz qz")
  private lazy val docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("wordpiece train: five rounds equal the reference law " +
      "(scored argmax, marker-stripping merges)") {
    val got = WordPiece.wordpieceMerges(docs, k = 5)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long, Long)].collect().toSeq
    assert(got == refTrain(texts, 5))
  }

  test("wordpiece train: likelihood argmax is NOT frequency argmax — " +
      "a rare cohesive pair beats the most frequent pair") {
    // (d,##d): pc=4, both counts 4 -> score 4e9/16 = 2.5e8 — wins over
    // (b,##a): pc=6 but a-continuations are everywhere
    val m1 = refTrain(texts, 1).head
    assert((m1._2, m1._3) == ("q", "##z") || (m1._2, m1._3) == ("d", "##d"))
    val freqArgmax = {
      val words = refWords(texts).toSeq.map { case (w, n) => (seed(w), n) }
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + n } }
      pairs.maxBy { case ((a, b), c) => (c, a, b) }._1
    }
    assert((m1._2, m1._3) != freqArgmax,
      s"likelihood argmax ${(m1._2, m1._3)} must differ from " +
        s"frequency argmax $freqArgmax on this corpus")
    // and the engine agrees (already pinned by the full-equality test)
  }

  test("wordpiece vocab: seed alphabet (position-typed) plus merge " +
      "products") {
    val merges = WordPiece.wordpieceMerges(docs, k = 3)
    val voc = WordPiece.wordpieceVocab(docs, merges)
      .as[String].collect().toSet
    // position-typed seed chars
    assert(voc.contains("b") && voc.contains("##a") && voc.contains("##n"))
    // a char that never starts a word is not an initial piece
    assert(!voc.contains("z") && voc.contains("##z"))
    // every merge product present
    val prods = merges.select(
      concat(col("lhs"), expr("substring(rhs, 3)"))).as[String].collect()
    prods.foreach(p => assert(voc.contains(p), s"missing product $p"))
  }

  test("wordpiece encode: greedy longest-match, [UNK], pass-through, " +
      "empty docs") {
    val vocab = Seq("ab", "abc", "##d", "##cd", "##c", "x")
      .toDF("piece")
    val enc = Seq(
      (0L, "abcd"),    // longest-first: abc ##d (not ab ##cd)
      (1L, "abx"),     // ##x not in vocab -> [UNK] (x is initial-only)
      (2L, "toolongtoolong ab-cd"), // overlong + non-alpha pass through
      (3L, ""),        // empty doc
      (4L, "abcd abcd abd")  // abd: greedy backs off to ab ##d
    ).toDF("doc_id", "text")
    val got = WordPiece.wordpieceEncode(enc, vocab, maxWordLen = 12)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, "abc ##d"),
      (1L, 1L, "[UNK]"),
      (2L, 2L, "toolongtoolong ab-cd"),
      (3L, 0L, ""),
      (4L, 6L, "abc ##d abc ##d ab ##d")))
    // the reference greedy law agrees on the eligible words
    val v = vocab.as[String].collect().toSet
    assert(refGreedy("abcd", v) == Seq("abc", "##d"))
    assert(refGreedy("abx", v) == Seq("[UNK]"))
  }

  test("wordpiece encode: self-encode of the training corpus never " +
      "UNKs and is partitioning-invariant") {
    val merges = WordPiece.wordpieceMerges(docs, k = 5)
    val voc = WordPiece.wordpieceVocab(docs, merges)
    val a = WordPiece.wordpieceEncode(docs, voc)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(a.forall(r => !r._3.contains("[UNK]")),
      "every (char, position-type) of the corpus is in its own vocab")
    val b = WordPiece.wordpieceEncode(docs.repartition(7), voc)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(a == b)
    // and the greedy reference law agrees word by word
    val vs = voc.as[String].collect().toSet
    val w = "banana"
    val expect = refGreedy(w, vs).mkString(" ")
    val row = WordPiece.wordpieceEncode(
      Seq((9L, w)).toDF("doc_id", "text"), voc)
      .as[(Long, Long, String)].collect().head
    assert(row._3 == expect)
  }
}
