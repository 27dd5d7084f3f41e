package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer) — the third member of the tokenizer family next to BPE
  * (train X68 / apply X108) and unigram-LM (X131). Two halves, the
  * family's train/apply discipline:
  *
  *  - TRAINING ([[wordpieceMerges]]) is BPE's merge loop with a
  *    different selection law: instead of the most FREQUENT adjacent
  *    pair, WordPiece merges the pair maximizing the likelihood ratio
  *    `count(ab) / (count(a) · count(b))` — frequency normalized by
  *    the parts' own frequencies, so rare-but-cohesive pairs beat
  *    common collocations of independently-common symbols (the
  *    HuggingFace-tokenizers trainer's exact scoring rule).
  *  - ENCODING ([[wordpieceEncode]]) is NOT a merge replay: BERT's
  *    WordPieceTokenizer greedily takes the LONGEST vocabulary prefix
  *    at each position (continuations spelled with a `##` prefix) and
  *    maps the whole word to `[UNK]` if any reached position has no
  *    match.
  *
  * Both laws are integer-exact and engine-portable: the training score
  * compares on the fixed grid `score_e9 = count(ab)·1e9 div
  * (count(a)·count(b))` (exact integer division in DECIMAL(38,0) —
  * no IEEE ratio ever orders the argmax), ties break on
  * `(score_e9 desc, pair_n desc, lhs, rhs)`, and the greedy match is
  * deterministic by construction — so the DuckDB oracle replays every
  * round's pair statistics, unigram counts, scored argmax, and the
  * per-word greedy walk verbatim.
  *
  * Symbol spelling IS position-typed, faithfully to the published
  * algorithm: a word seeds as `[c1, ##c2, ##c3, …]`; merging `(a, b)`
  * (b is always a `##`-continuation — only non-initial symbols appear
  * on the right of an adjacency) produces `a` + `b` minus its marker,
  * inheriting a's own position type. The final vocabulary is the seed
  * alphabet (initial chars plain + continuation chars marked) plus
  * every merge product — [[wordpieceVocab]] derives it, and encode
  * matches word-initial positions only against unmarked pieces and
  * later positions only against marked ones, exactly like BERT.
  *
  * Scale shape (the [[TextAnalysis.bpeMerges]] contract): the corpus
  * is read ONCE into the persisted word-frequency table; each training
  * round is two vocab-sized aggregations (pair + unigram counts — the
  * likelihood denominator needs current symbol frequencies, the one
  * structural cost over BPE) and a 1-row argmax collect; encode
  * segments only DISTINCT words (the greedy walk is one in-row
  * `aggregate` fold over the word's own vocab-match spans, ≤
  * maxWordLen² entries) and documents reassemble through one
  * term-keyed join — corpus work is independent of vocab size and
  * round count. */
object WordPiece {

  private val Alpha = "^[a-z0-9]+$"

  private def wsTokens(text: Column): Column = Dedup.wsTokens(text)

  /** Seed symbol array: first char plain, continuations `##`-marked. */
  private def seedSyms(w: Column): Column = {
    val chars = filter(split(w, ""), s => length(s) > 0)
    zip_with(chars, sequence(lit(1), size(chars)),
      (c, i) => when(i === 1, c).otherwise(concat(lit("##"), c)))
  }

  /** Merge product: the right symbol drops its continuation marker and
    * the left keeps its own position type. */
  private def mergedSym(a: String, b: String): String =
    a + (if (b.startsWith("##")) b.substring(2) else b)

  /** TRAIN: learn `k` WordPiece merges from the corpus. Words are the
    * whitespace tokens of the normalized text restricted to
    * `^[a-z0-9]+$` (the [[TextAnalysis.bpeMerges]] portability
    * contract — ASCII keeps Spark and SQL char indexing in agreement,
    * which is what lets the oracle replay the rounds). Returns
    * `(merge_rank, lhs, rhs, pair_n, score_e9)` — fewer than `k` rows
    * when the pair supply exhausts first. */
  def wordpieceMerges(docs: DataFrame, k: Int,
                      text: Column = col("text")): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = docs.sparkSession
    val words = docs.select(explode(wsTokens(text)).as("w"))
      .filter(col("w").rlike(Alpha))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words.withColumn("syms", seedSyms(col("w")))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      // one pass computes BOTH statistics the score needs: each word
      // contributes its adjacent pairs and its symbol occurrences
      val pairs = cur.select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("pc"))
      val uni = cur.select(col("n"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("n").as("uc"))
      val best = pairs
        .join(uni.withColumnRenamed("s", "a").withColumnRenamed("uc", "ua"),
          Seq("a"))
        .join(uni.withColumnRenamed("s", "b").withColumnRenamed("uc", "ub"),
          Seq("b"))
        .withColumn("score_e9", expr(
          "CAST(CAST(pc AS DECIMAL(38,0)) * 1000000000" +
            " div (CAST(ua AS DECIMAL(38,0)) * ub) AS BIGINT)"))
        .orderBy(col("score_e9").desc, col("pc").desc, col("a"), col("b"))
        .limit(1)
        .select("a", "b", "pc", "score_e9").collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((r, a, b, best(0).getLong(2), best(0).getLong(3)))
        val m = mergedSym(a, b)
        // greedy left-to-right non-overlapping merge scan — BPE's fold
        cur = cur.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, s) =>
            when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
                s === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
              .otherwise(concat(acc, array(s)))))
        r += 1
      }
    }
    words.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_n", "score_e9")
  }

  /** The encode vocabulary a training run defines: the corpus' seed
    * alphabet (initial chars plain, continuation chars `##`-marked)
    * plus every merge product. `merges` is [[wordpieceMerges]]' output
    * (or any (merge_rank, lhs, rhs) table). Output: (piece). */
  def wordpieceVocab(docs: DataFrame, merges: DataFrame,
                     text: Column = col("text")): DataFrame = {
    val alphabet = docs.select(explode(wsTokens(text)).as("w"))
      .filter(col("w").rlike(Alpha))
      .select(explode(seedSyms(col("w"))).as("piece"))
      .distinct()
    val products = merges.select(
      concat(col("lhs"),
        when(col("rhs").startsWith("##"), expr("substring(rhs, 3)"))
          .otherwise(col("rhs"))).as("piece"))
    alphabet.unionByName(products).distinct()
  }

  /** APPLY: BERT's WordPieceTokenizer over a learned vocabulary
    * ([[wordpieceVocab]]'s output — one `piece` column). Each distinct
    * eligible word walks greedily: at the current position take the
    * LONGEST vocab match (word-initial positions match unmarked
    * pieces, later positions `##`-marked ones); a reached position
    * with no match maps the whole word to `[UNK]`. Non-alphabet words
    * and words over `maxWordLen` chars pass through whole as a single
    * piece (the family's byte-fallback analogue; BERT's own
    * max_input_chars_per_word rule, with pass-through instead of UNK
    * so the operator composes with the other tokenizers' contract).
    * Documents reassemble through one term-keyed join + ordered
    * concat; output (doc_id, n_pieces, pieces) exactly like
    * [[TextAnalysis.bpeEncode]]. */
  def wordpieceEncode(docs: DataFrame, vocab: DataFrame,
                      maxWordLen: Int = 12,
                      id: Column = col("doc_id"),
                      text: Column = col("text")): DataFrame = {
    require(maxWordLen >= 1, s"maxWordLen=$maxWordLen")
    val words = docs.select(explode(wsTokens(text)).as("w")).distinct()
    val eligible = words
      .filter(col("w").rlike(Alpha) && length(col("w")) <= maxWordLen)
    // all (start, len) spans spelled with their position type; the
    // vocab join keeps only real matches — ≤ maxWordLen² per word
    val spans = eligible
      .select(col("w"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("i"))
      .select(col("w"), col("i"),
        explode(sequence(lit(1), length(col("w")) - col("i"))).as("len"))
      .withColumn("piece",
        when(col("i") === 0, expr("substring(w, 1, len)"))
          .otherwise(concat(lit("##"), expr("substring(w, i + 1, len)"))))
    val edgeT = "array<struct<i:int,len:int,piece:string>>"
    val edges = spans
      .join(vocab.select(col("piece")), Seq("piece"))
      .groupBy("w")
      .agg(collect_list(struct(col("i"), col("len"), col("piece")))
        .as("__es"))
    val es = coalesce(col("__es"), expr(s"CAST(array() AS $edgeT)"))
    // greedy walk as one in-row fold: state (pos, pieces, unk); each
    // step either consumes the longest match at pos or trips unk —
    // ≤ maxWordLen steps since every piece consumes ≥ 1 char
    val none = struct(lit(0).as("len"), lit("").as("piece"))
    val st0 = struct(lit(0).as("pos"),
      expr("CAST(array() AS array<string>)").as("ps"), lit(false).as("unk"))
    val walk = aggregate(sequence(lit(1), length(col("w"))), st0,
      (st, _) => {
        val bestAt = aggregate(
          filter(es, e => e.getField("i") === st.getField("pos")), none,
          (m, e) => when(e.getField("len") > m.getField("len"),
            struct(e.getField("len").as("len"),
              e.getField("piece").as("piece"))).otherwise(m))
        when(st.getField("unk") || st.getField("pos") >= length(col("w")),
          st)
          .otherwise(when(bestAt.getField("len") === 0,
            struct(st.getField("pos").as("pos"), st.getField("ps").as("ps"),
              lit(true).as("unk")))
            .otherwise(struct(
              (st.getField("pos") + bestAt.getField("len")).as("pos"),
              concat(st.getField("ps"), array(bestAt.getField("piece")))
                .as("ps"),
              lit(false).as("unk"))))
      })
    val segged = eligible.join(edges, Seq("w"), "left")
      .withColumn("__walk", walk)
      .select(col("w"),
        when(col("__walk").getField("unk"), array(lit("[UNK]")))
          .otherwise(col("__walk").getField("ps")).as("pieces"))
    val wp = words.join(segged, Seq("w"), "left")
      .select(col("w"),
        array_join(coalesce(col("pieces"), array(col("w"))), " ")
          .as("__ps"),
        coalesce(size(col("pieces")), lit(1)).cast("long").as("__np"))
    docs.select(id.as("doc_id"),
        posexplode_outer(wsTokens(text)).as(Seq("pos", "w")))
      .join(wp, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        coalesce(sum(when(col("pos").isNotNull, col("__np"))), lit(0L))
          .as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(when(col("pos").isNotNull,
            struct(col("pos"), col("__ps"))))),
          p => p.getField("__ps")), " ").as("pieces"))
  }
}
