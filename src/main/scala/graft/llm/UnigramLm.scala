package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — the alternative
  * every production tokenizer comparison includes (Kudo 2018, "Subword
  * Regularization"; the SentencePiece default): seed a substring
  * vocabulary from the corpus, then alternate (E) segmenting every word
  * under the current piece model with (M) re-estimating piece counts
  * from the segmentations, dropping pieces the model stopped using.
  * Completes the tokenizer family next to BPE train (X68) / apply
  * (X108) / budget sweep (X125) / fertility (X112).
  *
  * DETERMINISTIC HARD-EM VARIANT, by design: the published algorithm's
  * E-step uses forward–backward expected counts under real-valued log
  * probabilities — libm territory, engine-varying in the last ulp, so a
  * DuckDB oracle could never replay it bit-exactly. This engine's
  * variant (the [[TextAnalysis.bigramLmScore]] no-libm discipline
  * applied to tokenizer training) replaces both real-valued legs with
  * exact integer laws:
  *
  *  - piece cost = `(flog2(Σ counts) + 1) − flog2(count)` with
  *    `flog2(x) = length(bin(x)) − 1` — an exact integer floor-log2
  *    both engines compute identically; the cost is a quantized
  *    negative log probability (resolution one bit), strictly positive
  *    so longer segmentations always pay per piece;
  *  - the E-step is VITERBI (min total cost), not forward–backward —
  *    hard-EM, a published EM variant — with a total deterministic tie
  *    law: at each position the winning edge minimizes
  *    `(total cost, start index)`, so ties prefer the LONGER last
  *    piece and the segmentation is unique on any engine and
  *    partitioning.
  *
  * Training law, given (vocabSize, maxPieceLen, iters, maxWordLen):
  *
  *  1. word table: whitespace tokens of the normalized text (the
  *     [[Dedup.wsTokens]] law) that are lowercase-alphanumeric
  *     (`^[a-z0-9]+$`) and at most `maxWordLen` chars, with corpus
  *     occurrence counts. Non-alphabet and overlong words never train
  *     and pass through whole at apply time (the [[TextAnalysis.bpeMerges]]
  *     portability contract; overlong "words" are overwhelmingly junk
  *     and a fixed length bound also bounds the oracle's DP replay).
  *  2. seed model: every substring occurrence of length 1..maxPieceLen,
  *     corpus-weighted; the top `vocabSize` multi-char pieces by
  *     `(count desc, piece asc)` plus ALL observed single chars (the
  *     coverage floor — SentencePiece's required-character set).
  *  3. `iters` hard-EM rounds: cost the current model, Viterbi-segment
  *     every distinct word, count piece uses weighted by word
  *     frequency; multi-char pieces survive only if used (the unigram
  *     prune), single chars persist with `uses + 1` (Laplace floor, so
  *     coverage never regresses and every cost stays finite).
  *  4. output `(piece, n_uses, cost)` with the cost of the FINAL
  *     counts — the apply-ready model table.
  *
  * Scale shape: training cost is `iters × distinct words`, corpus-size
  * independent (the corpus is read once into the word-frequency table —
  * the [[TextAnalysis.bpeMerges]] shape); the seed top-k plans as
  * TakeOrderedAndProject, never a global window; segmentation joins the
  * word-substring spans against the vocab-sized model TERM-KEYED, then
  * runs the whole Viterbi DP as ONE in-row `aggregate` fold over each
  * word's own edge array (≤ maxWordLen × maxPieceLen entries) — the
  * model is never collected to the driver and no per-merge plan nesting
  * occurs (the [[TextAnalysis.bpeEncode]] depth problem doesn't arise:
  * plan depth is `iters`, not vocab size). */
object UnigramLm {

  private val Alpha = "^[a-z0-9]+$"

  /** Unreachable-state sentinel for the DP fold. Any reachable total is
    * ≤ maxWordLen × (64 + 1) ≪ this, and `Inf + cost` of a candidate
    * built on an unreachable prefix stays strictly above `Inf`, so such
    * a candidate can never beat the init state. */
  private val Inf = 1000000000L

  private def wsTokens(text: Column): Column = Dedup.wsTokens(text)

  private def trainWords(docs: DataFrame, maxWordLen: Int,
                         text: Column): DataFrame =
    docs.select(explode(wsTokens(text)).as("w"))
      .filter(col("w").rlike(Alpha) && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Driver-side twin of the cost law — `63 − nlz(x)` IS
    * `length(bin(x)) − 1` for x ≥ 1. */
  private def flog2L(x: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(x)

  /** The model is VOCAB-SIZED METADATA by contract (≤ vocabSize
    * multi-char pieces + the observed alphabet), so between EM rounds
    * it travels as a driver array and re-enters each round's plan as a
    * LITERAL frame — the [[TextAnalysis.bpeMerges]] per-round-collect
    * discipline. This bounds every round's logical plan at one
    * segmentation (without it the final model's plan stacks all
    * `iters` fold lineages, and ANALYZING that tree costs more driver
    * time than executing it — measured 0.8 s/plan at 38 pieces). */
  private def literalModel(spark: org.apache.spark.sql.SparkSession,
                           model: Array[(String, Long)]): DataFrame = {
    val tot = model.map(_._2).sum
    val shift = flog2L(tot) + 1L
    val rows = model.sortBy(_._1).map { case (p, c) =>
      org.apache.spark.sql.Row(p, c, shift - flog2L(c)) }
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("p",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cost",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** All (start, end, piece) spans of length 1..maxPieceLen per word —
    * the DP edge candidates before the model join. */
  private def spans(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("w"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("i"))
      .select(col("w"), col("i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - col("i")))).as("len"))
      .select(col("w"), col("i"), (col("i") + col("len")).as("j"),
        expr("substring(w, i + 1, len)").as("p"))

  /** Viterbi min-cost segmentation of each word under a (p, cost)
    * model: adds a `pieces` array column (null = unreachable — some
    * character is not in the model; the caller decides the fallback).
    * The whole DP runs as one in-row fold over the word's edge array;
    * ties break on (total cost, start index) — longer last piece wins —
    * so the result is unique regardless of edge-array order. */
  private def segmentWords(words: DataFrame, modelCost: DataFrame,
                           maxPieceLen: Int): DataFrame = {
    val edgeT = "array<struct<i:int,j:int,cost:bigint,p:string>>"
    val edges = spans(words.select("w"), maxPieceLen)
      .join(modelCost.select(col("p"), col("cost")), Seq("p"))
      .groupBy("w")
      .agg(collect_list(struct(col("i"), col("j"), col("cost"), col("p")))
        .as("__es"))
    val es = coalesce(col("__es"), expr(s"CAST(array() AS $edgeT)"))
    val len = length(col("w"))
    val initNode = struct(lit(0L).as("c"), lit(-1).as("b"), lit("").as("p"))
    val deadNode = struct(lit(Inf).as("c"), lit(-1).as("b"), lit("").as("p"))
    // best(j) for j = 0..len as an array of (cost, backpointer, piece):
    // position j's winner minimizes (acc(i).c + cost, i) over edges
    // ending at j; candidates on an unreachable prefix carry ≥ Inf and
    // never beat the dead init (they exceed it strictly)
    val best = aggregate(
      sequence(lit(1), len), array(initNode),
      (acc, j) => concat(acc, array(
        aggregate(
          filter(es, e => e.getField("j") === j),
          deadNode,
          (m, e) => {
            val cand =
              element_at(acc, e.getField("i") + 1).getField("c") +
                e.getField("cost")
            when(cand < m.getField("c") ||
                (cand === m.getField("c") &&
                  e.getField("i") < m.getField("b")),
              struct(cand.as("c"), e.getField("i").as("b"),
                e.getField("p").as("p")))
              .otherwise(m)
          }))))
    // backpointer walk: ≤ len steps (every piece consumes ≥ 1 char);
    // once pos reaches 0 the remaining steps are no-ops
    def walk(bestCol: Column): Column = {
      val st0 = struct(length(col("w")).as("pos"),
        expr("CAST(array() AS array<string>)").as("ps"))
      aggregate(sequence(lit(1), length(col("w"))), st0,
        (st, _) => {
          val node = element_at(bestCol, st.getField("pos") + 1)
          when(st.getField("pos") > 0,
            struct(node.getField("b").as("pos"),
              concat(array(node.getField("p")), st.getField("ps")).as("ps")))
            .otherwise(st)
        }).getField("ps")
    }
    words.join(edges, Seq("w"), "left")
      .withColumn("__best", best)
      .withColumn("pieces",
        when(element_at(col("__best"), length(col("w")) + 1)
            .getField("c") < Inf,
          walk(col("__best")))
          .otherwise(lit(null).cast("array<string>")))
      .drop("__es", "__best")
  }

  /** One hard-EM round over a driver-held model: segment under the
    * current model's costs (a literal frame), count corpus-weighted
    * piece uses (vocab-bounded — used pieces are a subset of the
    * model), keep used multi-char pieces and Laplace-floored single
    * chars. */
  private def emRound(wn: DataFrame, model: Array[(String, Long)],
                      maxPieceLen: Int): Array[(String, Long)] = {
    val segs = segmentWords(wn,
      literalModel(wn.sparkSession, model), maxPieceLen)
    val uses = segs.select(col("n"), explode(col("pieces")).as("p"))
      .groupBy("p").agg(sum("n").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val multiNext = uses.toSeq.filter(_._1.length >= 2)
    val charNext = model.map(_._1).filter(_.length == 1)
      .map(c => c -> (uses.getOrElse(c, 0L) + 1L)).toSeq
    (multiNext ++ charNext).toArray
  }

  /** TRAIN: learn a unigram-LM piece model from the corpus — the full
    * law in the object scaladoc. Output: (piece, n_uses, cost), the
    * apply-ready model for [[unigramEncode]]; a literal frame, because
    * the model IS driver metadata (each EM round runs eagerly — one
    * distributed segmentation pass, one vocab-bounded collect). */
  def unigramTrain(docs: DataFrame, vocabSize: Int, maxPieceLen: Int = 4,
                   iters: Int = 2, maxWordLen: Int = 12,
                   text: Column = col("text")): DataFrame = {
    require(vocabSize >= 1, s"vocabSize=$vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen=$maxPieceLen")
    require(iters >= 1, s"iters=$iters")
    require(maxWordLen >= 1, s"maxWordLen=$maxWordLen")
    // wn feeds the seed pass + every EM round — persist for the
    // operator's own actions, released before return
    val wn = trainWords(docs, maxWordLen, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cands = spans(wn.select("w"), maxPieceLen)
        .join(wn, Seq("w"))
        .groupBy("p").agg(sum("n").as("cnt"))
      // TakeOrderedAndProject, never a global window — (cnt, p) is a
      // total order (pieces are distinct)
      val multi = cands.filter(length(col("p")) >= 2)
        .orderBy(col("cnt").desc, col("p").asc).limit(vocabSize)
      val chars = cands.filter(length(col("p")) === 1)
      var model = multi.unionByName(chars).select(col("p"), col("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      for (_ <- 1 to iters) model = emRound(wn, model, maxPieceLen)
      literalModel(docs.sparkSession, model)
        .select(col("p").as("piece"), col("cnt").as("n_uses"), col("cost"))
    } finally { wn.unpersist(); () }
  }

  /** APPLY: encode the corpus under a learned model
    * ([[unigramTrain]]'s output verbatim — (piece, n_uses, cost)).
    * Each distinct word Viterbi-segments once under the model's stored
    * costs (the train-time tie law); non-alphabet words, words over
    * `maxWordLen`, and words with a character outside the model pass
    * through whole as a single piece (the byte-fallback analogue —
    * [[TextAnalysis.bpeEncode]]'s contract). Documents reassemble
    * through one term-keyed join + ordered concat; output
    * (doc_id, n_pieces, pieces) exactly like bpeEncode. `maxPieceLen`
    * and `maxWordLen` must match training's. */
  def unigramEncode(docs: DataFrame, model: DataFrame,
                    maxPieceLen: Int = 4, maxWordLen: Int = 12,
                    id: Column = col("doc_id"),
                    text: Column = col("text")): DataFrame = {
    val words = docs.select(explode(wsTokens(text)).as("w")).distinct()
    val eligible = words
      .filter(col("w").rlike(Alpha) && length(col("w")) <= maxWordLen)
    val segged = segmentWords(eligible,
      model.select(col("piece").as("p"), col("cost")), maxPieceLen)
    val wp = words.join(segged.select("w", "pieces"), Seq("w"), "left")
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
