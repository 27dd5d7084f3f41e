package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure column algebra over a `text` column — every operator is a
  * narrow map that stays inside whole-stage codegen and scales linearly
  * with no shuffle; downstream groupBys shuffle only the derived (small)
  * columns.
  */
object TextAnalysis {

  /** Whitespace-delimited token count (cheap, exact for single-space
    * text). Deliberately RAW split semantics: leading/trailing
    * whitespace contributes an empty edge token (" a b" counts 3), the
    * same tokenization the q34/q42 DuckDB oracles replay — a cheap
    * upper bound, not a linguistic count. Use [[Dedup.wsTokens]] where
    * empty tokens must not count (the span/index family does). */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, 0)
      .otherwise(size(split(text, "\\s+")))

  /** BPE-ish pre-tokenizer pattern: letter runs, digit runs, or a single
    * non-space symbol — the standard word-piece shape. The character
    * classes are explicit (no `\s`, no lookaround) so the SAME pattern
    * means the same thing in Java regex and RE2 (the DuckDB oracle). */
  val SubwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"

  /** BPE-ish subword token estimate via `regexp_extract_all` — one
    * codegen'd pass, engine-portable semantics. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SubwordPattern), lit(0)))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text))

  /** Alphabetic character ratio. */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") / length(text))

  /** Stopword hit ratio against a small English function-word list —
    * the classic C4/Gopher-style quality signal. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "that", "for", "with")

  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(Stopwords: _*))).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length, punctuation and stopword
    * signals (Gopher-rule-shaped heuristic; weights are engine policy). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punct = punctRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    lenScore * 0.4 + (lit(1.0) - least(punct * 4.0, lit(1.0))) * 0.3 + stop * 0.3
  }

  /** N-gram-heuristic language ID: score per language = hits of that
    * language's marker function words; argmax wins, "und" when no hits.
    * Deterministic tie-break: equal scores go to the lexicographically
    * GREATEST language code (`array_max` over (score, lang) structs —
    * the q35 oracle replays exactly this desc order). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec"),
    "es" -> Seq("el", "los", "las", "es", "con", "para"),
    "zh" -> Seq("的", "是", "和", "在", "了", "不"))

  def languageId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scored = Markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit rolling-style content fingerprint (xxhash64 of the normalized
    * text) — stable document identity for dedup bookkeeping. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** Vocabulary growth curve — the Heaps-law corpus-scaling diagnostic:
    * split the corpus into `slices` deterministic same-law samples (the
    * md5 value cut — a pure projection, no rank, no shuffle to order
    * anything) and report, per slice, the documents, tokens, NEW
    * distinct terms (terms whose first slice this is), and the
    * cumulative vocabulary. Reading the curve tells a pipeline how
    * vocabulary scales with data: a flattening curve means more data
    * buys repetition (dedup and tokenizer budgets can be extrapolated
    * from the S points), a linear one means the domain is still open.
    *
    * Law (all exact integers): a document's slice is
    * `(hash(id) * slices) div 16^7 + 1` (the [[Sampling.hashBucket]]
    * space — the same deterministic assignment the samplers use, so
    * "first 3 slices" IS a 30% sample another operator would draw); a
    * term's first slice is the MIN slice over documents containing it;
    * `cum_terms` accumulates new terms in slice order. Slices
    * hash-balance to ±noise, not exactly n/slices — that is the
    * sampling law, not a defect.
    *
    * Scale shape: one narrow projection assigns slices, one
    * term-keyed groupBy takes the min slice (partial-aggregated), and
    * the cumulative window runs over the ≤`slices`-row summary —
    * metadata-sized, never over corpus rows. */
  def vocabGrowth(docs: DataFrame, slices: Int = 10,
                  id: Column = col("doc_id"),
                  text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slices >= 1, s"slices=$slices")
    val sliced = docs
      .select(id.as("doc_id"), wsTokens(text).as("__t"),
        Sampling.hashBucket(id).as("__hb"))
      .withColumn("slice",
        expr(s"CAST((__hb * $slices) div 268435456 AS INT) + 1"))
    val docStats = sliced.groupBy("slice")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("__t")).cast("long")).as("n_tokens"))
    val newTerms = sliced
      .select(col("slice"), explode(col("__t")).as("__term"))
      .groupBy("__term").agg(min("slice").as("slice"))
      .groupBy("slice").agg(count(lit(1)).as("new_terms"))
    docStats.join(newTerms, Seq("slice"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      // the cumulative window orders the <=`slices`-row summary only
      .withColumn("cum_terms",
        sum(col("new_terms")).over(Window.orderBy(col("slice"))))
      .select(col("slice"), col("n_docs"), col("n_tokens"),
        col("new_terms"), col("cum_terms"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    * MOSS local fingerprinting scheme): from every window of `w`
    * consecutive token-k-gram hashes, select the minimum (rightmost
    * position on hash ties) — the published scheme with the GUARANTEE
    * plain sampling lacks: any shared substring of at least `w+k-1`
    * tokens between two documents yields at least one IDENTICAL
    * selected fingerprint in both, while storing ~2/(w+1) of the
    * all-k-grams table ([[graft.llm.Dedup.dupSpans]]' full-density
    * complement — winnow when the index must be sparse, keep every
    * gram when spans must be exact). Fingerprints use the engine's
    * portable md5 bucketer over the gram text, so selections replay
    * cross-engine exactly.
    *
    * Law (exact, deterministic): grams are the `g = n-k+1` token
    * k-grams of the whitespace-normalized text; windows are
    * `[s, s+w')` for `s = 0..g-w'` with `w' = min(w, g)` (a document
    * shorter than one full window winnows its single short window —
    * every document with at least one gram yields at least one
    * fingerprint); each window selects `argmin by (hash asc, pos
    * desc)`; the result is the DISTINCT (doc_id, pos, fp) set — one
    * row per selected position, exactly the published "record the
    * selected hash once per position" form.
    *
    * Scale shape: one narrow gram projection (tokens materialize
    * once), each gram expands to at most `w` window memberships (a
    * constant-factor explode, linear in corpus size), one
    * (doc, window) partial-aggregated argmin, one distinct — every
    * shuffle key is (doc_id, position)-grained; nothing is quadratic
    * and no window function sorts a whole document through one task. */
  def winnowFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4,
                         id: Column = col("doc_id"),
                         text: Column = col("text")): DataFrame = {
    require(k >= 1 && w >= 1, s"k=$k w=$w")
    val grams = docs
      .select(id.as("doc_id"), wsTokens(text).as("__t"))
      .select(col("doc_id"), size(col("__t")).as("__n"),
        // sequence(1, 0) would DESCEND, not empty — guard the n < k case
        // explicitly (such docs have no gram and produce no row)
        posexplode(when(size(col("__t")) >= k, transform(
            sequence(lit(1), size(col("__t")) - (k - 1)),
            i => concat_ws(" ", slice(col("__t"), i, lit(k)))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("pos", "__gram")))
      .select(col("doc_id"), (col("__n") - (k - 1)).as("__g"), col("pos"),
        Sampling.hashBucket(col("__gram")).as("fp"))
    // each gram joins its window memberships: s in
    // [max(0, pos-w'+1), min(pos, g-w')], w' = min(w, g)
    val member = grams
      .withColumn("__w", least(lit(w), col("__g")))
      .select(col("doc_id"), col("pos"), col("fp"),
        explode(sequence(
          greatest(col("pos") - col("__w") + 1, lit(0)),
          least(col("pos"), col("__g") - col("__w")))).as("__s"))
    member
      .groupBy(col("doc_id"), col("__s"))
      .agg(min(struct(col("fp"), (-col("pos")).as("__np"))).as("__m"))
      .select(col("doc_id"), (-col("__m.__np")).as("pos"),
        col("__m.fp").as("fp"))
      .distinct()
  }

  /** The MOSS MATCH step over [[winnowFingerprints]] output — "where
    * did this text come from": rank corpus documents by the number of
    * DISTINCT winnowing fingerprints they share with each query
    * document. The winnowing guarantee makes a zero here meaningful:
    * no shared fingerprint ⇒ no shared substring of ≥ w+k-1 tokens
    * (with the caveat below), which is what lets a sparse index answer
    * provenance/attribution queries a full-gram index would answer at
    * (w+1)/2 times the storage.
    *
    * Law: fingerprint sets are DISTINCT per doc (a print selected at
    * several positions counts once); a fingerprint present in more
    * than `maxDf` corpus documents is a stop-fingerprint and drops
    * from the evidence (the inverted-index maxDf discipline —
    * boilerplate is fanout, not provenance; this is the caveat on the
    * zero-means-nothing-shared reading); `shared` counts surviving
    * common prints per (query, corpus doc), ranking per query is
    * (shared desc, doc_id asc) cut at `topK`, and `coverage_scaled =
    * 1e9·shared div q_prints` reports evidence mass against the
    * query's own (uncapped) print count. Self-matches excluded by
    * default; queries with no surviving candidate produce no row.
    *
    * Scale shape: the corpus side is the LANDED fingerprint store (one
    * narrow table, ~2/(w+1) of the gram count); the query side is
    * query-set-sized and broadcasts (the [[bm25TopK]] contract); the
    * df guard partial-aggregates to fingerprint cells before the join;
    * the per-query cut is a map-side WindowGroupLimit. Nothing
    * quadratic, the corpus never rescans text. */
  def winnowMatches(corpusFps: DataFrame, queryFps: DataFrame,
                    topK: Int = 5, maxDf: Int = 100,
                    excludeSelf: Boolean = true): DataFrame = {
    require(topK >= 1 && maxDf >= 1, s"topK=$topK maxDf=$maxDf")
    import scala.jdk.CollectionConverters._
    val spark = corpusFps.sparkSession
    // The query side is query-set-sized and broadcasts BY CONTRACT (the
    // bm25TopK discipline) — so land it driver-side once (the
    // rankStatistics bounded metadata-collect pattern): its distinct
    // print set, per-query totals, and fp membership become
    // LocalRelations whose broadcast builds launch no jobs. The corpus
    // is then restricted to QUERY fingerprints BEFORE its per-doc
    // distinct (guide §2.3: shuffle fewer bytes) — only query-held
    // prints can produce evidence, and a fp's document frequency is
    // unchanged by dropping OTHER fps, so the df guard still counts the
    // true corpus-wide df per surviving print while the corpus distinct
    // collapses from print-table scale to the query-relevant slice.
    val qpPlan = queryFps.select(col("doc_id").as("query_id"), col("fp"))
      .distinct()
    val qpRows = qpPlan.collect()
    val qp = spark.createDataFrame(
      java.util.Arrays.asList(qpRows: _*), qpPlan.schema)
    val fpField = qpPlan.schema("fp")
    val qFpSet = spark.createDataFrame(
      qpRows.map(r => org.apache.spark.sql.Row(r.get(1)))
        .distinct.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(fpField)))
    val qTotals = spark.createDataFrame(
      qpRows.groupBy(_.get(0)).map { case (q, rs) =>
        org.apache.spark.sql.Row(q, rs.length.toLong)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        qpPlan.schema("query_id"),
        org.apache.spark.sql.types.StructField("q_prints",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val cp = corpusFps.select(col("doc_id"), col("fp"))
      .join(broadcast(qFpSet), Seq("fp"))
      .distinct()
    val dfs = cp.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("fp")
    val shared = cp.join(dfs, Seq("fp"))
      .join(broadcast(qp), Seq("fp"))
      .filter(if (excludeSelf) col("doc_id") =!= col("query_id")
        else lit(true))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("shared"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("shared").desc, col("doc_id"))
    shared.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .join(broadcast(qTotals), Seq("query_id"))
      .withColumn("coverage_scaled",
        expr("(CAST(1000000000 AS BIGINT) * shared) div q_prints"))
      .select(col("query_id"), col("rank"), col("doc_id"), col("shared"),
        col("q_prints"), col("coverage_scaled"))
  }

  /** PII redaction patterns, applied in order. Explicit character classes
    * only — no lookaround, no `\s`, no `\d` — so Java regex (the engine)
    * and RE2 (the DuckDB oracle) read each pattern identically. Email
    * before IP before phone before bare long-digit runs, so each later
    * pattern sees the residue of the earlier ones. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}" -> "<PHONE>",
    "[0-9]{9,}" -> "<ID>")

  /** Redact emails, IPv4 addresses, phone numbers, and long digit runs
    * (account/ID numbers) with typed placeholders — the standard scrub
    * pass before text enters a training corpus. Pure codegen'd
    * `regexp_replace` chain: linear, no shuffle. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Per-category PII hit counts (pre-redaction) — the audit side of
    * [[redactPii]]: what a scrub of this corpus would remove. Counted
    * against the same residue chain the redactor produces, so
    * `sum(counts) == number of placeholders inserted`. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val (_, counts) = PiiPatterns.foldLeft((text, Seq.empty[(String, Column)])) {
      case ((c, acc), (pat, rep)) =>
        val name = rep.stripPrefix("<").stripSuffix(">").toLowerCase
        (regexp_replace(c, pat, rep),
          acc :+ (s"n_$name" -> size(regexp_extract_all(c, lit(pat), lit(0)))))
    }
    counts
  }

  /** Gopher/C4-style curation flags, one pass of column algebra per
    * document: word count, mean word length, vocabulary diversity
    * (unique-word and duplicate-bigram fractions), alphabetic-word
    * fraction, stopword presence, and the composite `keep` decision.
    * Every signal is linear in document size (no per-word quadratic
    * loops) and shuffles nothing; the token array is materialized ONCE
    * in a projection because HOF lambdas get no common-subexpression
    * elimination. Thresholds follow the published Gopher rules where the
    * signal exists at word level (this corpus has no line structure):
    * word count bounds, mean word length in [3,10], >=80% words
    * alphabetic, >=2 stopword hits, <=30% duplicate bigrams. */
  def curationFlags(docs: DataFrame, text: Column = col("text"),
                    minWords: Int = 20, maxWords: Int = 100000): DataFrame = {
    // null text tokenizes to the EMPTY array (the wsTokens law): the
    // raw split of null is null, which would make every metric AND the
    // keep flag null — a doc that vanishes from both sides of the
    // curation decision. With the coalesce it reports n_words 0 and
    // keep 0 like any other empty document.
    val raw = coalesce(split(Dedup.normalized(text), " "),
      array().cast("array<string>"))                   // matches WordShingles tokens
    val arrs = docs.select(col("doc_id"), text.as("__text"), raw.as("__raw"),
      filter(raw, t => length(t) > 0).as("__toks"))
    val toks = col("__toks")
    val n = size(toks)
    val nBigramsTotal = greatest(size(col("__raw")) - 1, lit(0))
    val flags = arrs.select(
      col("doc_id"),
      n.as("n_words"),
      when(n === 0, 0.0).otherwise(
        aggregate(toks, lit(0), (a, t) => a + length(t)).cast("double") / n)
        .as("mean_word_len"),
      when(n === 0, 0.0).otherwise(
        size(array_distinct(toks)).cast("double") / n).as("frac_unique_words"),
      when(nBigramsTotal === 0, 0.0).otherwise(
        lit(1.0) - size(Dedup.shingles(col("__text"), 2)).cast("double")
          / nBigramsTotal).as("frac_dup_bigrams"),
      when(n === 0, 0.0).otherwise(
        size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / n)
        .as("frac_alpha_words"),
      size(filter(toks, t => t.isin(Stopwords: _*))).as("stop_hits"))
    flags.select(col("*"),
      (col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("frac_alpha_words") >= 0.8 &&
        col("stop_hits") >= 2 &&
        col("frac_dup_bigrams") <= 0.3).cast("int").as("keep"))
  }

  /** Whitespace tokens of normalized text — delegates to the single
    * shared tokenization in [[Dedup.wsTokens]] (null text -> empty
    * array), so the index/classifier/repetition operators and the
    * span/scrub family can never tokenize differently. */
  private def wsTokens(text: Column): Column = Dedup.wsTokens(text)

  /** Inverted index: one row per term with its document frequency and
    * the first `maxPostings` doc ids. The posting cap is enforced
    * MAP-SIDE: the `row_number <= k` filter rewrites to Spark's
    * WindowGroupLimit, so each task forwards at most k rows per term
    * into the shuffle and the grouped posting array is bounded at k
    * elements — a stop-word's full posting list (O(corpus) doc ids, a
    * guaranteed 2 GB-row blowup at 100 TB) is never materialized. The
    * df count aggregates partially for the same reason. */
  def invertedIndex(docs: DataFrame, minDf: Long = 1, maxPostings: Int = 10,
                    id: Column = col("doc_id"),
                    text: Column = col("text")): DataFrame = {
    val terms = docs.select(id.as("doc_id"),
      explode(array_distinct(wsTokens(text))).as("term"))
    val dfs = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val postings = terms
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPostings)
      .groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
    dfs.filter(col("df") >= minDf).join(postings, Seq("term"))
  }

  /** Per-slice keyness: the terms most over-represented in each slice
    * of the corpus relative to everything else — the "what makes this
    * source different" readout (corpus-linguistics keyness; the
    * class-based cousin of tf-idf). Scored by the exact integer
    * rate-ratio surrogate
    * `score_e6 = a * (n_other + 1) * 1e6 div ((b + 1) * n_slice)`
    * (a/b = term count in/out of the slice, n = token totals;
    * add-one keeps slice-exclusive terms finite, and log-free integer
    * arithmetic keeps the ranking engine-portable). One (term, slice)
    * count shuffle; term totals re-aggregate from it (b = total - a,
    * never a second corpus pass); slice totals are a broadcast; the
    * per-slice top-k rewrites to WindowGroupLimit so the map side
    * prunes before the shuffle. */
  def keyTerms(docs: DataFrame, k: Int = 10,
               slice: Column = col("source"),
               text: Column = col("text")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k")
    val ts = docs.filter(slice.isNotNull)
      .select(slice.as("src"), explode(wsTokens(text)).as("term"))
    val perSlice = ts.groupBy("src", "term").agg(count(lit(1)).as("a"))
    val termTot = perSlice.groupBy("term").agg(sum("a").as("tot"))
    val sliceTot = perSlice.groupBy("src").agg(sum("a").as("n_slice"))
    val grand = sliceTot.agg(sum("n_slice").as("n_all"))
    val scored = perSlice
      .join(termTot, Seq("term"))
      .join(broadcast(sliceTot), Seq("src"))
      .crossJoin(broadcast(grand))
      .withColumn("b", col("tot") - col("a"))
      .withColumn("score_e6", expr(
        "CAST(a AS DECIMAL(38,0)) * (n_all - n_slice + 1) * 1000000" +
          " div (CAST(b + 1 AS DECIMAL(38,0)) * n_slice)"))
    val w = Window.partitionBy("src")
      .orderBy(col("score_e6").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("term"), col("a"), col("b"),
        col("score_e6"))
  }

  /** Positional phrase search — exact multi-word match over the corpus,
    * the positional-index complement to [[bm25TopK]]'s bag-of-words
    * retrieval. Set-based, not a join chain: each phrase pre-tokenizes
    * on the driver into (phrase, offset, term) rows that BROADCAST-join
    * the corpus' positional postings; a posting for (phrase, offset)
    * votes for anchor `pos - offset`, and an anchor where the DISTINCT
    * offsets seen equal the phrase length is a match ("a b a" works:
    * one term may carry several offsets). One narrow posexplode + one
    * broadcast join + one aggregation — m-word phrases cost the same
    * plan as 2-word phrases, where the classic adjacency-join lowering
    * is m-1 shuffled self-joins. Postings not in ANY phrase die at the
    * scan (the join is inner), so the aggregated stream is query-sized,
    * not corpus-sized. Returns (phrase, doc_id, hits). */
  def phraseSearch(docs: DataFrame, phrases: Seq[String],
                   id: Column = col("doc_id"),
                   text: Column = col("text")): DataFrame = {
    require(phrases.nonEmpty, "no phrases")
    val spark = docs.sparkSession
    import spark.implicits._
    val meta = phrases.flatMap { p =>
      val ts = p.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      require(ts.size >= 2, s"phrase '$p' needs >= 2 words")
      ts.zipWithIndex.map { case (t, off) => (p, off, t, ts.size.toLong) }
    }.toDF("phrase", "off", "term", "len")
    docs.select(id.as("doc_id"),
        posexplode(wsTokens(text)).as(Seq("pos", "term")))
      .join(broadcast(meta), Seq("term"))
      .groupBy(col("phrase"), col("doc_id"),
        (col("pos") - col("off")).as("anchor"))
      .agg(count_distinct(col("off")).as("seen"), first(col("len")).as("len"))
      .filter(col("seen") === col("len") && col("anchor") >= 0)
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("hits"))
  }

  /** Per-document top-k terms by tf-idf, with the idf kept in EXACT
    * integer arithmetic — `score = tf * 1_000_000 div df` — so the
    * ranking is bit-identical across engines (a float idf's `ln` is
    * libm-dependent). Ties break on the term, making the ranking total.
    * The df side aggregates to one row per vocabulary term before the
    * join, and the per-document ranking rewrites to WindowGroupLimit —
    * both shuffles carry derived columns only, never the text. */
  def topTfidfTerms(docs: DataFrame, k: Int = 3,
                    id: Column = col("doc_id"),
                    text: Column = col("text")): DataFrame = {
    val tf = docs.select(id.as("doc_id"), explode(wsTokens(text)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfs, Seq("term"))
      .withColumn("score", expr("tf * 1000000L div df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Sparse tf-idf cosine similarity join — the sparse-vector member of
    * the similarity family (PPJoin covers set Jaccard, the ANN ops
    * dense embeddings). "Rare-term cosine": terms are weighted
    * `w = tf * (1e6 div df)` and only terms with `2 <= df <= maxDf`
    * participate — a df-1 term cannot pair, and a stop-word's posting
    * list would make candidate generation quadratic in the corpus, so
    * its discriminative weight (already ~1e6/df) is rounded to zero by
    * construction. Two docs pair iff they SHARE a qualifying term
    * (classic inverted-index candidate generation: linear in posting
    * sizes, never an all-pairs product), and a pair is kept when
    * cos >= tau, tested EXACTLY in integers:
    * `num^2 * tauDen^2 >= na2 * nb2 * tauNum^2` (num >= 0) — no sqrt,
    * no floats, every engine replays the same pairs bit-for-bit.
    * Output: (id_a < id_b, num, na2, nb2) — numerator and the two
    * squared norms over qualifying terms.
    *
    * Arithmetic bands: weights and their pair/norm sums run in LONG
    * (decimal aggregation measured ~2x slower end-to-end); with
    * w <= tf * 5e5 that is safe while tf * sqrt(shared terms) stays
    * under ~6e9 — any real corpus. Only the final threshold comparison
    * squares the sums, restructured as (num*tauDen)^2 >=
    * (na2*tauNum)*(nb2*tauNum) so each decimal side stays under 38
    * digits whenever the tau-scaled sums fit a long — and the long
    * products fail LOUD under ANSI if they do not, never a silently
    * dropped pair.
    *
    * 100 TB shape: tf/df/weights are derived columns only (text never
    * shuffles); the df cap bounds every posting join group at maxDf
    * members; the pair aggregation carries three integers per shared
    * term. */
  def tfidfSimilarityJoin(docs: DataFrame, maxDf: Int = 20,
                          tauNum: Long = 1, tauDen: Long = 2,
                          id: Column = col("doc_id"),
                          terms: Column = null)
      : DataFrame = {
    // default term space: word 3-shingles (the corpus vocabulary may be
    // tiny — testdata's is ~31 words, every one a stop-word — while
    // shingle df distributions discriminate)
    val termCol =
      if (terms == null) graft.llm.Dedup.shingles(col("text"), 3) else terms
    tfidfSimilarityJoinFromTerms(
      docs.select(id.as("doc_id"), explode(termCol).as("term")),
      maxDf, tauNum, tauDen)
  }

  /** [[tfidfSimilarityJoin]] starting from a PRECOMPUTED term-occurrence
    * table — one (doc_id, term) row per occurrence — the production
    * entry point at corpus scale. Tokenization is the expensive leg and
    * feeds two aggregation subtrees (tf and, through it, norms and
    * posting groups); a 100 TB caller lands or persists the term table
    * once (alongside the signature store this engine already maintains)
    * and every tf-idf pass consumes it, instead of re-shingling the
    * corpus per call and rediscovering that decision in a comment. The
    * column-based overload above stays the one-shot convenience form —
    * the two are equal by construction (it delegates here). */
  def tfidfSimilarityJoinFromTerms(termRows: DataFrame, maxDf: Int = 20,
                                   tauNum: Long = 1, tauDen: Long = 2)
      : DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf")
    require(tauDen > 0 && tauNum >= 0, s"tau=$tauNum/$tauDen")
    val tf = termRows.select(col("doc_id"), col("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df as a partial-aggregated count joined back onto tf — NOT a
    // term-partitioned window, though that measures ~0.5 s faster at
    // sf0.1: a window must buffer each term's ENTIRE group in one task
    // BEFORE the df filter can drop it, so a stop-word shingle (df ~
    // corpus size) becomes an O(corpus) single-task funnel at scale.
    // The aggregate counts the same group map-side (partials), only
    // (term, count) partials reach any reducer, and the df cap then
    // keeps stop-word groups out of every later stage. The join leaves
    // the data hash-partitioned by term, which the posting-group
    // aggregation below reuses.
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
    // the weight table feeds two subtrees (norms + the posting groups);
    // NOT persisted: a one-JVM A/B at sf0.1 measured persist vs
    // no-persist identical (2.595 s vs 2.594 s best-of-3 warm — the
    // shared shuffle subtrees are cheap to replay), and an un-owned
    // persist leaks MEMORY_AND_DISK blocks on every call for a library
    // caller looping over corpora. Callers who want the tokenization
    // leg resident pass a landed/persisted term table to
    // tfidfSimilarityJoinFromTerms — the API owns that decision now.
    val w = tf.join(dfs, Seq("term"))
      .select(col("doc_id"), col("term"),
        expr("tf * (1000000L div df)").as("w"))
    val norms = w.groupBy("doc_id").agg(sum(expr("w * w")).as("norm2"))
    // candidate pairs via per-term member arrays: the df cap already
    // bounds every array at maxDf members, so ONE groupBy shuffle
    // replaces both sides of a term self-join and the shared
    // pairsFromMembers expansion emits each (id_a < id_b) pair exactly
    // once per shared term
    graft.llm.Dedup.pairsFromMembers(w.groupBy("term")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("w"))))
          .as("ms")))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        expr("a.w * b.w").as("p"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("p")).as("num"))
      .join(norms.select(col("doc_id").as("id_a"), col("norm2").as("na2")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("norm2").as("nb2")), "id_b")
      // threshold compare restructured so neither decimal side can
      // exceed 38 digits while the tau-scaled values fit a long:
      // (num*tauDen)^2 >= (na2*tauNum) * (nb2*tauNum). The long
      // products are the only overflow points and ANSI mode makes them
      // LOUD (error, never a silently-dropped pair); each decimal side
      // is then at most (9.2e18)^2 < 8.6e37.
      .filter(expr(s"CAST(num * ${tauDen}L AS DECIMAL(38,0))" +
        s" * (num * ${tauDen}L) >=" +
        s" CAST(na2 * ${tauNum}L AS DECIMAL(38,0)) * (nb2 * ${tauNum}L)"))
      .select(col("id_a"), col("id_b"), col("num"), col("na2"), col("nb2"))
  }

  /** One-pass document profile used by `SparkEntry` queries. */
  def profile(docs: DataFrame, text: Column = col("text")): DataFrame =
    docs.select(
      col("doc_id"),
      length(text).as("n_chars"),
      tokenCount(text).as("n_tokens"),
      punctRatio(text).as("punct_ratio"),
      alphaRatio(text).as("alpha_ratio"),
      stopwordRatio(text).as("stopword_ratio"),
      qualityScore(text).as("quality"),
      languageId(text).as("lang_pred"),
      fingerprint(text).as("fingerprint"))

  /** Token-window chunking: split each document into training-context
    * chunks of `chunkSize` tokens with `overlap` tokens carried between
    * consecutive chunks (stride = chunkSize - overlap) — the standard
    * pre-training / RAG chunker. Chunk count per doc is
    * `ceil((n - overlap) / stride)` (one chunk when n <= chunkSize);
    * empty documents produce no chunks.
    *
    * One narrow generator pass: the token array is materialized in a
    * projection BEFORE the explode (generator discipline — Catalyst does
    * not eliminate subexpressions across generators), each chunk is a
    * `slice` of that array, and nothing shuffles. All arithmetic is
    * integer, so the DuckDB oracle replays it exactly. */
  def chunkTokens(docs: DataFrame, chunkSize: Int, overlap: Int,
                  text: Column = col("text")): DataFrame = {
    require(0 <= overlap && overlap < chunkSize, s"$overlap/$chunkSize")
    val stride = chunkSize - overlap
    val toks = docs.select(col("doc_id"),
      filter(split(Dedup.normalized(text), " "), t => length(t) > 0).as("__t"))
    val n = size(col("__t"))
    val nChunks = greatest(lit(1),
      floor((n - lit(overlap) + lit(stride - 1)).cast("double") / lit(stride))
        .cast("int"))
    toks
      .select(col("doc_id"), col("__t"),
        explode(when(n > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        slice(col("__t"), col("chunk_id") * stride + 1, lit(chunkSize)).as("__c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__c")).as("n_tokens"),
        array_join(col("__c"), " ").as("chunk"))
  }

  /** Gopher-style repetition metrics: for each document and each n in
    * `ns`, the token-coverage fraction of the MOST FREQUENT n-gram
    * (`count * n / n_tokens`), plus the composite keep decision against
    * the published thresholds (drop when the top 2-gram covers > 20%,
    * 3-gram > 18%, 4-gram > 16% — boilerplate and degenerate repetition
    * both trip these).
    *
    * ZERO shuffle: the most frequent n-gram's count is the longest run
    * of equal adjacent elements in the SORTED per-document n-gram array,
    * computed by one `array_sort` + one linear `aggregate` fold per n —
    * everything stays in a projection, so the corpus never moves and no
    * per-gram rows ever exist (the exploded formulation would put
    * |ns| x corpus-token gram strings through a shuffle). Only the count
    * is needed for the fraction, so no tie-break question arises. All
    * engine-portable: counts are integers and the fraction is one IEEE
    * division. */
  def repetitionMetrics(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 4),
                        thresholds: Map[Int, Double] =
                          Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
                        id: Column = col("doc_id"),
                        text: Column = col("text")): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct.size == ns.size,
      s"ns must be distinct positive ints: $ns")
    val base = docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
    val sz = size(col("__t"))
    def maxRun(n: Int): Column = {
      val grams = array_sort(transform(sequence(lit(0), sz - n),
        i => array_join(slice(col("__t"), i + 1, lit(n)), " ")))
      val folded = aggregate(
        when(sz >= n, grams).otherwise(array().cast("array<string>")),
        struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
        (s, x) => {
          val run = when(x === s.getField("prev"), s.getField("run") + 1)
            .otherwise(lit(1))
          struct(x.as("prev"), run.as("run"),
            greatest(s.getField("best"), run).as("best"))
        },
        s => s.getField("best"))
      folded
    }
    val fracs = ns.map { n =>
      (n, when(sz === 0, 0.0)
        .otherwise(maxRun(n).cast("double") * n / sz).as(s"top${n}_frac"))
    }
    // only thresholds whose n was computed apply; with none applicable
    // (e.g. ns the caller thresholds separately) nothing can trip, so
    // every document keeps — vacuous truth, not an error
    val keep = thresholds.toSeq.sortBy(_._1)
      .filter { case (n, _) => ns.contains(n) }
      .map { case (n, thr) => col(s"top${n}_frac") <= thr }
      .foldLeft(lit(true))(_ && _)
    base.select(col("doc_id") +: sz.as("n_tokens") +: fracs.map(_._2): _*)
      .withColumn("keep", keep.cast("int"))
  }

  /** Nearest-centroid text classifier, trained AND applied in-engine —
    * the model-based curation stage of a training-data pipeline (route /
    * score documents with a model learned from the corpus itself), with
    * every number kept in EXACT integer arithmetic so the ranking is
    * bit-identical on any engine:
    *
    *   - train: each class's centroid is its term-frequency profile,
    *     scaled to integer weights `w_c(t) = tf_c(t) * SCALE div total_c`
    *     (SCALE = 1e9) — one aggregate over the corpus, |vocab| x
    *     |classes| rows of METADATA, never corpus-sized;
    *   - score: `score(d, c) = sum_t tf_d(t) * w_c(t)` — document term
    *     counts meet the weight table in a broadcast join, partial-agg'd
    *     per (doc, class);
    *   - predict: argmax by score with a deterministic class-name
    *     tie-break, as one partial-aggregable `min(struct(-score, c))`.
    *
    * Text never shuffles: only derived (doc_id, term, tf) rows move, and
    * the weight table rides the broadcast. A float softmax/log-prob
    * formulation would be libm-dependent; the integer profile keeps the
    * argmax portable (and a monotone transform of the same ranking).
    * Documents with no tokens have no score under any class and are
    * absent from the output — callers wanting them back left-join. */
  def centroidClassifier(docs: DataFrame, label: Column = col("source"),
                         id: Column = col("doc_id"),
                         text: Column = col("text")): DataFrame = {
    // CACHED (the dfOrderedSets discipline): the class-frequency pass
    // and the doc-frequency pass aggregate this stream under DIFFERENT
    // keys — two distinct exchanges, so exchange reuse cannot share the
    // tokenize and without the cache the corpus tokenizes twice. Blocks
    // stay evictable; the bench's post-pair clearCache bounds the
    // session footprint.
    val terms = docs.select(id.as("doc_id"), label.as("__lab"),
      explode(wsTokens(text)).as("term")).cache()
    val classTf = terms.groupBy(col("__lab"), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val classTot = classTf.groupBy(col("__lab")).agg(sum(col("__tf")).as("__tot"))
    val weights = classTf.join(classTot, "__lab")
      .select(col("__lab"), col("term"),
        expr("__tf * 1000000000L div __tot").as("__w"))
    val docTf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("__dtf"))
    docTf.join(broadcast(weights), "term")
      .groupBy(col("doc_id"), col("__lab"))
      .agg(sum(col("__dtf") * col("__w")).as("__score"))
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("__score")).as("__ns"), col("__lab"))).as("__b"))
      .select(col("doc_id"), col("__b.__lab").as("pred"),
        (-col("__b.__ns")).as("score"))
  }

  /** Per-stratum EXACT-percentile outlier trim: keep rows whose integer
    * metric (length, token count) lies within the stratum's
    * [loPct, hiPct] percentile band — the standard "drop the freakishly
    * short/long tails per language" curation filter.
    *
    * Cutoff rule (engine-portable, all-integer): the p-th percentile
    * cutoff of a stratum with n rows is the smallest value v whose
    * cumulative count reaches ceil(p*n/100) = (p*n + 99) div 100.
    *
    * Scale shape: ONE partial-aggregated pass builds the per-(stratum,
    * value) histogram; the cumulative window then runs over the
    * HISTOGRAM — |strata| x |distinct metric values| rows, bounded by
    * the value domain, NOT by the corpus — and the corpus itself only
    * meets a broadcast of the per-stratum cutoffs. No per-stratum window
    * (and no sort) ever sees a full-corpus partition. The div-by-100 is
    * computed in doubles and truncated, exact while p*n + 99 < 2^53 —
    * beyond ~9e13 rows per stratum swap in a decimal division.
    *
    * Rows with a NULL metric are excluded up front (a null has no rank;
    * leaving it in would also make the cutoffs depend on engine null-sort
    * order). A null STRATUM is an ordinary stratum — the join is
    * null-safe. */
  def percentileTrim(docs: DataFrame, stratum: Column, value: Column,
                     loPct: Int = 1, hiPct: Int = 99): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(0 <= loPct && loPct <= hiPct && hiPct <= 100, s"$loPct..$hiPct")
    // the histogram is bounded by the metric's VALUE DOMAIN — that is the
    // whole scale argument. An unbucketed continuous metric would blow the
    // histogram up to ~|corpus| rows, so refuse it loudly; bucket doubles
    // to a grid (e.g. cast to int) before trimming on them.
    val vType = docs.select(value).schema.head.dataType
    require(Seq("integer", "long", "short", "byte", "date")
        .contains(vType.typeName),
      s"percentileTrim needs a bounded-domain (integral) metric, got $vType")
    val nonNull = docs.filter(value.isNotNull)
    val hist = nonNull.groupBy(stratum.as("__s"), value.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = hist
      .withColumn("__cum",
        sum(col("__c")).over(Window.partitionBy(col("__s")).orderBy(col("__v"))))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__s"))))
    def cut(pct: Int): Column =
      min(when(col("__cum") >=
        floor((lit(pct.toLong) * col("__n") + lit(99L)) / lit(100L)),
        col("__v")))
    val cuts = cum.groupBy(col("__s"))
      .agg(cut(loPct).as("__lo"), cut(hiPct).as("__hi"))
    nonNull.join(broadcast(cuts),
        stratum <=> col("__s") && value.between(col("__lo"), col("__hi")))
      .drop("__s", "__lo", "__hi")
  }

  /** Bigram language-model likelihood scoring — the CCNet-style "does
    * this look like the reference corpus" quality filter, with the LM
    * trained AND applied in-engine.
    *
    * Train side: bigram counts `c2(w1,w2)` and continuation totals
    * `c1(w1) = sum_w2 c2(w1,w2)`, plus the train token vocabulary size V
    * for add-one smoothing (unseen bigrams in scored text must get a
    * small nonzero probability, not a crash or a zero).
    *
    * Score side: every bigram occurrence scores the integer-scaled
    * smoothed conditional `p = 1e9 * (c2+1) div (c1+V)`; a document's
    * `lm_score` is the integer mean over its bigrams and `keep` is the
    * threshold decision. All arithmetic is exact integer (decimal(38,0)
    * for the scaled numerator), so scores are bit-identical across
    * engines — the log of the true probability is monotone in it per
    * bigram, and the mean-of-scaled-probabilities ordering is the
    * documented engine policy (no libm `log`).
    *
    * Scale shape: bigram formation is a narrow projection (zip of the
    * token array with its own tail — the corpus never shuffles as text);
    * occurrences pre-aggregate to (doc_id,w1,w2,m) before meeting the
    * count tables, and every shuffle key is a term pair. Documents with
    * fewer than two tokens have no bigram and produce no row (nothing
    * to measure — route them to a length filter instead). */
  def bigramLmScore(train: DataFrame, toScore: DataFrame,
                    minScore: Long = 0L,
                    id: Column = col("doc_id"),
                    text: Column = col("text")): DataFrame = {
    def bigrams(d: DataFrame): DataFrame = {
      val withToks = d.select(id.as("doc_id"), wsTokens(text).as("__t"))
      withToks
        .select(col("doc_id"), explode(zip_with(
          slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
          slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
        .select(col("doc_id"), col("__b.w1"), col("__b.w2"))
    }
    val c2 = bigrams(train).groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
    val vocab = train.select(explode(wsTokens(text)).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    val occ = bigrams(toScore).groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("m"))
    occ
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("p_scaled", expr(
        // an EMPTY train corpus has v = 0 and c1 NULL — a zero divisor
        // that ANSI mode (this build's default) would raise on every
        // scored row; the degenerate case yields NULL explicitly
        // (nothing was learned) instead — the nbScore law
        """CASE WHEN coalesce(c1, 0L) + v = 0 THEN CAST(NULL AS DECIMAL(38,0))
          |  ELSE CAST(1000000000 AS DECIMAL(38,0)) * (coalesce(c2, 0L) + 1)
          |    div (coalesce(c1, 0L) + v) END""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"),
        sum(expr("m * p_scaled")).as("__sum_p"))
      .withColumn("lm_score", expr("__sum_p div n_bigrams"))
      .withColumn("keep", col("lm_score") >= minScore)
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"), col("keep"))
  }

  /** Moore–Lewis contrastive selection (Moore & Lewis 2010,
    * "Intelligent Selection of Language Model Training Data") — the
    * classic cross-entropy-difference selector every later data-
    * selection method (DSIR included) cites as the baseline: score
    * each candidate under an IN-DOMAIN LM and a GENERAL LM (both
    * [[bigramLmScore]]'s exact add-one-smoothed integer law) and keep
    * documents whose in-domain score beats the general score by at
    * least `minDelta`. The published rule thresholds
    * `H_in(d) − H_gen(d)`; the engine's scores are mean scaled
    * probabilities (higher = more in-domain-like), so the rule is
    * `lm_in − lm_gen >= minDelta` — same selections on the
    * fixed-point scale, bit-identical across engines, no libm.
    *
    * A pure composition (the X74 discipline): two [[bigramLmScore]]
    * passes over the SAME candidate set, one doc-keyed join, one
    * integer subtraction. Documents with fewer than two tokens have no
    * bigram under either LM, hence no row (bigramLmScore's contract —
    * route them to a length filter).
    *
    * Scale shape: each LM chain is one candidate-corpus bigram pass
    * against its own vocab-sized count tables (term-keyed joins — the
    * corpus text never shuffles). This convenience form runs both
    * passes per call; production pipelines LAND each model's scores
    * once and diff the stored tables through [[mooreLewisFromScores]]
    * (the [[perplexityBucketsFromScores]] pattern; equal by
    * construction — this form delegates there). */
  def mooreLewisSelect(inDomain: DataFrame, general: DataFrame,
                       toScore: DataFrame, minDelta: Long = 0L,
                       id: Column = col("doc_id"),
                       text: Column = col("text")): DataFrame =
    mooreLewisFromScores(
      bigramLmScore(inDomain, toScore, id = id, text = text)
        .select(col("doc_id"), col("n_bigrams"),
          col("lm_score").as("lm_in")),
      bigramLmScore(general, toScore, id = id, text = text)
        .select(col("doc_id"), col("lm_score").as("lm_gen")),
      minDelta)

  /** [[mooreLewisSelect]] over PRECOMPUTED per-model score tables —
    * (doc_id, n_bigrams, lm_in) and (doc_id, lm_gen) — the production
    * entry point: each LM's scores land once per (model, candidate)
    * snapshot and every threshold sweep diffs the stored tables
    * instead of re-scoring the corpus. */
  def mooreLewisFromScores(inScored: DataFrame, genScored: DataFrame,
                           minDelta: Long = 0L): DataFrame =
    inScored.join(genScored, Seq("doc_id"))
      .withColumn("ml_delta", col("lm_in") - col("lm_gen"))
      .withColumn("keep", col("ml_delta") >= minDelta)
      .select(col("doc_id"), col("n_bigrams"), col("lm_in"),
        col("lm_gen"), col("ml_delta"), col("keep"))

  /** Stupid Backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the LM law PUBLISHED
    * for distributed counting at web scale: no discounting, no
    * normalization, just relative frequencies with a fixed 0.4 backoff
    * penalty per level, because at corpus scale the count tables are
    * the only thing a cluster can afford to materialize and the score
    * only needs to RANK text, not be a probability.
    *
    * Score law (exact integers, the [[bigramLmScore]] discipline —
    * every branch is ONE division of decimal(38) products, no nesting,
    * no libm): per trigram occurrence (w1, w2, w3) of the scored text,
    *  - seen trigram:      `s = 1e9 · c3(w1,w2,w3) div c2(w1,w2)`
    *  - else seen bigram:  `s = 4e8 · c2(w2,w3)    div c1(w2)`
    *  - else:              `s = 1.6e8 · c1(w3)     div N`
    * (0.4·1e9 and 0.4²·1e9 are exact integers; an unseen-everywhere
    * w3 scores 0 — Stupid Backoff deliberately does not smooth).
    * A document's `sb_score` is the integer mean over its trigram
    * occurrences; `keep = sb_score >= minScore`. Documents with fewer
    * than three tokens have no trigram and no row (route to a length
    * filter — the [[bigramLmScore]] contract).
    *
    * Scale shape: three count tables, each partial-aggregated and
    * term-keyed; the scored corpus pre-aggregates to (doc, trigram,
    * multiplicity) and meets the tables through term-keyed joins (c2
    * twice and c1 twice — denominator and backoff legs are different
    * keys); the 1-row total broadcasts. The corpus never shuffles as
    * text. */
  def stupidBackoffScore(train: DataFrame, toScore: DataFrame,
                         minScore: Long = 0L,
                         id: Column = col("doc_id"),
                         text: Column = col("text")): DataFrame = {
    def grams(d: DataFrame, n: Int): DataFrame = {
      val toks = d.select(id.as("doc_id"), wsTokens(text).as("__t"))
      val cols = (0 until n).map(j => s"w${j + 1}")
      toks.select(col("doc_id"), explode(when(size(col("__t")) >= n,
          transform(sequence(lit(1), size(col("__t")) - (n - 1)), i =>
            struct(cols.zipWithIndex.map { case (c, j) =>
              element_at(col("__t"), i + j).as(c) }: _*)))
          .otherwise(array().cast(
            s"array<struct<${cols.map(_ + ":string").mkString(",")}>>")))
          .as("__g"))
        .select(col("doc_id") +: cols.map(c => col(s"__g.$c")): _*)
    }
    val c3 = grams(train, 3).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c3"))
    val c2 = grams(train, 2).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c2"))
    val c1 = grams(train, 1).groupBy("w1").agg(count(lit(1)).as("c1"))
    val n = c1.agg(coalesce(sum("c1"), lit(0L)).as("nn"))
    val perDoc = grams(toScore, 3).groupBy("doc_id", "w1", "w2", "w3")
      .agg(count(lit(1)).as("m"))
    perDoc
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2, Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2b")), Seq("w2", "w3"), "left")
      .join(c1.select(col("w1").as("w2"), col("c1").as("c1b")),
        Seq("w2"), "left")
      .join(c1.select(col("w1").as("w3"), col("c1").as("c1c")),
        Seq("w3"), "left")
      .crossJoin(broadcast(n))
      .withColumn("s_scaled", expr(
        """CASE
          |  WHEN c3 IS NOT NULL THEN
          |    (CAST(1000000000 AS DECIMAL(38,0)) * c3) div c2
          |  WHEN c2b IS NOT NULL THEN
          |    (CAST(400000000 AS DECIMAL(38,0)) * c2b) div c1b
          |  WHEN c1c IS NOT NULL THEN
          |    (CAST(160000000 AS DECIMAL(38,0)) * c1c) div nn
          |  ELSE 0L
          |END""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("m").as("n_trigrams"),
        sum(expr("m * s_scaled")).as("__s"))
      .withColumn("sb_score", expr("__s div n_trigrams"))
      .withColumn("keep", col("sb_score") >= minScore)
      .select(col("doc_id"), col("n_trigrams"), col("sb_score"),
        col("keep"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995; the
    * modified form is the reference smoothing every LM-quality paper
    * benchmarks against) — completes the LM family's smoothing
    * spectrum: add-one ([[bigramLmScore]]), none-with-penalty
    * ([[stupidBackoffScore]]), and the continuation-count law here,
    * which fixes exactly what add-one gets wrong: a word seen often
    * but only in ONE context ("francisco") stops inheriting a high
    * unigram backoff weight, because backoff mass follows how many
    * DISTINCT contexts a word continues, not how often it occurs.
    *
    * Law (absolute discount D = 3/4 — the literature's 0.75 as an
    * exact rational, so the whole model stays on the integer grid):
    * for a scored bigram (w1, w2) with train counts c2, context total
    * c1, right diversity R(w1) = |{w : c(w1,w) > 0}|, continuation
    * diversity L(w2) = |{w : c(w,w2) > 0}|, and Nbi = total distinct
    * train bigrams,
    *
    *   P(w2|w1) = max(c2 − 3/4, 0)/c1 + (3/4)·R(w1)/c1 · L(w2)/Nbi
    *
    * cleared to one exact division per occurrence:
    * `p_e9 = (max(4·c2 − 3, 0)·Nbi + 3·R·L) · 1e9 div (4·c1·Nbi)`.
    * An UNSEEN context (c1 null) backs off to the continuation
    * distribution alone, `p_e9 = 1e9·L div Nbi` (0 when w2 never
    * continues anything — KN assigns unseen-unseen no mass; route
    * those through [[bigramLmScore]]'s additive floor if a nonzero
    * tail is needed); an empty train corpus yields NULL (nothing was
    * learned — the [[bigramLmScore]] ANSI-safe law). The true KN
    * kernel normalizes exactly: over rationals, Σ_w2 P(w2|w1) = 1 for
    * every seen context (the spec pins the 1e9-grid image of this).
    * A document's `kn_score` is the integer mean of `p_e9` over its
    * bigram occurrences; `keep = kn_score >= minScore`. Sub-2-token
    * docs have no bigram and no row (the family contract).
    *
    * Scale shape ([[bigramLmScore]]'s): all four count tables are
    * vocab-/bigram-vocab-sized and derive from ONE train bigram
    * aggregation pass (R and c1 come out of the same groupBy as c2's
    * rollup; L is one more vocab-sized groupBy); scored occurrences
    * pre-aggregate per (doc, bigram) before meeting the counts
    * term-keyed, so corpus text never shuffles and the per-occurrence
    * work is three joins + one division. */
  def kneserNeyScore(train: DataFrame, toScore: DataFrame,
                     minScore: Long = 0L,
                     id: Column = col("doc_id"),
                     text: Column = col("text")): DataFrame = {
    def bigrams(d: DataFrame): DataFrame =
      d.select(id.as("doc_id"), wsTokens(text).as("__t"))
        .select(col("doc_id"), explode(zip_with(
          slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
          slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
        .select(col("doc_id"), col("__b.w1"), col("__b.w2"))
    // the explicit isnotnull filter is a semantic no-op (w1/w2 are
    // tokens — never null) but it is LOAD-BEARING for exchange reuse:
    // without it, InferFiltersFromConstraints derives a DIFFERENT
    // null-filter into each consumer's copy of this subtree from that
    // consumer's own join keys (w1 AND w2 under the c2 join, w1 alone
    // under ctx, w2 alone under cont, none under nbi), the four
    // (w1,w2)-shuffle stages stop canonicalizing equal, reuse can't
    // fire, and the train corpus is scanned and bigram-exploded four
    // times (measured: 4 FileScans materialized as 4 separate AQE
    // stages). With the superset filter present, inference adds
    // nothing, all four consumers sit on ONE canonically-equal shuffle
    // stage — written once, read four ways
    val c2 = bigrams(train)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // context total AND right diversity from the same distinct-bigram
    // table — one pass, no second corpus scan. The cont/nbi row counts
    // count `when(c2 >= 0, 1)` — identical to count(1) (c2 is a count
    // output, always >= 1) but it keeps c2 REFERENCED: with a bare
    // count(1), column pruning degenerates the cont/nbi inner (w1,w2)
    // aggregation to a distinct, which breaks the same stage equality
    // (a plain count(col("c2")) doesn't survive either — the optimizer
    // rewrites count-of-non-nullable back to count(1)).
    val keepC2 = count(when(col("c2") >= 0L, lit(1)))
    val ctx = c2.groupBy("w1")
      .agg(sum("c2").as("c1"), keepC2.as("rdiv"))
    val cont = c2.groupBy("w2").agg(keepC2.as("ldiv"))
    val nbi = c2.agg(keepC2.as("nbi"))
    val occ = bigrams(toScore).groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("m"))
    occ
      .join(c2, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(nbi))
      .withColumn("p_e9", expr(
        """CASE
          |  WHEN nbi = 0 THEN CAST(NULL AS DECIMAL(38,0))
          |  WHEN c1 IS NULL THEN
          |    CAST(1000000000 AS DECIMAL(38,0)) * coalesce(ldiv, 0L)
          |      div nbi
          |  ELSE
          |    (greatest(4 * coalesce(c2, 0L) - 3, 0L)
          |       * CAST(nbi AS DECIMAL(38,0))
          |     + 3 * rdiv * CAST(coalesce(ldiv, 0L) AS DECIMAL(38,0)))
          |      * 1000000000 div (4 * c1 * CAST(nbi AS DECIMAL(38,0)))
          |END""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("m").as("n_bigrams"),
        sum(expr("m * p_e9")).as("__s"))
      .withColumn("kn_score", expr("__s div n_bigrams"))
      .withColumn("keep", col("kn_score") >= minScore)
      .select(col("doc_id"), col("n_bigrams"), col("kn_score"),
        col("keep"))
  }

  /** Naive-Bayes seed quality classifier — the GPT-3-style "does this
    * document look like the curated seed corpus" filter (Brown et al.
    * 2020 appendix A trains a linear classifier on a positive seed vs
    * the raw crawl; this is its NB form), trained AND applied
    * in-engine with no feature hashing: the vocabulary IS the feature
    * table.
    *
    * Train side: per-token class counts `cp(w)` / `cn(w)` over the
    * labeled seed (a NULL `positive` is negative-class — CASE-ELSE
    * semantics, the engine law), class token totals `tp` / `tn`, and
    * the labeled vocabulary size `V` for add-one smoothing.
    *
    * Score side: every token occurrence scores the integer-scaled
    * smoothed class-likelihood RATIO
    * `r = 1e9 * (cp+1)(tn+V) div ((cn+1)(tp+V))` — monotone per token
    * in the NB log-likelihood ratio `log p(w|pos) - log p(w|neg)` —
    * and a document's `nb_score` is the integer mean of `r` over its
    * token occurrences, `keep = nb_score >= minScore` (1e9 is the
    * neutral point: the token is equally likely under both classes).
    * The mean-of-scaled-ratios ordering is the documented engine
    * policy, exactly [[bigramLmScore]]'s discipline: all arithmetic is
    * exact integer (decimal(38,0) numerators), bit-identical across
    * engines, no libm `log` anywhere.
    *
    * Scale shape: the count table is vocab-sized (shuffles keyed on
    * the term), the three totals are ONE broadcast row, and scoring is
    * occurrence-pre-aggregated (doc_id, w, m) before meeting the count
    * table — the corpus text never shuffles. The LABELED side is
    * scanned twice (the count table and its totals are separate
    * subtrees — Catalyst prunes them differently, so the exchange is
    * not reused) — acceptable by construction: the labeled seed is
    * curated and small relative to the crawl being scored, and the
    * crawl side is exactly one pass. Zero-token documents have
    * nothing to score and produce no row (route them to a length
    * filter — [[bigramLmScore]]'s contract); an empty labeled seed
    * yields NULL scores (nothing was learned), not a crash. */
  def naiveBayesOdds(labeled: DataFrame, toScore: DataFrame,
                     positive: Column,
                     minScore: Long = 1000000000L,
                     id: Column = col("doc_id"),
                     text: Column = col("text")): DataFrame = {
    val cnt = nbCountTable(labeled, positive, text)
    nbScore(toScore, cnt, nbTotals(cnt), minScore, id, text)
  }

  /** [[naiveBayesOdds]]'s TRAIN half: the per-token class count table
    * (w, cp, cn) over the labeled seed — the frozen state a production
    * gate lands once (the [[dsirRatioTable]] train/apply split). */
  def nbCountTable(labeled: DataFrame, positive: Column,
                   text: Column = col("text")): DataFrame =
    labeled
      .select(positive.as("__pos"), explode(wsTokens(text)).as("w"))
      .groupBy("w")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("cn"))

  /** The 1-row class totals of a [[nbCountTable]] — computed once per
    * trained state, never per batch (the X114 zero-per-batch-store-
    * reads discipline). */
  def nbTotals(counts: DataFrame): DataFrame =
    counts.agg(coalesce(sum("cp"), lit(0L)).as("tp"),
      coalesce(sum("cn"), lit(0L)).as("tn"), count(lit(1)).as("v"))

  /** [[naiveBayesOdds]]'s APPLY half: score documents against a FROZEN
    * count table + totals row — exactly the fused operator's law
    * (equal by construction: the convenience form delegates here). */
  def nbScore(toScore: DataFrame, counts: DataFrame, totals: DataFrame,
              minScore: Long = 1000000000L,
              id: Column = col("doc_id"),
              text: Column = col("text")): DataFrame = {
    val occ = toScore.select(id.as("doc_id"), explode(wsTokens(text)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("m"))
    occ
      .join(counts, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("r_scaled", expr(
        // an EMPTY count table (tp = tn = v = 0) has a zero divisor —
        // ANSI mode (this build's default) would raise, so the
        // degenerate case yields NULL explicitly (nothing was learned;
        // the scaladoc contract) instead of crashing every scored row
        """CASE WHEN tp + v = 0 THEN CAST(NULL AS DECIMAL(38,0))
          |  ELSE CAST(1000000000 AS DECIMAL(38,0)) * (coalesce(cp, 0L) + 1)
          |    * (tn + v) div (CAST(coalesce(cn, 0L) + 1 AS DECIMAL(38,0))
          |    * (tp + v)) END""".stripMargin))
      .groupBy("doc_id")
      .agg(sum("m").as("n_tokens"), sum(expr("m * r_scaled")).as("__s"))
      .withColumn("nb_score", expr("__s div n_tokens"))
      .withColumn("keep", col("nb_score") >= minScore)
      .select(col("doc_id"), col("n_tokens"), col("nb_score"), col("keep"))
  }

  /** Classifier calibration report — the audit a pipeline runs before
    * TRUSTING a quality score as a keep/drop gate: bucket the scored
    * held-out set into exact score-rank quantile buckets (bucket
    * `buckets-1` = highest scores) and report per-bucket and
    * cumulative-from-the-top precision against the true label. If the
    * top buckets aren't measurably purer than the bottom ones, the
    * score is noise and the gate would shred the corpus at random.
    *
    * Law: cuts at exact ascending rank quantiles
    * ([[graft.operators.EventAnalytics.exactGroupQuantiles]] —
    * `ceil(p·n/100)`, quantile_disc semantics); a document's bucket is
    * the COUNT of cuts its score reaches (`score >= cut`), so heavy
    * score ties can leave buckets empty or uneven — which IS the law
    * (tied documents are indistinguishable to the classifier, the q167
    * lesson); a NULL label counts negative (CASE-ELSE semantics, the
    * [[naiveBayesOdds]] law); precisions are exact integers
    * (`1e9·pos div docs`), cumulative runs from the TOP bucket down —
    * the "keep the top x%" readout. Only scored documents calibrate
    * (zero-token docs never scored — the producer's contract).
    *
    * Scale shape: the quantile pass is the two-phase rank-statistics
    * shape (never a corpus-rows window); cuts are ≤buckets-1 rows
    * broadcast back; bucketing is a narrow projection; the report
    * aggregation is ≤buckets rows, and the cumulative window runs over
    * those ≤buckets rows only. The ≤buckets-row report is materialized
    * EAGERLY so the scored frame's persist is released before return —
    * nothing stays cached behind the caller's back. */
  def classifierCalibration(scored: DataFrame, label: Column,
                            buckets: Int = 10,
                            score: Column = col("nb_score"),
                            id: Column = col("doc_id"))
      : DataFrame = {
    require(buckets >= 2 && buckets <= 100 && 100 % buckets == 0,
      s"buckets=$buckets (needs 2..100 dividing 100 — integer pct cuts)")
    val pcts = (1 until buckets).map(_ * 100 / buckets)
    // the scored frame feeds TWO subtrees (the quantile pass and the
    // bucketing) and is usually the output of a full scoring chain —
    // persist it for the computation (the DSIR/GraphRank discipline),
    // released in the finally below
    val base = scored
      .select(id.as("doc_id"), score.cast("long").as("__s"),
        label.as("__lab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cuts = graft.operators.EventAnalytics
        .exactGroupQuantiles(base, lit(0), col("__s"), pcts)
        .agg(collect_list(col("cut")).as("__cuts"))
      val bucketed = base
        .crossJoin(broadcast(cuts))
        .withColumn("bucket", size(filter(col("__cuts"), c => col("__s") >= c)))
      val agg = bucketed.groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__lab"), 1L).otherwise(0L)).as("n_pos"))
      import org.apache.spark.sql.expressions.Window
      // the window runs over the <=buckets report rows only, never corpus
      val w = Window.orderBy(col("bucket").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = agg
        .withColumn("prec_scaled",
          expr("(CAST(1000000000 AS BIGINT) * n_pos) div n_docs"))
        .withColumn("cum_docs", sum("n_docs").over(w))
        .withColumn("cum_pos", sum("n_pos").over(w))
        .withColumn("cum_prec_scaled",
          expr("(CAST(1000000000 AS BIGINT) * cum_pos) div cum_docs"))
        .select(col("bucket"), col("n_docs"), col("n_pos"),
          col("prec_scaled"), col("cum_docs"), col("cum_pos"),
          col("cum_prec_scaled"))
      // ≤buckets rows — collect and rebuild as a literal frame so the
      // persist can release NOW (the RFM bounded-collect discipline)
      val rows = out.collect()
      scored.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally base.unpersist()
  }

  /** CCNet-style perplexity partitioning (Wenzek et al. 2020 — the
    * production form of the LM quality filter): score every document
    * against a reference-corpus bigram LM ([[bigramLmScore]] — higher
    * integer score = more reference-like = lower perplexity), cut each
    * LANGUAGE slice at exact per-slice score quantiles, and label
    * head / middle / tail. CCNet ships the three-way per-language split
    * rather than one fixed threshold precisely because LM score scales
    * differ per language — head feeds pretraining directly, middle is
    * kept for diversity, tail is dropped or down-weighted.
    *
    * A pure composition (the X74 discipline — the point is that the
    * engine's pieces compose): one LM scoring pass, one two-phase
    * exact-quantile pass over (lang, score) —
    * [[graft.operators.EventAnalytics.exactGroupQuantiles]], never a
    * per-language window over corpus rows — and one broadcast cutoff
    * join. Cut law (all exact integers, ties deterministic): with
    * per-language ascending-rank cuts at `ceil(p * n / 100)` for
    * `loPct`/`hiPct`, a document is `head` when `score >= hi cut`,
    * `middle` when `lo cut <= score < hi cut`, else `tail` — heavy
    * score ties can make buckets uneven, which IS the law (the tied
    * documents are indistinguishable to the LM). Documents with fewer
    * than two tokens have no bigram, hence no score and no bucket
    * (route them to a length filter — bigramLmScore's contract).
    *
    * This convenience form recomputes the scoring chain once per
    * consumer subtree (cuts + the bucketing join = twice total): the
    * corpus-sized result gives the operator no point at which a
    * persist could be released, and a persist the caller never
    * releases accumulates for the session lifetime. Production
    * callers LAND the scores once and partition through
    * [[perplexityBucketsFromScores]] — the
    * [[tfidfSimilarityJoinFromTerms]] pattern. */
  def perplexityBuckets(train: DataFrame, toScore: DataFrame,
                        lang: Column = col("lang"),
                        loPct: Int = 34, hiPct: Int = 67,
                        id: Column = col("doc_id"),
                        text: Column = col("text")): DataFrame = {
    val scored = bigramLmScore(train, toScore, id = id, text = text)
      .join(toScore.select(id.as("doc_id"), lang.as("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("lm_score"))
    perplexityBucketsFromScores(scored, loPct, hiPct)
  }

  /** [[perplexityBuckets]] starting from a PRECOMPUTED scored frame —
    * (doc_id, lang, lm_score) — the production entry point: the LM
    * scores are landed once (the [[tfidfSimilarityJoinFromTerms]]
    * pattern) and every partitioning pass consumes the stored table
    * instead of re-scoring the corpus. The two are equal by
    * construction (the convenience form delegates here). */
  def perplexityBucketsFromScores(scored: DataFrame,
                                  loPct: Int = 34, hiPct: Int = 67)
      : DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 1 <= loPct < hiPct <= 100: $loPct/$hiPct")
    val cuts = graft.operators.EventAnalytics.exactGroupQuantiles(
        scored, col("lang"), col("lm_score"), Seq(loPct, hiPct))
      .groupBy(col("g").as("lang"))
      .agg(max(when(col("pct") === loPct, col("cut"))).as("__lo"),
        max(when(col("pct") === hiPct, col("cut"))).as("__hi"))
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("lm_score") >= col("__hi"), lit("head"))
          .when(col("lm_score") >= col("__lo"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"),
        col("lm_score").cast("long").as("lm_score"), col("bucket"))
  }

  /** DSIR — data selection via importance resampling (Xie et al. 2023):
    * score every raw-corpus document by how much more likely its hashed
    * n-gram features are under the TARGET corpus' feature distribution
    * than under the raw corpus' own, and keep the top slice. The
    * production recipe behind "select web data that looks like
    * Wikipedia/books": fit two bag-of-hashed-n-grams multinomials
    * (target p, raw q), weight each document by its feature likelihood
    * ratio, resample by weight.
    *
    * Features: whitespace unigrams AND bigrams, hashed into `buckets`
    * cells with the engine's portable md5 bucketer
    * ([[Sampling.hashBucket]]) — hashing makes the feature space fixed
    * and metadata-sized regardless of corpus vocabulary, which is the
    * published design and the reason this scales: both corpus-side
    * count tables are at most `buckets` rows, so the corpus meets only
    * a BROADCAST of the ratio table and never shuffles as text.
    *
    * Scoring law (exact integers, the [[bigramLmScore]] policy — no
    * libm `log`): each bucket's add-one-smoothed likelihood ratio is
    * `r(b) = 1e9 * (ct(b)+1) * (Nr+B)  div  ((cr(b)+1) * (Nt+B))`
    * (ct/cr = target/raw bucket occurrence counts, Nt/Nr their totals,
    * B = buckets), and a document's `dsir_weight` is the exact integer
    * mean of `r` over its feature OCCURRENCES — the published
    * sum-of-log-ratios is replaced by the mean scaled ratio, monotone
    * per feature, bit-identical across engines; the per-occurrence mean
    * (rather than the raw sum) keeps long and short documents on one
    * scale, exactly like `lm_score`. Documents with empty text have no
    * features, hence no weight and no row (route them to a length
    * filter). Decimal(38) headroom: the numerator is ≤ 1e9·ct·Nr ≈
    * 1e9·1e12·1e13 = 1e34 at 100 TB corpus scale — inside decimal(38)
    * exact arithmetic on both engines. */
  /** The hashed unigram+bigram feature occurrences of a corpus:
    * `(doc_id, b, m)` with `b` the portable md5 bucket. Unigrams ++
    * bigrams materialize as ONE array in one projection — a union of
    * two explode branches would scan and tokenize the corpus twice for
    * the same multiset of features. */
  def dsirFeatures(d: DataFrame, buckets: Int,
                   id: Column = col("doc_id"),
                   text: Column = col("text")): DataFrame =
    dsirFeats(d, buckets, id, text)

  /** The exploded unigram++bigram feature generator shared by the
    * train-side occurrence table and the apply-side scorer — one
    * generator over a PRE-TOKENIZED array column (tokenize once per
    * row; inlining the split here would re-tokenize per reference). */
  private def featsFromTokens(t: Column): Column =
    explode(concat(t, zip_with(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))))

  private def dsirFeats(d: DataFrame, buckets: Int,
                        id: Column, text: Column): DataFrame =
    d.select(id.as("doc_id"), wsTokens(text).as("__t"))
      .select(col("doc_id"), featsFromTokens(col("__t")).as("f"))
      .select(col("doc_id"),
        (Sampling.hashBucket(col("f")) % buckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("m"))

  /** The DSIR ratio table — the TRAINED state of the selector, built
    * once and applied to any number of batches ([[dsirScore]]): per
    * bucket, the add-one-smoothed integer-scaled target/raw likelihood
    * ratio over the given target occurrences and raw occurrences (both
    * in [[dsirFeats]]' (doc_id, b, m) shape). ≤ `buckets`+ rows — the
    * frozen, broadcastable artifact a production pipeline lands in the
    * warehouse and every later scoring pass (batch or streaming) reads
    * back. Buckets never seen in the raw corpus fall back to the
    * smoothed floor at scoring time via [[dsirScore]]'s coalesce. */
  def dsirRatioTable(targetOcc: DataFrame, rawOcc: DataFrame,
                     buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    val ct = targetOcc.groupBy("b").agg(sum("m").as("ct"))
    val cr = rawOcc.groupBy("b").agg(sum("m").as("cr"))
    // totals as 1-row frames (metadata-sized crossJoin, the vocab idiom)
    val nt = ct.agg(coalesce(sum("ct"), lit(0L)).as("nt"))
    val nr = cr.agg(coalesce(sum("cr"), lit(0L)).as("nr"))
    cr.join(ct, Seq("b"), "full")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .withColumn("r", expr(
        s"""CAST(1000000000 AS DECIMAL(38,0)) * (coalesce(ct, 0L) + 1)
           |  * (nr + $buckets)
           |  div (CAST(coalesce(cr, 0L) + 1 AS DECIMAL(38,0))
           |       * (nt + ${buckets}L))""".stripMargin))
      .select("b", "r")
  }

  /** Score a batch of documents against a FROZEN ratio table — the
    * apply half of DSIR (train once on the big corpora, score every
    * later batch against the landed table; the
    * tfidfSimilarityJoinFromTerms discipline, so the one-shot and
    * production paths cannot drift): each document's `dsir_weight` is
    * the exact integer mean of its feature occurrences' ratios. A
    * batch feature hashed to a bucket absent from the table (possible
    * only when the table was built from other corpora) scores the
    * smoothed floor `1e9 div (nt-proxy)` — callers wanting that law
    * must land the FULL `buckets`-row table ([[dsirRatioTable]] emits
    * every bucket either corpus touched; a truly absent bucket means
    * neither corpus ever hashed there, and the conservative neutral
    * 1e9 is applied: unseen-everywhere features carry no evidence). */
  def dsirScore(docs: DataFrame, ratio: DataFrame, buckets: Int,
                id: Column = col("doc_id"),
                text: Column = col("text")): DataFrame =
    // ONE shuffle, not two: each feature OCCURRENCE meets the ≤buckets
    // broadcast map-side and the per-doc mean partial-aggregates into
    // one row per doc per partition — the (doc_id, b, m) intermediate
    // of [[dsirFeats]] would add a full extra exchange for the same
    // post-combine shuffle volume (it exists for the TRAIN side, where
    // the occurrence table feeds the ratio derivation too). Identical
    // integer law: sum of r over occurrences div occurrence count.
    docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
      .select(col("doc_id"), featsFromTokens(col("__t")).as("f"))
      .select(col("doc_id"),
        (Sampling.hashBucket(col("f")) % buckets).as("b"))
      .join(broadcast(ratio.select("b", "r")), Seq("b"), "left")
      .withColumn("r", coalesce(col("r"), lit(1000000000L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(expr("CAST(r AS DECIMAL(38,0))")).as("__sum_r"))
      .withColumn("dsir_weight",
        expr("CAST(__sum_r div n_feats AS BIGINT)"))
      .select(col("doc_id"), col("n_feats"), col("dsir_weight"))

  def dsirWeights(target: DataFrame, raw: DataFrame, buckets: Int = 512,
                  id: Column = col("doc_id"),
                  text: Column = col("text"),
                  onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    require(buckets >= 2, s"buckets=$buckets")
    // the raw corpus is featurized ONCE: cr and Nr both derive from the
    // per-doc occurrence table (algebraically identical to a second
    // corpus pass), and occ persists because the ratio derivation and
    // the scoring join both consume it (the GraphRank discipline)
    val occ = dsirFeats(raw, buckets, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(occ)
    val tOcc = dsirFeats(target, buckets, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(tOcc)
    val ratio = dsirRatioTable(tOcc, occ, buckets)
    // every scored bucket appears in cr by construction, so the left
    // join's neutral-fallback branch can never fire on this path and
    // the one-shot weights ARE dsirScore over the just-built table
    occ.join(broadcast(ratio), Seq("b"))
      .groupBy("doc_id")
      .agg(sum("m").as("n_feats"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * r")).as("__sum_r"))
      .withColumn("dsir_weight",
        expr("CAST(__sum_r div n_feats AS BIGINT)"))
      .select(col("doc_id"), col("n_feats"), col("dsir_weight"))
  }

  /** DSIR selection — [[dsirWeights]] plus the deterministic keep
    * decision: keep the top `keepPct`% of raw documents by weight. The
    * cutoff is the exact ascending-rank `(100-keepPct)` quantile of the
    * weights ([[graft.operators.EventAnalytics.exactGroupQuantiles]] —
    * two narrow passes, never a global sort/window over corpus rows)
    * and `keep = dsir_weight >= cut`; weight ties at the cut keep extra
    * documents, which IS the law (tied documents are indistinguishable
    * to the scorer — the [[perplexityBuckets]] convention). The
    * published stochastic resampling (Gumbel noise) is deliberately
    * replaced by the deterministic rank cut: reproducible across runs,
    * engines, and partitionings. */
  def dsirSelect(target: DataFrame, raw: DataFrame, keepPct: Int,
                 buckets: Int = 512,
                 id: Column = col("doc_id"),
                 text: Column = col("text"),
                 onPersist: DataFrame => Unit = _ => ()): DataFrame = {
    // the weight table feeds the quantile pass AND the keep join —
    // persist, don't re-run the whole scoring pipeline twice
    val w = dsirWeights(target, raw, buckets, id, text, onPersist)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    onPersist(w)
    dsirSelectFromWeights(w, keepPct)
  }

  /** [[dsirSelect]]'s keep decision over a PRECOMPUTED weights frame —
    * (doc_id, n_feats, dsir_weight) — the production entry point: the
    * importance weights are landed once per (target, raw) snapshot
    * (the [[perplexityBucketsFromScores]] pattern) and every selection
    * cut consumes the stored table instead of re-featurizing the
    * corpus. Equal to [[dsirSelect]] by construction (the one-shot
    * form delegates here). */
  def dsirSelectFromWeights(w: DataFrame, keepPct: Int): DataFrame = {
    require(1 <= keepPct && keepPct <= 99, s"keepPct=$keepPct")
    val cut = graft.operators.EventAnalytics.exactGroupQuantiles(
        w.withColumn("__g", lit("all")), col("__g"), col("dsir_weight"),
        Seq(100 - keepPct))
      .select(col("cut"))
    w.crossJoin(broadcast(cut))
      .withColumn("keep", col("dsir_weight") >= col("cut"))
      .select(col("doc_id"), col("n_feats"), col("dsir_weight"), col("keep"))
  }

  /** Per-slice n-gram diversity (the type–token ratio generalized to
    * n-grams — the Self-BLEU-family "is this slice repetitive?" corpus
    * readout): for each requested n, the slice's total n-gram
    * occurrence count and its DISTINCT n-gram count, both exact
    * integers; the diversity ratio is the caller's division. A slice
    * whose distinct/total collapses as n grows is template-generated
    * text; a diverse one keeps the ratio near 1.
    *
    * Scale shape: ONE totals scan for every n together — the token
    * count is computed once per doc and each n's total is a conditional
    * sum `max(0, tokens − n + 1)` off it, summed map-side, then melted
    * with stack — and ONE gram scan for every n's distinct leg: each
    * doc's per-n DISTINCT shingle lists are tagged with n and exploded
    * through a single generator, so the only gram shuffle carries
    * (slice, n, gram) with map-side dedup partials. |ns| never
    * multiplies the corpus scans. Exactness costs that one shuffle by
    * nature; at 100 TB swap the distinct leg for
    * [[Sketches.kmvDistinct]] when ±2% suffices.
    */
  def ngramDiversity(docs: DataFrame, slice: Column, ns: Seq[Int],
                     text: Column = col("text")): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct == ns,
      s"ns must be distinct and >= 1: $ns")
    val toks = size(split(Dedup.normalized(text), " "))
    val perN = ns.map(n =>
      sum(greatest(lit(0), coalesce(toks, lit(0)) - lit(n - 1))
        .cast("long")).as(s"__t$n"))
    val wide = docs.groupBy(slice.as("slice"))
      .agg(perN.head, perN.tail: _*)
    val totals = wide.select(col("slice"),
      expr(s"stack(${ns.length}, " +
        ns.map(n => s"$n, __t$n").mkString(", ") + ") AS (n, total_ngrams)"))
    // null text -> null shingle arrays -> flatten yields null -> the
    // explode drops the row, matching the zero totals above
    val tagged = docs.select(slice.as("slice"),
      explode(flatten(array(ns.map(n =>
        transform(Dedup.shingles(text, n),
          g => struct(lit(n).as("n"), g.as("g")))): _*))).as("tg"))
    val distincts = tagged
      .select(col("slice"), col("tg.n").as("n"), col("tg.g").as("g"))
      .groupBy("slice", "n").agg(countDistinct(col("g")).as("distinct_ngrams"))
    totals.join(distincts, Seq("slice", "n"), "left")
      .select(col("slice"), col("n"), col("total_ngrams"),
        coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"))
  }

  /** PMI collocation mining (phrase detection, word2vec-phrases style):
    * adjacent token pairs scored by an integer pointwise-mutual-
    * information surrogate — the UN-LOGGED PMI argument
    * `P(ab) / (P(a) P(b)) = c_ab * N / (c_a * c_b)`, scaled by 1e6 and
    * floor-divided in decimal(38). log is monotone, so the surrogate
    * ranks identically to true PMI and needs no libm — scores and the
    * ranking replay exactly in any engine.
    *
    * Shape at scale: bigrams form in the same narrow zip projection as
    * [[bigramLmScore]] (no self-join, no window); pair and unigram
    * counts partial-aggregate map-side, so the shuffles carry distinct
    * pairs/terms, not occurrences; N is a 1-row broadcast. The two
    * count joins are term-keyed shuffles of COUNT tables (vocab- and
    * pair-vocab-sized — far below corpus size; broadcastable when the
    * vocab fits). Final top-k is TakeOrderedAndProject, never a global
    * sort. `minCount` is the standard phrase-mining noise floor — a
    * 1-occurrence pair of two hapaxes would otherwise score N * 1e6.
    *
    * Overflow bound: `c_ab * 1e6 * N < N^2 * 1e6` needs decimal(38) up
    * to N ~ 1e16 tokens — comfortably past 100 TB of text. */
  def collocations(docs: DataFrame, minCount: Long = 5L, topK: Int = 100,
                   text: Column = col("text")): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount")
    // CACHED (the dfOrderedSets discipline): the bigram aggregation and
    // the unigram aggregation key differently — two distinct exchanges,
    // so exchange reuse cannot share the tokenize and the corpus would
    // tokenize twice. One token-array column per doc, evictable blocks.
    val toks = docs.select(wsTokens(text).as("__t")).cache()
    val pairs = toks.select(explode(zip_with(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__b"))
      .groupBy(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minCount)
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c").as("n_tokens"))
    pairs
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"),
        Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_e6", expr(
        "CAST(pair_n AS DECIMAL(38,0)) * 1000000 * n_tokens" +
          " div (CAST(c1 AS DECIMAL(38,0)) * c2)"))
      .select(col("w1"), col("w2"), col("pair_n"), col("pmi_e6"))
      .orderBy(col("pmi_e6").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** In-engine BPE merge learning (Sennrich et al. 2016) — the
    * tokenizer-training step itself, run as `k` deterministic rounds
    * over the WORD-FREQUENCY table (vocab-sized, aggregated once from
    * the corpus — round cost is independent of corpus size, the reason
    * BPE training scales to 100 TB at all):
    *
    *  - pair statistics: adjacent symbol pairs weighted by word count,
    *    one map-side-combined aggregation per round;
    *  - the winning pair is the 1-row `(count desc, lhs, rhs)` argmax —
    *    bounded driver metadata, like the graph ops' rescale collects;
    *  - the merge applies as a greedy left-to-right non-overlapping
    *    fold over each word's symbol array (`aggregate` — "aaa" under
    *    (a,a) becomes ["aa","a"], the standard BPE scan), so next
    *    round's statistics see the merged symbols.
    *
    * Words are restricted to `^[a-z0-9]+$` (post-normalization): BPE
    * character splitting is defined on code points, and keeping the
    * alphabet ASCII keeps Spark's UTF-16 `split` and SQL's
    * char-indexed `substr` in agreement — which is what lets the
    * DuckDB oracle replay every round (pair counts, argmax, the
    * replace-based merge) exactly. Ties on pair count break
    * lexicographically, so the whole merge table is a pure function of
    * the corpus. Returns (merge_rank, lhs, rhs, pair_n); fewer than
    * `k` rows when the pair supply exhausts first. */
  def bpeMerges(docs: DataFrame, k: Int,
                text: Column = col("text")): DataFrame = {
    require(k >= 1, s"k=$k")
    val spark = docs.sparkSession
    // The corpus is read ONCE: the word-frequency table is persisted
    // before the round loop, so each round's pair-stats action replays
    // only vocab-sized folds, never the corpus explode (5 rounds would
    // otherwise mean 5 full corpus scans through the growing lineage).
    val words = docs.select(explode(wsTokens(text)).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cur = words.withColumn("syms",
      filter(split(col("w"), ""), s => length(s) > 0))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val best = cur.select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((r, a, b, c))
        val merged = a + b
        cur = cur.withColumn("syms",
          aggregate(col("syms"), array().cast("array<string>"), (acc, s) =>
            when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
                s === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
              .otherwise(concat(acc, array(s)))))
        r += 1
      }
    }
    words.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "lhs", "rhs", "pair_n")
  }

  /** Apply a learned BPE merge table to a corpus — the tokenizer's
    * ENCODE half ([[bpeMerges]] is the training half; an engine that
    * can learn merges but not apply them leaves the user to
    * re-implement the exact greedy scan, and any drift there silently
    * changes every downstream token count). Each word's character
    * symbols fold through the merges in merge-RANK order with the
    * training scan VERBATIM (greedy left-to-right non-overlapping), so
    * encoding the training corpus reproduces training's final symbol
    * state, and encoding any other corpus applies the tokenizer exactly
    * as trained.
    *
    * Scale shape: the merge folds run over the DISTINCT-WORD table only
    * (k x vocab work, independent of corpus size — the same property
    * that makes training scale); the corpus pays one narrow posexplode,
    * one word-keyed join against the word->pieces map (broadcast when
    * it fits — the planner's call via AQE), and the [[encodeCorpus]]
    * order-restoring per-doc reassembly (partitioning-independent).
    * Words outside the trained `[a-z0-9]+` alphabet — which training
    * excluded, see [[bpeMerges]]' portability note — pass through as a
    * single opaque piece (the real-tokenizer byte-fallback analogue).
    * Empty/null docs encode as (0, ""). Output: (doc_id, n_pieces,
    * pieces) with pieces space-joined in document order — the canonical
    * cross-engine rendering, like [[encodeCorpus]]' id strings.
    *
    * `merges` is the [[bpeMerges]] output (or any (merge_rank, lhs,
    * rhs) table); it is collected to the driver — bounded by the
    * training parameter k, the same metadata class as training's own
    * per-round argmax collects. */
  /** Tokenizer BUDGET sweep — how much does each extra merge buy:
    * corpus-level pieces-per-word and encoded-piece vocabulary at
    * several merge budgets, priced from ONE learned merge table via the
    * BPE prefix law (greedy training is sequential, so the first `j`
    * merges of a k-merge table ARE the j-merge tokenizer — no
    * retraining per operating point, the [[graft.llm.Dedup.bandingSweep]]
    * discipline applied to the tokenizer). `budget = 0` is the
    * character baseline. A flattening pieces-per-word curve says the
    * remaining merges buy little — the datapoint a vocab-size decision
    * actually needs.
    *
    * Law: per budget j, every alphabet word segments under merges
    * 1..j ([[bpeEncode]]'s exact fold), non-alphabet words pass
    * through whole; `total_pieces` weights by corpus occurrence,
    * `pieces_per_word_scaled = 1e9·pieces div words` (exact integers),
    * `piece_vocab` counts distinct piece strings in the encoded
    * corpus.
    *
    * Scale shape: the corpus is read once into the word-frequency
    * table; the per-budget segmentations explode over the DISTINCT
    * word table only (steps × vocab rows), and stats + piece vocab
    * come out of ONE per-piece aggregation pass — the fold
    * expressions never evaluate twice and nothing persists. The snapshot
    * expressions nest one fold per merge, so this is the EXPLORATORY
    * tool for small k (tokenizer design); a production 32k-merge
    * tokenizer applies ONE budget through [[bpeEncode]]'s loop. */
  def bpeBudgetSweep(docs: DataFrame, merges: DataFrame, steps: Seq[Int],
                     text: Column = col("text")): DataFrame = {
    require(steps.nonEmpty && steps.forall(_ >= 0) &&
      steps == steps.sorted && steps.distinct.size == steps.size,
      s"steps must be ascending distinct non-negative: $steps")
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    require(steps.last <= ms.length,
      s"budget ${steps.last} exceeds the ${ms.length}-merge table")
    val wn = docs.select(explode(wsTokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    var syms: Column = filter(split(col("w"), ""), s => length(s) > 0)
    val snaps = scala.collection.mutable.ArrayBuffer.empty[(Int, Column)]
    if (steps.head == 0) snaps += ((0, syms))
    var j = 0
    ms.take(steps.last).foreach { case (a, b) =>
      val m = a + b
      syms = aggregate(syms, array().cast("array<string>"), (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) &&
            s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
          .otherwise(concat(acc, array(s))))
      j += 1
      if (steps.contains(j)) snaps += ((j, syms))
    }
    val snapArr = array(snaps.toSeq.map { case (jj, s) =>
      struct(lit(jj).as("budget"),
        when(col("w").rlike("^[a-z0-9]+$"), s)
          .otherwise(array(col("w"))).as("pieces")) }: _*)
    // ONE pass: the nested fold expressions (the sweep's whole cost)
    // evaluate once per distinct word, and stats + piece vocab come out
    // of a single per-piece aggregation — `n_words` counts each word at
    // its first piece (pieces are never empty: tokens are non-empty, so
    // both the char split and the whole-word fallback yield ≥1 piece),
    // `total_pieces` weights every piece by the word's corpus count.
    // No persist/join/second-scan; the earlier two-consumer form paid
    // the fold twice or a vocab-sized cache to avoid it.
    wn.select(col("n"), explode(snapArr).as("__e"))
      .select(col("n"), col("__e.budget").as("budget"),
        col("__e.pieces").as("pieces"))
      .select(col("n"), col("budget"),
        posexplode(col("pieces")).as(Seq("__pos", "__p")))
      .groupBy("budget").agg(
        sum(when(col("__pos") === 0, col("n"))).as("n_words"),
        sum(col("n")).as("total_pieces"),
        count_distinct(col("__p")).as("piece_vocab"))
      .withColumn("pieces_per_word_scaled", expr(
        "(CAST(1000000000 AS DECIMAL(38,0)) * total_pieces) div n_words"))
      .select(col("budget"), col("n_words"), col("total_pieces"),
        col("pieces_per_word_scaled"), col("piece_vocab"))
  }

  /** BPE APPLY (X108): encode the corpus under a LEARNED merge table
    * ([[bpeMerges]]' training fold verbatim, applied in rank order) —
    * cost is merges × DISTINCT words, corpus-size-independent; each
    * document then picks up its words' piece strings through one
    * term-keyed join.
    *
    * Expression-depth bound: each merge nests one `aggregate()` fold
    * into the symbol column, so a single-plan application of a
    * production 32k-merge tokenizer would blow the analyzer/codegen
    * stack long before data size matters. Merges therefore apply in
    * CHUNKS of `chunkMerges`: after each chunk the distinct-word
    * symbol state materializes via `localCheckpoint` (the
    * [[graft.operators.GraphRank.pageRank]] lineage discipline —
    * superseded checkpoints unpersist as soon as the next one lands),
    * so plan depth is bounded by the chunk while the total work stays
    * merges × vocab across k/chunk bounded-depth passes. A table at
    * or under the chunk plans exactly as one pass (no checkpoint). */
  def bpeEncode(docs: DataFrame, merges: DataFrame,
                id: Column = col("doc_id"),
                text: Column = col("text"),
                chunkMerges: Int = 64): DataFrame = {
    require(chunkMerges >= 1, s"chunkMerges=$chunkMerges")
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val words = docs.select(explode(wsTokens(text)).as("w")).distinct()
    def fold(start: Column, grp: Array[(String, String)]): Column = {
      var syms = start
      grp.foreach { case (a, b) =>
        val m = a + b
        syms = aggregate(syms, array().cast("array<string>"), (acc, s) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
            .otherwise(concat(acc, array(s))))
      }
      syms
    }
    // non-alphabet words pass through whole and never enter a fold —
    // the when-gate rides EVERY chunk so the skip holds at runtime in
    // the chunked path exactly as it does in the single-plan path
    val alpha = col("w").rlike("^[a-z0-9]+$")
    val chars: Column = filter(split(col("w"), ""), s => length(s) > 0)
    val encoded =
      if (ms.length <= chunkMerges)
        words.select(col("w"),
          when(alpha, fold(chars, ms)).otherwise(array(col("w")))
            .as("__pieces"))
      else {
        // residency: each localCheckpoint materializes the vocab-sized
        // symbol table; a SUPERSEDED checkpoint's blocks are freed by
        // Spark's ContextCleaner once the old frame is unreferenced
        // (GC-driven, not immediate — the GraphRank residency note),
        // bounded at a few vocab-sized tables beyond the live one
        val grps = ms.grouped(chunkMerges).toSeq
        var state = words.select(col("w"), alpha.as("__alpha"),
            when(alpha, fold(chars, grps.head.toArray))
              .otherwise(array(col("w"))).as("__pieces"))
          .localCheckpoint()
        grps.tail.foreach { grp =>
          state = state.select(col("w"), col("__alpha"),
              when(col("__alpha"), fold(col("__pieces"), grp.toArray))
                .otherwise(col("__pieces")).as("__pieces"))
            .localCheckpoint()
        }
        state.select(col("w"), col("__pieces"))
      }
    val pieces = encoded
      .select(col("w"), array_join(col("__pieces"), " ").as("__ps"),
        size(col("__pieces")).cast("long").as("__np"))
    docs.select(id.as("doc_id"),
        posexplode_outer(wsTokens(text)).as(Seq("pos", "w")))
      .join(pieces, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        coalesce(sum(when(col("pos").isNotNull, col("__np"))), lit(0L))
          .as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(when(col("pos").isNotNull,
            struct(col("pos"), col("__ps"))))),
          p => p.getField("__ps")), " ").as("pieces"))
  }

  /** Tokenizer fertility per corpus slice — the standard multilingual
    * tokenizer-parity readout (fertility = subword pieces per word;
    * Ács' metric): a tokenizer that fragments one language into 3×
    * more pieces than another silently taxes that language's effective
    * context window and training token budget, so pipelines audit
    * fertility per language/domain before committing a tokenizer.
    * Composes the BPE halves (X68 train, X108 apply) with one narrow
    * slice-keyed groupBy — the [[bpeEncode]] join does the heavy work;
    * the readout adds no corpus-row shuffle beyond it.
    *
    * Output per slice: doc/word/char/piece totals plus two exact
    * integer-scaled rates (the no-libm policy): `fertility_scaled =
    * 1e6 * n_pieces div n_words` (pieces per word) and
    * `chars_per_piece_scaled = 1e6 * n_chars div n_pieces` (the
    * compression ratio — characters are the whitespace-token
    * characters, i.e. text minus separators). A slice with zero words
    * (or zero pieces) has no defined rate and reports NULL rather than
    * a fake zero. Decimal(38) headroom through 100 TB piece counts. */
  def tokenizerFertility(docs: DataFrame, merges: DataFrame,
                         slice: Column = col("lang"),
                         id: Column = col("doc_id"),
                         text: Column = col("text")): DataFrame = {
    val enc = bpeEncode(docs, merges, id, text)
    val st = docs.select(id.as("doc_id"), slice.as("slice"),
      size(wsTokens(text)).cast("long").as("__w"),
      length(array_join(wsTokens(text), "")).cast("long").as("__c"))
    st.join(enc, Seq("doc_id"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_docs"), sum("__w").as("n_words"),
        sum("__c").as("n_chars"), sum("n_pieces").as("n_pieces"))
      .withColumn("fertility_scaled", when(col("n_words") > 0, expr(
        "CAST(1000000 AS DECIMAL(38,0)) * n_pieces div n_words")))
      .withColumn("chars_per_piece_scaled", when(col("n_pieces") > 0, expr(
        "CAST(1000000 AS DECIMAL(38,0)) * n_chars div n_pieces")))
      .select(col("slice"), col("n_docs"), col("n_words"), col("n_chars"),
        col("n_pieces"), col("fertility_scaled"),
        col("chars_per_piece_scaled"))
  }

  /** Frequency-ranked vocabulary: `(term, c, token_id)` with ids
    * assigned 1..V in `(count desc, term asc)` order — the tokenizer-
    * training primitive (id tables for word-level models, candidate
    * ranking for subword learners) and a corpus artifact that must be
    * DETERMINISTIC: ids are a pure function of the corpus, no
    * first-seen or partition order anywhere.
    *
    * The total order is materialized WITHOUT a global sort: the
    * [[graft.llm.Sampling.lengthGroupedBatches]] two-phase shape —
    * per-(count, term-prefix) summary counts, running offsets over the
    * summary (a bounded window: distinct (c, prefix) pairs, not terms),
    * then within-group `row_number` ordered by term. The prefix is the
    * term's own leading chars, so (c desc, prefix asc, term asc)
    * IS (c desc, term asc) — and the prefix splits the huge
    * c = minCount long-tail group that a plain per-count partition
    * would funnel into one task. */
  def buildVocab(docs: DataFrame, minCount: Long = 1L,
                 text: Column = col("text"),
                 prefixLen: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minCount >= 1 && prefixLen >= 1, s"$minCount/$prefixLen")
    val counts = docs.select(explode(wsTokens(text)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .withColumn("__p", substring(col("term"), 1, prefixLen))
    val offsets = counts
      .groupBy(col("c").as("__c"), col("__p").as("__pp"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__c").desc, col("__pp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__c"), col("__pp"), col("__off"))
    val wIn = Window.partitionBy(col("c"), col("__p")).orderBy(col("term"))
    counts.join(broadcast(offsets),
        col("c") === col("__c") && col("__p") === col("__pp"))
      .withColumn("token_id", col("__off") + row_number().over(wIn))
      .select(col("term"), col("c"), col("token_id"))
  }

  /** Corpus encoding against a [[buildVocab]] table: each document's
    * tokens as its vocabulary ids, out-of-vocabulary as -1, rendered as
    * a space-joined id string (a canonical cross-engine rendering —
    * array outputs don't stringify identically across engines, id
    * strings do). One narrow posexplode + a term-keyed join against the
    * vocab (broadcast when it fits — the planner's call via AQE) + one
    * per-doc re-assembly groupBy; token order is restored by sorting
    * the (pos, id) pairs, not by collection order, so the result is
    * partitioning-independent. */
  def encodeCorpus(docs: DataFrame, vocab: DataFrame,
                   id: Column = col("doc_id"),
                   text: Column = col("text")): DataFrame =
    docs.select(id.as("doc_id"), posexplode_outer(wsTokens(text))
        .as(Seq("pos", "term")))
      .join(vocab.select(col("term"), col("token_id")), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(col("pos")).as("n_tok"),
        // empty/null-text docs surface one all-null generator row
        // (posexplode_outer); the `when` nulls it so collect_list skips
        // it and they encode as n_tok = 0, ids = "" — not a ghost "-1"
        array_join(transform(
          array_sort(collect_list(when(col("pos").isNotNull,
            struct(col("pos"), col("token_id"))))),
          p => coalesce(p.getField("token_id"), lit(-1L)).cast("string")),
          " ").as("ids"))

  /** Reciprocal-rank fusion of ranked candidate lists — the standard
    * hybrid-retrieval combiner (lexical + semantic + priors), kept
    * engine-portable: each system contributes
    * `1e9 div (kConst + rank)` and a document's fused score is the SUM
    * over the systems that ranked it (absent = 0). Integer floor-divide
    * end to end, so fused scores and the fused ranking replay exactly
    * in SQL; ties break on doc_id.
    *
    * Fusion happens over the UNION OF TOP-K CANDIDATES, never a global
    * corpus ranking — a per-system global rank would funnel the corpus
    * through one sort task, while the candidate union is
    * |systems| * k * |queries| rows. Inputs must carry
    * (query_id, doc_id, rank). */
  def rrfFuse(systems: Seq[DataFrame], kConst: Long = 60L,
              topK: Int = 10): DataFrame = {
    require(systems.nonEmpty, "need at least one ranking")
    val scored = systems.map(_.select(col("query_id"), col("doc_id"),
        expr(s"1000000000L div ($kConst + rank)").as("part")))
      .reduce(_ unionByName _)
      .groupBy("query_id", "doc_id").agg(sum("part").as("rrf_score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("rrf_score"), col("rank"))
  }

  /** Engine-portable BM25 retrieval: top-`k` documents per query.
    *
    * The scoring kernel is EXACT integer arithmetic end to end, so both
    * the ranking and the scores are bit-identical across engines:
    *
    *   - idf is the integer-scaled rational Robertson idf ARGUMENT,
    *     `(2N - 2df + 1) * 1_000_000 div (2df + 1)` — true BM25 takes
    *     `ln` of that rational, but `ln` is monotone so the per-term
    *     ordering is unchanged, and dropping it keeps libm out of the
    *     kernel (the same policy as [[topTfidfTerms]]'s integer idf).
    *   - the saturation/length normalization (k1 = 6/5, b = 3/4) is
    *     cleared of denominators: with N = corpus doc count and T =
    *     corpus token count (avgdl = T/N stays a RATIONAL — never a
    *     float divide), `tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/T))`
    *     becomes `44*tf*T / (20*tf*T + 6*T + 18*dl*N)`.
    *   - each term's contribution floor-divides in decimal(38,0)
    *     (HUGEINT in the oracle) down to a long, and the per-document
    *     score is a SUM of those longs — order-independent, so partial
    *     aggregation is safe.
    *
    * Scale shape: NOTHING corpus-wide ever shuffles. Document lengths
    * and the N/T stats come from a narrow `size(tokens)` projection (no
    * explode, no groupBy on the corpus); the exploded-token stream is
    * filtered to the LITERAL query vocabulary inside its scan tasks
    * before the tf aggregation, so the only shuffles carry query-term
    * hits; df aggregates that same tiny table. The per-query top-k
    * rewrites to WindowGroupLimit. N and T count non-empty documents
    * (an empty document has no length to normalize by). Query terms
    * absent from the corpus contribute nothing; a query with no corpus
    * term produces no rows. */
  def bm25TopK(docs: DataFrame, queries: Seq[(String, String)], k: Int = 10,
               id: Column = col("doc_id"),
               text: Column = col("text")): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE query tokenization feeds both the scan-side vocabulary filter
    // and the qterms join table, so they cannot drift
    val qtermRows = queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (w, occ) => (qid, w, occ.length.toLong) }
    }
    val qvocab = qtermRows.map(_._2).distinct.sorted
    val toks = docs.select(id.as("doc_id"), wsTokens(text).as("__t"))
    val stats = toks.select(size(col("__t")).as("dl")).filter(col("dl") > 0)
      .agg(count(lit(1)).as("n"), sum("dl").as("t"))
    // dl rides along as a grouping key (constant per doc), so scoring
    // needs no join back to a corpus-sized length table
    val tf = toks
      .select(col("doc_id"), size(col("__t")).as("dl"),
        explode(col("__t")).as("term"))
      .filter(col("term").isin(qvocab: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val qterms = qtermRows.toDF("query_id", "term", "qtf")
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val perTerm = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      // decimal(38,0) keeps the cleared-denominator products exact far
      // past long range (idf*44*tf*T*qtf overflows a long at real N, T)
      .withColumn("score_t", expr(
        """CAST(
          |  CAST((2*n - 2*df + 1) AS DECIMAL(38,0)) * 1000000
          |    div CAST(2*df + 1 AS DECIMAL(38,0))
          |  * CAST(44 AS DECIMAL(38,0)) * tf * t * qtf
          |  div (CAST(20 AS DECIMAL(38,0)) * tf * t
          |       + CAST(6 AS DECIMAL(38,0)) * t
          |       + CAST(18 AS DECIMAL(38,0)) * dl * n)
          |AS BIGINT)""".stripMargin))
    val scored = perTerm.groupBy("query_id", "doc_id")
      .agg(sum("score_t").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }
}
