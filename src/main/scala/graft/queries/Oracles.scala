package graft.queries

/** DuckDB oracle SQL for [[TestdataQueries]] — ANSI-ish SQL the driver runs
  * over the same parquet tables. Every computed column is aliased to the
  * exact name the Spark side produces (the driver sorts columns by name
  * before hashing). Queries with engine-specific hashing (xxhash64) or
  * approximate recall (LSH) are intentionally absent -> rows-only check.
  */
object Oracles {

  private val norm = raw"regexp_replace(lower(text), '\s+', ' ', 'g')"

  /** Shared CTE chain recomputing the portable MinHash LSH pipeline
    * (shingles -> md5-derived signatures -> banding -> candidate pairs ->
    * estimated Jaccard) — used by q44 and, with a recursive-CTE
    * connected-components tail, by q53. */
  private lazy val minhashSigCtes: String =
    raw"""tk AS (
       |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS s
       |  FROM tk),
       |h AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(s), 1, 7))::BIGINT AS h1,
       |         ('0x' || substr(md5(s), 8, 7))::BIGINT AS h2
       |  FROM sh),
       |sig AS (
       |  SELECT doc_id, r.i AS i, min((h1 + r.i * h2) % 268435399) AS m
       |  FROM h, range(0, 32) r(i)
       |  GROUP BY 1, 2)""".stripMargin

  /** Banding -> candidate pairs -> estimated Jaccard off a signature
    * CTE (default the shared `sig`), with `rowsPerBand` rows per band
    * (bands = 32 / rowsPerBand) and every CTE name suffixed so several
    * operating points can coexist in one query (q153). Mirrors the
    * engine's degenerate-bucket guard (buckets with more than
    * `Dedup.MaxBucketMembers` members contribute no pairs) so the
    * oracle can never silently diverge on boilerplate-heavy data where
    * a loose banding saturates a bucket — invisible at the tested
    * scales (no bucket comes close to the cap), semantics-preserving
    * everywhere. */
  private def bandChainCtes(rowsPerBand: Int, sfx: String,
                            sigTable: String = "sig"): String =
    raw"""band$sfx AS (
       |  SELECT doc_id, i // $rowsPerBand AS band,
       |         string_agg(m::VARCHAR, ',' ORDER BY i) AS bucket
       |  FROM $sigTable GROUP BY 1, 2),
       |keep$sfx AS (
       |  SELECT band, bucket FROM band$sfx
       |  GROUP BY 1, 2
       |  HAVING count(*) <= ${graft.llm.Dedup.MaxBucketMembers}),
       |pairs$sfx AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM band$sfx a
       |  JOIN keep$sfx k ON k.band = a.band AND k.bucket = a.bucket
       |  JOIN band$sfx b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |est$sfx AS (
       |  SELECT p.id_a, p.id_b,
       |         (count(*) FILTER (WHERE sa.m = sb.m)) / 32.0 AS est_jaccard
       |  FROM pairs$sfx p
       |  JOIN $sigTable sa ON sa.doc_id = p.id_a
       |  JOIN $sigTable sb ON sb.doc_id = p.id_b AND sb.i = sa.i
       |  GROUP BY 1, 2)""".stripMargin

  private lazy val minhashPortableCtes: String =
    minhashSigCtes + ",\n" + bandChainCtes(4, "")

  /** Exact trigram-set pairs at Jaccard >= 3/5 — the brute-force
    * ground truth behind q79 (which exposes the jaccard value from
    * `ex`'s inter/uni) and the candidate-quality readouts q152/q153
    * (which use only the pair columns), as `sets`/`ex` CTE text over
    * the `tk` tokenization. `extraWhere` restricts the doc population
    * (q153's sample); ONE definition so none of the three can drift
    * from the others. */
  private def exactPairCtes(extraWhere: String = ""): String =
    raw"""sets AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(t) - 1),
       |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |  FROM tk WHERE len(t) >= 3$extraWhere),
       |exraw AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b,
       |         len(list_intersect(a.s, b.s)) AS inter,
       |         len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
       |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id),
       |ex AS (SELECT * FROM exraw WHERE inter * 5 >= uni * 3)""".stripMargin

  /** Shared CTE chain recomputing the exact-integer BM25 pipeline up to
    * the per-query ranking (`bmranked`) — used by q93 and, as the
    * lexical leg of the RRF fusion, by q99. The VALUES rows derive from
    * the ONE query list the Spark side uses. */
  private lazy val bm25Ctes: String = {
    val vals = TestdataQueries.Bm25Queries.flatMap { case (qid, qtext) =>
      qtext.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).toSeq.sortBy(_._1)
        .map { case (w, occ) => s"('$qid', '$w', ${occ.length})" }
    }.mkString(", ")
    raw"""tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split($norm, ' '),
       |    t -> len(t) > 0)) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n, sum(dl) AS t FROM dl),
       |q(query_id, term, qtf) AS (VALUES $vals),
       |dfs AS (SELECT term, count(*) AS df FROM tf
       |        WHERE term IN (SELECT term FROM q) GROUP BY term),
       |hit AS (
       |  SELECT q.query_id, tf.doc_id,
       |         CAST(
       |           CAST((2*s.n - 2*d.df + 1) AS HUGEINT) * 1000000
       |             // CAST(2*d.df + 1 AS HUGEINT)
       |           * 44 * tf.tf * s.t * q.qtf
       |           // (CAST(20 AS HUGEINT) * tf.tf * s.t + 6 * s.t
       |              + 18 * dl.dl * s.n)
       |         AS BIGINT) AS score_t
       |  FROM tf JOIN q USING (term) JOIN dfs d USING (term)
       |       JOIN dl USING (doc_id) CROSS JOIN stats s),
       |sc AS (SELECT query_id, doc_id, CAST(sum(score_t) AS BIGINT)
       |         AS score FROM hit GROUP BY 1, 2),
       |bmranked AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM sc)""".stripMargin
  }

  /** Shared CTE chain recomputing the portable SimHash pipeline
    * (2-gram shingles -> 56-bit md5-derived hash -> per-bit sign sums ->
    * fingerprint -> 14-bit block LSH -> Hamming-scored candidate pairs) —
    * used by q45 and q60. */
  private lazy val simhashPortableCtes: String =
    raw"""tk AS (
       |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i+1]))) AS s
       |  FROM tk),
       |h AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(s), 1, 7))::BIGINT * 268435456
       |           + ('0x' || substr(md5(s), 8, 7))::BIGINT AS h
       |  FROM sh),
       |bits AS (
       |  SELECT doc_id, r.bit AS bit,
       |         sum(CASE WHEN (h >> r.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
       |  FROM h, range(0, 56) r(bit)
       |  GROUP BY 1, 2),
       |fp AS (
       |  SELECT doc_id,
       |         sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS fp
       |  FROM bits GROUP BY 1),
       |blocked AS (
       |  SELECT doc_id, fp, r.blk AS blk,
       |         (fp >> (r.blk * 14)) & 16383 AS key
       |  FROM fp, range(0, 4) r(blk)),
       |keepb AS (
       |  SELECT blk, key FROM blocked
       |  GROUP BY 1, 2
       |  HAVING count(*) <= ${graft.llm.Dedup.MaxBucketMembers}),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |         bit_count(xor(a.fp, b.fp)) AS hamming
       |  FROM blocked a
       |  JOIN keepb k ON k.blk = a.blk AND k.key = a.key
       |  JOIN blocked b
       |    ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)""".stripMargin

  /** Sequential dot product over 64-dim embeddings — `list_reduce` is an
    * explicit left fold, so the accumulation order (and therefore every
    * bit of the double result) matches the engine's native VecDot loop.
    * `0.0 + x == x` in IEEE, so starting from the first product equals
    * the engine's zero-initialized accumulator. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> " +
      s"$a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  /** cosine with the engine's exact arithmetic: dot / (sqrt(aa)*sqrt(bb)). */
  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** The rp_bits hyperplane weights as exact decimal literals — the same
    * xxhash64-derived constants [[graft.expr.RpBits]] precomputes, so the
    * oracle's bucket assignment is bit-for-bit the engine's. */
  private def planesValues(nPlanes: Int, dim: Int): String =
    (0 until nPlanes).map { p =>
      val ws = (0 until dim).map { d =>
        val x = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashInt(p * 7919 + d, 42L) % 1000000L
        new java.math.BigDecimal(x).movePointLeft(6).toPlainString
      }.mkString("[", ", ", "]::DOUBLE[]")
      s"($p, $ws)"
    }.mkString(",\n         ")

  /** CTE chain replaying [[graft.llm.Similarity.kmeansAssign]] exactly:
    * smallest-id seeds, `iters` Lloyd rounds (argmax-cosine assignment
    * with ties to the smallest cluster; centroid update via exact
    * `floor(v*1e9+0.5)` integer sums divided back in the engine's op
    * order), then a final assignment. The last CTE is `a$iters`
    * (vec_id, embedding, cluster, cos). */
  private def kmeansCtes(k: Int, iters: Int, trainPred: String = "TRUE",
                         finalPred: String = "TRUE"): String = {
    def assignCte(name: String, cent: String, pred: String): String =
      s"""$name AS (
         |  SELECT vec_id, embedding, cluster, cos FROM (
         |    SELECT e.vec_id, e.embedding, c.cluster,
         |           ${cosSql("e.embedding", "c.centroid")} AS cos,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC,
         |                      c.cluster ASC) AS rn
         |    FROM embeddings e CROSS JOIN $cent c WHERE $pred)
         |  WHERE rn = 1)""".stripMargin
    val seeds =
      s"""cent0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
         |         CAST(embedding AS DOUBLE[]) AS centroid
         |  FROM (SELECT * FROM embeddings WHERE $trainPred
         |        ORDER BY vec_id LIMIT $k))""".stripMargin
    val rounds = (0 until iters).map { i =>
      s"""${assignCte(s"a$i", s"cent$i", trainPred)},
         |sums$i AS (
         |  SELECT a.cluster, t.i AS pos,
         |         sum(CAST(floor(a.embedding[t.i]::DOUBLE * 1000000000.0 + 0.5)
         |                  AS BIGINT)) AS s,
         |         count(*) AS c
         |  FROM a$i a, range(1, 65) t(i)
         |  GROUP BY 1, 2),
         |cent${i + 1} AS (
         |  SELECT s.cluster,
         |         CASE WHEN count(n.pos) = 0 THEN any_value(s.centroid)
         |              ELSE list((CAST(n.s AS DOUBLE) / 1000000000.0) /
         |                        CAST(n.c AS DOUBLE) ORDER BY n.pos)
         |         END AS centroid
         |  FROM cent$i s LEFT JOIN sums$i n USING (cluster)
         |  GROUP BY s.cluster)""".stripMargin
    }
    (Seq(seeds) ++ rounds ++
        Seq(assignCte(s"a$iters", s"cent$iters", finalPred)))
      .mkString(",\n")
  }

  /** Shared CTE computing each embedding's rp_bits bucket. */
  private def bucketCte(nPlanes: Int): String =
    s"""planes AS (SELECT * FROM (VALUES
       |         ${planesValues(nPlanes, 64)}) pl(plane, w)),
       |buck AS (
       |  SELECT e.vec_id,
       |         sum(CASE WHEN list_reduce(list_transform(range(1, 65),
       |               i -> e.embedding[i]::DOUBLE * p.w[i]), (x, y) -> x + y) >= 0
       |             THEN (1::BIGINT << p.plane) ELSE 0 END) AS bucket
       |  FROM embeddings e, planes p GROUP BY 1)""".stripMargin

  /** Shared Moore–Lewis two-LM chain (q185 diffs per doc, q190
    * reweights per domain): both bigram-LM chains over the even-id
    * train splits, odd-id candidates scored, ending at sa(doc_id,
    * n_bigrams, lm_in) and sb(doc_id, lm_gen). */
  private val mooreLewisCtes: String =
    raw"""tk AS (
         |  SELECT doc_id, lang, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i
         |        FROM tk)),
         |c2a AS (SELECT w1, w2, count(*) AS c2 FROM bi
         |        WHERE doc_id % 2 = 0 AND lang = 'en' GROUP BY w1, w2),
         |c1a AS (SELECT w1, sum(c2) AS c1 FROM c2a GROUP BY w1),
         |va AS (SELECT count(DISTINCT w) AS v FROM (
         |         SELECT unnest(t) AS w FROM tk
         |         WHERE doc_id % 2 = 0 AND lang = 'en')),
         |c2b AS (SELECT w1, w2, count(*) AS c2 FROM bi
         |        WHERE doc_id % 2 = 0 AND lang <> 'en' GROUP BY w1, w2),
         |c1b AS (SELECT w1, sum(c2) AS c1 FROM c2b GROUP BY w1),
         |vb AS (SELECT count(DISTINCT w) AS v FROM (
         |         SELECT unnest(t) AS w FROM tk
         |         WHERE doc_id % 2 = 0 AND lang <> 'en')),
         |occ AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi
         |        WHERE doc_id % 2 = 1 GROUP BY doc_id, w1, w2),
         |pa AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(c2a.c2, 0) + 1)
         |           // (coalesce(c1a.c1, 0) + va.v) AS p
         |  FROM occ
         |  LEFT JOIN c2a ON occ.w1 = c2a.w1 AND occ.w2 = c2a.w2
         |  LEFT JOIN c1a ON occ.w1 = c1a.w1
         |  CROSS JOIN va),
         |sa AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |              CAST(sum(m * p) // sum(m) AS BIGINT) AS lm_in
         |       FROM pa GROUP BY doc_id),
         |pb AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(c2b.c2, 0) + 1)
         |           // (coalesce(c1b.c1, 0) + vb.v) AS p
         |  FROM occ
         |  LEFT JOIN c2b ON occ.w1 = c2b.w1 AND occ.w2 = c2b.w2
         |  LEFT JOIN c1b ON occ.w1 = c1b.w1
         |  CROSS JOIN vb),
         |sb AS (SELECT doc_id,
         |              CAST(sum(m * p) // sum(m) AS BIGINT) AS lm_gen
         |       FROM pb GROUP BY doc_id)""".stripMargin

  /** Shared BPE CTE chain (q129 learns, q166 applies): word-frequency
    * table w0 over the alphabet-restricted words, each word's symbol
    * segmentation as a chr(1)-wrapped string (\u0001sym\u0001\u0001sym\u0001...,
    * so the greedy left-to-right non-overlapping merge IS SQL replace()
    * and separators stop cross-symbol pattern bleed), then k unrolled
    * rounds p$r (pair stats) / m$r (lexicographic-tie argmax) / w$r
    * (merged segmentation). */
  private def bpeCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""p$r AS (
         |  SELECT sy[i] AS a, sy[i+1] AS b, sum(n) AS c FROM (
         |    SELECT n, sy, unnest(range(1, len(sy))) AS i FROM (
         |      SELECT n, string_split(trim(s, chr(1)),
         |                             chr(1) || chr(1)) AS sy
         |      FROM w${r - 1}))
         |  GROUP BY 1, 2),
         |m$r AS (SELECT a, b, CAST(c AS BIGINT) AS c FROM p$r
         |        ORDER BY c DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT w, n,
         |         replace(s, chr(1) || a || chr(1) || chr(1) || b || chr(1),
         |                 chr(1) || a || b || chr(1)) AS s
         |  FROM w${r - 1} CROSS JOIN m$r)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n,
       |         regexp_replace(w, '(.)',
       |           chr(1) || '\\1' || chr(1), 'g') AS s
       |  FROM (SELECT unnest(list_filter(string_split($norm, ' '),
       |          t -> len(t) > 0)) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z0-9]+$$')
       |  GROUP BY w),
       |$rounds""".stripMargin
  }

  /** WordPiece (X134) training replay — BPE's round structure
    * ([[bpeCtes]]' chr(1)-wrapped symbol strings) under the likelihood
    * selection law: each round recomputes pair AND unigram counts over
    * the current symbols, scores `pc·1e9 // (uc_a·uc_b)` in HUGEINT
    * (the engine's exact DECIMAL grid), takes the
    * `(score desc, pc desc, a, b)` argmax, and rewrites
    * `a + strip-##(b)` — continuation symbols are `##`-marked from the
    * seed split on, faithfully to the BERT trainer. */
  private def wpCtes(k: Int): String = {
    val rounds = (1 to k).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT sym, sum(n) AS uc FROM (
         |    SELECT n, unnest(string_split(trim(s, chr(1)),
         |                                  chr(1) || chr(1))) AS sym
         |    FROM v${r - 1})
         |  GROUP BY sym),
         |p$r AS MATERIALIZED (
         |  SELECT sy[i] AS a, sy[i+1] AS b, sum(n) AS c FROM (
         |    SELECT n, sy, unnest(range(1, len(sy))) AS i FROM (
         |      SELECT n, string_split(trim(s, chr(1)),
         |                             chr(1) || chr(1)) AS sy
         |      FROM v${r - 1}))
         |  GROUP BY 1, 2),
         |n$r AS (
         |  SELECT p.a AS a, p.b AS b, CAST(p.c AS BIGINT) AS c,
         |         CAST(CAST(p.c AS HUGEINT) * 1000000000
         |              // (CAST(ua.uc AS HUGEINT) * ub.uc) AS BIGINT)
         |           AS score
         |  FROM p$r p JOIN u$r ua ON p.a = ua.sym
         |             JOIN u$r ub ON p.b = ub.sym
         |  ORDER BY score DESC, c DESC, a, b LIMIT 1),
         |v$r AS MATERIALIZED (
         |  SELECT w, n,
         |         replace(s, chr(1) || a || chr(1) || chr(1) || b || chr(1),
         |                 chr(1) || a ||
         |                 regexp_replace(b, '^##', '') || chr(1)) AS s
         |  FROM v${r - 1} CROSS JOIN n$r)""".stripMargin
    }.mkString(",\n")
    s"""v0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n,
       |         chr(1) || substr(w, 1, 1) || chr(1) ||
       |           regexp_replace(substr(w, 2), '(.)',
       |             chr(1) || '##\\1' || chr(1), 'g') AS s
       |  FROM (SELECT unnest(list_filter(string_split($norm, ' '),
       |          t -> len(t) > 0)) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z0-9]+$$')
       |  GROUP BY w),
       |$rounds""".stripMargin
  }

  /** Unigram-LM (X131) replay — seed substring vocab, `iters` hard-EM
    * rounds, final cost table. The Viterbi DP unrolls over word
    * positions 1..maxWordLen (words longer than that never train/apply
    * segmented, BY LAW, so the unroll bound is the law's own, not a
    * data assumption): per position j the winning edge minimizes
    * (total cost, start index) via row_number; unreachable states
    * simply have no row (the engine's Inf sentinel). Emits CTEs ending
    * at `um{iters}` (final model) and `umc(p, cnt, cost)` with
    * `cost = length(bin(Σcnt)) − length(bin(cnt)) + 1` — the exact
    * integer floor-log2 law. `dpCtes` is reused by the encode oracle
    * for the apply-side segmentation. */
  private def unigramDpCtes(tag: String, wordsCte: String, edgesCte: String,
                            maxWordLen: Int): String = {
    val steps = (1 to maxWordLen).map { j =>
      s"""b$tag$j AS MATERIALIZED (
         |  SELECT w, pos, c, back, pc FROM (
         |    SELECT e.w, CAST($j AS BIGINT) AS pos, pv.c + e.cost AS c,
         |           e.i AS back, e.p AS pc,
         |           row_number() OVER (PARTITION BY e.w
         |             ORDER BY pv.c + e.cost, e.i) AS rn
         |    FROM $edgesCte e JOIN a$tag${j - 1} pv
         |      ON pv.w = e.w AND pv.pos = e.i
         |    WHERE e.j = $j)
         |  WHERE rn = 1),
         |a$tag$j AS MATERIALIZED (SELECT * FROM a$tag${j - 1}
         |            UNION ALL SELECT * FROM b$tag$j)""".stripMargin
    }.mkString(",\n")
    val walks = (1 to maxWordLen).map { k =>
      s"""g$tag$k AS MATERIALIZED (
         |  SELECT s.w,
         |         CASE WHEN s.pos > 0 THEN b.back ELSE s.pos END AS pos,
         |         CASE WHEN s.pos > 0 THEN b.pc ||
         |           CASE WHEN s.ps = '' THEN '' ELSE ' ' END || s.ps
         |           ELSE s.ps END AS ps
         |  FROM g$tag${k - 1} s LEFT JOIN a$tag$maxWordLen b
         |    ON b.w = s.w AND b.pos = s.pos)""".stripMargin
    }.mkString(",\n")
    s"""a${tag}0 AS MATERIALIZED (
       |  SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS c,
       |         CAST(-1 AS BIGINT) AS back, '' AS pc FROM $wordsCte),
       |$steps,
       |g${tag}0 AS MATERIALIZED (
       |  SELECT w, CAST(length(w) AS BIGINT) AS pos, '' AS ps
       |  FROM $wordsCte),
       |$walks,
       |seg$tag AS MATERIALIZED (SELECT w, ps FROM g$tag$maxWordLen WHERE pos = 0)"""
      .stripMargin
  }

  private def unigramCostCte(name: String, modelCte: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT p, cnt,
       |         CAST(length(bin(CAST(t.tot AS BIGINT))) -
       |              length(bin(cnt)) + 1 AS BIGINT) AS cost
       |  FROM $modelCte, (SELECT CAST(sum(cnt) AS BIGINT) AS tot
       |                   FROM $modelCte) t)""".stripMargin

  private def unigramCtes(vocabSize: Int, maxPieceLen: Int, iters: Int,
                          maxWordLen: Int): String = {
    val rounds = (1 to iters).map { r =>
      s"""${unigramCostCte(s"uc$r", s"um${r - 1}")},
         |ue$r AS MATERIALIZED (
         |  SELECT s.w, s.i, s.j, c.cost, s.p
         |  FROM usp s JOIN uc$r c USING (p)),
         |${unigramDpCtes(s"r$r", "uw", s"ue$r", maxWordLen)},
         |uu$r AS MATERIALIZED (
         |  SELECT p, CAST(sum(n) AS BIGINT) AS u FROM (
         |    SELECT uw.n, unnest(string_split(f.ps, ' ')) AS p
         |    FROM segr$r f JOIN uw USING (w))
         |  GROUP BY p),
         |um$r AS MATERIALIZED (
         |  SELECT p, u AS cnt FROM uu$r WHERE length(p) >= 2
         |  UNION ALL
         |  SELECT c.p, CAST(coalesce(u.u, 0) + 1 AS BIGINT) AS cnt
         |  FROM (SELECT p FROM um${r - 1} WHERE length(p) = 1) c
         |  LEFT JOIN uu$r u USING (p))""".stripMargin
    }.mkString(",\n")
    s"""uw AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(list_filter(string_split($norm, ' '),
       |          t -> len(t) > 0)) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z0-9]+$$')
       |    AND length(w) <= $maxWordLen
       |  GROUP BY w),
       |usp AS MATERIALIZED (
       |  SELECT w, i, i + l AS j,
       |         substr(w, CAST(i + 1 AS INTEGER), CAST(l AS INTEGER)) AS p
       |  FROM (
       |    SELECT w, i, unnest(range(1,
       |        least($maxPieceLen, length(w) - i) + 1)) AS l FROM (
       |      SELECT w, unnest(range(length(w))) AS i FROM uw))),
       |ucand AS MATERIALIZED (
       |  SELECT p, CAST(sum(n) AS BIGINT) AS cnt
       |  FROM usp JOIN uw USING (w) GROUP BY p),
       |um0 AS MATERIALIZED (
       |  (SELECT p, cnt FROM ucand WHERE length(p) >= 2
       |   ORDER BY cnt DESC, p LIMIT $vocabSize)
       |  UNION ALL
       |  SELECT p, cnt FROM ucand WHERE length(p) = 1),
       |$rounds,
       |${unigramCostCte("umc", s"um$iters")}""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q147_group_sample" ->
      """SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT,
        |                    doc_id) AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 5""".stripMargin,

    // the two slices partition the corpus, so the joint bucketing (cap
    // included) equals the full recompute's and the cross pairs are
    // exactly est restricted to one-side-each; id_a is the train side
    "q148_cross_neardup" ->
      s"""WITH $minhashPortableCtes
         |SELECT CASE WHEN id_a >= 400 THEN id_a ELSE id_b END AS id_a,
         |       CASE WHEN id_a >= 400 THEN id_b ELSE id_a END AS id_b,
         |       est_jaccard
         |FROM est
         |WHERE est_jaccard >= 0.4 AND ((id_a < 400) <> (id_b < 400))""".stripMargin,

    "q149_rank_transform" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, cents,
        |       rank() OVER (PARTITION BY l_returnflag ORDER BY cents)
        |         AS rank,
        |       count(*) OVER (PARTITION BY l_returnflag) AS n_group
        |FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
        |             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |      FROM lineitem WHERE l_partkey < 2000)""".stripMargin,

    "q150_expectations" ->
      """WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |         CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS o0,
        |         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS o1,
        |         CAST(count(*) FILTER (WHERE o_totalprice IS NOT NULL
        |           AND (o_totalprice < 0 OR o_totalprice > 300000)) AS BIGINT) AS o2,
        |         CAST(count(*) FILTER (WHERE o_orderstatus IS NOT NULL
        |           AND o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT) AS o3
        |  FROM orders)
        |SELECT 'custkey_not_null' AS expectation, o0 AS observed, total, o0 = 0 AS passed FROM a
        |UNION ALL SELECT 'orderkey_unique', o1, total, o1 = 0 FROM a
        |UNION ALL SELECT 'price_in_range', o2, total, o2 = 0 FROM a
        |UNION ALL SELECT 'status_known', o3, total, o3 = 0 FROM a
        |UNION ALL SELECT 'row_count', total, total, total BETWEEN 1 AND 10000000 FROM a""".stripMargin,

    // replays the brute chain (q36's) and the IVF chain (q40's, starved
    // to one probe) and joins the two rank<=10 sets — only set
    // membership matters, so the floats never surface
    "q151_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
         |           WHERE vec_id < 5),
         |bscored AS (
         |  SELECT q.query_id, c.vec_id,
         |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                CAST(c.embedding AS DOUBLE[])) AS cos
         |  FROM q CROSS JOIN embeddings c
         |  WHERE c.vec_id <> q.query_id),
         |bsel AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM bscored) WHERE rank <= 10),
         |cent AS (
         |  SELECT vec_id AS cell_id, embedding AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |assigned AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cell_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC,
         |                      c.cell_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, q_emb, cell_id FROM (
         |    SELECT qq.vec_id AS query_id, qq.embedding AS q_emb, c.cell_id,
         |           row_number() OVER (PARTITION BY qq.vec_id
         |             ORDER BY ${cosSql("qq.embedding", "c.centroid")} DESC,
         |                      c.cell_id ASC) AS rn
         |    FROM embeddings qq CROSS JOIN cent c
         |    WHERE qq.vec_id < 5)
         |  WHERE rn <= 1),
         |iscored AS (
         |  SELECT p.query_id, a.vec_id,
         |         ${cosSql("p.q_emb", "a.embedding")} AS cos
         |  FROM probes p JOIN assigned a USING (cell_id)
         |  WHERE a.vec_id <> p.query_id),
         |isel AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM iscored) WHERE rank <= 10),
         |ne AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
         |       FROM bsel GROUP BY 1),
         |na AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_approx
         |       FROM isel GROUP BY 1),
         |h AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS hits
         |      FROM bsel b JOIN isel i
         |        ON b.query_id = i.query_id AND b.vec_id = i.vec_id
         |      GROUP BY 1)
         |SELECT ne.query_id, n_exact,
         |       CAST(coalesce(n_approx, 0) AS BIGINT) AS n_approx,
         |       CAST(coalesce(hits, 0) AS BIGINT) AS hits
         |FROM ne LEFT JOIN na USING (query_id) LEFT JOIN h USING (query_id)""".stripMargin,

    // exact prefix-join pairs (q79's CTE shape at >= 3/5) vs the
    // portable LSH screen (est >= 0.4), counted — pair orientation is
    // a < b on both sides
    "q152_lsh_quality" ->
      s"""WITH $minhashPortableCtes,
         |${exactPairCtes()},
         |ca AS (SELECT id_a AS a, id_b AS b FROM est
         |       WHERE est_jaccard >= 0.4)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ca) AS n_candidates,
         |       (SELECT CAST(count(*) AS BIGINT)
         |        FROM ex JOIN ca ON ex.a = ca.a AND ex.b = ca.b) AS hits""".stripMargin,

    // the q58 drop set aggregated per crawl source with conditional sums
    "q160_dedup_savings" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |drop_ids AS (
         |  SELECT src FROM walk GROUP BY src HAVING min(dst) <> src)
         |SELECT source,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(*) FILTER (WHERE doc_id IN
         |         (SELECT src FROM drop_ids)) AS BIGINT) AS n_dropped,
         |       CAST(sum(n_chars) AS BIGINT) AS weight_total,
         |       CAST(coalesce(sum(n_chars) FILTER (WHERE doc_id IN
         |         (SELECT src FROM drop_ids)), 0) AS BIGINT)
         |         AS weight_dropped
         |FROM documents GROUP BY source""".stripMargin,

    // component sizes off the recursive walk, plus the singleton row
    // (total docs minus clustered docs) at size 1
    "q161_cluster_sizes" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |comp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |         FROM walk GROUP BY 1),
         |sizes AS (SELECT comp_id, count(*) AS cluster_size
         |          FROM comp GROUP BY 1)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |FROM sizes GROUP BY 1
         |UNION ALL
         |SELECT 1 AS cluster_size,
         |       CAST((SELECT count(*) FROM documents)
         |         - coalesce((SELECT sum(cluster_size) FROM sizes), 0)
         |         AS BIGINT) AS n_clusters""".stripMargin,

    // per n: totals from token counts, distincts from the per-doc
    // distinct gram lists — three blocks UNION ALL
    "q162_ngram_diversity" ->
      raw"""WITH tk AS (
         |  SELECT lang, string_split($norm, ' ') AS t FROM documents),
         |g1 AS (SELECT lang, unnest(list_distinct(t)) AS g FROM tk),
         |g2 AS (SELECT lang, unnest(list_distinct(list_transform(
         |  range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS g FROM tk),
         |g3 AS (SELECT lang, unnest(list_distinct(list_transform(
         |  range(1, len(t) - 1),
         |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g FROM tk),
         |t1 AS (SELECT lang, CAST(sum(greatest(0, len(t))) AS BIGINT)
         |         AS total_ngrams FROM tk GROUP BY 1),
         |t2 AS (SELECT lang, CAST(sum(greatest(0, len(t) - 1)) AS BIGINT)
         |         AS total_ngrams FROM tk GROUP BY 1),
         |t3 AS (SELECT lang, CAST(sum(greatest(0, len(t) - 2)) AS BIGINT)
         |         AS total_ngrams FROM tk GROUP BY 1),
         |d1 AS (SELECT lang, count(DISTINCT g) AS distinct_ngrams
         |       FROM g1 GROUP BY 1),
         |d2 AS (SELECT lang, count(DISTINCT g) AS distinct_ngrams
         |       FROM g2 GROUP BY 1),
         |d3 AS (SELECT lang, count(DISTINCT g) AS distinct_ngrams
         |       FROM g3 GROUP BY 1)
         |SELECT t1.lang, 1 AS n, total_ngrams,
         |       coalesce(distinct_ngrams, 0) AS distinct_ngrams
         |FROM t1 LEFT JOIN d1 USING (lang)
         |UNION ALL
         |SELECT t2.lang, 2 AS n, total_ngrams,
         |       coalesce(distinct_ngrams, 0)
         |FROM t2 LEFT JOIN d2 USING (lang)
         |UNION ALL
         |SELECT t3.lang, 3 AS n, total_ngrams,
         |       coalesce(distinct_ngrams, 0)
         |FROM t3 LEFT JOIN d3 USING (lang)""".stripMargin,

    // cluster labels replayed with the q53 recursive walk, split by the
    // md5 bucket of the CLUSTER id (singletons = own id) — the
    // leakage-free split law
    "q156_leak_safe_split" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |comp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |         FROM walk GROUP BY 1),
         |lab AS (
         |  SELECT d.doc_id, coalesce(c.comp_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
         |SELECT doc_id, cluster_id,
         |       CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
         |                    1, 7))::BIGINT % 100 < 80 THEN 'train'
         |            WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
         |                    1, 7))::BIGINT % 100 < 90 THEN 'validation'
         |            ELSE 'test' END AS split
         |FROM lab""".stripMargin,

    // brute-force ALL-pairs Hamming ground truth — the completeness
    // proof for the pigeonhole block LSH (q79's pattern for PPJoin)
    "q164_hamming_pairs" ->
      raw"""WITH h AS (
         |  SELECT doc_id AS media_id,
         |         ('0x' || substr(md5($norm), 1, 15))::BIGINT AS dhash
         |  FROM documents),
         |tw AS (
         |  SELECT -media_id - 1 AS media_id,
         |         xor(dhash, (1::BIGINT << CAST(media_id % 60 AS INT)))
         |           AS dhash
         |  FROM h),
         |allh AS (SELECT * FROM h UNION ALL SELECT * FROM tw)
         |SELECT a.media_id AS id_a, b.media_id AS id_b,
         |       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
         |FROM allh a JOIN allh b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin,

    // the conflict law over a LEGACY per-doc-hash store: incremental
    // components over the new-touching edges, inheritance = arg_min
    // stored split, conflicted = >1 distinct stored split — the store
    // itself is the q55 law at 50/75, no recursive walk needed for it
    "q165_legacy_store_conflicts" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |cut AS (SELECT ((max(doc_id) + 1) * 4) // 5 AS c FROM documents),
         |store AS (
         |  SELECT doc_id,
         |         CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 50 THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 75 THEN 'validation'
         |              ELSE 'test' END AS split
         |  FROM documents CROSS JOIN cut WHERE doc_id < cut.c),
         |iedges AS (
         |  SELECT id_a AS u, id_b AS v FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND (id_a >= c OR id_b >= c)
         |  UNION
         |  SELECT id_b, id_a FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND (id_a >= c OR id_b >= c)),
         |iverts AS (SELECT DISTINCT u AS id FROM iedges),
         |iwalk(src, dst) AS (
         |  SELECT id, id FROM iverts
         |  UNION
         |  SELECT w.src, e.v FROM iwalk w JOIN iedges e ON e.u = w.dst),
         |icomp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |          FROM iwalk GROUP BY 1),
         |inh AS (
         |  SELECT ic.comp_id, arg_min(st.split, st.doc_id) AS inherit,
         |         count(DISTINCT st.split) AS n_store_splits
         |  FROM icomp ic JOIN store st ON st.doc_id = ic.doc_id
         |  GROUP BY 1),
         |b AS (
         |  SELECT d.doc_id, coalesce(ic.comp_id, d.doc_id) AS cluster_id
         |  FROM documents d CROSS JOIN cut
         |  LEFT JOIN icomp ic ON ic.doc_id = d.doc_id
         |  WHERE d.doc_id >= cut.c)
         |SELECT b.doc_id, b.cluster_id,
         |       coalesce(inh.inherit,
         |         CASE WHEN ('0x' || substr(md5(CAST(b.cluster_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 50 THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(b.cluster_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 75 THEN 'validation'
         |              ELSE 'test' END) AS split,
         |       (inh.inherit IS NOT NULL) AS inherited,
         |       CAST(coalesce(inh.n_store_splits, 0) AS BIGINT)
         |         AS n_store_splits,
         |       (coalesce(inh.n_store_splits, 0) > 1) AS conflicted
         |FROM b LEFT JOIN inh ON inh.comp_id = b.cluster_id""".stripMargin,

    // the assignment-stable incremental split law, replayed end to end:
    // store splits = the q156 law over the old slice (old-old edges
    // only), incremental components over the new-touching edge set
    // (q63's), inheritance = arg_min stored split per component, and
    // the conflict law (>1 distinct stored split)
    "q163_incremental_split" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |cut AS (SELECT ((max(doc_id) + 1) * 4) // 5 AS c FROM documents),
         |oedges AS (
         |  SELECT id_a AS u, id_b AS v FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND id_a < c AND id_b < c
         |  UNION
         |  SELECT id_b, id_a FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND id_a < c AND id_b < c),
         |overts AS (SELECT DISTINCT u AS id FROM oedges),
         |owalk(src, dst) AS (
         |  SELECT id, id FROM overts
         |  UNION
         |  SELECT w.src, e.v FROM owalk w JOIN oedges e ON e.u = w.dst),
         |ocomp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |          FROM owalk GROUP BY 1),
         |store AS (
         |  SELECT doc_id,
         |         CASE WHEN ('0x' || substr(md5(CAST(cl AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 80 THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(cl AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 90 THEN 'validation'
         |              ELSE 'test' END AS split
         |  FROM (
         |    SELECT d.doc_id, coalesce(oc.comp_id, d.doc_id) AS cl
         |    FROM documents d CROSS JOIN cut
         |    LEFT JOIN ocomp oc ON oc.doc_id = d.doc_id
         |    WHERE d.doc_id < cut.c)),
         |iedges AS (
         |  SELECT id_a AS u, id_b AS v FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND (id_a >= c OR id_b >= c)
         |  UNION
         |  SELECT id_b, id_a FROM est CROSS JOIN cut
         |  WHERE est_jaccard >= 0.4 AND (id_a >= c OR id_b >= c)),
         |iverts AS (SELECT DISTINCT u AS id FROM iedges),
         |iwalk(src, dst) AS (
         |  SELECT id, id FROM iverts
         |  UNION
         |  SELECT w.src, e.v FROM iwalk w JOIN iedges e ON e.u = w.dst),
         |icomp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |          FROM iwalk GROUP BY 1),
         |inh AS (
         |  SELECT ic.comp_id, arg_min(st.split, st.doc_id) AS inherit,
         |         count(DISTINCT st.split) AS n_store_splits
         |  FROM icomp ic JOIN store st ON st.doc_id = ic.doc_id
         |  GROUP BY 1),
         |b AS (
         |  SELECT d.doc_id, coalesce(ic.comp_id, d.doc_id) AS cluster_id
         |  FROM documents d CROSS JOIN cut
         |  LEFT JOIN icomp ic ON ic.doc_id = d.doc_id
         |  WHERE d.doc_id >= cut.c)
         |SELECT b.doc_id, b.cluster_id,
         |       coalesce(inh.inherit,
         |         CASE WHEN ('0x' || substr(md5(CAST(b.cluster_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 80 THEN 'train'
         |              WHEN ('0x' || substr(md5(CAST(b.cluster_id AS VARCHAR)),
         |                      1, 7))::BIGINT % 100 < 90 THEN 'validation'
         |              ELSE 'test' END) AS split,
         |       (inh.inherit IS NOT NULL) AS inherited,
         |       CAST(coalesce(inh.n_store_splits, 0) AS BIGINT)
         |         AS n_store_splits,
         |       (coalesce(inh.n_store_splits, 0) > 1) AS conflicted
         |FROM b LEFT JOIN inh ON inh.comp_id = b.cluster_id""".stripMargin,

    // per-cluster argmax on (length DESC, doc_id ASC) over the same
    // recursive component labels
    "q157_canonical_docs" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |comp AS (SELECT src AS doc_id, min(dst) AS comp_id
         |         FROM walk GROUP BY 1),
         |m AS (
         |  SELECT c.comp_id, d.doc_id, length(d.text) AS score
         |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
         |r AS (
         |  SELECT comp_id, doc_id, score,
         |         row_number() OVER (PARTITION BY comp_id
         |           ORDER BY score DESC, doc_id ASC) AS rn,
         |         count(*) OVER (PARTITION BY comp_id) AS n_members
         |  FROM m)
         |SELECT comp_id AS cluster_id, doc_id AS canonical_id,
         |       score AS best_score, n_members
         |FROM r WHERE rn = 1""".stripMargin,

    // distinct-5-gram denominator straight off the per-doc gram list,
    // numerator = grams also present anywhere in the eval slice
    "q158_contamination_fraction" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
         |g AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 3),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         |         || ' ' || t[i+4])) AS gs
         |  FROM tk),
         |ev AS (SELECT DISTINCT unnest(gs) AS eg FROM g WHERE doc_id < 10),
         |tr AS (SELECT doc_id, gs FROM g WHERE doc_id >= 10),
         |hit AS (
         |  SELECT doc_id, count(*) AS n_hit
         |  FROM (SELECT doc_id, unnest(gs) AS tg FROM tr) x
         |  WHERE tg IN (SELECT eg FROM ev)
         |  GROUP BY 1)
         |SELECT tr.doc_id AS train_id,
         |       coalesce(len(tr.gs), 0)::BIGINT AS n_grams,
         |       coalesce(hit.n_hit, 0)::BIGINT AS n_hit
         |FROM tr LEFT JOIN hit ON hit.doc_id = tr.doc_id""".stripMargin,

    // per-lang row_number cap then the global ordered cut — the
    // diversity-capped top-k law
    "q159_diversified_topk" ->
      """WITH d AS (
        |  SELECT doc_id, lang, length(text)::BIGINT AS n_chars
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM d)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 2
        |ORDER BY n_chars DESC, doc_id ASC LIMIT 20""".stripMargin,

    // running-max-end window replay of the interval-union aggregation:
    // contribution = max(0, e - max(s, prev_max_end)), islands start
    // where s clears the running max
    "q155_interval_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + 3600000000 AS e
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND epoch_us(ts) + 3600000000 > epoch_us(ts)),
        |m AS (
        |  SELECT user_id, s, e,
        |         max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv)
        |SELECT user_id,
        |       CAST(sum(greatest(0, e - greatest(s, coalesce(pmax, s))))
        |            AS BIGINT) AS covered,
        |       CAST(sum(CASE WHEN pmax IS NULL OR s > pmax
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_islands,
        |       CAST(count(*) AS BIGINT) AS n_intervals
        |FROM m GROUP BY user_id""".stripMargin,

    // three band chains off the ONE sig CTE restricted to the same 25%
    // sample the Spark side uses (bands = 32/rowsPerBand), each
    // screened at est >= 0.4 and scored against the sample's exact
    // pair set — the tuning curve q153 computes
    "q153_banding_sweep" ->
      s"""WITH $minhashSigCtes,
         |ssig AS (SELECT * FROM sig WHERE doc_id % 4 = 0),
         |${bandChainCtes(8, "_b4", "ssig")},
         |${bandChainCtes(4, "_b8", "ssig")},
         |${bandChainCtes(2, "_b16", "ssig")},
         |${exactPairCtes(" AND doc_id % 4 = 0")},
         |ca4 AS (SELECT id_a AS a, id_b AS b FROM est_b4
         |        WHERE est_jaccard >= 0.4),
         |ca8 AS (SELECT id_a AS a, id_b AS b FROM est_b8
         |        WHERE est_jaccard >= 0.4),
         |ca16 AS (SELECT id_a AS a, id_b AS b FROM est_b16
         |         WHERE est_jaccard >= 0.4)
         |SELECT 4 AS bands,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ca4) AS n_candidates,
         |       (SELECT CAST(count(*) AS BIGINT)
         |        FROM ex JOIN ca4 ON ex.a = ca4.a AND ex.b = ca4.b) AS hits
         |UNION ALL
         |SELECT 8 AS bands,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ca8) AS n_candidates,
         |       (SELECT CAST(count(*) AS BIGINT)
         |        FROM ex JOIN ca8 ON ex.a = ca8.a AND ex.b = ca8.b) AS hits
         |UNION ALL
         |SELECT 16 AS bands,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_true,
         |       (SELECT CAST(count(*) AS BIGINT) FROM ca16) AS n_candidates,
         |       (SELECT CAST(count(*) AS BIGINT)
         |        FROM ex JOIN ca16 ON ex.a = ca16.a AND ex.b = ca16.b) AS hits
         |""".stripMargin,

    // candidate pairs at the blessed operating point, labelled by the
    // unordered source pair of their endpoints
    "q154_dup_source_matrix" ->
      s"""WITH $minhashPortableCtes,
         |ca AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.4),
         |lab AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS slice_a,
         |       greatest(a.source, b.source) AS slice_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM ca
         |JOIN lab a ON ca.id_a = a.doc_id
         |JOIN lab b ON ca.id_b = b.doc_id
         |GROUP BY 1, 2""".stripMargin,

    "q01_scan_project" ->
      """SELECT p_partkey, trim(p_name) AS name_trim, p_retailprice
        |FROM part WHERE p_size >= 25""".stripMargin,

    "q02_dynamic_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CAST(l_shipdate AS DATE) AS ship_day
        |FROM lineitem
        |WHERE l_returnflag = 'R'
        |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'""".stripMargin,

    "q03_topk" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
        |       l_quantity
        |FROM lineitem
        |ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC,
        |         l_quantity DESC, l_extendedprice DESC
        |LIMIT 1000""".stripMargin,

    "q04_bp_split" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(l_quantity AS INT) + 40 AS p1,
        |         CAST(l_partkey % 300 AS INT) AS p2
        |  FROM lineitem),
        |v AS (SELECT *, (p1 BETWEEN 50 AND 250 AND p2 BETWEEN 30 AND 200) AS ok
        |      FROM src)
        |SELECT l_orderkey, l_linenumber, 'systolic' AS component,
        |       p1 AS value_num, CAST(NULL AS VARCHAR) AS value_text
        |FROM v WHERE ok
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'diastolic', p2, NULL FROM v WHERE ok
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'raw', NULL,
        |       p1::VARCHAR || '/' || p2::VARCHAR
        |FROM v WHERE NOT ok""".stripMargin,

    "q05_value_routing" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CASE WHEN l_linenumber % 3 = 0 THEN l_returnflag
        |              ELSE CAST(l_quantity AS VARCHAR) END AS value_str
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |       CAST(TRY_CAST(value_str AS DECIMAL(14,4)) AS DOUBLE) AS value_num,
        |       CASE WHEN TRY_CAST(value_str AS DECIMAL(14,4)) IS NULL
        |            THEN value_str END AS value_text
        |FROM src""".stripMargin,

    "q06_agg_multi" ->
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty,
        |       min(l_quantity) AS min_qty,
        |       max(l_quantity) AS max_qty,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |            AS DOUBLE) AS sum_disc_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q07_date_trend" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |         AS avg_value
        |FROM events GROUP BY event_type, CAST(ts AS DATE)""".stripMargin,

    "q08_conditional_rules" ->
      """WITH c AS (
        |  SELECT count(*) FILTER (WHERE l_discount > 0.07) AS a,
        |         count(*) FILTER (WHERE l_quantity >= 48)  AS b,
        |         count(*) FILTER (WHERE l_tax > 0.06)      AS c2
        |  FROM lineitem)
        |SELECT 'high_discount' AS rule_name, 'warn' AS severity,
        |       a AS affected_rows FROM c WHERE a > 0
        |UNION ALL
        |SELECT 'heavy_quantity', 'warn', b FROM c WHERE b > 0
        |UNION ALL
        |SELECT 'high_tax', 'error', c2 FROM c WHERE c2 > 0""".stripMargin,

    "q09_anti_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,

    "q10_dims_merge" ->
      """WITH old AS (SELECT c_custkey AS k, c_mktsegment AS site FROM customer),
        |nw AS (SELECT o_custkey AS k, max(o_orderpriority) AS site
        |       FROM orders GROUP BY o_custkey)
        |SELECT COALESCE(old.k, nw.k) AS k,
        |       COALESCE(nw.site, old.site) AS site
        |FROM old FULL OUTER JOIN nw ON old.k = nw.k""".stripMargin,

    "q11_agg_merge" ->
      """WITH old AS (
        |  SELECT l_partkey, count(*) AS cnt, sum(l_quantity) / count(*) AS avg_qty,
        |         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
        |  GROUP BY l_partkey),
        |nw AS (
        |  SELECT l_partkey, count(*) AS cnt, sum(l_quantity) / count(*) AS avg_qty,
        |         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
        |  GROUP BY l_partkey)
        |SELECT COALESCE(old.l_partkey, nw.l_partkey) AS partkey,
        |       COALESCE(nw.cnt, old.cnt) AS cnt,
        |       COALESCE(nw.avg_qty, old.avg_qty) AS avg_qty,
        |       least(old.min_qty, nw.min_qty) AS min_qty,
        |       greatest(old.max_qty, nw.max_qty) AS max_qty
        |FROM old FULL OUTER JOIN nw ON old.l_partkey = nw.l_partkey""".stripMargin,

    "q12_join_revenue" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |            AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q13_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q14_row_number" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_linenumber, l_quantity,
        |                                     l_extendedprice) AS rn
        |  FROM lineitem)
        |WHERE rn <= 2""".stripMargin,

    "q15_distinct" ->
      "SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",

    "q16_low_value_filter" ->
      """SELECT event_id, event_type, value
        |FROM events WHERE value IS NOT NULL AND value < 10.0""".stripMargin,

    "q17_recent_window" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |GROUP BY event_type""".stripMargin,

    "q18_counts_by" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang",

    "q19_union" ->
      """SELECT c_custkey AS id, 'customer' AS kind FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, 'supplier' AS kind FROM supplier""".stripMargin,

    "q20_scalar_funcs" ->
      """SELECT o_orderkey,
        |       upper(o_orderpriority) AS prio_upper,
        |       substring(o_orderpriority, 1, 1) AS prio_class,
        |       CAST(year(o_orderdate) AS INT) AS order_year,
        |       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END
        |         AS size_class,
        |       least(o_totalprice, 100000.0) AS capped_price,
        |       COALESCE(o_orderstatus, '?') AS status
        |FROM orders""".stripMargin,

    "q21_stream_window" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,

    "q22_sessionize" ->
      """WITH g AS (
        |  SELECT user_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR date_diff('second', lag(ts) OVER w, ts) > 3600
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,

    "q23_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q24_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q25_salted_agg" ->
      """SELECT user_id, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin,

    "q30_dedup_exact" ->
      s"""SELECT md5($norm) AS content_key, min(doc_id) AS keep_id,
         |       count(*) AS n_copies
         |FROM documents GROUP BY md5($norm)""".stripMargin,

    "q26_asof_join" ->
      """SELECT e.event_id, e.user_id,
        |       p.event_id AS purchase_event, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,

    "q27_range_join" ->
      """SELECT e.event_id, e.event_type, e.value, t.tier
        |FROM events e
        |JOIN (VALUES ('bronze', 0.0, 50.0), ('silver', 50.0, 150.0),
        |             ('gold', 150.0, 300.0), ('platinum', 300.0, 1000.0))
        |  AS t(tier, lo, hi)
        |  ON e.value >= t.lo AND e.value < t.hi""".stripMargin,

    "q39_multimodal_features" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        |       octet_length(text::BLOB)::BIGINT AS n_bytes,
        |       substr(sha256(text), 1, 16) AS checksum
        |FROM documents""".stripMargin,

    "q42_token_stats" ->
      raw"""SELECT doc_id,
        |       len(regexp_extract_all(text,
        |         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]')) AS n_subwords,
        |       len(list_distinct(regexp_extract_all(text,
        |         '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r]'))) AS n_unique_subwords
        |FROM documents""".stripMargin,

    "q43_fingerprint" ->
      """SELECT doc_id,
        |       CASE WHEN length(text) = 0 THEN 0 ELSE
        |         list_reduce(
        |           list_transform(range(1, length(text) + 1),
        |             i -> unicode(substr(text, i, 1))::BIGINT),
        |           (a, b) -> (a * 31 + b) % 1000000007)
        |       END AS fp
        |FROM documents""".stripMargin,

    "q44_minhash_portable" ->
      s"""WITH $minhashPortableCtes
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.4""".stripMargin,

    "q66_topk_per_group" ->
      """SELECT doc_id, lang, n_chars, rank FROM (
        |  SELECT doc_id, lang, length(text) AS n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY length(text) DESC, doc_id ASC) AS rank
        |  FROM documents)
        |WHERE rank <= 3""".stripMargin,

    "q65_token_budget_mix" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, lang,
         |         len(list_filter(string_split($norm, ' '), t -> len(t) > 0))
         |           AS n_tok
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, n_tok,
         |         sum(n_tok) OVER (PARTITION BY lang
         |           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT,
         |                    doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM tk)
         |SELECT doc_id, lang, n_tok FROM r
         |WHERE cum <= CASE lang WHEN 'en' THEN 3000 WHEN 'de' THEN 1500
         |                       WHEN 'zh' THEN 2000 ELSE 500 END""".stripMargin,

    "q64_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        |      < (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |              WHEN 'zh' THEN 1.0 ELSE 0.1 END) * 268435456.0""".stripMargin,

    "q63_incremental_dedup" ->
      s"""WITH $minhashPortableCtes,
         |cut AS (SELECT ((max(doc_id) + 1) * 4) // 5 AS c FROM documents)
         |SELECT id_a, id_b, est_jaccard FROM est, cut
         |WHERE est_jaccard >= 0.4 AND (id_a >= c OR id_b >= c)""".stripMargin,

    "q59_lsh_verified" ->
      s"""WITH $minhashPortableCtes,
         |shl AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sl
         |  FROM tk)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT e.id_a, e.id_b,
         |         len(list_intersect(a.sl, b.sl))::DOUBLE
         |           / len(list_distinct(list_concat(a.sl, b.sl))) AS jaccard
         |  FROM est e
         |  JOIN shl a ON a.doc_id = e.id_a
         |  JOIN shl b ON b.doc_id = e.id_b
         |  WHERE e.est_jaccard >= 0.4)
         |WHERE jaccard >= 0.5""".stripMargin,

    "q53_dup_clusters" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst)
         |SELECT src AS doc_id, min(dst) AS comp_id
         |FROM walk GROUP BY 1""".stripMargin,

    

    "q45_simhash_portable" ->
      s"""WITH $simhashPortableCtes
         |SELECT id_a, id_b, hamming FROM pairs
         |WHERE hamming <= 3""".stripMargin,

    "q60_simhash_verified" ->
      s"""WITH $simhashPortableCtes,
         |shl AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i+1])) AS sl
         |  FROM tk)
         |SELECT id_a, id_b, jaccard FROM (
         |  SELECT p.id_a, p.id_b,
         |         len(list_intersect(a.sl, b.sl))::DOUBLE
         |           / len(list_distinct(list_concat(a.sl, b.sl))) AS jaccard
         |  FROM pairs p
         |  JOIN shl a ON a.doc_id = p.id_a
         |  JOIN shl b ON b.doc_id = p.id_b
         |  WHERE p.hamming <= 3)
         |WHERE jaccard >= 0.5""".stripMargin,

    "q61_curation_flags" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, text, string_split($norm, ' ') AS raw,
         |         list_filter(string_split($norm, ' '), t -> len(t) > 0) AS toks
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         len(toks) AS n_words,
         |         CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE list_sum(list_transform(toks, t -> len(t)))::DOUBLE
         |                   / len(toks) END AS mean_word_len,
         |         CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE len(list_distinct(toks))::DOUBLE / len(toks)
         |              END AS frac_unique_words,
         |         CASE WHEN len(raw) <= 1 THEN 0.0
         |              ELSE 1.0 - len(list_distinct(list_transform(
         |                     range(1, len(raw)),
         |                     i -> raw[i] || ' ' || raw[i+1])))::DOUBLE
         |                   / (len(raw) - 1) END AS frac_dup_bigrams,
         |         CASE WHEN len(toks) = 0 THEN 0.0
         |              ELSE len(list_filter(toks,
         |                     t -> regexp_matches(t, '[a-z]')))::DOUBLE / len(toks)
         |              END AS frac_alpha_words,
         |         len(list_filter(toks, t -> list_contains(
         |           ['the','a','of','and','to','in','is','that','for','with'], t)))
         |           AS stop_hits
         |  FROM tk)
         |SELECT *,
         |       CASE WHEN n_words >= 30 AND n_words <= 100000
         |                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |                 AND frac_alpha_words >= 0.8 AND stop_hits >= 2
         |                 AND frac_dup_bigrams <= 0.3
         |            THEN 1 ELSE 0 END AS keep
         |FROM m""".stripMargin,

    "q62_pii_redact" -> {
      val pats = graft.llm.TextAnalysis.PiiPatterns
      val planted = "substr(text, 1, 40) || ' contact user' || " +
        "CAST(doc_id AS VARCHAR) || '@example.com or 555-867-' || " +
        "lpad(CAST(doc_id AS VARCHAR), 4, '0') || ' ip 10.0.' || " +
        "CAST(doc_id % 256 AS VARCHAR) || '.7 acct 90000000' || " +
        "lpad(CAST(doc_id AS VARCHAR), 3, '0')"
      val ctes = new StringBuilder(
        s"WITH r0 AS (SELECT doc_id, $planted AS t0 FROM documents)")
      pats.zipWithIndex.foreach { case ((pat, rep), i) =>
        val nm = rep.stripPrefix("<").stripSuffix(">").toLowerCase
        ctes.append(s""",
           |r${i + 1} AS (SELECT *,
           |  len(regexp_extract_all(t$i, '$pat', 0)) AS n_$nm,
           |  regexp_replace(t$i, '$pat', '$rep', 'g') AS t${i + 1} FROM r$i)""".stripMargin)
      }
      val names = pats.map(p =>
        "n_" + p._2.stripPrefix("<").stripSuffix(">").toLowerCase).mkString(", ")
      s"$ctes\nSELECT doc_id, t${pats.length} AS redacted, $names FROM r${pats.length}"
    },

    "q46_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |         ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM lineitem),
        |r AS (SELECT flag, hv,
        |        row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn
        |      FROM h),
        |a AS (SELECT flag, count(*) AS nd,
        |        max(CASE WHEN rn = 64 THEN hv END) AS kth
        |      FROM r GROUP BY 1),
        |ex AS (SELECT l_returnflag AS flag,
        |         count(DISTINCT l_partkey) AS exact_distinct
        |       FROM lineitem GROUP BY 1)
        |SELECT a.flag AS l_returnflag, ex.exact_distinct,
        |       CASE WHEN a.nd < 64 THEN a.nd::DOUBLE
        |            ELSE 63.0 / (a.kth::DOUBLE / 1152921504606846976.0)
        |       END AS kmv_est
        |FROM a JOIN ex ON ex.flag = a.flag""".stripMargin,

    "q47_quantiles" ->
      """SELECT l_returnflag, l_linestatus,
        |       quantile_cont(l_quantity, 0.25) AS q25,
        |       quantile_cont(l_quantity, 0.5)  AS q50,
        |       quantile_cont(l_quantity, 0.9)  AS q90,
        |       count(*) AS cnt
        |FROM lineitem
        |GROUP BY 1, 2""".stripMargin,

    "q48_frame_sample" ->
      """SELECT doc_id::BIGINT AS media_id,
        |       unnest(list_filter(range(0, 12), i -> i % 3 = 0)) AS frame_idx,
        |       octet_length(encode(text)) / 30 AS approx_frame_bytes
        |FROM documents""".stripMargin,

    "q49_set_ops" ->
      """WITH ordered AS (SELECT DISTINCT o_custkey AS custkey FROM orders),
        |allc AS (SELECT DISTINCT c_custkey AS custkey FROM customer)
        |SELECT custkey, 'both' AS side
        |FROM (SELECT custkey FROM ordered INTERSECT SELECT custkey FROM allc)
        |UNION ALL
        |SELECT custkey, 'never_ordered' AS side
        |FROM (SELECT custkey FROM allc EXCEPT SELECT custkey FROM ordered)""".stripMargin,

    "q50_analytic_windows" ->
      """SELECT event_id, user_id,
        |       lag(event_id, 1) OVER w AS prev_event,
        |       lead(event_id, 1) OVER w AS next_event,
        |       row_number() OVER w AS seq,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
        |         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) AS cum_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin,

    "q51_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click')    AS click,
        |       count(*) FILTER (event_type = 'error')    AS error,
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup')   AS signup,
        |       count(*) FILTER (event_type = 'view')     AS view
        |FROM events GROUP BY 1""".stripMargin,

    "q52_exists_subquery" ->
      """SELECT o_orderkey, o_custkey
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity >= 49)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l
        |                  WHERE l.l_orderkey = o.o_orderkey
        |                    AND l.l_returnflag = 'R')""".stripMargin,

    "q54_term_stats" ->
      raw"""SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
         |FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS term
         |      FROM documents)
         |WHERE length(term) > 0
         |GROUP BY term
         |ORDER BY df DESC, tf DESC, term ASC
         |LIMIT 100""".stripMargin,

    "q55_split_assign" ->
      """SELECT doc_id,
        |       CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'validation'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(doc_id::VARCHAR), 1, 7))::BIGINT % 100 AS b
        |      FROM documents)""".stripMargin,

    "q56_decontamination" ->
      raw"""WITH g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         |         || ' ' || t[i+4]))) AS g
         |  FROM (SELECT doc_id, string_split($norm, ' ') AS t FROM documents))
         |SELECT DISTINCT tr.doc_id AS train_id, ev.doc_id AS eval_id
         |FROM g tr JOIN g ev ON tr.g = ev.g
         |WHERE tr.doc_id >= 10 AND ev.doc_id < 10""".stripMargin,

    "q57_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q58_dedup_corpus" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |drop_ids AS (
         |  SELECT src FROM walk GROUP BY src HAVING min(dst) <> src)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT src FROM drop_ids)""".stripMargin,

    "q67_compacted_corpus" ->
      s"""WITH RECURSIVE $minhashPortableCtes,
         |edges AS (
         |  SELECT id_a AS u, id_b AS v FROM est WHERE est_jaccard >= 0.4
         |  UNION
         |  SELECT id_b, id_a FROM est WHERE est_jaccard >= 0.4),
         |verts AS (SELECT DISTINCT u AS id FROM edges),
         |walk(src, dst) AS (
         |  SELECT id, id FROM verts
         |  UNION
         |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
         |drop_ids AS (
         |  SELECT src FROM walk GROUP BY src HAVING min(dst) <> src)
         |SELECT doc_id, lang, length(text) AS n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT src FROM drop_ids)""".stripMargin,

    "q68_inverted_index" ->
      raw"""WITH t AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_filter(string_split($norm, ' '),
         |           t -> len(t) > 0))) AS term
         |  FROM documents)
         |SELECT term, count(*) AS df,
         |       array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',')
         |         AS postings
         |FROM t GROUP BY term HAVING count(*) >= 5""".stripMargin,

    "q69_tfidf_terms" ->
      raw"""WITH tok AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split($norm, ' '),
         |           t -> len(t) > 0)) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |       GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |             CAST(tf.tf * 1000000 // df.df AS BIGINT) AS score
         |      FROM tf JOIN df USING (term))
         |SELECT doc_id, term, tf, df, score, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, term ASC) AS rank FROM s)
         |WHERE rank <= 3""".stripMargin,

    "q70_source_report" ->
      raw"""SELECT source, count(*) AS n_docs,
         |       CAST(SUM(len(list_filter(string_split($norm, ' '),
         |         t -> len(t) > 0))) AS BIGINT) AS n_tokens,
         |       count(DISTINCT lang) AS n_langs,
         |       max(n_chars) AS max_chars,
         |       CAST(SUM(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_long_docs
         |FROM documents GROUP BY source""".stripMargin,

    "q71_label_neighbors" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |           WHERE vec_id = 0),
        |scored AS (
        |  SELECT c.label, c.vec_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT label, vec_id, cos,
        |         row_number() OVER (PARTITION BY label
        |                            ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored)
        |SELECT label, rank, vec_id, round(cos, 6) AS cosine
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "q72_weighted_sample" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, lang,
         |         len(list_filter(string_split($norm, ' '),
         |           t -> len(t) > 0)) AS n_tok
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, n_tok,
         |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
         |              AS DOUBLE) / n_tok AS prio
         |  FROM tk WHERE n_tok > 0)
         |SELECT doc_id, lang, n_tok, prio FROM p
         |ORDER BY prio, doc_id LIMIT 100""".stripMargin,

    "q33_ngram_jaccard" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(tk) - 1),
         |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
         |  FROM (SELECT doc_id, string_split($norm, ' ') AS tk FROM documents)),
         |pairs AS (SELECT doc_id AS id_a, doc_id + 1 AS id_b FROM documents)
         |SELECT p.id_a, p.id_b,
         |       len(list_intersect(a.s, b.s))::DOUBLE /
         |         len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |FROM pairs p
         |JOIN sh a ON a.doc_id = p.id_a
         |JOIN sh b ON b.doc_id = p.id_b""".stripMargin,

    "q34_text_profile" -> {
      val toks = raw"string_split_regex(text, '\s+')"
      val stopToks = raw"string_split_regex(lower(text), '\s+')"
      val stopList = graft.llm.TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    length(text) AS n_chars,
         |    CASE WHEN length(text) = 0 THEN 0 ELSE len($toks) END AS n_tokens,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
         |        / length(text) END AS punct_r,
         |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
         |        / length(text) END AS alpha_r,
         |    CASE WHEN len($stopToks) = 0 THEN 0.0 ELSE
         |      len(list_filter($stopToks, t -> t IN ($stopList)))::DOUBLE
         |        / len($stopToks) END AS stop_r
         |  FROM documents)
         |SELECT doc_id, n_chars, n_tokens,
         |       punct_r AS punct_ratio,
         |       alpha_r AS alpha_ratio,
         |       stop_r AS stopword_ratio,
         |       least(n_chars / 500.0, 1.0) * 0.4
         |         + (1.0 - least(punct_r * 4.0, 1.0)) * 0.3
         |         + least(stop_r * 5.0, 1.0) * 0.3 AS quality
         |FROM base""".stripMargin
    },

    "q35_lang_id" -> {
      def filt(words: Seq[String]) =
        raw"len(list_filter(string_split_regex(lower(text), '\s+'), t -> t IN (" +
          words.map(w => s"'$w'").mkString(", ") + ")))"
      val sc = graft.llm.TextAnalysis.Markers.toSeq.sortBy(_._1)
        .map { case (l, ws) => s"${filt(ws)} AS sc_$l" }.mkString(",\n    ")
      s"""WITH s AS (
         |  SELECT doc_id,
         |    $sc
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN greatest(sc_de, sc_en, sc_es, sc_fr, sc_zh) = 0 THEN 'und'
         |       WHEN sc_zh >= greatest(sc_de, sc_en, sc_es, sc_fr) THEN 'zh'
         |       WHEN sc_fr >= greatest(sc_de, sc_en, sc_es) THEN 'fr'
         |       WHEN sc_es >= greatest(sc_de, sc_en) THEN 'es'
         |       WHEN sc_en >= sc_de THEN 'en'
         |       ELSE 'de' END AS lang_pred,
         |  sc_de, sc_en, sc_es, sc_fr, sc_zh
         |FROM s""".stripMargin
    },

    "q37_ann_lsh" ->
      s"""WITH ${bucketCte(6)},
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id,
         |         ${cosSql("q.embedding", "c.embedding")} AS cos
         |  FROM embeddings q
         |  JOIN buck qb ON qb.vec_id = q.vec_id
         |  JOIN buck cb ON cb.bucket = qb.bucket
         |  JOIN embeddings c ON c.vec_id = cb.vec_id
         |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q41_embedding_neardup" ->
      s"""WITH ${bucketCte(6)},
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         ${cosSql("ea.embedding", "eb.embedding")} AS cos
         |  FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN embeddings eb ON eb.vec_id = b.vec_id)
         |SELECT id_a, id_b, round(cos, 6) AS cosine
         |FROM pairs WHERE cos >= 0.25""".stripMargin,

    "q40_ann_ivf" ->
      s"""WITH cent AS (
         |  SELECT vec_id AS cell_id, embedding AS centroid
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |assigned AS (
         |  SELECT vec_id, embedding, cell_id FROM (
         |    SELECT e.vec_id, e.embedding, c.cell_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC,
         |                      c.cell_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN cent c)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, q_emb, cell_id FROM (
         |    SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cell_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosSql("q.embedding", "c.centroid")} DESC,
         |                      c.cell_id ASC) AS rn
         |    FROM embeddings q CROSS JOIN cent c
         |    WHERE q.vec_id < 5)
         |  WHERE rn <= 4),
         |scored AS (
         |  SELECT p.query_id, a.vec_id,
         |         ${cosSql("p.q_emb", "a.embedding")} AS cos
         |  FROM probes p JOIN assigned a USING (cell_id)
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, vec_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q73_kmeans" ->
      s"""WITH ${kmeansCtes(8, 2)}
         |SELECT vec_id, CAST(cluster AS INT) AS cluster,
         |       round(cos, 6) AS cosine
         |FROM a2""".stripMargin,

    "q175_embedding_outliers" ->
      s"""WITH ${kmeansCtes(8, 2)},
         |c AS (
         |  SELECT vec_id, CAST(cluster AS INT) AS cluster,
         |         CAST(floor(cos * 1e9 + 0.5) AS BIGINT) AS ci
         |  FROM a2),
         |m AS (
         |  SELECT cluster, count(*) AS n, sum(CAST(ci AS HUGEINT)) AS s,
         |         sum(CAST(ci AS HUGEINT) * ci) AS q
         |  FROM c GROUP BY cluster)
         |SELECT c.vec_id, c.cluster, c.ci,
         |       (m.n * c.ci < m.s AND
         |        (m.s - m.n * c.ci) * (m.s - m.n * c.ci) >
         |          4 * (m.n * m.q - m.s * m.s)) AS is_outlier
         |FROM c JOIN m USING (cluster)""".stripMargin,

    // X119 Naive-Bayes seed classifier: class counts over the even-id
    // seed (lang='en' positive), exact HUGEINT mean of the scaled
    // smoothed likelihood ratios over each odd doc's token occurrences
    "q176_naive_bayes" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, lang, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |tok AS (SELECT lang = 'en' AS pos, unnest(t) AS w
         |        FROM tk WHERE doc_id % 2 = 0),
         |cnt AS (SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
         |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
         |        FROM tok GROUP BY w),
         |tot AS (SELECT coalesce(sum(cp), 0) AS tp,
         |               coalesce(sum(cn), 0) AS tn, count(*) AS v
         |        FROM cnt),
         |occ AS (SELECT doc_id, w, count(*) AS m FROM (
         |          SELECT doc_id, unnest(t) AS w
         |          FROM tk WHERE doc_id % 2 = 1)
         |        GROUP BY doc_id, w),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(cnt.cp, 0) + 1)
         |           * (tot.tn + tot.v)
         |           // (CAST(coalesce(cnt.cn, 0) + 1 AS HUGEINT)
         |              * (tot.tp + tot.v)) AS r
         |  FROM occ LEFT JOIN cnt ON occ.w = cnt.w CROSS JOIN tot)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
         |       CAST(sum(m * r) // sum(m) AS BIGINT) AS nb_score,
         |       CAST(sum(m * r) // sum(m) AS BIGINT)
         |         >= 1000000000 AS keep
         |FROM p GROUP BY doc_id""".stripMargin,

    // X123 classifier calibration: q176's NB scoring chain, ascending
    // rank cuts at 10..90 (order statistic at ceil(p*n/100)), bucket =
    // count of cuts reached, exact per-bucket + cumulative-from-top
    // precision
    "q180_calibration" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, lang, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |tok AS (SELECT lang = 'en' AS pos, unnest(t) AS w
         |        FROM tk WHERE doc_id % 2 = 0),
         |cnt AS (SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
         |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS cn
         |        FROM tok GROUP BY w),
         |tot AS (SELECT coalesce(sum(cp), 0) AS tp,
         |               coalesce(sum(cn), 0) AS tn, count(*) AS v
         |        FROM cnt),
         |occ AS (SELECT doc_id, w, count(*) AS m FROM (
         |          SELECT doc_id, unnest(t) AS w
         |          FROM tk WHERE doc_id % 2 = 1)
         |        GROUP BY doc_id, w),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(cnt.cp, 0) + 1)
         |           * (tot.tn + tot.v)
         |           // (CAST(coalesce(cnt.cn, 0) + 1 AS HUGEINT)
         |              * (tot.tp + tot.v)) AS r
         |  FROM occ LEFT JOIN cnt ON occ.w = cnt.w CROSS JOIN tot),
         |sc AS (SELECT doc_id,
         |              CAST(sum(m * r) // sum(m) AS BIGINT) AS nb_score
         |       FROM p GROUP BY doc_id),
         |rk AS (SELECT nb_score,
         |              row_number() OVER (ORDER BY nb_score) AS rn,
         |              count(*) OVER () AS n
         |       FROM sc),
         |cut AS (
         |  SELECT pp.p, min(rk.nb_score) AS c
         |  FROM rk CROSS JOIN (SELECT unnest([10, 20, 30, 40, 50, 60,
         |                                     70, 80, 90]) AS p) pp
         |  WHERE rk.rn >= (pp.p * rk.n + 99) // 100
         |  GROUP BY pp.p),
         |bkt AS (
         |  SELECT sc.doc_id,
         |         sum(CASE WHEN sc.nb_score >= cut.c THEN 1 ELSE 0 END)
         |           AS bucket
         |  FROM sc CROSS JOIN cut GROUP BY sc.doc_id),
         |lab AS (SELECT b.doc_id, b.bucket, d.lang = 'en' AS pos
         |        FROM bkt b JOIN documents d USING (doc_id)),
         |agg AS (SELECT bucket, count(*) AS n_docs,
         |               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos
         |        FROM lab GROUP BY bucket)
         |SELECT CAST(bucket AS INT) AS bucket,
         |       n_docs, CAST(n_pos AS BIGINT) AS n_pos,
         |       CAST((1000000000 * n_pos) // n_docs AS BIGINT)
         |         AS prec_scaled,
         |       CAST(sum(n_docs) OVER (ORDER BY bucket DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_docs,
         |       CAST(sum(n_pos) OVER (ORDER BY bucket DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_pos,
         |       CAST((1000000000 * sum(n_pos) OVER (ORDER BY bucket DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |         // sum(n_docs) OVER (ORDER BY bucket DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS cum_prec_scaled
         |FROM agg""".stripMargin,

    // X122 corpus novelty: the shared portable minhash chain split by
    // parity, the band probe (store-side degenerate-bucket guard), the
    // exact per-pair agreement count, and the (matches desc, sid asc)
    // deterministic pick; batch docs with no probe hit are novel
    "q179_novelty" ->
      s"""WITH $minhashSigCtes,
         |ssig AS (SELECT * FROM sig WHERE doc_id % 2 = 0),
         |nsig AS (SELECT * FROM sig WHERE doc_id % 2 = 1),
         |sband AS (
         |  SELECT doc_id, i // 4 AS band,
         |         string_agg(m::VARCHAR, ',' ORDER BY i) AS bucket
         |  FROM ssig GROUP BY 1, 2),
         |okb AS (SELECT band, bucket FROM sband GROUP BY 1, 2
         |        HAVING count(*) <= ${graft.llm.Dedup.MaxBucketMembers}),
         |nband AS (
         |  SELECT doc_id, i // 4 AS band,
         |         string_agg(m::VARCHAR, ',' ORDER BY i) AS bucket
         |  FROM nsig GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT n.doc_id AS nid, s.doc_id AS sid
         |  FROM nband n
         |  JOIN sband s ON n.band = s.band AND n.bucket = s.bucket
         |  JOIN okb k ON k.band = s.band AND k.bucket = s.bucket),
         |m AS (
         |  SELECT c.nid, c.sid,
         |         count(*) FILTER (WHERE sa.m = sb.m) AS mm
         |  FROM cand c
         |  JOIN nsig sa ON sa.doc_id = c.nid
         |  JOIN ssig sb ON sb.doc_id = c.sid AND sb.i = sa.i
         |  GROUP BY 1, 2),
         |cnt AS (SELECT nid, count(*) AS n_candidates FROM m GROUP BY nid),
         |pick AS (
         |  SELECT nid, sid, mm FROM (
         |    SELECT nid, sid, mm, row_number() OVER (PARTITION BY nid
         |      ORDER BY mm DESC, sid) AS rn FROM m) WHERE rn = 1),
         |nd AS (SELECT DISTINCT doc_id FROM nsig)
         |SELECT nd.doc_id,
         |       coalesce(cnt.n_candidates, 0) AS n_candidates,
         |       pick.sid AS nearest_id,
         |       CAST(coalesce(pick.mm, 0) AS INT) AS sig_matches,
         |       CAST((CAST(1000000000 AS BIGINT) * coalesce(pick.mm, 0))
         |         // 32 AS BIGINT) AS est_ji,
         |       coalesce(pick.mm, 0) * 5 < 2 * 32 AS is_novel
         |FROM nd LEFT JOIN cnt ON cnt.nid = nd.doc_id
         |LEFT JOIN pick ON pick.nid = nd.doc_id""".stripMargin,

    // X120 keep-first span dedup: q83's md5 gram law, per-gram
    // (doc_id, pos) argmin = the kept first occurrence, islands over
    // the NON-FIRST occurrences only, anti-covered token reassembly
    "q177_keep_first_spans" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split(coalesce($norm, ''), ' '),
         |                     t -> length(t) > 0) AS t
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |  FROM tk WHERE len(t) >= 8),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(t[i : i + 7], ' ')) AS h
         |  FROM p),
         |f AS (
         |  SELECT h, fd, fp FROM (
         |    SELECT h, doc_id AS fd, pos AS fp,
         |           row_number() OVER (PARTITION BY h
         |             ORDER BY doc_id, pos) AS rn,
         |           count(*) OVER (PARTITION BY h) AS c
         |    FROM g) WHERE rn = 1 AND c >= 2),
         |seeds AS (
         |  SELECT g.doc_id, g.pos FROM g JOIN f USING (h)
         |  WHERE NOT (g.doc_id = f.fd AND g.pos = f.fp)),
         |lagged AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                                        ORDER BY pos) > 8
         |              THEN 1 ELSE 0 END AS brk
         |  FROM seeds),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM lagged),
         |spans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
         |  FROM isl GROUP BY doc_id, grp),
         |covered AS (
         |  SELECT doc_id, unnest(range(s, e + 1)) AS j FROM spans),
         |tok AS (
         |  SELECT doc_id, i - 1 AS j, t[i] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
         |        FROM tk)),
         |kept AS (
         |  SELECT tok.doc_id, tok.j, tok.w
         |  FROM tok LEFT JOIN covered c
         |    ON tok.doc_id = c.doc_id AND tok.j = c.j
         |  WHERE c.j IS NULL),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(w, ' ' ORDER BY j) AS deduped
         |  FROM kept GROUP BY doc_id)
         |SELECT tk.doc_id, len(tk.t) AS n_tokens,
         |       CAST(coalesce(agg.n_kept, 0) AS INT) AS n_kept,
         |       coalesce(agg.deduped, '') AS deduped
         |FROM tk LEFT JOIN agg USING (doc_id)""".stripMargin,

    // X121 JL distortion audit: the exact RpBits weight literals, a
    // left-fold projection per (vector, plane), and both cosine
    // quantizations — original space via the shared 64-dim fold,
    // projected space via an 8-dim fold over the projection lists
    "q178_jl_distortion" -> {
      val dotP = (a: String, b: String) =>
        s"list_reduce(list_transform(range(1, 9), i -> " +
          s"$a[i] * $b[i]), (x, y) -> x + y)"
      val cosP = (a: String, b: String) =>
        s"(${dotP(a, b)} / (sqrt(${dotP(a, a)}) * sqrt(${dotP(b, b)})))"
      s"""WITH w AS (
         |  SELECT * FROM (VALUES
         |         ${planesValues(8, 64)}) AS t(plane, wts)),
         |pr AS (
         |  SELECT e.vec_id, w.plane,
         |         list_reduce(list_transform(range(1, 65),
         |           i -> e.embedding[i]::DOUBLE * w.wts[i]),
         |           (x, y) -> x + y) AS proj
         |  FROM embeddings e CROSS JOIN w WHERE e.vec_id < 24),
         |pv AS (SELECT vec_id, list(proj ORDER BY plane) AS p
         |       FROM pr GROUP BY vec_id),
         |base AS (SELECT e.vec_id, e.embedding, pv.p
         |         FROM embeddings e JOIN pv USING (vec_id))
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       CAST(floor((${cosSql("a.embedding", "b.embedding")})
         |         * 1e9 + 0.5) AS BIGINT) AS cos_orig,
         |       CAST(floor((${cosP("a.p", "b.p")})
         |         * 1e9 + 0.5) AS BIGINT) AS cos_proj,
         |       abs(CAST(floor((${cosSql("a.embedding", "b.embedding")})
         |             * 1e9 + 0.5) AS BIGINT)
         |         - CAST(floor((${cosP("a.p", "b.p")})
         |             * 1e9 + 0.5) AS BIGINT)) AS err
         |FROM base a JOIN base b ON a.vec_id < b.vec_id""".stripMargin
    },

    "q172_cluster_cap" ->
      s"""WITH ${kmeansCtes(8, 2)},
         |r AS (
         |  SELECT vec_id, CAST(cluster AS INT) AS cluster,
         |         row_number() OVER (PARTITION BY cluster
         |           ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
         |                     1, 7))::BIGINT, vec_id) AS rn
         |  FROM a2)
         |SELECT vec_id, cluster,
         |       CASE WHEN rn <= 20 THEN CAST(rn AS INT) END AS sample_rank,
         |       rn <= 20 AS keep
         |FROM r""".stripMargin,

    "q74_semdedup" ->
      s"""WITH ${kmeansCtes(8, 2)},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM a2 a JOIN a2 b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.22)
         |SELECT vec_id, CAST(cluster AS INT) AS cluster
         |FROM a2 WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "q81_incremental_semdedup" ->
      s"""WITH ${kmeansCtes(8, 2, trainPred = "vec_id < 400")},
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM a2 a JOIN a2 b
         |    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |  WHERE b.vec_id >= 400
         |    AND ${cosSql("a.embedding", "b.embedding")} >= 0.22)
         |SELECT vec_id, CAST(cluster AS INT) AS cluster
         |FROM a2
         |WHERE vec_id >= 400
         |  AND vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin,

    "q75_quantized_ann" ->
      s"""WITH mx AS (
         |  SELECT vec_id, embedding,
         |         CAST(list_max(list_transform(embedding, x -> abs(x)))
         |              AS DOUBLE) AS mx
         |  FROM embeddings),
         |qv AS (
         |  SELECT vec_id, embedding,
         |         CASE WHEN mx = 0
         |              THEN list_transform(range(1, 65), i -> 0)
         |              ELSE list_transform(range(1, 65), i ->
         |                CAST(floor(embedding[i]::DOUBLE * (127.0 / mx) + 0.5)
         |                     AS INT)) END AS q
         |  FROM mx),
         |qn AS (
         |  SELECT vec_id, embedding, q,
         |         list_reduce(list_transform(range(1, 65),
         |           i -> CAST(q[i] AS BIGINT) * CAST(q[i] AS BIGINT)),
         |           (x, y) -> x + y) AS n2
         |  FROM qv),
         |scored AS (
         |  SELECT que.vec_id AS query_id, c.vec_id,
         |         CAST(list_reduce(list_transform(range(1, 65),
         |                i -> CAST(que.q[i] AS BIGINT) * CAST(c.q[i] AS BIGINT)),
         |                (x, y) -> x + y) AS DOUBLE)
         |           / (sqrt(CAST(que.n2 AS DOUBLE)) * sqrt(CAST(c.n2 AS DOUBLE)))
         |           AS approx,
         |         ${cosSql("que.embedding", "c.embedding")} AS exact
         |  FROM qn que CROSS JOIN qn c
         |  WHERE que.vec_id < 5 AND c.vec_id <> que.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, approx, exact,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY approx DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, vec_id, round(approx, 6) AS approx_cos,
         |       round(exact, 6) AS exact_cos
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q76_percentile_trim" ->
      """WITH hist AS (
        |  SELECT lang, n_chars AS v, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v,
        |         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM hist),
        |cuts AS (
        |  SELECT lang,
        |         min(CASE WHEN cum >= (5 * n + 99) // 100 THEN v END) AS lo,
        |         min(CASE WHEN cum >= (95 * n + 99) // 100 THEN v END) AS hi
        |  FROM cum GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN cuts c
        |  ON d.lang IS NOT DISTINCT FROM c.lang
        | AND d.n_chars BETWEEN c.lo AND c.hi""".stripMargin,

    "q77_chunk" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split($norm, ' '), t -> length(t) > 0) AS t
         |  FROM documents),
         |ch AS (
         |  SELECT doc_id, t,
         |         unnest(range(0, greatest(1, (len(t) - 10 + 29) // 30))) AS chunk_id
         |  FROM tk WHERE len(t) > 0)
         |SELECT doc_id, chunk_id,
         |       len(t[chunk_id*30+1 : chunk_id*30+40]) AS n_tokens,
         |       array_to_string(t[chunk_id*30+1 : chunk_id*30+40], ' ') AS chunk
         |FROM ch""".stripMargin,

    "q78_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         len(list_filter(string_split($norm, ' '),
         |                         t -> length(t) > 0)) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tok,
         |         coalesce(sum(n_tok) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS start
         |  FROM t)
         |SELECT doc_id, n_tok, CAST(start // 512 AS BIGINT) AS bin,
         |       CAST(start % 512 AS BIGINT) AS bin_pos
         |FROM c""".stripMargin,

    // the shared exact-pair CTEs (same definition q152/q153 score
    // against), exposing the jaccard value from ex's inter/uni
    "q79_jaccard_join" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
         |${exactPairCtes()}
         |SELECT a AS id_a, b AS id_b,
         |       CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) AS jaccard
         |FROM ex""".stripMargin,

    "q80_label_centroids" ->
      """SELECT label, r.i - 1 AS pos,
        |       (CAST(sum(CAST(floor(embedding[r.i]::DOUBLE * 1000000000.0
        |                            + 0.5) AS BIGINT)) AS DOUBLE)
        |        / 1000000000.0) / CAST(count(*) AS DOUBLE) AS m
        |FROM embeddings, range(1, 65) r(i)
        |GROUP BY label, r.i""".stripMargin,

    "q82_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT unnest(list_filter(string_split($norm, ' '),
         |                x -> length(x) > 0)) AS item
         |  FROM documents),
         |n AS (SELECT count(*) AS n FROM t)
         |SELECT item, count(*) AS cnt
         |FROM t, n
         |GROUP BY item, n.n
         |HAVING count(*) * 40 > n.n""".stripMargin,

    "q83_dup_spans" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split(coalesce($norm, ''), ' '),
         |                     t -> length(t) > 0) AS t
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |  FROM tk WHERE len(t) >= 8),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(t[i : i + 7], ' ')) AS h
         |  FROM p),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         |seeds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
         |lagged AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                                        ORDER BY pos) > 8
         |              THEN 1 ELSE 0 END AS brk
         |  FROM seeds),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM lagged)
         |SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
         |       max(pos) + 8 - min(pos) AS span_tokens
         |FROM isl GROUP BY doc_id, grp""".stripMargin,

    "q84_span_scrub" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split(coalesce($norm, ''), ' '),
         |                     t -> length(t) > 0) AS t
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |  FROM tk WHERE len(t) >= 8),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(t[i : i + 7], ' ')) AS h
         |  FROM p),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         |seeds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
         |lagged AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                                        ORDER BY pos) > 8
         |              THEN 1 ELSE 0 END AS brk
         |  FROM seeds),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM lagged),
         |spans AS (
         |  SELECT doc_id, max(pos) + 8 - min(pos) AS st
         |  FROM isl GROUP BY doc_id, grp),
         |per AS (SELECT doc_id, CAST(sum(st) AS BIGINT) AS dup_tokens
         |        FROM spans GROUP BY doc_id)
         |SELECT b.doc_id, len(b.t) AS n_tokens,
         |       coalesce(per.dup_tokens, 0) AS dup_tokens,
         |       CASE WHEN len(b.t) = 0 THEN 0.0
         |            ELSE CAST(coalesce(per.dup_tokens, 0) AS DOUBLE) / len(b.t)
         |       END AS dup_frac,
         |       CASE WHEN (CASE WHEN len(b.t) = 0 THEN 0.0
         |                       ELSE CAST(coalesce(per.dup_tokens, 0) AS DOUBLE)
         |                            / len(b.t) END) <= 0.3
         |            THEN 1 ELSE 0 END AS keep
         |FROM tk b LEFT JOIN per USING (doc_id)""".stripMargin,

    "q85_centroid_classify" ->
      s"""WITH tok AS (
         |  SELECT doc_id, source,
         |         unnest(list_filter(string_split($norm, ' '),
         |                x -> length(x) > 0)) AS term
         |  FROM documents),
         |ctf AS (SELECT source AS lab, term, count(*) AS tf
         |        FROM tok GROUP BY 1, 2),
         |ctot AS (SELECT lab, sum(tf) AS tot FROM ctf GROUP BY 1),
         |w AS (SELECT lab, term, tf * 1000000000 // tot AS wt
         |      FROM ctf JOIN ctot USING (lab)),
         |dtf AS (SELECT doc_id, term, count(*) AS dtf
         |        FROM tok GROUP BY 1, 2),
         |sc AS (SELECT d.doc_id, w.lab, CAST(sum(d.dtf * w.wt) AS BIGINT) AS score
         |       FROM dtf d JOIN w USING (term) GROUP BY 1, 2),
         |r AS (SELECT doc_id, lab, score,
         |             row_number() OVER (PARTITION BY doc_id
         |               ORDER BY score DESC, lab ASC) AS rn
         |      FROM sc)
         |SELECT r.doc_id, d.source, r.lab AS pred, r.score
         |FROM r JOIN documents d USING (doc_id) WHERE rn = 1""".stripMargin,

    "q86_shard_assign" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
        |           AS hb
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id, CAST(hb % 8 AS INT) AS shard,
        |       row_number() OVER (PARTITION BY hb % 8
        |                          ORDER BY hb, doc_id) - 1 AS pos
        |FROM h""".stripMargin,

    "q87_repetition" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split(coalesce($norm, ''), ' '),
         |                     t -> length(t) > 0) AS t
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, t, n, unnest(range(1, len(t) - n + 2)) AS i
         |  FROM tk, (VALUES (2), (3), (4)) AS v(n)
         |  WHERE len(t) >= n),
         |g AS (
         |  SELECT doc_id, n, array_to_string(t[i : i + n - 1], ' ') AS gr
         |  FROM p),
         |c AS (SELECT doc_id, n, gr, count(*) AS c FROM g GROUP BY 1, 2, 3),
         |top AS (SELECT doc_id, n, max(c) AS mc FROM c GROUP BY 1, 2),
         |fr AS (
         |  SELECT tk.doc_id, len(tk.t) AS n_tokens,
         |         coalesce(max(CASE WHEN n = 2
         |           THEN CAST(mc * 2 AS DOUBLE) / len(tk.t) END), 0.0)
         |           AS top2_frac,
         |         coalesce(max(CASE WHEN n = 3
         |           THEN CAST(mc * 3 AS DOUBLE) / len(tk.t) END), 0.0)
         |           AS top3_frac,
         |         coalesce(max(CASE WHEN n = 4
         |           THEN CAST(mc * 4 AS DOUBLE) / len(tk.t) END), 0.0)
         |           AS top4_frac
         |  FROM tk LEFT JOIN top ON tk.doc_id = top.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_id, n_tokens, top2_frac, top3_frac, top4_frac,
         |       CASE WHEN top2_frac <= 0.20 AND top3_frac <= 0.18
         |                 AND top4_frac <= 0.16
         |            THEN 1 ELSE 0 END AS keep
         |FROM fr""".stripMargin,

    "q88_decontaminate_bloom" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
         |gr AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 3),
         |    i -> array_to_string(t[i : i + 4], ' ')))) AS g
         |  FROM toks)
         |SELECT DISTINCT tr.doc_id AS train_id, ev.doc_id AS eval_id
         |FROM gr tr JOIN gr ev ON tr.g = ev.g
         |WHERE tr.doc_id >= 10 AND ev.doc_id < 10""".stripMargin,

    "q89_scrub_spans" ->
      s"""WITH tk AS (
         |  SELECT doc_id,
         |         list_filter(string_split(coalesce($norm, ''), ' '),
         |                     t -> length(t) > 0) AS t
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |  FROM tk WHERE len(t) >= 8),
         |g AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(t[i : i + 7], ' ')) AS h
         |  FROM p),
         |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
         |seeds AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
         |lagged AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
         |                                        ORDER BY pos) > 8
         |              THEN 1 ELSE 0 END AS brk
         |  FROM seeds),
         |isl AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM lagged),
         |spans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
         |  FROM isl GROUP BY doc_id, grp),
         |tok2 AS (
         |  SELECT doc_id, i, t[i] AS w
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM tk)),
         |removed AS (
         |  SELECT DISTINCT t2.doc_id, t2.i
         |  FROM tok2 t2 JOIN spans s ON t2.doc_id = s.doc_id
         |   AND t2.i - 1 BETWEEN s.s AND s.e),
         |kept AS (
         |  SELECT t2.doc_id, t2.i, t2.w
         |  FROM tok2 t2 LEFT JOIN removed r
         |    ON t2.doc_id = r.doc_id AND t2.i = r.i
         |  WHERE r.i IS NULL),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |         string_agg(w, ' ' ORDER BY i) AS scrubbed
         |  FROM kept GROUP BY doc_id)
         |SELECT tk.doc_id, len(tk.t) AS n_tokens,
         |       coalesce(a.n_kept, 0) AS n_kept,
         |       coalesce(a.scrubbed, '') AS scrubbed
         |FROM tk LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q90_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |           WHERE lang IS NOT NULL GROUP BY 1),
        |w AS (SELECT lang, n,
        |             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
        |               AS w
        |      FROM c),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
        |r AS (SELECT lang,
        |             least(1.0, CAST(200 AS DOUBLE) * w / tw / n) AS rate
        |      FROM w, tot)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7))::BIGINT
        |      < rate * 268435456.0""".stripMargin,

    "q91_series_motifs" ->
      """WITH rows AS (
        |  SELECT user_id AS k,
        |         CAST(floor(epoch_ms(ts) / 21600000.0) AS BIGINT) AS b,
        |         CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |agg AS (SELECT k, b, CAST(sum(v) AS BIGINT) // count(*) AS m
        |        FROM rows GROUP BY 1, 2),
        |mm AS (SELECT min(m) AS lo, max(m) AS hi FROM agg),
        |sym AS (SELECT k, b, CAST((m - lo) * 4 // (hi - lo + 1) AS VARCHAR) AS s
        |        FROM agg, mm),
        |seqs AS (SELECT k, list(s ORDER BY b) AS arr FROM sym GROUP BY k),
        |grams AS (
        |  SELECT DISTINCT k, md5(array_to_string(arr[i : i + 5], ' ')) AS h
        |  FROM (SELECT k, arr, unnest(range(1, len(arr) - 4)) AS i
        |        FROM seqs WHERE len(arr) >= 6)),
        |bym AS (SELECT h, count(*) AS nk FROM grams GROUP BY h),
        |ok AS (SELECT h FROM bym WHERE nk BETWEEN 2 AND 64),
        |pairs AS (
        |  SELECT a.k AS key_a, b.k AS key_b, count(*) AS shared_motifs
        |  FROM grams a JOIN grams b ON a.h = b.h AND a.k < b.k
        |  JOIN ok ON ok.h = a.h
        |  GROUP BY 1, 2)
        |SELECT * FROM pairs WHERE shared_motifs >= 3""".stripMargin,

    "q92_series_outliers" ->
      """WITH rows AS (
        |  SELECT user_id AS k,
        |         CAST(floor(epoch_ms(ts) / 21600000.0) AS BIGINT) AS b,
        |         CAST(floor(value * 1000) AS BIGINT) AS v
        |  FROM events),
        |agg AS (SELECT k, b, CAST(sum(v) AS BIGINT) // count(*) AS m
        |        FROM rows GROUP BY 1, 2),
        |st AS (SELECT k, count(*) AS n, CAST(sum(m) AS BIGINT) AS s,
        |              CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS q
        |       FROM agg GROUP BY 1)
        |SELECT agg.k, agg.b, agg.m
        |FROM agg JOIN st ON agg.k = st.k
        |WHERE CAST(st.n * agg.m - st.s AS HUGEINT)
        |        * CAST(st.n * agg.m - st.s AS HUGEINT)
        |      > 4 * (CAST(st.n AS HUGEINT) * st.q
        |             - CAST(st.s AS HUGEINT) * CAST(st.s AS HUGEINT))""".stripMargin,

    "q93_bm25" ->
      s"""WITH $bm25Ctes
         |SELECT query_id, doc_id, score, rank FROM bmranked
         |WHERE rank <= 10""".stripMargin,

    "q99_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
         |bm AS (SELECT query_id, doc_id, rank FROM bmranked
         |       WHERE rank <= 10),
         |prior0 AS (SELECT doc_id, row_number() OVER (
         |             ORDER BY n_chars DESC, doc_id ASC) AS rank
         |           FROM documents),
         |prior AS (SELECT qq.query_id, p.doc_id, p.rank
         |          FROM (SELECT DISTINCT query_id FROM q) qq
         |          CROSS JOIN (SELECT * FROM prior0 WHERE rank <= 10) p),
         |parts AS (
         |  SELECT query_id, doc_id, 1000000000 // (60 + rank) AS part
         |  FROM bm
         |  UNION ALL
         |  SELECT query_id, doc_id, 1000000000 // (60 + rank) FROM prior),
         |f AS (SELECT query_id, doc_id, CAST(sum(part) AS BIGINT)
         |        AS rrf_score FROM parts GROUP BY 1, 2)
         |SELECT query_id, doc_id, rrf_score, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM f)
         |WHERE rank <= 10""".stripMargin,

    "q94_bigram_lm" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
         |       WHERE doc_id % 2 = 0 GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
         |v AS (SELECT count(DISTINCT w) AS v FROM (
         |        SELECT unnest(t) AS w FROM tk WHERE doc_id % 2 = 0)),
         |occ AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi
         |        WHERE doc_id % 2 = 1 GROUP BY doc_id, w1, w2),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(c2.c2, 0) + 1)
         |           // (coalesce(c1.c1, 0) + v.v) AS p_scaled
         |  FROM occ
         |  LEFT JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
         |  LEFT JOIN c1 ON occ.w1 = c1.w1
         |  CROSS JOIN v)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |       CAST(sum(m * p_scaled) // sum(m) AS BIGINT) AS lm_score,
         |       CAST(sum(m * p_scaled) // sum(m) AS BIGINT)
         |         >= ${TestdataQueries.BigramLmMinScore} AS keep
         |FROM p GROUP BY doc_id""".stripMargin,

    // Deterministic portable HLL, register leg: the 60-bit md5 hash,
    // bucket = low 8 bits, rank = 53 - bitlength of the top 52 bits —
    // every register replayed exactly (bin/ltrim = leading-zero count)
    "q195_hll_registers" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE text IS NOT NULL),
        |r0 AS (SELECT source, (hv % 256)::INT AS bucket, hv // 256 AS v
        |       FROM h)
        |SELECT source, bucket,
        |       max(53 - (CASE WHEN v = 0 THEN 0
        |                 ELSE length(ltrim(bin(v), '0')) END))::INT AS r
        |FROM r0 GROUP BY 1, 2""".stripMargin,

    // HLL merge + estimate leg: per-source registers, the '<all>'
    // groupBy-max merge, the 2^53-grid harmonic sum, and the
    // exact-rational-alpha integer estimate — digit-for-digit
    "q196_hll_union" ->
      """WITH h AS (
        |  SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        |  FROM documents WHERE text IS NOT NULL),
        |regs AS (
        |  SELECT source, (hv % 256)::INT AS bucket,
        |         max(53 - (CASE WHEN hv // 256 = 0 THEN 0
        |                   ELSE length(ltrim(bin(hv // 256), '0')) END)) AS r
        |  FROM h GROUP BY 1, 2),
        |ar AS (SELECT source, bucket, r FROM regs
        |       UNION ALL
        |       SELECT '<all>' AS source, bucket, max(r) AS r
        |       FROM regs GROUP BY 2),
        |est AS (SELECT source, count(*) AS nb,
        |               sum((1::BIGINT << (53 - r))::HUGEINT) AS sp
        |        FROM ar GROUP BY 1),
        |s AS (SELECT source, nb,
        |             sp + (256 - nb)::HUGEINT
        |               * (1::BIGINT << 53)::HUGEINT AS ss
        |      FROM est)
        |SELECT source, nb::BIGINT AS n_buckets, (256 - nb)::BIGINT AS v_zero,
        |       ss::BIGINT AS sum_scaled,
        |       ((7213000::HUGEINT * 256 * 65536 * (1::BIGINT << 53)::HUGEINT)
        |        // ((10000::HUGEINT * (1000 * 256 + 1079)) * ss))::BIGINT
        |         AS hll_est
        |FROM s""".stripMargin,

    // Kneser-Ney: q94's even/odd split with the continuation-count
    // smoothing law — four count tables, the cleared-denominator
    // discount kernel (D = 3/4), unseen-context continuation backoff
    "q194_kneser_ney" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
         |       WHERE doc_id % 2 = 0 GROUP BY w1, w2),
         |ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS rdiv
         |        FROM c2 GROUP BY w1),
         |cont AS (SELECT w2, count(*) AS ldiv FROM c2 GROUP BY w2),
         |nbi AS (SELECT count(*) AS nbi FROM c2),
         |occ AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi
         |        WHERE doc_id % 2 = 1 GROUP BY doc_id, w1, w2),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |         CASE
         |           WHEN nbi.nbi = 0 THEN NULL
         |           WHEN ctx.c1 IS NULL THEN
         |             CAST(1000000000 AS HUGEINT)
         |               * coalesce(cont.ldiv, 0) // nbi.nbi
         |           ELSE
         |             (greatest(4 * coalesce(c2.c2, 0) - 3, 0)
         |                * CAST(nbi.nbi AS HUGEINT)
         |              + 3 * ctx.rdiv
         |                * CAST(coalesce(cont.ldiv, 0) AS HUGEINT))
         |               * 1000000000
         |               // (4 * ctx.c1 * CAST(nbi.nbi AS HUGEINT))
         |         END AS p_e9
         |  FROM occ
         |  LEFT JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
         |  LEFT JOIN ctx ON occ.w1 = ctx.w1
         |  LEFT JOIN cont ON occ.w2 = cont.w2
         |  CROSS JOIN nbi)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
         |       CAST(sum(m * p_e9) // sum(m) AS BIGINT) AS kn_score,
         |       CAST(sum(m * p_e9) // sum(m) AS BIGINT)
         |         >= ${TestdataQueries.KneserNeyMinScore} AS keep
         |FROM p GROUP BY doc_id""".stripMargin,

    // q94's LM replay (even-train / odd-score) + q144's rank-cut law
    // per language: head >= hi cut, middle >= lo cut, else tail
    "q167_ccnet_buckets" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |bi AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
         |       WHERE doc_id % 2 = 0 GROUP BY w1, w2),
         |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
         |v AS (SELECT count(DISTINCT w) AS v FROM (
         |        SELECT unnest(t) AS w FROM tk WHERE doc_id % 2 = 0)),
         |occ AS (SELECT doc_id, w1, w2, count(*) AS m FROM bi
         |        WHERE doc_id % 2 = 1 GROUP BY doc_id, w1, w2),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(c2.c2, 0) + 1)
         |           // (coalesce(c1.c1, 0) + v.v) AS p_scaled
         |  FROM occ
         |  LEFT JOIN c2 ON occ.w1 = c2.w1 AND occ.w2 = c2.w2
         |  LEFT JOIN c1 ON occ.w1 = c1.w1
         |  CROSS JOIN v),
         |sc AS (
         |  SELECT p.doc_id, d.lang,
         |         CAST(sum(m * p_scaled) // sum(m) AS BIGINT) AS lm_score
         |  FROM p JOIN documents d ON d.doc_id = p.doc_id
         |  GROUP BY p.doc_id, d.lang),
         |r AS (SELECT lang, lm_score,
         |        row_number() OVER (PARTITION BY lang ORDER BY lm_score)
         |          AS rn,
         |        count(*) OVER (PARTITION BY lang) AS n
         |      FROM sc),
         |cuts AS (
         |  SELECT lang,
         |         max(CASE WHEN rn = (34 * n + 99) // 100
         |               THEN lm_score END) AS lo,
         |         max(CASE WHEN rn = (67 * n + 99) // 100
         |               THEN lm_score END) AS hi
         |  FROM r GROUP BY lang)
         |SELECT sc.doc_id, sc.lang, sc.lm_score,
         |       CASE WHEN sc.lm_score >= cuts.hi THEN 'head'
         |            WHEN sc.lm_score >= cuts.lo THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM sc JOIN cuts ON sc.lang = cuts.lang""".stripMargin,

    "q168_dsir" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |uni AS (SELECT doc_id, unnest(t) AS f FROM tk),
         |bi AS (
         |  SELECT doc_id, t[i] || ' ' || t[i+1] AS f
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tk)),
         |fe AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(f), 1, 7))::BIGINT % 64 AS b
         |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
         |ct AS (SELECT b, count(*) AS c FROM fe
         |       WHERE doc_id % 2 = 0 GROUP BY b),
         |cr AS (SELECT b, count(*) AS c FROM fe
         |       WHERE doc_id % 2 = 1 GROUP BY b),
         |nt AS (SELECT coalesce(sum(c), 0) AS n FROM ct),
         |nr AS (SELECT coalesce(sum(c), 0) AS n FROM cr),
         |occ AS (SELECT doc_id, b, count(*) AS m FROM fe
         |        WHERE doc_id % 2 = 1 GROUP BY doc_id, b),
         |r AS (
         |  SELECT occ.doc_id, occ.m,
         |         CAST(1000000000 AS HUGEINT) * (coalesce(ct.c, 0) + 1)
         |           * (nr.n + 64)
         |           // (CAST(cr.c + 1 AS HUGEINT) * (nt.n + 64)) AS r
         |  FROM occ
         |  JOIN cr ON occ.b = cr.b
         |  LEFT JOIN ct ON occ.b = ct.b
         |  CROSS JOIN nt CROSS JOIN nr),
         |w AS (
         |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_feats,
         |         CAST(sum(CAST(m AS HUGEINT) * r) // sum(m) AS BIGINT)
         |           AS dsir_weight
         |  FROM r GROUP BY doc_id),
         |c AS (
         |  SELECT max(CASE WHEN rn = (70 * n + 99) // 100
         |           THEN dsir_weight END) AS cut
         |  FROM (SELECT dsir_weight,
         |          row_number() OVER (ORDER BY dsir_weight) AS rn,
         |          count(*) OVER () AS n
         |        FROM w))
         |SELECT doc_id, n_feats, dsir_weight,
         |       dsir_weight >= c.cut AS keep
         |FROM w CROSS JOIN c""".stripMargin,

    "q174_vocab_growth" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t,
         |    CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
         |      ::BIGINT * 10) // 268435456 AS INT) + 1 AS slice
         |  FROM documents),
         |ds AS (SELECT slice, CAST(count(*) AS BIGINT) AS n_docs,
         |              CAST(sum(len(t)) AS BIGINT) AS n_tokens
         |       FROM tk GROUP BY slice),
         |fs AS (SELECT w, min(slice) AS slice FROM (
         |         SELECT slice, unnest(t) AS w FROM tk) GROUP BY w),
         |nt AS (SELECT slice, CAST(count(*) AS BIGINT) AS new_terms
         |       FROM fs GROUP BY slice)
         |SELECT ds.slice, ds.n_docs, ds.n_tokens,
         |       coalesce(nt.new_terms, 0) AS new_terms,
         |       CAST(sum(coalesce(nt.new_terms, 0))
         |            OVER (ORDER BY ds.slice) AS BIGINT) AS cum_terms
         |FROM ds LEFT JOIN nt ON ds.slice = nt.slice""".stripMargin,

    "q173_winnow" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, len(t) - 2 AS g, i - 1 AS pos,
         |         ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' '
         |            || t[i+2]), 1, 7))::BIGINT AS fp
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
         |        FROM tk WHERE len(t) >= 3)),
         |m AS (
         |  SELECT doc_id, pos, fp,
         |         unnest(range(greatest(pos - least(4, g) + 1, 0),
         |                      least(pos, g - least(4, g)) + 1)) AS s
         |  FROM g),
         |sel AS (
         |  SELECT doc_id, pos, fp,
         |         row_number() OVER (PARTITION BY doc_id, s
         |                            ORDER BY fp, pos DESC) AS rn
         |  FROM m)
         |SELECT DISTINCT doc_id, pos, fp FROM sel WHERE rn = 1"""
        .stripMargin,

    // X130 Moore-Lewis: q94's LM replay TWICE (in-domain = even 'en'
    // docs, general = even non-'en'), doc-keyed join, integer delta,
    // keep at threshold 0
    // audio decode leg: the oracle computes the print CLOSED-FORM from
    // doc_id — the synthesized walk's step directions ARE the code
    // [f, ~f, f, ~f] (f = low 16 bits), so decode+envelope+delta-sign
    // must reproduce it bit-exactly; stubs (97-residue 13) print null
    "q189_audio_prints" ->
      """SELECT doc_id AS media_id,
        |       CASE WHEN doc_id % 97 = 13 THEN NULL ELSE
        |         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
        |              THEN u - 18446744073709551616::HUGEINT
        |              ELSE u END AS BIGINT)
        |       END AS afp
        |FROM (
        |  SELECT doc_id, CAST(hi AS HUGEINT) * 4294967296 + hi AS u
        |  FROM (
        |    SELECT doc_id,
        |           CAST(doc_id % 65536 AS BIGINT) * 65536
        |             + (65535 - doc_id % 65536) AS hi
        |    FROM documents WHERE doc_id < 600))""".stripMargin,

    // UniMax waterfill: smallest-first recursive walk — integer
    // uniform shares, remainder roll-forward, per-stratum epoch cap,
    // surplus redistribution, 1e9 fixed-point epochs
    "q188_unimax_mix" ->
      """WITH RECURSIVE cnts AS (
        |  SELECT lang AS stratum, CAST(sum(n_chars) AS BIGINT) AS n
        |  FROM documents WHERE lang IS NOT NULL
        |  GROUP BY 1 HAVING sum(n_chars) > 0),
        |ord AS (
        |  SELECT stratum, n,
        |         CAST(row_number() OVER (ORDER BY n, stratum) AS BIGINT)
        |           AS rn,
        |         CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM cnts),
        |alloc AS (
        |  SELECT rn, stratum, n, m,
        |         least(n * 2, CAST(250000 AS BIGINT) // m) AS a,
        |         CAST(250000 AS BIGINT)
        |           - least(n * 2, CAST(250000 AS BIGINT) // m) AS r
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.rn, o.stratum, o.n, o.m,
        |         least(o.n * 2, p.r // (o.m - p.rn)) AS a,
        |         p.r - least(o.n * 2, p.r // (o.m - p.rn)) AS r
        |  FROM alloc p JOIN ord o ON o.rn = p.rn + 1)
        |SELECT stratum, n AS n_tokens, a AS alloc_tokens,
        |       CAST(CAST(1000000000 AS HUGEINT) * a // n AS BIGINT)
        |         AS epochs_scaled,
        |       a = n * 2 AS capped
        |FROM alloc""".stripMargin,

    // unigram-LM TRAIN: the full hard-EM replay — seed counts, two
    // rounds of cost/DP/uses/prune, final cost attach
    "q186_unigram_train" ->
      s"""WITH ${unigramCtes(16, 4, 2, 12)}
         |SELECT p AS piece, cnt AS n_uses, cost FROM umc""".stripMargin,

    // unigram-LM APPLY: re-learn the model with q186's replay, Viterbi-
    // segment every distinct corpus word under the final costs (same DP
    // unroll), fall back to whole-word for non-alphabet / overlong /
    // unreachable words, and reassemble per doc (the q166 pattern)
    "q187_unigram_encode" ->
      s"""WITH ${unigramCtes(16, 4, 2, 12)},
         |utk AS MATERIALIZED (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |uaw AS MATERIALIZED (SELECT DISTINCT unnest(t) AS w FROM utk),
         |uel AS MATERIALIZED (
         |  SELECT w FROM uaw
         |  WHERE regexp_matches(w, '^[a-z0-9]+$$') AND length(w) <= 12),
         |uesp AS MATERIALIZED (
         |  SELECT w, i, i + l AS j,
         |         substr(w, CAST(i + 1 AS INTEGER), CAST(l AS INTEGER)) AS p
         |  FROM (
         |    SELECT w, i, unnest(range(1, least(4, length(w) - i) + 1)) AS l
         |    FROM (SELECT w, unnest(range(length(w))) AS i FROM uel))),
         |uee AS MATERIALIZED (
         |  SELECT s.w, s.i, s.j, c.cost, s.p
         |  FROM uesp s JOIN umc c USING (p)),
         |${unigramDpCtes("e", "uel", "uee", 12)},
         |uwp AS MATERIALIZED (
         |  SELECT a.w, coalesce(g.ps, a.w) AS ps
         |  FROM uaw a LEFT JOIN sege g ON g.w = a.w),
         |utok AS MATERIALIZED (
         |  SELECT doc_id, unnest(t) AS w,
         |         unnest(range(len(t))) AS pos FROM utk),
         |uenc AS MATERIALIZED (
         |  SELECT utok.doc_id, utok.pos, coalesce(uwp.ps, utok.w) AS ps
         |  FROM utok LEFT JOIN uwp ON utok.w = uwp.w),
         |uagg AS MATERIALIZED (
         |  SELECT doc_id,
         |         CAST(sum(len(string_split(ps, ' '))) AS BIGINT)
         |           AS n_pieces,
         |         string_agg(ps, ' ' ORDER BY pos) AS pieces
         |  FROM uenc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(uagg.n_pieces, 0) AS n_pieces,
         |       coalesce(uagg.pieces, '') AS pieces
         |FROM documents d LEFT JOIN uagg ON d.doc_id = uagg.doc_id"""
        .stripMargin,

    "q185_moore_lewis" ->
      raw"""WITH $mooreLewisCtes
         |SELECT sa.doc_id, sa.n_bigrams, sa.lm_in, sb.lm_gen,
         |       CAST(sa.lm_in - sb.lm_gen AS BIGINT) AS ml_delta,
         |       sa.lm_in - sb.lm_gen >= 0 AS keep
         |FROM sa JOIN sb ON sa.doc_id = sb.doc_id""".stripMargin,

    // X133 DoReMi: per-source clipped excess over the same two-LM
    // chain, one exponentiated-gradient step on the base-2 grid
    "q190_doremi" ->
      raw"""WITH $mooreLewisCtes,
         |ml AS (
         |  SELECT sa.doc_id,
         |         CAST(sa.lm_in - sb.lm_gen AS BIGINT) AS ml_delta
         |  FROM sa JOIN sb ON sa.doc_id = sb.doc_id),
         |dm AS (
         |  SELECT d.source AS domain, count(*) AS n_docs,
         |         sum(CAST(greatest(ml_delta, 0) AS HUGEINT)) AS se
         |  FROM ml JOIN documents d USING (doc_id)
         |  WHERE d.source IS NOT NULL GROUP BY 1),
         |ex AS (SELECT domain, n_docs,
         |              CAST(se // n_docs AS BIGINT) AS excess_avg FROM dm),
         |shs AS (SELECT domain, n_docs, excess_avg,
         |               least(excess_avg // 60000, 12) AS shift FROM ex),
         |wv AS (SELECT domain, n_docs, excess_avg, shift,
         |              CAST(n_docs AS HUGEINT)
         |                * (CAST(1 AS BIGINT) << shift) AS w FROM shs),
         |tt AS (SELECT sum(w) AS tot, count(*) AS nd FROM wv)
         |SELECT domain, n_docs, excess_avg, CAST(shift AS BIGINT) AS shift,
         |       CAST((w * 1000000000) // tot AS BIGINT) AS weight_ppb,
         |       CAST(900000000 * ((w * 1000000000) // tot) // 1000000000
         |            + 100000000 // nd AS BIGINT) AS smoothed_ppb
         |FROM wv CROSS JOIN tt""".stripMargin,


    // X129 epoch expansion: floor(w) + md5-60-bit bernoulli on frac(w),
    // visible clamp at 2, zero-copy docs dropped, copies 1-based
    "q184_epoch_expand" ->
      raw"""WITH w AS (
         |  SELECT doc_id,
         |         (CAST(n_chars AS BIGINT) * 1000000000) // 200 AS ws
         |  FROM documents),
         |c AS (
         |  SELECT doc_id,
         |         ws // 1000000000
         |           + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |                        1, 15))::BIGINT % 1000000000
         |                       < ws % 1000000000
         |                  THEN 1 ELSE 0 END AS c0
         |  FROM w)
         |SELECT doc_id, CAST(copy AS BIGINT) AS copy,
         |       CAST(least(c0, 2) AS BIGINT) AS n_copies,
         |       c0 > 2 AS clamped
         |FROM (SELECT doc_id, c0, unnest(range(1, least(c0, 2) + 1)) AS copy
         |      FROM c WHERE c0 >= 1)""".stripMargin,

    // X127 Stupid Backoff: three count tables off the even half, the
    // one-division-per-branch backoff chain (1e9/4e8/1.6e8 exact
    // multipliers), integer mean per odd doc
    "q183_stupid_backoff" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |g3 AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
         |        FROM tk WHERE len(t) >= 3)),
         |g2 AS (
         |  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
         |        FROM tk WHERE len(t) >= 2)),
         |g1 AS (SELECT doc_id, unnest(t) AS w1 FROM tk),
         |c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM g3
         |       WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
         |c2 AS (SELECT w1, w2, count(*) AS c2 FROM g2
         |       WHERE doc_id % 2 = 0 GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM g1
         |       WHERE doc_id % 2 = 0 GROUP BY 1),
         |n AS (SELECT coalesce(sum(c1), 0) AS nn FROM c1),
         |occ AS (SELECT doc_id, w1, w2, w3, count(*) AS m FROM g3
         |        WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3, 4),
         |p AS (
         |  SELECT occ.doc_id, occ.m,
         |    CASE WHEN c3.c3 IS NOT NULL THEN
         |           (CAST(1000000000 AS HUGEINT) * c3.c3) // ca.c2
         |         WHEN cb.c2 IS NOT NULL THEN
         |           (CAST(400000000 AS HUGEINT) * cb.c2) // c1b.c1
         |         WHEN c1c.c1 IS NOT NULL THEN
         |           (CAST(160000000 AS HUGEINT) * c1c.c1) // n.nn
         |         ELSE 0 END AS s
         |  FROM occ
         |  LEFT JOIN c3 ON occ.w1 = c3.w1 AND occ.w2 = c3.w2
         |    AND occ.w3 = c3.w3
         |  LEFT JOIN c2 ca ON occ.w1 = ca.w1 AND occ.w2 = ca.w2
         |  LEFT JOIN c2 cb ON occ.w2 = cb.w1 AND occ.w3 = cb.w2
         |  LEFT JOIN c1 c1b ON occ.w2 = c1b.w1
         |  LEFT JOIN c1 c1c ON occ.w3 = c1c.w1
         |  CROSS JOIN n)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_trigrams,
         |       CAST(sum(m * s) // sum(m) AS BIGINT) AS sb_score,
         |       CAST(sum(m * s) // sum(m) AS BIGINT)
         |         >= ${TestdataQueries.StupidBackoffMinScore} AS keep
         |FROM p GROUP BY doc_id""".stripMargin,

    // X125 tokenizer budget sweep: the shared BPE chain's w0/w1/w3/w5
    // prefix states priced against the full-multiplicity corpus —
    // occurrence-weighted piece totals + distinct piece vocab per
    // budget, non-alphabet words passing through whole
    "q182_bpe_budget_sweep" -> {
      val steps = Seq(0, 1, 3, 5)
      val stepCtes = steps.map { j =>
        s"""wp$j AS (
           |  SELECT w, string_split(replace(trim(s, chr(1)),
           |           chr(1) || chr(1), ' '), ' ') AS ps
           |  FROM w$j),
           |enc$j AS (
           |  SELECT wn.w, wn.n, coalesce(wp$j.ps, [wn.w]) AS ps
           |  FROM wn LEFT JOIN wp$j USING (w)),
           |st$j AS (
           |  SELECT $j AS budget,
           |         CAST(sum(n) AS BIGINT) AS n_words,
           |         CAST(sum(n * len(ps)) AS BIGINT) AS total_pieces
           |  FROM enc$j),
           |v$j AS (
           |  SELECT $j AS budget, count(DISTINCT p) AS piece_vocab
           |  FROM (SELECT unnest(ps) AS p FROM enc$j))""".stripMargin
      }.mkString(",\n")
      val finals = steps.map { j =>
        s"""SELECT st$j.budget, st$j.n_words, st$j.total_pieces,
           |       CAST((CAST(1000000000 AS HUGEINT) * st$j.total_pieces)
           |         // st$j.n_words AS BIGINT) AS pieces_per_word_scaled,
           |       CAST(v$j.piece_vocab AS BIGINT) AS piece_vocab
           |FROM st$j CROSS JOIN v$j""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${bpeCtes(5)},
         |tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |wn AS (
         |  SELECT w, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT unnest(t) AS w FROM tk) GROUP BY w),
         |$stepCtes
         |$finals""".stripMargin
    },

    // X124 MOSS match step: q173's winnow chain -> distinct print sets,
    // df<=3 stop-print guard, distinct shared prints per (query, doc),
    // (shared desc, doc_id) rank cut at 5, coverage vs the query's own
    // uncapped print count
    "q181_winnow_matches" ->
      raw"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, len(t) - 2 AS g, i - 1 AS pos,
         |         ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' '
         |            || t[i+2]), 1, 7))::BIGINT AS fp
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
         |        FROM tk WHERE len(t) >= 3)),
         |m AS (
         |  SELECT doc_id, pos, fp,
         |         unnest(range(greatest(pos - least(4, g) + 1, 0),
         |                      least(pos, g - least(4, g)) + 1)) AS s
         |  FROM g),
         |sel AS (
         |  SELECT doc_id, pos, fp,
         |         row_number() OVER (PARTITION BY doc_id, s
         |                            ORDER BY fp, pos DESC) AS rn
         |  FROM m),
         |wfp AS (SELECT DISTINCT doc_id, fp FROM sel WHERE rn = 1),
         |ok AS (SELECT fp FROM wfp GROUP BY fp HAVING count(*) <= 3),
         |q AS (SELECT doc_id AS query_id, fp FROM wfp WHERE doc_id < 25),
         |qt AS (SELECT query_id, count(*) AS q_prints FROM q GROUP BY 1),
         |sh AS (
         |  SELECT q.query_id, c.doc_id, count(*) AS shared
         |  FROM wfp c JOIN ok USING (fp) JOIN q USING (fp)
         |  WHERE c.doc_id <> q.query_id
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT query_id, doc_id, shared,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY shared DESC, doc_id) AS rank
         |  FROM sh)
         |SELECT rk.query_id, CAST(rk.rank AS INT) AS rank, rk.doc_id,
         |       rk.shared, qt.q_prints,
         |       CAST((CAST(1000000000 AS BIGINT) * rk.shared)
         |         // qt.q_prints AS BIGINT) AS coverage_scaled
         |FROM rk JOIN qt USING (query_id)
         |WHERE rk.rank <= 5""".stripMargin,

    "q171_hard_negatives" ->
      s"""WITH a AS (SELECT vec_id AS query_id, embedding AS e
         |           FROM embeddings WHERE vec_id < 8),
         |p AS (
         |  SELECT a.query_id, c.vec_id,
         |         CAST(floor(${cosSql("a.e", "c.embedding")} * 1e9 + 0.5)
         |              AS BIGINT) AS ci
         |  FROM a CROSS JOIN embeddings c
         |  WHERE c.vec_id <> a.query_id),
         |r AS (
         |  SELECT query_id, vec_id, ci,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY ci DESC, vec_id) AS rn
         |  FROM p
         |  WHERE ci >= 100000000 AND ci < 300000000)
         |SELECT query_id, CAST(rn - 1 AS INT) AS rank, vec_id, ci
         |FROM r WHERE rn >= 2 AND rn <= 6""".stripMargin,

    "q169_margin_mine" ->
      s"""WITH a AS (SELECT vec_id AS a_id, embedding AS e FROM embeddings
         |           WHERE vec_id % 2 = 0),
         |b AS (SELECT vec_id AS b_id, embedding AS e FROM embeddings
         |      WHERE vec_id % 2 = 1),
         |p AS (
         |  SELECT a_id, b_id,
         |         CAST(floor(${cosSql("a.e", "b.e")} * 1e9 + 0.5) AS BIGINT)
         |           AS ci
         |  FROM a CROSS JOIN b),
         |sa AS (SELECT a_id, sum(ci) AS s FROM (
         |         SELECT a_id, ci, row_number() OVER (
         |           PARTITION BY a_id ORDER BY ci DESC, b_id) AS rn
         |         FROM p) WHERE rn <= 4 GROUP BY a_id),
         |sb AS (SELECT b_id, sum(ci) AS s FROM (
         |         SELECT b_id, ci, row_number() OVER (
         |           PARTITION BY b_id ORDER BY ci DESC, a_id) AS rn
         |         FROM p) WHERE rn <= 4 GROUP BY b_id),
         |m AS (SELECT p.a_id, p.b_id, p.ci,
         |        CAST(8 * p.ci - sa.s - sb.s AS BIGINT) AS margin
         |      FROM p JOIN sa USING (a_id) JOIN sb USING (b_id)),
         |ba AS (SELECT a_id, b_id FROM (
         |         SELECT a_id, b_id, row_number() OVER (
         |           PARTITION BY a_id ORDER BY margin DESC, b_id) AS rn
         |         FROM m) WHERE rn = 1),
         |bb AS (SELECT a_id, b_id FROM (
         |         SELECT a_id, b_id, row_number() OVER (
         |           PARTITION BY b_id ORDER BY margin DESC, a_id) AS rn
         |         FROM m) WHERE rn = 1)
         |SELECT m.a_id, m.b_id, m.ci, m.margin
         |FROM m JOIN ba USING (a_id, b_id) JOIN bb USING (a_id, b_id)
         |WHERE m.margin >= 300000000""".stripMargin,

    "q95_pagerank" -> {
      // unrolled damped-update CTEs, one per engine iteration
      val iterCtes = (1 to 4).map { i =>
        raw"""r$i AS (
           |  SELECT nd.node, t.tp + (85 * coalesce(s.inc, 0)) // 100 AS rank
           |  FROM nodes nd CROSS JOIN tp t
           |  LEFT JOIN (
           |    SELECT e.dst AS node,
           |           CAST(sum(p.rank // d.outdeg) AS BIGINT) AS inc
           |    FROM r${i - 1} p JOIN e ON e.src = p.node
           |    JOIN deg d ON d.src = p.node
           |    GROUP BY e.dst) s ON s.node = nd.node)""".stripMargin
      }.mkString(",\n")
      raw"""WITH li AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |e AS (SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
         |      FROM li
         |      UNION ALL
         |      SELECT 's' || l_suppkey, 'p' || l_partkey FROM li),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
         |n AS (SELECT count(*) AS n FROM nodes),
         |tp AS (SELECT ((1000000000000 // n) * 15) // 100 AS tp FROM n),
         |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM n) AS rank
         |       FROM nodes),
         |$iterCtes
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r4""".stripMargin
    },

    "q96_fuzzy_join" ->
      // the length predicates mirror the operator's maxLen=512 band
      // (rows longer than the band are excluded from matching); no-ops
      // on TPC-H's ~18-char names but keeps oracle semantics identical
      """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE length(a.c_name) <= 512 AND length(b.c_name) <= 512
        |  AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,

    "q97_entity_clusters" ->
      """WITH RECURSIVE pr AS (
        |  SELECT a.c_custkey AS u, b.c_custkey AS v
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE a.c_custkey < 4000 AND b.c_custkey < 4000
        |    AND length(a.c_name) <= 512 AND length(b.c_name) <= 512
        |    AND levenshtein(a.c_name, b.c_name) <= 1),
        |edges AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
        |verts AS (SELECT DISTINCT u AS id FROM edges),
        |walk(src, dst) AS (
        |  SELECT id, id FROM verts
        |  UNION
        |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst)
        |SELECT src AS doc_id, min(dst) AS comp_id
        |FROM walk GROUP BY 1""".stripMargin,

    // q97's cluster walk + survivorship aggregates: singletons keep
    // their own id as entity, best member by (acctbal DESC, custkey
    // DESC) donates the record-level fields
    "q114_golden_records" ->
      """WITH RECURSIVE pr AS (
        |  SELECT a.c_custkey AS u, b.c_custkey AS v
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE a.c_custkey < 4000 AND b.c_custkey < 4000
        |    AND levenshtein(a.c_name, b.c_name) <= 1
        |    AND substr(a.c_name, 1, length(a.c_name) - 1)
        |      = substr(b.c_name, 1, length(b.c_name) - 1)),
        |edges AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
        |verts AS (SELECT DISTINCT u AS id FROM edges),
        |walk(src, dst) AS (
        |  SELECT id, id FROM verts
        |  UNION
        |  SELECT w.src, e.v FROM walk w JOIN edges e ON e.u = w.dst),
        |comp AS (SELECT src AS id, min(dst) AS comp_id FROM walk GROUP BY 1),
        |m AS (
        |  SELECT c.*, coalesce(comp.comp_id, c.c_custkey) AS entity_id
        |  FROM customer c LEFT JOIN comp ON comp.id = c.c_custkey
        |  WHERE c.c_custkey < 4000),
        |best AS (
        |  SELECT entity_id, c_nationkey, c_mktsegment,
        |         row_number() OVER (PARTITION BY entity_id
        |           ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |  FROM m)
        |SELECT m.entity_id, count(*) AS n_members,
        |       min(m.c_name) AS min_c_name,
        |       max(m.c_acctbal) AS max_c_acctbal,
        |       b.c_nationkey AS best_c_nationkey,
        |       b.c_mktsegment AS best_c_mktsegment
        |FROM m JOIN (SELECT * FROM best WHERE rn = 1) b USING (entity_id)
        |GROUP BY m.entity_id, b.c_nationkey, b.c_mktsegment""".stripMargin,

    // SCD2 run-collapse replayed with lag (run starts) + cumulative sum
    // (version) + lead (valid_to = next run's valid_from)
    "q116_scd2_history" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid,
        |         event_type AS v
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |o AS (
        |  SELECT *, lag(v) OVER w AS prev_v FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, eid)),
        |r AS (
        |  SELECT *, sum(CASE WHEN prev_v IS NULL OR prev_v <> v
        |                     THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY us, eid) AS version
        |  FROM o),
        |agg AS (
        |  SELECT user_id, CAST(version AS INTEGER) AS version,
        |         min(v) AS value, min(us) AS valid_from_us,
        |         count(*) AS n_events
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, version, value, valid_from_us,
        |       lead(valid_from_us) OVER (PARTITION BY user_id
        |                                 ORDER BY version) AS valid_to_us,
        |       n_events
        |FROM agg""".stripMargin,

    // q96's candidate band dressed with field payloads, then the same
    // integer agreement weights and cutoffs
    "q117_linkage_score" ->
      """WITH pr AS (
        |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE length(a.c_name) <= 512 AND length(b.c_name) <= 512
        |    AND levenshtein(a.c_name, b.c_name) <= 1),
        |bits AS (
        |  SELECT a_id, b_id,
        |    CASE WHEN a.c_name IS NULL OR b.c_name IS NULL THEN NULL
        |         WHEN substring(a.c_name, 1, length(a.c_name) - 1)
        |            = substring(b.c_name, 1, length(b.c_name) - 1)
        |         THEN 1 ELSE 0 END AS agree_c_name,
        |    CASE WHEN a.c_nationkey IS NULL OR b.c_nationkey IS NULL
        |         THEN NULL WHEN a.c_nationkey = b.c_nationkey
        |         THEN 1 ELSE 0 END AS agree_c_nationkey,
        |    CASE WHEN a.c_mktsegment IS NULL OR b.c_mktsegment IS NULL
        |         THEN NULL WHEN a.c_mktsegment = b.c_mktsegment
        |         THEN 1 ELSE 0 END AS agree_c_mktsegment,
        |    CASE WHEN a.c_acctbal IS NULL OR b.c_acctbal IS NULL THEN NULL
        |         WHEN abs(floor(a.c_acctbal * 100)
        |                  - floor(b.c_acctbal * 100)) <= 10000
        |         THEN 1 ELSE 0 END AS agree_c_acctbal
        |  FROM pr JOIN customer a ON a.c_custkey = pr.a_id
        |          JOIN customer b ON b.c_custkey = pr.b_id),
        |sc AS (
        |  SELECT *, CAST(
        |      CASE coalesce(agree_c_name, -1)
        |        WHEN 1 THEN 2000 WHEN 0 THEN -500 ELSE 0 END
        |    + CASE coalesce(agree_c_nationkey, -1)
        |        WHEN 1 THEN 1200 WHEN 0 THEN -1800 ELSE 0 END
        |    + CASE coalesce(agree_c_mktsegment, -1)
        |        WHEN 1 THEN 900 WHEN 0 THEN -600 ELSE 0 END
        |    + CASE coalesce(agree_c_acctbal, -1)
        |        WHEN 1 THEN 1500 WHEN 0 THEN -700 ELSE 0 END
        |    AS BIGINT) AS score
        |  FROM bits)
        |SELECT a_id, b_id, agree_c_name, agree_c_nationkey,
        |       agree_c_mktsegment, agree_c_acctbal, score,
        |       CASE WHEN score >= 3500 THEN 'link'
        |            WHEN score >= 1000 THEN 'possible'
        |            ELSE 'nonlink' END AS band
        |FROM sc""".stripMargin,

    // last-touch replay: IGNORE NULLS windows pick the latest
    // non-conversion row strictly before each conversion in (us, eid)
    // order; the gap test nulls the credit exactly like the fold
    "q118_attribution" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid,
        |         event_type AS t
        |  FROM events
        |  WHERE ts IS NOT NULL
        |    AND event_type IN ('purchase', 'click', 'view')),
        |w AS (
        |  SELECT user_id, us, eid, t,
        |    last_value(CASE WHEN t <> 'purchase' THEN us END IGNORE NULLS)
        |      OVER win AS t_us,
        |    last_value(CASE WHEN t <> 'purchase' THEN eid END IGNORE NULLS)
        |      OVER win AS t_eid,
        |    last_value(CASE WHEN t <> 'purchase' THEN t END IGNORE NULLS)
        |      OVER win AS t_t
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, eid
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING))
        |SELECT user_id, eid AS conv_eid, us AS conv_us,
        |  CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
        |       THEN t_eid END AS touch_eid,
        |  CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
        |       THEN t_t END AS touch_type,
        |  CASE WHEN t_us IS NOT NULL AND us - t_us <= 259200000000
        |       THEN us - t_us END AS gap_us
        |FROM w WHERE t = 'purchase'""".stripMargin,

    // funnel chained mins (2 steps, 40-day gap) -> censored durations
    // vs the global horizon -> day histogram -> reverse running at_risk
    "q119_life_table" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE event_type IN ('signup', 'purchase') AND ts IS NOT NULL),
        |s0 AS (SELECT user_id, min(us) AS t_0 FROM f
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT f.user_id, min(us) AS t_1 FROM f JOIN s0 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND us > t_0 AND us <= t_0 + 3456000000000
        |       GROUP BY 1),
        |u AS (SELECT s0.user_id, t_0, t_1
        |      FROM s0 LEFT JOIN s1 USING (user_id)),
        |h AS (SELECT max(epoch_us(ts)) AS h_us FROM events
        |      WHERE ts IS NOT NULL),
        |d AS (SELECT (coalesce(t_1, h_us) - t_0) // 86400000000 AS day,
        |             CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END AS c
        |      FROM u, h),
        |lt AS (SELECT day, CAST(sum(c) AS BIGINT) AS converted,
        |              CAST(count(*) - sum(c) AS BIGINT) AS censored
        |       FROM d GROUP BY 1)
        |SELECT CAST(day AS BIGINT) AS day,
        |       CAST(sum(converted + censored)
        |            OVER (ORDER BY day DESC) AS BIGINT) AS at_risk,
        |       converted, censored
        |FROM lt""".stripMargin,

    "q146_weighted_paths" -> {
      // min-plus relaxation unrolled; the oracle relaxes from ALL known
      // nodes each round — provably equal to the engine's
      // frontier-restricted SPFA after the same round count
      val rounds = (1 to 3).map { r =>
        s"""d$r AS (
           |  SELECT node, min(dist) AS dist FROM (
           |    SELECT node, dist FROM d${r - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, d.dist + e.w AS dist
           |    FROM d${r - 1} d JOIN ed e ON e.src = d.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH inc AS (
         |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
         |  FROM lineitem WHERE l_partkey < 3000),
         |keptb AS (SELECT basket FROM inc GROUP BY basket
         |          HAVING count(*) <= 64),
         |kept AS (SELECT inc.basket, inc.item
         |         FROM inc JOIN keptb USING (basket)),
         |p AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(count(*) AS BIGINT) AS pair_n
         |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
         |  GROUP BY a.item, b.item HAVING count(*) >= 2),
         |ed AS (
         |  SELECT item_a AS src, item_b AS dst,
         |         CAST(1000000 // pair_n AS BIGINT) AS w FROM p
         |  UNION ALL
         |  SELECT item_b, item_a, CAST(1000000 // pair_n AS BIGINT) FROM p),
         |d0 AS (SELECT CAST(unnest([1, 2]) AS BIGINT) AS node,
         |              CAST(0 AS BIGINT) AS dist),
         |$rounds
         |SELECT node, CAST(dist AS BIGINT) AS dist FROM d3""".stripMargin
    },

    "q144_group_quantiles" ->
      """WITH m AS (
        |  SELECT l_returnflag AS g,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |r AS (SELECT g, v,
        |        row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
        |        count(*) OVER (PARTITION BY g) AS n
        |      FROM m),
        |t AS (SELECT DISTINCT g, n, unnest([25, 50, 90]) AS pct FROM r)
        |SELECT r.g, CAST(t.pct AS INT) AS pct, r.v AS cut
        |FROM r JOIN t ON r.g = t.g
        |  AND r.rn = (t.pct * t.n + 99) // 100""".stripMargin,

    "q145_funnel_latency" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase')
        |    AND ts IS NOT NULL),
        |s0 AS (SELECT user_id, min(us) AS t_0 FROM f
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s1 AS (SELECT f.user_id, min(us) AS t_1 FROM f JOIN s0 USING (user_id)
        |       WHERE event_type = 'click'
        |         AND us > t_0 AND us <= t_0 + 86400000000
        |       GROUP BY f.user_id),
        |s2 AS (SELECT f.user_id, min(us) AS t_2 FROM f JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND us > t_1 AND us <= t_1 + 86400000000
        |       GROUP BY f.user_id),
        |d AS (
        |  SELECT 'signup->click' AS transition,
        |         (t_1 - t_0) // 1000000 AS secs
        |  FROM s0 JOIN s1 USING (user_id)
        |  UNION ALL
        |  SELECT 'click->purchase', (t_2 - t_1) // 1000000
        |  FROM s1 JOIN s2 USING (user_id)),
        |r AS (SELECT transition, secs,
        |        row_number() OVER (PARTITION BY transition
        |                           ORDER BY secs) AS rn,
        |        count(*) OVER (PARTITION BY transition) AS n
        |      FROM d),
        |t AS (SELECT DISTINCT transition, n, unnest([25, 50, 90]) AS pct
        |      FROM r)
        |SELECT r.transition, CAST(t.pct AS INT) AS pct,
        |       CAST(r.secs AS BIGINT) AS secs
        |FROM r JOIN t ON r.transition = t.transition
        |  AND r.rn = (t.pct * t.n + 99) // 100""".stripMargin,

    "q143_keyness" ->
      s"""WITH ts AS (
         |  SELECT source AS src,
         |         unnest(list_filter(string_split($norm, ' '),
         |           t -> len(t) > 0)) AS term
         |  FROM documents WHERE source IS NOT NULL),
         |ps AS (SELECT src, term, CAST(count(*) AS BIGINT) AS a
         |       FROM ts GROUP BY 1, 2),
         |tt AS (SELECT term, CAST(sum(a) AS BIGINT) AS tot
         |       FROM ps GROUP BY 1),
         |st AS (SELECT src, CAST(sum(a) AS BIGINT) AS n_slice
         |       FROM ps GROUP BY 1),
         |g AS (SELECT CAST(sum(n_slice) AS BIGINT) AS n_all FROM st),
         |sc AS (
         |  SELECT ps.src, ps.term, ps.a, tt.tot - ps.a AS b,
         |         CAST((CAST(ps.a AS HUGEINT)
         |             * (g.n_all - st.n_slice + 1) * 1000000)
         |           // (CAST(tt.tot - ps.a + 1 AS HUGEINT) * st.n_slice)
         |           AS BIGINT) AS score_e6
         |  FROM ps JOIN tt ON tt.term = ps.term
         |  JOIN st ON st.src = ps.src CROSS JOIN g),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY src
         |            ORDER BY score_e6 DESC, term) AS rank
         |  FROM sc)
         |SELECT src, CAST(rank AS INT) AS rank, term, a, b, score_e6
         |FROM r WHERE rank <= 10""".stripMargin,

    "q141_skew_audit" ->
      """WITH c AS (
        |  SELECT coalesce(CAST(event_type AS VARCHAR), '<null>') AS key,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |             CAST(count(*) AS BIGINT) AS n_keys FROM c)
        |SELECT key, cnt, n, n_keys,
        |       CAST(cnt * 1000000 // n AS BIGINT) AS share_e6
        |FROM c, t ORDER BY cnt DESC, key LIMIT 5""".stripMargin,

    "q142_kmv_intersect" -> {
      val est = (nd: String, kth: String) =>
        s"CASE WHEN $nd < 64 THEN CAST($nd AS DOUBLE) " +
          s"ELSE 63.0 / (CAST($kth AS DOUBLE) / 1152921504606846976.0) END"
      s"""WITH h AS (
         |  SELECT DISTINCT event_type AS g,
         |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
         |           AS hv
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |r AS (SELECT g, hv,
         |        row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
         |      FROM h),
         |a AS (SELECT g, count(*) AS nd,
         |        max(CASE WHEN rn = 64 THEN hv END) AS kth
         |      FROM r GROUP BY 1),
         |prs AS (
         |  SELECT x.g AS ga, y.g AS gb
         |  FROM (SELECT DISTINCT g FROM h) x
         |  JOIN (SELECT DISTINCT g FROM h) y ON x.g < y.g),
         |hu AS (
         |  SELECT p.ga, p.gb, h.hv FROM prs p
         |  JOIN h ON h.g = p.ga OR h.g = p.gb
         |  GROUP BY 1, 2, 3),
         |ru AS (SELECT ga, gb, hv,
         |         row_number() OVER (PARTITION BY ga, gb ORDER BY hv) AS rn
         |       FROM hu),
         |au AS (SELECT ga, gb, count(*) AS nd,
         |         max(CASE WHEN rn = 64 THEN hv END) AS kth
         |       FROM ru GROUP BY 1, 2)
         |SELECT prs.ga AS type_a, prs.gb AS type_b,
         |       ${est("aa.nd", "aa.kth")} AS est_a,
         |       ${est("ab.nd", "ab.kth")} AS est_b,
         |       ${est("au.nd", "au.kth")} AS est_union,
         |       (${est("aa.nd", "aa.kth")} + ${est("ab.nd", "ab.kth")})
         |         - ${est("au.nd", "au.kth")} AS est_intersect
         |FROM prs
         |JOIN a aa ON aa.g = prs.ga
         |JOIN a ab ON ab.g = prs.gb
         |JOIN au ON au.ga = prs.ga AND au.gb = prs.gb""".stripMargin
    },

    "q138_changepoint" ->
      """WITH sparse AS (
        |  SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM sparse),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        |grps AS (SELECT DISTINCT g FROM sparse),
        |dense AS (
        |  SELECT grps.g, cal.d, coalesce(sparse.cnt, 0) AS cnt
        |  FROM cal CROSS JOIN grps
        |  LEFT JOIN sparse ON sparse.g = grps.g AND sparse.d = cal.d),
        |w AS (
        |  SELECT g, d, cnt,
        |         row_number() OVER (PARTITION BY g ORDER BY d) AS t,
        |         sum(cnt) OVER (PARTITION BY g ORDER BY d) AS st,
        |         count(*) OVER (PARTITION BY g) AS n,
        |         sum(cnt) OVER (PARTITION BY g) AS s
        |  FROM dense),
        |sc AS (
        |  SELECT g, d, n, t,
        |         abs(st * (n - t) - (s - st) * t) AS num,
        |         t * (n - t) AS den,
        |         CAST(abs(st * (n - t) - (s - st) * t) AS DOUBLE) /
        |           CAST(t * (n - t) AS DOUBLE) AS ratio
        |  FROM w WHERE t < n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY g
        |            ORDER BY ratio DESC, t ASC) AS rn
        |  FROM sc)
        |SELECT g, d AS change_day, CAST(num AS BIGINT) AS shift_num,
        |       CAST(den AS BIGINT) AS shift_den, CAST(n AS BIGINT) AS n_days
        |FROM r WHERE rn = 1""".stripMargin,

    "q139_weekday_profile" ->
      """WITH sparse AS (
        |  SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM sparse),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        |grps AS (SELECT DISTINCT g FROM sparse),
        |dense AS (
        |  SELECT grps.g, cal.d, coalesce(sparse.cnt, 0) AS cnt
        |  FROM cal CROSS JOIN grps
        |  LEFT JOIN sparse ON sparse.g = grps.g AND sparse.d = cal.d),
        |per AS (
        |  SELECT g, CAST(isodow(d) AS INTEGER) AS dow,
        |         CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(cnt) AS BIGINT) AS sum_cnt
        |  FROM dense GROUP BY 1, 2),
        |tot AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_tot,
        |         CAST(sum(cnt) AS BIGINT) AS sum_tot
        |  FROM dense GROUP BY 1)
        |SELECT per.g, dow, n_days, sum_cnt,
        |       CAST((CAST(sum_cnt AS HUGEINT) * n_tot * 1000000)
        |         // (CAST(n_days AS HUGEINT) * sum_tot) AS BIGINT) AS idx_e6
        |FROM per JOIN tot ON per.g = tot.g
        |WHERE sum_tot > 0""".stripMargin,

    "q140_segment_overlap" ->
      """WITH inc AS (
        |  SELECT DISTINCT event_type AS seg, user_id AS u FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL)
        |SELECT a.seg AS type_a, b.seg AS type_b,
        |       CAST(count(*) AS BIGINT) AS overlap
        |FROM inc a JOIN inc b ON a.u = b.u AND a.seg < b.seg
        |GROUP BY 1, 2""".stripMargin,

    "q137_rfm" -> {
      // equi-depth cutoffs replayed per metric: smallest value whose
      // cumulative count crosses k/5 of users (integer cross-multiply)
      def binCtes(m: String): String =
        s"""h_$m AS (SELECT $m AS v, count(*) AS c FROM met GROUP BY 1),
           |c_$m AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
           |                (SELECT sum(c) FROM h_$m) AS n FROM h_$m),
           |k_$m AS (SELECT k, min(v) AS cut
           |         FROM c_$m, (SELECT unnest([1, 2, 3, 4, 5]) AS k)
           |         WHERE 5 * cum >= k * n GROUP BY k),
           |b_$m AS (SELECT user_id, CAST(min(k) AS INTEGER) AS b
           |         FROM met JOIN k_$m ON met.$m <= cut GROUP BY user_id)"""
          .stripMargin
      s"""WITH hor AS (
         |  SELECT max(epoch_us(ts)) AS h_us FROM events
         |  WHERE ts IS NOT NULL),
         |met AS (
         |  SELECT user_id,
         |         CAST((h_us - max(epoch_us(ts))) // 86400000000 AS BIGINT)
         |           AS recency_days,
         |         CAST(count(*) AS BIGINT) AS frequency,
         |         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
         |           AS BIGINT) AS monetary_cents
         |  FROM events CROSS JOIN hor
         |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
         |    AND ts IS NOT NULL AND value IS NOT NULL
         |  GROUP BY user_id, h_us),
         |${binCtes("recency_days")},
         |${binCtes("frequency")},
         |${binCtes("monetary_cents")}
         |SELECT met.user_id, recency_days, frequency, monetary_cents,
         |       br.b AS r_bin, bf.b AS f_bin, bm.b AS m_bin
         |FROM met
         |JOIN b_recency_days br ON br.user_id = met.user_id
         |JOIN b_frequency bf ON bf.user_id = met.user_id
         |JOIN b_monetary_cents bm ON bm.user_id = met.user_id""".stripMargin
    },

    "q136_phrase_search" -> {
      val metaRows = TestdataQueries.PhraseQueries.flatMap { p =>
        val ts = p.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
        ts.zipWithIndex.map { case (t, off) =>
          s"('${p}', $off, '${t}', ${ts.size})"
        }
      }.mkString(",\n         |    ")
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(t) AS term,
         |         unnest(range(len(t))) AS pos FROM tk),
         |meta(phrase, off, term, len) AS (VALUES
         |    $metaRows),
         |v AS (
         |  SELECT m.phrase, t.doc_id, t.pos - m.off AS anchor, m.off, m.len
         |  FROM tok t JOIN meta m ON t.term = m.term),
         |a AS (
         |  SELECT phrase, doc_id, anchor, count(DISTINCT off) AS seen,
         |         min(len) AS len
         |  FROM v GROUP BY 1, 2, 3)
         |SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS hits
         |FROM a WHERE seen = len AND anchor >= 0
         |GROUP BY 1, 2""".stripMargin
    },

    "q135_twap" ->
      """WITH rows_ AS (
        |  SELECT event_type AS g, epoch_us(ts) AS us, event_id AS eid,
        |         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vs
        |  FROM events
        |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |w AS (
        |  SELECT g, us, vs,
        |         lead(us) OVER (PARTITION BY g ORDER BY us, eid) AS nxt
        |  FROM rows_)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(coalesce(sum(CASE WHEN nxt IS NOT NULL
        |         THEN (nxt - us)::HUGEINT * vs END), 0) AS VARCHAR)
        |         AS twap_num,
        |       CAST(max(us) - min(us) AS BIGINT) AS twap_den
        |FROM w GROUP BY g""".stripMargin,

    "q134_pit_enrich" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id AS eid,
        |         event_type AS v
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
        |o AS (
        |  SELECT *, lag(v) OVER w AS prev_v FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, eid)),
        |r AS (
        |  SELECT *, sum(CASE WHEN prev_v IS NULL OR prev_v <> v
        |                     THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY us, eid) AS version
        |  FROM o),
        |hist AS (
        |  SELECT user_id, CAST(version AS INTEGER) AS version,
        |         min(v) AS value, min(us) AS valid_from_us
        |  FROM r GROUP BY user_id, version),
        |sel AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'purchase' AND ts IS NOT NULL
        |    AND user_id IS NOT NULL),
        |pit AS (
        |  SELECT s.event_id, s.user_id, s.us, h.version, h.value,
        |         row_number() OVER (PARTITION BY s.event_id
        |           ORDER BY h.valid_from_us DESC NULLS LAST) AS rn
        |  FROM sel s LEFT JOIN hist h
        |    ON h.user_id = s.user_id AND h.valid_from_us <= s.us - 1)
        |SELECT event_id, user_id, us, version AS prior_version,
        |       value AS prior_state
        |FROM pit WHERE rn = 1""".stripMargin,

    "q131_top_paths" ->
      """WITH s AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS t
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL
        |  GROUP BY user_id),
        |g AS (
        |  SELECT array_to_string(t[i:i+2], '>') AS path
        |  FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i
        |        FROM s WHERE len(t) >= 3))
        |SELECT path, CAST(count(*) AS BIGINT) AS cnt
        |FROM g GROUP BY path
        |ORDER BY cnt DESC, path LIMIT 50""".stripMargin,

    "q132_kmv_rollup" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type AS g,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        |  FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT g, hv,
        |        row_number() OVER (PARTITION BY g ORDER BY hv) AS rn
        |      FROM h),
        |a AS (SELECT g, count(*) AS nd,
        |        max(CASE WHEN rn = 64 THEN hv END) AS kth
        |      FROM r GROUP BY 1),
        |hg AS (SELECT DISTINCT hv FROM h),
        |rg AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hg),
        |ag AS (SELECT count(*) AS nd,
        |         max(CASE WHEN rn = 64 THEN hv END) AS kth
        |       FROM rg)
        |SELECT g,
        |       CASE WHEN nd < 64 THEN nd::DOUBLE
        |            ELSE 63.0 / (kth::DOUBLE / 1152921504606846976.0)
        |       END AS kmv_est
        |FROM a
        |UNION ALL
        |SELECT '__all__' AS g,
        |       CASE WHEN nd < 64 THEN nd::DOUBLE
        |            ELSE 63.0 / (kth::DOUBLE / 1152921504606846976.0)
        |       END AS kmv_est
        |FROM ag""".stripMargin,

    "q133_ab_readout" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase')
        |    AND ts IS NOT NULL),
        |s0 AS (SELECT user_id, min(us) AS t_0 FROM f
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s1 AS (SELECT f.user_id, min(us) AS t_1 FROM f JOIN s0 USING (user_id)
        |       WHERE event_type = 'click'
        |         AND us > t_0 AND us <= t_0 + 86400000000
        |       GROUP BY f.user_id),
        |s2 AS (SELECT f.user_id, min(us) AS t_2 FROM f JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND us > t_1 AND us <= t_1 + 86400000000
        |       GROUP BY f.user_id),
        |u AS (
        |  SELECT DISTINCT user_id,
        |         ('0x' || substr(md5(user_id::VARCHAR), 1, 7))::BIGINT % 2
        |           AS variant
        |  FROM events WHERE user_id IS NOT NULL),
        |per AS (
        |  SELECT u.variant, count(*) AS n,
        |         sum(CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END) AS s
        |  FROM u LEFT JOIN s2 ON u.user_id = s2.user_id
        |  GROUP BY u.variant),
        |w AS (
        |  SELECT CAST(sum(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN variant = 0 THEN s END) AS BIGINT) AS s0,
        |         CAST(sum(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN variant = 1 THEN s END) AS BIGINT) AS s1
        |  FROM per)
        |SELECT n0, s0, n1, s1,
        |       s1 * n0 - s0 * n1 AS uplift_num,
        |       s1 * (n0 - s0) - s0 * (n1 - s1) AS or_num
        |FROM w""".stripMargin,

    "q130_ivf_pq" -> {
      // q40's IVF cell/probe CTEs composed with q128's PQ code/LUT CTEs;
      // scoring restricted to probed cells, then the exact rescore
      def subDot(a: String, b: String): String =
        s"list_reduce(list_transform(range(16 * js.j + 1, 16 * js.j + 17), " +
          s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"
      def subL2(a: String, b: String): String =
        s"list_reduce(list_transform(range(16 * js.j + 1, 16 * js.j + 17), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * " +
          s"($a[i]::DOUBLE - $b[i]::DOUBLE)), (x, y) -> x + y)"
      s"""WITH ivf AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         |         embedding AS c
         |  FROM embeddings ORDER BY vec_id LIMIT 16),
         |pq AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
         |         embedding AS c
         |  FROM embeddings ORDER BY vec_id LIMIT 8),
         |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |cells AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT e.vec_id, ivf.cell_id,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cosSql("e.embedding", "ivf.c")} DESC,
         |                      ivf.cell_id ASC) AS rn
         |    FROM embeddings e CROSS JOIN ivf)
         |  WHERE rn = 1),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT e.vec_id, js.j, pq.code,
         |           row_number() OVER (PARTITION BY e.vec_id, js.j
         |             ORDER BY ${subL2("e.embedding", "pq.c")} ASC,
         |                      pq.code ASC) AS rn
         |    FROM embeddings e CROSS JOIN pq CROSS JOIN js)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cell_id FROM (
         |    SELECT q.vec_id AS query_id, ivf.cell_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosSql("q.embedding", "ivf.c")} DESC,
         |                      ivf.cell_id ASC) AS rn
         |    FROM embeddings q CROSS JOIN ivf
         |    WHERE q.vec_id < 5)
         |  WHERE rn <= 4),
         |lut AS (
         |  SELECT q.vec_id AS query_id, js.j, pq.code,
         |         ${subDot("q.embedding", "pq.c")} AS v
         |  FROM embeddings q CROSS JOIN pq CROSS JOIN js
         |  WHERE q.vec_id < 5),
         |pairs AS (
         |  SELECT l.query_id, e.vec_id,
         |         list_reduce(list(l.v ORDER BY l.j), (x, y) -> x + y) AS adc
         |  FROM probes pr
         |  JOIN cells ce ON ce.cell_id = pr.cell_id
         |  JOIN enc e ON e.vec_id = ce.vec_id
         |  JOIN lut l ON l.query_id = pr.query_id
         |             AND l.j = e.j AND l.code = e.code
         |  WHERE e.vec_id <> pr.query_id
         |  GROUP BY l.query_id, e.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, adc,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY adc DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |SELECT r.query_id, CAST(r.rank AS INT) AS rank, r.vec_id, r.adc,
         |       ${cosSql("q.embedding", "d.embedding")} AS exact_cos
         |FROM ranked r
         |JOIN embeddings q ON q.vec_id = r.query_id
         |JOIN embeddings d ON d.vec_id = r.vec_id
         |WHERE r.rank <= 10""".stripMargin
    },

    "q129_bpe_merges" -> {
      val k = 5
      val finals = (1 to k).map { r =>
        if (r == 1)
          s"SELECT 1 AS merge_rank, a AS lhs, b AS rhs, c AS pair_n FROM m1"
        else s"SELECT $r, a, b, c FROM m$r"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${bpeCtes(k)}
         |SELECT * FROM (
         |  $finals)""".stripMargin
    },

    // contamination spans: positioned 3-grams on both sides, exact
    // gram-text join, diagonal = ti - ej, runs = gaps-and-islands per
    // (pair, diagonal) over matched start positions (row_number grp),
    // run covers cnt + k - 1 tokens; keep pairs with a run >= 4
    "q193_contamination_spans" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(string_split($NORM, ' '),
        |    t -> len(t) > 0) AS t FROM documents),
        |tg AS (
        |  SELECT doc_id AS train_id, i - 1 AS ti,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |        FROM tk WHERE doc_id >= 10 AND len(t) >= 3)),
        |eg AS (
        |  SELECT doc_id AS eval_id, i - 1 AS ej,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |        FROM tk WHERE doc_id < 10 AND len(t) >= 3)),
        |isl AS (
        |  SELECT train_id, eval_id, ti - ej AS diag, ti,
        |         ti - row_number() OVER (
        |           PARTITION BY train_id, eval_id, ti - ej
        |           ORDER BY ti) AS grp
        |  FROM tg JOIN eg USING (g)),
        |runs AS (
        |  SELECT train_id, eval_id, diag, grp, count(*) AS cnt
        |  FROM isl GROUP BY train_id, eval_id, diag, grp)
        |SELECT * FROM (
        |  SELECT train_id, eval_id,
        |         CAST(max(cnt + 2) AS BIGINT) AS max_run_tokens,
        |         CAST(count(*) AS BIGINT) AS n_islands,
        |         CAST(sum(cnt) AS BIGINT) AS n_aligned_grams
        |  FROM runs GROUP BY train_id, eval_id)
        |WHERE max_run_tokens >= 4""".stripMargin.replace("$NORM", norm),

    "q191_wordpiece_train" -> {
      val k = 5
      val finals = (1 to k).map { r =>
        if (r == 1)
          s"SELECT 1 AS merge_rank, a AS lhs, b AS rhs, c AS pair_n," +
            s" score AS score_e9 FROM n1"
        else s"SELECT $r, a, b, c, score FROM n$r"
      }.mkString("\n  UNION ALL ")
      s"""WITH ${wpCtes(k)}
         |SELECT * FROM (
         |  $finals)""".stripMargin
    },

    // the WordPiece APPLY half is NOT a merge replay: re-learn the
    // merges (shared chain), derive the vocabulary (seed alphabet +
    // merge products), then walk every eligible word greedily —
    // longest vocab match per position, unrolled maxWordLen=12 steps,
    // [UNK] when a reached position has no match — and reassemble per
    // doc exactly like q166
    "q192_wordpiece_encode" -> {
      val k = 5
      val products = (1 to k).map(r =>
        s"SELECT a || regexp_replace(b, '^##', '') AS piece FROM n$r")
        .mkString("\n  UNION ")
      val maxW = 12
      val steps = (1 to maxW).map { j =>
        s"""s$j AS MATERIALIZED (
           |  SELECT s.w,
           |         CASE WHEN s.unk OR s.pos >= len(s.w) OR m.l IS NULL
           |              THEN s.pos ELSE s.pos + m.l END AS pos,
           |         CASE WHEN s.unk OR s.pos >= len(s.w) OR m.l IS NULL
           |              THEN s.ps
           |              ELSE s.ps ||
           |                CASE WHEN s.ps = '' THEN '' ELSE ' ' END ||
           |                m.piece END AS ps,
           |         CASE WHEN s.unk THEN TRUE
           |              WHEN s.pos < len(s.w) AND m.l IS NULL THEN TRUE
           |              ELSE FALSE END AS unk
           |  FROM s${j - 1} s LEFT JOIN mpc m
           |    ON m.w = s.w AND m.i = s.pos)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${wpCtes(k)},
         |voc AS MATERIALIZED (
         |  SELECT DISTINCT sym AS piece FROM (
         |    SELECT unnest(string_split(trim(s, chr(1)),
         |                               chr(1) || chr(1))) AS sym
         |    FROM v0)
         |  UNION
         |  $products),
         |wrd AS MATERIALIZED (
         |  SELECT DISTINCT unnest(list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0)) AS w FROM documents),
         |elig AS (
         |  SELECT w FROM wrd
         |  WHERE regexp_matches(w, '^[a-z0-9]+$$') AND len(w) <= $maxW),
         |cand AS (
         |  SELECT w, i, unnest(range(1, len(w) - i + 1)) AS l
         |  FROM (SELECT w, unnest(range(0, len(w))) AS i FROM elig)),
         |mpc AS MATERIALIZED (
         |  SELECT c.w, c.i, max(c.l) AS l,
         |         CASE WHEN c.i = 0 THEN substr(c.w, 1, max(c.l))
         |              ELSE '##' || substr(c.w, c.i + 1, max(c.l)) END
         |           AS piece
         |  FROM cand c JOIN voc v ON v.piece =
         |    CASE WHEN c.i = 0 THEN substr(c.w, 1, c.l)
         |         ELSE '##' || substr(c.w, c.i + 1, c.l) END
         |  GROUP BY c.w, c.i),
         |s0 AS (
         |  SELECT w, 0 AS pos, '' AS ps, FALSE AS unk FROM elig),
         |$steps,
         |seg AS (
         |  SELECT w, CASE WHEN unk THEN '[UNK]' ELSE ps END AS ps,
         |         CASE WHEN unk THEN 1
         |              ELSE len(string_split(ps, ' ')) END AS np
         |  FROM s$maxW),
         |wp AS MATERIALIZED (
         |  SELECT wrd.w, coalesce(seg.ps, wrd.w) AS ps,
         |         CAST(coalesce(seg.np, 1) AS BIGINT) AS np
         |  FROM wrd LEFT JOIN seg ON wrd.w = seg.w),
         |tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(t) AS w,
         |         unnest(range(len(t))) AS pos FROM tk),
         |enc AS (
         |  SELECT tok.doc_id, tok.pos, wp.ps, wp.np
         |  FROM tok JOIN wp ON tok.w = wp.w),
         |agg AS (
         |  SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces,
         |         string_agg(ps, ' ' ORDER BY pos) AS pieces
         |  FROM enc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.n_pieces, 0) AS n_pieces,
         |       coalesce(agg.pieces, '') AS pieces
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id"""
        .stripMargin
    },

    // the tokenizer's APPLY half: re-learn the same merges (the shared
    // chain), then w5's final segmentation IS each alphabet word's piece
    // list — de-wrap the chr(1) separators to a space-joined piece
    // string, re-join the corpus tokens positionally (non-alphabet words
    // pass through whole, like the engine), and reassemble per doc
    "q166_bpe_encode" -> {
      val k = 5
      s"""WITH ${bpeCtes(k)},
         |wp AS (
         |  SELECT w, replace(trim(s, chr(1)), chr(1) || chr(1), ' ') AS ps
         |  FROM w$k),
         |tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(t) AS w,
         |         unnest(range(len(t))) AS pos FROM tk),
         |enc AS (
         |  SELECT tok.doc_id, tok.pos, coalesce(wp.ps, tok.w) AS ps
         |  FROM tok LEFT JOIN wp ON tok.w = wp.w),
         |agg AS (
         |  SELECT doc_id,
         |         CAST(sum(len(string_split(ps, ' '))) AS BIGINT)
         |           AS n_pieces,
         |         string_agg(ps, ' ' ORDER BY pos) AS pieces
         |  FROM enc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.n_pieces, 0) AS n_pieces,
         |       coalesce(agg.pieces, '') AS pieces
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id"""
        .stripMargin
    },

    "q170_fertility" -> {
      val k = 5
      s"""WITH ${bpeCtes(k)},
         |wp AS (
         |  SELECT w, replace(trim(s, chr(1)), chr(1) || chr(1), ' ') AS ps
         |  FROM w$k),
         |tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(t) AS w FROM tk),
         |pieces AS (
         |  SELECT tok.doc_id,
         |         sum(len(string_split(coalesce(wp.ps, tok.w), ' ')))
         |           AS n_pieces
         |  FROM tok LEFT JOIN wp ON tok.w = wp.w
         |  GROUP BY tok.doc_id),
         |st AS (
         |  SELECT doc_id, len(t) AS n_w,
         |         len(array_to_string(t, '')) AS n_c
         |  FROM tk)
         |SELECT d.lang AS slice, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(st.n_w) AS BIGINT) AS n_words,
         |       CAST(sum(st.n_c) AS BIGINT) AS n_chars,
         |       CAST(sum(coalesce(pieces.n_pieces, 0)) AS BIGINT)
         |         AS n_pieces,
         |       CASE WHEN sum(st.n_w) > 0 THEN
         |         CAST(CAST(1000000 AS HUGEINT)
         |              * sum(coalesce(pieces.n_pieces, 0))
         |              // sum(st.n_w) AS BIGINT) END AS fertility_scaled,
         |       CASE WHEN sum(coalesce(pieces.n_pieces, 0)) > 0 THEN
         |         CAST(CAST(1000000 AS HUGEINT) * sum(st.n_c)
         |              // sum(coalesce(pieces.n_pieces, 0)) AS BIGINT) END
         |         AS chars_per_piece_scaled
         |FROM documents d
         |JOIN st ON d.doc_id = st.doc_id
         |LEFT JOIN pieces ON d.doc_id = pieces.doc_id
         |GROUP BY d.lang""".stripMargin
    },

    "q128_pq_adc" -> {
      // subspace-windowed dot / squared-L2 with the engine's exact
      // left-to-right accumulation (PqCode/PqLut read window index i on
      // both sides, so full-length centroids replay by list index)
      def subDot(a: String, b: String): String =
        s"list_reduce(list_transform(range(16 * js.j + 1, 16 * js.j + 17), " +
          s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"
      def subL2(a: String, b: String): String =
        s"list_reduce(list_transform(range(16 * js.j + 1, 16 * js.j + 17), " +
          s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * " +
          s"($a[i]::DOUBLE - $b[i]::DOUBLE)), (x, y) -> x + y)"
      s"""WITH cent AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code,
         |         embedding AS c
         |  FROM embeddings ORDER BY vec_id LIMIT 8),
         |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |enc AS (
         |  SELECT vec_id, j, code FROM (
         |    SELECT e.vec_id, js.j, cent.code,
         |           row_number() OVER (PARTITION BY e.vec_id, js.j
         |             ORDER BY ${subL2("e.embedding", "cent.c")} ASC,
         |                      cent.code ASC) AS rn
         |    FROM embeddings e CROSS JOIN cent CROSS JOIN js)
         |  WHERE rn = 1),
         |lut AS (
         |  SELECT q.vec_id AS query_id, js.j, cent.code,
         |         ${subDot("q.embedding", "cent.c")} AS v
         |  FROM embeddings q CROSS JOIN cent CROSS JOIN js
         |  WHERE q.vec_id < 5),
         |pairs AS (
         |  SELECT l.query_id, e.vec_id,
         |         list_reduce(list(l.v ORDER BY l.j), (x, y) -> x + y) AS adc
         |  FROM enc e JOIN lut l ON e.j = l.j AND e.code = l.code
         |  WHERE e.vec_id <> l.query_id
         |  GROUP BY l.query_id, e.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, adc,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY adc DESC, vec_id ASC) AS rank
         |  FROM pairs)
         |SELECT r.query_id, CAST(r.rank AS INT) AS rank, r.vec_id, r.adc,
         |       ${cosSql("q.embedding", "d.embedding")} AS exact_cos
         |FROM ranked r
         |JOIN embeddings q ON q.vec_id = r.query_id
         |JOIN embeddings d ON d.vec_id = r.vec_id
         |WHERE r.rank <= 10""".stripMargin
    },

    "q121_cm_freq" ->
      s"""WITH t AS (
         |  SELECT unnest(list_filter(string_split($norm, ' '),
         |    x -> len(x) > 0)) AS item FROM documents),
         |rows3 AS (SELECT unnest([0, 1, 2]) AS r),
         |sk AS (
         |  SELECT r,
         |         ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || item),
         |           1, 7))::BIGINT % 1024 AS bucket,
         |         CAST(count(*) AS BIGINT) AS cnt
         |  FROM t CROSS JOIN rows3 GROUP BY 1, 2),
         |probes AS (SELECT DISTINCT item FROM (
         |  SELECT unnest(list_filter(string_split($norm, ' '),
         |    x -> len(x) > 0)) AS item
         |  FROM documents WHERE doc_id < 10)),
         |pe AS (
         |  SELECT item, r,
         |         ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || item),
         |           1, 7))::BIGINT % 1024 AS bucket
         |  FROM probes CROSS JOIN rows3)
         |SELECT pe.item, min(coalesce(sk.cnt, 0)) AS cm_est
         |FROM pe LEFT JOIN sk ON pe.r = sk.r AND pe.bucket = sk.bucket
         |GROUP BY pe.item""".stripMargin,

    "q122_collocations" ->
      s"""WITH tk AS (
         |  SELECT list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |bi AS (
         |  SELECT t[i] AS w1, t[i+1] AS w2
         |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM tk)),
         |uni AS (SELECT unnest(t) AS w FROM tk),
         |c1 AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM uni),
         |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_n
         |       FROM bi GROUP BY w1, w2 HAVING count(*) >= 5)
         |SELECT w1, w2, pair_n,
         |       CAST((CAST(pair_n AS HUGEINT) * 1000000 * n.n_tokens)
         |         // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS pmi_e6
         |FROM c2 JOIN c1 a ON c2.w1 = a.w JOIN c1 b ON c2.w2 = b.w
         |CROSS JOIN n
         |ORDER BY pmi_e6 DESC, w1, w2 LIMIT 100""".stripMargin,

    "q123_copurchase_sim" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |  FROM lineitem WHERE l_partkey < 3000),
        |keptb AS (SELECT basket FROM inc GROUP BY basket
        |          HAVING count(*) <= 64),
        |kept AS (SELECT inc.basket, inc.item
        |         FROM inc JOIN keptb USING (basket)),
        |ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c
        |       FROM kept GROUP BY item),
        |p AS (
        |  SELECT a.item AS item_a, b.item AS item_b,
        |         CAST(count(*) AS BIGINT) AS pair_n
        |  FROM kept a JOIN kept b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY a.item, b.item HAVING count(*) >= 2)
        |SELECT item_a, item_b, pair_n,
        |       CAST((CAST(pair_n AS HUGEINT) * pair_n * 1000000)
        |         // (CAST(ca.c AS HUGEINT) * cb.c) AS BIGINT) AS cos2_e6
        |FROM p JOIN ic ca ON p.item_a = ca.item
        |JOIN ic cb ON p.item_b = cb.item""".stripMargin,

    "q124_daily_trend" ->
      """WITH sparse AS (
        |  SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM sparse),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        |grps AS (SELECT DISTINCT g FROM sparse),
        |dense AS (
        |  SELECT grps.g, cal.d, coalesce(sparse.cnt, 0) AS cnt
        |  FROM cal CROSS JOIN grps
        |  LEFT JOIN sparse ON sparse.g = grps.g AND sparse.d = cal.d),
        |x AS (SELECT g, datediff('day', span.d0, d) AS x, cnt
        |      FROM dense, span)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_days,
        |       CAST(sum(cnt) AS BIGINT) AS sum_y,
        |       CAST(count(*) * sum(x * cnt) - sum(x) * sum(cnt)
        |         AS BIGINT) AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x)
        |         AS BIGINT) AS slope_den
        |FROM x GROUP BY g""".stripMargin,

    "q125_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey AS id, CAST(p_size AS BIGINT) AS x,
        |         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM part)
        |SELECT s.id, s.x, s.y FROM pts s
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.x <= s.x AND q.y <= s.y
        |    AND (q.x < s.x OR q.y < s.y))""".stripMargin,

    "q126_vocab" ->
      s"""WITH tok AS (
         |  SELECT unnest(list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0)) AS term FROM documents),
         |cts AS (SELECT term, CAST(count(*) AS BIGINT) AS c
         |        FROM tok GROUP BY term HAVING count(*) >= 3)
         |SELECT term, c,
         |       row_number() OVER (ORDER BY c DESC, term) AS token_id
         |FROM cts""".stripMargin,

    "q127_encode" ->
      s"""WITH tk AS (
         |  SELECT doc_id, list_filter(string_split($norm, ' '),
         |    t -> len(t) > 0) AS t FROM documents),
         |tok AS (
         |  SELECT doc_id, unnest(t) AS term,
         |         unnest(range(len(t))) AS pos FROM tk),
         |cts AS (SELECT term, count(*) AS c FROM tok
         |        GROUP BY term HAVING count(*) >= 3),
         |v AS (SELECT term,
         |        row_number() OVER (ORDER BY c DESC, term) AS token_id
         |      FROM cts),
         |enc AS (
         |  SELECT tok.doc_id, tok.pos, coalesce(v.token_id, -1) AS tid
         |  FROM tok LEFT JOIN v ON tok.term = v.term),
         |agg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |         string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos) AS ids
         |  FROM enc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(agg.n_tok, 0) AS n_tok,
         |       coalesce(agg.ids, '') AS ids
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    // dense slice x group grid so absent cells contribute |0 - Cg*nd|
    "q120_mix_drift" ->
      """WITH sp AS (
        |  SELECT CAST(ts AS DATE) AS d, event_type AS g, count(*) AS c
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |gt AS (SELECT g, CAST(sum(c) AS BIGINT) AS cg FROM sp GROUP BY 1),
        |st AS (SELECT d, CAST(sum(c) AS BIGINT) AS nd FROM sp GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM sp),
        |cell AS (
        |  SELECT st.d, gt.g, st.nd, gt.cg, coalesce(sp.c, 0) AS c
        |  FROM st CROSS JOIN gt
        |  LEFT JOIN sp ON sp.d = st.d AND sp.g = gt.g)
        |SELECT cell.d AS d, cell.nd AS n,
        |       CAST(sum(abs(c * n_total - cg * nd)) AS BIGINT) AS drift_num
        |FROM cell, tot
        |GROUP BY 1, 2""".stripMargin,

    "q115_densify" ->
      """WITH sparse AS (
        |  SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS cnt
        |  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |span AS (SELECT min(d) AS d0, max(d) AS d1 FROM sparse),
        |cal AS (
        |  SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS d FROM span),
        |grps AS (SELECT DISTINCT g FROM sparse)
        |SELECT grps.g, cal.d, coalesce(sparse.cnt, 0) AS cnt
        |FROM cal CROSS JOIN grps
        |LEFT JOIN sparse ON sparse.g = grps.g AND sparse.d = cal.d"""
        .stripMargin,

    "q98_bfs_reach" -> {
      // unrolled frontier expansions: r_k holds min-distance nodes
      // within k hops
      val hops = (1 to 3).map { k =>
        raw"""r$k AS (SELECT node, min(dist) AS dist FROM (
           |  SELECT node, dist FROM r${k - 1}
           |  UNION ALL
           |  SELECT e.dst, p.dist + 1 FROM r${k - 1} p
           |  JOIN e ON e.src = p.node)
           |GROUP BY node)""".stripMargin
      }.mkString(",\n")
      raw"""WITH li AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |e AS (SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
         |      FROM li
         |      UNION ALL
         |      SELECT 's' || l_suppkey, 'p' || l_partkey FROM li),
         |r0(node, dist) AS (VALUES ('p0', 0), ('p1', 0), ('p2', 0)),
         |$hops
         |SELECT node, CAST(dist AS INTEGER) AS dist FROM r3""".stripMargin
    },

    "q100_hits" -> {
      // one auth + hub half-step pair per engine iteration; iteration i
      // max-rescales to the integer grid only at i == 3 (the engine's
      // rescaleEvery = 3 final-only schedule), raw HUGEINT sums otherwise
      val steps = (1 to 3).map { i =>
        val rescale = i == 3
        def scaled(src: String) =
          if (rescale)
            raw"""SELECT node, CAST(score * 1000000000000
               |    // (SELECT max(score) FROM $src) AS BIGINT) AS score
               |  FROM $src""".stripMargin
          else s"SELECT node, score FROM $src"
        raw"""a${i}r AS (
           |  SELECT e.dst AS node, sum(CAST(h${i - 1}.score AS HUGEINT))
           |    AS score
           |  FROM h${i - 1} JOIN e ON e.src = h${i - 1}.node
           |  GROUP BY e.dst),
           |a$i AS (
           |  ${scaled(s"a${i}r")}),
           |h${i}r AS (
           |  SELECT e.src AS node, sum(CAST(a$i.score AS HUGEINT))
           |    AS score
           |  FROM a$i JOIN e ON e.dst = a$i.node
           |  GROUP BY e.src),
           |h$i AS (
           |  ${scaled(s"h${i}r")})""".stripMargin
      }.mkString(",\n")
      raw"""WITH li AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |e AS (SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst
         |      FROM li),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS score
         |       FROM nodes),
         |$steps
         |SELECT n.node, coalesce(h3.score, 0) AS hub,
         |       coalesce(a3.score, 0) AS auth
         |FROM nodes n
         |LEFT JOIN h3 ON h3.node = n.node
         |LEFT JOIN a3 ON a3.node = n.node""".stripMargin
    },

    "q101_zorder_stats" -> {
      // bit-for-bit replay of Layout.mortonCode: bit i of x lands at
      // position 2i, bit i of y at 2i+1 (7 bits per dimension)
      val terms = (0 until 7).map { i =>
        s"(((p_size >> $i) & 1) << ${2 * i}) + " +
          s"(((name_len >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
      raw"""WITH dims AS (
         |  SELECT p_size, length(p_name) AS name_len FROM part),
         |z AS (SELECT p_size, name_len, $terms AS zval FROM dims)
         |SELECT zval // 1024 AS bucket, count(*) AS cnt,
         |       min(p_size) AS min_size, max(p_size) AS max_size,
         |       min(name_len) AS min_len, max(name_len) AS max_len
         |FROM z GROUP BY 1""".stripMargin
    },

    "q102_bloom_semijoin" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 9900)""".stripMargin,

    "q103_tfidf_join" ->
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
         |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS term
         |  FROM (SELECT doc_id, string_split($norm, ' ') AS tk
         |        FROM documents)),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM sh GROUP BY 1, 2),
         |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
         |        HAVING count(*) BETWEEN 2 AND 20),
         |w AS (SELECT doc_id, tf.term,
         |             CAST(tf * (1000000 // df) AS HUGEINT) AS w
         |      FROM tf JOIN dfs ON dfs.term = tf.term),
         |norms AS (SELECT doc_id, CAST(sum(w * w) AS HUGEINT) AS norm2
         |          FROM w GROUP BY 1),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         CAST(sum(a.w * b.w) AS HUGEINT) AS num
         |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, CAST(num AS BIGINT) AS num,
         |       CAST(na.norm2 AS BIGINT) AS na2,
         |       CAST(nb.norm2 AS BIGINT) AS nb2
         |FROM pairs
         |JOIN norms na ON na.doc_id = id_a
         |JOIN norms nb ON nb.doc_id = id_b
         |WHERE num * num * 4 >= na.norm2 * nb.norm2""".stripMargin,

    "q104_approx_quantiles" ->
      """SELECT l_returnflag, l_linestatus,
        |       quantile_disc(l_quantity, 0.25) AS q_25,
        |       quantile_disc(l_quantity, 0.5)  AS q_50,
        |       quantile_disc(l_quantity, 0.9)  AS q_90,
        |       count(*) AS cnt
        |FROM lineitem
        |WHERE l_quantity IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q105_length_batches" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         len(list_filter(string_split($norm, ' '),
         |           t -> len(t) > 0)) AS n_tok
         |  FROM documents),
         |r AS (SELECT doc_id, n_tok,
         |             row_number() OVER (ORDER BY n_tok, doc_id) AS rk
         |      FROM tok)
         |SELECT (rk - 1) // 32 AS batch_id, count(*) AS docs,
         |       min(n_tok) AS min_tok, max(n_tok) AS max_tok,
         |       CAST(sum(n_tok) AS BIGINT) AS sum_tok,
         |       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT)
         |         AS padding
         |FROM r GROUP BY 1""".stripMargin,

    // brute-force all-pairs ordered containment — completeness proof for
    // the prefix-filter candidate generation in Dedup.containmentJoin
    "q106_containment_join" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split($norm, ' ') AS t FROM documents),
         |sets AS (
         |  SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(t) - 1),
         |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM tk WHERE len(t) >= 3),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |         len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS n_a
         |  FROM sets a JOIN sets b ON a.doc_id <> b.doc_id)
         |SELECT id_a, id_b,
         |       CAST(inter AS DOUBLE) / CAST(n_a AS DOUBLE) AS containment
         |FROM pairs WHERE inter * 5 >= n_a * 3""".stripMargin,

    // chained sequential mins == the greedy-earliest fold (see
    // operators/EventFunnel.scala for the equivalence argument)
    "q107_funnel" ->
      """WITH f AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE event_type IN ('signup', 'click', 'purchase')
        |    AND ts IS NOT NULL),
        |s0 AS (SELECT user_id, min(us) AS t_0 FROM f
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |s1 AS (SELECT f.user_id, min(us) AS t_1 FROM f JOIN s0 USING (user_id)
        |       WHERE event_type = 'click'
        |         AND us > t_0 AND us <= t_0 + 86400000000
        |       GROUP BY f.user_id),
        |s2 AS (SELECT f.user_id, min(us) AS t_2 FROM f JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase'
        |         AND us > t_1 AND us <= t_1 + 86400000000
        |       GROUP BY f.user_id)
        |SELECT s0.user_id, t_0, t_1, t_2,
        |       CASE WHEN t_2 IS NOT NULL THEN 3
        |            WHEN t_1 IS NOT NULL THEN 2 ELSE 1 END AS steps_reached
        |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)"""
        .stripMargin,

    "q108_json_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS sum_k,
        |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS min_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |            AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q109_cohort_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |coh AS (SELECT user_id, min(d) AS cohort FROM act GROUP BY user_id)
        |SELECT cohort,
        |       CAST(date_diff('day', cohort, d) AS INTEGER) AS day_offset,
        |       count(*) AS users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2""".stripMargin,

    "q110_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL)
        |SELECT prev AS from_type, event_type AS to_type, count(*) AS cnt
        |FROM o WHERE prev IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q111_rolling_active" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |  WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |days AS (SELECT DISTINCT d AS report_d FROM act),
        |contrib AS (
        |  SELECT DISTINCT user_id, d + CAST(r.i AS INTEGER) AS report_d
        |  FROM act, range(0, 7) r(i))
        |SELECT report_d, count(*) AS active_users
        |FROM contrib JOIN days USING (report_d)
        |GROUP BY 1""".stripMargin,

    // one UNION ALL block per lineitem column, mirroring the profiler's
    // single-pass metrics; dtype literals match Spark's simpleString
    "q113_profile" -> {
      def block(c: String, dt: String, mm: String): String = {
        val (mn, mx) = mm match {
          case "plain" => (s"CAST(min($c) AS VARCHAR)",
            s"CAST(max($c) AS VARCHAR)")
          case "date" => (s"CAST(CAST(min(CAST($c AS DATE)) AS DATE) AS VARCHAR)",
            s"CAST(CAST(max(CAST($c AS DATE)) AS DATE) AS VARCHAR)")
          case _ => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        }
        s"""SELECT '$c' AS col_name, '$dt' AS dtype,
           |  count(*) - count($c) AS nulls,
           |  count(DISTINCT $c) AS distincts,
           |  $mn AS min_val, $mx AS max_val FROM lineitem""".stripMargin
      }
      Seq(
        block("l_orderkey", "bigint", "plain"),
        block("l_partkey", "bigint", "plain"),
        block("l_suppkey", "bigint", "plain"),
        block("l_linenumber", "int", "plain"),
        block("l_quantity", "double", "none"),
        block("l_extendedprice", "double", "none"),
        block("l_discount", "double", "none"),
        block("l_tax", "double", "none"),
        block("l_returnflag", "string", "plain"),
        block("l_linestatus", "string", "plain"),
        block("l_shipdate", "timestamp_ntz", "date")
      ).mkString("\nUNION ALL\n")
    },

    // replays the full degree-ordered triangle enumeration — same
    // canonical edges, same (deg, node) orientation, same wedge close
    "q112_triangles" ->
      """WITH pp AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_partkey < 3000),
        |e AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
        |         greatest(a.l_partkey, b.l_partkey) AS b
        |  FROM pp a JOIN pp b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e)
        |  GROUP BY n),
        |o AS (
        |  SELECT CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.a ELSE e.b END
        |           AS u,
        |         CASE WHEN (da.d, e.a) < (db.d, e.b) THEN e.b ELSE e.a END
        |           AS v
        |  FROM e JOIN deg da ON da.n = e.a JOIN deg db ON db.n = e.b),
        |o2 AS (SELECT o.u, o.v, d.d AS dv FROM o JOIN deg d ON d.n = o.v),
        |w AS (
        |  SELECT x.u, x.v AS p, y.v AS q FROM o2 x JOIN o2 y
        |    ON x.u = y.u AND (x.dv, x.v) < (y.dv, y.v)),
        |tri AS (SELECT w.u, w.p, w.q FROM w
        |        JOIN o ON o.u = w.p AND o.v = w.q)
        |SELECT n AS node, count(*) AS triangles FROM (
        |  SELECT u AS n FROM tri UNION ALL SELECT p FROM tri
        |  UNION ALL SELECT q FROM tri)
        |GROUP BY 1""".stripMargin,

    "q36_ann_brute_force" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
        |           WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, c.vec_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM q CROSS JOIN embeddings c
        |  WHERE c.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, vec_id, round(cos, 6) AS cosine
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "q38_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id, 'text' AS kind,
        |       octet_length(encode(text)) AS n_bytes,
        |       sha256(text) AS sha256
        |FROM documents""".stripMargin)
}
