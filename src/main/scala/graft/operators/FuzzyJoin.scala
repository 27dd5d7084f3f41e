package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance similarity self-join — the entity-resolution
  * "same name, small typo" matcher.
  *
  * Blocking is the symmetric deletion neighborhood (the SymSpell
  * scheme): every string emits each variant reachable by deleting at
  * most `tau` characters, and two strings are candidates iff they share
  * a variant. The underlying lemma (take an optimal alignment; delete
  * from each side the characters it does not align identically) makes
  * the candidate set a SUPERSET of every pair within edit distance
  * `tau` — no false negatives — and the `levenshtein` verify on
  * candidates only makes the result EXACT. The spec and the driver
  * oracle both pin equality with the brute-force all-pairs join.
  *
  * Scale shape: a string of length L emits 1 + L + L(L-1)/2 variant
  * keys at tau=2 (~170 for an 18-char name) — the variant table is a
  * constant factor of the input and carries (key, id, len) only; the
  * equi-join on the variant key replaces the all-pairs cross join
  * (quadratic in |input|) with one shuffle join (linear in shared-key
  * pairs). Text is joined back for CANDIDATE pairs only. Caveat the
  * caller owns: k strings sharing one variant key produce k^2
  * candidates — name-like ER keys are near-unique, but a corpus of
  * near-identical strings degrades toward brute force (that is the
  * data, not the algorithm: those pairs really are all matches). For
  * long strings (where the L^2/2 variant fan-out hurts) the segment
  * scheme (PassJoin) is the right tool instead; this operator targets
  * the short-key ER band and enforces tau in {1, 2} and, via `maxLen`,
  * a hard cap on string length (one 10k-char string at tau=2 would
  * emit ~50M variants inside a single row's transform — rows longer
  * than `maxLen` are excluded from matching rather than allowed to
  * blow up a task).
  *
  * The variant key is hashed to a LONG (xxhash64) before the
  * self-join: the shuffle carries 8-byte keys instead of near-full
  * copies of the string, and a hash collision can only ADD a candidate
  * pair, which the exact `levenshtein` verify then removes — the
  * result stays exact.
  */
object FuzzyJoin {

  def editDistanceSelfJoin(rows: DataFrame, tau: Int,
                           id: Column = col("id"),
                           str: Column = col("s"),
                           maxLen: Int = 512): DataFrame = {
    require(tau == 1 || tau == 2, s"tau=$tau (deletion scheme band)")
    require(maxLen >= 1, s"maxLen=$maxLen")
    val base = rows.filter(id.isNotNull && str.isNotNull &&
        length(str) <= maxLen)
      .select(id.as("__id"), str.as("__s"))
    val s = col("__s")
    val n = length(s)
    // delete 0-based position i (chars are 1-based in substr)
    def del1(i: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + 2, n - i - 1))
    // delete 0-based positions i < j
    def del2(i: Column, j: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + 2, j - i - 1),
        s.substr(j + 2, n - j - 1))
    val empty = array().cast("array<string>")
    val v1 = when(n >= 1,
      transform(sequence(lit(0), n - 1), i => del1(i))).otherwise(empty)
    val v2 =
      if (tau < 2) empty
      else when(n >= 2, flatten(transform(sequence(lit(0), n - 2), i =>
        transform(sequence(i + 1, n - 1), j => del2(i, j))))
      ).otherwise(empty)
    val variants = base.select(col("__id"), n.as("__len"),
      explode(array_distinct(
        transform(concat(array(s), v1, v2), v => xxhash64(v)))).as("__key"))
    // candidates via per-key member arrays (the shared group-then-pair
    // tail): ONE groupBy shuffle of the variant table replaces both
    // sides of a variant self-join — which would also compute the
    // variant explode twice — and sort_array on (id, len) structs makes
    // every emitted pair a_id < b_id by construction. Same k^2 emission
    // per k-member key as the self-join (exactness forbids capping;
    // name-like ER keys keep k small — see the class comment).
    val cands = graft.llm.Dedup.pairsFromMembers(
        variants.groupBy("__key")
          .agg(sort_array(collect_list(
            struct(col("__id"), col("__len")))).as("ms"))
          .filter(size(col("ms")) >= 2))
      // strict <: positional a-before-b only implies a.__id < b.__id for
      // unique ids — duplicate ids in dirty ER input would otherwise
      // emit (id, id) self-pairs the self-join shape never produced
      .filter(col("a.__id") < col("b.__id") &&
        abs(col("a.__len") - col("b.__len")) <= tau)
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id")).distinct()
    cands
      .join(base.select(col("__id").as("a_id"), col("__s").as("__sa")), "a_id")
      .join(base.select(col("__id").as("b_id"), col("__s").as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= tau)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
