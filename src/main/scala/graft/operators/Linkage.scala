package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage: candidate pairs scored
  * by summing per-field agreement/disagreement weights (integer
  * log-odds surrogates of the trained m/u probabilities) and banded
  * into link / possible / non-link — the classic probabilistic ER
  * decision rule (Fellegi & Sunter 1969), layered over whatever
  * blocking produced the candidates (here: [[FuzzyJoin]]'s
  * edit-distance band, q96's shared pair store).
  *
  * Weights are CONFIG, quantized offline (milli-ban integers): the
  * engine never evaluates a runtime log, so scores are exact integer
  * sums — engine-portable and DuckDB-oracle-able bit-for-bit. A
  * missing field value on either side contributes weight 0 and a null
  * agreement bit (the F-S "no decision" cell), which SQL replays get
  * for free from CASE null-skipping.
  *
  * Lowering: two equi-joins dress the id pairs with their field
  * payloads (broadcast when the record side is dim-sized; plain
  * shuffled hash joins at warehouse scale — the pair table, not the
  * record table, is the big side after blocking), then one projection
  * computes every bit and the score. No window, no self-join beyond
  * the blocked pairs themselves.
  */
object Linkage {

  /** One comparison field: record column `col`, agreement predicate
    * over the two sides (equality by default), and the integer
    * agreement/disagreement weights (wAgree > 0 > wDisagree in any
    * sane configuration, but not enforced). */
  final case class LinkField(col: String, wAgree: Long, wDisagree: Long,
                             agree: (Column, Column) => Column = _ === _)

  /** Score `pairs` (`a_id`, `b_id`) against `records` keyed by `id`.
    *
    * Output: `a_id`, `b_id`, one `agree_<col>` bit per field (1 agree,
    * 0 disagree, null when either side is missing), `score` (long) and
    * `band` ("link" when `score >= linkAt`, "possible" when
    * `>= possibleAt`, else "nonlink").
    */
  def score(records: DataFrame, pairs: DataFrame, id: Column,
            fields: Seq[LinkField], linkAt: Long,
            possibleAt: Long): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(linkAt >= possibleAt, s"linkAt=$linkAt < possibleAt=$possibleAt")
    def side(p: String) = records.select(
      id.as(p + "id") +: fields.map(f => col(f.col).as(p + f.col)): _*)
    val dressed = pairs.select(col("a_id"), col("b_id"))
      .join(side("a_"), "a_id")
      .join(side("b_"), "b_id")
    val bits = fields.map { f =>
      val (a, b) = (col("a_" + f.col), col("b_" + f.col))
      when(a.isNull || b.isNull, lit(null).cast("int"))
        .when(f.agree(a, b), lit(1)).otherwise(lit(0))
        .as("agree_" + f.col)
    }
    val score = fields.map { f =>
      val bit = col("agree_" + f.col)
      when(bit.isNull, lit(0L)).when(bit === 1, lit(f.wAgree))
        .otherwise(lit(f.wDisagree))
    }.reduce(_ + _)
    dressed
      .select(col("a_id") +: col("b_id") +: bits: _*)
      .withColumn("score", score)
      .withColumn("band",
        when(col("score") >= linkAt, lit("link"))
          .when(col("score") >= possibleAt, lit("possible"))
          .otherwise(lit("nonlink")))
  }
}
