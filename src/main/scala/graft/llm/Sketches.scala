package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketches for 100 TB-scale aggregation.
  *
  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * DISTINCT hash values of the group; with hashes uniform on [0, 2^60),
  * the k-th smallest normalized value u estimates the distinct count as
  * `(k-1)/u` (fewer than k distinct hashes -> the sketch IS the exact
  * answer). The buffer is k longs regardless of group size, partial
  * aggregation combines map-side, and merge is a k-way min-merge — the
  * standard mergeable-summary contract.
  *
  * Why KMV next to Spark's built-in `approx_count_distinct` (HLL++):
  * KMV with a FIXED hash is fully deterministic, so its estimate — not
  * just its error bound — is reproducible in any engine; the DuckDB
  * oracle recomputes the exact same estimate from the same md5-derived
  * hashes. HLL's estimate depends on implementation internals and can
  * only ever be checked within a tolerance.
  */
object Sketches {

  /** Hash domain: 15 md5 hex digits = 60 bits, uniform on [0, 2^60). */
  val HashBits = 60
  val HashDomain: Double = 1152921504606846976.0d // 2^60, exact in a double

  /** Portable 60-bit hash of any column (string-cast then md5). */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Aggregation column: the k smallest distinct hashes, ascending. */
  def kmvMins(k: Int)(h: Column): Column = {
    val fn = udaf(new KmvAggregator(k))
    fn(h)
  }

  /** Estimate from the sketch column produced by [[kmvMins]]. */
  def kmvEstimate(k: Int, mins: Column): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(mins, k).cast("double") / lit(HashDomain)))

  /** One-stop: distinct-count estimate of `value` per `keys` group. */
  def kmvDistinct(df: DataFrame, keys: Seq[Column], value: Column,
                  k: Int = 64): DataFrame = {
    val sketch = df.groupBy(keys: _*).agg(kmvMins(k)(kmvHash(value)).as("mins"))
    sketch.select(keys.map(c => sketch(c.toString)) :+
      kmvEstimate(k, col("mins")).as("kmv_est"): _*)
  }
}

/** Bounded buffer of the k smallest DISTINCT hash values (ascending).
  * Insert and merge keep the buffer sorted and capped, so partial
  * aggregation state is O(k) per group per partition. */
final class KmvAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Vector.empty

  private def insert(buf: Seq[Long], h: Long): Seq[Long] = {
    val i = buf.search(h).insertionPoint
    if (i < buf.length && buf(i) == h) buf                  // already present
    else if (buf.length < k) (buf.take(i) :+ h) ++ buf.drop(i)
    else if (h < buf.last) ((buf.take(i) :+ h) ++ buf.drop(i)).take(k)
    else buf
  }

  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] = bufferEncoder
}
