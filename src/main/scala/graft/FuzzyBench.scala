package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** Scale soak for the deletion-neighborhood edit-distance join:
  * synthesize N diverse 17-char keys (hash-hex — the realistic ER
  * regime, unlike the near-identical TPC-H names) with a planted 1-edit
  * corruption pair every 10th row, run the self-join, and verify the
  * planted pairs are exactly recovered. Prints one JSON line per phase
  * with strings/sec.
  *
  *  1. tau=1 over the full corpus (18 variant keys per string);
  *  2. tau=2 over a quarter of it (~154 variant keys per string) — the
  *     fan-out-heavy band, priced separately.
  *
  * Usage: `runMain graft.FuzzyBench [n]` (default 200000).
  */
object FuzzyBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // base key: "u" + 16 lowercase hex chars of xxhash64(id). Every 10th
    // row instead corrupts its predecessor's key at one position with
    // 'z' (not a hex digit -> edit distance exactly 1, deterministically)
    def baseOf(idCol: org.apache.spark.sql.Column) =
      concat(lit("u"), lower(lpad(hex(xxhash64(idCol)), 16, "0")))
    val p = (pmod(col("id"), lit(13)) + 2).cast("int")   // corrupt pos 2..14
    val corrupted = concat(
      expr("substr(base, 1, p - 1)"), lit("z"),
      expr("substr(base, p + 1)"))
    val rows = spark.range(n)
      .withColumn("base",
        when(col("id") % 10 === 0 && col("id") > 0, baseOf(col("id") - 1))
          .otherwise(baseOf(col("id"))))
      .withColumn("p", p)
      .select(col("id"),
        when(col("id") % 10 === 0 && col("id") > 0, corrupted)
          .otherwise(col("base")).as("s"))
      .cache()
    rows.count()                        // exclude synthesis from timing
    val planted = (n - 1) / 10          // ids 10, 20, ... pair with id-1

    val t0 = System.nanoTime()
    val pairs1 = FuzzyJoin.editDistanceSelfJoin(rows, tau = 1).cache()
    val found = pairs1.count()
    val plantedFound = pairs1
      .filter(col("b_id") - col("a_id") === 1 && col("b_id") % 10 === 0)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"phase":"tau1","strings":$n,"pairs":$found,"planted":$planted,"planted_found":$plantedFound,"sec":$sec%.2f,"strings_per_sec":${(n / sec).toLong}}""")
    assert(plantedFound == planted,
      s"lost planted pairs: $plantedFound of $planted")
    pairs1.unpersist()

    val n2 = n / 4
    val rows2 = rows.filter(col("id") < n2).cache()
    rows2.count()
    val t1 = System.nanoTime()
    val pairs2 = FuzzyJoin.editDistanceSelfJoin(rows2, tau = 2).cache()
    val found2 = pairs2.count()
    val planted2 = pairs2
      .filter(col("b_id") - col("a_id") === 1 && col("b_id") % 10 === 0)
      .count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"""{"phase":"tau2","strings":$n2,"pairs":$found2,"planted_found":$planted2,"sec":$sec2%.2f,"strings_per_sec":${(n2 / sec2).toLong}}""")
    assert(planted2 == (n2 - 1) / 10,
      s"lost planted pairs at tau=2: $planted2")
    spark.stop()
  }
}
