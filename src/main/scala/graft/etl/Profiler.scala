package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the warehouse `ANALYZE TABLE` surface:
  * per column null count, exact distinct count, and min/max where the
  * string rendering is engine-portable. Every column of the input
  * appears in the output exactly once, whatever its type.
  *
  * Lowering: columns melt into per-TYPE channels of `(col, value)` rows
  * (channels are value-type-uniform — integrals widen to long, each
  * distinct decimal/array/struct type gets its own channel), each
  * channel collapsing with a two-stage aggregate:
  * `groupBy(col, value).count` first — which partial-aggregates
  * map-side, so the shuffle carries only the DISTINCT (col, value)
  * pairs — then a per-column rollup reads distincts as the group count,
  * nulls from the null group's count, and min/max over group keys. A
  * multi-column `count_distinct` in one Aggregate would instead go
  * through Spark's Expand strategy (row-count x columns duplicated into
  * ONE hash aggregate); measured at sf0.1 that is ~15x slower than the
  * channel shape, and at warehouse scale the Expand's single
  * aggregation state is the straggler.
  *
  * Per-type contract:
  *  - integral / string / date / decimal / boolean: full profile,
  *    min/max rendered as strings (all exact, engine-portable forms);
  *  - timestamp: distincts on the RAW microsecond values, min/max
  *    rendered THROUGH `to_date` (sub-second formats are
  *    engine-specific; the date of the min timestamp IS the min date);
  *  - double / float: nulls + distincts only (IEEE bit-equality is
  *    portable, decimal rendering of binaries is not);
  *  - binary / array / struct: nulls + distincts (groupable, not
  *    portably renderable);
  *  - anything else (map, ...): null count only, distincts null —
  *    present in the output, explicitly unprofiled, never dropped.
  */
object Profiler {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.zipWithIndex
    def channel(cols: Seq[(String, Int)], cast: Column => Column,
                render: Option[Column => Column]): Seq[DataFrame] =
      if (cols.isEmpty) Nil else {
        val melted = df.select(explode(array(cols.map { case (n, i) =>
            struct(lit(n).as("c"), lit(i).as("i"), cast(col(n)).as("v"))
          }: _*)).as("e"))
          .select(col("e.c"), col("e.i"), col("e.v"))
        def mm(agg: Column): Column =
          render.map(r => r(agg)).getOrElse(lit(null)).cast("string")
        Seq(melted.groupBy("c", "i", "v").agg(count(lit(1)).as("cnt"))
          .groupBy("c", "i").agg(
            coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
              .as("nulls"),
            count(when(col("v").isNotNull, lit(1))).as("distincts"),
            mm(min("v")).as("min_val"), mm(max("v")).as("max_val")))
      }
    def ofType(p: DataType => Boolean) = fields.collect {
      case (f, i) if p(f.dataType) => (f.name, i)
    }.toSeq
    val asString = Some((c: Column) => c.cast("string"))
    val isIntegral: DataType => Boolean = {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val isTs: DataType => Boolean = {
      case TimestampType | TimestampNTZType => true
      case _ => false
    }
    val isFloat: DataType => Boolean = {
      case DoubleType | FloatType => true
      case _ => false
    }
    // exact-type channels: every decimal scale and every opaque shape
    // is its own (type-uniform) melt
    def byExactType(p: DataType => Boolean, render: Option[Column => Column]) =
      fields.filter { case (f, _) => p(f.dataType) }
        .groupBy(_._1.dataType).toSeq.sortBy(_._1.simpleString)
        .flatMap { case (_, fs) =>
          channel(fs.map { case (f, i) => (f.name, i) }.toSeq, identity, render)
        }
    val covered: DataType => Boolean = t =>
      isIntegral(t) || isTs(t) || isFloat(t) || t == StringType ||
        t == DateType || t == BooleanType || t.isInstanceOf[DecimalType] ||
        t == BinaryType || t.isInstanceOf[ArrayType] ||
        t.isInstanceOf[StructType]
    // unprofilable types (map, ...) still get a row: null count only —
    // a count-based aggregate works on ANY column
    val rest = ofType(t => !covered(t))
    val restChannel = if (rest.isEmpty) Nil else Seq(
      df.agg(count(lit(1)).as("__rows"),
          rest.map { case (n, _) => count(col(n)).as(s"__nn_$n") }: _*)
        .select(inline(array(rest.map { case (n, i) =>
          struct(lit(n).as("c"), lit(i).as("i"),
            (col("__rows") - col(s"__nn_$n")).as("nulls"),
            lit(null).cast("long").as("distincts"),
            lit(null).cast("string").as("min_val"),
            lit(null).cast("string").as("max_val"))
        }: _*))))
    val channels =
      channel(ofType(isIntegral), _.cast("long"), asString) ++
      channel(ofType(_ == StringType), identity, asString) ++
      channel(ofType(_ == DateType), identity, asString) ++
      channel(ofType(_ == BooleanType), identity, asString) ++
      byExactType(_.isInstanceOf[DecimalType], asString) ++
      // raw micros for distinctness; min/max through the date of the
      // extreme value (monotone, so min-of-dates == date-of-min)
      channel(ofType(isTs), c => unix_micros(c.cast("timestamp")),
        Some(c => to_date(timestamp_micros(c)).cast("string"))) ++
      channel(ofType(isFloat), _.cast("double"), None) ++
      byExactType(t => t == BinaryType || t.isInstanceOf[ArrayType] ||
        t.isInstanceOf[StructType], None) ++
      restChannel
    require(channels.nonEmpty, "empty schema")
    val dtypes = map(fields.flatMap { case (f, _) =>
      Seq(lit(f.name), lit(f.dataType.simpleString))
    }.toSeq: _*)
    channels.reduce(_ unionByName _)
      .orderBy("i")
      .select(col("c").as("col_name"), element_at(dtypes, col("c")).as("dtype"),
        col("nulls"), col("distincts"), col("min_val"), col("max_val"))
  }
}
