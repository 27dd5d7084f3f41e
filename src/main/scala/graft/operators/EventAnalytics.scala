package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over (user, ts, type) logs: cohort retention,
  * type-transition counts, rolling distinct actives. Each is a
  * shuffle-minimal lowering — per-user set/array state bounded by that
  * user's activity, never a corpus-wide window — and all-integer (dates
  * and counts), so every result is engine-portable and
  * DuckDB-oracle-able bit-for-bit.
  *
  * Null hygiene: rows with a null timestamp (and, for transitions, a
  * null type) are excluded up front. SQL replays of these ops (the
  * oracles) drop nulls through `min`/`lag`-skipping/`WHERE` in ways
  * Spark's `collect_set`/`sort_array` do not mirror — filtering at the
  * scan makes both engines see the same stream.
  */
object EventAnalytics {

  /** The shared per-user active-day state: ONE shuffle (mergeable
    * `collect_set` union, duplicate days collapse map-side before
    * anything moves). Both date-grained ops below start here. */
  /** Documented-integral inputs fail FAST on a fractional or string
    * column: a silent cast("long") nulls strings (dropping rows) and
    * truncates doubles (colliding distinct values) with no error. */
  private def requireIntegral(df: DataFrame, c: Column, what: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val t = df.select(c.as("__probe")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$what must be an integral column (got $t); " +
        "cast or quantize explicitly before passing")
  }

  // a null user is NOT a user: grouping null-user rows together would
  // stitch unrelated anonymous events into one synthetic timeline and
  // fabricate transitions/retention no real user produced (topPaths
  // already filtered; the per-user kernels now agree)
  private def perUserDays(events: DataFrame, user: Column,
                          ts: Column): DataFrame =
    events.filter(ts.isNotNull && user.isNotNull)
      .select(user.as("user_id"), to_date(ts).as("d"))
      .groupBy("user_id").agg(collect_set(col("d")).as("days"))

  /** Cohort retention matrix: users bucketed by the DATE of their first
    * event (the cohort), counted once per `(cohort, day-offset)` they
    * were active on. The classic product-analytics retention triangle.
    *
    * Plan shape: [[perUserDays]] is the only real shuffle; cohort (the
    * set min) and offsets derive per row with array algebra, and the
    * final rollup is metadata-sized (cohorts x offsets). A
    * distinct-then-join lowering would exchange the activity table
    * three times on different keys; this never re-shuffles it at all.
    * Nothing here is a window.
    */
  def cohortRetention(events: DataFrame, user: Column = col("user_id"),
                      ts: Column = col("ts")): DataFrame =
    perUserDays(events, user, ts)
      .select(array_min(col("days")).as("cohort"), explode(col("days")).as("d"))
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users"))

  /** First-order transition counts between consecutive event types per
    * user (the empirical Markov chain of the event stream): how often
    * type A is immediately followed by type B in some user's timeline.
    *
    * Per-user event order is (ts, id) — deterministic under equal
    * timestamps. One shuffle (the per-user groupBy); consecutive pairs
    * form in a narrow zip projection over each user's sorted array, so
    * no self-join and no corpus-wide window. State is bounded by
    * per-user activity, like [[EventFunnel]].
    */
  def transitionCounts(events: DataFrame, user: Column = col("user_id"),
                       ts: Column = col("ts"), typ: Column = col("event_type"),
                       id: Column = col("event_id")): DataFrame = {
    val perUser = events
      .filter(ts.isNotNull && typ.isNotNull && user.isNotNull)
      .select(user.as("user_id"), unix_micros(ts).as("us"), id.as("eid"),
        typ.as("t"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("us"), col("eid"), col("t"))))
        .as("evs"))
      .select(transform(col("evs"), e => e.getField("t")).as("types"))
    perUser
      .select(explode(zip_with(
        slice(col("types"), lit(1), size(col("types")) - 1),
        slice(col("types"), lit(2), size(col("types")) - 1),
        (a, b) => struct(a.as("from_type"), b.as("to_type")))).as("tr"))
      .groupBy(col("tr.from_type").as("from_type"),
        col("tr.to_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Gap-filled (densified) daily series: per-group event counts with
    * an explicit ZERO row for every calendar day the group was silent,
    * over the table's full [min, max] date span — downstream
    * time-series consumers (moving averages, trend fits, charting)
    * need the dense grid, and an outer join against a generated
    * calendar is the standard lowering.
    *
    * Scale shape: the sparse per-(group, day) counts are one
    * partial-aggregated shuffle; the calendar is `sequence`-generated
    * from a 1-row global span aggregate and cross-joined with the
    * DISTINCT group list — both metadata-sized (days x groups), so the
    * dense grid is built entirely from broadcast-scale frames and the
    * fact table is never re-read or re-shuffled for it. */
  def densifyDaily(events: DataFrame, group: Column = col("event_type"),
                   ts: Column = col("ts")): DataFrame = {
    val sparse = events.filter(ts.isNotNull && group.isNotNull)
      .groupBy(group.as("g"), to_date(ts).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val span = sparse.agg(min("d").as("d0"), max("d").as("d1"))
    val calendar = span
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val groups = sparse.select(col("g")).distinct()
    broadcast(calendar).crossJoin(broadcast(groups))
      .join(sparse, Seq("g", "d"), "left")
      .select(col("g"), col("d"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Top event paths (journey mining): the most common length-`n` runs
    * of consecutive event types across user timelines — the "what do
    * users actually do" product-analytics staple. ONE per-user shuffle
    * builds each timeline (types in `(ts, event_id)` order — the id
    * tiebreak keeps equal-timestamp runs deterministic), n-grams form
    * in a narrow projection (`slice` windows over the per-user array,
    * no self-join chain, no corpus window), counts partial-aggregate,
    * and the final top-k is TakeOrderedAndProject. Paths render as
    * `a>b>c` strings — callers with `>` inside type names pick a
    * different separator. */
  def topPaths(events: DataFrame, n: Int = 3, topK: Int = 50,
               sep: String = ">",
               user: Column = col("user_id"), ts: Column = col("ts"),
               typ: Column = col("event_type"),
               id: Column = col("event_id")): DataFrame = {
    require(n >= 2 && topK >= 1, s"n=$n topK=$topK")
    events
      .filter(user.isNotNull && ts.isNotNull && typ.isNotNull)
      .select(user.as("user_id"),
        struct(unix_micros(ts).as("us"), id.as("eid"), typ.as("t")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(transform(col("evs"), e => e.getField("t")).as("types"))
      .filter(size(col("types")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("types")) - lit(n - 1)),
        i => concat_ws(sep, slice(col("types"), i, lit(n))))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(topK)
  }

  /** Experiment readout: deterministic 50/50 assignment (md5 bucket of
    * the unit id — portable, uncorrelated with id order, the same hash
    * family the stratified sampler uses) crossed with funnel completion
    * ([[EventFunnel]] is the outcome stage). Emits the 2x2 table as
    * EXACT integers plus the two cross-product effect terms —
    * `uplift_num = s1*n0 - s0*n1` (sign = direction of variant 1's
    * conversion-rate difference) and `or_num = s1*f0 - s0*f1` (the
    * odds-ratio / chi-square numerator term) — and NO derived
    * statistic: every float stat (z, chi-square, CI) is a driver-side
    * O(1) formula over these counts, while emitting them as floats
    * would cost engine portability. Longs are exact to ~1e9 users per
    * arm. One row out; everything after the funnel's shuffle is a
    * metadata-sized aggregate. */
  def experimentReadout(events: DataFrame, steps: Seq[String],
                        maxGapMicros: Long,
                        user: Column = col("user_id")): DataFrame =
    experimentReadoutFrom(events,
      EventFunnel.funnel(events, steps, maxGapMicros, user = user),
      steps, user)

  /** [[experimentReadout]] starting from a precomputed
    * [[EventFunnel.funnel]] step-times table — same motivation as
    * [[funnelLatencyFrom]]: the funnel lands once, every readout
    * consumes it. */
  def experimentReadoutFrom(events: DataFrame, funnel: DataFrame,
                            steps: Seq[String],
                            user: Column = col("user_id")): DataFrame = {
    val users = events.filter(user.isNotNull)
      .select(user.as("user_id")).distinct()
      .withColumn("variant",
        conv(substring(md5(col("user_id").cast("string")), 1, 7), 16, 10)
          .cast("long") % 2)
    val converted = funnel
      .filter(col("steps_reached") === steps.length)
      .select(col("user_id"), lit(1L).as("conv"))
    users.join(converted, Seq("user_id"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("conv"), lit(0L))).as("s"))
      .agg(
        // an empty hash arm (possible on tiny cohorts) is a 0-count
        // arm, not a null one — the exact-integer output contract
        coalesce(sum(when(col("variant") === 0, col("n"))), lit(0L)).as("n0"),
        coalesce(sum(when(col("variant") === 0, col("s"))), lit(0L)).as("s0"),
        coalesce(sum(when(col("variant") === 1, col("n"))), lit(0L)).as("n1"),
        coalesce(sum(when(col("variant") === 1, col("s"))), lit(0L)).as("s1"))
      .select(col("n0"), col("s0"), col("n1"), col("s1"),
        (col("s1") * col("n0") - col("s0") * col("n1")).as("uplift_num"),
        (col("s1") * (col("n0") - col("s0")) -
          col("s0") * (col("n1") - col("s1"))).as("or_num"))
  }

  /** Exact equi-depth bin cutoffs of a long column: cutoff `k` is the
    * `ceil(k*n/bins)`-th smallest value (equivalently, the smallest
    * value whose cumulative count reaches that rank) — exact order
    * statistics, no floats anywhere.
    *
    * TWO-PHASE, because a distinct-value histogram of a near-unique
    * column (cents, ids) is row-sized and a cumulative window over it
    * is a one-task scan of everything: range-bucket the values off a
    * 1-row min/max broadcast, take per-bucket counts (a bounded
    * summary), prefix-sum over the SUMMARY to locate each rank's
    * boundary bucket, then compute the rank's order statistic inside
    * that one bucket via a per-k `row_number` — only boundary buckets
    * ever sort, the [[graft.llm.Sampling.tokenBudgetMix]] discipline.
    * Equal values make the statistic well-defined regardless of
    * within-tie order. Returns a `bins`-row (k, cut) table. */
  def exactBins(df: DataFrame, value: Column, bins: Int,
                buckets: Int = 1024): DataFrame =
    exactBinsMulti(df, Seq("v" -> value), bins, buckets)
      .select(col("k"), col("cut"))

  /** [[exactBins]] for SEVERAL columns in one melted pass: the metrics
    * explode into (metric, v) rows up front, every later stage keys by
    * metric — one scan, one summary, one boundary pass for all of
    * them, instead of per-metric plan chains (the fixed per-stage cost
    * dominates when the metric table is small). Returns
    * (metric, k, cut). */
  def exactBinsMulti(df: DataFrame, metrics: Seq[(String, Column)],
                     bins: Int, buckets: Int = 1024): DataFrame = {
    require(bins >= 2 && buckets >= 1 && metrics.nonEmpty,
      s"bins=$bins buckets=$buckets metrics=${metrics.size}")
    // the percentileTrim discipline: a double metric would silently
    // truncate (prices in [0,1) all cut at 0) — quantize explicitly
    metrics.foreach { case (n, c) =>
      requireIntegral(df, c, s"exactBins metric '$n'") }
    val vals = df.select(explode(array(metrics.map { case (n, c) =>
        struct(lit(n).as("g"), c.cast("long").as("v"))
      }: _*)).as("e"))
      .select(col("e.g").as("g"), col("e.v").as("v"))
      .filter(col("v").isNotNull)
    rankStatistics(vals, bins, tag => expr(s"($tag * n + $bins - 1) div $bins"),
        buckets)
      .select(col("g").as("metric"), col("tag").as("k"), col("cut"))
  }

  /** The shared two-phase order-statistic core behind
    * [[exactBinsMulti]] and [[exactGroupQuantiles]]. `vals` is (g, v)
    * with v long; for each group and each tag in 1..nTags, finds the
    * exact `rankOf(tag)`-th smallest value (rankOf is evaluated with
    * `n` = the group's count in scope).
    *
    * Scale shape, stage by stage:
    *  - per-group min/max/count in one aggregation, broadcast back
    *    (group cardinality must be broadcastable);
    *  - range-bucket ids in decimal(38) arithmetic — a group whose
    *    values span more than a long (sentinels mixed with data) must
    *    not wrap the bucket order;
    *  - per-(group, bucket) counts with a prefix sum over that bounded
    *    summary locate each rank's boundary bucket;
    *  - the finish runs on the boundary bucket's VALUE HISTOGRAM, not
    *    its rows: per-(group, bucket, v) masses aggregate map-side, so
    *    a bucket holding a billion copies of one hot value contributes
    *    ONE histogram row, and the in-bucket cumulative window is
    *    bounded by the bucket's distinct-value count — never by its
    *    row count. The rank's cut is the smallest v whose in-bucket
    *    cumulative mass reaches the rank's offset. */
  private def rankStatistics(vals: DataFrame, nTags: Int,
                             rankOf: String => Column,
                             buckets: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructType, StructField, LongType,
      IntegerType}
    val spark = vals.sparkSession
    // EVERY intermediate of this algorithm past the input scans is
    // metadata-sized by construction (group stats = |groups| rows, the
    // phase-2 summary = |groups| x buckets cells after map-side
    // aggregation, the boundary spec = |groups| x tags rows), and group
    // cardinality is broadcast-sized BY CONTRACT (dashboard
    // dimensions). As a fully lazy plan those bounded tables cost far
    // more than they weigh: each broadcast build re-ran its producing
    // aggregation as its own multi-stage AQE job (the stats agg ran
    // twice — once under the bucket-bound join, once under the rank
    // targets), and the window+join that located boundary buckets added
    // two more exchanges over cell-count rows. Measured on q168 (one
    // group, cached input): 14 jobs at ~90 ms fixed cost each — the
    // scheduling overhead WAS the query. So the bounded tables are now
    // landed driver-side (the rfmScoresFromMetrics/GraphRank bounded
    // metadata-collect pattern) and the boundary spec is computed where
    // metadata-sized work belongs: two actions scan the input (stats,
    // cells), the spec walk is a driver loop over at most
    // |groups| x buckets cells, and phase 3 joins a LocalRelation spec
    // whose broadcast build launches nothing. Identical output — the
    // cut law (smallest v whose cumulative mass reaches the rank) is
    // untouched; only where the bounded tables materialize changed.
    val statsAgg = vals.groupBy("g").agg(min("v").as("v0"),
      max("v").as("v1"), count(lit(1)).as("n"))
    val statsRows = statsAgg.collect()
    val stats = spark.createDataFrame(
      java.util.Arrays.asList(statsRows: _*), statsAgg.schema)
    // Overflow-safe LONG bucketing — the shared
    // [[BucketMath.halfSpanBucketSql]] form: wrap-safe on Long-wide
    // group spans, monotone in v, equal values share a bucket; bucket
    // boundaries don't have to be evenly placed, just ordered.
    val bucketExpr = expr(BucketMath.halfSpanBucketSql("v", "v0", "v1", buckets))
    val bucketed = vals.join(broadcast(stats), Seq("g"))
      .withColumn("b", bucketExpr)
      .select(col("g"), col("v"), col("b"))
    // phase 2: (g, bucket) counts — a narrow projection feeding one
    // map-side-combined shuffle of bucket cells, NOT a per-value
    // histogram of the whole input (measured ~2x slower end-to-end);
    // the bounded cell table lands driver-side
    val cellRows = bucketed.groupBy("g", "b").agg(count(lit(1)).as("c"))
      .collect()
    // rank targets: rankOf is an arbitrary Column over (n, tag), so it
    // evaluates through Catalyst — but over a LocalRelation, which
    // ConvertToLocalRelation folds (Project+Filter), so this collect
    // launches no job
    // schema care: g and the cut (= v) must keep the INPUT's exact type
    // and nullability — the landed result replaces a plan whose output
    // schema derived from vals, and the driver's oracle gate compares
    // schemas bit-for-bit (a non-null cut would tighten a consumer's
    // derived column and fail the schema check)
    val gField = vals.schema("g")
    val vField = vals.schema("v")
    val tagSchema = StructType(Seq(gField,
      StructField("n", LongType, nullable = false),
      StructField("tag", IntegerType, nullable = false)))
    val tagRows: Seq[Row] = statsRows.toIndexedSeq.flatMap(r =>
      (1 to nTags).map(t => Row(r.get(0), r.getLong(3), t)))
    import scala.jdk.CollectionConverters._
    val targetRows = spark.createDataFrame(tagRows.asJava, tagSchema)
      .withColumn("target", rankOf("tag"))
      .filter(col("target") >= 1)
      .select(col("g"), col("tag"), col("target"))
      .collect()
    // boundary spec, the former window+join now a driver walk: per
    // group, cells in bucket order accumulate mass; each rank's
    // boundary bucket is the FIRST whose cumulative count reaches the
    // target, and `need` is the rank's offset inside it — exactly the
    // min_by(cum >= target) law. A null group never joined (inner join
    // on g), so it never specs.
    val cellsByG = cellRows.filter(_.get(0) != null).groupBy(_.get(0))
      .map { case (g, cs) => g -> cs.sortBy(_.getLong(1)) }
    val specRows = new scala.collection.mutable.ArrayBuffer[Row]
    targetRows.filter(_.get(0) != null).foreach { t =>
      cellsByG.get(t.get(0)).foreach { cells =>
        val target = t.getLong(2)
        var cum = 0L
        var i = 0
        var done = false
        while (i < cells.length && !done) {
          val c = cells(i).getLong(2)
          cum += c
          if (cum >= target) {
            specRows += Row(t.get(0), cells(i).getLong(1), t.getInt(1),
              target - (cum - c))
            done = true
          }
          i += 1
        }
      }
    }
    val specSchema = StructType(Seq(gField,
      StructField("b", LongType, nullable = false),
      StructField("tag", IntegerType, nullable = false),
      StructField("need", LongType, nullable = false)))
    val spec = spark.createDataFrame(specRows.asJava, specSchema)
    // phase 3: ONLY boundary-bucket rows survive the broadcast join,
    // then collapse to the bucket's VALUE HISTOGRAM map-side — a
    // bucket holding a billion copies of one hot value contributes one
    // histogram row per (tag, value), so the histogram is bounded by
    // the bucket's distinct-value count, never its row count. The
    // in-bucket cumulative walk (formerly a window whose single task
    // buffered the same bounded histogram) runs driver-side over the
    // landed rows, and the RESULT is a LocalRelation — every consumer
    // (pct joins, crossJoin broadcasts, rfm's cutoff collect) reuses
    // the landed cuts with no broadcast-build job.
    val histRows = bucketed.join(broadcast(spec), Seq("g", "b"))
      .groupBy("g", "tag", "need", "v").agg(count(lit(1)).as("mass"))
      .collect()
    val cutRows = histRows.groupBy(r => (r.get(0), r.getInt(1)))
      .flatMap { case ((g, tag), hs) =>
        val sorted = hs.sortBy(_.getLong(3)) // v asc
        val need = sorted.head.getLong(2)
        var cum = 0L
        sorted.find { h => cum += h.getLong(4); cum >= need }
          .map(h => Row(g, tag, h.getLong(3)))
      }.toSeq
    val cutSchema = StructType(Seq(gField,
      StructField("tag", IntegerType, nullable = false),
      StructField("cut", vField.dataType, vField.nullable)))
    spark.createDataFrame(cutRows.asJava, cutSchema)
  }

  /** Exact per-group percentiles (order statistics) WITHOUT buffering
    * groups: Spark's exact `percentile` aggregate materializes every
    * group's values in one buffer (the q47 surface — fine until a
    * group outgrows an executor), and the GK sketch trades exactness
    * for mergeability. This is the third point on that curve: exact
    * answers through the [[exactBinsMulti]] two-phase shape with the
    * group key threaded through — per-(group, bucket) summaries,
    * prefix sums over the summary, rank order-statistics computed only
    * inside boundary buckets. `pct` targets rank `ceil(p*n_g/100)`
    * (quantile_disc semantics, exact integers end to end).
    *
    * Cardinality contract: the group-stats and boundary-spec tables
    * broadcast, so group cardinality must be dashboard-dimension-sized
    * (thousands); for per-key order stats beyond that, use
    * [[graft.llm.Sketches.approxQuantiles]]. */
  def exactGroupQuantiles(df: DataFrame, group: Column, value: Column,
                          percents: Seq[Int],
                          buckets: Int = 1024): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents=$percents")
    require(percents.distinct.size == percents.size, s"$percents")
    val vals = df.select(group.as("g"), value.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val pctArr = typedLit(percents)
    rankStatistics(vals, percents.size,
        tag => expr(s"(element_at(${pctLitSql(percents)}, CAST($tag AS INT))" +
          s" * n + 99) div 100"),
        buckets)
      .withColumn("pct", element_at(pctArr, col("tag").cast("int")))
      .select(col("g"), col("pct"), col("cut"))
  }

  private def pctLitSql(ps: Seq[Int]): String =
    ps.mkString("array(", ", ", ")")

  /** Exact per-row rank transform — [[exactGroupQuantiles]]' inverse
    * direction (quantile-NORMALIZE every row instead of cutting named
    * percentiles): each surviving row gains `rank` (SQL `rank()`
    * semantics — 1 + the count of strictly smaller values in its group;
    * ties share the min rank) and `n_group`, the feature-preprocessing
    * primitive behind rank/quantile normalization and exact percentile
    * scores. Rows with a null group or value are excluded.
    *
    * Scale shape — NEVER a per-group window over the rows (one hot
    * group = one task): the group's value domain range-buckets off a
    * broadcast min/max (overflow-safe half-span widths, the
    * rankStatistics form), per-(group, bucket) counts prefix into
    * bucket offsets over the metadata-sized summary, and the in-bucket
    * window ranks only a 1/buckets slice of any group. Equal values
    * land in equal buckets, so offset + in-bucket rank IS the global
    * min-rank. Group stats broadcast — same dashboard-dimension
    * cardinality contract as [[exactGroupQuantiles]]. */
  def rankTransform(df: DataFrame, group: Column, value: Column,
                    buckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1, s"buckets=$buckets")
    // the percentileTrim discipline: a double value would silently
    // truncate and merge distinct ranks — quantize explicitly
    requireIntegral(df, value, "rankTransform value")
    // reserved internals must not silently collide with input columns
    // (the kmvRollup __h lesson): fail loudly instead
    Seq("__g", "__v", "__b", "__c", "__off", "v0", "v1", "rank", "n_group")
      .foreach(r => require(!df.columns.contains(r),
        s"rankTransform reserves the column name $r; rename the input column"))
    val outCols = df.columns.toSeq.map(col)
    val base = df.filter(group.isNotNull && value.isNotNull)
      .withColumn("__g", group).withColumn("__v", value.cast("long"))
    val stats = base.groupBy("__g").agg(min("__v").as("v0"),
      max("__v").as("v1"), count(lit(1)).as("n_group"))
    val bucketExpr =
      expr(BucketMath.halfSpanBucketSql("__v", "v0", "v1", buckets))
    val bucketed = base.join(broadcast(stats), "__g")
      .withColumn("__b", bucketExpr)
    val offsets = bucketed.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy("__g").orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__g"), col("__b"), col("__off"))
    val wIn = Window.partitionBy("__g", "__b").orderBy("__v")
    bucketed.join(broadcast(offsets), Seq("__g", "__b"))
      .withColumn("rank", col("__off") + rank().over(wIn).cast("long"))
      .select(outCols ++ Seq(col("rank"), col("n_group")): _*)
  }

  /** Funnel step-latency report: for each completed funnel transition,
    * the exact whole-second latency percentiles — "how long do users
    * take between steps" as order statistics, not means (latencies are
    * heavy-tailed; the median and p90 are the readout). Composes X45's
    * funnel (per-user step times, one shuffle) with
    * [[exactGroupQuantiles]] over the melted (transition, seconds)
    * pairs; only users who REACHED each pair of steps contribute to
    * that transition. */
  def funnelLatency(events: DataFrame, steps: Seq[String],
                    maxGapMicros: Long,
                    percents: Seq[Int] = Seq(25, 50, 90)): DataFrame =
    funnelLatencyFrom(EventFunnel.funnel(events, steps, maxGapMicros),
      steps, percents)

  /** [[funnelLatency]] starting from a precomputed [[EventFunnel.funnel]]
    * step-times table — the entry point when the funnel already landed
    * (in production every downstream report reads the one funnel table;
    * re-deriving it per report would re-scan events each time). */
  def funnelLatencyFrom(f: DataFrame, steps: Seq[String],
                        percents: Seq[Int] = Seq(25, 50, 90)): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps: $steps")
    val deltas = f.select(explode(array((0 until steps.size - 1).map { i =>
      struct(lit(s"${steps(i)}->${steps(i + 1)}").as("transition"),
        expr(s"(t_${i + 1} - t_$i) div 1000000L").as("secs"))
    }: _*)).as("e"))
      .select(col("e.transition").as("transition"), col("e.secs").as("secs"))
      .filter(col("secs").isNotNull)
    exactGroupQuantiles(deltas, col("transition"), col("secs"), percents)
      .select(col("g").as("transition"), col("pct"), col("cut").as("secs"))
  }

  /** RFM (recency / frequency / monetary) customer scoring — the
    * marketing-segmentation staple, kept engine-portable: metrics are
    * exact integers (whole days via integral `div`, cents via
    * `floor(v*100+0.5)`), bins come from [[exactBins]] equi-depth
    * cutoffs (1..bins ascending BY VALUE — so f/m high = heavy user,
    * r high = long-lapsed; flip client-side if preferred), and a
    * user's bin is the smallest cutoff at or above their metric. One
    * per-user shuffle builds the metrics; the three cutoff tables are
    * histogram-sized plans broadcast back — users never re-shuffle for
    * scoring. The observation horizon is the corpus' max event time
    * (one bounded 1-row collect — the driver-literal discipline: a
    * crossJoin'd horizon column re-scanned events once per consuming
    * subtree), so "recency" is data-relative and reproducible. */
  def rfmScores(events: DataFrame, purchaseType: String = "purchase",
                bins: Int = 5,
                user: Column = col("user_id"), ts: Column = col("ts"),
                typ: Column = col("event_type"),
                value: Column = col("value")): DataFrame = {
    // the user-metrics table feeds every branch of the melted cutoff
    // computation; persisting it for that multi-branch collect keeps
    // the event scan + per-user shuffle to one execution there. It is
    // unpersisted before returning (no residency left behind), so the
    // caller's eventual action recomputes metrics once from events —
    // one scan, the deliberate trade. Production pipelines LAND the
    // metrics table instead and score through [[rfmScoresFromMetrics]].
    val metrics = rfmMetrics(events, purchaseType, user, ts, typ, value)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = rfmScoresFromMetrics(metrics, bins)
    metrics.unpersist()
    out
  }

  /** [[rfmScores]]' METRICS half: the per-user
    * (user_id, recency_days, frequency, monetary_cents) table — the
    * landed artifact every RFM pipeline maintains (one per-user shuffle
    * over events per refresh, every scoring/binning report a reader). */
  def rfmMetrics(events: DataFrame, purchaseType: String = "purchase",
                 user: Column = col("user_id"), ts: Column = col("ts"),
                 typ: Column = col("event_type"),
                 value: Column = col("value")): DataFrame = {
    // observation horizon as a driver-side literal: one bounded 1-row
    // agg (the GraphRank metadata-collect pattern). The broadcast-
    // crossJoin alternative re-ran this full event scan inside EVERY
    // consuming subtree of the (unpersisted) metrics plan.
    val hRow = events.filter(ts.isNotNull)
      .agg(max(unix_micros(ts)).as("h_us")).head()
    // an all-null-ts corpus has no metric rows either — any literal works
    val hUs = if (hRow.isNullAt(0)) 0L else hRow.getLong(0)
    events
      .filter(typ === purchaseType && user.isNotNull && ts.isNotNull &&
        value.isNotNull)
      .select(user.as("user_id"), unix_micros(ts).as("us"),
        floor(value.cast("double") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("frequency"),
        sum("cents").as("monetary_cents"))
      .withColumn("recency_days",
        expr(s"(${hUs}L - last_us) div 86400000000L"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"))
  }

  /** [[rfmScores]]' SCORING half over a PRECOMPUTED metrics table —
    * the production entry point (the [[funnelLatencyFrom]] pattern):
    * the landed per-user metrics are read by every binning report
    * instead of re-scanning events per report. Equal to [[rfmScores]]
    * by construction (the one-shot form delegates here). */
  def rfmScoresFromMetrics(metrics: DataFrame, bins: Int = 5): DataFrame = {
    // The cutoff table is bounded metadata (metrics x bins rows — 15
    // here), so it collects ONCE and scores ride the plan as literal
    // arrays: bin = 1 + |cuts strictly below the metric| is a pure
    // projection, no joins, no re-execution of the cutoff chain per
    // metric (measured 3-5x faster than three broadcast-join scorings,
    // whose each broadcast re-ran the whole melted cutoff plan).
    val cutRows = exactBinsMulti(metrics, Seq(
      "recency_days" -> col("recency_days"),
      "frequency" -> col("frequency"),
      "monetary_cents" -> col("monetary_cents")), bins)
      .collect()
    val cutsFor: Map[String, Seq[Long]] = cutRows
      .groupBy(_.getString(0))
      .map { case (m, rs) =>
        m -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    def binExpr(metric: String): Column = {
      val cs = cutsFor.getOrElse(metric, Seq.empty)
      // empty cutoffs == empty metrics table: zero rows flow, any bin
      // expression is fine — keep the projection well-typed
      if (cs.isEmpty) lit(1).cast("int")
      else (size(filter(typedLit(cs), c => c < col(metric))) + 1).cast("int")
    }
    metrics
      .withColumn("r_bin", binExpr("recency_days"))
      .withColumn("f_bin", binExpr("frequency"))
      .withColumn("m_bin", binExpr("monetary_cents"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_bin"), col("f_bin"), col("m_bin"))
  }

  /** Single-changepoint detection over the densified daily series: the
    * split day maximizing the between-segment mean difference
    * `|S_t/t - (S-S_t)/(n-t)|` — the classic CUSUM-style "when did
    * this metric shift" readout. The comparison ratio is
    * `num/den` with EXACT integer num = `|S_t*(n-t) - (S-S_t)*t|` and
    * den = `t*(n-t)`; the double division is the one float (identical
    * long->double arithmetic in any engine, so the argmax replays),
    * ties to the earliest day, and the exact num/den ship in the
    * output. Windows run per group over DAYS (domain-bounded, the
    * densify grid), never over events; `change_day` is the last day of
    * the left segment. Groups with a single day emit nothing (no valid
    * split). */
  def changepoint(events: DataFrame, group: Column = col("event_type"),
                  ts: Column = col("ts")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dense = densifyDaily(events, group, ts)
    val wOrd = Window.partitionBy("g").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("g")
    val scored = dense
      .withColumn("t", count(lit(1)).over(
        Window.partitionBy("g").orderBy("d")))
      .withColumn("st", sum("cnt").over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum("cnt").over(wAll))
      .filter(col("t") < col("n")) // a split needs a non-empty right side
      .withColumn("num", abs(col("st") * (col("n") - col("t")) -
        (col("s") - col("st")) * col("t")))
      .withColumn("den", col("t") * (col("n") - col("t")))
      .withColumn("ratio",
        col("num").cast("double") / col("den").cast("double"))
    scored.groupBy("g")
      .agg(max_by(struct(col("d"), col("num"), col("den"), col("n")),
        struct(col("ratio"), lit(-1) * col("t"))).as("best"))
      .select(col("g"), col("best.d").as("change_day"),
        col("best.num").as("shift_num"), col("best.den").as("shift_den"),
        col("best.n").as("n_days"))
  }

  /** Day-of-week seasonality profile over the densified series: per
    * (group, ISO weekday) the exact integer seasonality index
    * `idx_e6 = sum_dow * n_total * 1e6 div (n_dow * sum_total)` —
    * the un-logged ratio of the weekday's mean to the group's overall
    * mean (1e6 = flat). Everything aggregates over the day grid
    * (domain-bounded); decimal(38) keeps the cross-product exact far
    * past any real span. Weekday is ISO (1 = Monday .. 7 = Sunday). */
  def weekdayProfile(events: DataFrame, group: Column = col("event_type"),
                     ts: Column = col("ts")): DataFrame = {
    val dense = densifyDaily(events, group, ts)
      .withColumn("dow", weekday(col("d")) + lit(1))
    val per = dense.groupBy("g", "dow")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("sum_cnt"))
    val tot = dense.groupBy("g")
      .agg(count(lit(1)).as("n_tot"), sum("cnt").as("sum_tot"))
    per.join(broadcast(tot), Seq("g"))
      .filter(col("sum_tot") > 0)
      .withColumn("idx_e6", expr(
        "CAST(sum_cnt AS DECIMAL(38,0)) * n_tot * 1000000" +
          " div (CAST(n_days AS DECIMAL(38,0)) * sum_tot)"))
      .select(col("g"), col("dow"), col("n_days"), col("sum_cnt"),
        col("idx_e6"))
  }

  /** Segment-overlap matrix via bitmap algebra — the audience-overlap
    * kernel: each segment's distinct-user set lives as a bitmap
    * (64 users per word; `words = user-id domain / 64` rows per
    * segment, built with one map-side-combined `bit_or`), and pairwise
    * overlap = popcount of the word-wise AND — users shuffle ONCE into
    * bitmaps, and every subsequent set operation (here |segments|^2
    * intersections; union/difference work the same way) runs on the
    * word tables, never re-touching users. Only pairs with >= 1 common
    * user emit (pairs sharing no bitmap word never meet the join).
    * Requires non-negative integral user ids — enforced: a negative id
    * fails the job loudly (`u div 64` truncates toward zero, so -1
    * would land in word 0 / bit 63 and silently collide with user 63,
    * inflating overlaps instead of erroring). */
  def segmentOverlap(events: DataFrame, segment: Column = col("event_type"),
                     user: Column = col("user_id")): DataFrame = {
    // the negative-id guard below only sees values that SURVIVE the
    // long cast — a string id would cast to null (dropping every user
    // silently) and a double would truncate 3.2 and 3.9 onto one bit;
    // refuse non-integral id columns outright instead
    requireIntegral(events, user, "segmentOverlap user ids")
    val bitmaps = events
      .filter(segment.isNotNull && user.isNotNull)
      .select(segment.as("seg"), user.cast("long").as("u")).distinct()
      .select(col("seg"), when(col("u") < 0, raise_error(concat(
          lit("segmentOverlap requires non-negative user ids, got "),
          col("u")))).otherwise(col("u")).as("u"))
      .select(col("seg"), expr("u div 64").as("word"),
        expr("shiftleft(1L, CAST(pmod(u, 64) AS INT))").as("mask"))
      .groupBy("seg", "word").agg(expr("bit_or(mask)").as("bits"))
    val a = bitmaps.select(col("seg").as("type_a"), col("word"),
      col("bits").as("ba"))
    val b = bitmaps.select(col("seg").as("type_b"), col("word"),
      col("bits").as("bb"))
    a.join(b, Seq("word"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(bit_count(col("ba").bitwiseAND(col("bb")))).as("overlap"))
      .filter(col("overlap") > 0)
  }

  /** Time-weighted average (TWAP) of an irregular series: each
    * observation's value holds until the next observation, so the mean
    * is `sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)` — the
    * standard finance/telemetry integral, NOT the row mean (a sensor
    * that reports 1000x/min while healthy must not drown the hours it
    * spent failing). Values quantize to exact `floor(v * 1e6 + 0.5)`
    * integers first, so the numerator is an exact decimal sum
    * (order-independent, engine-portable) and is EMITTED as num/den —
    * no division, same contract as [[dailyTrend]]. The numerator
    * renders as a string: its magnitude (duration-microseconds x
    * micro-units) exceeds int64, and a decimal-vs-HUGEINT column would
    * not survive a cross-engine stringify.
    *
    * Lowering: per-group ordered neighbor access is the one thing a
    * flat aggregation can't do, and a per-group window funnels the
    * whole group through one task — so the integral splits on time
    * buckets: within-bucket terms from a sorted per-(group, bucket)
    * array (zip-consecutive, one shuffle), cross-bucket boundary terms
    * from a `lead` window over the BUCKET SUMMARY (one row per
    * non-empty bucket — a gap of empty buckets correctly bills its
    * whole span to the last observation before it). `bucketUs` trades
    * per-task array size against summary size; both ends are bounded.
    *
    * Degenerate groups: a group with one observation (or all
    * observations at a single timestamp) has no time span, so its row
    * ships `twap_den = 0` — the caller's `num/den` division MUST guard
    * it (there is no time-weighted average of a point; the group's
    * plain value is in `twap_num`'s single term). Emitting the row
    * beats dropping it: the caller sees the group exists. */
  def twap(events: DataFrame, bucketUs: Long = 86400000000L,
           group: Column = col("event_type"), ts: Column = col("ts"),
           value: Column = col("value"),
           id: Column = col("event_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketUs > 0, s"bucketUs=$bucketUs")
    val rows = events
      .filter(group.isNotNull && ts.isNotNull && value.isNotNull)
      .select(group.as("g"), unix_micros(ts).as("us"), id.as("eid"),
        floor(value.cast("double") * lit(1e6) + lit(0.5)).cast("long")
          .as("vs"))
      .withColumn("b", expr(s"us div ${bucketUs}L"))
    val dec0 = lit(0).cast("decimal(38,0)")
    val perBucket = rows
      .groupBy("g", "b")
      .agg(sort_array(collect_list(struct(col("us"), col("eid"),
        col("vs")))).as("a"), count(lit(1)).as("cnt"))
      .select(col("g"), col("b"), col("cnt"),
        aggregate(
          zip_with(
            slice(col("a"), lit(1), greatest(size(col("a")) - 1, lit(0))),
            slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
            (x, y) => (y.getField("us") - x.getField("us"))
              .cast("decimal(38,0)") * x.getField("vs")),
          dec0, (acc, t) => acc + t).as("local_num"),
        element_at(col("a"), 1).getField("us").as("first_us"),
        element_at(col("a"), -1).getField("us").as("last_us"),
        element_at(col("a"), -1).getField("vs").as("last_vs"))
    val wNext = Window.partitionBy("g").orderBy("b")
    perBucket
      .withColumn("next_first", lead(col("first_us"), 1).over(wNext))
      .groupBy("g")
      .agg(sum("cnt").as("n_events"),
        (coalesce(sum(col("local_num")), dec0) +
          coalesce(sum(when(col("next_first").isNotNull,
            (col("next_first") - col("last_us")).cast("decimal(38,0)") *
              col("last_vs"))), dec0)).as("num"),
        (max("last_us") - min("first_us")).as("twap_den"))
      .select(col("g"), col("n_events"),
        col("num").cast("string").as("twap_num"), col("twap_den"))
  }

  /** Per-group daily-volume trend: exact ordinary-least-squares slope of
    * each group's event count against the day index, over the DENSIFIED
    * series ([[densifyDaily]] — silent days regress as true zeros, the
    * difference between "volume fell" and "volume stopped being
    * reported"). The closed-form OLS slope
    * `(n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)` is emitted as its EXACT
    * integer numerator and denominator — no division at all, because
    * floor-vs-truncate integer division diverges across engines for the
    * negative numerators a falling trend produces. Clients (and the
    * oracle) divide however they like; sign(slope_num) is the trend
    * verdict as-is, since the denominator is nonnegative by
    * Cauchy-Schwarz.
    *
    * Plan shape: densify's one sparse shuffle + broadcast grid, then a
    * per-group aggregate of four running sums — x is `datediff` from
    * the global min day (in the grid already), so no window and no
    * second pass anywhere. Sums fit long arithmetic far past 100 TB:
    * Sxy <= days^2 * max_daily_count ~ 1e8 * 1e10 at a 30-year span. */
  def dailyTrend(events: DataFrame, group: Column = col("event_type"),
                 ts: Column = col("ts")): DataFrame = {
    val dense = densifyDaily(events, group, ts)
    val d0 = dense.agg(min("d").as("d0"))
    dense.crossJoin(broadcast(d0))
      .withColumn("x", datediff(col("d"), col("d0")).cast("long"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"),
        sum("cnt").as("sum_y"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("cnt")).as("sxy"))
      .select(col("g"), col("n_days"), col("sum_y"),
        (col("n_days") * col("sxy") - col("sx") * col("sum_y"))
          .as("slope_num"),
        (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
  }

  /** Censored time-to-conversion life table (the Kaplan–Meier input):
    * for each user who emitted `startType`, the whole days until their
    * first qualifying `endType` (strictly after the start, within
    * `maxGapMicros` of it — [[EventFunnel]] semantics; the funnel IS
    * the per-user stage), or until the observation horizon (the
    * table's max event time) if they never converted — a censored
    * observation, not a missing one. Rows are per day: `at_risk`
    * (users still unconverted and observable entering the day),
    * `converted`, `censored`. Survival estimates are a trivial
    * client-side product over these integer counts; keeping the output
    * at the count level keeps it exact and engine-portable.
    *
    * Plan shape: the funnel's one per-user shuffle, a 1-row horizon
    * aggregate broadcast in, a day-granularity groupBy, and the
    * reverse-cumulative `at_risk` window over the LIFE TABLE — bounded
    * by the day domain like [[graft.llm.TextAnalysis.percentileTrim]]'s
    * histogram window, never over users. */
  def conversionLifeTable(events: DataFrame, startType: String,
                          endType: String, maxGapMicros: Long,
                          user: Column = col("user_id"),
                          ts: Column = col("ts"),
                          typ: Column = col("event_type"),
                          id: Column = col("event_id")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val fn = EventFunnel.funnel(events, Seq(startType, endType),
      maxGapMicros, user, ts, typ, id)
    val horizon = events.filter(ts.isNotNull)
      .agg(max(unix_micros(ts)).as("h_us"))
    val durations = fn.crossJoin(broadcast(horizon))
      .select(
        expr(s"coalesce(t_1, h_us) - t_0").as("dur_us"),
        col("t_1").isNotNull.cast("long").as("c"))
      .select(expr(s"dur_us div $dayUs").as("day"), col("c"))
    val lifeRows = durations.groupBy("day")
      .agg(sum(col("c")).as("converted"),
        (count(lit(1)) - sum(col("c"))).as("censored"))
    // at_risk(d) = everyone who leaves (converts or censors) on day >= d:
    // a reverse running sum over the day histogram (bounded by the
    // observation span in days, metadata-sized by nature)
    val atRisk = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lifeRows.select(col("day"),
      sum(col("converted") + col("censored")).over(atRisk).as("at_risk"),
      col("converted"), col("censored"))
  }

  /** Per-slice distribution drift: for every slice (default: the event
    * DATE), the exact total-variation distance of its group mix
    * (default: event type) from the corpus-wide baseline mix — the
    * pipeline-monitoring signal that a day's traffic, a crawl
    * snapshot's language mix, or a shard's label mix has shifted.
    * `TVD = drift_num / (2 * n * N)`; the numerator
    * `sum_g |c_sg * N - C_g * n_s|` and both denominator factors are
    * exact integers, so the report is engine-portable bit-for-bit and
    * the ordering by drift is exact (same denominator scale per slice
    * only when n_s is equal — consumers ranking across slices divide
    * client-side). Long arithmetic holds to ~3e9 corpus rows per cell
    * product (`c * N < 2^63`); beyond that the products move to
    * decimal(38) unchanged in shape.
    *
    * Plan shape: ONE corpus shuffle (the sparse per-(slice, group)
    * count); baseline counts, slice totals, and the dense
    * slices x groups grid all re-aggregate or cross-join
    * METADATA-sized frames from it (groups and slices are enumerable
    * domains), broadcast back in. Absent cells matter (`|0 - C_g*n_s|`
    * contributes), which is why the grid is dense — same move as
    * [[densifyDaily]]. */
  def mixDrift(events: DataFrame, slice: Column = to_date(col("ts")),
               group: Column = col("event_type")): DataFrame = {
    val sparse = events.filter(slice.isNotNull && group.isNotNull)
      .groupBy(slice.as("d"), group.as("g"))
      .agg(count(lit(1)).as("c"))
    val perGroup = sparse.groupBy("g").agg(sum("c").as("cg"))
    val perSlice = sparse.groupBy("d").agg(sum("c").as("nd"))
    val total = sparse.agg(sum("c").as("n_total"))
    broadcast(perSlice).crossJoin(broadcast(perGroup))
      .join(sparse, Seq("d", "g"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("d"), col("nd").as("n"))
      .agg(sum(abs(coalesce(col("c"), lit(0L)) * col("n_total") -
        col("cg") * col("nd"))).as("drift_num"))
      .select(col("d"), col("n"), col("drift_num"))
  }

  /** Rolling `windowDays`-day distinct active users, reported for every
    * date that has at least one event: for date d, the number of
    * distinct users with an event in `[d - windowDays + 1, d]` (the
    * rolling WAU/MAU curve).
    *
    * Lowering: a rolling-DISTINCT frame can't partial-aggregate as a
    * window (every frame re-scans `windowDays` of global history in
    * one task), so each user's day set from [[perUserDays]] expands
    * with array algebra to the distinct report dates that user serves
    * (`flatten` the per-day windows, `array_distinct` so a user counts
    * ONCE per report date), and one plain count per date finishes it.
    * The report-date set (dates with >= 1 event — a calendar, tiny by
    * nature) aggregates straight off the scan projection and
    * broadcast-joins at the end. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int,
                         user: Column = col("user_id"),
                         ts: Column = col("ts")): DataFrame = {
    require(windowDays > 0, s"windowDays=$windowDays")
    val contrib = perUserDays(events, user, ts)
      .select(explode(array_distinct(flatten(transform(
        col("days"),
        d => sequence(d, date_add(d, windowDays - 1)))))).as("report_d"))
    val presentDays = events.filter(ts.isNotNull)
      .select(to_date(ts).as("report_d")).distinct()
    contrib.join(broadcast(presentDays), "report_d")
      .groupBy("report_d")
      .agg(count(lit(1)).as("active_users"))
  }

  /** Per-key union length of (possibly overlapping) intervals — the
    * classic gaps-and-islands aggregation: "how long was this user
    * active / this device up / this incident covered", counting
    * overlapping spans ONCE. Exact integer arithmetic over
    * `[start, end)` half-open long intervals (null endpoints, inverted
    * spans, AND zero-length intervals excluded — `[x, x)` is the empty
    * set, so it must neither count as an interval nor extend the
    * running max, where it could bridge two separate islands into one;
    * spans must fit a long — epoch-microsecond data is 48 bits,
    * nowhere near the edge).
    *
    * Shape: one shuffle on the key; the running max-end window is
    * partitioned BY KEY and ordered by (start, end), so its state is
    * bounded by that key's interval count, never the table — a per-row
    * contribution `max(0, end - max(start, prev_max_end))` sums to the
    * union length without materializing merged islands, and the sum is
    * tie-order invariant (equal (start, end) rows contribute through
    * the same running max). `n_islands` counts maximal merged runs
    * (a new island starts where start > prev_max_end). */
  def intervalCoverage(intervals: DataFrame, key: Column,
                       start: Column, end: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = intervals
      .filter(key.isNotNull && start.isNotNull && end.isNotNull &&
        end > start)
      .select(key.as("k"), start.as("s"), end.as("e"))
    val w = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows
      .withColumn("__pmax", max(col("e")).over(w))
      .select(col("k"),
        greatest(lit(0L),
          col("e") - greatest(col("s"), coalesce(col("__pmax"), col("s"))))
          .as("__c"),
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L).as("__i"))
      .groupBy("k")
      .agg(sum(col("__c")).as("covered"),
        sum(col("__i")).as("n_islands"),
        count(lit(1)).as("n_intervals"))
  }
}
