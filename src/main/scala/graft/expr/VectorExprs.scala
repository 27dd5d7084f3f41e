package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector math (SURVEY §2.11
  * tier-b extensions; the ANN/near-dup operators' hot path).
  *
  * Why native rather than `zip_with`/`aggregate` column algebra: Spark's
  * higher-order functions evaluate their lambda interpreted, one invocation
  * per array element, and a random-projection formulated as column algebra
  * is an `nPlanes x dim`-term expression tree that costs seconds of
  * optimizer + codegen time per query before the first row moves. Each
  * expression here is a single plan node wrapping a tight primitive loop,
  * shared verbatim between interpreted eval and `doGenCode`.
  *
  * All three accept `array<float>` or `array<double>` input; null array ->
  * null result; null elements are treated as 0 (embeddings have none).
  */
private[graft] object VecOps extends Serializable {

  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { if (!a.isNullAt(i)) out(i) = a.getFloat(i); i += 1 }
    else while (i < n) { if (!a.isNullAt(i)) out(i) = a.getDouble(i); i += 1 }
    out
  }

  /** Left-to-right accumulation — bit-identical to the previous
    * `aggregate(zip_with(...))` formulation (same op order). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def norm(a: ArrayData, aFloat: Boolean): Double =
    math.sqrt(dot(a, a, aFloat, aFloat))

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float>/array<double>, got $other")
  }

  def floatFlag(e: Expression): Boolean = isFloatArr(e)
}

/** Dot product of two numeric-array columns -> double. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  private lazy val lFloat = VecOps.floatFlag(left)
  private lazy val rFloat = VecOps.floatFlag(right)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lFloat, rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("vecOps", VecOps, "graft.expr.VecOps$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $ops.dot($a, $b, $lFloat, $rFloat);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** L2 norm of a numeric-array column -> double (single pass, array read once). */
case class VecNorm(child: Expression) extends UnaryExpression {
  private lazy val isFloat = VecOps.floatFlag(child)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any =
    VecOps.norm(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ctx.addReferenceObj("vecOps", VecOps, "graft.expr.VecOps$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ops.norm($a, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Random-hyperplane sign bits -> long bucket key: bit p is the sign of
  * the projection of the vector onto pseudo-random hyperplane p.
  *
  * Weights are precomputed once on the driver (`nPlanes * dim` doubles,
  * shipped with the serialized expression) using the same xxhash64-derived
  * formula the previous column-algebra formulation folded constant-by-
  * constant — identical buckets, but one plan node instead of an
  * `nPlanes x dim`-term tree.
  */
case class RpBits(child: Expression, dim: Int, nPlanes: Int) extends UnaryExpression {
  private lazy val isFloat = VecOps.floatFlag(child)

  /** weight(plane p, dimension d) = xxhash64(p*7919+d) % 1e6 / 1e6, the
    * exact per-constant value Catalyst folded in the old formulation. */
  private lazy val weights: Array[Double] = {
    val w = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var d = 0
      while (d < dim) {
        w(p * dim + d) = (XXH64.hashInt(p * 7919 + d, 42L) % 1000000L).toDouble / 1000000.0
        d += 1
      }
      p += 1
    }
    w
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rp_bits"

  def compute(a: ArrayData): Long = {
    val v = VecOps.toDoubles(a, isFloat)
    val n = math.min(v.length, dim)
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      val base = p * dim
      var d = 0
      while (d < n) { proj += v(d) * weights(base + d); d += 1 }
      if (proj >= 0) bits |= 1L << p
      p += 1
    }
    bits
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rpBits", this, "graft.expr.RpBits")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RpBits =
    copy(child = newChild)
}

/** Random projection to `outDim` doubles — the Johnson–Lindenstrauss
  * dimensionality reducer sharing [[RpBits]]'s exact weight law:
  * `weight(plane p, dim d) = xxhash64(p*7919+d, 42) % 1e6 / 1e6`
  * (Java `%` keeps the dividend's sign, so weights span (-1, 1) with
  * mean ~0 — a valid JL family). Each projection is the left-fold
  * multiply-add over dimensions, the same accumulation order a SQL
  * `list_reduce` replays, so projected values are bit-identical
  * cross-engine. [[RpBits]] IS this projection's sign pattern at
  * `outDim = nPlanes` — the two stay consistent by construction. */
case class RpProject(child: Expression, dim: Int, outDim: Int) extends UnaryExpression {
  private lazy val isFloat = VecOps.floatFlag(child)

  private lazy val weights: Array[Double] = {
    val w = new Array[Double](outDim * dim)
    var p = 0
    while (p < outDim) {
      var d = 0
      while (d < dim) {
        w(p * dim + d) = (XXH64.hashInt(p * 7919 + d, 42L) % 1000000L).toDouble / 1000000.0
        d += 1
      }
      p += 1
    }
    w
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rp_project"

  def compute(a: ArrayData): ArrayData = {
    val v = VecOps.toDoubles(a, isFloat)
    val n = math.min(v.length, dim)
    val out = new Array[Double](outDim)
    var p = 0
    while (p < outDim) {
      var proj = 0.0
      val base = p * dim
      var d = 0
      while (d < n) { proj += v(d) * weights(base + d); d += 1 }
      out(p) = proj
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rpProject", this, "graft.expr.RpProject")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): RpProject =
    copy(child = newChild)
}

/** Integer dot product of two `array<int>` columns -> long. The hot
  * kernel of quantized (int8) similarity search: products and the
  * accumulator are exact integers, so the result is bit-identical on any
  * engine regardless of accumulation order — which is what lets the
  * quantized ANN operator keep a full cross-engine oracle. */
case class VecDotInt(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "vec_dot_int"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_int expects two array<int> args, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDotInt.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VecDotInt.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotInt =
    copy(left = l, right = r)
}

object VecDotInt {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }
}

/** Argmax-cosine against a fixed centroid set, in ONE plan node:
  * `struct(cluster, cosine)` where `cluster` is the FIRST index attaining
  * the maximum cosine (ties to the smallest index — the k-means
  * assignment rule) and `cosine` that maximum.
  *
  * Bit-identical to the column-algebra formulation it replaces
  * (`array_position(sims, array_max(sims))` over k separate [[VecDot]]
  * columns, pinned by NativeExprSpec): per candidate the similarity is
  * `dot(v, c) / (sqrt(dot(v, v)) * sqrt(dot(c, c)))` with left-fold
  * accumulation, the input norm computed once. What changes is plan
  * cost, not values: k expression nodes + a k-array build + two k-array
  * scans per row collapse into a single tight loop, and the vector is
  * deserialized once instead of k times. A zero-norm input (no
  * direction, cosine undefined) deterministically yields
  * (cluster 0, cosine 0.0) instead of engine-dependent NaN ordering;
  * NaN elements are otherwise assumed absent.
  *
  * Centroid norms are precomputed once on the driver and ship with the
  * serialized expression, like [[RpBits]] weights.
  */
case class CentroidArgMax(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  private lazy val isFloat = VecOps.floatFlag(child)
  private lazy val norms: Array[Double] = centroids.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    math.sqrt(acc)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("cosine", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "centroid_argmax"

  def compute(a: ArrayData): Any = {
    val v = VecOps.toDoubles(a, isFloat)
    var nacc = 0.0
    var i = 0
    while (i < v.length) { nacc += v(i) * v(i); i += 1 }
    val nrm = math.sqrt(nacc)
    // a zero-norm vector has no direction: every cosine is 0/0. Define
    // it as (cluster 0, cosine 0.0) rather than letting NaN comparisons
    // pick an engine-dependent winner — deterministic, and downstream
    // thresholds (cosine >= tau) treat it as similar to nothing.
    if (nrm == 0.0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0.0))
    var best = Double.NegativeInfinity
    var bi = 0
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(v.length, cent.length)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += v(j) * cent(j); j += 1 }
      val sim = acc / (nrm * norms(c))
      if (sim > best) { best = sim; bi = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bi, best))
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centArgMax", this, "graft.expr.CentroidArgMax")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgMax =
    copy(child = newChild)
}

/** Product-quantization encoder: the vector's `m` subspace windows each
  * argmin-L2-matched against the codebook entries' SAME window —
  * codebook entries are stored FULL-LENGTH (they are corpus vectors or
  * Lloyd means of them), so window index `i` reads `v(i)` and
  * `cent(i)` identically on both sides of the distance, and the SQL
  * oracle can replay the windows by list index alone. Output: the `m`
  * int codes. Distance accumulates left-to-right within the window;
  * strict `<` keeps the first (= smallest-index) code on ties. One plan
  * node for the whole encode — the per-row cost is one pass over the
  * vector per codebook entry, and the output is `m` ints replacing
  * `dim` floats (the 32x storage cut that makes 100 TB of vectors
  * scannable). */
case class PqCode(child: Expression, codebook: Array[Array[Double]], m: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty && m >= 1 && codebook(0).length % m == 0,
    s"codebook ${codebook.length}x${codebook.headOption.fold(0)(_.length)} " +
      s"not divisible into $m subspaces")
  private lazy val isFloat = VecOps.floatFlag(child)
  private val dim = codebook(0).length
  private val sub = dim / m

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_code"

  def compute(a: ArrayData): Any = {
    val v = VecOps.toDoubles(a, isFloat)
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val off = j * sub
      val end = math.min(off + sub, v.length)
      var best = Double.PositiveInfinity
      var bi = 0
      var c = 0
      while (c < codebook.length) {
        val cent = codebook(c)
        var acc = 0.0
        var i = off
        while (i < end) { val d = v(i) - cent(i); acc += d * d; i += 1 }
        if (acc < best) { best = acc; bi = c }
        c += 1
      }
      codes(j) = bi
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqCode", this, "graft.expr.PqCode")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}

/** Asymmetric-distance lookup table for one query vector: entry
  * `j * ks + k` is the dot of the query's subspace-`j` window with
  * codebook entry `k`'s same window (left-to-right accumulation, same
  * index discipline as [[PqCode]]). Computed ONCE per query row; every
  * (query, document) pair afterwards costs `m` array lookups + `m - 1`
  * adds instead of a `dim`-term dot — the ADC trick that makes the
  * scan's arithmetic proportional to the 8-byte codes it reads, not
  * the vectors they replaced. */
case class PqLut(child: Expression, codebook: Array[Array[Double]], m: Int)
    extends UnaryExpression {
  require(codebook.nonEmpty && m >= 1 && codebook(0).length % m == 0,
    s"codebook ${codebook.length}x${codebook.headOption.fold(0)(_.length)} " +
      s"not divisible into $m subspaces")
  private lazy val isFloat = VecOps.floatFlag(child)
  private val dim = codebook(0).length
  private val sub = dim / m

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_lut"

  def compute(a: ArrayData): Any = {
    val v = VecOps.toDoubles(a, isFloat)
    val ks = codebook.length
    val lut = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      val off = j * sub
      val end = math.min(off + sub, v.length)
      var c = 0
      while (c < ks) {
        val cent = codebook(c)
        var acc = 0.0
        var i = off
        while (i < end) { acc += v(i) * cent(i); i += 1 }
        lut(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(lut)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqLut", this, "graft.expr.PqLut")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object VectorExprs {
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.toColumn(VecDot(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  def vecDotInt(a: Column, b: Column): Column =
    ColumnBridge.toColumn(VecDotInt(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  def centroidArgMax(a: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.toColumn(CentroidArgMax(ColumnBridge.toExpression(a), centroids))

  def vecNorm(a: Column): Column =
    ColumnBridge.toColumn(VecNorm(ColumnBridge.toExpression(a)))

  def rpBits(a: Column, dim: Int, nPlanes: Int): Column =
    ColumnBridge.toColumn(RpBits(ColumnBridge.toExpression(a), dim, nPlanes))

  def rpProject(a: Column, dim: Int, outDim: Int): Column =
    ColumnBridge.toColumn(RpProject(ColumnBridge.toExpression(a), dim, outDim))

  def pqCode(a: Column, codebook: Array[Array[Double]], m: Int): Column =
    ColumnBridge.toColumn(PqCode(ColumnBridge.toExpression(a), codebook, m))

  def pqLut(a: Column, codebook: Array[Array[Double]], m: Int): Column =
    ColumnBridge.toColumn(PqLut(ColumnBridge.toExpression(a), codebook, m))
}
