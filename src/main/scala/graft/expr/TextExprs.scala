package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-k-shingle expression — the hot first stage of every
  * text-dedup fingerprint (MinHash, SimHash, n-gram Jaccard).
  *
  * Semantics are pinned to the column-algebra formulation it replaces
  * (and to the DuckDB oracle SQL): distinct k-grams, in first-occurrence
  * order, of `split(regexp_replace(lower(text), "\s+", " "), " ")` —
  * i.e. tokens are maximal non-whitespace runs, except that leading or
  * trailing whitespace contributes one empty token on that side, and the
  * empty string yields one empty token. Whitespace is Java-regex `\s`
  * (ASCII only). One pass, no regex engine, no per-element lambda
  * dispatch — measured ~5x faster than the slice/zip_with/array_distinct
  * pipeline it replaces.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "word_shingles"

  def compute(s: UTF8String): ArrayData =
    WordShingles.shingles(s, k)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordShingles", this, "graft.expr.WordShingles")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Native positioned word-k-gram expression — [[WordShingles]]'s sibling
  * for the span-alignment operators (contamination chaining), which need
  * EVERY k-gram start position, not the distinct gram set.
  *
  * Semantics are pinned to the column-algebra formulation it replaces
  * (and to the DuckDB oracle SQL): tokens are the non-empty maximal
  * non-whitespace runs of the lowercased text (the [[graft.llm.Dedup.wsTokens]]
  * law — boundary empties dropped, so this is NOT [[WordShingles]]'s
  * split-with-boundary-empties tokenization), and the result is
  * `array<struct<p:int, g:string>>` with one entry per 0-based gram start
  * `p` and the k tokens space-joined as `g`, in position order, duplicates
  * kept. Fewer than k tokens yields the empty array. One pass, no regex
  * engine, no per-position `slice`/`array_join` HOF dispatch — replaces a
  * `transform(sequence(...), i -> struct(i, array_join(slice(...))))`
  * chain measured ~2.5x slower on the corpus-side gram build.
  */
case class PositionedShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", IntegerType, nullable = false),
      StructField("g", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "positioned_shingles"

  def compute(s: UTF8String): ArrayData =
    PositionedShingles.positioned(s, k)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("positionedShingles", this,
      "graft.expr.PositionedShingles")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionedShingles =
    copy(child = newChild)
}

object PositionedShingles {

  def apply(c: Column, k: Int): Column =
    ColumnBridge.toColumn(PositionedShingles(ColumnBridge.toExpression(c), k))

  /** Non-empty tokens of the lowercased text — `wsTokens`'s law (filter
    * of the collapsed split): maximal non-whitespace runs, no boundary
    * empties, empty input yields zero tokens. */
  private[expr] def wsTokens(str: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && WordShingles.isWsChar(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !WordShingles.isWsChar(str.charAt(i))) i += 1
        out += str.substring(start, i)
      }
    }
    out.toArray
  }

  def positioned(s: UTF8String, k: Int): ArrayData = {
    val toks = wsTokens(s.toLowerCase.toString)
    val m = toks.length - (k - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i, UTF8String.fromString(sb.toString)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Engine-portable rolling document fingerprint: the classic polynomial
  * hash `h = (h*31 + codepoint) mod 1e9+7` over the text's Unicode code
  * points. Unlike xxhash64 it is reproducible in ANY engine with integer
  * arithmetic (the DuckDB oracle recomputes it with
  * `list_reduce`/`unicode`), so fingerprint equality is cross-checkable —
  * the dedup-bookkeeping identity for pipelines spanning engines.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "poly_fingerprint"

  override def nullSafeEval(input: Any): Any =
    PolyFingerprint.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("polyFp", PolyFingerprint,
      "graft.expr.PolyFingerprint$")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $obj.hash($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)
}

object PolyFingerprint {
  final val Mod = 1000000007L

  def apply(c: Column): Column =
    ColumnBridge.toColumn(PolyFingerprint(ColumnBridge.toExpression(c)))

  def hash(s: UTF8String): Long = {
    var h = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) h = (h * 31 + it.nextInt()) % Mod
    h
  }
}

object WordShingles {

  def apply(c: Column, k: Int): Column =
    ColumnBridge.toColumn(WordShingles(ColumnBridge.toExpression(c), k))

  // Java regex \s (the collapse step's definition of whitespace)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  /** [[isWs]] shared with [[PositionedShingles]] — one whitespace law. */
  private[expr] def isWsChar(c: Char): Boolean = isWs(c)

  /** Tokens of the collapsed-whitespace form: equivalent to
    * `split(regexp_replace(s, "\s+", " "), " ")`. */
  private[expr] def tokens(str: String): Array[String] = {
    if (str.isEmpty) return Array("")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    if (isWs(str.charAt(0))) out += ""
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(str.charAt(i))) i += 1
        out += str.substring(start, i)
      }
    }
    if (isWs(str.charAt(n - 1))) out += ""
    out.toArray
  }

  def shingles(s: UTF8String, k: Int): ArrayData = {
    // toLowerCase on UTF8String matches Spark's `lower` (UTF8_BINARY)
    val toks = tokens(s.toLowerCase.toString)
    val m = toks.length - (k - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }
}
