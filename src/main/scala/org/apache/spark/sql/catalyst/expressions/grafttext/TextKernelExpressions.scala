/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * names a private[sql] type — the standard pattern for third-party native
 * expressions (same as graftarray / graftgsw / graftdedup).
 */
package org.apache.spark.sql.catalyst.expressions.grafttext

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by eval and generated code. */
object GraftTextKernels {

  /** One pass over the UTF-8 bytes counting `[A-Za-z]`, `[0-9]`, and
    * `[.,;:!?]` occurrences. All three classes are pure ASCII, and UTF-8
    * continuation bytes are >= 0x80, so a byte scan counts code points
    * exactly — this replaces THREE `regexp_count` scans of the document
    * (the dominant cost of the quality query). */
  def asciiClassCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var alpha = 0L
    var digit = 0L
    var punct = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      else if (b >= '0' && b <= '9') digit += 1
      else if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
      i += 1
    }
    new GenericArrayData(Array(alpha, digit, punct))
  }

  /** Count of tokens that are members of the marker set (byte-equality on
    * UTF8String — identical to string equality for UTF-8). */
  def markerHits(tokens: ArrayData, markers: java.util.HashSet[UTF8String]): Long = {
    val n = tokens.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && markers.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  def toMarkerSet(markers: Seq[String]): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => set.add(UTF8String.fromString(m)))
    set
  }

  /** Tokenize with 1-based inclusive CHARACTER offsets into the ORIGINAL
    * text: returns `struct(toks, starts, ends)` where `toks` are the
    * lowercased alphanumeric runs and `substring(text, starts[i],
    * ends[i] - starts[i] + 1)` is token i's original spelling — the
    * provenance a RAG indexer needs to display source passages.
    *
    * ASCII fast path scans bytes (byte index == char index there); the
    * non-ASCII path walks code points so offsets match `substring`
    * semantics (code-point counting) in Spark and DuckDB. Token chars are
    * classified per code point via `Character.toLowerCase`, which agrees
    * with `lower()`-then-regexp tokenization everywhere except one-to-many
    * case folds (e.g. U+0130 lowercases to two code points in `lower()`) —
    * those cannot carry original-text offsets at all, which is why this
    * kernel folds per code point. */
  def tokenizeWithOffsets(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    val toks = new java.util.ArrayList[Any]()
    val starts = new java.util.ArrayList[Any]()
    val ends = new java.util.ArrayList[Any]()
    if (ascii) {
      var p = 0
      while (p < bytes.length) {
        val b = bytes(p)
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
            (b >= '0' && b <= '9')) {
          val st = p
          while (p < bytes.length && {
            val c = bytes(p)
            (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          }) p += 1
          val tok = new Array[Byte](p - st)
          var k = st
          while (k < p) {
            val c = bytes(k)
            tok(k - st) = if (c >= 'A' && c <= 'Z') (c | 0x20).toByte else c
            k += 1
          }
          toks.add(UTF8String.fromBytes(tok))
          starts.add(st + 1)
          ends.add(p) // p is one past the last token byte; 1-based inclusive
        } else p += 1
      }
    } else {
      val str = s.toString
      val sb = new java.lang.StringBuilder
      var cp = 0 // 1-based code-point position of the CURRENT code point - 1
      var j = 0  // UTF-16 index
      var tokStart = -1
      def flush(endCp: Int): Unit = if (tokStart >= 0) {
        toks.add(UTF8String.fromString(sb.toString))
        starts.add(tokStart)
        ends.add(endCp)
        sb.setLength(0)
        tokStart = -1
      }
      while (j < str.length) {
        val c = str.codePointAt(j)
        val lc = Character.toLowerCase(c)
        cp += 1
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
          if (tokStart < 0) tokStart = cp
          sb.appendCodePoint(lc)
        } else flush(cp - 1)
        j += Character.charCount(c)
      }
      flush(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(toks.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(starts.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(ends.toArray.asInstanceOf[Array[Any]])))
  }

  /** Unicode NFC normalization with an ASCII fast path: pure-ASCII byte
    * sequences (the overwhelming share of a web corpus) return the input
    * UTF8String untouched — no String materialization, no Normalizer call.
    * Already-normalized non-ASCII text also avoids the rebuild via
    * `isNormalized`. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val str = s.toString
        if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC))
          return s
        return UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** `string -> array<bigint>` of [alpha, digit, punct] counts in one byte
  * pass (see [[GraftTextKernels.asciiClassCounts]]). */
case class AsciiClassCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.asciiClassCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.asciiClassCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> bigint` marker-set membership count; the set is a
  * plan constant shipped as a codegen reference. `markers` is a Seq so
  * expression equality compares by content. */
case class MarkerHitsExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val set = GraftTextKernels.toMarkerSet(markers)

  override protected def nullSafeEval(tokens: Any): Any =
    GraftTextKernels.markerHits(tokens.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.markerHits($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> string` Unicode NFC normalization (composed form), matching
  * DuckDB's `nfc_normalize` / Python's `unicodedata.normalize('NFC', s)`.
  * ASCII rows pass through zero-copy (see [[GraftTextKernels.nfcNormalize]]). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<toks: array<string>, starts: array<int>, ends:
  * array<int>>` tokenizer with 1-based inclusive character offsets into the
  * original text (see [[GraftTextKernels.tokenizeWithOffsets]]). */
case class TokenizeWithOffsetsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("starts", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ends", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokenize_with_offsets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.tokenizeWithOffsets(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.tokenizeWithOffsets($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernelExpressions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ascii_class_counts"),
      new ExpressionInfo(classOf[AsciiClassCountsExpr].getName, "ascii_class_counts"),
      (c: Seq[Expression]) => AsciiClassCountsExpr(c(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (c: Seq[Expression]) => NfcNormalizeExpr(c(0))),
    (FunctionIdentifier("tokenize_with_offsets"),
      new ExpressionInfo(classOf[TokenizeWithOffsetsExpr].getName, "tokenize_with_offsets"),
      (c: Seq[Expression]) => TokenizeWithOffsetsExpr(c(0))))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-API form: [alpha, digit, punct] counts in one byte pass. */
  def asciiClassCounts(text: Column): Column =
    ExpressionUtils.column(AsciiClassCountsExpr(ExpressionUtils.expression(text)))

  /** Column-API form: marker-set membership count over a token array. */
  def markerHits(tokens: Column, markers: Seq[String]): Column =
    ExpressionUtils.column(MarkerHitsExpr(ExpressionUtils.expression(tokens), markers))

  /** Column-API form: Unicode NFC normalization, ASCII rows zero-copy. */
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))

  /** Column-API form: tokens with 1-based character offsets into the
    * original text. */
  def tokenizeWithOffsets(text: Column): Column =
    ExpressionUtils.column(TokenizeWithOffsetsExpr(ExpressionUtils.expression(text)))
}
