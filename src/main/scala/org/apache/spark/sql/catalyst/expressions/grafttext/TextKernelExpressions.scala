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

object TextKernelExpressions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ascii_class_counts"),
      new ExpressionInfo(classOf[AsciiClassCountsExpr].getName, "ascii_class_counts"),
      (c: Seq[Expression]) => AsciiClassCountsExpr(c(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (c: Seq[Expression]) => NfcNormalizeExpr(c(0))))

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
}
