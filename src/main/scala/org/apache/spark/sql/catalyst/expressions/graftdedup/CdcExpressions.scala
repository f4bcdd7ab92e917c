/*
 * Lives under org.apache.spark.sql.* because the expression base classes
 * name private[sql] types — the standard third-party native-expression
 * pattern (same as the sibling graftdedup / graftgsw files).
 */
package org.apache.spark.sql.catalyst.expressions.graftdedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * CONTENT-DEFINED CHUNKING boundary kernel (the rolling-hash cut-point
 * rule behind storage dedup — LBFS/FastCDC family): walk the text's code
 * points maintaining a SLIDING polynomial hash of the last `windowLen`
 * code points (`h_p = Σ c_{p-j}·31^j mod 2^31`, updated in O(1) by
 * evicting `c_out·31^windowLen`), cut when the chunk is at least
 * `minLen` long AND the low `maskBits` of `h` are zero (expected chunk ≈
 * `minLen + 2^maskBits`), force a cut at `maxLen`. The cut decision at
 * any position depends ONLY on the trailing `windowLen` characters —
 * never on where the previous boundary fell — so an insertion near the
 * front re-synchronizes within about one window+chunk and every later
 * chunk keeps its identity. (A chunk-accumulating hash does NOT have
 * this property: its boundaries random-walk after an edit and sharing
 * collapses to chance — measured 1.6% vs 77% on the q148 corpus, where
 * the ~23% loss is exactly the preamble-bearing first chunk plus the one
 * resync chunk per ~10-chunk document.)
 *
 * The 31-multiplier polynomial (not Gear/Rabin tables) is deliberate:
 * the update is bit-identical to
 * `(h*31 + ord(cin) - ((ord(cout)*31^W mod 2^31)) ) & 2147483647`
 * in any engine (two's-complement `&` makes the subtraction exact mod
 * 2^31 on both JVM longs and DuckDB BIGINTs — verified numerically), so
 * the whole chunker replays as a DuckDB recursive CTE (the q148 oracle);
 * a 256-entry random gear table would be constants-in-two-places. Code
 * points, not UTF-16 units, so offsets agree with `substring()` / DuckDB
 * `substr` semantics on any BMP+astral text.
 */
object GraftCdcKernel {
  /** Exclusive end offsets (code points) of each chunk; empty for empty
    * text. The final partial chunk always closes at the text end.
    * Hot-path shape: one primitive int buffer grown geometrically, no
    * per-boundary boxing, and `UnsafeArrayData.fromPrimitiveArray` so the
    * result is built in a single copy (the boxed `GenericArrayData(Any*)`
    * route re-copies through the catch-all Seq constructor). */
  def boundaries(text: UTF8String, minLen: Int, maskBits: Int,
                 maxLen: Int, windowLen: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = text.toString
    val mask = (1 << maskBits) - 1
    var pow = 1L // 31^windowLen mod 2^31
    var w = 0
    while (w < windowLen) { pow = (pow * 31L) & 0x7fffffffL; w += 1 }
    val ring = new Array[Int](windowLen)
    var out = new Array[Int](16)
    var m = 0
    var h = 0L
    var lastB = 0
    var cp = 0          // code-point index
    var i = 0           // UTF-16 index
    val n = s.length
    while (i < n) {
      val c = s.codePointAt(i)
      i += Character.charCount(c)
      val idx = cp % windowLen
      h =
        if (cp >= windowLen)
          (h * 31L + c - ((ring(idx).toLong * pow) & 0x7fffffffL)) & 0x7fffffffL
        else (h * 31L + c) & 0x7fffffffL
      ring(idx) = c
      cp += 1
      val len = cp - lastB
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        if (m == out.length) out = java.util.Arrays.copyOf(out, m << 1)
        out(m) = cp; m += 1
        lastB = cp
      }
    }
    if (lastB < cp) {
      if (m == out.length) out = java.util.Arrays.copyOf(out, m + 1)
      out(m) = cp; m += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, m))
  }
}

/** `string -> array<int>` CDC chunk end-offsets (see [[GraftCdcKernel]]). */
case class CdcBoundariesExpr(child: Expression, minLen: Int, maskBits: Int,
                             maxLen: Int, windowLen: Int)
    extends UnaryExpression {
  require(minLen >= 1 && maxLen >= minLen,
    s"cdc_boundaries: need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")
  require(maskBits >= 1 && maskBits <= 30,
    s"cdc_boundaries: maskBits in [1, 30], got $maskBits")
  require(windowLen >= 1,
    s"cdc_boundaries: windowLen must be >= 1, got $windowLen")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    GraftCdcKernel.boundaries(text.asInstanceOf[UTF8String], minLen,
      maskBits, maxLen, windowLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftCdcKernel.getClass.getName.stripSuffix("$")}" +
        s".boundaries($c, $minLen, $maskBits, $maxLen, $windowLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcExpressions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}

  def cdcBoundaries(text: Column, minLen: Int, maskBits: Int,
                    maxLen: Int, windowLen: Int = 16): Column =
    column(CdcBoundariesExpr(expression(text), minLen, maskBits, maxLen,
      windowLen))
}
