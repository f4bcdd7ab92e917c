/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * names a private[sql] type — the standard pattern for third-party native
 * expressions (same as graftarray / graftgsw).
 */
package org.apache.spark.sql.catalyst.expressions.graftdedup

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Static kernels shared by eval and generated code. Operating on
 * `ArrayData` + `UTF8String` directly (rather than a Scala UDF's
 * `Seq[String]`) skips the per-row catalyst-to-Scala conversion — at 1e9
 * docs that conversion allocates one String per token per row purely to
 * re-extract the UTF-8 bytes md5 needs. `UTF8String.getBytes` returns
 * exactly those bytes, so every hash is bit-identical to the UDF (and
 * DuckDB-oracle) values.
 */
object GraftHashKernels {

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 bytes, big-endian — `('0x' || substr(md5(t),1,16))::UBIGINT`. */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5Local.get().digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over a token array (term-frequency-weighted bit votes);
    * null elements are skipped; an empty array yields 0L. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = md5Hash64(tokens.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: `min_i (a_i * h31(s) + b_i) mod p` over the shingle
    * array, h31 = md5Hash64 masked to 31 bits, p = 2^31 - 1. Each shingle is
    * hashed once; the k minima accumulate in one pass. */
  def minhashSig(shingles: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val p = 2147483647L
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        val h = md5Hash64(shingles.getUTF8String(s).getBytes) & 0x7fffffffL
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(sig)
  }
}

/** Native word n-gram shingling: `array<string> -> array<string>` of
  * DISTINCT space-joined n-grams in first-occurrence order; an array
  * shorter than n collapses to the single all-token join (including the
  * empty string for an empty array — mirroring the reference UDF exactly).
  * Builds `UTF8String`s directly (byte-level concat), so the hottest
  * pipeline stage (shingling feeds near-dup, jaccard, repetition,
  * decontamination) never leaves the codegen'd row format. */
object GraftShingleKernel {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    def tok(i: Int): UTF8String = {
      val t = tokens.getUTF8String(i)
      if (t == null) UTF8String.EMPTY_UTF8 else t
    }
    if (len < n) {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = tok(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, parts: _*)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= len - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = tok(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native shingling expression (see [[GraftShingleKernel]]). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftShingleKernel.shingles(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftShingleKernel.getClass.getName.stripSuffix("$")}.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash of an `array<string>` token column. Stays inside
  * whole-stage codegen (the generated code calls the static kernel — no UDF
  * boundary, no Seq[String] materialization). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // scalac emits static forwarders for object methods — generated Java
    // calls the kernel directly, staying inside the codegen'd stage
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature (`array<string> -> array<bigint>`) with the
  * permutation constants compiled into the plan. Constants are `Seq`s (not
  * arrays) so expression equality/canonicalization compares by content and
  * identical signature computations stay exchange-reusable. */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "permutation constants mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override protected def nullSafeEval(shingles: Any): Any =
    GraftHashKernels.minhashSig(shingles.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the constants via a codegen object reference (arrays as literals
    // would re-parse k=128 longs per generated class)
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.minhashSig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashSketchExpressions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (c: Seq[Expression]) => SimHash64Expr(c(0))))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-API form: codegen'd simhash64 over a token array column. */
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(tokens)))

  /** Column-API form: codegen'd distinct word n-gram shingles. */
  def wordShingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(tokens), n))

  /** Column-API form: codegen'd MinHash signature over a shingle array. */
  def minhashSig(shingles: Column, as: Seq[Long], bs: Seq[Long]): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(shingles), as, bs))
}
