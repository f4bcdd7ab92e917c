/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * names a private[sql] type — the standard pattern for third-party native
 * expressions (same as graftgsw).
 */
package org.apache.spark.sql.catalyst.expressions.graftarray

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, LongType, StructField, StructType}

/**
 * Native dot product over two array columns (`array<float>` or
 * `array<double>`, mixed allowed), accumulating left-to-right in doubles —
 * the exact fold `aggregate(zip_with(a, b, _*_), 0.0, _+_)` performs and the
 * fold DuckDB's `list_inner_product` on `DOUBLE[]` performs, so results stay
 * bit-identical to both. Unlike the higher-order-function form (which
 * Catalyst interprets per element — ~100x slower at embedding dims), this
 * participates in whole-stage codegen.
 *
 * Null semantics mirror the zip_with fold: mismatched lengths or any null
 * element produce NULL.
 */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable even over non-null children: mismatched lengths or a null
  // ELEMENT yield null. The default child-derived nullability made
  // nullSafeCodeGen take its non-nullable branch, where the `ev.isNull`
  // writes below referenced an undeclared variable — janino failed, and
  // every plan with non-null array inputs (e.g. a collected-codebook
  // LocalTableScan) silently fell back to interpreted projection.
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @transient private lazy val leftIsFloat  = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (leftIsFloat) "getFloat" else "getDouble"
    val rGet = if (rightIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * L2 (unit-norm) vector normalization — after this, downstream dot
 * products ARE cosines, which halves the arithmetic of every ANN/near-dup
 * pass over the corpus (normalize once at ingest, never re-derive norms).
 * The norm is computed max-abs-pre-scaled (`m * sqrt(sum (v_i/m)^2)`,
 * left-to-right) so double inputs near 1e±154 neither overflow to a
 * zeroed direction nor underflow to a false zero-norm; the q65 oracle
 * replays the identical scaled fold. Output is `array<double>`; a
 * zero-norm vector passes through unchanged (never divides by zero), a
 * null element yields a null vector.
 */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null on a null ELEMENT even over a non-null child (same hazard class
  // as DotProductExpr — see its nullable note)
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      out(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(out(i))
      if (a > m) m = a
      i += 1
    }
    // max-abs pre-scaling: an unscaled sum of squares overflows to Inf
    // around |v| ~ 1e154 (direction lost) and underflows to 0 below
    // ~1e-162 (vector wrongly treated as zero-norm) for double inputs
    if (m > 0.0) {
      var s = 0.0
      i = 0
      while (i < n) { val t = out(i) / m; s += t * t; i += 1 }
      val norm = m * math.sqrt(s)
      i = 0
      while (i < n) { out(i) /= norm; i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val m = ctx.freshName("m"); val t = ctx.freshName("t")
      val norm = ctx.freshName("norm")
      s"""
         |final int $n = $v.numElements();
         |final double[] $out = new double[$n];
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = (double) $v.$get($i);
         |  final double $t = java.lang.Math.abs($out[$i]);
         |  if ($t > $m) $m = $t;
         |}
         |if (!${ev.isNull}) {
         |  if ($m > 0.0) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $t = $out[$i] / $m;
         |      $s += $t * $t;
         |    }
         |    final double $norm = $m * java.lang.Math.sqrt($s);
         |    for (int $i = 0; $i < $n; $i++) $out[$i] /= $norm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Symmetric int8 scalar quantization of an embedding vector:
 * `struct(scale, q)` with `scale = maxAbs / 127` and
 * `q_i = floor(v_i / maxAbs * 127 + 0.5)` (round-half-up via floor, the
 * one rounding rule Spark and DuckDB replay identically — `round()`
 * half-rounding conventions differ across engines). Dequantization is
 * `q_i * scale`, with per-element error ≤ scale/2.
 *
 * The storage-side op for a 100 TB embedding corpus: 4× footprint cut vs
 * float32 (64 B vs 256 B per 64-dim vector) at ~0.4% max component error,
 * which leaves cosine top-k ordering essentially intact (spec-checked).
 * A zero vector quantizes to scale 0 / all-zero q; a null element yields
 * a null struct (same hazard class as [[DotProductExpr]]).
 */
case class Int8QuantizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quantize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val d = new Array[Double](n)
    var m = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      d(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(d(i))
      if (a > m) m = a
      i += 1
    }
    val q = new Array[Byte](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(d(i) / m * 127.0 + 0.5).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m / 127.0, new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val d = ctx.freshName("d"); val m = ctx.freshName("m")
      val a = ctx.freshName("a"); val q = ctx.freshName("q")
      val f = ctx.freshName("fields")
      s"""
         |final int $n = $v.numElements();
         |final double[] $d = new double[$n];
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $d[$i] = (double) $v.$get($i);
         |  final double $a = java.lang.Math.abs($d[$i]);
         |  if ($a > $m) $m = $a;
         |}
         |if (!${ev.isNull}) {
         |  final byte[] $q = new byte[$n];
         |  if ($m > 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      $q[$i] = (byte) java.lang.Math.floor($d[$i] / $m * 127.0 + 0.5);
         |    }
         |  }
         |  final Object[] $f = new Object[2];
         |  $f[0] = $m / 127.0;
         |  $f[1] = new org.apache.spark.sql.catalyst.util.GenericArrayData($q);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($f);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * All-bands random-hyperplane sign sketch in ONE pass over the vector:
 * output element `b` is the band-`b` bucket id, where bit `j` is set iff
 * `dot(vec, planes(b)(j)) >= 0` — the identical left-to-right double fold
 * [[DotProductExpr]] performs, so band 0 with the seed-42 planes reproduces
 * the historical single-band `signSketch` bucket bit-for-bit.
 *
 * The planes ride along INSIDE the expression object and reach generated
 * code via `ctx.addReferenceObj` — at 8 bands x 12 planes x 1k dims the
 * literal-array form this replaces (VERDICT r5 #6) embedded ~100k `lit()`
 * nodes / megabytes of codegen in the plan; here the plan holds one
 * reference and the codegen is a fixed three-loop kernel.
 *
 * Per-bit null semantics mirror the old `when(dot >= 0, bit).otherwise(0)`
 * form: a plane/vector length mismatch or a null element contributes 0 to
 * that bucket (never null). A null vector yields a null sketch.
 *
 * `planes` is `Seq`-shaped (not `Array`) so case-class equality — and with
 * it Catalyst canonicalization/subexpression elimination — works by value.
 */
case class BandedSignSketchExpr(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.nonEmpty), "need >= 1 band of >= 1 plane")
  require(planes.map(_.length).distinct.size == 1, "all bands must have the same plane count")
  require(planes.head.length <= 63, "at most 63 planes per band (bits of a long)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "banded_sign_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def nBands = planes.length
  private def nPlanes = planes.head.length
  /** bands x planes flattened row-major: plane j of band b is `flat(b*r+j)`. */
  @transient private lazy val flat: Array[Array[Double]] =
    planes.flatMap(_.map(_.toArray)).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = 0L
      var j = 0
      while (j < nPlanes) {
        val p = flat(b * nPlanes + j)
        if (p.length == n) {
          var d = 0.0
          var ok = true
          var i = 0
          while (ok && i < n) {
            if (v.isNullAt(i)) ok = false
            else {
              d += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
              i += 1
            }
          }
          if (ok && d >= 0.0) acc += (1L << j)
        }
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val planesRef = ctx.addReferenceObj("bandedPlanes", flat, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val b = ctx.freshName("b"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val p = ctx.freshName("p"); val d = ctx.freshName("d")
      val ok = ctx.freshName("ok"); val acc = ctx.freshName("acc"); val sk = ctx.freshName("sk")
      s"""
         |final int $n = $v.numElements();
         |final long[] $sk = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    final double[] $p = $planesRef[$b * $nPlanes + $j];
         |    if ($p.length == $n) {
         |      double $d = 0.0;
         |      boolean $ok = true;
         |      for (int $i = 0; $i < $n; $i++) {
         |        if ($v.isNullAt($i)) { $ok = false; break; }
         |        $d += ((double) $v.$get($i)) * $p[$i];
         |      }
         |      if ($ok && $d >= 0.0) $acc += (1L << $j);
         |    }
         |  }
         |  $sk[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sk);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Dense matrix-vector projection: output element `j` is the left-to-right
 * double dot fold of the input vector with `matrix` row `j` — the identical
 * fold [[DotProductExpr]] performs and DuckDB's `list_inner_product`
 * replays, so projections are bit-exact oracle-able when the oracle embeds
 * the same row literals. The random-projection (Johnson–Lindenstrauss)
 * dimensionality-reduction kernel: rows are Gaussian directions pre-scaled
 * by `1/sqrt(outDim)` at construction (see `SimOps.projectionMatrix`), so
 * no post-fold multiply exists to diverge between engines.
 *
 * The matrix rides via `ctx.addReferenceObj` (one reference, fixed
 * two-loop kernel — the [[BandedSignSketchExpr]] pattern, not outDim
 * literal arrays). A vector whose length mismatches the rows, or with a
 * null element, yields a null output; rows are validated uniform at
 * construction. `matrix` is `Seq`-shaped so case-class equality — and
 * Catalyst canonicalization/subexpression elimination — works by value.
 */
case class MatProjectExpr(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty, "need >= 1 projection row")
  require(matrix.map(_.length).distinct.size == 1,
    "all projection rows must have the same length")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null on a null ELEMENT / length mismatch even over a non-null child
  // (same janino-undeclared-isNull hazard as DotProductExpr)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val rows: Array[Array[Double]] =
    matrix.map(_.toArray).toArray
  private def inDim = matrix.head.length

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != inDim) return null
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Double](rows.length)
    var j = 0
    while (j < rows.length) {
      val r = rows(j)
      var d = 0.0
      i = 0
      while (i < n) { d += vv(i) * r(i); i += 1 }
      out(j) = d
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val rowsRef = ctx.addReferenceObj("projRows", rows, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val vv = ctx.freshName("vv"); val r = ctx.freshName("r")
      val d = ctx.freshName("d"); val out = ctx.freshName("out")
      s"""
         |final int $n = $v.numElements();
         |if ($n != $inDim) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double[] $vv = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $vv[$i] = (double) $v.$get($i);
         |  }
         |  if (!${ev.isNull}) {
         |    final double[] $out = new double[${rows.length}];
         |    for (int $j = 0; $j < ${rows.length}; $j++) {
         |      final double[] $r = $rowsRef[$j];
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $n; $i++) $d += $vv[$i] * $r[$i];
         |      $out[$j] = $d;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * IVF coarse-quantizer cell assignment: returns the id of the codebook
 * centroid with the highest cosine to the input vector, FIRST max on ties —
 * the same answer as the historical
 * `element_at(ids, array_position(scores, array_max(scores)))` literal-array
 * fold (q42's oracle ORDER BY score DESC, cent_id), with identical
 * arithmetic: score_c = vn * ||c|| > 0 ? dot(v, c) / (vn * ||c||) : 0.0
 * where vn = sqrt(dot(v, v)) is computed once and every fold is
 * left-to-right in doubles. Centroid norms are precomputed with the same
 * fold. The codebook reaches generated code via `ctx.addReferenceObj`
 * instead of nCells x dim literal arrays (VERDICT r5 #6).
 *
 * A centroid whose length mismatches the vector scores 0.0 (it can never
 * win against any in-dim centroid with positive cosine); a null element in
 * the vector yields a null cell.
 */
case class IvfCellExpr(child: Expression, centIds: Seq[Long],
                       cents: Seq[Seq[Double]]) extends UnaryExpression {

  require(centIds.nonEmpty && centIds.length == cents.length,
    "codebook ids and centroids must align and be non-empty")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  // Null on a null vector ELEMENT, so nullable even over a non-null child
  // (same janino-undeclared-isNull hazard as DotProductExpr).
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cell"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = centIds.toArray
  /** Same left-to-right fold as the main dot. */
  @transient private lazy val normArr: Array[Double] = centArr.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var s = 0.0
    i = 0
    while (i < n) { s += vv(i) * vv(i); i += 1 }
    val vn = math.sqrt(s)
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      var score = 0.0
      if (cent.length == n) {
        var d = 0.0
        i = 0
        while (i < n) { d += vv(i) * cent(i); i += 1 }
        val nn = vn * normArr(c)
        score = if (nn > 0) d / nn else 0.0
      }
      if (score > bestScore) { best = c; bestScore = score }
      c += 1
    }
    idArr(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val centsRef = ctx.addReferenceObj("ivfCents", centArr, "double[][]")
    val normsRef = ctx.addReferenceObj("ivfNorms", normArr, "double[]")
    val idsRef   = ctx.addReferenceObj("ivfIds", idArr, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val vv = ctx.freshName("vv"); val s = ctx.freshName("s"); val vn = ctx.freshName("vn")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      val cent = ctx.freshName("cent"); val d = ctx.freshName("d")
      val nn = ctx.freshName("nn"); val score = ctx.freshName("score")
      s"""
         |final int $n = $v.numElements();
         |final double[] $vv = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $vv[$i] = (double) $v.$get($i);
         |}
         |if (!${ev.isNull}) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) $s += $vv[$i] * $vv[$i];
         |  final double $vn = java.lang.Math.sqrt($s);
         |  int $best = 0;
         |  double $bestScore = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < ${centArr.length}; $c++) {
         |    final double[] $cent = $centsRef[$c];
         |    double $score = 0.0;
         |    if ($cent.length == $n) {
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $n; $i++) $d += $vv[$i] * $cent[$i];
         |      final double $nn = $vn * $normsRef[$c];
         |      $score = ($nn > 0) ? ($d / $nn) : 0.0;
         |    }
         |    if ($score > $bestScore) { $best = $c; $bestScore = $score; }
         |  }
         |  ${ev.value} = $idsRef[$best];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Multi-probe IVF cell assignment: the `nProbe` codebook centroids with the
 * highest cosine to the input vector, ordered by (score desc, codebook
 * position asc) — [[IvfCellExpr]]'s argmax repeated `nProbe` times with the
 * identical arithmetic and tie-break, so probe list position 0 always
 * equals `ivf_cell`. This is the MAP-SIDE probe selection the two-sided
 * ANN join needs: a huge query side gets its probe cells at scan speed,
 * where the broadcast-codebook crossJoin + window that [[graft.ops.SimOps
 * .ivfTopK]] uses would shuffle queries × nCells rows. Same null and
 * dim-mismatch rules as [[IvfCellExpr]].
 */
case class IvfCellsExpr(child: Expression, centIds: Seq[Long],
                        cents: Seq[Seq[Double]], nProbe: Int)
    extends UnaryExpression {

  require(centIds.nonEmpty && centIds.length == cents.length,
    "codebook ids and centroids must align and be non-empty")
  require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null on a null vector ELEMENT (the IvfCellExpr janino hazard note)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  @transient private lazy val idArr: Array[Long] = centIds.toArray
  @transient private lazy val normArr: Array[Double] = centArr.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    math.sqrt(s)
  }
  private val probeCount = math.min(nProbe, centIds.length)

  /** Scores every centroid with IvfCellExpr's fold, then selects
    * `probeCount` cells by repeated strict-max scans in codebook order —
    * equivalent to sorting by (score desc, position asc). */
  def probeCells(vv: Array[Double], n: Int): Array[Long] = {
    val scores = new Array[Double](centArr.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += vv(i) * vv(i); i += 1 }
    val vn = math.sqrt(s)
    var c = 0
    while (c < centArr.length) {
      val cent = centArr(c)
      var score = 0.0
      if (cent.length == n) {
        var d = 0.0
        i = 0
        while (i < n) { d += vv(i) * cent(i); i += 1 }
        val nn = vn * normArr(c)
        score = if (nn > 0) d / nn else 0.0
      }
      // a non-finite query component makes score NaN for EVERY centroid;
      // map NaN to -Inf so the selection ordering stays total and an all-NaN
      // vector degrades to codebook-order cells (probe 0 == IvfCellExpr's
      // best = 0 choice) instead of taken(-1) killing the task
      scores(c) = if (java.lang.Double.isNaN(score)) Double.NegativeInfinity else score
      c += 1
    }
    val taken = new Array[Boolean](centArr.length)
    val out = new Array[Long](probeCount)
    var p = 0
    while (p < probeCount) {
      // best starts at the first untaken cell (never -1): if every remaining
      // score is NaN (a non-finite query component NaNs ALL scores), the
      // strict > never fires and we must still pick a valid cell — matching
      // IvfCellExpr's best = 0 degradation instead of throwing on taken(-1)
      var best = -1
      var bestScore = Double.NegativeInfinity
      c = 0
      while (c < centArr.length) {
        if (!taken(c)) {
          if (best < 0 || scores(c) > bestScore) { best = c; bestScore = scores(c) }
        }
        c += 1
      }
      taken(best) = true
      out(p) = idArr(best)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(probeCells(vv, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    // the selection loop is shared with eval via a reference to THIS
    // expression (the scoring fold must stay in one place); the per-row
    // work is the same vv extraction either way
    val selfRef = ctx.addReferenceObj("ivfCellsExpr", this,
      classOf[IvfCellsExpr].getName)
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val vv = ctx.freshName("vv")
      s"""
         |final int $n = $v.numElements();
         |final double[] $vv = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $vv[$i] = (double) $v.$get($i);
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($selfRef.probeCells($vv, $n));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayMathExpressions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "array_dot"),
      (c: Seq[Expression]) => DotProductExpr(c(0), c(1))),
    (FunctionIdentifier("l2_normalize"),
      new ExpressionInfo(classOf[L2NormalizeExpr].getName, "l2_normalize"),
      (c: Seq[Expression]) => L2NormalizeExpr(c(0))),
    (FunctionIdentifier("int8_quantize"),
      new ExpressionInfo(classOf[Int8QuantizeExpr].getName, "int8_quantize"),
      (c: Seq[Expression]) => Int8QuantizeExpr(c(0))))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-API form: codegen'd `array_dot(a, b)`. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API form: codegen'd unit-norm normalization. */
  def l2Normalize(v: Column): Column =
    ExpressionUtils.column(L2NormalizeExpr(ExpressionUtils.expression(v)))

  /** Column-API form: codegen'd symmetric int8 quantization
    * (`struct(scale, q)`); dequantize at use as `q * scale` per element. */
  def int8Quantize(v: Column): Column =
    ExpressionUtils.column(Int8QuantizeExpr(ExpressionUtils.expression(v)))

  /** Column-API form: codegen'd dense matrix-vector projection
    * (`array<double>`, one element per matrix row). The matrix travels as
    * a reference object, not literals. */
  def matProject(vec: Column, matrix: Seq[Array[Double]]): Column =
    ExpressionUtils.column(
      MatProjectExpr(ExpressionUtils.expression(vec), matrix.map(_.toSeq)))

  /** Column-API form: codegen'd all-bands sign sketch (`array<long>`, one
    * element per band). Planes travel as a reference object, not literals. */
  def bandedSignSketch(vec: Column, planes: Seq[Array[Array[Double]]]): Column =
    ExpressionUtils.column(
      BandedSignSketchExpr(ExpressionUtils.expression(vec),
        planes.map(_.map(_.toSeq).toSeq)))

  /** Column-API form: codegen'd IVF cell assignment (argmax-cosine centroid
    * id, first max on ties). Codebook travels as reference objects. */
  def ivfCell(vec: Column, cents: Seq[(Long, Array[Double])]): Column =
    ExpressionUtils.column(
      IvfCellExpr(ExpressionUtils.expression(vec),
        cents.map(_._1), cents.map(_._2.toSeq)))

  /** Column-API form: codegen'd MULTI-PROBE cell list (`array<long>` of
    * the nProbe best cells, score desc / codebook order on ties). */
  def ivfCells(vec: Column, cents: Seq[(Long, Array[Double])],
               nProbe: Int): Column =
    ExpressionUtils.column(
      IvfCellsExpr(ExpressionUtils.expression(vec),
        cents.map(_._1), cents.map(_._2.toSeq), nProbe))
}
