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

/**
 * Integer quantization to integer-valued doubles — the native codegen form
 * of the engine-portable exactness trick `transform(cast(v as
 * array<double>), x -> cast(floor(x * scale + 0.5) as double))` that every
 * integer-Lloyd consumer shares (kmeansAssignInt / ivfTopK intLloyd /
 * embeddingOutliers). Catalyst higher-order functions are interpreted per
 * element and break the surrounding whole-stage codegen span; this
 * expression reproduces the chain BIT-FOR-BIT — `x * (double) scale + 0.5`,
 * `Math.floor` (NaN/±Inf propagate), the double→LONG cast saturation
 * (`Long.Min/MaxValue` on overflow, 0 on NaN — Scala `.toLong` == the Java
 * primitive cast), then back to double — while staying codegen-compiled.
 * A null ELEMENT stays a null element (the lambda's null propagation); a
 * null vector is null.
 */
case class IntQuantizeVecExpr(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale >= 1, s"int_quantize_vec: scale must be >= 1, got $scale")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "int_quantize_vec"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Shared by eval and generated code — one arithmetic path, no drift. */
  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = java.lang.Math.floor(x * scale + 0.5).toLong.toDouble
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("intQuantizeVecExpr", this,
      classOf[IntQuantizeVecExpr].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $selfRef.quantize($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Exact integer squared-L2 distance ARRAY to every centroid of an
 * integer-quantized codebook — the native reference-object form of the
 * historical per-centroid literal fold
 * `array( dot(q,q) - 2.0 * dot(q, c_0) + c_0.c_0, ... )` the int-Lloyd
 * family built with `CreateArray` over `nCells x dim` literals. That
 * literal form generates DIFFERENT code text at every Lloyd iteration of
 * every query (fresh centroid values), so janino recompiled a growing
 * generated class per pass; here the codebook rides via
 * `ctx.addReferenceObj` and the code text is iteration-independent (the
 * IvfCellExpr pattern, VERDICT r5 #6).
 *
 * Bit-parity contract with the literal fold (IntLloydNativeSpec):
 *  - element c = `(dot(q,q) - 2.0 * dot(q,c)) + cc_c`, every dot a
 *    left-to-right double fold, `cc_c` precomputed with the same fold —
 *    identical operand order, identical IEEE results (and exact integers
 *    whenever the caller's 2^53 guard holds);
 *  - a null vector ELEMENT nulls every slot (dot(q,q) is null), a
 *    dim-mismatched centroid nulls only its own slot (DotProductExpr's
 *    length rule) — the output is an ARRAY WITH NULL SLOTS, never a null
 *    array, exactly like CreateArray of nullable elements;
 *  - even a NULL VECTOR yields the all-null-slot array, because
 *    CreateArray itself is never null (IntLloydNativeSpec caught this:
 *    nullSafeEval would have nulled the array and silently dropped
 *    null-vector rows from posexplode'd probe lists).
 * Downstream argmin/min stay the same `array_position`/`array_min`
 * builtins over the (now hoisted) array column, so tie-breaks and
 * null-skipping are untouched.
 */
case class IntL2DistsExpr(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  require(cents.nonEmpty, "codebook must be non-empty")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  // CreateArray semantics: the output array is NEVER null — a null input
  // vector produces the all-null-slot array instead
  override def nullable: Boolean = false
  override def prettyName: String = "int_l2_dists"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val centArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  /** Same left-to-right fold as `c.map(x => x * x).sum`. */
  @transient private lazy val ccArr: Array[Double] = centArr.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Shared by eval and generated code — one arithmetic path, no drift.
    * `v == null` (a null input vector) yields the all-null-slot array. */
  def distArray(v: ArrayData): ArrayData = {
    val out = new Array[Any](centArr.length)
    if (v != null) {
      val n = v.numElements()
      var hasNull = false
      val vv = new Array[Double](n)
      var i = 0
      while (i < n && !hasNull) {
        if (v.isNullAt(i)) hasNull = true
        else { vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i); i += 1 }
      }
      if (!hasNull) {
        var qq = 0.0
        i = 0
        while (i < n) { qq += vv(i) * vv(i); i += 1 }
        var c = 0
        while (c < centArr.length) {
          val cent = centArr(c)
          if (cent.length == n) {
            var d = 0.0
            i = 0
            while (i < n) { d += vv(i) * cent(i); i += 1 }
            out(c) = (qq - 2.0 * d) + ccArr(c)
          }
          c += 1
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    distArray(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val selfRef = ctx.addReferenceObj("intL2DistsExpr", this,
      classOf[IntL2DistsExpr].getName)
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(
      code = code"""
        ${c.code}
        $arrCls ${ev.value} =
          $selfRef.distArray(${c.isNull} ? null : ${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Growable per-group vector-stats buffer for [[IntVecStatsAgg]]:
  * `sums(d)` = Σ of the non-null elements at dim d, `rows(d)` = number of
  * member vectors with length > d (null elements count — the exact
  * semantics of `count(lit(1))` over the posexplode'd rows). */
final class VecStatsBuffer(var sums: Array[Double], var rows: Array[Long]) {
  def grow(n: Int): Unit = if (n > sums.length) {
    sums = java.util.Arrays.copyOf(sums, n)
    rows = java.util.Arrays.copyOf(rows, n)
  }
}

/**
 * Per-group elementwise vector sum + per-dim row counts — the aggregation
 * the integer-Lloyd stats pass needs, WITHOUT the `posexplode` that blew
 * every corpus row into `dim` aggregation-input rows (r15 opt: at
 * embedding dims the explode multiplied map-side aggregation work 64×
 * per Lloyd iteration; here each row is one buffer update of `dim`
 * adds). Exactness: the callers aggregate integer-valued doubles under
 * the 2^53 guard, so partial sums are exact integers and merge order
 * cannot change the result — bit-identical to the (group, dim)-keyed
 * `sum`/`count(lit(1))` it replaces, slot for slot:
 *  - a null ELEMENT increments `rows(d)` but not `sums(d)` (count(lit(1))
 *    counted the exploded null row; sum skipped it);
 *  - a short vector simply contributes to fewer dims (posexplode emitted
 *    fewer rows);
 *  - a null/empty vector contributes nothing (posexplode emitted none);
 *  - a dim whose every member element is null sums to 0.0 (matching
 *    `Row.getDouble` on the null SQL sum the old collect produced).
 * Output: `struct(sums array<double>, rows array<long>)`, arrays sized to
 * the longest member vector.
 */
case class IntVecStatsAgg(child: Expression,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[VecStatsBuffer]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def prettyName: String = "int_vec_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("rows", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> input, got ${t.catalogString}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): VecStatsBuffer =
    new VecStatsBuffer(Array.emptyDoubleArray, Array.emptyLongArray)

  override def update(buf: VecStatsBuffer,
                      row: org.apache.spark.sql.catalyst.InternalRow): VecStatsBuffer = {
    val v = child.eval(row)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      buf.grow(n)
      var i = 0
      while (i < n) {
        buf.rows(i) += 1L
        if (!a.isNullAt(i))
          buf.sums(i) += (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: VecStatsBuffer, b: VecStatsBuffer): VecStatsBuffer = {
    a.grow(b.sums.length)
    var i = 0
    while (i < b.sums.length) {
      a.sums(i) += b.sums(i); a.rows(i) += b.rows(i); i += 1
    }
    a
  }

  override def eval(buf: VecStatsBuffer): Any =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          buf.sums.map(x => x: Any)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          buf.rows.map(x => x: Any))))

  override def serialize(buf: VecStatsBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.sums.length)
    var i = 0
    while (i < buf.sums.length) { out.writeDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < buf.rows.length) { out.writeLong(buf.rows(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecStatsBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val sums = new Array[Double](n)
    val rows = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = in.readDouble(); i += 1 }
    i = 0
    while (i < n) { rows(i) = in.readLong(); i += 1 }
    new VecStatsBuffer(sums, rows)
  }

  override def withNewMutableAggBufferOffset(o: Int): IntVecStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IntVecStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): IntVecStatsAgg =
    copy(child = c)
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

  /** Column-API form: codegen'd integer quantization to integer-valued
    * doubles (`floor(x * scale + 0.5)` via the double→long→double chain).
    * Bit-identical to the interpreted `transform` lambda it replaces. */
  def intQuantizeVec(vec: Column, scale: Int): Column =
    ExpressionUtils.column(
      IntQuantizeVecExpr(ExpressionUtils.expression(vec), scale))

  /** Column-API form: codegen'd exact integer squared-L2 distance array to
    * every codebook centroid. Centroids travel as a reference object, so
    * generated code text is iteration-independent (janino cache hits
    * across Lloyd passes). */
  def intL2Dists(vec: Column, cents: Seq[Array[Double]]): Column =
    ExpressionUtils.column(
      IntL2DistsExpr(ExpressionUtils.expression(vec), cents.map(_.toSeq)))

  /** Column-API form: per-group elementwise vector sums + per-dim row
    * counts (`struct(sums, rows)`), replacing posexplode + (group, dim)
    * sum/count for integer-exact Lloyd stats. */
  def intVecStats(vec: Column): Column =
    ExpressionUtils.column(
      IntVecStatsAgg(ExpressionUtils.expression(vec)).toAggregateExpression())
}
