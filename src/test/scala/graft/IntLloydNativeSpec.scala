package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions

import graft.ops.SimOps

/**
 * Bit-parity pins for the r15 optimization of the integer-Lloyd family
 * (q128 kmeans / q172 prototypes / q177 trained-IVF / q132 outliers):
 * the per-iteration CreateArray-of-literal-fold distance expressions and
 * the interpreted `transform` quantizer were replaced with native
 * reference-object codegen expressions (IntL2DistsExpr /
 * IntQuantizeVecExpr), and maximin seeding became incremental
 * (least(dm_prev, dist_new) over a cached column instead of re-reducing
 * the whole chosen set each pass). Every pin below asserts EXACT equality
 * against the historical column forms, rebuilt verbatim in this spec,
 * including the null/dim-mismatch/NaN edges the old forms defined.
 */
class IntLloydNativeSpec extends SparkTestBase {

  private def vecDf(rows: Seq[Seq[java.lang.Double]]) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(DoubleType, containsNull = true),
        nullable = true)))
    val data = rows.zipWithIndex.map { case (r, i) =>
      Row(i.toLong, if (r == null) null else r)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
  }

  private val edgeRows: Seq[Seq[java.lang.Double]] = Seq(
    Seq[java.lang.Double](1.0, 2.0, 3.0),
    Seq[java.lang.Double](-4.25, 0.0, 7.5),
    Seq[java.lang.Double](1.0, null, 3.0),          // null ELEMENT
    Seq[java.lang.Double](2.0, -2.0),               // dim mismatch vs 3-dim
    Seq[java.lang.Double](Double.NaN, 1.0, -1.0),   // NaN propagation
    Seq[java.lang.Double](Double.PositiveInfinity, 0.5, -0.5),
    Seq[java.lang.Double](),                        // empty vector
    null)                                           // null vector

  /** The historical quantizer, verbatim (SimOps.intQuantCol pre-r15opt). */
  private def oldQuant(vc: org.apache.spark.sql.Column, scale: Int) =
    transform(vc.cast(ArrayType(DoubleType)),
      x => floor(x * scale + lit(0.5)).cast(DoubleType))

  /** The historical distance array, verbatim (SimOps.intDistArr
    * pre-r15opt): per-centroid `dot(q,q) - 2 dot(q,c) + c.c` literal
    * folds collected into CreateArray. */
  private def oldDistArr(qc: org.apache.spark.sql.Column,
                         cs: Array[Array[Double]]) = {
    val dists = cs.map { c =>
      val cc = c.map(x => x * x).sum
      val cLit = array(c.map(lit(_)): _*)
      ArrayMathExpressions.dot(qc, qc) -
        lit(2.0) * ArrayMathExpressions.dot(qc, cLit) + lit(cc)
    }
    array(dists.toIndexedSeq: _*)
  }

  test("IntQuantizeVecExpr matches the transform-lambda quantizer " +
      "exactly, including null elements, NaN, infinities and empty/null " +
      "vectors") {
    val df = vecDf(edgeRows)
    for (scale <- Seq(1, 1000, 1000000)) {
      val got = df.select(col("id"),
          ArrayMathExpressions.intQuantizeVec(
            col("v").cast(ArrayType(DoubleType)), scale).as("q"),
          oldQuant(col("v"), scale).as("ref"))
        .orderBy(col("id")).collect()
      got.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2),
          s"scale=$scale id=${r.getLong(0)}: null-vector mismatch")
        if (!r.isNullAt(1)) {
          val a = r.getSeq[java.lang.Double](1)
          val b = r.getSeq[java.lang.Double](2)
          assert(a.length == b.length)
          a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
            assert((x == null) == (y == null),
              s"scale=$scale id=${r.getLong(0)} elem $i null mismatch")
            if (x != null)
              assert(java.lang.Double.doubleToRawLongBits(x) ==
                java.lang.Double.doubleToRawLongBits(y),
                s"scale=$scale id=${r.getLong(0)} elem $i: $x != $y")
          }
        }
      }
    }
  }

  test("IntL2DistsExpr matches the CreateArray literal fold exactly, " +
      "including the null-element and dim-mismatch slot rules") {
    // integer-valued doubles, like every quantized caller produces;
    // one NaN row exercises the non-finite path end to end
    val df = vecDf(edgeRows)
    val codebooks = Seq(
      Array(Array(1.0, 2.0, 3.0), Array(-5.0, 0.0, 8.0)),
      Array(Array(0.0, 0.0, 0.0), Array(2.0, -2.0), // dim-2 centroid
        Array(1000.0, -1000.0, 500.0)))
    codebooks.foreach { cents =>
      val got = df.select(col("id"),
          ArrayMathExpressions.intL2Dists(
            col("v").cast(ArrayType(DoubleType)), cents.toIndexedSeq).as("d"),
          oldDistArr(col("v").cast(ArrayType(DoubleType)), cents).as("ref"))
        .orderBy(col("id")).collect()
      got.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2),
          s"id=${r.getLong(0)}: null-vector mismatch")
        if (!r.isNullAt(1)) {
          val a = r.getSeq[java.lang.Double](1)
          val b = r.getSeq[java.lang.Double](2)
          assert(a.length == b.length && a.length == cents.length)
          a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
            assert((x == null) == (y == null),
              s"id=${r.getLong(0)} slot $i null mismatch: $x vs $y")
            if (x != null)
              assert(java.lang.Double.doubleToRawLongBits(x) ==
                java.lang.Double.doubleToRawLongBits(y),
                s"id=${r.getLong(0)} slot $i: $x != $y")
          }
        }
      }
    }
  }

  test("incremental maximin + native Lloyd reproduce the recurrence " +
      "bit-for-bit (driver-side replay of the original definition)") {
    // deterministic small corpus of integer-valued vectors
    val rnd = new scala.util.Random(42)
    val dim = 6
    val n = 80
    val vecs: Array[Array[Double]] =
      Array.tabulate(n)(_ => Array.fill(dim)((rnd.nextInt(2001) - 1000).toDouble))
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("__q", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.zipWithIndex.map { case (v, i) => Row(i.toLong, v.toSeq) }, 4),
      schema)

    val k = 5
    val iters = 3
    val got = SimOps.trainIntCentroids(df, "__q", k, iters,
      maxAbs = 1000.0, caller = "spec", init = "maximin")

    // reference replay of the ORIGINAL recurrence: dm = min over chosen
    // of (q.q - 2 q.c + c.c); next = argmax dm, ties to lowest vec_id;
    // then Lloyd: argmin-distance assignment (ties to lowest cell),
    // centroid = floor(sum/count) per dim, empty cells keep the previous
    def dist(q: Array[Double], c: Array[Double]): Double = {
      var qq = 0.0; var d = 0.0; var cc = 0.0; var i = 0
      while (i < dim) { qq += q(i) * q(i); d += q(i) * c(i); cc += c(i) * c(i); i += 1 }
      (qq - 2.0 * d) + cc
    }
    val chosen = scala.collection.mutable.ArrayBuffer(vecs(0))
    while (chosen.length < k) {
      var bestI = -1; var bestDm = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        var dm = Double.PositiveInfinity
        chosen.foreach(c => dm = math.min(dm, dist(vecs(i), c)))
        if (dm > bestDm) { bestDm = dm; bestI = i } // first max = lowest id
        i += 1
      }
      chosen += vecs(bestI)
    }
    var cents = chosen.toArray.map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      vecs.foreach { v =>
        var best = 0; var bd = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val dd = dist(v, cents(c))
          if (dd < bd) { bd = dd; best = c } // strict < = first min
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old
        else Array.tabulate(dim)(i => math.floor(sums(c)(i) / counts(c)))
      }
    }

    assert(got.length == k)
    got.zip(cents).zipWithIndex.foreach { case ((g, r), c) =>
      assert(g.toSeq == r.toSeq, s"centroid $c diverged: " +
        s"${g.toSeq} vs ${r.toSeq}")
    }
  }

  test("kmeansAssignInt / prototypeSelect still produce the pinned " +
      "assignment under the native kernels (lowid init path)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(4)(rnd.nextDouble() * 2 - 1))
    }
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding")
    val out = SimOps.kmeansAssignInt(df, "vec_id", "embedding",
      k = 4, iters = 3).orderBy(col("vec_id")).collect()
    assert(out.length == 60)
    // driver replay of the full chain: quantize (scale 1000), lowid init,
    // 3 Lloyd iterations, final argmin assignment
    val dim = 4
    val q: Array[Array[Double]] = rows.map(_._2.map(x =>
      math.floor(x * 1000 + 0.5)).toArray).toArray
    def dist(a: Array[Double], c: Array[Double]): Double = {
      var qq = 0.0; var d = 0.0; var cc = 0.0; var i = 0
      while (i < dim) { qq += a(i) * a(i); d += a(i) * c(i); cc += c(i) * c(i); i += 1 }
      (qq - 2.0 * d) + cc
    }
    var cents = (0 until 4).map(q(_)).toArray
    for (_ <- 1 to 3) {
      val sums = Array.fill(4)(new Array[Double](dim))
      val counts = new Array[Long](4)
      q.foreach { v =>
        var best = 0; var bd = Double.PositiveInfinity
        for (c <- 0 until 4) {
          val dd = dist(v, cents(c)); if (dd < bd) { bd = dd; best = c }
        }
        for (i <- 0 until dim) sums(best)(i) += v(i)
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old
        else Array.tabulate(dim)(i => math.floor(sums(c)(i) / counts(c)))
      }
    }
    out.foreach { r =>
      val id = r.getLong(0).toInt
      var best = 0; var bd = Double.PositiveInfinity
      for (c <- 0 until 4) {
        val dd = dist(q(id), cents(c)); if (dd < bd) { bd = dd; best = c }
      }
      assert(r.getLong(1) == best.toLong,
        s"vec $id assigned ${r.getLong(1)}, replay says $best")
    }
  }
}
