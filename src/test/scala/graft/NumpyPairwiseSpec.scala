package graft

import org.apache.spark.sql.Row

/** Bit-pins graft.dsp.NumpyPairwise against this container's numpy.ma —
  * the primitive under the despike refExact path that lets q181/q181b
  * hash-anchor all 46,656 QC-chain cells with no exclusion list. Fixture:
  * golden_oracle/numpy_ma_stats.parquet (scripts/gen_golden_numpy_stats.py)
  * — 180 adversarial windows (every pairwise length class n<8 / 8..128 /
  * >128 with remainders, step-quantized values, exact plateaus, outliers,
  * partial and FULL masks) with numpy's mean/std(ddof=0) as raw float64
  * bits. */
class NumpyPairwiseSpec extends SparkTestBase {

  test("maMeanStd matches numpy.ma mean/std bit-for-bit on all golden " +
       "cases") {
    val rows: Array[Row] = spark.read
      .parquet("golden_oracle/numpy_ma_stats.parquet")
      .collect()
    assert(rows.length >= 150, "golden fixture unexpectedly small — " +
      "regenerate with scripts/gen_golden_numpy_stats.py")
    rows.foreach { r =>
      val id = r.getAs[Long]("case_id")
      val v = r.getAs[scala.collection.Seq[Double]]("values").toArray
      val m = r.getAs[scala.collection.Seq[Boolean]]("mask").toArray
      val cnt = r.getAs[Long]("cnt")
      val scratch = new Array[Double](v.length)
      val (mean, std, c) =
        graft.dsp.NumpyPairwise.maMeanStd(v, m, 0, v.length, scratch)
      assert(c.toLong == cnt, s"case $id: cnt $c != numpy $cnt")
      if (cnt > 0L) {
        val mb = java.lang.Double.doubleToRawLongBits(mean)
        val sb = java.lang.Double.doubleToRawLongBits(std)
        assert(mb == r.getAs[Long]("mean_bits"),
          s"case $id (n=${v.length}): mean $mean != numpy bits")
        assert(sb == r.getAs[Long]("std_bits"),
          s"case $id (n=${v.length}): std $std != numpy bits")
      }
    }
  }

  test("scratch-free maskedSum/maskedSqDevSum are bit-identical to the " +
       "scratch-filled r15 algorithm on random windows at all offsets") {
    // r16 moved the masked fill INTO the pairwise tree (no scratch array,
    // no tuple); this pins the new kernels against the literal old
    // algorithm — fill scratch (masked -> 0.0), sum(scratch) — element
    // for element, across every length class (n<8, 8..128 with
    // remainders, >128 recursion) and non-zero offsets.
    val rng = new scala.util.Random(42)
    val n = 700
    val v = Array.fill(n)(rng.nextGaussian() match {
      case x if rng.nextInt(40) == 0 => -0.0 // exercise the -0.0 + 0.0 rule
      case x => math.floor(x * 1e4) / 1e4    // step-quantized, like sensors
    })
    val mask = Array.fill(n)(rng.nextInt(5) == 0)
    val lens = Seq(1, 3, 7, 8, 9, 16, 33, 100, 127, 128, 129, 200, 389, 512)
    for (len <- lens; off <- Seq(0, 1, 13, n - len)) {
      val scratch = new Array[Double](len)
      var j = 0
      while (j < len) {
        scratch(j) = if (mask(off + j)) 0.0 else v(off + j); j += 1
      }
      val oldSum = graft.dsp.NumpyPairwise.sum(scratch, 0, len)
      val newSum = graft.dsp.NumpyPairwise.maskedSum(v, mask, off, len)
      assert(java.lang.Double.doubleToRawLongBits(oldSum) ==
        java.lang.Double.doubleToRawLongBits(newSum),
        s"maskedSum off=$off len=$len: $newSum != $oldSum")
      var cnt = 0
      j = 0
      while (j < len) { if (!mask(off + j)) cnt += 1; j += 1 }
      assert(cnt == graft.dsp.NumpyPairwise.maskedCount(mask, off, len))
      if (cnt > 0) {
        val mean = oldSum * 1.0 / cnt
        j = 0
        while (j < len) {
          if (mask(off + j)) scratch(j) = 0.0
          else { val d = v(off + j) - mean; scratch(j) = d * d }
          j += 1
        }
        val oldVar = graft.dsp.NumpyPairwise.sum(scratch, 0, len)
        val newVar =
          graft.dsp.NumpyPairwise.maskedSqDevSum(v, mask, off, len, mean)
        assert(java.lang.Double.doubleToRawLongBits(oldVar) ==
          java.lang.Double.doubleToRawLongBits(newVar),
          s"maskedSqDevSum off=$off len=$len: $newVar != $oldVar")
      }
    }
  }

  test("pairwise sum length classes agree with a compensated reference " +
       "within 1 ulp (sanity, not the bit contract)") {
    // the bit contract lives in the golden test above; this guards the
    // algorithm's basic correctness independently of any fixture file
    val rng = new scala.util.Random(7)
    (1 to 400 by 13).foreach { n =>
      val a = Array.fill(n)(rng.nextGaussian() * 1e3)
      val exact = a.sorted.foldLeft(BigDecimal(0))(_ + BigDecimal(_))
      val got = graft.dsp.NumpyPairwise.sum(a, 0, n)
      assert(math.abs(got - exact.toDouble) <=
        math.ulp(exact.toDouble.abs.max(1.0)) * n,
        s"n=$n pairwise sum off: $got vs $exact")
    }
  }
}
