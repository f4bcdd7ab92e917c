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
