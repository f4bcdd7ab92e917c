package graft

import org.apache.spark.sql.functions._

/**
 * Guards the COMMITTED golden-oracle artifacts (golden_oracle/, round 12)
 * against silent drift:
 *
 *  - q86's corpus-fingerprint index must cover every driver SF: the
 *    oracle SQL selects rows WHERE corpus_key = count:sum(length(text))
 *    computed over the live documents table, so a regenerated testdata
 *    drop (new content, new fingerprint) would silently select ZERO rows
 *    and fail the driver gate late. This spec computes the same
 *    fingerprint with Spark and fails at `sbt test` time instead, naming
 *    the regeneration script.
 *  - the 7 reference-executed files must exist, read, and be non-empty.
 */
class GoldenOracleSpec extends SparkTestBase {

  private val goldenDir = "golden_oracle"

  test("q86 oracle parquet covers the corpus fingerprint of every driver " +
       "SF (count:sum(length(text)) — the oracle SQL's selection key)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory,
      "driver testdata unavailable")
    val golden = spark.read.parquet(s"$goldenDir/q86_bpe_tokenize.parquet")
      .groupBy(col("corpus_key")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val r = d.agg(count(lit(1)).as("c"), sum(length(col("text"))).as("l")).head()
      val key = s"${r.getLong(0)}:${r.getLong(1)}"
      assert(golden.contains(key),
        s"sf$sf documents fingerprint $key has no rows in the committed " +
        s"q86 golden parquet (keys: ${golden.keys.mkString(", ")}) — the " +
        "testdata changed; regenerate with scripts/gen_golden_oracle_bpe.py")
      assert(golden(key) == r.getLong(0),
        s"sf$sf: golden has ${golden(key)} rows for $key, corpus has " +
        s"${r.getLong(0)} docs")
    }
  }

  test("the 8 reference-executed golden files exist, read, and are non-empty") {
    val expected = Map(
      "q16_cnv_read" -> 199L, "q17_casts_meta" -> 2L,
      "q18_rosette_golden" -> 12L, "q19_btl_read" -> 48L,
      "q20_multiformat_read" -> 4L, "q37_section" -> 56L,
      "q38_bottle_stats" -> 48L, "q181_qc_chain" -> 84564L)
    expected.foreach { case (name, rows) =>
      val n = spark.read.parquet(s"$goldenDir/$name.parquet").count()
      assert(n == rows, s"$name.parquet has $n rows, expected $rows — " +
        "regenerate with scripts/gen_golden_oracle.py and re-verify")
    }
  }

  test("q181 quantization margin: no anchored reference value sits near a " +
       "floor(v*1e5 + 1/pi) boundary (the guard that makes the 1-ULP " +
       "pandas-Kahan vs engine-plain-sum mean difference unobservable)") {
    // the engine and the reference compute bin means whose doubles can
    // differ in the last bit; the committed values must therefore keep a
    // wide margin to the quantization boundary so both sides floor to the
    // same integer. Measured margin on the r13 artifacts: 1.1e-4 grid
    // units; guard at 1e-5 (still 1e8 x the ULP noise).
    val g = spark.read.parquet(s"$goldenDir/q181_qc_chain.parquet")
      .filter(col("channel").isin(SparkEntry.qcChainChannels: _*))
      .filter(col("value").isNotNull)
    val shifted = col("value") * lit(1e5) + lit(0.31830988618)
    val dist = abs(shifted - round(shifted, 0))
    val m = g.agg(min(dist).as("min_dist"), count(lit(1)).as("n")).head()
    // 37,908 anchored cells minus the 34 all-NaN bins (press_check wipes
    // whole pressure reversals; a bin whose every sample was masked)
    assert(m.getLong(1) == 37874L,
      s"anchored non-null q181 cells = ${m.getLong(1)}, expected 37874")
    assert(m.getDouble(0) > 1e-5,
      f"q181 min boundary distance ${m.getDouble(0)}%.2e <= 1e-5 — a " +
      "regenerated golden landed near the quantization boundary; pick a " +
      "different offset or investigate the generator")
  }

  test("q181b flip list is EMPTY — the refExact despike leaves no " +
       "knife-edge exclusions (r15 contract)") {
    // Through r14 this artifact enumerated the summation-order knife-edge
    // cells both sides of q181b anti-joined (86 after the plateau fix).
    // r15 retired it: the QC chain's despike replays the reference's
    // numpy.ma arithmetic bit-for-bit (CastOps.despike refExact +
    // dsp.NumpyPairwise), so all 46,656 cells anchor with NO exclusion.
    // The committed file stays as the zero-row proof; any growth means an
    // engine regression (gen_q181b_flips.py fails loudly on >0 flips).
    val flips = spark.read.parquet(s"$goldenDir/q181b_flips.parquet")
    val n = flips.count()
    assert(n == 0L, s"q181b flip list has $n cells — since r15 it must be " +
      "EMPTY (refExact despike is bit-exact); a non-empty regeneration " +
      "means the engine regressed, fix that instead of committing it")
  }

  test("q181 anchored channels cover exactly SparkEntry.qcChainChannels " +
       "and the full 2,916-bin spine per channel") {
    val g = spark.read.parquet(s"$goldenDir/q181_qc_chain.parquet")
    val chans = g.select(col("channel")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(SparkEntry.qcChainChannels.forall(chans.contains),
      s"missing channels: ${SparkEntry.qcChainChannels.filterNot(chans.contains)}")
    val spine = g.filter(col("channel").isin(SparkEntry.qcChainChannels: _*))
      .groupBy(col("channel")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spine.values.forall(_ == 2916L),
      s"per-channel bin counts != 2916: ${spine.filter(_._2 != 2916L)}")
  }
}
