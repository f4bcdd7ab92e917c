package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / splitting for training-data pipelines. A split
 * must be a pure function of the ROW KEY — not of partitioning, row order,
 * or an RNG — so re-running the pipeline (or running it on a different
 * cluster layout) assigns every document to the same split. The md5-based
 * 31-bit hash is the same engine-portable family MinHash uses, so split
 * assignment is exactly reproducible in the DuckDB oracle (and any other
 * engine a consumer re-implements it in).
 */
object SampleOps {

  /** Codegen'd md5-31 of "salt:key" (graftdedup.Md5Hash31Expr — native, no
    * UDF boundary on the full-corpus sampling/splitting paths). */
  private def keyHash(key: Column, salt: String): Column =
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions
      .md5Hash31(concat_ws(":", lit(salt), key.cast("string")))

  /** Stable split id in [0, nSplits) from the key column + salt. Change the
    * salt to draw an independent split. */
  def splitId(key: Column, nSplits: Int, salt: String = "graft"): Column =
    keyHash(key, salt) % nSplits

  /** Assign train/val/test-style splits: adds `split` in [0, nSplits). */
  def hashSplit(df: DataFrame, keyCol: String, nSplits: Int,
                salt: String = "graft"): DataFrame =
    df.withColumn("split", splitId(col(keyCol), nSplits, salt))

  /** Cut for `hash < cut` over the INCLUSIVE [0, 2^31 - 1] hash range:
    * scaled by 2^31 (not 2^31 - 1) so rate 1.0 keeps EVERY row, including
    * the ~2^-31 of keys hashing to exactly 2^31 - 1. */
  private def cutOf(rate: Double): Long = (rate * (DedupOps.P31 + 1).toDouble).toLong

  /** Deterministic keep-rate sample: keep rows whose hash lands under
    * `rate` of the 31-bit space. Map-side, no shuffle, stable across runs. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double,
                   salt: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(keyHash(col(keyCol), salt) < cutOf(rate))
  }

  /**
   * Deterministic STRATIFIED sample: per-stratum keep rates (e.g. keep 100%
   * of low-resource languages, 10% of English) — the standard corpus
   * rebalancing step before training. Map-side like [[sampleByHash]]: each
   * row's fate is a pure function of (salt, key), the stratum only selects
   * the cut, so no shuffle, no stratum-size pre-pass, stable across runs
   * and engines. Strata absent from `rates` fall back to `defaultRate`.
   */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, stratumCol: String,
                             rates: Map[String, Double], defaultRate: Double = 1.0,
                             salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    // fold the rate table into one codegen'd CASE chain; deterministic
    // order so plans (and oracles) are reproducible
    val cut = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(cutOf(defaultRate))) { case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(cutOf(r))).otherwise(acc)
      }
    df.filter(keyHash(col(keyCol), salt) < cut)
  }

  /**
   * Deterministic sequence PACKING: group consecutive docs (in `orderCol`
   * order within each `splitCol` partition) into packs of at most `budget`
   * tokens — the pretraining step that concatenates documents into
   * fixed-length training sequences. The pack id is the running token
   * total integer-divided by the budget, i.e. a greedy sequential packer
   * whose assignment is a pure function of the ordered token counts: fully
   * window-expressible (one shuffle on `splitCol`), reproducible on any
   * engine, and parallel across splits — at 10^9 docs the split column
   * (e.g. a [[hashSplit]] over 10^4 splits) bounds every window partition.
   * Docs longer than `budget` spill across pack boundaries (`pack_offset`
   * records where in the pack a doc starts); truncation is caller policy.
   */
  def packSequences(df: DataFrame, splitCol: String, orderCol: String,
                    tokenCountCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(splitCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // cumulative tokens BEFORE the current doc decide which pack it starts in
    val cumBefore = coalesce(sum(col(tokenCountCol)).over(w), lit(0L))
    df.withColumn("pack_id", (cumBefore / lit(budget)).cast("long"))
      .withColumn("pack_offset", (cumBefore % lit(budget)).cast("long"))
  }
}
