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

  private def hash31Udf = udf { s: String =>
    if (s == null) 0L else DedupOps.md5Hash31(s)
  }

  /** Stable split id in [0, nSplits) from the key column + salt. Change the
    * salt to draw an independent split. */
  def splitId(key: Column, nSplits: Int, salt: String = "graft"): Column =
    hash31Udf(concat_ws(":", lit(salt), key.cast("string"))) % nSplits

  /** Assign train/val/test-style splits: adds `split` in [0, nSplits). */
  def hashSplit(df: DataFrame, keyCol: String, nSplits: Int,
                salt: String = "graft"): DataFrame =
    df.withColumn("split", splitId(col(keyCol), nSplits, salt))

  /** Deterministic keep-rate sample: keep rows whose hash lands under
    * `rate` of the 31-bit space. Map-side, no shuffle, stable across runs. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double,
                   salt: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val cut = (rate * DedupOps.P31.toDouble).toLong
    df.filter(hash31Udf(concat_ws(":", lit(salt), col(keyCol).cast("string"))) < cut)
  }
}
