package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface. The reference is batch-only (files), but the
 * engine's data model — many casts keyed by `cast_id`, ordered by scan —
 * extends naturally to live instrument feeds: `readStream` -> the same
 * column expressions -> watermarked windowed aggregation, plus
 * `mapGroupsWithState` for the inherently sequential QC checks.
 *
 * Everything here is micro-batch-agnostic: the same code runs on
 * `MemoryStream` (tests), Kafka, or file streams.
 */
object StreamOps {

  /** One live sample from an instrument feed. */
  case class Sample(castId: String, ts: Timestamp, scan: Long,
                    pressure: Double, value: Double)

  /** Per-cast running state for online pressure-reversal detection —
    * the streaming form of `press_check` (ctd/processing.py:93-109): track
    * the running max of inversion references; a sample is flagged when its
    * pressure drops below that max. */
  case class PressState(lastPressure: Double, runMaxRef: Double)

  case class CheckedSample(castId: String, scan: Long, pressure: Double,
                           value: Double, reversal: Boolean)

  /**
   * Watermarked per-cast windowed aggregation: mean/min/max pressure and
   * value per (cast, time window). Late samples beyond `watermark` are
   * dropped; state is bounded, so this runs indefinitely.
   */
  def windowedCastStats(samples: DataFrame, windowDur: String = "10 seconds",
                        watermark: String = "30 seconds"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("castId"), window(col("ts"), windowDur))
      .agg(
        count(lit(1)).as("n"),
        avg(col("pressure")).as("mean_pressure"),
        min(col("pressure")).as("min_pressure"),
        max(col("pressure")).as("max_pressure"),
        avg(col("value")).as("mean_value"))

  /**
   * Streaming exact dedup: drop documents whose sha2-256 digest was already
   * seen within the watermark horizon. Same digest-keyed principle as the
   * batch `DedupOps.exactDedup` — state stores 32-byte digests, never
   * bodies — and `dropDuplicatesWithinWatermark` evicts state once the
   * event-time watermark passes, so the query runs indefinitely with
   * bounded memory (an unwatermarked dropDuplicates would grow state
   * forever at 1e9 docs/day).
   */
  def streamingExactDedup(docs: DataFrame, textCol: String, tsCol: String,
                          watermark: String = "10 minutes"): DataFrame = {
    // null-text docs have a null digest, and dropDuplicates treats null keys
    // as EQUAL — every null-text doc after the first would be silently
    // dropped; they have no content to dedup on, so they pass through
    val withDigest = docs
      .withColumn("__digest", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
    withDigest.filter(col("__digest").isNotNull)
      .dropDuplicatesWithinWatermark("__digest")
      .unionByName(withDigest.filter(col("__digest").isNull))
      .drop("__digest")
  }

  /**
   * Streaming NEAR-dedup, sketch-exact: drop documents whose 64-bit SimHash
   * over the token stream was already seen within the watermark horizon.
   * Token-identical documents — reformatted boilerplate, punctuation-only
   * variants — collide exactly (Hamming distance 0), which covers the
   * overwhelming share of streaming duplicates while keeping state at one
   * 8-byte key per unique doc in the horizon. A full banded-LSH
   * Hamming-radius join is a batch job ([[graft.ops.DedupOps]]); this is
   * the streaming-budget approximation of it, same state-eviction contract
   * as [[streamingExactDedup]].
   *
   * Documents with NO tokens (null/empty/non-alphanumeric text) pass
   * through: they all share the empty sketch, and dropping every
   * punctuation-only doc after the first would be a silent data loss, not
   * a dedup.
   */
  def streamingNearDedup(docs: DataFrame, textCol: String, tsCol: String,
                         watermark: String = "10 minutes"): DataFrame = {
    val toks = graft.ops.TextOps.tokens(col(textCol))
    val withSketch = docs
      .withColumn("__ntok", size(toks))
      .withColumn("__sketch", graft.ops.DedupOps.simHash64(toks))
      .withWatermark(tsCol, watermark)
    withSketch.filter(col("__ntok") > 0)
      .dropDuplicatesWithinWatermark("__sketch")
      .unionByName(withSketch.filter(col("__ntok") <= 0 || col("__ntok").isNull))
      .drop("__sketch", "__ntok")
  }

  /**
   * Online press_check via `mapGroupsWithState`: within each micro-batch the
   * group's samples are sorted by scan and folded through the running
   * reversal state, which persists across batches. (flatMapGroupsWithState
   * variant; Append-mode compatible.)
   */
  /** `idleTimeout`: evict a cast's state after this much processing-time
    * inactivity — REQUIRED for unbounded live feeds (ever-new cast_ids
    * would otherwise accumulate one PressState each, forever). None (the
    * default) keeps state indefinitely: correct for bounded cast sets, and
    * the right default for `processAllAvailable`-style drives — processing-
    * time timeouts schedule continuous empty timeout-check batches under
    * the default 0 ms trigger (a livelock for tests; production queries
    * enabling the timeout should also set a processing-time trigger). */
  def streamingPressCheck(samples: Dataset[Sample],
                          idleTimeout: Option[String] = None): Dataset[CheckedSample] = {
    import samples.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout() else GroupStateTimeout.NoTimeout()
    samples
      .groupByKey(_.castId)
      .flatMapGroupsWithState[PressState, CheckedSample](
        OutputMode.Append(), timeoutConf) {
        (castId: String, it: Iterator[Sample], state: GroupState[PressState]) =>
          if (state.hasTimedOut) {
            // cast idle past the timeout is finished — drop its state (a
            // straggler after that restarts clean, flagging conservatively)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              PressState(Double.NegativeInfinity, Double.NegativeInfinity))
            val out = it.toSeq.sortBy(_.scan).map { s =>
              // inversion start: previous sample was higher than this one ->
              // previous pressure becomes a reversal reference
              val ref = if (s.pressure < st.lastPressure)
                math.max(st.runMaxRef, st.lastPressure) else st.runMaxRef
              val flagged = s.pressure < ref
              st = PressState(s.pressure, ref)
              CheckedSample(castId, s.scan, s.pressure, s.value, flagged)
            }
            state.update(st)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }
}
