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
    val dg = graft.ops.TextOps.tempName(docs, "__digest")
    val withDigest = docs
      .withColumn(dg, sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
    withDigest.filter(col(dg).isNotNull)
      .dropDuplicatesWithinWatermark(dg)
      .unionByName(withDigest.filter(col(dg).isNull))
      .drop(dg)
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
    val ntokC = graft.ops.TextOps.tempName(docs, "__ntok")
    val skC = graft.ops.TextOps.tempName(docs, "__sketch")
    val withSketch = docs
      .withColumn(ntokC, size(toks))
      .withColumn(skC, graft.ops.DedupOps.simHash64(toks))
      .withWatermark(tsCol, watermark)
    withSketch.filter(col(ntokC) > 0)
      .dropDuplicatesWithinWatermark(skC)
      .unionByName(withSketch.filter(col(ntokC) <= 0 || col(ntokC).isNull))
      .drop(skC, ntokC)
  }

  /**
   * Streaming banded near-dedup, Hamming radius ≤ 3: the 64-bit SimHash is
   * split into `bands` (default 4) disjoint 16-bit sub-keys, and a document
   * is dropped when ANY of its band keys matches a retained document inside
   * the watermark horizon. Pigeonhole gives the guarantee: two sketches
   * within Hamming distance `bands - 1` differ in at most `bands - 1`
   * bands, so at least one band key is IDENTICAL — every document within
   * radius 3 of a fully-retained document is caught, where
   * [[streamingNearDedup]] only catches radius 0.
   *
   * Mechanically this is `bands` chained `dropDuplicatesWithinWatermark`
   * stages (one per band key — Spark runs multiple stateful operators in
   * append mode with a shared watermark). Keep-first semantics are against
   * the RETAINED stream, incremental-ingest style: a document dropped at
   * stage i never registers its later-stage band keys, so a chain
   * A ~ B ~ C where C only resembles the dropped B keeps C (the batch
   * connected-components dedup, [[graft.ops.DedupOps.nearDedupCC]], is the
   * transitive-closure tool). State: `bands` stores of one 16-bit key +
   * timestamp per retained doc in the horizon — bounded, body-free.
   *
   * Token-less documents pass through, as in [[streamingNearDedup]].
   */
  def streamingBandedNearDedup(docs: DataFrame, textCol: String, tsCol: String,
                               watermark: String = "10 minutes",
                               bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0,
      s"bands must divide 64, got $bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val toks = graft.ops.TextOps.tokens(col(textCol))
    val ntokC = graft.ops.TextOps.tempName(docs, "__ntok")
    val skC = graft.ops.TextOps.tempName(docs, "__sketch",
      suffixes = (0 until bands).map(i => s"_b$i"))
    def bandC(i: Int) = s"${skC}_b$i"
    val base = docs
      .withColumn(ntokC, size(toks))
      .withColumn(skC, graft.ops.DedupOps.simHash64(toks))
    val withBands = (0 until bands).foldLeft(base) { (d, i) =>
      d.withColumn(bandC(i),
        shiftrightunsigned(col(skC), i * width).bitwiseAND(lit(mask)))
    }.withWatermark(tsCol, watermark)
    val deduped = (0 until bands).foldLeft(withBands.filter(col(ntokC) > 0)) {
      (d, i) => d.dropDuplicatesWithinWatermark(bandC(i))
    }
    deduped
      .unionByName(withBands.filter(col(ntokC) <= 0 || col(ntokC).isNull))
      .drop((ntokC +: skC +: (0 until bands).map(bandC)): _*)
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
