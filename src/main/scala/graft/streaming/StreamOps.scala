package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/**
 * One band stage of [[StreamOps.streamingBandedNearDedup]]: keyed by the
 * band value, state = every retained (full 64-bit sketch, event-time ms)
 * in the watermark horizon. An incoming row is dropped iff some stored
 * sketch is within Hamming `radius` — band-key collisions beyond the
 * radius verify as distinct and pass through. State is pruned against the
 * watermark on every update, and an event-time timer sweeps the bucket
 * once the horizon passes its newest entry, so idle buckets free their
 * state without traffic.
 */
private[streaming] class BandDedupProcessor(skIdx: Int, tsIdx: Int,
    radius: Int, delayMs: Long) extends StatefulProcessor[Long, Row, Row] {

  @transient private var entries: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    entries = getHandle.getListState[(Long, Long)]("sketches",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Row],
                               tv: TimerValues): Iterator[Row] = {
    val horizon = tv.getCurrentWatermarkInMs() - delayMs
    val stored = entries.get().toVector
    val live = stored.filter(_._2 >= horizon)
    var sketches = live.map(_._1)
    var added = Vector.empty[(Long, Long)]
    val kept = Vector.newBuilder[Row]
    // event-time order (sketch tiebreak) -> deterministic replay
    rows.toVector
      .sortBy(r => (r.getTimestamp(tsIdx).getTime, r.getLong(skIdx)))
      .foreach { r =>
        val sk = r.getLong(skIdx)
        if (!sketches.exists(s => java.lang.Long.bitCount(s ^ sk) <= radius)) {
          kept += r
          sketches :+= sk
          added :+= (sk -> r.getTimestamp(tsIdx).getTime)
        }
      }
    // append-only when nothing expired: put() re-serializes the whole
    // retained set (O(N) write amplification per batch on a hot bucket);
    // appendList writes only the new entries
    if (live.size != stored.size) entries.put((live ++ added).toArray)
    else if (added.nonEmpty) entries.appendList(added.toArray)
    (live ++ added).map(_._2).maxOption
      .foreach(m => getHandle.registerTimer(m + delayMs))
    kept.result().iterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[Row] = {
    val remaining = entries.get()
      .filter(_._2 + delayMs > info.getExpiryTimeInMs).toArray
    if (remaining.isEmpty) entries.clear()
    else {
      entries.put(remaining)
      getHandle.registerTimer(remaining.map(_._2).max + delayMs)
    }
    Iterator.empty
  }
}

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
   * Streaming banded near-dedup, Hamming radius ≤ `bands - 1` (default 3),
   * VERIFIED: the 64-bit SimHash is split into `bands` (default 4) disjoint
   * sub-keys; a band key match only makes a retained document a CANDIDATE —
   * the full 64-bit sketches are then compared, and the incoming document
   * is dropped only when a candidate is within Hamming `radius`. Pigeonhole
   * gives the catch guarantee: two sketches within Hamming `bands - 1`
   * agree on at least one band, so they meet in that band's state bucket
   * and the verify succeeds. The verify step is what a bare band-key dedup
   * lacks: 16-bit keys collide at birthday scale 2^16, so an unverified
   * drop would delete ~`1-(1-n/2^16)^bands` of genuinely distinct docs at
   * `n` retained docs per horizon (~48% at n=10k) — here a random band
   * collision is compared against the full sketch and passes through.
   *
   * Mechanically: `bands` chained [[KeyValueGroupedDataset.transformWithState]]
   * stages in append mode, each keyed by one band value, each declaring
   * `tsCol` as its output event-time column so the stages legally chain
   * under the global-watermark correctness check. Per-stage state is the
   * full (sketch, event-time) pair per retained doc in the horizon —
   * 16 bytes/doc/band, body-free — pruned by watermark on every update and
   * by event-time timers when a bucket goes idle. REQUIRES the RocksDB
   * state store provider (`spark.sql.streaming.stateStore.providerClass`
   * = ...state.RocksDBStateStoreProvider), the provider built for exactly
   * this column-family state shape; the default HDFS-backed provider does
   * not support transformWithState.
   *
   * Drop semantics sit BETWEEN keep-first-against-retained and transitive
   * closure: every dropped document is within Hamming `radius` of some
   * EARLIER document in the horizon, but that earlier document may itself
   * have been dropped. A document dropped at stage i has already registered
   * its (sketch, ts) in stages 0..i-1, and those residual registrations
   * shadow later lookalikes until the watermark evicts them — so in a chain
   * A ~ B ~ C where C only resembles the dropped B, C is dropped when its
   * shared band with B lands in a stage before the one that dropped B, and
   * kept when it lands at or after it. Exact keep-first-against-retained
   * would need cross-stage registration confirmation (a second pass the
   * chained-stage topology cannot express); exact transitive closure is the
   * batch connected-components dedup,
   * [[graft.ops.DedupOps.nearDedupConnected]].
   * Every drop is still a genuine near-dup of an earlier arrival, which is
   * the contract ingest dedup needs. Within a micro-batch each bucket
   * processes rows in event-time order, so replays are deterministic.
   *
   * Token-less documents pass through, as in [[streamingNearDedup]].
   */
  def streamingBandedNearDedup(docs: DataFrame, textCol: String, tsCol: String,
                               watermark: String = "10 minutes",
                               bands: Int = 4, radius: Int = -1): DataFrame = {
    val toks = graft.ops.TextOps.tokens(col(textCol))
    val ntokC = graft.ops.TextOps.tempName(docs, "__ntok")
    val skC = graft.ops.TextOps.tempName(docs, "__sketch")
    // the watermark node sits BEFORE the token-count split, shared by both
    // branches: token-less traffic must keep advancing the event-time
    // watermark (state eviction in the dedup stages stalls otherwise), and
    // the pass-through branch must not reach downstream stateful consumers
    // unwatermarked
    val base = docs
      .withColumn(ntokC, size(toks))
      .withColumn(skC, graft.ops.DedupOps.simHash64(toks))
      .withWatermark(tsCol, watermark)
    val deduped = bandedDedupOnSketch(base.filter(col(ntokC) > 0), skC, tsCol,
      watermark, bands, radius, applyWatermark = false)
    deduped
      .unionByName(base.filter(col(ntokC) <= 0 || col(ntokC).isNull))
      .drop(ntokC, skC)
  }

  /** Sketch-level core of [[streamingBandedNearDedup]]: dedups on an
    * existing 64-bit sketch column. Factored out so the collision/verify
    * semantics are testable with planted sketches. `applyWatermark = false`
    * when the caller already watermarked `tsCol` upstream (e.g. a node
    * shared with a pass-through branch). */
  private[graft] def bandedDedupOnSketch(df: DataFrame, sketchCol: String,
                                         tsCol: String, watermark: String,
                                         bands: Int, radiusIn: Int,
                                         applyWatermark: Boolean = true): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64, got $bands")
    val radius = if (radiusIn < 0) bands - 1 else radiusIn
    require(radius <= 64, s"radius must be <= 64, got $radius")
    // the pigeonhole guarantee only covers distance <= bands-1: a pair at
    // distance d <= bands-1 shares a band; d in (bands-1, radius] pairs are
    // dropped IF they happen to share a band, caught probabilistically
    val width = 64 / bands
    val delayMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
        .fromIntervalString(watermark)
      require(iv.months == 0, s"watermark must not use months, got $watermark")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val spark = df.sparkSession
    val provider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass").getOrElse("")
    require(provider.contains("RocksDBStateStoreProvider"),
      "streamingBandedNearDedup uses transformWithState, which requires " +
      "spark.sql.streaming.stateStore.providerClass = " +
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val rowEnc: Encoder[Row] = Encoders.row(df.schema)
    val skIdx = df.schema.fieldIndex(sketchCol)
    val tsIdx = df.schema.fieldIndex(tsCol)
    // withWatermark only ahead of stage 1: each stage re-declares tsCol as
    // its output event-time column (the transformWithState chaining
    // contract), and re-applying withWatermark on a declared column is a
    // watermark redefinition error
    val start = if (applyWatermark) df.withWatermark(tsCol, watermark) else df
    // a null event-time row cannot participate in watermark-bounded state
    // (getTimestamp would NPE in the processor, or the row would be
    // silently late-filtered) — route it around the stateful chain,
    // mirroring the null-digest handling in streamingExactDedup
    val chained = (0 until bands).foldLeft(start.filter(col(tsCol).isNotNull)) { (d, i) =>
      d.groupByKey { r =>
          (r.getLong(skIdx) >>> (i * width)) &
            (if (width == 64) -1L else (1L << width) - 1L)
        }(Encoders.scalaLong)
        .transformWithState(
          new BandDedupProcessor(skIdx, tsIdx, radius, delayMs), tsCol,
          OutputMode.Append(), rowEnc)
    }
    chained.unionByName(start.filter(col(tsCol).isNull))
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
