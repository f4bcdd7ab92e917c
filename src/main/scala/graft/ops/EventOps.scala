package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Event-stream analytics over the `events` table family: gap-based
 * sessionization (per-row labeling AND per-session aggregation), tumbling
 * event-time windows, and JSON property extraction. The reference library is
 * batch-profile-only, but the engine's `events` surface (repo:TESTDATA.md)
 * is the natural home for the session/window operators every
 * clickstream-scale pipeline needs; all of them are expressed with Spark's
 * native window machinery so Catalyst plans them (SessionWindow /
 * TumblingWindow nodes, WindowExec), and every rule below is a pure
 * function of (user, timestamp) so a DuckDB oracle can replay it exactly
 * on the microsecond integers.
 *
 * Session rule (shared by all three forms, and by Spark's own
 * `session_window`): an event STARTS a new session iff it is the user's
 * first event or `ts - prev_ts > gap` (Spark merges an event landing
 * exactly on the previous window's `ts + gap` bound — verified against
 * SessionWindow exec, EventOpsSpec pins it). Comparisons run on
 * `unix_micros` integers — no double arithmetic anywhere in the boundary
 * decision, so engines cannot drift.
 *
 * Scale shape: ONE hash exchange on the user column for either session
 * form (the label's two windows share one Exchange+Sort, same reuse the
 * despike chain relies on); tumbling windows are map-side (the bucket is a
 * scalar function of the timestamp) followed by a standard two-phase hash
 * aggregate. Sessions are per-user and users are bounded (10^3..10^6
 * events), so no skew handling is needed — a pathological single-user
 * firehose would surface in the group-size metrics like any hot key.
 */
object EventOps {

  /** Microsecond integer of a timestamp column. Accepts TIMESTAMP and
    * TIMESTAMP_NTZ (parquet `isAdjustedToUTC=false`, what the events table
    * carries): the NTZ→LTZ cast applies the session timezone, which shifts
    * every event equally — session gaps and boundaries are invariant — and
    * is the identity under the engine's UTC sessions. */
  private def micros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /**
   * Label every event with its session: adds `session_seq` (0-based per
   * user, in time order) and `session_id` (`"user:seq"`). Ties on the
   * timestamp break by `idCol` so the labeling is deterministic on any
   * partitioning. Rows with a null user or null timestamp cannot belong to
   * a session: both output columns stay null (they sort after the live
   * rows, so they never perturb the running count).
   */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, idCol: String,
                 gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val gapUs = gapSeconds * 1000000L
    val us = micros(col(tsCol))
    val order = Seq(us.asc_nulls_last, col(idCol).asc_nulls_last)
    val wLag = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val wRun = Window.partitionBy(col(userCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val newFlag = TextOps.tempName(df, "__new_session")
    val prev = lag(us, 1).over(wLag)
    val live = col(userCol).isNotNull && col(tsCol).isNotNull
    df.withColumn(newFlag,
        when(!live, lit(0L))
          .when(prev.isNull || (us - prev) > gapUs, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_seq",
        when(live, sum(col(newFlag)).over(wRun) - 1L))
      .withColumn("session_id",
        when(live, concat_ws(":", col(userCol).cast("string"),
          col("session_seq").cast("string"))))
      .drop(newFlag)
  }

  /**
   * Per-session aggregation via Spark's native `session_window`: one row
   * per (user, session) with `session_start` (first event), `session_end`
   * (last event + gap, the half-open window bound Spark reports),
   * `n_events`, plus any caller `aggs`. Null-user / null-timestamp rows are
   * excluded up front (they have no session — the same rule as
   * [[sessionize]]). Boundaries agree with [[sessionize]] by construction:
   * both split only at `diff > gap`.
   */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapSeconds: Long, aggs: Seq[Column] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    val base = count(lit(1)).as("n_events") +: aggs
    df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol),
        session_window(col(tsCol), s"$gapSeconds seconds").as("session"))
      .agg(base.head, base.tail: _*)
      .withColumn("session_start", col("session.start"))
      .withColumn("session_end", col("session.end"))
      .drop("session")
  }

  /**
   * Tumbling event-time windows: one row per (bucket, `keyCols`...) with
   * `bucket_start`/`bucket_end` timestamps plus the caller's `aggs`. The
   * bucket is epoch-aligned (Spark's `window()` origin), a pure scalar of
   * the timestamp — map-side, then a standard two-phase hash aggregate.
   * Rows with a null timestamp have no bucket and are excluded.
   */
  def tumblingStats(df: DataFrame, tsCol: String, widthSeconds: Long,
                    keyCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(widthSeconds > 0, s"widthSeconds must be positive, got $widthSeconds")
    require(aggs.nonEmpty, "tumblingStats needs at least one aggregate")
    df.filter(col(tsCol).isNotNull)
      .groupBy(window(col(tsCol), s"$widthSeconds seconds").as("bucket")
        +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("bucket.start"))
      .withColumn("bucket_end", col("bucket.end"))
      .drop("bucket")
  }

  /** Typed scalar from a JSON string column (`get_json_object` + cast):
    * missing key, null document, or malformed JSON all yield null — the
    * lenient semi-structured props accessor. Codegen'd path, no UDF. */
  def jsonField(json: Column, path: String, dataType: String): Column =
    get_json_object(json, path).cast(dataType)
}
