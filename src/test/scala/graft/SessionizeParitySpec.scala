package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.EventOps

/**
 * [[EventOps.sessionizeBucketed]] must be BIT-IDENTICAL to
 * [[EventOps.sessionize]] — the bucketed variant exists purely to bound
 * partition sizes (the r14 skew record's one >3x per-stage task skew is
 * the plain op's whole-user window partition under a 10%-of-events bot
 * user), never to change semantics. Parity is pinned on every shape the
 * fixup arithmetic has to get right: sessions spanning two and MANY
 * buckets, a boundary pair exactly AT the gap (merges) and one past it
 * (splits), timestamp ties broken by id across a bucket edge, null
 * users/timestamps, a hot user next to cold ones, and bucket widths
 * smaller than the gap (every session spans buckets).
 */
class SessionizeParitySpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def compare(df: DataFrame, gap: Long, bucket: Long): Unit = {
    def canon(d: DataFrame) =
      d.select(col("event_id"), col("user_id"), col("ts"),
          col("session_seq"), col("session_id"))
        .orderBy(col("event_id")).collect().toSeq
    val plain = canon(EventOps.sessionize(df, "user_id", "ts", "event_id",
      gapSeconds = gap))
    val bucketed = canon(EventOps.sessionizeBucketed(df, "user_id", "ts",
      "event_id", gapSeconds = gap, bucketSeconds = bucket))
    assert(plain.size == bucketed.size)
    plain.zip(bucketed).foreach { case (a, bb) =>
      assert(a == bb, s"parity break: plain=$a bucketed=$bb " +
        s"(gap=$gap bucket=$bucket)")
    }
  }

  test("parity on sessions spanning bucket boundaries, at-gap and " +
       "past-gap edges, and many-bucket chains") {
    // bucket = 100 s, gap = 30 s. user 1: a session crossing one edge
    // (95 -> 110, diff 15 <= 30), a boundary diff EXACTLY the gap
    // (170 -> 200, 30 <= 30 merges), one past it (200 -> 231 splits),
    // and a chain spanning four buckets (400..700 in 25 s steps).
    // user 2: all inside one bucket. user 3: single event.
    val rows =
      Seq(1L -> 10L, 1L -> 40L, 1L -> 95L, 1L -> 110L, 1L -> 170L,
        1L -> 200L, 1L -> 231L) ++
        (400L to 700L by 25L).map(1L -> _) ++
        Seq(2L -> 50L, 2L -> 60L, 2L -> 95L, 3L -> 410L)
    val df = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, ts(t)) }
      .toDF("event_id", "user_id", "ts")
    compare(df, gap = 30, bucket = 100)
  }

  test("parity with ties on the timestamp broken by id across a bucket " +
       "edge, and with null users / null timestamps") {
    val df = Seq(
      (0L, Option(1L), Option(ts(99))),
      (1L, Option(1L), Option(ts(100))), // tie pair at the bucket edge
      (2L, Option(1L), Option(ts(100))),
      (3L, Option(1L), Option(ts(100))),
      (4L, Option(1L), Option(ts(160))),
      (5L, Option(1L), None),            // null ts: null outputs
      (6L, Option.empty[Long], Option(ts(50))), // null user: null outputs
      (7L, Option(9L), Option(ts(100)))
    ).toDF("event_id", "user_id", "ts")
    compare(df, gap = 30, bucket = 100)
  }

  test("parity on a hot user (LCG schedule) at several bucket widths, " +
       "including widths below the gap") {
    var s = 7L
    val rows = (0 until 3000).map { i =>
      s = (s * 6364136223846793005L + 1442695040888963407L) &
        0x7fffffffffffffffL
      val user = if (i % 10 != 0) 0L else 1L + (s % 17L) // user 0 ~ 90%
      s = (s * 6364136223846793005L + 1442695040888963407L) &
        0x7fffffffffffffffL
      (i.toLong, user, ts((s % 100000L)))
    }
    val df = rows.toDF("event_id", "user_id", "ts")
    Seq(50L, 333L, 3600L, 1000000L).foreach(b =>
      compare(df, gap = 120, bucket = b))
  }

  test("the fixup never widens partitions: the events-side windows " +
       "partition on (user, bucket), not user alone") {
    val df = Seq((0L, 1L, ts(10))).toDF("event_id", "user_id", "ts")
    val plan = EventOps.sessionizeBucketed(df, "user_id", "ts", "event_id",
      gapSeconds = 30, bucketSeconds = 100)
      .queryExecution.optimizedPlan.toString()
    // the event-side windows must carry the bucket column in their
    // partition spec (only the session-LEVEL fixup windows, over the
    // tiny (user, bucket) stats rows, partition on the user alone)
    assert(plan.contains("__sb_bucket"),
      s"expected bucket-keyed event windows in the plan:\n${plan.take(2000)}")
  }
}
