package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.EventOps

class EventOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  // user 1: events at 0s, 60s, 1860s (gap == exactly 1800 -> MERGES, the
  // event lands on the previous window's ts+gap bound), 3661s (gap 1801 >
  // 1800 -> SPLITS); user 2: one event; plus a null-user and a null-ts row
  private def fixture = Seq(
    (1L, Option(1L), Option(ts(0))),
    (2L, Option(1L), Option(ts(60))),
    (3L, Option(1L), Option(ts(1860))),
    (4L, Option(1L), Option(ts(3661))),
    (5L, Option(2L), Option(ts(500))),
    (6L, Option.empty[Long], Option(ts(100))),
    (7L, Option(1L), Option.empty[Timestamp])
  ).toDF("event_id", "user_id", "ts")

  test("sessionize: exact-gap merges, gap+1 splits, null user/ts rows " +
       "keep null labels without perturbing live sessions") {
    val out = EventOps.sessionize(fixture, "user_id", "ts", "event_id", 1800)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("session_seq")).map(_.toLong),
         Option(r.getAs[String]("session_id")))).toMap
    assert(out(1L) == (Some(0L), Some("1:0")))
    assert(out(2L) == (Some(0L), Some("1:0")))
    assert(out(3L) == (Some(0L), Some("1:0")),
      "an event exactly `gap` after the previous one must MERGE (session_window rule)")
    assert(out(4L) == (Some(1L), Some("1:1")),
      "a gap strictly over `gap` seconds must start a new session")
    assert(out(5L) == (Some(0L), Some("2:0")))
    assert(out(6L) == ((None, None)), "null user -> no session")
    assert(out(7L) == ((None, None)), "null ts -> no session")
  }

  test("sessionStats agrees with sessionize boundaries and reports " +
       "session_end = last event + gap") {
    val out = EventOps.sessionStats(fixture, "user_id", "ts", 1800,
        aggs = Seq(min(col("event_id")).as("first_event")))
      .select(col("user_id"), unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out == Set(
      (1L, 0L, (1860L + 1800L) * 1000000L, 3L),
      (1L, 3661L * 1000000L, (3661L + 1800L) * 1000000L, 1L),
      (2L, 500L * 1000000L, (500L + 1800L) * 1000000L, 1L)))
    // same number of sessions as distinct sessionize labels
    val labels = EventOps.sessionize(fixture, "user_id", "ts", "event_id", 1800)
      .filter(col("session_id").isNotNull)
      .select(col("session_id")).distinct().count()
    assert(labels == 3L)
  }

  test("tumblingStats buckets are epoch-aligned half-open hours; null ts " +
       "excluded; jsonField is lenient on missing keys and bad JSON") {
    val ev = Seq(
      (1L, Option(ts(3599)), """{"k": 2}"""),   // hour 0 (inclusive end edge)
      (2L, Option(ts(3600)), """{"k": 5}"""),   // hour 1 (half-open)
      (3L, Option(ts(3601)), """{"nope": 1}"""), // missing key -> null
      (4L, Option(ts(7199)), "not json"),        // malformed -> null
      (5L, Option.empty[Timestamp], """{"k": 9}""")
    ).toDF("event_id", "ts", "props")
    val out = EventOps.tumblingStats(ev, "ts", 3600, Nil,
        Seq(count(lit(1)).as("n"),
          sum(EventOps.jsonField(col("props"), "$.k", "long")).as("sum_k")))
      .select(unix_micros(col("bucket_start")).as("b"), col("n"), col("sum_k"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("sum_k")).map(_.toLong))).toSet
    assert(out == Set(
      (0L, 1L, Some(2L)),
      (3600L * 1000000L, 3L, Some(5L))))
  }

  test("funnel: steps must complete in order (at-or-after, same-ts counts), " +
       "counts are non-increasing, users missing step 1 never enter") {
    val ev = Seq(
      // u1 completes view->click->signup but its purchase PRECEDES signup
      (1L, ts(0), "view"), (1L, ts(10), "click"), (1L, ts(10), "signup"),
      (1L, ts(5), "purchase"),
      // u2 completes everything; signup and purchase share a timestamp
      (2L, ts(0), "view"), (2L, ts(1), "click"), (2L, ts(2), "signup"),
      (2L, ts(2), "purchase"),
      // u3 never views -> appears in no step
      (3L, ts(5), "click"), (3L, ts(6), "signup"), (3L, ts(7), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = graft.ops.EventOps.funnel(ev, "user_id", "ts", Seq(
        "view" -> (col("event_type") === "view"),
        "click" -> (col("event_type") === "click"),
        "signup" -> (col("event_type") === "signup"),
        "purchase" -> (col("event_type") === "purchase")))
      .collect().map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users"))
      .toMap
    assert(out == Map("view" -> 2L, "click" -> 2L, "signup" -> 2L,
      "purchase" -> 1L), s"got $out")
  }

  test("retention: first-event cohorts, period 0 = cohort size, horizon " +
       "filter drops late activity") {
    val day = 86400L
    val ev = Seq(
      (1L, ts(100)),            // u1 cohort day 0
      (1L, ts(2 * day + 5)),    // u1 active day 2
      (2L, ts(day + 3)),        // u2 cohort day 1
      (3L, ts(200)),            // u3 cohort day 0
      (3L, ts(35 * day))        // u3 active day 35 -> beyond horizon 30
    ).toDF("user_id", "ts")
    val out = graft.ops.EventOps.retention(ev, "user_id", "ts",
        cohortWidthSeconds = day, horizonPeriods = 30)
      .collect().map(r => (r.getAs[Long]("cohort_start_us"),
        r.getAs[Long]("period"), r.getAs[Long]("n_users"))).toSet
    val w = day * 1000000L
    assert(out == Set((0L, 0L, 2L), (0L, 2L, 1L), (w, 0L, 1L)), s"got $out")
  }

  test("transitions: counts consecutive same-session pairs, splits at the " +
       "gap, excludes null user/ts/type, and probs normalize per prev row") {
    val ev = Seq(
      // user 1: a->b->b within one session, then a gap > 1800 and b->a
      (1L, Option(1L), Option(ts(0)), Option("a")),
      (2L, Option(1L), Option(ts(10)), Option("b")),
      (3L, Option(1L), Option(ts(20)), Option("b")),
      (4L, Option(1L), Option(ts(2000)), Option("b")), // 1980s gap > 1800: no b->b
      (5L, Option(1L), Option(ts(2010)), Option("a")), // b->a
      // user 2: a->b (cross-user pairs must not count)
      (6L, Option(2L), Option(ts(0)), Option("a")),
      (7L, Option(2L), Option(ts(5)), Option("b")),
      // excluded rows: null user / null ts / null type — the null type
      // would otherwise fabricate a (b, null) and break the lag-null rule
      (8L, Option.empty[Long], Option(ts(1)), Option("a")),
      (9L, Option(1L), Option.empty[Timestamp], Option("a")),
      (10L, Option(2L), Option(ts(8)), Option.empty[String])
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventOps.transitions(ev, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // from a: a->b twice (u1, u2), nothing else -> prob 1.0
    // from b: b->b once, b->a once -> 0.5 each
    assert(got == Map(
      ("a", "b") -> (2L, 1.0),
      ("b", "b") -> (1L, 0.5),
      ("b", "a") -> (1L, 0.5)), s"got $got")
  }

  test("sessionize shares ONE exchange between its two windows") {
    val plan = EventOps.sessionize(fixture, "user_id", "ts", "event_id", 1800)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"expected the lag and running-sum windows to reuse one exchange, got $exchanges in:\n$plan")
  }

  test("ewma: seeds on the first non-null, folds alpha*x + (1-alpha)*prev " +
       "in time order with the id tie-break, carries through nulls, and " +
       "leading nulls emit null") {
    import spark.implicits._
    // user u: values 4, null, 8, 2 in ts order (tie on ts=20 broken by id);
    // user v: leading null, then 10
    val df = Seq(
      ("u", 10L, 1L, Option(4.0)),
      ("u", 20L, 2L, Option.empty[Double]), // carry: state stays 4.0
      ("u", 20L, 3L, Option(8.0)),          // 0.5*8 + 0.5*4 = 6.0
      ("u", 30L, 4L, Option(2.0)),          // 0.5*2 + 0.5*6 = 4.0
      ("v", 5L, 5L, Option.empty[Double]),  // no state yet -> null out
      ("v", 6L, 6L, Option(10.0))           // seeds at 10
    ).toDF("u", "ts", "id", "v")
    val got = EventOps.ewma(df, "u", "ts", "id", "v")
      .collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        Option(r.get(r.fieldIndex("ewma"))).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    assert(got == Seq(1L -> Some(4.0), 2L -> Some(4.0), 3L -> Some(6.0),
      4L -> Some(4.0), 5L -> None, 6L -> Some(10.0)), s"got $got")
    intercept[IllegalArgumentException] {
      EventOps.ewma(df, "u", "ts", "id", "v", alpha = 0.0)
    }
  }

  test("ewma identities: alpha = 1 reproduces the input; a constant " +
       "series stays constant at any alpha") {
    import spark.implicits._
    val df = (1L to 50L).map(i => ("u", i, i, (i % 7).toDouble))
      .toDF("u", "ts", "id", "v")
    val a1 = EventOps.ewma(df, "u", "ts", "id", "v", alpha = 1.0)
      .collect()
    a1.foreach { r =>
      assert(r.getDouble(r.fieldIndex("ewma")) ==
        r.getDouble(r.fieldIndex("v")), r.toString)
    }
    val const = (1L to 50L).map(i => ("u", i, i, 3.25)).toDF("u", "ts", "id", "v")
    val ac = EventOps.ewma(const, "u", "ts", "id", "v", alpha = 0.3)
      .collect()
    ac.foreach { r =>
      // fp tolerance: 0.3*c + 0.7*c re-associates the constant each step
      assert(math.abs(r.getDouble(r.fieldIndex("ewma")) - 3.25) < 1e-9,
        r.toString)
    }
  }

  test("contaminationReport: exact distinct-shingle counts and floor-div " +
       "ppm; clean docs emit no row") {
    import spark.implicits._
    // probe: "a b c d e" -> one 5-gram. doc 10 contains it among 3
    // distinct 5-grams; doc 11 shares nothing
    val docs = Seq(
      (10L, "a b c d e f g"),     // 5-grams: abcde, bcdef, cdefg
      (11L, "x y z w q r")).toDF("doc_id", "text")
    val probes = Seq(Tuple1("a b c d e")).toDF("text")
    val got = graft.ops.DedupOps.contaminationReport(
        docs, "doc_id", "text", probes, "text", shingleSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq((10L, 3L, 1L, 333333L)), s"got $got")
  }
}
