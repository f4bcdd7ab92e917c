package graft

import org.apache.spark.sql.functions._

import graft.ops.JoinOps

class JoinOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("asofJoin: latest at-or-before right row per key; no-match nulls; " +
       "equal-ts right row included; null payload fields do not fall " +
       "through to older rows") {
    val left = Seq(
      ("a", 5L, 100L),  // after ref@3 -> 30
      ("a", 3L, 101L),  // equal ts: ref@3 included ('<=') -> 30
      ("a", 1L, 102L),  // before any ref -> null
      ("a", 9L, 103L),  // after ref@7 whose VALUE is null -> null (not 30)
      ("b", 4L, 104L),  // key isolation: only b's ref@2 -> 20
      ("c", 4L, 105L)   // key with no refs at all -> null
    ).toDF("k", "ts", "ev")
    val right = Seq(
      ("a", 3L, Some(30.0)),
      ("a", 7L, None),    // a newer observation with a null VALUE
      ("b", 2L, Some(20.0)),
      ("b", 8L, Some(80.0)) // in the future of b's left row -> must not leak
    ).toDF("k", "ts", "v")
    val got = JoinOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("ev") ->
        (if (r.isNullAt(r.fieldIndex("v_asof"))) None
         else Some(r.getAs[Double]("v_asof")))).toMap
    assert(got(100L).contains(30.0))
    assert(got(101L).contains(30.0), "equal-ts right row must be included")
    assert(got(102L).isEmpty, "no eligible right row -> null")
    assert(got(103L).isEmpty,
      "a newer right row with a null FIELD is still the latest observation")
    assert(got(104L).contains(20.0))
    assert(got(105L).isEmpty)
    // left schema is preserved, payload arrives suffixed
    val out = JoinOps.asofJoin(left, right, "k", "ts", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "ts", "ev", "v_asof"))
    // one shuffle on the key; no join node at all in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(exchanges == 1, s"expected ONE key shuffle, got $exchanges:\n$plan")
  }

  test("asofJoin: null timestamps match nothing on either side") {
    // a right row with a null ts can never satisfy `right.ts <= left.ts`;
    // unguarded, ascending sort places it FIRST in the window and its
    // payload leaks into every otherwise-unmatched left row
    val left = Seq(
      ("a", Some(1L), 100L),            // before the only real ref -> null
      ("a", None: Option[Long], 101L)   // null left ts matches nothing
    ).toDF("k", "ts", "ev")
    val right = Seq(
      ("a", None: Option[Long], Some(5.0)), // null ts: ineligible, dropped
      ("a", Some(9L), Some(90.0))           // future of both left rows
    ).toDF("k", "ts", "v")
    val got = JoinOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getAs[Long]("ev") ->
        r.isNullAt(r.fieldIndex("v_asof"))).toMap
    assert(got(100L), "null-ts right payload must not leak into ev=100")
    assert(got(101L), "null-ts left row must match nothing")
    // null KEYS equal nothing under join semantics: the window would
    // otherwise group them into one partition and enrich null-key left
    // rows with null-key right payloads
    val nleft = Seq((None: Option[String], 10L, 200L))
      .toDF("k", "ts", "ev")
    val nright = Seq((None: Option[String], 5L, 7.0))
      .toDF("k", "ts", "v")
    val nk = JoinOps.asofJoin(nleft, nright, "k", "ts", Seq("v")).collect()
    assert(nk.length == 1 && nk(0).isNullAt(nk(0).fieldIndex("v_asof")),
      "null-key right payload must not enrich a null-key left row")
  }

  test("asofJoin refuses an output-column collision") {
    val l = Seq(("a", 1L, 1.0)).toDF("k", "ts", "v_asof")
    val r = Seq(("a", 1L, 2.0)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      JoinOps.asofJoin(l, r, "k", "ts", Seq("v"))
    }
  }

  test("fuzzyJoinBlocked: single substitutions are always recalled " +
       "(prefix OR suffix block survives), verify is exact, nulls drop") {
    val base = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "completely different!!"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "name")
    val probe = Seq(
      // substitution INSIDE the 6-char prefix -> only the suffix block hits
      (101L, "alphX beta gamma delta"),
      // substitution INSIDE the 6-char suffix -> only the prefix block hits
      (102L, "epsilon zeta eta thetX"),
      // two substitutions, one per block: candidates come from NEITHER
      // block (documented recall trade) -> no pair even though dist = 2
      (103L, "Xlpha beta gamma deltX"),
      // case-insensitive exact match -> dist 0
      (104L, "ALPHA BETA GAMMA DELTA"),
      (105L, null.asInstanceOf[String])
    ).toDF("id", "name")
    val got = JoinOps.fuzzyJoinBlocked(probe, base, "id", "id",
        "name", "name", maxDist = 2, blockChars = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((101L, 1L, 1L), (102L, 2L, 1L), (104L, 1L, 0L)),
      s"got $got")
    // dist above maxDist is filtered even when a block matches
    val strict = JoinOps.fuzzyJoinBlocked(probe, base, "id", "id",
        "name", "name", maxDist = 0, blockChars = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((104L, 1L)), s"got $strict")
    // short keys (below blockChars): both blocks are the whole string —
    // still one candidate row after distinct, dist computed once
    val sl = Seq((1L, "abc")).toDF("id", "name")
    val sp = Seq((9L, "abd")).toDF("id", "name")
    val short = JoinOps.fuzzyJoinBlocked(sp, sl, "id", "id",
        "name", "name", maxDist = 1, blockChars = 6).collect()
    // same length but different prefix-block value -> blocked out; exact
    // same string would hit. Use equal strings to assert the dedup:
    val same = JoinOps.fuzzyJoinBlocked(sl, sl, "id", "id",
        "name", "name", maxDist = 1, blockChars = 6).collect()
    assert(short.isEmpty && same.length == 1 && same(0).getLong(2) == 0L)
  }

  test("saltedJoin: result identical to the plain join (hot, cold, and " +
       "absent keys; factor <= 1 entries; null fact keys drop); dim rows " +
       "replicate factor-ways and fact salts stay inside the factor") {
    val fact = Seq(
      (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
      (4L, "cold", 40.0), (5L, "warm", 50.0),
      (6L, "orphan", 60.0), // no dim row -> inner join drops it
      (7L, null.asInstanceOf[String], 70.0)
    ).toDF("row_id", "k", "v")
    val dim = Seq(
      ("hot", 100L), ("cold", 200L), ("warm", 300L), ("unused", 400L)
    ).toDF("k", "attr")
    val hot = Map("hot" -> 3, "warm" -> 1, "missing" -> 5)
    val got = JoinOps.saltedJoin(fact, dim, "k", "row_id", hot)
      .select("row_id", "k", "v", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val want = fact.join(dim, Seq("k"))
      .select("row_id", "k", "v", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got == want, s"salted join diverged: got $got want $want")
    assert(want.map(_._1) == Set(1L, 2L, 3L, 4L, 5L))
    // empty hot map degenerates to the plain join
    val plain = JoinOps.saltedJoin(fact, dim, "k", "row_id", Map.empty)
      .count()
    assert(plain == 5)
  }

  test("intervalJoin: half-open containment across bucket boundaries; " +
       "intervals spanning many buckets; empty/inverted/null intervals " +
       "and null points match nothing; no duplicate pairs") {
    val points = Seq(0L, 5L, 9L, 10L, 19L, 20L, 35L, 100L)
      .map(p => (p, s"p$p")).toDF("x", "pid")
    val intervals = Seq(
      (1L, 5L, 10L),    // single bucket (w=10): hits 5, 9 (10 excluded)
      (2L, 8L, 22L),    // spans buckets 0,1,2: hits 9, 10, 19, 20 (22 excl)
      (3L, 0L, 1L),     // hits exactly 0
      (4L, 30L, 30L),   // empty -> nothing
      (5L, 40L, 30L),   // inverted -> nothing
      (6L, 90L, 200L)   // wide interval, many buckets: hits 100
    ).toDF("iid", "lo", "hi")
    val got = JoinOps.intervalJoin(points, intervals, "x", "lo", "hi",
        bucketWidth = 10L)
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Set((1L, 5L), (1L, 9L), (2L, 9L), (2L, 10L), (2L, 19L),
      (2L, 20L), (3L, 0L), (6L, 100L))
    assert(got.toSet == want, s"got ${got.toSet}")
    assert(got.length == got.toSet.size, "duplicate (interval, point) pairs")
    // nulls on either side match nothing
    val np = Seq(Tuple2(null.asInstanceOf[java.lang.Long], "pn"))
      .toDF("x", "pid")
    val ni = Seq((7L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(5L)))
      .toDF("iid", "lo", "hi")
    assert(JoinOps.intervalJoin(np, intervals, "x", "lo", "hi", 10L)
      .count() == 0)
    assert(JoinOps.intervalJoin(points, ni, "x", "lo", "hi", 10L)
      .count() == 0)
    // negative domain: floorDiv bucketing stays exact below zero
    val negP = Seq((-15L, "n1"), (-1L, "n2")).toDF("x", "pid")
    val negI = Seq((8L, -20L, -10L), (9L, -5L, 1L)).toDF("iid", "lo", "hi")
    val neg = JoinOps.intervalJoin(negP, negI, "x", "lo", "hi", 10L)
      .select("iid", "x").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(neg == Set((8L, -15L), (9L, -1L)), s"got $neg")
  }
}
