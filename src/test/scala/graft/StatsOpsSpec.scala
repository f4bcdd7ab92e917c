package graft

import org.apache.spark.sql.functions._
import graft.ops.StatsOps

/** Key-skew profiler: planted hot key + null-key visibility + exact integer
  * share/salt arithmetic. */
class StatsOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("keySkewProfile surfaces the hot key, counts nulls, and computes " +
       "exact ppm shares and ceil-division salt factors") {
    // 100 rows: key 7 x 60, null x 25, keys 1..15 x 1 each
    val rows: Seq[Option[Long]] =
      Seq.fill(60)(Some(7L)) ++ Seq.fill(25)(None) ++ (1L to 15L).map(Some(_))
    val df = rows.toDF("k")
    val got = StatsOps.keySkewProfile(df, "k", k = 3, nPartitions = 10)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    // 17 distinct keys (7, null, 1..15 minus 7 = 1..15 includes 7? no:
    // 7 repeats merge) -> keys are {7, null, 1..15} = 16 distinct
    val expected = Seq(
      // rank, key, n, share_ppm = n*1e6 DIV 100, salt = ceil(n*10/100)
      (1L, Some("7"), 61L, 610000L, 7L, 16L, 100L),
      (2L, None, 25L, 250000L, 3L, 16L, 100L),
      (3L, Some("1"), 1L, 10000L, 1L, 16L, 100L))
    assert(got.toSeq == expected, s"got: ${got.toList}")
  }

  test("keySkewProfile on a uniform key recommends salt 1 everywhere") {
    val df = (1L to 40L).map(i => i % 8).toDF("k")
    val got = StatsOps.keySkewProfile(df, "k", k = 8, nPartitions = 16)
      .collect().map(r => (r.getLong(2), r.getLong(4)))
    assert(got.forall { case (n, salt) => n == 5L && salt == 2L },
      s"5/40 rows * 16 partitions = ceil(2.0) = 2: ${got.toList}")
    val one = StatsOps.keySkewProfile(df, "k", k = 8, nPartitions = 8)
      .collect().map(_.getLong(4))
    assert(one.forall(_ == 1L), s"exactly one partition's worth -> salt 1")
    intercept[IllegalArgumentException] {
      StatsOps.keySkewProfile(df, "k", k = 0)
    }
  }

  test("joinKeyOverlap: hand-checked distinct/shared/containment/null " +
       "counts; disjoint and identical key sets at the extremes") {
    import spark.implicits._
    val l = Seq(Option(1L), Option(1L), Option(2L), Option(3L), None, None)
      .toDF("k")
    val r = Seq(Option(2L), Option(3L), Option(4L), None).toDF("j")
    val row = graft.ops.StatsOps.joinKeyOverlap(l, r, "k", "j").collect().head
    def f(n: String) = row.getLong(row.fieldIndex(n))
    assert(f("n_left_keys") == 3 && f("n_right_keys") == 3 &&
      f("n_shared_keys") == 2, row.toString)
    assert(f("n_left_null_rows") == 2 && f("n_right_null_rows") == 1)
    assert(f("left_in_right_ppm") == 666666 &&
      f("right_in_left_ppm") == 666666, row.toString)
    val disjoint = graft.ops.StatsOps.joinKeyOverlap(
      Seq(1L, 2L).toDF("k"), Seq(9L).toDF("j"), "k", "j").collect().head
    assert(disjoint.getLong(disjoint.fieldIndex("n_shared_keys")) == 0 &&
      disjoint.getLong(disjoint.fieldIndex("left_in_right_ppm")) == 0)
    val same = graft.ops.StatsOps.joinKeyOverlap(
      Seq(5L, 6L).toDF("k"), Seq(5L, 6L, 6L).toDF("j"), "k", "j")
      .collect().head
    assert(same.getLong(same.fieldIndex("left_in_right_ppm")) == 1000000 &&
      same.getLong(same.fieldIndex("right_in_left_ppm")) == 1000000)
  }

  test("winsorize: values clamp into the group's exact percentile band; " +
       "interior values untouched; nulls pass through; groups isolate") {
    import spark.implicits._
    // group a: 1..100 (p5 = 5.95, p95 = 95.05 under linear interpolation),
    // group b: constant 7 -> band [7, 7], everything clamps to 7
    val rows = (1 to 100).map(i => ("a", Option(i.toDouble))) ++
      Seq(("b", Option(7.0)), ("b", Option(7.0)), ("b", None))
    val d = rows.toDF("g", "v")
    val got = graft.ops.StatsOps.winsorize(d, "g", "v", 0.05, 0.95)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val a = got.filter(_._1 == "a")
    assert(a.forall { case (_, v, w) =>
      (v, w) match {
        case (Some(x), Some(y)) =>
          if (x < 5.95) y == 5.95
          else if (x > 95.05) y == 95.05
          else y == x
        case _ => false
      }
    }, a.take(8).toSeq)
    // the band really clipped something on both sides
    assert(a.exists { case (_, v, w) => v != w })
    val b = got.filter(_._1 == "b")
    assert(b.collect { case (_, Some(_), w) => w }.forall(_.contains(7.0)))
    assert(b.exists { case (_, v, w) => v.isEmpty && w.isEmpty },
      "null value must stay null, not clamp to the bound")
    intercept[IllegalArgumentException] {
      graft.ops.StatsOps.winsorize(d, "g", "v", 0.9, 0.1)
    }
  }

  test("profileColumns: exact null/distinct counts; numeric min/max order " +
       "numerically before the string cast; all-null column -> null " +
       "min/max; column subset respected") {
    import spark.implicits._
    val df = Seq(
      (Option(2L), Option("b"), Option.empty[Long]),
      (Option(10L), Option("a"), Option.empty[Long]),
      (Option(10L), None, Option.empty[Long]),
      (None, Option("a"), Option.empty[Long])).toDF("n", "s", "z")
    val got = StatsOps.profileColumns(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)))).toSeq
    assert(got == Seq(
      // numeric ordering: min 2, max 10 (lexically "10" < "2")
      ("n", 4L, 1L, 2L, Some("2"), Some("10")),
      ("s", 4L, 1L, 2L, Some("a"), Some("b")),
      ("z", 4L, 4L, 0L, None, None)), s"got $got")
    val sub = StatsOps.profileColumns(df, Seq("s")).collect()
    assert(sub.length == 1 && sub.head.getString(0) == "s")
    intercept[IllegalArgumentException] {
      StatsOps.profileColumns(df.select())
    }
  }
}
