package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchOps

class SketchOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("cmsSketch/cmsEstimate: estimates never undercount (one-sided " +
       "error), exact on a collision-free sketch, absent keys read as " +
       "collisions only, null keys carry no frequency") {
    // planted frequencies: a x 5, b x 3, c x 1, plus nulls that must vanish
    val occurrences = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
      Seq(null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("k")
    val d = 3; val w = 64
    val sketch = SketchOps.cmsSketch(occurrences, "k", d, w)
    val cells = sketch.collect()
    assert(cells.length <= d * w)
    // total mass per row = number of non-null occurrences (9)
    val perRow = sketch.groupBy("cms_row").agg(sum("cnt")).collect()
      .map(r => r.getLong(1))
    assert(perRow.length == d && perRow.forall(_ == 9L), perRow.toSeq)
    val probes = Seq(("a", 5L), ("b", 3L), ("c", 1L), ("zzz", 0L))
      .toDF("k", "true_n")
    val est = SketchOps.cmsEstimate(sketch, probes, "k", d, w)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // one-sided: est >= true count for every key, including the absent one
    est.foreach { case (k, (n, e)) =>
      assert(e >= n, s"undercount for $k: est $e < true $n") }
    // at 9 occurrences in a 64-wide sketch, min-over-3-rows is exact with
    // overwhelming margin for the planted keys; pin it to catch hash or
    // grouping regressions
    assert(est("a") == ((5L, 5L)) && est("b") == ((3L, 3L)) &&
      est("c") == ((1L, 1L)), est)
  }

  test("cmsSketch merge: union + re-aggregate of two shard sketches " +
       "equals the sketch of the concatenated corpus") {
    val shard1 = Seq("x", "x", "y").toDF("k")
    val shard2 = Seq("x", "z").toDF("k")
    val d = 2; val w = 32
    val merged = SketchOps.cmsSketch(shard1, "k", d, w)
      .unionByName(SketchOps.cmsSketch(shard2, "k", d, w))
      .groupBy("cms_row", "cms_bucket").agg(sum("cnt").as("cnt"))
    val direct = SketchOps.cmsSketch(shard1.unionByName(shard2), "k", d, w)
    val m = merged.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val g = direct.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m == g, s"merged $m != direct $g")
  }

  test("cmsEstimate under forced collisions (width 1): every estimate " +
       "is the full stream length — the documented overestimate mode") {
    val occ = Seq("a", "a", "b", "c").toDF("k")
    val sketch = SketchOps.cmsSketch(occ, "k", 2, 1)
    val probes = Seq("a", "b", "never-seen").toDF("k")
    val est = SketchOps.cmsEstimate(sketch, probes, "k", 2, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 4L, "b" -> 4L, "never-seen" -> 4L), est)
  }

  test("KLL quantile sketches: estimates within rank tolerance of exact; " +
       "merging batch sketches answers like a single pass; empty and " +
       "all-null groups yield null quantiles") {
    import graft.ops.SketchOps
    // group a: 1..1000 uniformly; group b: constant 7; group n: all nulls
    val rows = (1 to 1000).map(i => ("a", Some(i.toDouble))) ++
      Seq.fill(10)(("b", Some(7.0))) ++
      Seq.fill(3)(("n", None: Option[Double]))
    val d = rows.toDF("g", "v")
    val sk = SketchOps.quantileSketches(d, "g", "v", k = 200)
    val est = SketchOps.mergedQuantiles(sk, "g", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // rank error at k=200 is well under 3%: p50 of 1..1000 within [440, 560]
    val (p50a, p90a) = est("a")
    assert(p50a.exists(v => v > 440 && v < 560), s"p50(a) = $p50a")
    assert(p90a.exists(v => v > 840 && v < 960), s"p90(a) = $p90a")
    assert(est("b") == ((Some(7.0), Some(7.0))), est("b"))
    assert(est("n") == ((None, None)), est("n"))
    // batch-split merge: two halves' sketches union to the same answer
    // class as the single-pass sketch (identical data, same tolerance)
    val half1 = (1 to 500).map(i => ("a", i.toDouble)).toDF("g", "v")
    val half2 = (501 to 1000).map(i => ("a", i.toDouble)).toDF("g", "v")
    val unioned = SketchOps.quantileSketches(half1, "g", "v")
      .unionByName(SketchOps.quantileSketches(half2, "g", "v"))
    val m = SketchOps.mergedQuantiles(unioned, "g", Seq(0.5))
      .collect().head.getDouble(1)
    assert(m > 440 && m < 560, s"merged p50 = $m")
  }

  test("landed CMS: land + segment append equals the one-shot sketch; " +
       "re-delivered segments are skipped; param drift is refused") {
    val name = "graft_cms_spec_" + System.nanoTime()
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_bucketed/$name"
    val base = Seq("a", "a", "b").toDF("k")
    val more = Seq("a", "c", "c").toDF("k")
    try {
      SketchOps.landCmsSketch(base, "k", name, depth = 3, width = 32,
        path = Some(tmp))
      assert(SketchOps.appendToCmsSketch(more, "k", name, "seg-1"))
      // re-delivery of the same segment: skipped, counters unchanged
      assert(!SketchOps.appendToCmsSketch(more, "k", name, "seg-1"))
      val probes = Seq("a", "b", "c", "zz").toDF("k")
      val landed = SketchOps.cmsEstimateAgainstSketch(probes, "k", name)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val oneShot = SketchOps.cmsEstimate(
          SketchOps.cmsSketch(base.unionByName(more), "k", 3, 32),
          probes, "k", 3, 32)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(landed == oneShot, s"landed $landed != one-shot $oneShot")
      assert(landed("a") == 3L && landed("c") == 2L)
      // landing again with different params must refuse, not corrupt
      val err = intercept[IllegalArgumentException] {
        SketchOps.landCmsSketch(base, "k", name, depth = 2, width = 32,
          path = Some(tmp))
      }
      assert(err.getMessage.contains("depth, width, salt"))
      // estimating against a missing sketch fails loudly
      intercept[IllegalArgumentException] {
        SketchOps.cmsEstimateAgainstSketch(probes, "k", name + "_nope")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_meta")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_counters")
    }
  }

  test("heavyHitters: exactly the keys with count*k > n, exact counts, " +
       "under any partitioning; near-threshold keys adjudicated exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // n = 1000; k = 10 -> threshold: count > 100.
    // hot: 300 + 101 (barely over); cold: 100 (exactly n/k -> OUT),
    // 99, and 500 singletons
    val rows = Seq.fill(300)("hot") ++ Seq.fill(101)("warm") ++
      Seq.fill(100)("edge") ++ Seq.fill(99)("near") ++
      (1 to 400).map(i => s"one$i")
    assert(rows.length == 1000)
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("w").repartition(parts)
      val got = graft.ops.SketchOps.heavyHitters(df, "w", k = 10)
        .orderBy(desc("n_rows"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == Seq(("hot", 300L, 300000L), ("warm", 101L, 101000L)),
        s"parts=$parts got $got")
    }
    // all-distinct corpus: no heavy hitters, empty (not failing) result
    val none = SketchOpsSpecHelper.distinct1k(spark)
    assert(graft.ops.SketchOps.heavyHitters(none, "w", k = 10).count() == 0)
    intercept[IllegalArgumentException] {
      graft.ops.SketchOps.heavyHitters(rows.toDF("w"), "w", k = 1)
    }
  }

  test("mg_candidates_agg aggregates a STREAM (update mode): the summary " +
       "folds across micro-batches and keeps the planted heavy hitter") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val agg = input.toDF().toDF("w")
      .groupBy()
      .agg(org.apache.spark.sql.catalyst.expressions.graftsketch
        .MisraGriesExpressions.mgCandidatesAgg(col("w"), 10).as("cands"))
    val q = agg.writeStream.format("memory").queryName("mg_stream")
      .outputMode("update").start()
    try {
      // batch 1: hot key + fillers; batch 2: more fillers — the TypedImperativeAggregate
      // state must carry across micro-batches
      input.addData(Seq.fill(50)("hot") ++ (1 to 30).map(i => s"f$i"): _*)
      q.processAllAvailable()
      input.addData((31 to 60).map(i => s"g$i"): _*)
      q.processAllAvailable()
      val cands = spark.sql("SELECT cands FROM mg_stream")
        .collect().last.getSeq[String](0)
      assert(cands.size <= 9, s"state bound: $cands")
      assert(cands.contains("hot"), s"hot key evicted across batches: $cands")
    } finally q.stop()
  }

  test("mg_candidates_agg: superset guarantee holds on an adversarial " +
       "decrement-heavy stream; SQL surface registered") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 30% 'a' among 7000 distinct fillers: candidates MUST contain 'a'
    val rows = Seq.fill(3000)("a") ++ (1 to 7000).map(i => s"f$i")
    val df = rows.toDF("w").repartition(16)
    val cands = df.agg(
      org.apache.spark.sql.catalyst.expressions.graftsketch
        .MisraGriesExpressions.mgCandidatesAgg(col("w"), 20).as("c"))
      .head().getSeq[String](0)
    assert(cands.size <= 19, s"state bound violated: ${cands.size}")
    assert(cands.contains("a"), s"true heavy hitter evicted: $cands")
    df.createOrReplaceTempView("mg_spec_words")
    org.apache.spark.sql.catalyst.expressions.graftsketch
      .MisraGriesExpressions.registerInto(spark)
    val viaSql = spark.sql(
      "SELECT mg_candidates_agg(w, 20) FROM mg_spec_words")
      .head().getSeq[String](0)
    assert(viaSql.contains("a"))
  }

  test("landed KLL store: land + segment append answers within rank " +
       "tolerance; re-delivered segments are skipped; param drift is " +
       "refused") {
    val name = "graft_kll_spec_" + System.nanoTime()
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_bucketed/$name"
    val base = (1 to 500).map(i => ("a", i.toDouble)).toDF("g", "v")
    val more = (501 to 1000).map(i => ("a", i.toDouble)).toDF("g", "v")
    try {
      SketchOps.landQuantileSketches(base, "g", "v", name, k = 200,
        path = Some(tmp))
      assert(SketchOps.appendQuantileSketches(more, name, "seg-1"))
      // re-delivery of the same segment: skipped, store unchanged
      assert(!SketchOps.appendQuantileSketches(more, name, "seg-1"))
      assert(spark.table(s"${name}_qsketches").count() == 2)
      val p50 = SketchOps.quantilesAgainstSketches(spark, name, Seq(0.5))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(p50("a") > 440 && p50("a") < 560,
        s"merged p50 of 1..1000 = ${p50("a")}")
      // drift refusal (the q75 rule): re-land under a different k
      val ex = intercept[Exception] {
        SketchOps.landQuantileSketches(base, "g", "v", name, k = 400,
          path = Some(tmp))
      }
      assert(ex.getMessage.contains(name), ex.getMessage)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_meta")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_qsketches")
    }
  }

  test("q184 KLL band contract: every (source, rank) row lands within " +
       "its exact ±3%-rank band, bands are exact positional values, and " +
       "n_rows is the exact per-source count") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q184_kll_band_contract")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val srcCount = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("n_chars").isNotNull)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == srcCount.size * 5, rows.length)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"estimate outside band: $r")
      assert(r.getLong(2) == srcCount(r.getString(0)), s"n_rows: $r")
      assert(r.getLong(3) <= r.getLong(4), s"band inverted: $r")
    }
  }

  test("q185 HLL merge contract: the merged estimate sits inside the 3σ " +
       "envelope of the exact distinct count for every source, and the " +
       "exact counts equal q95's") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q185_hll_merge_contract")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"outside envelope: $r"))
    val q95 = SparkEntry.queries("q95_distinct_tokens")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r =>
      assert(r.getLong(1) == q95(r.getString(0)), s"exact mismatch: $r"))
  }
}

object SketchOpsSpecHelper {
  def distinct1k(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    (1 to 1000).map(i => s"d$i").toDF("w")
  }
}
