package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.ops.GateOps

class GateOpsSpec extends SparkTestBase {
  import spark.implicits._

  // docs chosen so every rule has a first-failure and overlaps exist:
  //  1: passes everything
  //  2: short (fails min_chars AND min_tokens — first = min_chars)
  //  3: long enough but few tokens (fails min_tokens only)
  //  4: repetitive (fails diversity only)
  //  5: wrong lang only
  //  6: null text (fails min_chars/min_tokens/diversity via null = fail)
  private def docs = Seq(
    (1L, ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four"), "en"),
    (2L, "tiny", "en"),
    (3L, Seq("a", "b", "c", "d").map(_ * 50).mkString(" "), "en"),
    (4L, (Seq.fill(30)("spam").mkString(" ") + " " +
      Seq.fill(10)("ham").mkString(" ")).padTo(160, 'x').toString, "en"),
    (5L, ("alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu un deux trois quatre"), "fr"),
    (6L, null.asInstanceOf[String], "en"))
    .toDF("doc_id", "text", "lang")

  private def rules = GateOps.standardTextRules("text", "lang")

  test("gate: per-row verdicts — first failure in rule order, all failures " +
       "listed, null text fails closed") {
    val got = GateOps.gate(docs, rules)
      .select(col("doc_id"), col("kept"), col("fail_first"),
        array_join(col("failed_rules"), ","), col("n_failed"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.getString(2)).getOrElse(""), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got(0) == ((1L, true, "", "", 0L)))
    assert(got(1) == ((2L, false, "min_chars", "min_chars,min_tokens", 2L)))
    assert(got(2)._1 == 3L); assert(!got(2)._2)
    assert(got(2)._3 == "min_tokens")
    assert(got(3) == ((4L, false, "diversity", "diversity", 1L)))
    assert(got(4) == ((5L, false, "lang", "lang", 1L)))
    // null text: every text rule's predicate is NULL -> fail-closed; lang
    // passes, so it is NOT in the failed list
    assert(got(5) == ((6L, false, "min_chars",
      "min_chars,min_tokens,diversity", 3L)))
  }

  test("gate: rejects duplicate rule names and output-column collisions") {
    val dup = intercept[IllegalArgumentException] {
      GateOps.gate(docs, Seq("a" -> lit(true), "a" -> lit(false)))
    }
    assert(dup.getMessage.contains("duplicate"))
    val clash = intercept[IllegalArgumentException] {
      GateOps.gate(docs.withColumn("kept", lit(1)), Seq("a" -> lit(true)))
    }
    assert(clash.getMessage.contains("kept"))
    // case-INsensitive: under default spark.sql.caseSensitive=false a
    // pre-existing "KEPT" would be clobbered by withColumn("kept", ...)
    val clashCase = intercept[IllegalArgumentException] {
      GateOps.gate(docs.withColumn("KEPT", lit(1)), Seq("a" -> lit(true)))
    }
    assert(clashCase.getMessage.contains("kept"))
  }

  test("gateFunnel: hand-computed funnel — sequential attribution chains " +
       "n_in/n_out, independent counts expose shadowed rules") {
    val got = GateOps.gateFunnel(docs, rules)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    // 6 docs in. min_chars drops 2 and 6 (indep 2). min_tokens then sees
    // 4 and drops 3 (indep: 2, 3, 6 = 3). diversity sees 3, drops 4
    // (indep: 4, 6 = 2). lang sees 2, drops 5 (indep 1). 1 survives.
    assert(got(0) == ((0L, "min_chars", 6L, 2L, 4L, 2L)))
    assert(got(1) == ((1L, "min_tokens", 4L, 1L, 3L, 3L)))
    assert(got(2) == ((2L, "diversity", 3L, 1L, 2L, 2L)))
    assert(got(3) == ((3L, "lang", 2L, 1L, 1L, 1L)))
    // conservation: drops + survivors == total
    assert(got.map(_._4).sum + 1L == 6L)
  }

  test("gateObserved surfaces total/kept/per-rule failure counts to a " +
       "QueryExecutionListener, consistent with gateFunnel") {
    val (_, metrics) = ScalingProbe.runWithMetrics(spark,
      GateOps.gateObserved(docs, rules),
      waitForPrefix = GateOps.FunnelMetrics)
    val rows = metrics.filter(_._1.startsWith(GateOps.FunnelMetrics)).values
    assert(rows.nonEmpty, s"funnel metric missing; got ${metrics.keys}")
    val m = rows.head
    assert(m.getAs[Long]("total") == 6L)
    assert(m.getAs[Long]("kept") == 1L)
    // independent counts match the gateFunnel column for the same corpus
    val indep = GateOps.gateFunnel(docs, rules).collect()
      .map(r => (r.getString(1), r.getLong(5))).toMap
    rules.foreach { case (name, _) =>
      assert(m.getAs[Long](s"fail_$name") == indep(name),
        s"observed fail_$name != funnel independent count")
    }
  }

  test("gateObserved funnel counts arrive per micro-batch in streaming " +
       "progress (zero-extra-job streaming funnel)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val gated = GateOps.gateObserved(
      input.toDF().toDF("doc_id", "text", "lang"), rules)
    val q = gated.writeStream.format("noop").start()
    try {
      input.addData((1L, "short", "en"),
        (2L, ("alpha bravo charlie delta echo foxtrot golf hotel india " +
          "juliet kilo lima mike november oscar papa quebec romeo sierra " +
          "tango uniform victor whiskey xray yankee zulu one two three " +
          "four"), "en"))
      q.processAllAvailable()
      val om = q.lastProgress.observedMetrics.asScala
        .collectFirst { case (k, v) if k.startsWith(GateOps.FunnelMetrics) => v }
      assert(om.nonEmpty,
        s"no funnel metric in progress: ${q.lastProgress.observedMetrics}")
      assert(om.get.getAs[Long]("total") == 2L)
      assert(om.get.getAs[Long]("kept") == 1L)
      assert(om.get.getAs[Long]("fail_min_chars") == 1L)
    } finally q.stop()
  }

  test("gateFunnel row count is bounded by the rule count (one row per " +
       "rule), independent of corpus size") {
    val big = spark.range(0, 10000)
      .select(col("id").as("doc_id"),
        concat(lit("word "), col("id").cast("string")).as("text"),
        lit("en").as("lang"))
    val funnel = GateOps.gateFunnel(big, rules)
    assert(funnel.count() == 4L)
  }

  test("thresholdSweep: hand-computed keep curve, nulls clear nothing, " +
       "empty tiers emit spine rows, ppm is of the whole input") {
    import spark.implicits._
    val d = Seq((None: Option[Long], 3L), (Some(-10L), 3L), (Some(0L), 3L),
      (Some(5L), 3L), (Some(5L), 3L), (Some(20L), 3L))
      .toDF("score", "n_tok")
    val got = GateOps.thresholdSweep(d, "score", "n_tok", Seq(0L, 10L, 100L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // totals: 6 docs / 18 tokens. >=0: 4 docs 12 tok; >=10: 1 doc 3 tok;
    // >=100: the empty tier still emits
    assert(got == Map(
      0L -> ((4L, 12L, 666666L, 666666L)),
      10L -> ((1L, 3L, 166666L, 166666L)),
      100L -> ((0L, 0L, 0L, 0L))), s"got $got")
    // one corpus pass is invariant to layout
    val re = GateOps.thresholdSweep(d.repartition(5), "score", "n_tok",
        Seq(0L, 10L, 100L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(re == got)
    intercept[IllegalArgumentException] {
      GateOps.thresholdSweep(d, "score", "n_tok", Seq(10L, 0L))
    }
  }
}
