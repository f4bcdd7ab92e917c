package graft

import graft.ops.SampleOps

/** UniMax budget allocation (Chung et al. 2023) — closed-form water-filling
  * checked against hand-computed allocations. */
class UnimaxSpec extends SparkTestBase {
  import spark.implicits._

  // caps at 2 epochs: a=20, b=40, c=60, d=200; null/zero groups excluded
  private def counts = Seq(
    ("a", Some(10L)), ("b", Some(20L)), ("c", Some(30L)), ("d", Some(100L)),
    ("e", Some(0L)), ("f", None: Option[Long]))
    .toDF("grp", "n")

  private def alloc(budget: Long, epochsMicro: Long = 2000000L) =
    SampleOps.unimaxBudgets(counts, "grp", "n", budget, epochsMicro)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap

  test("capped prefix + equal split: B=150 caps a,b at 2 epochs, c,d " +
       "split the rest; zero/null-token groups emit no row") {
    val got = alloc(150L)
    // hand walk: sorted caps (20,40,60,200); 20*4<=150 cap, 40*3+20<=150
    // cap, 60*2+60>150 stop; R=90, k=2, share=45
    assert(got == Map(
      "a" -> ((10L, 20L, true, 20L)),
      "b" -> ((20L, 40L, true, 40L)),
      "c" -> ((30L, 60L, false, 45L)),
      "d" -> ((100L, 200L, false, 45L))), s"got $got")
  }

  test("remainder goes one token each to the first uncapped in cap order") {
    val got = alloc(151L) // R=91, share=45, rem=1 -> c gets the extra token
    assert(got("c")._4 == 46L && got("d")._4 == 45L, s"got $got")
  }

  test("all-capped: budgets equal caps, leftover stays unallocated; " +
       "budget sum never exceeds B") {
    val got = alloc(1000L)
    assert(got.values.forall(v => v._3 && v._4 == v._2), s"got $got")
    Seq(0L, 67L, 150L, 151L, 319L, 320L, 1000L).foreach { b =>
      val a = alloc(b)
      assert(a.values.map(_._4).sum <= b, s"B=$b over-allocated: $a")
    }
  }

  test("zero budget allocates zero everywhere; fractional epoch cap " +
       "floors exactly (3 tokens x 1.5 epochs = 4)") {
    assert(alloc(0L).values.forall(_._4 == 0L))
    val tiny = Seq(("x", 3L)).toDF("grp", "n")
    val got = SampleOps.unimaxBudgets(tiny, "grp", "n", 100L, 1500000L)
      .collect().head
    assert(got.getLong(2) == 4L, s"cap was ${got.getLong(2)}")
  }

  test("sampleToBudgets: rate ~ budget/n, full keep at budget >= n, " +
       "budget bumps only ADD docs (hash monotonicity), schema enforced") {
    val docs = (0L until 2000L).map(i => (i, if (i < 1000) "g1" else "g2"))
      .toDF("doc_id", "grp")
    def budgets(b1: Long) = Seq(("g1", 1000L, b1), ("g2", 1000L, 1500L))
      .toDF("grp", "n_tokens", "budget_tokens")
    val out = SampleOps.sampleToBudgets(docs, "doc_id", "grp", budgets(500L))
    // pure-filter contract: input column order preserved
    assert(out.columns.toSeq == Seq("doc_id", "grp"))
    val half = out.collect().map(_.getLong(0)).toSet
    val g1 = half.count(_ < 1000L)
    assert(g1 > 380 && g1 < 620, s"g1 rate off: $g1/1000")
    // budget >= n keeps the whole group (rate clamps to 1)
    assert(half.count(_ >= 1000L) == 1000, "g2 must keep everything")
    // monotonicity: the 500-budget sample is a subset of the 800-budget one
    val more = SampleOps.sampleToBudgets(docs, "doc_id", "grp", budgets(800L))
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(more), "raising a budget must only add documents")
    // fail-closed: a null budget or a zero token count gates the group OFF
    val broken = Seq(("g1", 1000L, None: Option[Long]), ("g2", 0L, Some(900L)))
      .toDF("grp", "n_tokens", "budget_tokens")
    assert(SampleOps.sampleToBudgets(docs, "doc_id", "grp", broken).count() == 0L,
      "null budget / zero tokens must ship nothing, not everything")
    intercept[IllegalArgumentException] {
      SampleOps.sampleToBudgets(docs, "doc_id", "grp",
        budgets(500L).withColumnRenamed("budget_tokens", "b"))
    }
  }

  test("allocation is invariant under input partitioning and epochs is " +
       "the exact double ratio") {
    val a = alloc(150L)
    val b = SampleOps.unimaxBudgets(counts.repartition(7), "grp", "n",
      150L, 2000000L)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(a == b)
    val eps = SampleOps.unimaxBudgets(counts, "grp", "n", 150L, 2000000L)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(eps("a") == 2.0 && eps("c") == 1.5 && eps("d") == 0.45)
  }
}
