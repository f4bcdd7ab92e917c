package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side replay of the exact integer recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
                          dampingPpm: Long = 850000L,
                          totalUnits: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = ((1000000L - dampingPpm) * (totalUnits / n)) / 1000000L
    var rank = nodes.map(_ -> totalUnits / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / outDeg(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> (base + dampingPpm * in.getOrElse(v, 0L) / 1000000L)).toMap
    }
    rank
  }

  test("pageRank matches the driver-side integer recurrence exactly on a " +
       "graph with a dangling node, a sink hub, and a self-loop") {
    // 1 -> 2, 1 -> 3, 2 -> 3, 3 -> 3 (self-loop), 4 -> 3; 5 appears only
    // as a destination of 6 -> 5 where 6 is dangling-free; 7 -> 5 makes 5
    // a two-in sink; 2 is also dangling after its one edge? (no: 2 -> 3)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
      (6L, 5L), (7L, 5L))
    val got = GraphOps.pageRank(e.toDF("s", "d"), "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(e, iters = 4)
    assert(got == want, s"got $got want $want")
    // the self-looping sink accumulated the most rank; pure sources hold
    // only the base mass
    assert(got(3L) == got.values.max)
    assert(got(1L) == got(4L) && got(4L) == got(6L) && got(6L) == got(7L))
  }

  test("pageRank: iters = 0 returns the uniform init; null endpoints and " +
       "their edges drop; damping 0 gives every node the base mass") {
    val e = Seq((1L, 2L), (2L, 1L))
    val init = GraphOps.pageRank(e.toDF("s", "d"), "s", "d", iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(init == Map(1L -> 500000000000L, 2L -> 500000000000L))
    val withNulls = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(9L)),
      (java.lang.Long.valueOf(9L), null.asInstanceOf[java.lang.Long])
    ).toDF("s", "d")
    val nodes = GraphOps.pageRank(withNulls, "s", "d", iters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(nodes == Set(1L, 2L), s"null-edge endpoints leaked: $nodes")
    val undamped = GraphOps.pageRank(e.toDF("s", "d"), "s", "d",
        iters = 3, dampingPpm = 0L)
      .collect().map(r => r.getLong(1)).distinct
    assert(undamped.toSeq == Seq(500000000000L), undamped.toSeq)
  }

  test("pageRank conserves mass on a regular graph (no dangling nodes, " +
       "no floor loss when degrees divide evenly)") {
    // 4-cycle: out-degree 1 everywhere, so rank_u DIV 1 is lossless and
    // every step redistributes the full damped mass + base exactly
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val got = GraphOps.pageRank(e.toDF("s", "d"), "s", "d", iters = 6)
      .collect().map(r => r.getLong(1))
    assert(got.length == 4 && got.distinct.length == 1, got.toSeq)
    assert(got.head == 250000000000L)
  }

  test("iterative snapshots take the RELIABLE checkpoint path when a " +
       "checkpoint dir is set, with identical results (preemptible-fleet " +
       "mode of Snapshots.truncateLineage)") {
    val e = (0L until 40L).map(i => (i, (i * 7 + 3) % 40)) ++
      Seq((0L, 1L), (1L, 2L))
    val edf = e.toDF("s", "d")
    val plain = GraphOps.pageRank(edf, "s", "d", iters = 20)
      .orderBy("node").collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val reliable = GraphOps.pageRank(edf, "s", "d", iters = 20)
        .orderBy("node").collect().toSeq
      assert(reliable == plain)
      // the reliable path actually wrote checkpoint data
      val wrote = new java.io.File(dir).listFiles()
      assert(wrote != null && wrote.nonEmpty, s"no checkpoint data in $dir")
      // connected components under a checkpoint dir too (both variants)
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
      for (cc <- Seq(
        graft.ops.DedupOps.connectedMinLabels(pairs),
        graft.ops.DedupOps.connectedStars(pairs))) {
        val comps = cc.orderBy("id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(comps ==
          Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)), comps)
      }
    } finally {
      // Option(null) = None inside setCheckpointDir — clears the shared
      // session's dir so later suites stay on the local path
      spark.sparkContext.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
