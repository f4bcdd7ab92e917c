package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.ops.SimOps

/**
 * Banded sign-LSH: the recall/candidate-volume trade (VERDICT r5 #1) and
 * the reference-object plane plumbing (VERDICT r5 #6).
 *
 * The planted-pair construction is exact: v = cos(t)*u + sin(t)*w with u, w
 * orthonormal gives cosine(u, v) = cos(t) up to float noise, so every pair
 * sits at a KNOWN similarity inside [0.955, 0.98] and the expected per-band
 * collision probability (1 - t/pi)^r is computable in closed form. With 150
 * pairs the binomial std is ~2-3%, far from both asserted thresholds.
 */
class SimSearchSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32

  /** 150 planted pairs at exact cosines in [0.955, 0.98] (ids 2i, 2i+1)
    * plus 300 independent background vectors (ids 1000+; pairwise cos is
    * ~N(0, 1/32), never near 0.95). Deterministic: seed 99. */
  private lazy val plantedCorpus: Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(99)
    def rand(): Array[Double] = Array.fill(dim)(rng.nextGaussian())
    def scale(v: Array[Double], s: Double) = v.map(_ * s)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def unit(v: Array[Double]) = scale(v, 1.0 / norm(v))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val pairs = (0 until 150).flatMap { i =>
      val u = unit(rand())
      val g = rand()
      // Gram-Schmidt: w is a unit vector orthogonal to u
      val proj = dot(g, u)
      val w = unit(g.zip(u).map { case (gi, ui) => gi - proj * ui })
      val cosTarget = 0.955 + rng.nextDouble() * 0.025 // [0.955, 0.98]
      val t = math.acos(cosTarget)
      val v = u.zip(w).map { case (ui, wi) => math.cos(t) * ui + math.sin(t) * wi }
      Seq((2L * i, u), (2L * i + 1, v))
    }
    val background = (0 until 300).map(i => (1000L + i, rand()))
    pairs ++ background
  }

  private def recallOf(nPlanes: Int, bands: Int): Double = {
    val e = plantedCorpus.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val found = SimOps.embeddingNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.95, nPlanes = nPlanes, bands = bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 150).count(i => found.contains((2L * i, 2L * i + 1))) / 150.0
  }

  test("banded LSH: 8 bands x 12 planes recovers >=90% of planted cos>=0.95 " +
       "pairs where a single 24-plane band recovers <30%") {
    val singleBand = recallOf(nPlanes = 24, bands = 1)
    val banded     = recallOf(nPlanes = 12, bands = 8)
    assert(singleBand < 0.30,
      s"single 24-plane band recall $singleBand — expected the recall cliff")
    assert(banded >= 0.90,
      s"8x12 banded recall $banded — banding should recover the planted pairs")
  }

  test("random projection 32->16 keeps planted cos>=0.955 partners top-1 " +
       "for >=90% of queries; an exact copy projects to cosine exactly 1.0") {
    val m = SimOps.projectionMatrix(outDim = 16, dim = dim, seed = 7L)
    // exact copy of vector 0 under a fresh id: identical input -> identical
    // projection -> cosine 1.0, deterministically
    val withCopy = plantedCorpus :+ (9999L, plantedCorpus.head._2)
    val e = withCopy.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val proj = e.select(col("vec_id"),
      SimOps.randomProject(col("embedding"), m).as("p"))
    val queries = proj.filter(col("vec_id") < 300 || col("vec_id") === 9999L)
    val top = SimOps.cosineTopK(proj, queries, "vec_id", "p", k = 1)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
    assert(top(9999L) == ((0L, 1.0)),
      s"exact copy must project to cosine exactly 1.0, got ${top(9999L)}")
    val recall = (0 until 150).count { i =>
      top.get(2L * i).exists(_._1 == 2L * i + 1)
    } / 150.0
    assert(recall >= 0.9, s"projected top-1 partner recall $recall")
  }

  test("banded results are a superset of single-band results at the same planes") {
    val e = plantedCorpus.take(200).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    def pairs(bands: Int) =
      SimOps.embeddingNearDupPairs(e, "vec_id", "embedding",
          threshold = 0.95, nPlanes = 12, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val one = pairs(1)
    val four = pairs(4)
    assert(one.subsetOf(four),
      s"band 0 uses the base seed, so its collisions must survive: ${one -- four}")
    assert(four.size >= one.size)
  }

  test("bandedSignSketch matches a reference Scala fold (float + double, " +
       "length mismatch -> 0 bits)") {
    val bands = 3
    val planeSets = (0 until bands).map(b => SimOps.hyperplanes(5, 8, 42L + b))
    def reference(v: Array[Double]): Seq[Long] =
      planeSets.map { planes =>
        planes.zipWithIndex.map { case (p, j) =>
          if (p.length != v.length) 0L
          else {
            var d = 0.0; var i = 0
            while (i < v.length) { d += v(i) * p(i); i += 1 }
            if (d >= 0.0) 1L << j else 0L
          }
        }.sum
      }
    val rng = new scala.util.Random(5)
    val vecsD = (0 until 40).map(i => (i.toLong, Array.fill(8)(rng.nextGaussian())))
    val short = Seq((99L, Array.fill(5)(1.0))) // length mismatch: every bit 0
    val gotD = (vecsD ++ short).map { case (id, v) => (id, v.toSeq) }
      .toDF("id", "v")
      .select($"id", SimOps.bandedSignSketch($"v", planeSets).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (vecsD ++ short).foreach { case (id, v) =>
      assert(gotD(id) == reference(v), s"double vec $id")
    }
    // float input: the expression widens each element exactly like the
    // float->double cast in the reference fold
    val vecsF = vecsD.map { case (id, v) => (id, v.map(_.toFloat)) }
    val gotF = vecsF.map { case (id, v) => (id, v.toSeq) }.toDF("id", "v")
      .select($"id", SimOps.bandedSignSketch($"v", planeSets).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecsF.foreach { case (id, v) =>
      assert(gotF(id) == reference(v.map(_.toDouble)), s"float vec $id")
    }
  }

  test("trained IVF codebook beats seed-sample recall on a clustered corpus") {
    // 4 tight clusters; ids arranged so the 4 LOWEST ids all sit in cluster
    // 0 — the seed-sample codebook is blind to the other three clusters,
    // the maximin+Lloyd codebook is not
    val rng = new scala.util.Random(21)
    val d = 16
    val centers = Array.fill(4)(Array.fill(d)(rng.nextGaussian() * 3))
    val rows = (0 until 400).map { i =>
      (i.toLong, centers(i % 4).map(_ + rng.nextGaussian() * 0.1).toSeq)
    }
    // reassign ids cluster-major: ids 0-99 cluster 0, 100-199 cluster 1, ...
    val ordered = rows.sortBy { case (id, _) => ((id % 4).toInt, id) }
      .zipWithIndex.map { case ((_, v), newId) => (newId.toLong, v) }
    val e = ordered.toDF("vec_id", "embedding")
    val q = e.filter($"vec_id" % 97 === 0) // a few queries across clusters
    val brute = SimOps.cosineTopK(e, q, "vec_id", "embedding", 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(trained: Boolean): Double = {
      val got = SimOps.ivfTopK(e, q, "vec_id", "embedding",
          k = 5, nCells = 4, nProbe = 1, trainCodebook = trained)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    val seedRecall = recall(trained = false)
    val trainedRecall = recall(trained = true)
    assert(trainedRecall > seedRecall,
      s"trained=$trainedRecall should beat seed-sample=$seedRecall")
    assert(trainedRecall >= 0.9,
      s"with one centroid per cluster and nProbe=1, recall should be high: $trainedRecall")
  }

  test("trainIvfCodebook is deterministic and covers all clusters") {
    val rng = new scala.util.Random(33)
    val d = 8
    val centers = Array.fill(3)(Array.fill(d)(rng.nextGaussian() * 4))
    val e = (0 until 300).map { i =>
      (i.toLong, centers(i % 3).map(_ + rng.nextGaussian() * 0.05).toSeq)
    }.toDF("vec_id", "embedding")
    val cb1 = SimOps.trainIvfCodebook(e, "vec_id", "embedding", 3)
    val cb2 = SimOps.trainIvfCodebook(e, "vec_id", "embedding", 3)
    assert(cb1.map(_._1).toSeq == cb2.map(_._1).toSeq)
    assert(cb1.zip(cb2).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "two runs over the same corpus must produce identical centroids")
    // every true cluster center is near (cos > 0.99) some trained centroid
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dd = a.zip(b).map { case (x, y) => x * y }.sum
      dd / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    centers.foreach { c =>
      val best = cb1.map { case (_, v) => cos(c, v) }.max
      assert(best > 0.99, s"a true cluster center has no nearby centroid (cos $best)")
    }
  }

  test("banded lshCosineTopK recovers planted neighbors a single band " +
       "misses; bands=1 equals the historical single-band results") {
    val e = plantedCorpus.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    // queries = the even ids of the first 40 planted pairs; the planted
    // partner (odd id, cos in [0.955, 0.98]) is the true nearest neighbor
    val queries = e.filter(col("vec_id") < 80 && col("vec_id") % 2 === 0)
    def partnerRecall(bands: Int, nPlanes: Int): Double = {
      val got = SimOps.lshCosineTopK(e, queries, "vec_id", "embedding",
          k = 3, nPlanes = nPlanes, bands = bands)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (0 until 40).count(i => got.contains((2L * i, 2L * i + 1))) / 40.0
    }
    val single = partnerRecall(bands = 1, nPlanes = 20)
    val banded = partnerRecall(bands = 8, nPlanes = 10)
    assert(single < 0.5,
      s"single 20-plane band found $single of planted partners — expected a miss rate")
    assert(banded >= 0.9,
      s"8x10 banded top-k found only $banded of planted partners")
    // bands = 1 reproduces the historical plan's results exactly
    val hist = SimOps.lshCosineTopK(e, queries, "vec_id", "embedding",
        k = 3, nPlanes = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaParam = SimOps.lshCosineTopK(e, queries, "vec_id", "embedding",
        k = 3, nPlanes = 8, bands = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(hist == viaParam)
  }

  test("hyperplanes ride as reference objects — no plane literals in the plan") {
    val rng = new scala.util.Random(3)
    val e = (0L until 50L).map(i => (i, Seq.fill(64)(rng.nextGaussian())))
      .toDF("vec_id", "embedding")
    // 48 planes x 64 dims = 3072 doubles: the literal-array form embedded
    // every one as a Literal node; the reference-object form embeds none
    val df = SimOps.lshCosineTopK(e, e.limit(2), "vec_id", "embedding",
      k = 5, nPlanes = 48)
    val doubleLits = df.queryExecution.optimizedPlan.collect { case p =>
      p.expressions.map(_.collect {
        case l: Literal if l.dataType == DoubleType => l
      }.size).sum
    }.sum
    assert(doubleLits < 100,
      s"$doubleLits double literals in the plan — planes are being inlined")
  }

  test("landed ANN index: row-identical to direct ivfTopK; probed-cells-only scan; " +
      "parameter pinning") {
    val e = plantedCorpus.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val queries = e.filter(col("vec_id").isin(0L, 2L, 1000L))
    val idx = "graft_test_ann_idx"
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann").toString
    try {
      SimOps.landAnnIndex(e, "vec_id", "embedding", idx, nCells = 8,
        path = Some(s"$tmp/$idx"))
      val indexed = SimOps.annTopKAgainstIndex(queries, "vec_id", "embedding",
        idx, k = 4, nProbe = 3)
      val direct = SimOps.ivfTopK(e, queries, "vec_id", "embedding",
        k = 4, nCells = 8, nProbe = 3)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(rows(indexed) == rows(direct),
        "indexed ANN must be row-identical to the direct ivfTopK path")
      assert(rows(indexed).nonEmpty)

      // the cells scan must carry a partition prune on __cell (probed cells
      // only) — a full-corpus scan voids the index's point. Formatted
      // explain, because AQE's adaptive wrapper hides scan nodes from
      // TreeNode.collect
      val planStr = indexed.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(planStr.contains("_cells"), s"no _cells scan in plan:\n$planStr")
      assert("""PartitionFilters: \[[^\]]*__cell""".r.findFirstIn(planStr).isDefined,
        s"cells scan has no __cell partition filter — the probe set is not " +
        s"pruning:\n$planStr")

      // landing again with different parameters must fail loudly, not
      // silently serve a mismatched codebook
      val err = intercept[IllegalArgumentException] {
        SimOps.landAnnIndex(e, "vec_id", "embedding", idx, nCells = 4,
          path = Some(s"$tmp/$idx"))
      }
      assert(err.getMessage.contains("n_cells") &&
        err.getMessage.contains("!= requested"), err.getMessage)
      // re-landing with the SAME parameters is the idempotent no-op path
      SimOps.landAnnIndex(e, "vec_id", "embedding", idx, nCells = 8,
        path = Some(s"$tmp/$idx"))
    } finally {
      Seq("_meta", "_centroids", "_cells").foreach { s =>
        spark.sql(s"DROP TABLE IF EXISTS $idx$s")
      }
    }
  }

  test("appendAnnIndex: appended vectors become findable under the frozen " +
       "codebook; row-identical to direct IVF over the union; idempotent") {
    val all = semanticCorpus().toDF("vec_id", "embedding")
    // land ids < 10000 (the 4 clusters), append the planted copies
    // (10000..10009) — appended ids are ABOVE every landed id, so the
    // landed codebook == the full-union codebook and direct ivfTopK on
    // the union is the exact expected result
    val landed = all.filter(col("vec_id") < 10000L)
    val appended = all.filter(col("vec_id") >= 10000L)
    val queries = all.filter(col("vec_id").isin(0L, 5L))
    val idx = "graft_test_ann_append_idx"
    val tmp = java.nio.file.Files.createTempDirectory("graft_annap").toString
    try {
      SimOps.landAnnIndex(landed, "vec_id", "embedding", idx, nCells = 8,
        path = Some(s"$tmp/$idx"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val before = SimOps.annTopKAgainstIndex(queries, "vec_id", "embedding",
        idx, k = 3, nProbe = 3)
      assert(!rows(before).exists(_._3 >= 10000L),
        "exact copies are not indexed yet — they cannot appear")
      assert(SimOps.appendAnnIndex(appended, "vec_id", "embedding", idx) == 10L)
      val after = SimOps.annTopKAgainstIndex(queries, "vec_id", "embedding",
        idx, k = 3, nProbe = 3)
      // the exact copy of each query (cos 1.0) must now be its top hit
      val top = rows(after).filter(_._2 == 1)
      assert(top == Set((0L, 1, 10000L, 1.0), (5L, 1, 10005L, 1.0)),
        s"appended exact copies must rank first: $top")
      val direct = SimOps.ivfTopK(all, queries, "vec_id", "embedding",
        k = 3, nCells = 8, nProbe = 3)
      assert(rows(after) == rows(direct),
        "indexed-after-append must equal direct IVF over the union")
      // idempotent: the same batch folds in nothing the second time
      assert(SimOps.appendAnnIndex(appended, "vec_id", "embedding", idx) == 0L)
      // compaction collapses the land+append file history to one file per
      // cell and preserves every probe row
      val (nBefore, nAfter) = SimOps.compactAnnIndex(spark, idx)
      assert(nAfter <= nBefore, s"compaction grew files: $nBefore -> $nAfter")
      val nCellsUsed = spark.table(s"${idx}_cells")
        .select("__cell").distinct().count()
      assert(nAfter <= nCellsUsed,
        s"expected <= one file per cell ($nCellsUsed), got $nAfter")
      val afterCompact = SimOps.annTopKAgainstIndex(queries, "vec_id",
        "embedding", idx, k = 3, nProbe = 3)
      assert(rows(afterCompact) == rows(after),
        "compaction must be row-preserving: identical probe results")
    } finally {
      Seq("_meta", "_centroids", "_cells").foreach { s =>
        spark.sql(s"DROP TABLE IF EXISTS $idx$s")
      }
    }
  }

  /** 4 tight clusters, cluster-major ids (0-99 cluster 0, 100-199 cluster
    * 1, ...), plus exact copies of ids 0..9 under ids 10000..10009.
    * Within-cluster cosine sits near 0.998 (noise 0.1 around norm-12
    * centers), never 1 — only the planted copies hit cos_sim = 1.0. */
  private def semanticCorpus(): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(21)
    val d = 16
    val centers = Array.fill(4)(Array.fill(d)(rng.nextGaussian() * 3))
    val rows = (0 until 400).map { i =>
      (i.toLong, centers(i / 100).map(_ + rng.nextGaussian() * 0.1).toSeq)
    }
    rows ++ (0 until 10).map(i => (10000L + i, rows(i)._2))
  }

  test("semanticDedupPairs: exact copies pair at cos 1 in their original's " +
       "cell; pairs never cross cells; semanticDedup keeps the lower id") {
    val e = semanticCorpus().toDF("vec_id", "embedding")
    // threshold 0.9999: within-cluster neighbors (~0.998) stay out, only
    // the planted copies survive the verify
    val strict = SimOps.semanticDedupPairs(e, "vec_id", "embedding",
        threshold = 0.9999, nCells = 4, trainCodebook = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(strict.map(t => (t._1, t._2)).toSet ==
      (0 until 10).map(i => (i.toLong, 10000L + i)).toSet,
      s"exactly the planted copy pairs must verify at 0.9999: ${strict.toSeq}")
    assert(strict.forall(_._3 == 1.0))

    // at 0.99 every within-cluster pair verifies — and NONE crosses a
    // cluster boundary (cells partition the candidate space)
    val loose = SimOps.semanticDedupPairs(e, "vec_id", "embedding",
        threshold = 0.99, nCells = 4, trainCodebook = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def cluster(id: Long) = if (id >= 10000L) (id - 10000L) / 100 else id / 100
    assert(loose.nonEmpty && loose.forall { case (a, b) => cluster(a) == cluster(b) },
      "semantic pairs must stay within one cell/cluster")

    val kept = SimOps.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.9999, nCells = 4, trainCodebook = true)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0 until 400).map(_.toLong).toSet,
      "the 10 planted copies (higher ids) must drop; every original stays")
  }

  test("semanticDedupPairs: derived nCells keeps candidate density ~flat " +
       "as the corpus grows (fixed cells would grow it linearly)") {
    val rng = new scala.util.Random(5)
    def corpus(n: Int) =
      (0 until n).map(i => (i.toLong, Seq.fill(8)(rng.nextGaussian()))).toDF("vec_id", "embedding")
    def density(n: Int): Double = {
      val (_, metrics) = ScalingProbe.runWithMetrics(spark,
        SimOps.semanticDedupPairs(corpus(n), "vec_id", "embedding",
          threshold = 0.999, nCells = 0))
      ScalingProbe.aggregate(metrics)("candidate_pairs").toDouble / n
    }
    // 2048 -> 16 cells, 8192 -> 64 cells: occupancy (so candidates/row)
    // stays ~constant; a fixed 16-cell codebook would grow density ~4x.
    // Random gaussians spread unevenly over seed-sample cells, so allow
    // 2.5x before calling it super-linear.
    val d1 = density(2048)
    val d2 = density(8192)
    assert(d2 < d1 * 2.5,
      s"candidate density must stay ~flat under the derive: $d1 -> $d2")
  }

  test("semanticDedupPairs: maxCell drops oversized cells from candidate " +
       "generation and records the cap through the observed metrics") {
    val e = semanticCorpus().toDF("vec_id", "embedding")
    // cluster 0 holds 110 members (100 + 10 copies); a 105 cap excises it
    val (_, metrics) = ScalingProbe.runWithMetrics(spark,
      SimOps.semanticDedupPairs(e, "vec_id", "embedding",
        threshold = 0.9999, nCells = 4, trainCodebook = true, maxCell = 105))
    val agg = ScalingProbe.aggregate(metrics)
    assert(agg("max_bucket_width") == 110L,
      s"pre-cap width of the hot cell must record: $agg")
    assert(agg("band_rows_capped") == 110L,
      s"all 110 rows of the hot cell leave candidate generation: $agg")
    // every planted copy lives in the capped cell; the other three cells
    // still generate candidates but nothing verifies at 0.9999
    assert(agg("candidate_pairs") > 0L && agg("verified_pairs") == 0L,
      s"capped cell's pairs must vanish, others verify nothing: $agg")
  }

  test("kmeansAssignInt: planted blobs converge to their own clusters " +
       "regardless of partitioning; empty clusters keep centroids; " +
       "0 iterations = assignment under the raw seeds") {
    import spark.implicits._
    // two tight blobs far apart; ids chosen so the k-smallest-id seeds
    // (0 and 1) land ONE IN EACH blob — Lloyd then separates and refines
    def pt(base: Double, jitter: Double) = Array(base + jitter, base - jitter)
    val blobA = Seq(0L) ++ (2L to 10L)   // around 0.1
    val blobB = Seq(1L) ++ (11L to 19L)  // around 0.9
    val rows =
      blobA.zipWithIndex.map { case (id, i) =>
        (id, pt(0.1, 0.001 * i).map(_.toFloat)) } ++
      blobB.zipWithIndex.map { case (id, i) =>
        (id, pt(0.9, 0.001 * i).map(_.toFloat)) }
    for (parts <- Seq(1, 5)) {
      val df = rows.toDF("vec_id", "embedding").repartition(parts)
      val got = SimOps.kmeansAssignInt(df, "vec_id", "embedding",
          k = 2, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val aCl = blobA.map(got).toSet
      val bCl = blobB.map(got).toSet
      assert(aCl.size == 1 && bCl.size == 1 && aCl != bCl,
        s"parts=$parts: blobs must separate, got $got")
    }
    // k=3 over 2 blobs: the third (empty) cluster keeps its seed centroid
    // and the result is still a legal total assignment
    val df3 = rows.toDF("vec_id", "embedding")
    val got3 = SimOps.kmeansAssignInt(df3, "vec_id", "embedding",
        k = 3, iters = 2).collect()
    assert(got3.length == 20 && got3.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 3))
    // iters = 0: assignment under untouched seeds; seed rows assign to
    // themselves (distance 0, lowest id tie-break)
    val got0 = SimOps.kmeansAssignInt(df3, "vec_id", "embedding",
        k = 2, iters = 0).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got0(0L) == 0L && got0(1L) == 1L)
    intercept[IllegalArgumentException] {
      SimOps.kmeansAssignInt(df3, "vec_id", "embedding", k = 0, iters = 1)
    }
  }

  test("prototypeSelect: per-cluster cores by exact integer distance, " +
       "keepClosest=false flips to the hard-example rule, assignment " +
       "matches kmeansAssignInt row-for-row") {
    import spark.implicits._
    def pt(base: Double, jitter: Double) = Array(base + jitter, base - jitter)
    val blobA = Seq(0L) ++ (2L to 10L)
    val blobB = Seq(1L) ++ (11L to 19L)
    val rows =
      blobA.zipWithIndex.map { case (id, i) =>
        (id, pt(0.1, 0.001 * i).map(_.toFloat)) } ++
      blobB.zipWithIndex.map { case (id, i) =>
        (id, pt(0.9, 0.001 * i).map(_.toFloat)) }
    val df = rows.toDF("vec_id", "embedding")
    val proto = SimOps.prototypeSelect(df, "vec_id", "embedding",
      k = 2, iters = 3, perCluster = 3)
    val got = proto.collect()
    // 3 per cluster, ranks 1..3, dists non-decreasing within cluster
    assert(got.length == 6)
    got.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
      val d = byRank.map(_.getLong(2))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b }, d.toSeq)
    }
    // assignment identical to the public kmeans (same recurrence)
    val assign = SimOps.kmeansAssignInt(df, "vec_id", "embedding", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(assign(r.getLong(0)) == r.getLong(1)))
    // hard-example rule: the farthest members, disjoint ranks from cores
    val hard = SimOps.prototypeSelect(df, "vec_id", "embedding",
        k = 2, iters = 3, perCluster = 3, keepClosest = false)
      .collect()
    assert(hard.length == 6)
    hard.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val d = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(d.zip(d.tail).forall { case (a, b) => a >= b }, d.toSeq)
    }
    // with a big perCluster everything survives (rank never exceeds size)
    assert(SimOps.prototypeSelect(df, "vec_id", "embedding", 2, 3, 100)
      .count() == 20L)
  }

  test("marginMutualMatches: mutual-best pairs only (one-directional " +
       "best is dropped), margin over the threshold, and an impossible " +
       "threshold empties the result") {
    import spark.implicits._
    val left = Seq(
      (0L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val right = Seq(
      (1L, Array(0.95f, 0.05f)),  // mutual with 0
      (3L, Array(0.90f, 0.10f)),  // best-left is 0, but 0 prefers 1 -> out
      (5L, Array(0.05f, 0.95f))   // mutual with 2
    ).toDF("vec_id", "embedding")
    val got = SimOps.marginMutualMatches(left, right, "vec_id", "embedding",
        k = 2, minMarginMicro = 1000000L)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(got.keySet == Set((0L, 1L), (2L, 5L)), s"got $got")
    assert(got.values.forall(_ >= 1000000L), s"margins: $got")
    val none = SimOps.marginMutualMatches(left, right, "vec_id", "embedding",
      k = 2, minMarginMicro = 100000000L)
    assert(none.count() == 0)
    // sides smaller than k: the denominator must average over the ACTUAL
    // neighborhood (review finding) — a single pair's margin is exactly
    // 1.0 (cos / its own neighborhood average), not inflated by k
    val one = SimOps.marginMutualMatches(
      Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding"),
      Seq((1L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 4, minMarginMicro = 0L)
      .collect()
    assert(one.length == 1 &&
      one.head.getLong(one.head.fieldIndex("margin_micro")) == 1000000L,
      one.toSeq.toString)
  }

  test("marginMutualMatchesBanded recovers >= 90% of the brute matcher's " +
       "planted mutual pairs (margins drift both ways over candidate " +
       "subsets — asserted only over the emit threshold)") {
    // plantedCorpus pairs are (2i, 2i+1) at cos >= 0.955 — even left,
    // odd right, mutual best of each other by construction
    val e = plantedCorpus.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val left = e.filter(col("vec_id") % 2 === 0)
    val right = e.filter(col("vec_id") % 2 === 1)
    val brute = SimOps.marginMutualMatches(left, right, "vec_id",
        "embedding", k = 4, minMarginMicro = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val planted = brute.keySet.filter { case (a, b) => b == a + 1 && a < 300 }
    assert(planted.size >= 140, s"brute found only ${planted.size} planted")
    val banded = SimOps.marginMutualMatchesBanded(left, right, "vec_id",
        "embedding", k = 4, minMarginMicro = 1000000L,
        nPlanes = 12, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val recalled = planted.count(banded.contains)
    assert(recalled >= (planted.size * 9) / 10,
      s"banded recalled $recalled of ${planted.size} planted mutual pairs")
    // margins drift both ways over candidate subsets (an under-filled
    // neighborhood averages fewer, higher cosines) — but every emitted
    // pair cleared the same integer threshold, and planted pairs stay
    // in the same ballpark as brute (within 2x either way)
    planted.filter(banded.contains).foreach { p =>
      assert(banded(p) >= 1000000L)
      assert(banded(p) <= brute(p) * 2 && brute(p) <= banded(p) * 2,
        s"pair $p: banded margin ${banded(p)} vs brute ${brute(p)}")
    }
  }

  test("ivfJoinTopK: row-identical to ivfTopK at equal parameters (the " +
       "multi-probe kernel replays the crossJoin+window probe list), and " +
       "the twin corpus surfaces itself at rank 1") {
    val e = plantedCorpus.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") < 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val direct = rows(SimOps.ivfTopK(e, q, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4))
    val joined = rows(SimOps.ivfJoinTopK(q, e, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4))
    assert(joined == direct)
    // a large query side: the whole corpus offset by 1e6 — every query's
    // exact twin is in its argmax cell (probe 0), so rank 1 at cos 1.0
    val offs = e.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding"))
    val twins = SimOps.ivfJoinTopK(offs, e, "vec_id", "embedding",
        k = 1, nCells = 16, nProbe = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(twins.size == plantedCorpus.size)
    plantedCorpus.foreach { case (id, _) =>
      assert(twins(id + 1000000L) == ((id, 1.0)),
        s"query ${id + 1000000L}: ${twins(id + 1000000L)}")
    }
  }

  test("ivfJoinTopK: maxCell caps hub cells (capped corpus rows leave the " +
       "candidate flow) and null-element vectors emit no probes") {
    val e = plantedCorpus.take(64).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val qn = Seq((5000L, Seq[java.lang.Double](null, 1.0) ++
        Seq.fill[java.lang.Double](dim - 2)(0.0)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    assert(SimOps.ivfJoinTopK(qn, e, "vec_id", "embedding", k = 3).count() == 0)
    // with maxCell = 0 rows survive in every cell; an absurd cap of 1
    // can only shrink the result (cells hold > 1 vector here)
    val q = e.filter(col("vec_id") < 4)
    val unc = SimOps.ivfJoinTopK(q, e, "vec_id", "embedding", k = 5).count()
    val cap = SimOps.ivfJoinTopK(q, e, "vec_id", "embedding", k = 5,
      maxCell = 1).count()
    assert(cap < unc, s"cap $cap !< uncapped $unc")
  }
}
