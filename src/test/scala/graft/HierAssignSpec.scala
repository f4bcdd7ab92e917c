package graft

import org.apache.spark.sql.functions._

import graft.ops.SimOps

/**
 * The r15 TWO-LEVEL (product / inverted-multi-index) cell assignment —
 * the 1000x-decade fix: past SimOps.FlatAssignMaxCells the flat argmax
 * costs nCells*dim per row (quadratic total under the n/128 derive; the
 * r15 1000x skew leg measured 27.6x wall for 10x data at 15.8k cells),
 * so ivfTopK / ivfJoinTopK / semanticDedupPairs switch to two
 * half-dimension codebooks of ~sqrt(nCells) centroids with composed
 * cell id a1*k2 + a2. The driver SFs never reach the switch (their
 * derives sit on the 16-cell floor — ClampEnvelopeSpec), so this spec
 * FORCES the path with explicit nCells > 4096 on a small corpus and
 * pins: the composed-id arithmetic against an independent driver-side
 * replay of the half-codebook argmax, the planted-duplicate contracts
 * the flat path already honors (identical vectors share a cell; offset
 * twins surface at rank 1), ivfTopK/ivfJoinTopK row-identity at equal
 * parameters, the maxCell hub guard, and determinism across runs.
 */
class HierAssignSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 32
  private val h1 = (dim + 1) / 2

  /** 600 deterministic gaussian vectors (ids 0..599; pairwise cosine
    * ~N(0, 1/32), never near 0.9) plus exact copies of ids 0..19 at
    * ids 10000+i. */
  private lazy val corpusRows: Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(4242)
    val base = (0 until 600).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian())))
    val copies = (0 until 20).map(i => (10000L + i, base(i)._2))
    base ++ copies
  }

  private def corpusDf = corpusRows.toDF("vec_id", "embedding")

  // forced two-level shape: k1 = ceil(sqrt(5000)) = 71, k2 = ceil(5000/71)
  private val nCellsForced = 5000
  private val k1 = math.ceil(math.sqrt(nCellsForced.toDouble)).toInt
  private val k2 = math.ceil(nCellsForced.toDouble / k1).toInt

  /** IvfCellExpr's exact fold: score = nn > 0 ? dot/nn : 0.0, first max. */
  private def argmaxCos(v: Array[Double], cents: Seq[Array[Double]]): Int = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val vn = math.sqrt(s)
    var best = 0
    var bestScore = Double.NegativeInfinity
    cents.zipWithIndex.foreach { case (c, ci) =>
      var score = 0.0
      if (c.length == v.length) {
        var d = 0.0; var j = 0
        while (j < c.length) { d += v(j) * c(j); j += 1 }
        val nn = vn * {
          var t = 0.0; var j = 0
          while (j < c.length) { t += c(j) * c(j); j += 1 }
          math.sqrt(t)
        }
        score = if (nn > 0) d / nn else 0.0
      }
      if (score > bestScore) { best = ci; bestScore = score }
    }
    best
  }

  /** The untrained half codebooks the engine must build: the k lowest-id
    * corpus vectors' half slices, renumbered 0..k-1. */
  private def expectedCell(v: Array[Double]): Long = {
    val lowest = corpusRows.sortBy(_._1)
    val cb1 = lowest.take(k1).map(_._2.slice(0, h1))
    val cb2 = lowest.take(k2).map(_._2.slice(h1, dim))
    val a1 = argmaxCos(v.slice(0, h1), cb1)
    val a2 = argmaxCos(v.slice(h1, dim), cb2)
    a1.toLong * k2 + a2
  }

  test("semanticDedupPairs two-level: planted exact copies pair at cos 1.0, " +
       "the composed cell id replays the half-codebook argmax arithmetic, " +
       "and two runs are identical") {
    val run = () => SimOps.semanticDedupPairs(corpusDf, "vec_id", "embedding",
        threshold = 0.9, nCells = nCellsForced)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val pairs = run()
    // every planted copy pairs with its identical original at cosine 1.0
    (0 until 20).foreach { i =>
      val hit = pairs.find(p => p._1 == i.toLong && p._2 == 10000L + i)
      assert(hit.nonEmpty, s"planted copy pair ($i, ${10000 + i}) missing")
      assert(hit.get._4 == 1.0, s"planted pair cos ${hit.get._4} != 1.0")
      // the pair's cell is the composed two-level id of the shared vector
      assert(hit.get._3 == expectedCell(corpusRows(i)._2),
        s"composed cell ${hit.get._3} != driver replay for id $i")
    }
    // gaussian background never fabricates a >= 0.9 pair at dim 32
    assert(pairs.size == 20, s"expected exactly the 20 planted pairs, " +
      s"got ${pairs.size}")
    assert(run() == pairs, "two-level semantic pairs not deterministic")
  }

  test("ivfJoinTopK two-level: every offset twin surfaces at rank 1 with " +
       "cos 1.0, and ivfTopK is row-identical at equal parameters") {
    val queries = corpusDf
      .filter(col("vec_id") < 600)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val joined = SimOps.ivfJoinTopK(queries, corpusDf, "vec_id", "embedding",
        k = 3, nCells = nCellsForced, nProbe = 4)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // identical vector => identical half argmaxes => probe 0 is its own
    // assign cell, so the twin is always a candidate and wins rank 1
    // (ids 0..19 have an exact copy at 10000+i with HIGHER id, so the
    // lower original still wins the tie-break)
    val rank1 = joined.filter(_._2 == 1).map(r => r._1 -> r).toMap
    (0 until 600).foreach { i =>
      val r1 = rank1.get(1000000L + i)
      assert(r1.nonEmpty, s"query $i missing from two-level join")
      assert(r1.get._3 == i.toLong && r1.get._4 == 1.0,
        s"query $i rank-1 ${r1.get._3}@${r1.get._4}, expected twin $i@1.0")
    }
    val oneSided = SimOps.ivfTopK(corpusDf, queries, "vec_id", "embedding",
        k = 3, nCells = nCellsForced, nProbe = 4)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(oneSided == joined,
      "two-level ivfTopK != ivfJoinTopK at equal parameters")
  }

  test("two-level maxCell: a planted hub cell is dropped from candidate " +
       "generation, cold pairs survive") {
    val hub = (0 until 200).map(i => (5000L + i, corpusRows.head._2))
    val withHub = (corpusRows ++ hub).toDF("vec_id", "embedding")
    val capped = SimOps.semanticDedupPairs(withHub, "vec_id", "embedding",
        threshold = 0.9, nCells = nCellsForced, maxCell = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the hub cell (202 identical vectors: id 0, its copy, 200 plants)
    // exceeds maxCell=50 and is dropped wholesale
    assert(!capped.exists(p => p._1 >= 5000L && p._1 < 5200L),
      "hub ids leaked into capped two-level candidates")
    assert(!capped.exists(p => p._1 == 0L || p._2 == 10000L),
      "the hub-resident planted pair should be capped away")
    // the other 19 planted pairs live in cold cells and survive
    (1 until 20).foreach { i =>
      assert(capped.contains((i.toLong, 10000L + i)),
        s"cold planted pair ($i, ${10000 + i}) lost under maxCell")
    }
  }

  test("two-level trained codebook: maximin+Lloyd halves return valid, " +
       "deterministic results") {
    val pairs = SimOps.semanticDedupPairs(corpusDf, "vec_id", "embedding",
        threshold = 0.9, nCells = nCellsForced, trainCodebook = true,
        lloydIters = 2, trainSample = 256)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    // identical vectors land in the same cell under ANY codebook, so the
    // planted pairs survive training; cosines stay exact
    (0 until 20).foreach { i =>
      val hit = pairs.find(p => p._1 == i.toLong && p._2 == 10000L + i)
      assert(hit.nonEmpty && hit.get._3 == 1.0,
        s"trained two-level lost planted pair ($i, ${10000 + i})")
    }
  }
}
