package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimOps}

/**
 * Skew-adversarial pins (VERDICT r13 #1): the decade corpora are uniform
 * copies, so the hot-key/hot-bucket defenses had never been exercised
 * against planted skew. This spec pins, on hand-countable corpora:
 *
 *  1. the [[ScaleUp]] skew injectors' exact shapes (which rows get the
 *     boilerplate page / hub vector / bot user, determinism, schema
 *     preservation) — the scaled skew bench corpora are built from these,
 *     so the bench's hot-mass accounting is only as good as these pins;
 *  2. `maxBucket` dropping the boilerplate LSH bucket from candidate
 *     generation while the COLD keys keep their recall (caps must bound
 *     the hot spot, not damage the rest of the corpus);
 *  3. `maxCell` doing the same for the hub cell on both semantic-dedup
 *     and the two-sided IVF join, with the planted-twin rank-1 contract
 *     intact for cold queries.
 *
 * The scale-side evidence (wall + max-task time at 10x/100x under the
 * same injections) lives in BENCH_SCALING_r14.json; this spec is the
 * correctness half of that claim.
 */
class SkewScaleSpec extends SparkTestBase {

  import spark.implicits._

  /** Same LCG corpus as ScalingMetricsSpec: 40 words over a 503-word
    * vocabulary, last `planted` docs are near-dups of the first. */
  private def corpus(n: Int, planted: Int = 0): DataFrame = {
    def words(id: Long): String = {
      var s = id * 2654435761L + 11L
      (0 until 40).map { _ =>
        s = (s * 6364136223846793005L + 1442695040888963407L) &
          0x7fffffffffffffffL
        "w" + (s % 503)
      }.mkString(" ")
    }
    (0L until n.toLong).map { id =>
      val text =
        if (id >= n - planted) words(id - (n - planted)) + " tail"
        else words(id)
      (id, text)
    }.toDF("doc_id", "text")
  }

  /** Deterministic float vectors, dim 16, unit-ish random directions. */
  private def vectors(n: Int): DataFrame = {
    def vec(id: Long): Array[Float] = {
      var s = id * 2654435761L + 17L
      Array.tabulate(16) { _ =>
        s = (s * 6364136223846793005L + 1442695040888963407L) &
          0x7fffffffffffffffL
        ((s % 2001) - 1000) / 1000.0f
      }
    }
    (0L until n.toLong).map(id => (id, vec(id))).toDF("vec_id", "embedding")
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  // ------------------------------------------------------------------
  // 1. injector shapes
  // ------------------------------------------------------------------

  test("injectBoilerplateDocs replaces exactly the 1-in-N phase rows and " +
       "recomputes n_chars") {
    val docs = corpus(60).withColumn("n_chars",
      length(col("text")).cast("long"))
    val out = ScaleUp.injectBoilerplateDocs(docs, everyN = 10)
    assert(out.columns.toSeq == docs.columns.toSeq, "schema order preserved")
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val orig = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    (0L until 60L).foreach { id =>
      if (id % 10 == 7) {
        assert(rows(id)._1 == ScaleUp.BoilerplateText, s"doc $id")
        assert(rows(id)._2 == ScaleUp.BoilerplateText.length.toLong,
          s"n_chars of doc $id recomputed")
      } else assert(rows(id)._1 == orig(id), s"doc $id untouched")
    }
    // deterministic: a second run is byte-identical
    assert(ScaleUp.injectBoilerplateDocs(docs, everyN = 10).collect()
      .toSeq == out.collect().toSeq)
  }

  test("injectHubEmbeddings collapses the 1-in-N rows into a cos~1 hub " +
       "and keeps float element type") {
    val emb = vectors(50)
    val out = ScaleUp.injectHubEmbeddings(emb, everyN = 10)
    assert(out.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true) ||
      out.schema("embedding").dataType.simpleString.startsWith(
        "array<float>"),
      s"element type stays float, got ${out.schema("embedding").dataType}")
    val byId = out.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val origById = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val hubIds = (0L until 50L).filter(_ % 10 == 7)
    // hub rows: pairwise cosine ~ 1 but not byte-identical (jitter)
    for (a <- hubIds; b <- hubIds if a < b) {
      assert(cosine(byId(a), byId(b)) > 0.999, s"hub pair ($a,$b)")
      assert(!byId(a).sameElements(byId(b)), s"hub rows $a,$b not identical")
    }
    // cold rows untouched
    (0L until 50L).filterNot(_ % 10 == 7).foreach(id =>
      assert(byId(id).sameElements(origById(id)), s"vec $id untouched"))
  }

  test("injectEventSkew: bot user holds ~1/10 of events over a Zipf " +
       "domain, deterministically") {
    val ev = (0L until 5000L).map(i => (i, i % 997)).toDF("event_id", "user_id")
    val out = ScaleUp.injectEventSkew(ev, nUsers = 997, hotEvery = 10)
    val users = out.collect().map(r => r.getLong(1))
    val hotFrac = users.count(_ == 0L).toDouble / users.length
    assert(hotFrac > 0.05 && hotFrac < 0.15,
      s"bot user should hold ~10%, got $hotFrac")
    assert(users.forall(u => u >= 0L && u < 997L),
      "every user stays inside the domain")
    // Zipf-ish head: the top non-bot user is much hotter than the median
    val counts = users.filter(_ != 0L).groupBy(identity)
      .map(_._2.length).toSeq.sorted
    assert(counts.last >= 5 * counts(counts.length / 2),
      s"head rank should dominate the median (got max=${counts.last}, " +
        s"med=${counts(counts.length / 2)})")
    val again = ScaleUp.injectEventSkew(ev, nUsers = 997, hotEvery = 10)
      .collect().map(r => r.getLong(1)).toSeq
    assert(again == users.toSeq, "deterministic")
  }

  // ------------------------------------------------------------------
  // 2. maxBucket vs the boilerplate bucket
  // ------------------------------------------------------------------

  test("maxBucket drops the boilerplate LSH bucket but keeps cold-key " +
       "recall") {
    // 200 docs, last 20 near-dups of first 20; then docs with id%10==7
    // become the shared boilerplate page (20 of them, all identical) —
    // the hottest bucket in every band. maxBucket=10 < 20 must cap it.
    val skewed = ScaleUp.injectBoilerplateDocs(corpus(200, planted = 20),
      everyN = 10)
    val (_, metrics) = ScalingProbe.runWithMetrics(spark,
      DedupOps.nearDuplicatePairs(skewed, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 10))
    val agg = ScalingProbe.aggregate(metrics)
    assert(agg("max_bucket_width") >= 20L,
      s"boilerplate bucket is the widest; got ${agg("max_bucket_width")}")
    assert(agg("band_rows_capped") >= 20L,
      s"cap removed the boilerplate rows; got ${agg("band_rows_capped")}")

    val pairs = DedupOps.nearDuplicatePairs(skewed, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 10)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val boiler = (0L until 200L).filter(_ % 10 == 7).toSet
    assert(!pairs.exists(p => boiler(p._1) && boiler(p._2)),
      "no boilerplate-boilerplate pair survives the cap")
    // cold recall: every planted pair whose BOTH sides kept their text
    // still verifies (docs 7,17 and copies 187,197 became boilerplate)
    val expected = (0L until 20L).filter(i => i % 10 != 7)
      .map(i => (i, 180L + i)).toSet
    assert(expected.subsetOf(pairs),
      s"cold planted pairs survive; missing ${expected -- pairs}")
  }

  // ------------------------------------------------------------------
  // 3. maxCell vs the hub cell
  // ------------------------------------------------------------------

  test("maxCell drops the hub cell from semantic-dedup candidates but " +
       "keeps cold exact-copy pairs") {
    // 400 vectors; hub = ids >= 200 with id%5==2 (40 rows) — ABOVE the
    // 16-id centroid prefix, so the whole hub mass argmaxes into one
    // cold cell (measured layout: hub cell 66 wide, next-widest 31;
    // maxCell=45 separates them cleanly). Exact copies of cold vectors
    // (ids+1000) must still pair at cos 1.0 under the cap — originals
    // exclude id 3, whose own cell IS the hub cell and gets capped.
    val coldCopyIds = Seq(1L, 2L, 4L, 5L, 6L, 8L)
    val base = ScaleUp.injectHubEmbeddings(vectors(400), everyN = 5,
      minId = 200L)
    val copies = base.filter(col("vec_id").isin(coldCopyIds: _*))
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(copies)
    val pairsDf = SimOps.semanticDedupPairs(corpus, "vec_id",
      "embedding", threshold = 0.9, nCells = 0, maxCell = 45)
    val (_, metrics) = ScalingProbe.runWithMetrics(spark, pairsDf)
    val agg = ScalingProbe.aggregate(metrics)
    assert(agg("max_bucket_width") >= 60L,
      s"hub cell is the widest; got ${agg("max_bucket_width")}")
    assert(agg("band_rows_capped") >= 60L,
      s"cap removed the hub cell; got ${agg("band_rows_capped")}")
    val pairs = SimOps.semanticDedupPairs(corpus, "vec_id", "embedding",
        threshold = 0.9, nCells = 0, maxCell = 45)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hub = (200L until 400L).filter(_ % 5 == 2).toSet
    assert(!pairs.exists(p => hub(p._1) && hub(p._2)),
      "no hub-hub pair survives the cap")
    coldCopyIds.foreach(i => assert(pairs((i, 1000L + i)),
      s"cold exact copy ($i,${1000 + i}) still pairs"))
  }

  test("ivfJoinTopK under maxCell: hub neighbors leave candidate " +
       "generation, cold twins keep rank 1") {
    val base = ScaleUp.injectHubEmbeddings(vectors(400), everyN = 5,
      minId = 200L)
    val queries = base.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding"))
    val top = SimOps.ivfJoinTopK(queries, base, "vec_id", "embedding",
        k = 3, nCells = 0, nProbe = 4, maxCell = 45)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val hub = (200L until 400L).filter(_ % 5 == 2).toSet
    assert(!top.exists(t => hub(t._3)),
      "capped hub rows never appear as neighbors")
    // every query whose twin survived the cap ranks it first; the capped
    // cell held 66 rows (40 hub + 26 cold), so >= 334 of 400 twins
    // survive — and a twin that survives but does NOT rank 1 would be an
    // engine defect, so the count is exact-or-better
    val rank1 = top.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    val twinFirst = (0L until 400L).count(id =>
      rank1.get(1000000L + id).contains(id))
    assert(twinFirst >= 334,
      s"at least 334 surviving twins must rank 1, got $twinFirst")
    // rank-1 self-twin and capped-out sets must partition the queries:
    // any query missing its twin is one whose twin sat in the capped cell
    assert(twinFirst <= 400 - hub.size,
      "hub queries cannot rank their capped twin first")
  }
}
