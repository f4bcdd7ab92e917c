package graft

import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SearchOps, SimOps, SketchOps, TextOps}

/** One negative PARAMETER-DRIFT test per landed-index family, all driving
  * the shared [[graft.sources.IndexCatalog]] contract: re-landing (or
  * probing) under parameters different from the pinned `_meta` row must
  * refuse loudly, and re-landing with the SAME parameters must be a
  * no-op (land-once). */
class IndexCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def drop(prefix: String, suffixes: String*): Unit =
    suffixes.foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $prefix$sfx"))

  private def docs() = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the trip north"),
    (3L, "sphinx of black quartz judge my vow before the winter ends"))
    .toDF("doc_id", "text")

  test("near-dup index: re-land with drifted (numHashes, bands) refuses") {
    val name = "graft_icat_nd"
    drop(name, "_meta", "_shingles", "_bands")
    try {
      DedupOps.landNearDupIndex(docs(), "text", name, numHashes = 16,
        bands = 4)
      // same params: land-once no-op
      DedupOps.landNearDupIndex(docs(), "text", name, numHashes = 16,
        bands = 4)
      val e = intercept[IllegalArgumentException] {
        DedupOps.landNearDupIndex(docs(), "text", name, numHashes = 32,
          bands = 8)
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landNearDupIndex"), e.getMessage)
    } finally drop(name, "_meta", "_shingles", "_bands")
  }

  test("r16 meta-row cache: writeMeta invalidates, external DROP + re-land " +
       "is seen fresh, and the probe path returns the rewritten row") {
    val name = "graft_icat_cache"
    drop(name, "_meta")
    try {
      val C = graft.sources.IndexCatalog
      C.pinMeta(spark, name, "cacheTest", None, Seq("k" -> 16))
      // probe twice: second read comes from the cache, same row
      val r1 = C.requireMeta(spark, name, "missing")
      val r2 = C.requireMeta(spark, name, "missing")
      assert(r1.getAs[Int]("k") == 16 && r2.getAs[Int]("k") == 16)
      // a meta REWRITE (the BM25 refreshMeta shape) must invalidate: the
      // next probe sees the new derived value, not the cached old row
      C.writeMeta(spark, name, None, Seq("k" -> 16, "n_docs" -> 42L))
      val r3 = C.requireMeta(spark, name, "missing")
      assert(r3.getAs[Long]("n_docs") == 42L, s"stale cached meta: $r3")
      // external DROP: existence stays catalog-authoritative — the probe
      // refuses with the land-first hint despite the warm cache
      drop(name, "_meta")
      val e = intercept[IllegalArgumentException] {
        C.requireMeta(spark, name, "land-first hint")
      }
      assert(e.getMessage.contains("land-first hint"))
      // and a re-land after the DROP writes fresh meta (the
      // ReadWhileWriteSpec cleanup-re-land pattern must not see a ghost)
      assert(!C.pinMeta(spark, name, "cacheTest", None, Seq("k" -> 99)))
      assert(C.requireMeta(spark, name, "missing").getAs[Int]("k") == 99)
    } finally drop(name, "_meta")
  }

  test("paragraph store: re-land with a drifted delimiter refuses") {
    val name = "graft_icat_ps"
    drop(name, "_meta", "_paras")
    try {
      DedupOps.landParagraphStore(docs(), "text", name, delimiter = "\n\n")
      DedupOps.landParagraphStore(docs(), "text", name, delimiter = "\n\n")
      val e = intercept[IllegalArgumentException] {
        DedupOps.landParagraphStore(docs(), "text", name, delimiter = "\n")
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landParagraphStore"), e.getMessage)
    } finally drop(name, "_meta", "_paras")
  }

  test("ANN index: re-land with drifted nCells refuses") {
    val name = "graft_icat_ann"
    drop(name, "_meta", "_cells", "_centroids")
    val vecs = (0L until 40L).map(i =>
      (i, Seq.tabulate(8)(d => math.sin(i * 3.0 + d).toDouble)))
      .toDF("vec_id", "embedding")
    try {
      SimOps.landAnnIndex(vecs, "vec_id", "embedding", name, nCells = 4)
      SimOps.landAnnIndex(vecs, "vec_id", "embedding", name, nCells = 4)
      val e = intercept[IllegalArgumentException] {
        SimOps.landAnnIndex(vecs, "vec_id", "embedding", name, nCells = 8)
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landAnnIndex"), e.getMessage)
    } finally drop(name, "_meta", "_cells", "_centroids")
  }

  test("n-gram LM: re-land with drifted n refuses (derived vocab_size is " +
       "not part of the pin)") {
    val name = "graft_icat_lm"
    drop(name, "_meta", "_grams", "_contexts")
    try {
      TextOps.landNgramLm(docs(), "text", name, n = 2)
      TextOps.landNgramLm(docs(), "text", name, n = 2)
      val e = intercept[IllegalArgumentException] {
        TextOps.landNgramLm(docs(), "text", name, n = 3)
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landNgramLm"), e.getMessage)
    } finally drop(name, "_meta", "_grams", "_contexts")
  }

  test("DSIR model: re-land with drifted (dim, alpha) refuses") {
    val name = "graft_icat_dsir"
    drop(name, "_meta", "_ratios")
    val target = docs().filter(col("doc_id") < 3)
    val raw = docs()
    try {
      TextOps.landDsir(target, raw, "text", name, dim = 64, alpha = 1.0)
      TextOps.landDsir(target, raw, "text", name, dim = 64, alpha = 1.0)
      val e = intercept[IllegalArgumentException] {
        TextOps.landDsir(target, raw, "text", name, dim = 128, alpha = 1.0)
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landDsir"), e.getMessage)
      // alpha drift alone also refuses (Double-typed pin)
      val e2 = intercept[IllegalArgumentException] {
        TextOps.landDsir(target, raw, "text", name, dim = 64, alpha = 0.5)
      }
      assert(e2.getMessage.contains("!= requested"), e2.getMessage)
    } finally drop(name, "_meta", "_ratios")
  }

  test("CMS sketch: re-land with a drifted salt refuses (String-typed pin)") {
    val name = "graft_icat_cms"
    drop(name, "_meta", "_counters")
    val items = Seq.tabulate(50)(i => s"k${i % 7}").toDF("k")
    try {
      SketchOps.landCmsSketch(items, "k", name, depth = 3, width = 16)
      SketchOps.landCmsSketch(items, "k", name, depth = 3, width = 16)
      val e = intercept[IllegalArgumentException] {
        SketchOps.landCmsSketch(items, "k", name, depth = 3, width = 16,
          salt = "other-salt")
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("landCmsSketch"), e.getMessage)
    } finally drop(name, "_meta", "_counters")
  }

  test("BM25 search index: probing under a different analyzer version " +
       "refuses (the postings are tokenizer-versioned)") {
    val name = "graft_icat_bm25"
    drop(name, "_meta", "_postings", "_docs")
    try {
      SearchOps.landSearchIndex(docs(), "doc_id", "text", name)
      // happy path: current analyzer probes fine
      assert(SearchOps.bm25AgainstIndex(spark, name, Seq("fox")).count() >= 1)
      // simulate an index landed by an older library version: rewrite the
      // meta row with a stale analyzer id
      graft.sources.IndexCatalog.writeMeta(spark, name, None,
        Seq("analyzer" -> "lower-alnum-v0", "n_docs" -> 3L,
          "total_dl" -> 30L))
      val e = intercept[IllegalArgumentException] {
        SearchOps.bm25AgainstIndex(spark, name, Seq("fox"))
      }
      assert(e.getMessage.contains("!= requested") &&
        e.getMessage.contains("analyzer"), e.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        SearchOps.appendSearchIndex(docs(), "doc_id", "text", name)
      }
      assert(e2.getMessage.contains("analyzer"), e2.getMessage)
    } finally drop(name, "_meta", "_postings", "_docs")
  }

  test("meta row MISSING a pinned column (index landed by an older build) " +
       "refuses as drift, naming the column — not a raw fieldIndex error") {
    val name = "graft_icat_oldmeta"
    drop(name, "_meta", "_postings", "_docs")
    try {
      SearchOps.landSearchIndex(docs(), "doc_id", "text", name)
      // simulate a pre-analyzer-pin build: meta row without the column
      graft.sources.IndexCatalog.writeMeta(spark, name, None,
        Seq("n_docs" -> 3L, "total_dl" -> 30L))
      val e = intercept[IllegalArgumentException] {
        SearchOps.bm25AgainstIndex(spark, name, Seq("fox"))
      }
      assert(e.getMessage.contains("has no column") &&
        e.getMessage.contains("analyzer") &&
        e.getMessage.contains("land under another name"), e.getMessage)
    } finally drop(name, "_meta", "_postings", "_docs")
  }

  test("two same-JVM writers racing pinMeta on one name: exactly one lands, " +
       "the other refuses with drift (the striped-lock contract)") {
    val name = "graft_icat_race"
    drop(name, "_meta")
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val gate = new java.util.concurrent.CyclicBarrier(2)
      def land(n: Int): Future[Either[Throwable, Boolean]] = Future {
        gate.await()
        try Right(graft.sources.IndexCatalog.pinMeta(spark, name,
          "raceTest", None, Seq("param" -> n)))
        catch { case t: Throwable => Left(t) }
      }
      val results = Await.result(
        Future.sequence(Seq(land(1), land(2))), 120.seconds)
      val wins = results.collect { case Right(existed) => existed }
      val errs = results.collect { case Left(t) => t }
      // one writer lands fresh (existed=false); the other must NOT
      // interleave a second meta write — it either sees drift (param
      // mismatch error) or, had params matched, existed=true
      assert(wins == Seq(false) && errs.length == 1,
        s"race outcome: wins=$wins errs=${errs.map(_.getMessage)}")
      assert(errs.head.getMessage.contains("!= requested"),
        errs.head.getMessage)
      // the surviving meta row is internally consistent (single winner)
      val row = spark.table(s"${name}_meta").head()
      assert(Seq(1, 2).contains(row.getInt(row.fieldIndex("param"))))
    } finally drop(name, "_meta")
  }
}
