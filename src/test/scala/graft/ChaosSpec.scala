package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SearchOps, SketchOps}

/**
 * REAL fault injection for the landed-index crash-retry protocols
 * (VERDICT r12 task #1): every convergence claim here is exercised by an
 * ACTUAL aborted Spark write job — not a simulated replay of the batch
 * logic. Injection: a regular FILE planted at `<table-location>/_temporary`
 * makes the FileOutputCommitter's job setup fail with ENOTDIR (the kernel
 * enforces it even for root, unlike permission bits), so the write job
 * genuinely aborts while every OTHER table of the protocol keeps its
 * committed state — exactly the crash window between the protocol's two
 * writes. Each test then asserts the PARTIAL state is real (orphan rows in
 * the first table, nothing in the second), heals the fault, retries the
 * append, and proves convergence against a fresh-landed oracle index.
 *
 * Protocols covered (scaladoc contracts under test):
 *  - near-dup append: bands-first / shingles-as-commit-marker
 *    (DedupOps.appendNearDupIndex)
 *  - search append: postings-first / _docs-as-commit-marker, duplicate
 *    postings collapse at read (SearchOps.appendSearchIndex)
 *  - CMS segments: a FAILED segment append must not mark the segment seen;
 *    the retry completes it; re-delivery stays idempotent
 *    (SketchOps.appendToCmsSketch)
 *  - paragraph store: hash-keyed append retry leaves one row per hash
 *    (DedupOps.appendParagraphStore)
 *  - compaction: a crashed side write leaves the original table intact and
 *    the retry converges (BucketedLand side-table-swap)
 *  - streaming ingest: a micro-batch whose append crashed re-delivers
 *    through the REAL checkpoint restart and converges
 *    (StreamOps.dedupAgainstIndexBatch, sink-before-append)
 */
class ChaosSpec extends SparkTestBase {
  import org.apache.spark.sql.catalyst.TableIdentifier

  private def tableDir(t: String): java.io.File = {
    val uri = spark.sessionState.catalog.getTableMetadata(TableIdentifier(t))
      .location
    new java.io.File(uri.getPath)
  }

  /** Plant the ENOTDIR blocker: the next write into `t` fails its job
    * setup (mkdirs under a regular file), a genuine aborted write. */
  private def poison(t: String): Unit = {
    val f = new java.io.File(tableDir(t), "_temporary")
    if (f.isDirectory) {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(): Unit
      }
      rm(f)
    }
    assert(f.createNewFile(), s"could not plant blocker at $f")
  }

  private def heal(t: String): Unit = {
    new java.io.File(tableDir(t), "_temporary").delete(): Unit
    spark.catalog.refreshTable(t)
  }

  private def dropAll(name: String, suffixes: Seq[String]): Unit =
    suffixes.foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s"): Unit
      // a run that died mid-test can leave an orphan warehouse directory
      // with no catalog entry — CTAS refuses the location then
      val wh = new java.io.File(new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath, s"${name}_$s")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm)
        x.delete(): Unit
      }
      if (wh.exists()) rm(wh)
    }

  private def docs(ids: Seq[Long], tag: String): DataFrame = {
    import spark.implicits._
    ids.map(i => (i,
        s"$tag document number $i carrying shared vocabulary token${i % 7} " +
        s"and unique marker ${tag}_$i for shingling purposes"))
      .toDF("doc_id", "text")
  }

  test("near-dup append: an aborted shingle write leaves REAL orphan bands; " +
       "the retry converges to the fresh-land state") {
    val name = "chaos_nd"
    dropAll(name, Seq("meta", "shingles", "bands"))
    dropAll(s"${name}_fresh", Seq("meta", "shingles", "bands"))
    val corpus = docs(0L until 30L, "base")
    DedupOps.landNearDupIndex(corpus, "text", name,
      numHashes = 32, bands = 8, shingleSize = 3)
    val s0 = spark.table(s"${name}_shingles").count()
    val b0 = spark.table(s"${name}_bands").count()

    // batch: 8 new docs + 3 exact copies of landed docs (must stay skipped)
    val batch = docs(100L until 108L, "fresh").unionByName(docs(0L until 3L, "base"))

    poison(s"${name}_shingles")
    val e = intercept[Exception] {
      DedupOps.appendNearDupIndex(batch, "text", name)
    }
    // the write genuinely aborted at the storage layer
    assert(e.toString.contains("_temporary") ||
      (e.getCause != null && e.getCause.toString.contains("_temporary")) ||
      e.toString.toLowerCase.contains("abort"), s"unexpected failure: $e")
    heal(s"${name}_shingles")
    spark.catalog.refreshTable(s"${name}_bands")

    // GENUINE partial state: bands committed for the 8 new docs, shingle
    // commit markers absent — the exact crash window the protocol documents
    assert(spark.table(s"${name}_shingles").count() == s0,
      "shingle table must be untouched by the aborted write")
    assert(spark.table(s"${name}_bands").count() == b0 + 8 * 8,
      "band rows of the failed attempt must be committed (8 docs x 8 bands)")

    // retry: the anti-join still sees the 8 docs as new (marker absent)
    assert(DedupOps.appendNearDupIndex(batch, "text", name) == 8L)
    // duplicate band rows exist (documented: they only widen candidates)...
    assert(spark.table(s"${name}_bands").count() == b0 + 2 * 8 * 8)
    // ...but shingles (the identity) converged to exactly one row per doc
    val sh = spark.table(s"${name}_shingles")
    assert(sh.count() == s0 + 8 &&
      sh.select("__ref_id").distinct().count() == s0 + 8)
    // and a THIRD append is a no-op (idempotent under re-delivery)
    assert(DedupOps.appendNearDupIndex(batch, "text", name) == 0L)

    // convergence oracle: a fresh land over corpus + accepted batch gives
    // the identical probe behavior and identical DISTINCT index content
    DedupOps.landNearDupIndex(corpus.unionByName(docs(100L until 108L, "fresh")),
      "text", s"${name}_fresh", numHashes = 32, bands = 8, shingleSize = 3)
    val probe = docs(100L until 104L, "fresh") // known dups
      .unionByName(docs(500L until 504L, "novel")) // known clean
    def surviving(ix: String) =
      DedupOps.nearDedupAgainstIndex(probe, "doc_id", "text", ix)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving(name) == surviving(s"${name}_fresh"))
    assert(surviving(name) == (500L until 504L).toSet)
    val distinctBands = spark.table(s"${name}_bands").distinct().count()
    assert(distinctBands == spark.table(s"${name}_fresh_bands").distinct().count())
  }

  test("search append: an aborted _docs write leaves REAL orphan postings; " +
       "the retry's duplicate postings collapse at read") {
    val name = "chaos_se"
    dropAll(name, Seq("meta", "postings", "docs"))
    val corpus = docs(0L until 25L, "lex")
    SearchOps.landSearchIndex(corpus, "doc_id", "text", name)
    val p0 = spark.table(s"${name}_postings").count()
    val d0 = spark.table(s"${name}_docs").count()

    val batch = docs(200L until 206L, "query")
    poison(s"${name}_docs")
    intercept[Exception] {
      SearchOps.appendSearchIndex(batch, "doc_id", "text", name)
    }
    heal(s"${name}_docs")
    spark.catalog.refreshTable(s"${name}_postings")

    // genuine crash window: postings committed, commit markers absent
    val pOrphan = spark.table(s"${name}_postings").count()
    assert(pOrphan > p0, "orphan postings must be committed")
    assert(spark.table(s"${name}_docs").count() == d0,
      "_docs (the commit marker) must be untouched")

    // retry re-appends those postings (duplicates) and lands the markers
    assert(SearchOps.appendSearchIndex(batch, "doc_id", "text", name) == 6L)
    assert(spark.table(s"${name}_postings").count() == p0 + 2 * (pOrphan - p0))
    assert(spark.table(s"${name}_docs").count() == d0 + 6)
    // and the duplicates collapse at read: index BM25 == inline BM25 over
    // the combined corpus, despite the doubled posting rows
    val combined = corpus.unionByName(batch)
    val terms = Seq("query", "vocabulary", "token3")
    val viaIndex = SearchOps.bm25AgainstIndex(spark, name, terms, k = 10)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .sortBy(_._1)
    val inline = SearchOps.bm25TopK(combined, "doc_id", "text", terms, k = 10)
      .select(col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .sortBy(_._1)
    assert(viaIndex.sameElements(inline),
      s"index=${viaIndex.toSeq} inline=${inline.toSeq}")
    // re-delivery after success: no-op
    assert(SearchOps.appendSearchIndex(batch, "doc_id", "text", name) == 0L)
  }

  test("CMS segments: a FAILED segment append does not mark the segment " +
       "seen; the retry completes it; re-delivery cannot double-count") {
    val name = "chaos_cms"
    dropAll(name, Seq("meta", "counters"))
    import spark.implicits._
    val base = (0L until 200L).map(i => s"key${i % 40}").toDF("k")
    SketchOps.landCmsSketch(base, "k", name, depth = 4, width = 64)
    val c0 = spark.table(s"${name}_counters").count()

    val batch = (0L until 100L).map(i => s"key${i % 10}").toDF("k")
    poison(s"${name}_counters")
    intercept[Exception] {
      SketchOps.appendToCmsSketch(batch, "k", name, segmentId = "b1")
    }
    heal(s"${name}_counters")
    // nothing committed — and crucially the segment is NOT considered seen
    assert(spark.table(s"${name}_counters").count() == c0)
    assert(SketchOps.appendToCmsSketch(batch, "k", name, segmentId = "b1"),
      "retry of the failed segment must append")
    // re-delivery of the same segment id: skipped
    assert(!SketchOps.appendToCmsSketch(batch, "k", name, segmentId = "b1"))

    // estimates equal a single sketch over the concatenated corpus
    val probes = (0L until 40L).map(i => s"key$i").toDF("k")
    val landed = SketchOps.cmsEstimateAgainstSketch(probes, "k", name)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = SketchOps.cmsEstimate(
      SketchOps.cmsSketch(base.unionByName(batch), "k", depth = 4,
        width = 64, salt = "graft-cms"),
      probes, "k", depth = 4, width = 64, salt = "graft-cms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(landed == oneShot)
  }

  test("paragraph store: an aborted append retries to one row per hash") {
    val name = "chaos_ps"
    dropAll(name, Seq("meta", "paras"))
    import spark.implicits._
    def para(tag: String, n: Int) =
      (0 until n).map(i => (tag.hashCode.toLong * 100 + i,
        s"$tag paragraph $i line one\n\nshared boilerplate footer\n\n$tag tail $i"))
        .toDF("doc_id", "text")
    DedupOps.landParagraphStore(para("base", 10), "text", name)
    val n0 = spark.table(s"${name}_paras").count()

    val batch = para("newer", 6)
    poison(s"${name}_paras")
    intercept[Exception] {
      DedupOps.appendParagraphStore(batch, "text", name, batchId = 1L)
    }
    heal(s"${name}_paras")
    assert(spark.table(s"${name}_paras").count() == n0)
    val n1 = DedupOps.appendParagraphStore(batch, "text", name, batchId = 1L)
    assert(n1 > 0)
    val store = spark.table(s"${name}_paras")
    assert(store.count() == n0 + n1 &&
      store.select("para_hash").distinct().count() == n0 + n1,
      "retried store must hold exactly one row per paragraph hash")
    // re-delivery: nothing new
    assert(DedupOps.appendParagraphStore(batch, "text", name, batchId = 2L) == 0L)
  }

  test("compaction: a side write that dies mid-rewrite leaves the original " +
       "table intact; the retried compaction converges") {
    val name = "chaos_cp"
    dropAll(name, Seq("meta", "shingles", "bands"))
    spark.sql(s"DROP TABLE IF EXISTS ${name}_bands__compact"): Unit
    DedupOps.landNearDupIndex(docs(0L until 20L, "base"), "text", name,
      numHashes = 32, bands = 8, shingleSize = 3)
    assert(DedupOps.appendNearDupIndex(docs(300L until 310L, "more"), "text",
      name) == 10L)
    val bandsBefore = spark.table(s"${name}_bands").collect()
      .map(_.toString).sorted

    // fault: a garbage parquet file inside the live table makes the side
    // write's READ fail mid-rewrite — a real aborted compaction job with
    // possible side-location leftovers
    val garbage = new java.io.File(tableDir(s"${name}_bands"),
      "part-99999-zzz-garbage.c000.snappy.parquet")
    java.nio.file.Files.write(garbage.toPath,
      "this is not a parquet file".getBytes("UTF-8"))
    spark.catalog.refreshTable(s"${name}_bands")
    intercept[Exception] {
      DedupOps.compactNearDupIndex(spark, name)
    }
    // heal and retry: the original rows are all intact, the retry clears
    // any crashed-side leftovers and compacts to one file per bucket
    assert(garbage.delete())
    spark.catalog.refreshTable(s"${name}_bands")
    val result = DedupOps.compactNearDupIndex(spark, name)
    val bandsAfter = spark.table(s"${name}_bands").collect()
      .map(_.toString).sorted
    assert(bandsAfter.sameElements(bandsBefore),
      "compaction must preserve the exact row multiset")
    val (beforeFiles, afterFiles) = result(s"${name}_bands")
    assert(afterFiles <= 8 && afterFiles < beforeFiles,
      s"expected collapse to <=8 bucket files, got $beforeFiles -> $afterFiles")
  }

  test("streaming ingest: a micro-batch whose append crashed re-delivers " +
       "through a REAL checkpoint restart and the index converges") {
    val name = "chaos_st"
    dropAll(name, Seq("meta", "shingles", "bands"))
    dropAll(s"${name}_fresh", Seq("meta", "shingles", "bands"))
    val corpus = docs(0L until 20L, "base")
    DedupOps.landNearDupIndex(corpus, "text", name,
      numHashes = 32, bands = 8, shingleSize = 3)

    val root = java.nio.file.Files.createTempDirectory("graft-chaos-stream")
    val inDir = root.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    // two single-file micro-batches: b0 = new docs + a landed copy,
    // b1 = more new docs
    def stage(df: DataFrame, n: String): Unit = {
      val tmp = root.resolve(s"stage_$n").toString
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, inDir.resolve(s"$n.parquet")): Unit
    }
    stage(docs(400L until 405L, "fresh").unionByName(docs(0L until 2L, "base")), "b0")
    stage(docs(600L until 604L, "later"), "b1")

    val delivered =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[Long])]()
    val sink = (accepted: DataFrame, batchId: Long) => {
      delivered.add((batchId,
        accepted.select("doc_id").collect().map(_.getLong(0)).toSet)): Unit
    }
    val schema = corpus.schema
    def startQuery() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      .writeStream
      .foreachBatch(graft.streaming.StreamOps.dedupAgainstIndexBatch(
        "doc_id", "text", name)(sink))
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()

    // attempt 1: sink delivers batch 0, then the index append dies for real
    poison(s"${name}_shingles")
    val q1 = startQuery()
    val streamErr = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(streamErr != null)
    heal(s"${name}_shingles")

    // attempt 2: SAME checkpoint — the engine re-delivers batch 0, the
    // retry appends, then batch 1 proceeds
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val byBatch = delivered.toArray(Array.empty[(Long, Set[Long])])
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSeq }
    // at-least-once: batch 0 delivered on BOTH attempts, identical rows
    assert(byBatch(0L).length == 2 &&
      byBatch(0L).forall(_ == (400L until 405L).toSet),
      s"batch0 deliveries: ${byBatch(0L)}")
    assert(byBatch(1L) == Seq((600L until 604L).toSet))

    // the appends ran in the stream's CLONED session — refresh this
    // session's relation cache before probing (the documented visibility
    // rule of dedupAgainstIndexBatch)
    spark.catalog.refreshTable(s"${name}_shingles")
    spark.catalog.refreshTable(s"${name}_bands")

    // index converged to the fresh-land oracle
    DedupOps.landNearDupIndex(
      corpus.unionByName(docs(400L until 405L, "fresh"))
        .unionByName(docs(600L until 604L, "later")),
      "text", s"${name}_fresh", numHashes = 32, bands = 8, shingleSize = 3)
    assert(spark.table(s"${name}_shingles").select("__ref_id").distinct().count()
      == spark.table(s"${name}_fresh_shingles").count())
    val probe = docs(400L until 402L, "fresh")
      .unionByName(docs(900L until 902L, "novel"))
    def surviving(ix: String) =
      DedupOps.nearDedupAgainstIndex(probe, "doc_id", "text", ix)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surviving(name) == surviving(s"${name}_fresh"))
    assert(surviving(name) == Set(900L, 901L))
  }
}
