package graft

import org.apache.spark.sql.functions._
import graft.ops.SearchOps

/**
 * BM25 retrieval: hand-computed reference scores on a tiny corpus (the
 * formula replayed in driver Scala with the same decimal staging the engine
 * uses), the inline-vs-landed row-identity contract, the bucket-pruning
 * plan shape of the landed path, and the null/empty/absent-term edges.
 */
class SearchOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry apple durian"),
    (4L, "")).toDF("doc_id", "text")

  /** Driver-side replay of SearchOps.bm25Term + the decimal sum + round(6):
    * same association order, same DECIMAL(18,9) HALF_UP staging. */
  private def expectedScore(tfs: Map[String, Long], dl: Long,
                            dfs: Map[String, Long], nDocs: Long,
                            totalDl: Long, k1: Double = 1.2,
                            b: Double = 0.75): Double = {
    val avgdl = totalDl.toDouble / nDocs
    val sum = tfs.foldLeft(BigDecimal(0)) { case (acc, (term, tf)) =>
      val df = dfs(term)
      val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
      val denom = tf + k1 * ((1.0 - b) + (b * dl) / avgdl)
      val c = (idf * tf) * (k1 + 1.0) / denom
      acc + BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    sum.toDouble // decimal(18,9) sums are exact; round(x, 6) below
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopK matches the hand-computed Okapi formula, ranks ties by id, " +
       "and counts empty docs in N/avgdl") {
    val got = SearchOps.bm25TopK(corpus, "doc_id", "text",
      terms = Seq("apple", "cherry"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // N = 4 (the empty doc counts), total_dl = 3 + 2 + 3 + 0 = 8
    val dfs = Map("apple" -> 2L, "cherry" -> 2L)
    val e1 = round6(expectedScore(Map("apple" -> 2L), 3, dfs, 4, 8))
    val e2 = round6(expectedScore(Map("cherry" -> 1L), 2, dfs, 4, 8))
    val e3 = round6(expectedScore(Map("apple" -> 1L, "cherry" -> 1L), 3, dfs, 4, 8))
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId == Map(1L -> e1, 2L -> e2, 3L -> e3), s"got ${byId.toList}")
    // d3 matches both terms -> highest; d1's double-tf apple next; the
    // shorter all-cherry d2 last (hand-checked orders)
    assert(got.sortBy(_._3).map(_._1).toList == List(3L, 1L, 2L))
  }

  test("absent terms contribute nothing; all-absent query is empty; " +
       "k caps the result") {
    val withAbsent = SearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry", "zzz_absent"), k = 10).collect()
    val without = SearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 10).collect()
    assert(withAbsent.map(_.toSeq).toSet == without.map(_.toSeq).toSet)
    assert(SearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("zzz_absent"), k = 10).count() == 0)
    val capped = SearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 2).collect()
    assert(capped.length == 2 && capped.map(_.getLong(2)).toSet == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopK(corpus, "doc_id", "text", Seq.empty)
    }
  }

  test("landed index path is row-identical to the inline path, reads " +
       "bucket-pruned postings, and land-once is idempotent") {
    val idx = "graft_test_search_idx"
    Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    SearchOps.landSearchIndex(corpus, "doc_id", "text", idx, buckets = 4)
    val viaIndex = SearchOps.bm25AgainstIndex(spark, idx,
      Seq("apple", "cherry"), k = 10)
    val inline = SearchOps.bm25TopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 10)
    assert(viaIndex.collect().map(_.toSeq).toList ==
           inline.collect().map(_.toSeq).toList,
      "landed path must be row-identical to the inline path")
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"postings should read as a bucketed scan:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"token IN (...) should prune postings buckets:\n$plan")
    // idempotent re-land: no-op, same rows
    SearchOps.landSearchIndex(corpus, "doc_id", "text", idx, buckets = 4)
    assert(SearchOps.bm25AgainstIndex(spark, idx, Seq("apple"), k = 10)
      .count() == 2)
    intercept[IllegalArgumentException] {
      SearchOps.bm25AgainstIndex(spark, "graft_no_such_index", Seq("x"))
    }
    Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("appendSearchIndex folds new docs in (stats refresh, scores match " +
       "a fresh full-corpus index), skips already-landed ids, and needs " +
       "a landed index") {
    val idx = "graft_test_search_append"
    Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      val day0 = corpus.filter(col("doc_id") =!= 3L)
      SearchOps.landSearchIndex(day0, "doc_id", "text", idx, buckets = 4)
      val added = SearchOps.appendSearchIndex(
        corpus.filter(col("doc_id") === 3L), "doc_id", "text", idx)
      assert(added == 1L, s"added $added")
      // post-append scores must equal the inline computation on the FULL
      // corpus — meta, postings, and df all see the appended doc
      val viaIndex = SearchOps.bm25AgainstIndex(spark, idx,
        Seq("apple", "cherry"), k = 10).collect().map(_.toSeq).toList
      val inline = SearchOps.bm25TopK(corpus, "doc_id", "text",
        Seq("apple", "cherry"), k = 10).collect().map(_.toSeq).toList
      assert(viaIndex == inline,
        s"appended index diverged:\n$viaIndex\nvs\n$inline")
      // re-appending the same doc is a no-op (anti-join on _docs)
      assert(SearchOps.appendSearchIndex(
        corpus.filter(col("doc_id") === 3L), "doc_id", "text", idx) == 0L)
      assert(SearchOps.bm25AgainstIndex(spark, idx,
        Seq("apple", "cherry"), k = 10).collect().map(_.toSeq).toList
        == inline, "no-op append must not change scores")
      intercept[IllegalArgumentException] {
        SearchOps.appendSearchIndex(corpus, "doc_id", "text",
          "graft_no_such_index")
      }
    } finally Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("null text rows count toward corpus stats and never match") {
    val withNull = corpus.unionByName(
      Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val got = SearchOps.bm25TopK(withNull, "doc_id", "text",
      Seq("apple"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // N = 5 now, total_dl unchanged at 8
    val dfs = Map("apple" -> 2L)
    assert(got == Map(
      1L -> round6(expectedScore(Map("apple" -> 2L), 3, dfs, 5, 8)),
      3L -> round6(expectedScore(Map("apple" -> 1L), 3, dfs, 5, 8))))
  }

  test("phraseSearch: consecutive-and-in-order only; overlapping matches " +
       "counted; repeated-token phrases; case-folded query") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big hash join beats a sort"),      // one match
      (2L, "hash join and hash join again"),   // two matches
      (3L, "join hash"),                       // wrong order -> no match
      (4L, "hash x join"),                     // not consecutive -> no
      (5L, "go go go"),                        // repeated-token phrase test
      (6L, "nothing here")
    ).toDF("doc_id", "text")
    val got = graft.ops.SearchOps.phraseSearch(docs, "doc_id", "text",
        Seq("HASH", "Join"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), s"got $got")
    val rep = graft.ops.SearchOps.phraseSearch(docs, "doc_id", "text",
        Seq("go", "go"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // "go go go": positions (0,1) and (1,2) -> 2 overlapping matches
    assert(rep == Map(5L -> 2L), s"got $rep")
    intercept[IllegalArgumentException] {
      graft.ops.SearchOps.phraseSearch(docs, "doc_id", "text", Nil)
    }
  }

  test("bm25TopKPerQuery: row-identical to per-query bm25TopK calls; " +
       "ranks are per-query; k caps each query independently") {
    val queries = Seq((100L, "apple cherry"), (200L, "banana")).toDF("qid", "qtext")
    val batch = SearchOps.bm25TopKPerQuery(corpus, "doc_id", "text",
        queries, "qid", "qtext", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val single = Seq(100L -> Seq("apple", "cherry"), 200L -> Seq("banana"))
      .flatMap { case (qid, terms) =>
        SearchOps.bm25TopK(corpus, "doc_id", "text", terms, k = 2)
          .collect().map(r => (qid, r.getLong(0), r.getDouble(1), r.getLong(2)))
      }.toSet
    assert(batch == single, s"batch $batch vs single $single")
    // duplicate query terms collapse (set semantics, like the Seq form)
    val dup = SearchOps.bm25TopKPerQuery(corpus, "doc_id", "text",
        Seq((1L, "apple apple cherry")).toDF("qid", "qtext"),
        "qid", "qtext", k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    val plain = batch.filter(_._1 == 100L).map(r => (r._2, r._3))
    assert(dup == plain, s"qtf must not double-count: $dup vs $plain")
    intercept[IllegalArgumentException] {
      SearchOps.bm25TopKPerQuery(corpus, "doc_id", "text",
        queries.withColumnRenamed("qid", "doc_id"), "doc_id", "qtext", k = 2)
    }
  }

  test("bm25AgainstIndexPerQuery: row-identical to the inline batch path " +
       "(with and without exclusion), bucket-pruned postings, term-cap " +
       "guard, empty-token query batch yields empty") {
    val idx = "graft_test_search_batch"
    Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    try {
      SearchOps.landSearchIndex(corpus, "doc_id", "text", idx, buckets = 4)
      val qs = Seq((10L, "apple cherry"), (20L, "banana")).toDF("qid", "qtext")
      val landed = SearchOps.bm25AgainstIndexPerQuery(spark, idx,
        qs, "qid", "qtext", k = 5)
      val inline = SearchOps.bm25TopKPerQuery(corpus, "doc_id", "text",
        qs, "qid", "qtext", k = 5)
      assert(landed.collect().map(_.toSeq).toSet ==
             inline.collect().map(_.toSeq).toSet)
      val plan = landed.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"),
        s"term union should prune postings buckets:\n$plan")
      val pos = Seq((10L, 3L)).toDF("qid", "doc_id")
      assert(SearchOps.bm25AgainstIndexPerQuery(spark, idx, qs, "qid",
          "qtext", k = 5, exclude = Some(pos)).collect().map(_.toSeq).toSet ==
        SearchOps.bm25TopKPerQuery(corpus, "doc_id", "text", qs, "qid",
          "qtext", k = 5, exclude = Some(pos)).collect().map(_.toSeq).toSet)
      // a query batch that tokenizes to nothing is empty, not an error
      assert(SearchOps.bm25AgainstIndexPerQuery(spark, idx,
        Seq((1L, "...")).toDF("qid", "qtext"), "qid", "qtext").isEmpty)
      intercept[IllegalStateException] {
        SearchOps.bm25AgainstIndexPerQuery(spark, idx, qs, "qid", "qtext",
          maxQueryTerms = 2)
      }
    } finally Seq(s"${idx}_meta", s"${idx}_postings", s"${idx}_docs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("mineHardNegatives: positives are excluded BEFORE the top-k window, " +
       "so ranks re-pack and the k slots fill with negatives") {
    val queries = Seq((7L, "apple cherry")).toDF("qid", "qtext")
    // full ranking for this query is 3, 1, 2 (hand-checked in the bm25TopK
    // spec); excluding gold doc 3 must promote 1 and 2 to ranks 1 and 2
    val positives = Seq((7L, 3L)).toDF("qid", "doc_id")
    val negs = SearchOps.mineHardNegatives(corpus, "doc_id", "text",
        queries, "qid", "qtext", positives, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(negs.toList.sortBy(_._2) == List((1L, 1L), (2L, 2L)), s"got ${negs.toList}")
  }
}
