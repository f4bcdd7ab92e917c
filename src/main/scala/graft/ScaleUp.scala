package graft

import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Derives a `factor`×-scaled copy of a testdata directory for SCALING
 * measurements (`runMain graft.ScaleUp <srcDir> <dstDir> <factor>`), so the
 * bench suite can produce an sf1-equivalent datapoint from the shipped
 * sf0.1 tables and expose accidentally super-linear operators before any
 * 100× claim (VERDICT r6 #8). This is measurement tooling — correctness
 * verification stays on the driver-generated data untouched.
 *
 * Scaling is not naive row duplication, which would distort the very
 * operators worth measuring:
 *  - fact keys shift per copy (orders/lineitem/customer/events), so join
 *    fan-outs and group counts scale linearly like a genuinely bigger corpus;
 *  - document texts of copy i>0 are copy-TAGGED (see [[scaleDocuments]]),
 *    making shingle sets disjoint across copies: the scaled corpus's
 *    ground-truth near-dup pair count and LSH candidate count are exactly
 *    `factor` × the original's, so any super-linear wall-clock curve is the
 *    ENGINE's, not the data's;
 *  - embeddings of copy i rotate the vector by i positions — same norm and
 *    component distribution, decorrelated direction, so ANN top-k does not
 *    degenerate into 10-way exact ties;
 *  - dimension tables (region/nation/supplier/part) pass through: a bigger
 *    corpus keys into the SAME dims, which is what keeps them
 *    broadcast-able at any scale.
 */
object ScaleUp {

  /** Runtime-metric name prefix for the document-scaling counters (same
    * consumer contract as [[graft.ops.DedupOps.ObservedMetrics]]: match on
    * the prefix; the suffix keeps CollectMetrics names unique). */
  val SpliceMetrics = "graft.scaleup.docs"
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The document-table scaling transform, callable outside the CLI so specs
    * can assert the near-dup pair curve on the EXACT corpus the 10× bench
    * measures. Copy c>0 of each doc is the original text with every 3rd
    * word suffixed by a copy tag (`word` → `wordzc7z` in copy 7); copy 0 is
    * untouched. Extra columns pass through (`n_chars` recomputed).
    *
    * Why tagging, not splicing: the previous design spliced copy halves
    * from rotating partners, but every copy of doc d then shared d's front
    * half, so sibling copies sat at Jaccard ≈ 0.33 — and 16-band/4-row LSH
    * promotes ~17% of those Θ(factor²) sibling pairs into candidates. The
    * ScalingMetricsSpec linearity gate caught exactly that (candidate
    * density 0.115/doc at 2× vs 0.685/doc at 6×): the 13×-at-10× q25
    * wall-clock datapoint flagged since r6 was the measurement corpus
    * manufacturing quadratic work, not an engine defect. Any half-splicing
    * scheme has this by pigeonhole (f·n copies drawn from 2n halves).
    *
    * Tagging instead makes every word ≥3-shingle contain a copy-tagged
    * word, so shingle sets are DISJOINT across copies while Jaccard within
    * a copy is exactly the original corpus's (tagging is position-keyed and
    * content-blind, so position-aligned near-dups keep their overlap).
    * Ground truth under any shingle length ≥ 3: near-dup pairs and LSH
    * candidates are exactly `factor` × the original's, plus O(n²f²/2³¹)
    * random band-hash collisions (single digits at 10×). A super-linear
    * candidate_pairs reading on this corpus is therefore the engine's.
    *
    * Emits `null_text_copy_rows` (copies of null-text docs — they carry no
    * shingle mass and cannot bend the pair curve; counted so corpus-null
    * effects are attributable, ADVICE r8). Read via `obs` if supplied, else
    * from a listener on the [[SpliceMetrics]] prefix.
    */
  def scaleDocuments(docs: DataFrame, factor: Int,
                     obs: Option[Observation] = None): DataFrame = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val copyIdx = explode(sequence(lit(0L), lit(factor - 1L), lit(1L)))
    // duplicate source ids would alias distinct docs onto one scaled id —
    // assert loudly instead of silently merging
    val (nDocs, nDistinct, docStride) = {
      val r = docs.agg(count(lit(1)), countDistinct(col("doc_id")),
        max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2) + 1L)
    }
    require(nDistinct == nDocs,
      s"ScaleUp needs unique doc_ids; got $nDistinct distinct over $nDocs rows")
    val nullCopyCount =
      sum(when(col("__c") > 0 && col("text").isNull, 1L).otherwise(0L))
        .as("null_text_copy_rows")
    val flagged = docs.withColumn("__c", copyIdx)
    val observed = obs match {
      case Some(o) => flagged.observe(o, nullCopyCount)
      case None => flagged.observe(
        s"$SpliceMetrics#${obsCounter.incrementAndGet()}", nullCopyCount)
    }
    val tag = concat(lit("zc"), col("__c").cast("string"), lit("z"))
    val tagged = when(col("__c") === 0 || col("text").isNull, col("text"))
      .otherwise(array_join(
        transform(split(col("text"), " "), (w, i) =>
          when(i % 3 === 2 && length(w) > 0, concat(w, tag)).otherwise(w)),
        " "))
    val others: Seq[Column] = docs.columns.toSeq
      .filterNot(c => c == "doc_id" || c == "text")
      .map {
        case "n_chars" => length(col("__tagged")).cast("long").as("n_chars")
        case c => col(c)
      }
    observed
      .withColumn("__tagged", tagged)
      .select((col("doc_id") + col("__c") * docStride).as("doc_id") +:
        col("__tagged").as("text") +: others: _*)
  }

  // ------------------------------------------------------------------
  // Skew injectors (round-14, VERDICT r13 #1): the decade corpora above
  // are TAG-DISJOINT UNIFORM copies — ground truth scales linearly, but
  // no hot key does, so the engine's skew defenses (maxBucket, maxCell,
  // saltedJoin, AQE skew-join) had never been exercised at scale. Each
  // injector plants one adversarial hot spot, deterministically (no
  // RNG — hash-of-id keyed), AFTER the copy-scaling transforms, so the
  // hot mass grows linearly with the factor exactly like a production
  // pathology (boilerplate pages, hub embeddings, a bot user) would.
  // Skew corpora are BENCH-ONLY: they change query results by design.
  // ------------------------------------------------------------------

  /** One fixed boilerplate page (~70 words — enough 3-shingle mass to
    * dominate any MinHash signature). Every boilerplate doc is
    * byte-identical, so they all share one exact-hash key, one MinHash
    * signature, and one LSH bucket per band: the hottest bucket grows as
    * 1% of the corpus. */
  val BoilerplateText: String =
    ("all rights reserved this page is provided for informational " +
      "purposes only and is subject to change without notice please " +
      "review the terms of service and the privacy policy before using " +
      "this site the content on this page may not be reproduced " +
      "distributed transmitted cached or otherwise used except with the " +
      "prior written permission of the publisher contact support for " +
      "questions about your account subscription billing or any other " +
      "inquiry thank you for visiting and have a nice day")

  /** Docs with `doc_id % everyN == 7` become the shared boilerplate page
    * (null texts stay null — they carry no shingle mass either way). */
  def injectBoilerplateDocs(docs: DataFrame, everyN: Int = 100): DataFrame =
    docs
      .withColumn("text",
        // phase 7 % everyN, not a bare 7: pmod(id, n) < n, so a literal
        // phase above everyN-1 would silently select nothing
        when(pmod(col("doc_id"), lit(everyN.toLong)) === lit(7L % everyN) &&
          col("text").isNotNull, lit(BoilerplateText))
          .otherwise(col("text")))
      .withColumn("n_chars",
        if (docs.columns.contains("n_chars"))
          length(col("text")).cast("long") else lit(null))
      .select(docs.columns.map(col).toIndexedSeq: _*)

  /** Vectors with `vec_id >= minId && vec_id % everyN == 7 % everyN`
    * collapse into one hub region: a fixed direction (`sin(i)` per
    * component) plus a tiny hash-of-(id,dim) jitter, so hub vectors are
    * pairwise cos ≈ 1 but not byte-identical.
    *
    * `minId` matters: the IVF paths sample centroids from the lowest
    * ids, and a hub interleaved uniformly with the centroid sample
    * plants ~`nCells/everyN` near-identical centroids — argmax
    * assignment then SPLITS the hub mass evenly across them at ~128
    * rows/cell, defusing the adversary by construction (a genuinely
    * useful property of corpus-sampled centroids, but not what a skew
    * test wants). A production hot region arrives in an ingest batch
    * with high ids, outside any centroid prefix — `minId` above the
    * cell count reproduces that: zero hub centroids, every hub row
    * argmaxes into ONE cold cell, and that cell is the `maxCell`
    * adversary. */
  def injectHubEmbeddings(emb: DataFrame, everyN: Int = 50,
                          minId: Long = 0L): DataFrame = {
    val dimC = size(col("embedding"))
    val hub = zip_with(
      transform(sequence(lit(1), dimC), i => sin(i.cast("double"))),
      transform(sequence(lit(1), dimC), i =>
        (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double")
          / lit(1000.0) - lit(0.5)) * lit(0.002)),
      (h, j) => (h + j).cast("float"))
    emb.withColumn("embedding",
      when(col("vec_id") >= lit(minId) &&
        pmod(col("vec_id"), lit(everyN.toLong)) === lit(7L % everyN) &&
        col("embedding").isNotNull, hub)
        .otherwise(col("embedding")))
  }

  /** Events get a Zipf-ish user domain plus one bot user: 1/`hotEvery`
    * of rows collapse onto user 0, the rest remap log-uniformly over
    * [1, nUsers) (rank-r mass ~ 1/(r ln N) — a discrete Zipf(1) tail).
    * Hash-of-event_id keyed, so the remap is deterministic and
    * factor-stable. */
  def injectEventSkew(ev: DataFrame, nUsers: Long,
                      hotEvery: Int = 10): DataFrame = {
    require(nUsers >= 2, s"need >= 2 users, got $nUsers")
    val u = (pmod(xxhash64(col("event_id")), lit(1000000L)).cast("double")
      + lit(0.5)) / lit(1000000.0)
    val zipf = floor(exp(u * lit(math.log(nUsers.toDouble)))).cast("long")
    ev.withColumn("user_id",
      when(col("user_id").isNull, col("user_id"))
        .when(pmod(xxhash64(col("event_id"), lit(42)),
          lit(hotEvery.toLong)) === 0L, lit(0L))
        .otherwise(zipf))
  }

  /** 1/`hotEvery` of lineitem rows collapse onto one hot order key (the
    * smallest existing key, so the join stays total) — the AQE
    * skew-join / saltedJoin adversary on the fact-fact axis. */
  def injectHotOrderKey(li: DataFrame, hotKey: Long,
                        hotEvery: Int = 50): DataFrame =
    li.withColumn("l_orderkey",
      when(pmod(xxhash64(col("l_orderkey"), lit(7)),
        lit(hotEvery.toLong)) === 0L, lit(hotKey))
        .otherwise(col("l_orderkey")))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3 && args.length <= 5,
      "usage: ScaleUp <srcDir> <dstDir> <factor> [skew] [only=t1,t2]")
    val Array(src, dst, factorS) = args.take(3)
    val opts = args.drop(3)
    val skew = opts.contains("skew")
    // only=documents,embeddings (r15): scale JUST the named tables by
    // `factor`; everything else passes through at factor 1 — the
    // 1000x skew probes need 1000x documents/embeddings without
    // manufacturing a 600M-row lineitem nobody measures
    val only: Set[String] = opts.find(_.startsWith("only="))
      .map(_.stripPrefix("only=").split(",").toSet)
      .getOrElse(Set.empty)
    opts.foreach(o => require(o == "skew" || o.startsWith("only="),
      s"unknown option '$o' (want: skew, only=...)"))
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def ftab(t: String): Int =
      if (only.isEmpty || only.contains(t)) factor else 1
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    // Scaled FACT tables must not collapse into one parquet file: the
    // source sf dirs are single-file, the copy-explode preserves the scan's
    // 1-partition layout, and the write then emits ONE file regardless of
    // factor — at 100x that single file serializes every map-side phase of
    // the measured queries into one task (measured r13: q163's IVF cell
    // assignment + window partial ran as one 700 s task while 31 cores
    // idled, inflating the decade-2 wall ratios to ~13x). A genuinely
    // 100x-bigger corpus arrives in ~100x the files; mirror that — factor
    // files per table, so per-FILE size stays the source's and scan
    // parallelism grows with the data exactly as it would in production.
    def wr(df: DataFrame, t: String, nFiles: Int): Unit =
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    def copies(t: String): Column =
      explode(sequence(lit(0L), lit(ftab(t) - 1L), lit(1L)))

    // dims pass through unchanged (and stay single-file: they are the
    // broadcast-able side at any scale — that is the point of them)
    Seq("region", "nation", "supplier", "part").foreach(t =>
      wr(rd(t), t, nFiles = 1))

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val cust = rd("customer")
    val custStride = maxOf(cust, "c_custkey")
    wr(cust.withColumn("__c", copies("customer"))
      .withColumn("c_custkey", col("c_custkey") + col("__c") * custStride)
      .drop("__c"), "customer", ftab("customer"))

    val ord = rd("orders")
    val ordStride = maxOf(ord, "o_orderkey")
    wr(ord.withColumn("__c", copies("orders"))
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * ordStride)
      .withColumn("o_custkey", col("o_custkey") + col("__c") * custStride)
      .drop("__c"), "orders", ftab("orders"))

    val liScaled = rd("lineitem").withColumn("__c", copies("lineitem"))
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * ordStride)
      .drop("__c")
    wr(if (skew) {
      val hotKey = ord.agg(min(col("o_orderkey"))).head().getLong(0)
      injectHotOrderKey(liScaled, hotKey)
    } else liScaled, "lineitem", ftab("lineitem"))

    val ev = rd("events")
    val evStride = maxOf(ev, "event_id")
    val userStride = maxOf(ev, "user_id")
    val evScaled = ev.withColumn("__c", copies("events"))
      .withColumn("event_id", col("event_id") + col("__c") * evStride)
      .withColumn("user_id", col("user_id") + col("__c") * userStride)
      .drop("__c")
    wr(if (skew) injectEventSkew(evScaled,
         nUsers = userStride * ftab("events"))
       else evScaled, "events", ftab("events"))

    val spliceObs = Observation("scaleup-docs")
    val docsScaled = scaleDocuments(rd("documents"), ftab("documents"),
      Some(spliceObs))
    wr(if (skew) injectBoilerplateDocs(docsScaled) else docsScaled,
      "documents", ftab("documents"))
    val nullCopies =
      spliceObs.get.getOrElse("null_text_copy_rows", 0L) match {
        case null => 0L
        case n: java.lang.Number => n.longValue()
      }

    val emb = rd("embeddings")
    val vecStride = maxOf(emb, "vec_id")
    val dimC = size(col("embedding"))
    val rot = pmod(col("__c"), dimC.cast("long")).cast("int")
    val embScaled = emb.withColumn("__c", copies("embeddings"))
      .withColumn("embedding", when(rot === 0, col("embedding")).otherwise(
        concat(slice(col("embedding"), rot + 1, dimC - rot),
          slice(col("embedding"), lit(1), rot))))
      .withColumn("vec_id", col("vec_id") + col("__c") * vecStride)
      .drop("__c")
    // hub = the TOP HALF of the id space at 1-in-50 (1% overall): above
    // any derived centroid prefix, so the hub mass argmaxes into one cell
    // (see injectHubEmbeddings doc) — everyN=50 keeps the corpus-wide
    // hub fraction at the same 1% as the boilerplate docs
    val hubMinId = vecStride * ftab("embeddings") / 2
    wr(if (skew) injectHubEmbeddings(embScaled, everyN = 50,
         minId = hubMinId)
       else embScaled, "embeddings", ftab("embeddings"))

    val skewCounts =
      if (!skew) ""
      else {
        // read back what landed — the skew section of the scaling record
        // wants the actual hot-mass sizes, not the intended ones
        val nBoiler = spark.read.parquet(s"$dst/documents.parquet")
          .filter(col("text") === BoilerplateText).count()
        val nHub = spark.read.parquet(s"$dst/embeddings.parquet")
          .filter(col("vec_id") >= lit(hubMinId) &&
            pmod(col("vec_id"), lit(50L)) === 7L).count()
        val nHot = spark.read.parquet(s"$dst/events.parquet")
          .filter(col("user_id") === 0L).count()
        s""","skew":true,"boilerplate_docs":$nBoiler,"hub_vectors":$nHub,"hot_user_events":$nHot"""
      }
    println(s"""{"scaleup":"done","src":"$src","dst":"$dst","factor":$factor,"null_text_copy_rows":$nullCopies$skewCounts}""")
    spark.stop()
  }
}
