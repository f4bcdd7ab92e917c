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

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(src, dst, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
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
    def wr(df: DataFrame, t: String, nFiles: Int = factor): Unit =
      df.repartition(nFiles).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    val copyIdx = explode(sequence(lit(0L), lit(factor - 1L), lit(1L)))

    // dims pass through unchanged (and stay single-file: they are the
    // broadcast-able side at any scale — that is the point of them)
    Seq("region", "nation", "supplier", "part").foreach(t =>
      wr(rd(t), t, nFiles = 1))

    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    val cust = rd("customer")
    val custStride = maxOf(cust, "c_custkey")
    wr(cust.withColumn("__c", copyIdx)
      .withColumn("c_custkey", col("c_custkey") + col("__c") * custStride)
      .drop("__c"), "customer")

    val ord = rd("orders")
    val ordStride = maxOf(ord, "o_orderkey")
    wr(ord.withColumn("__c", copyIdx)
      .withColumn("o_orderkey", col("o_orderkey") + col("__c") * ordStride)
      .withColumn("o_custkey", col("o_custkey") + col("__c") * custStride)
      .drop("__c"), "orders")

    wr(rd("lineitem").withColumn("__c", copyIdx)
      .withColumn("l_orderkey", col("l_orderkey") + col("__c") * ordStride)
      .drop("__c"), "lineitem")

    val ev = rd("events")
    val evStride = maxOf(ev, "event_id")
    val userStride = maxOf(ev, "user_id")
    wr(ev.withColumn("__c", copyIdx)
      .withColumn("event_id", col("event_id") + col("__c") * evStride)
      .withColumn("user_id", col("user_id") + col("__c") * userStride)
      .drop("__c"), "events")

    val spliceObs = Observation("scaleup-docs")
    wr(scaleDocuments(rd("documents"), factor, Some(spliceObs)), "documents")
    val nullCopies =
      spliceObs.get.getOrElse("null_text_copy_rows", 0L) match {
        case null => 0L
        case n: java.lang.Number => n.longValue()
      }

    val emb = rd("embeddings")
    val vecStride = maxOf(emb, "vec_id")
    val dimC = size(col("embedding"))
    val rot = pmod(col("__c"), dimC.cast("long")).cast("int")
    wr(emb.withColumn("__c", copyIdx)
      .withColumn("embedding", when(rot === 0, col("embedding")).otherwise(
        concat(slice(col("embedding"), rot + 1, dimC - rot),
          slice(col("embedding"), lit(1), rot))))
      .withColumn("vec_id", col("vec_id") + col("__c") * vecStride)
      .drop("__c"), "embeddings")

    println(s"""{"scaleup":"done","src":"$src","dst":"$dst","factor":$factor,"null_text_copy_rows":$nullCopies}""")
    spark.stop()
  }
}
