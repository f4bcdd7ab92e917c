package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
 *  - document texts of copy i>0 splice the front half of one doc with the
 *    back half of a rotating partner: shingle overlap with either parent
 *    lands near 50%, below the 0.7 near-dup threshold, keeping LSH bucket
 *    sizes and pair counts ~linear (verbatim copies would square them);
 *  - embeddings of copy i rotate the vector by i positions — same norm and
 *    component distribution, decorrelated direction, so ANN top-k does not
 *    degenerate into 10-way exact ties;
 *  - dimension tables (region/nation/supplier/part) pass through: a bigger
 *    corpus keys into the SAME dims, which is what keeps them
 *    broadcast-able at any scale.
 */
object ScaleUp {
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
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    val copyIdx = explode(sequence(lit(0L), lit(factor - 1L), lit(1L)))

    // dims pass through unchanged
    Seq("region", "nation", "supplier", "part").foreach(t => wr(rd(t), t))

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

    val docs = rd("documents")
    val nDocs = docs.count()
    val docStride = maxOf(docs, "doc_id")
    // the splice-partner lookup is modular arithmetic over doc_id, which
    // silently finds NO partner (nulling out every copy's text) unless ids
    // are exactly 0..n-1 — assert that, loudly, instead of assuming it
    val (minId, maxId, nDistinct) = {
      val r = docs.agg(min(col("doc_id")), max(col("doc_id")),
        countDistinct(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // min/max alone pass for duplicate ids plus a gap — exactly the case
    // where the modular lookup finds no partner and nulls the text
    require(minId == 0L && maxId == nDocs - 1L && nDistinct == nDocs,
      s"ScaleUp needs dense unique 0-based doc_ids for the splice-partner " +
      s"lookup; got min=$minId max=$maxId distinct=$nDistinct over $nDocs " +
      s"rows — remap doc_id to row_number()-1 first")
    val partner = docs.select(col("doc_id").as("__pid"), col("text").as("__ptext"))
    val rawPid = pmod(col("doc_id") * 7 + col("__c") * 131 + 3, lit(nDocs))
    val spliced = docs.withColumn("__c", copyIdx)
      // a self-partner would splice a doc with itself: a near-verbatim
      // copy above the 0.7 near-dup threshold, exactly what the rotation
      // is built to avoid — step to the neighbor instead
      .withColumn("__pid",
        when(rawPid === col("doc_id"), pmod(rawPid + 1, lit(nDocs)))
          .otherwise(rawPid))
      .join(partner, Seq("__pid"), "left")
      // a null-text partner must not null-propagate through concat and
      // erase an otherwise-healthy doc's scaled copies — fall back to the
      // doc's own text. The fallback copy is a near-verbatim dup of its
      // original (front half + back half reassemble it), which is the
      // volume-preserving choice; it only fires for docs whose partner has
      // null text, so it cannot bend the pair-count curve unless the
      // source corpus itself is null-heavy
      .withColumn("__ptext", coalesce(col("__ptext"), col("text")))
      .withColumn("__spliced", when(col("__c") === 0, col("text")).otherwise(
        concat(
          col("text").substr(lit(1), (length(col("text")) / 2).cast("int")),
          lit(" "),
          col("__ptext").substr((length(col("__ptext")) / 2 + 1).cast("int"),
            length(col("__ptext")).cast("int")))))
      .select(
        (col("doc_id") + col("__c") * docStride).as("doc_id"),
        col("__spliced").as("text"),
        col("lang"), col("source"),
        length(col("__spliced")).cast("long").as("n_chars"))
    wr(spliced, "documents")

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

    println(s"""{"scaleup":"done","src":"$src","dst":"$dst","factor":$factor}""")
    spark.stop()
  }
}
