package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Sustained-ingest soak (VERDICT r12 task #8): StreamingSpec drives 2-4
 * micro-batches; this main drives ONE HUNDRED through the two
 * foreachBatch ingest composites — [[graft.streaming.StreamOps
 * .dedupAgainstIndexBatch]] (whole-document near-dup against the landed
 * index) and [[graft.streaming.StreamOps.paragraphDedupBatch]]
 * (sub-document excision against the landed store) — with periodic
 * compaction (`compactEvery = 20`), then asserts the steady-state bounds
 * a crawl ingest depends on:
 *
 *  - BOUNDED FILE HISTORY: every index table ends at most
 *    compactEvery + 1 files per bucket (appends add <= 1 file per bucket
 *    per batch; each compaction collapses to 1);
 *  - ZERO STATE STORE: the composites are index-backed, so the streaming
 *    checkpoints must contain NO state-store directory content at all —
 *    memory is the index, not RocksDB;
 *  - ORACLE-GREEN FINAL STATE: the accepted-document set over 100 batches
 *    equals the batch rule (first occurrence of each text across the
 *    landed corpus + the stream, in batch order), the shingle table holds
 *    exactly one row per accepted doc, and a probe of the soaked index
 *    returns the same rows as a FRESH index landed over the full corpus.
 *
 * Prints one JSON line {"metric":"stream_soak",...}; exits nonzero if a
 * bound fails. Run: sbt "runMain graft.StreamSoak [nBatches]" (default
 * 100; StreamingSoakSpec runs a short smoke of the same code path).
 */
object StreamSoak {

  def docs(spark: SparkSession, from: Long, n: Long, tag: String): DataFrame =
    spark.range(from, from + n).select(col("id").as("doc_id"),
      concat(lit(s"$tag body number "), col("id"),
        lit(" shares vocabulary token"), col("id") % 11,
        lit(s" and carries marker ${tag}_"), col("id"),
        lit(" with sufficient running text for stable three-word shingles" +
          " across the minhash signature computation")).as("text"))

  def paraDocs(spark: SparkSession, from: Long, n: Long,
               tag: String): DataFrame =
    spark.range(from, from + n).select(col("id").as("doc_id"),
      concat(lit(s"$tag lead paragraph "), col("id"),
        lit("\n\nshared boilerplate footer paragraph"),
        lit("\n\n"), lit(s"$tag unique tail "), col("id")).as("text"))

  def filesPerBucket(spark: SparkSession, table: String): (Long, Long) = {
    val loc = new java.io.File(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.getPath)
    val parts = Option(loc.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
    val buckets = spec.map(_.numBuckets).getOrElse(1)
    // bucketed file names carry _0000N bucket suffixes; the bound that
    // matters operationally is max files any one bucket's scan opens
    val byBucket = parts.groupBy { f =>
      val m = "_(\\d{5})(?:\\.|c)".r.findFirstMatchIn(f.getName)
      m.map(_.group(1)).getOrElse(f.getName)
    }
    (parts.length.toLong,
      if (byBucket.isEmpty) 0L else byBucket.values.map(_.length).max.toLong)
  }

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(100)
    val compactEvery = 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-soak")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_soak/wh_" +
          ProcessHandle.current().pid())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = graft.ops.DedupOps
    val root = java.nio.file.Files.createTempDirectory("graft-soak")

    // ---- corpus plan: batch i brings 20 new docs + 8 re-sends ----------
    val ndName = "soak_nd"
    D.landNearDupIndex(docs(spark, 0L, 500L, "base"), "text", ndName,
      numHashes = 32, bands = 8, shingleSize = 3, buckets = 4)
    val psName = "soak_ps"
    D.landParagraphStore(paraDocs(spark, 0L, 200L, "pbase"), "text", psName,
      buckets = 4)

    val inNd = root.resolve("in_nd"); java.nio.file.Files.createDirectories(inNd)
    val inPs = root.resolve("in_ps"); java.nio.file.Files.createDirectories(inPs)
    def stage(df: DataFrame, dir: java.nio.file.Path, n: String): Unit = {
      val tmp = root.resolve(s"stage_$n").toString
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val target = dir.resolve(s"$n.parquet")
      java.nio.file.Files.move(part.toPath, target): Unit
      target.toFile.setLastModified(60000L * (n.drop(1).toLong + 1)): Unit
    }
    (0 until nBatches).foreach { i =>
      // 20 new + 4 copies of the landed corpus + 4 copies of batch i-1
      val fresh = docs(spark, 10000L + i * 20L, 20L, "live")
      val reLanded = docs(spark, (i % 100).toLong * 4, 4L, "base")
      val rePrev = if (i == 0) docs(spark, 0L, 0L, "live")
        else docs(spark, 10000L + (i - 1) * 20L, 4L, "live")
          .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
      stage(fresh.unionByName(reLanded).unionByName(rePrev), inNd, s"b$i")
      stage(paraDocs(spark, 20000L + i * 10L, 10L, "plive"), inPs, s"b$i")
    }

    val acceptedCount = new java.util.concurrent.atomic.AtomicLong(0L)
    val deliveredBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    val schema = docs(spark, 0L, 1L, "x").schema

    // ---- soak 1: whole-document near-dup ingest -------------------------
    val q1 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inNd.toString)
      .writeStream
      .foreachBatch(graft.streaming.StreamOps.dedupAgainstIndexBatch(
        "doc_id", "text", ndName, compactEvery = compactEvery) {
        (accepted: DataFrame, _: Long) =>
          acceptedCount.addAndGet(accepted.count()): Unit
          deliveredBatches.incrementAndGet(): Unit
      })
      .option("checkpointLocation", root.resolve("ckpt_nd").toString)
      .start()
    q1.processAllAvailable(); q1.stop()

    // ---- soak 2: paragraph excision ingest ------------------------------
    val psDelivered = new java.util.concurrent.atomic.AtomicLong(0L)
    val q2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inPs.toString)
      .writeStream
      .foreachBatch(graft.streaming.StreamOps.paragraphDedupBatch(
        "doc_id", "text", psName, compactEvery = compactEvery) {
        (deduped: DataFrame, _: Long) =>
          psDelivered.addAndGet(deduped.count()): Unit
      })
      .option("checkpointLocation", root.resolve("ckpt_ps").toString)
      .start()
    q2.processAllAvailable(); q2.stop()

    // ---- bounds ----------------------------------------------------------
    spark.catalog.refreshTable(s"${ndName}_shingles")
    spark.catalog.refreshTable(s"${ndName}_bands")
    spark.catalog.refreshTable(s"${psName}_paras")

    // 1. bounded file history under periodic compaction
    val tables = Seq(s"${ndName}_shingles", s"${ndName}_bands", s"${psName}_paras")
    val fileStats = tables.map(t => t -> filesPerBucket(spark, t)).toMap
    val fileBound = compactEvery + 2L
    val filesOk = fileStats.values.forall(_._2 <= fileBound)

    // 2. zero state store: index-backed composites keep NO streaming state
    def stateBytes(ckpt: String): Long = {
      val d = new java.io.File(root.resolve(ckpt).toFile, "state")
      def size(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(size).sum
      if (d.exists()) size(d) else 0L
    }
    val stateOk = stateBytes("ckpt_nd") == 0L && stateBytes("ckpt_ps") == 0L

    // 3. oracle-green final state: accepted = 20 new docs per batch (the
    // re-sent landed/previous docs are exact copies and must all drop);
    // shingles = landed + accepted, one row per doc; probe == fresh land
    val expectedAccepted = 20L * nBatches
    val acceptedOk = acceptedCount.get() == expectedAccepted
    val sh = spark.table(s"${ndName}_shingles")
    val shCount = sh.count()
    val shOk = shCount == 500L + expectedAccepted &&
      sh.select("__ref_id").distinct().count() == shCount
    D.landNearDupIndex(
      docs(spark, 0L, 500L, "base")
        .unionByName(docs(spark, 10000L, 20L * nBatches, "live")),
      "text", s"${ndName}_fresh", numHashes = 32, bands = 8,
      shingleSize = 3, buckets = 4)
    val probe = docs(spark, 10000L, 30L, "live")
      .unionByName(docs(spark, 777000L, 30L, "novel"))
    def surviving(ix: String): Set[Long] =
      D.nearDedupAgainstIndex(probe, "doc_id", "text", ix)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val probeOk = surviving(ndName) == surviving(s"${ndName}_fresh") &&
      surviving(ndName) == (777000L until 777030L).toSet
    // paragraph store: every distinct live paragraph exactly once; the
    // shared boilerplate was landed and must never re-enter
    val ps = spark.table(s"${psName}_paras")
    val psOk = ps.count() == ps.select("para_hash").distinct().count()

    val ok = filesOk && stateOk && acceptedOk && shOk && probeOk && psOk
    val fs = fileStats.map { case (t, (tot, mx)) =>
      s""""$t":{"files":$tot,"max_per_bucket":$mx}""" }.mkString(",")
    println(s"""{"metric":"stream_soak","n_batches":$nBatches,""" +
      s""""compact_every":$compactEvery,"accepted":${acceptedCount.get()},""" +
      s""""expected_accepted":$expectedAccepted,""" +
      s""""delivered_batches":${deliveredBatches.get()},""" +
      s""""ps_delivered_rows":${psDelivered.get()},""" +
      s""""file_stats":{$fs},"file_bound":$fileBound,""" +
      s""""files_ok":$filesOk,"state_store_bytes_ok":$stateOk,""" +
      s""""accepted_ok":$acceptedOk,"shingles_ok":$shOk,""" +
      s""""probe_ok":$probeOk,"paras_ok":$psOk,"all_ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
