package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * TWO-DRIVER streaming soak (VERDICT r14 #8): one role of a two-JVM run —
 * TwoDriverSoakSpec forks both against one shared external near-dup
 * index. The WRITER drives a checkpointed `dedupAgainstIndexBatch`
 * ingest stream (appends + periodic compactions, all under the
 * cross-application [[graft.sources.WriterLease]]); the READER drives a
 * checkpointed PROBE-ONLY stream (`appendAccepted = false` — the
 * supported second-driver shape) against the same on-disk index for 50+
 * micro-batches while the writer's appends and swaps land underneath it.
 *
 * Reader-consistency contract being proven, per probe class per batch:
 *  - `seed` probes (texts landed before the streams started) must read
 *    as duplicates in EVERY reader batch;
 *  - `fresh` probes (texts nothing ever indexed) must be accepted in
 *    EVERY reader batch;
 *  - `writer-batch-w` probes (texts the writer appends in its batch w)
 *    must flip accepted -> rejected exactly once and never flicker back
 *    (each reader batch sees a complete pre- or post-append view of any
 *    given document — never a lost detection), and any reader batch that
 *    REFRESHED after the writer's `w_done_<w>` marker existed must
 *    already reject batch w's probes;
 *  - streaming state stays ZERO (index-backed composites keep no state
 *    store) and the index file history stays bounded under compaction.
 *
 * The reader's per-batch probe is wrapped in the documented
 * refresh-and-retry loop: a compaction swap between its listing and its
 * scan fails LOUDLY (FileNotFound / stale listing), never silently.
 *
 * Roles (args): `writer <share> <nBatches>` / `reader <share> <nBatches>`.
 */
object TwoDriverSoak {

  private val IDX = "tds_idx"
  private val SEED = 40L
  private val PER_BATCH = 20L

  private def session(share: String, role: String): SparkSession =
    SparkSession.builder()
      .master("local[6]")
      .appName(s"graft-two-driver-soak-$role")
      .config("spark.sql.warehouse.dir", s"$share/wh_$role")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def touch(share: String, name: String, body: String = ""): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(share, name), body.getBytes("UTF-8")): Unit
  private def exists(share: String, name: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(share, name))
  private def waitFor(share: String, name: String, timeoutMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!exists(share, name)) {
      require(System.currentTimeMillis() < deadline, s"timeout on $name")
      Thread.sleep(100)
    }
  }

  /** Stage one parquet file into a streaming-source dir with a
    * monotonically increasing mtime (the StreamSoak trick: the file
    * source orders by mtime, so batch ids follow stage order). */
  private def stage(spark: SparkSession, df: DataFrame, root: String,
                    dir: String, i: Int): Unit = {
    val tmp = s"$root/stage_$dir" // per-role temp: the two JVMs must not
                                  // clobber each other's in-flight write
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = java.nio.file.Paths.get(root, dir, s"b$i.parquet")
    java.nio.file.Files.createDirectories(target.getParent)
    java.nio.file.Files.move(part.toPath, target): Unit
    target.toFile.setLastModified(60000L * (i + 1)): Unit
  }

  def main(args: Array[String]): Unit = {
    val Array(role, share, nStr) = args.take(3)
    val n = nStr.toInt
    val spark = session(share, role)
    spark.sparkContext.setLogLevel("WARN")
    try role match {
      case "writer" => writer(spark, share, n)
      case "reader" => reader(spark, share, n)
    } finally spark.stop()
  }

  // ---------------------------------------------------------------- writer
  private def writer(spark: SparkSession, share: String, n: Int): Unit = {
    val D = graft.ops.DedupOps
    D.landNearDupIndex(StreamSoak.docs(spark, 0L, SEED, "seed"), "text",
      IDX, numHashes = 32, bands = 8, shingleSize = 3, buckets = 4,
      path = Some(s"$share/idx"))
    touch(share, "landed")
    val schema = StreamSoak.docs(spark, 0L, 1L, "x").schema
    val inDir = s"$share/w_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val appended = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream
      .foreachBatch(graft.streaming.StreamOps.dedupAgainstIndexBatch(
        "doc_id", "text", IDX, dedupWithinBatch = false,
        compactEvery = 10) { (accepted: DataFrame, _: Long) =>
        appended.addAndGet(accepted.count()): Unit
      })
      .option("checkpointLocation", s"$share/ckpt_writer")
      .start()
    (0 until n).foreach { w =>
      stage(spark, StreamSoak.docs(spark, 100000L + w * PER_BATCH,
        PER_BATCH, "live"), share, "w_in", w)
      q.processAllAvailable() // returns AFTER the foreachBatch append
      touch(share, s"w_done_$w")
    }
    q.stop()
    // bounds owned by the writer (it holds the catalog entries):
    spark.catalog.refreshTable(s"${IDX}_shingles")
    spark.catalog.refreshTable(s"${IDX}_bands")
    val (_, maxSh) = StreamSoak.filesPerBucket(spark, s"${IDX}_shingles")
    val (_, maxBd) = StreamSoak.filesPerBucket(spark, s"${IDX}_bands")
    val shRows = spark.table(s"${IDX}_shingles").count()
    val shDistinct = spark.table(s"${IDX}_shingles")
      .select("__ref_id").distinct().count()
    def stateBytes(d: java.io.File): Long =
      if (d.isFile) d.length()
      else Option(d.listFiles()).getOrElse(Array.empty).map(stateBytes).sum
    val st = stateBytes(new java.io.File(s"$share/ckpt_writer/state"))
    val expected = SEED + n * PER_BATCH
    val ok = appended.get() == n * PER_BATCH && shRows == expected &&
      shDistinct == expected && maxSh <= 12L && maxBd <= 12L && st == 0L
    println(s"""{"metric":"two_driver_soak_writer","batches":$n,""" +
      s""""appended":${appended.get()},"sh_rows":$shRows,""" +
      s""""sh_distinct":$shDistinct,"max_files_bucket":${math.max(maxSh, maxBd)},""" +
      s""""state_bytes":$st,"ok":$ok}""")
    touch(share, "w_all_done")
    if (!ok) sys.exit(3)
  }

  // ---------------------------------------------------------------- reader
  private def reader(spark: SparkSession, share: String, nWriter: Int): Unit = {
    waitFor(share, "landed", 240000)
    def register(table: String, path: String, keyOpt: Option[String]): Unit = {
      val schema = spark.read.parquet(path).schema
      val cols = schema.fields.map(f =>
        s"`${f.name}` ${f.dataType.catalogString}").mkString(", ")
      val cluster = keyOpt.map(k =>
        s"CLUSTERED BY (`$k`) SORTED BY (`$k`) INTO 4 BUCKETS").getOrElse("")
      spark.sql(s"CREATE TABLE `$table` ($cols) USING parquet $cluster " +
        s"LOCATION '$path'")
    }
    register(s"${IDX}_shingles", s"$share/idx_shingles", Some("__ref_id"))
    register(s"${IDX}_bands", s"$share/idx_bands", Some("band_hash"))
    register(s"${IDX}_meta", s"$share/idx_meta", None)

    val results = java.nio.file.Paths.get(share, "reader_results.tsv")
    val schema = StreamSoak.docs(spark, 0L, 1L, "x").schema
    val inDir = s"$share/r_in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    // sink: one TSV line per batch — batchId, writer markers seen at
    // refresh time, sorted accepted ids. Written and read on the single
    // micro-batch thread, so a plain var is safe.
    var markersAtRefresh = -1
    val body0 = graft.streaming.StreamOps.dedupAgainstIndexBatch(
      "doc_id", "text", IDX, dedupWithinBatch = false,
      appendAccepted = false) { (accepted: DataFrame, batchId: Long) =>
      val ids = accepted.select("doc_id").collect().map(_.getLong(0))
        .sorted.mkString(",")
      java.nio.file.Files.write(results,
        s"$batchId\t$markersAtRefresh\t$ids\n".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND): Unit
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        // probe-service shape: count writer progress BEFORE refreshing —
        // every append whose marker predates our refresh MUST be visible
        // in this batch's result; then refresh + loud-transient retry
        var tries = 0
        var done = false
        while (!done) {
          markersAtRefresh =
            (0 until nWriter).count(w => exists(share, s"w_done_$w"))
          try {
            // refresh through the BATCH frame's session: foreachBatch
            // runs on a cloned streaming session with its own relation
            // cache — refreshing the outer session leaves the clone
            // serving stale file lists forever (measured: all retries
            // kept failing on already-compacted part files)
            df.sparkSession.catalog.refreshTable(s"${IDX}_shingles")
            df.sparkSession.catalog.refreshTable(s"${IDX}_bands")
            body0(df, id)
            done = true
          } catch {
            case e: Exception if tries < 6 =>
              tries += 1
              System.err.println(s"[reader] batch $id transient " +
                s"(try $tries): ${Option(e.getMessage).getOrElse("?").take(160)}")
              Thread.sleep(250)
          }
        }
      }
      .option("checkpointLocation", s"$share/ckpt_reader")
      .start()

    var r = 0
    var extra = 0
    while (extra < 3) {
      if (exists(share, "w_all_done") && r >= 50) extra += 1
      // probe batch r: 10 seed dups + 10 fresh + 2 per writer batch
      val seedP = StreamSoak.docs(spark, 0L, 10L, "seed")
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      val freshP = StreamSoak.docs(spark, 6000000L + r * 100L, 10L, "fresh")
      val wProbes = (0 until nWriter).map { w =>
        StreamSoak.docs(spark, 100000L + w * PER_BATCH, 2L, "live")
          .select((col("doc_id") - lit(100000L + w * PER_BATCH) +
            lit(7000000L + w * 10L)).as("doc_id"), col("text"))
      }.reduce(_ unionByName _)
      stage(spark, seedP.unionByName(freshP).unionByName(wProbes),
        share, "r_in", r)
      q.processAllAvailable()
      r += 1
    }
    q.stop()
    def stateBytes(d: java.io.File): Long =
      if (d.isFile) d.length()
      else Option(d.listFiles()).getOrElse(Array.empty).map(stateBytes).sum
    val st = stateBytes(new java.io.File(s"$share/ckpt_reader/state"))
    println(s"""{"metric":"two_driver_soak_reader","batches":$r,""" +
      s""""state_bytes":$st,"ok":${st == 0L && r >= 50}}""")
    touch(share, "r_done")
    if (st != 0L || r < 50) sys.exit(4)
  }
}
