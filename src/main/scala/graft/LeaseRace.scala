package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Two-driver writer-concurrency race (VERDICT r14 #2) — one ROLE of a
 * two-JVM race; WriterLeaseSpec forks two of these against one shared
 * warehouse. The JVM-local land locks cannot see a second application;
 * this proves [[graft.sources.WriterLease]] does.
 *
 * Roles (args: role warehouseDir shareDir):
 *  - `mutex`: N lease-guarded read-modify-write increments of a shared
 *    counter file, plus [start,end] hold intervals. Two racing JVMs must
 *    end at exactly 2N (any lost update = mutual-exclusion failure) with
 *    zero overlapping hold intervals.
 *  - `appender`: lands an EXTERNAL near-dup index at shareDir/idx, then
 *    appends BATCHES of unique docs via
 *    [[graft.ops.DedupOps.appendNearDupIndex]] while the compactor JVM
 *    races compactions. Appends refresh + retry on the documented loud
 *    transient (a compaction swap moving files mid-plan); lost rows are
 *    the failure being tested for.
 *  - `compactor`: registers the same external tables by DDL (its own
 *    in-memory catalog — the two JVMs share only the filesystem) and
 *    loops [[graft.ops.DedupOps.compactNearDupIndex]] until the appender
 *    finishes. The external-table swap is delete+rename at the shared
 *    location: unserialized, an append landing between the compactor's
 *    side-read and delete is silently destroyed.
 *
 * Exit 0 on role success; the spec then audits the shared on-disk state
 * (exact row counts, distinct ids, bands-per-doc) for lost updates and
 * mixed state.
 */
object LeaseRace {

  private val IDX = "race_idx"
  private val BATCHES = 12
  private val DOCS_PER_BATCH = 20
  private val SEED_DOCS = 40
  private val BANDS = 16

  private def doc(tag: String, i: Int): String =
    s"lease race corpus $tag document number $i with enough distinct " +
      s"words to shingle stably token$tag$i alpha beta gamma delta " +
      s"epsilon zeta eta theta iota kappa"

  private def docs(spark: SparkSession, tag: String, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => doc(tag, i)).toDF("text")
  }

  private def session(warehouse: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-lease-race")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def touch(dir: String, name: String, body: String = ""): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, body.getBytes("UTF-8"))
  }
  private def waitFor(dir: String, name: String, timeoutMs: Long): Unit = {
    val p = java.nio.file.Paths.get(dir, name)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!java.nio.file.Files.exists(p)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(s"timed out waiting for $name")
      Thread.sleep(100)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(role, warehouse, share) = args.take(3)
    val spark = session(warehouse)
    try role match {
      case "mutex"     => mutex(spark, share)
      case "appender"  => appender(spark, share)
      case "compactor" => compactor(spark, share)
      case other => throw new IllegalArgumentException(s"unknown role $other")
    } finally spark.stop()
    println(s"""{"metric":"lease_race","role":"$role","ok":true}""")
  }

  /** N read-modify-write increments under the lease; any interleaving
    * loses an update. Hold intervals logged for the overlap audit. */
  private def mutex(spark: SparkSession, share: String): Unit = {
    val counter = java.nio.file.Paths.get(share, "counter.txt")
    val me = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    val log = new StringBuilder
    val n = 30
    (0 until n).foreach { _ =>
      graft.sources.WriterLease.withWriterLease(spark, "race_counter") {
        val t0 = System.currentTimeMillis()
        val v =
          if (java.nio.file.Files.exists(counter))
            new String(java.nio.file.Files.readAllBytes(counter), "UTF-8")
              .trim.toLong
          else 0L
        Thread.sleep(5) // widen the lost-update window
        java.nio.file.Files.write(counter, (v + 1).toString.getBytes("UTF-8"))
        val t1 = System.currentTimeMillis()
        log.append(s"$t0 $t1\n")
      }
    }
    touch(share, s"mutex_${me.replaceAll("[^0-9a-zA-Z]", "_")}.intervals",
      log.toString)
  }

  private def appender(spark: SparkSession, share: String): Unit = {
    val D = graft.ops.DedupOps
    D.landNearDupIndex(docs(spark, "seed", SEED_DOCS), "text", IDX,
      numHashes = 64, bands = BANDS, shingleSize = 3, buckets = 8,
      path = Some(s"$share/idx"))
    touch(share, "landed")
    var appended = 0L
    (0 until BATCHES).foreach { b =>
      // the documented reader/writer contract: a compaction swap between
      // this JVM's file listing and its scan fails LOUDLY (FileNotFound /
      // stale-listing AnalysisException), never silently — refresh and
      // retry is the probe-service shape (BucketedLand scaladoc)
      var tries = 0
      var done = false
      while (!done) {
        try {
          spark.catalog.refreshTable(s"${IDX}_shingles")
          spark.catalog.refreshTable(s"${IDX}_bands")
          appended += D.appendNearDupIndex(docs(spark, s"b$b",
            DOCS_PER_BATCH), "text", IDX)
          done = true
        } catch {
          case e: Exception if tries < 5 =>
            tries += 1
            System.err.println(s"[race] append batch $b transient " +
              s"(try $tries): ${Option(e.getMessage).getOrElse("?").take(200)}")
            Thread.sleep(200)
        }
      }
    }
    touch(share, "a_done", appended.toString)
  }

  private def compactor(spark: SparkSession, share: String): Unit = {
    waitFor(share, "landed", 180000)
    // register the appender's EXTERNAL tables in THIS driver's in-memory
    // catalog: schema read from the live parquet, bucket spec mirrored
    // from the land contract (8 x key, sorted)
    def register(table: String, path: String, key: String): Unit = {
      val schema = spark.read.parquet(path).schema
      val cols = schema.fields.map(f =>
        s"`${f.name}` ${f.dataType.catalogString}").mkString(", ")
      spark.sql(s"""CREATE TABLE `$table` ($cols) USING parquet
        CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO 8 BUCKETS
        LOCATION '$path'""")
    }
    register(s"${IDX}_shingles", s"$share/idx_shingles", "__ref_id")
    register(s"${IDX}_bands", s"$share/idx_bands", "band_hash")
    var compactions = 0
    val done = java.nio.file.Paths.get(share, "a_done")
    while (!java.nio.file.Files.exists(done)) {
      graft.ops.DedupOps.compactNearDupIndex(spark, IDX): Unit
      compactions += 1
      Thread.sleep(100)
    }
    // one final compaction AFTER the appender finished, so the audited
    // end state includes a post-append swap
    graft.ops.DedupOps.compactNearDupIndex(spark, IDX): Unit
    compactions += 1
    touch(share, "b_done", compactions.toString)
  }
}
