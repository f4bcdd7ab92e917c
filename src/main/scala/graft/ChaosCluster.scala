package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Crash-retry under REAL process death (VERDICT r12 task #1, the
 * local-cluster leg): runs the near-dup append protocol on
 * `local-cluster[2,2,1024]` — a standalone master with two separate
 * executor JVMs — and KILLS the executor processes while the second table
 * write (`_shingles`, the commit marker) is in flight. With
 * `spark.task.maxFailures=1` the write job genuinely aborts mid-append
 * from an `ExecutorLostFailure`, leaving the protocol's documented crash
 * window on disk: band rows committed, shingle markers absent. The
 * standalone master then relaunches executors and the RETRY of the same
 * append must converge (one shingle row per doc, idempotent third call,
 * probe equal to a fresh-landed oracle index).
 *
 * The kill is timed off the filesystem, not a listener: the
 * FileOutputCommitter creates `<shingles-location>/_temporary` at job
 * setup, so its appearance IS the "second write started" signal. A kill
 * that lands too late (write already committed) makes the attempt succeed
 * — the attempt loop then resets the tables and tries again (bounded);
 * the JSON records how many attempts the injection needed.
 *
 * Prints one line: {"metric":"chaos_cluster","injected":bool,
 * "converged":bool,...}. Run: sbt "runMain graft.ChaosCluster";
 * ChaosClusterSpec forks it (same classpath rules as ClusterSmoke —
 * enumerated classpath, SPARK_SCALA_VERSION pin).
 */
object ChaosCluster {

  private val Name = "chaoscl_nd"
  private val BatchDocs = 120000L

  private def docs(spark: SparkSession, from: Long, n: Long,
                   tag: String): DataFrame =
    spark.range(from, from + n).select(col("id").as("doc_id"),
      concat(lit(s"$tag document number "), col("id"),
        lit(" carrying shared vocabulary token"), col("id") % 7,
        lit(s" and unique marker ${tag}_"), col("id"),
        lit(" plus enough running words that every row produces a healthy" +
          " shingle set for the minhash signatures to chew on during the" +
          " banded join phase of the landed index protocol")).as("text"))

  private def tableLoc(spark: SparkSession, t: String): java.io.File =
    new java.io.File(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
      .location.getPath)

  private def dropAll(spark: SparkSession): Unit =
    Seq("meta", "shingles", "bands").foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS ${Name}_$s"): Unit
      spark.sql(s"DROP TABLE IF EXISTS ${Name}_oracle_$s"): Unit
    }

  /** Kill every descendant JVM — under local-cluster the master and
    * workers are threads of THIS process, so the only descendants are the
    * forked executor JVMs. (ProcessHandle.info().commandLine() is empty
    * for same-user java processes on this kernel, so no arg filtering —
    * the process tree IS the filter.) Returns how many were killed. */
  private def killExecutors(): Int = {
    val victims = ProcessHandle.current().descendants()
      .toArray(n => new Array[ProcessHandle](n))
    victims.foreach { p =>
      System.err.println(s"[chaos] killing descendant pid=${p.pid()} " +
        s"cmd=${p.info().command().orElse("?")}")
      p.destroyForcibly(): Unit
    }
    victims.length
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-chaos-cluster")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one task failure aborts the job: the executor kill must surface
      // as a genuinely failed append, not a silent in-job retry
      .config("spark.task.maxFailures", "1")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_chaos_cluster/wh_" +
          ProcessHandle.current().pid())
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val D = graft.ops.DedupOps

    var injected = false
    var attempts = 0
    var bandsAtCrash = -1L
    var shinglesAtCrash = -1L
    var landedShingles = -1L

    while (!injected && attempts < 3) {
      attempts += 1
      dropAll(spark)
      D.landNearDupIndex(docs(spark, 0L, 2000L, "base"), "text", Name,
        numHashes = 16, bands = 4, shingleSize = 3, buckets = 4)
      landedShingles = spark.table(s"${Name}_shingles").count()
      val shinglesLoc = tableLoc(spark, s"${Name}_shingles")
      val staging = new java.io.File(shinglesLoc, "_temporary")

      // watcher: the instant the shingles write stages, kill the executors
      val killer = new Thread(() => {
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (!staging.exists() && System.nanoTime() < deadline)
          Thread.sleep(20)
        if (staging.exists()) {
          Thread.sleep(150) // let some tasks take the wire
          val k = killExecutors()
          System.err.println(s"[chaos] attempt $attempts: staging seen at " +
            s"$staging, killed $k executor JVMs")
        } else System.err.println(
          s"[chaos] attempt $attempts: staging NEVER appeared at $staging")
      })
      killer.setDaemon(true)
      killer.start()

      val batch = docs(spark, 1000000L, BatchDocs, "fresh")
      try {
        val n = D.appendNearDupIndex(batch, "text", Name)
        // kill landed too late — the append committed; loop and retry
        System.err.println(s"[chaos] attempt $attempts: append SUCCEEDED " +
          s"(n=$n) — kill missed the window")
        killer.join(1000)
      } catch {
        case e: Throwable =>
          System.err.println(s"[chaos] attempt $attempts: append failed as " +
            s"intended: ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(300)}")
          injected = true
          killer.join(1000)
          // give the standalone master a beat to relaunch executors
          Thread.sleep(3000)
          spark.catalog.refreshTable(s"${Name}_shingles")
          spark.catalog.refreshTable(s"${Name}_bands")
          bandsAtCrash = spark.table(s"${Name}_bands").count()
          shinglesAtCrash = spark.table(s"${Name}_shingles").count()
      }
    }

    var converged = false
    var retryAppended = -1L
    var rerunAppended = -1L
    var distinctOk = false
    var probeOk = false
    if (injected) {
      val batch = docs(spark, 1000000L, BatchDocs, "fresh")
      retryAppended = graft.ops.DedupOps.appendNearDupIndex(batch, "text", Name)
      rerunAppended = graft.ops.DedupOps.appendNearDupIndex(batch, "text", Name)
      val sh = spark.table(s"${Name}_shingles")
      val nSh = sh.count()
      distinctOk = nSh == sh.select("__ref_id").distinct().count() &&
        nSh == landedShingles + BatchDocs
      // probe convergence against a fresh-landed oracle over the union
      graft.ops.DedupOps.landNearDupIndex(
        docs(spark, 0L, 2000L, "base")
          .unionByName(docs(spark, 1000000L, BatchDocs, "fresh")),
        "text", s"${Name}_oracle", numHashes = 16, bands = 4,
        shingleSize = 3, buckets = 4)
      val probe = docs(spark, 1000000L, 50L, "fresh")
        .unionByName(docs(spark, 5000000L, 50L, "novel"))
      def surviving(ix: String): Set[Long] =
        graft.ops.DedupOps.nearDedupAgainstIndex(probe, "doc_id", "text", ix)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val s1 = surviving(Name)
      probeOk = s1 == surviving(s"${Name}_oracle") &&
        s1 == (5000000L until 5000050L).toSet
      converged = retryAppended == BatchDocs && rerunAppended == 0L &&
        distinctOk && probeOk
    }

    println(s"""{"metric":"chaos_cluster","injected":$injected,""" +
      s""""attempts":$attempts,"bands_at_crash":$bandsAtCrash,""" +
      s""""shingles_at_crash":$shinglesAtCrash,""" +
      s""""landed_shingles":$landedShingles,""" +
      s""""retry_appended":$retryAppended,"rerun_appended":$rerunAppended,""" +
      s""""distinct_ok":$distinctOk,"probe_ok":$probeOk,""" +
      s""""converged":$converged}""")
    spark.stop()
    if (!injected || !converged) sys.exit(1)
  }
}
