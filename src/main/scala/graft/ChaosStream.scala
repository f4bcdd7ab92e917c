package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stateful-STREAM failure injection under local-cluster (VERDICT r13 #8):
 * ChaosCluster proves the batch append protocols converge after a real
 * executor kill; this main proves the transformWithState ops do. A
 * file-source stream drives [[graft.streaming.StreamOps.streamingTransitions]]
 * (RocksDB state store, per-user event-time buffers) into an
 * exactly-once parquet sink; the executor JVMs are SIGKILLed while a
 * MID-STREAM micro-batch is in flight (`spark.task.maxFailures=1`, so
 * the kill aborts the batch and fails the query for real); the query
 * then RESTARTS from the same checkpoint on relaunched executors and
 * must produce output byte-identical to an uninterrupted run of the
 * same files — which also proves the RocksDB state recovered exactly
 * (the transitions emitted after the crash pair events buffered BEFORE
 * it). A batch-sibling matrix ([[graft.ops.EventOps.transitions]]) is
 * compared as a second, engine-independent anchor.
 *
 * Kill timing is off the checkpoint log: `commits/0` appearing means
 * batch 0 committed and batch 1 (of 6) is in flight. A kill that lands
 * after everything committed makes the attempt succeed — the loop
 * resets the directories and retries (bounded), recording the attempts.
 *
 * Prints one line {"metric":"chaos_stream","injected":...,"converged":...}
 * Run: sbt "runMain graft.ChaosStream"; ChaosStreamSpec forks it.
 */
object ChaosStream {

  private val Users = 800L
  private val PerSlice = 100 // events per user per slice
  private val Slices = 4

  private def killExecutors(): Int = {
    val victims = ProcessHandle.current().descendants()
      .toArray(n => new Array[ProcessHandle](n))
    victims.foreach { p =>
      System.err.println(s"[chaos-stream] killing pid=${p.pid()}")
      p.destroyForcibly(): Unit
    }
    victims.length
  }

  def main(args: Array[String]): Unit = {
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_chaos_stream_${ProcessHandle.current().pid()}")
    def dir(s: String): String = { val f = new java.io.File(base, s)
      f.mkdirs(); f.getPath }
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-chaos-stream")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.task.maxFailures", "1")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.warehouse.dir", dir("wh"))
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType)))

    // ---- input files (written once; both runs read the same bytes) ----
    def slice(i: Int): DataFrame =
      spark.range(0L, Users).select(col("id").as("user_id"),
          explode(sequence(lit(0), lit(PerSlice - 1))).as("j"))
        .select(col("user_id"),
          timestamp_seconds(lit(i * 600L) + col("j") * 6L +
            lit(1700000000L)).as("ts"),
          element_at(array(lit("a"), lit("b"), lit("c")),
            (pmod(col("user_id") + col("j"), lit(3L)) + 1).cast("int"))
            .as("event_type"))
    def flushRow(userId: Long, tsSec: Long): DataFrame =
      spark.range(1).select(lit(userId).as("user_id"),
        timestamp_seconds(lit(tsSec)).as("ts"), lit("z").as("event_type"))
    val inDir = dir("in")
    val allSlices = (0 until Slices).map(slice) ++ Seq(
      flushRow(9000001L, 1700000000L + 86400L),
      flushRow(9000002L, 1700000000L + 2 * 86400L))
    allSlices.zipWithIndex.foreach { case (df, i) =>
      val tmp = new java.io.File(base, s"stage_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(inDir, f"slice_$i%03d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp)
    }

    def startQuery(ckpt: String, out: String)
        : org.apache.spark.sql.streaming.StreamingQuery = {
      val src = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(inDir)
      graft.streaming.StreamOps.streamingTransitions(src, "user_id", "ts",
          "event_type", gapSeconds = 300, watermark = "10 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    def readOut(out: String): Seq[(Long, String, String, Long)] =
      spark.read.schema(StructType(Seq(StructField("user_id", LongType),
          StructField("prev_type", StringType),
          StructField("next_type", StringType),
          StructField("ts", TimestampType))))
        .parquet(out)
        .select(col("user_id"), col("prev_type"), col("next_type"),
          unix_micros(col("ts")).as("us"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq.sorted

    // ---- uninterrupted reference run ----
    val qa = startQuery(dir("ckptA"), dir("outA"))
    qa.processAllAvailable(); qa.stop()
    val refRows = readOut(dir("outA"))

    // ---- chaos run: kill the executor JVMs while a mid-stream batch is
    // in flight. Spark's recovery can take either of two shapes, both of
    // which must converge: (a) executor-loss task failures do not count
    // toward spark.task.maxFailures, so the standalone master relaunches
    // executors, the in-flight batch RETRIES on them (reloading RocksDB
    // state from the checkpoint), and the query self-heals without
    // failing; (b) the loss surfaces as a query failure (e.g. the kill
    // lands inside a commit window), and the query restarts from the
    // same checkpoint. `injected` means: executors verifiably died while
    // the final commit did not yet exist.
    var injected = false
    var queryFailed = false
    var attempts = 0
    val lastCommit = Slices + 2 - 1 // batch ids 0..5
    while (!injected && attempts < 3) {
      attempts += 1
      Seq("ckptB", "outB").foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(base, d))
      }
      val commits0 = new java.io.File(dir("ckptB"), "commits/0")
      val commitsLast = new java.io.File(dir("ckptB"), s"commits/$lastCommit")
      @volatile var killedMidStream = false
      val killer = new Thread(() => {
        val deadline = System.nanoTime() + 120L * 1000000000L
        while (!commits0.exists() && System.nanoTime() < deadline)
          Thread.sleep(10)
        if (commits0.exists() && !commitsLast.exists()) {
          Thread.sleep(50) // the next batch takes the wire
          val stillRunning = !commitsLast.exists()
          val k = killExecutors()
          killedMidStream = stillRunning && k > 0
          System.err.println(s"[chaos-stream] attempt $attempts killed $k " +
            s"executor JVMs midStream=$killedMidStream")
        }
      })
      killer.setDaemon(true); killer.start()
      val qb = startQuery(dir("ckptB"), dir("outB"))
      try {
        qb.processAllAvailable()
        qb.stop()
        killer.join(2000)
        if (killedMidStream) {
          injected = true
          System.err.println(s"[chaos-stream] attempt $attempts: kill " +
            "landed mid-stream and the query SELF-HEALED on relaunched " +
            "executors")
        } else System.err.println(s"[chaos-stream] attempt $attempts: " +
          "stream finished before the kill bit — retrying")
      } catch {
        case e: Throwable =>
          killer.join(2000)
          injected = killedMidStream
          queryFailed = true
          System.err.println(s"[chaos-stream] attempt $attempts: query " +
            s"failed (${e.getClass.getSimpleName}); injected=$injected")
          try qb.stop() catch { case _: Throwable => }
          Thread.sleep(3000) // standalone master relaunches executors
      }
    }

    var converged = false
    var restartRows = -1L
    var matrixOk = false
    if (injected) {
      if (queryFailed) { // recovery path (b): restart from the checkpoint
        val qr = startQuery(dir("ckptB"), dir("outB"))
        qr.processAllAvailable(); qr.stop()
      }
      val got = readOut(dir("outB"))
      restartRows = got.size.toLong
      val outputOk = got == refRows && got.nonEmpty
      // engine-independent anchor: the batch transition matrix over the
      // same events (flush users have one event each — no pairs)
      val batchEvents = allSlices.reduce(_ unionByName _)
        .withColumn("event_id",
          col("user_id") * 1000000L + unix_micros(col("ts")) / 1000000L)
      val batch = graft.ops.EventOps.transitions(batchEvents, "user_id",
          "ts", "event_id", "event_type", gapSeconds = 300)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val streamed = got.groupBy(p => (p._2, p._3))
        .map { case (k, v) => k -> v.size.toLong }
      matrixOk = streamed == batch
      converged = outputOk && matrixOk
      if (!outputOk) System.err.println(
        s"[chaos-stream] output mismatch: ref=${refRows.size} got=${got.size}")
      if (!matrixOk) System.err.println(
        s"[chaos-stream] matrix mismatch: streamed=$streamed batch=$batch")
    }

    println(s"""{"metric":"chaos_stream","injected":$injected,""" +
      s""""attempts":$attempts,"query_failed":$queryFailed,""" +
      s""""ref_rows":${refRows.size},""" +
      s""""restart_rows":$restartRows,"matrix_ok":$matrixOk,""" +
      s""""converged":$converged}""")
    spark.stop()
    if (!injected || !converged) sys.exit(1)
  }
}
