package graft

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.ops.{DedupOps, GateOps}

/**
 * Scale-adjudication probe (`runMain graft.ScalingProbe <sfDir> [query...]`):
 * runs the near-dup bench queries to completion and RECORDS the
 * [[graft.ops.DedupOps.ObservedMetrics]] counts (candidate pairs, verified
 * pairs, pre-cap bucket width, capped band rows) alongside the wall time.
 *
 * This is the consumer half of the r8 instrumentation: a wall-clock ratio
 * alone cannot distinguish "candidates grew super-linearly" (an algorithmic
 * scale bug the banding exists to prevent) from "candidates grew linearly
 * but the constant factor moved" (cache pressure / spill — a capacity
 * problem, not a complexity one). Run at sf0.1 and at a ScaleUp 10× copy
 * and compare `candidate_pairs` growth to the corpus growth.
 *
 * Metrics are harvested through a `QueryExecutionListener` (the observe()
 * accumulators ride the rows already flowing — no extra job), matching on
 * the metric-name PREFIXES (names carry a per-call uniqueness suffix).
 */
object ScalingProbe {

  /** All prefixes this probe aggregates. */
  private val prefixes = Seq(
    DedupOps.ObservedMetrics.LshBucketMetrics,
    DedupOps.ObservedMetrics.NearDupCandidateMetrics,
    DedupOps.ObservedMetrics.NearDupVerifiedMetrics,
    DedupOps.ObservedMetrics.SpanMetrics,
    DedupOps.ObservedMetrics.ParagraphMetrics,
    GateOps.FunnelMetrics,
    ScaleUp.SpliceMetrics)

  /** Runs `df` to completion through the noop sink with a
    * QueryExecutionListener attached; returns (elapsedSec, observed-metric
    * rows keyed by full CollectMetrics name, graft-prefixed names only).
    * Listener delivery is async — polls until a metric named with
    * `waitForPrefix` lands (or the timeout passes; metrics seen so far are
    * still returned). */
  def runWithMetrics(spark: SparkSession, df: DataFrame,
                     waitForPrefix: String =
                       DedupOps.ObservedMetrics.NearDupCandidateMetrics,
                     timeoutSec: Int = 60): (Double, Map[String, Row]) = {
    val got = new ConcurrentHashMap[String, Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) =>
          if (prefixes.exists(k.startsWith)) got.put(k, v)
        }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val elapsed = (System.nanoTime() - t0) / 1e9
      val deadline = System.currentTimeMillis() + timeoutSec * 1000L
      while (System.currentTimeMillis() < deadline &&
             !got.keys.asScala.exists(_.startsWith(waitForPrefix)))
        Thread.sleep(50)
      (elapsed, got.asScala.toMap)
    } finally spark.listenerManager.unregister(listener)
  }

  /** Flattens harvested metric rows to one map, combining same-named fields
    * across observe() nodes: `max_bucket_width` by max (it is a maximum),
    * everything else by sum (they are counts). */
  def aggregate(metrics: Map[String, Row]): Map[String, Long] =
    metrics.values.toSeq
      .flatMap(r => r.schema.fieldNames.zip(r.toSeq))
      .collect { case (f, v: java.lang.Number) => f -> v.longValue() }
      .groupBy(_._1)
      .map { case (f, vs) =>
        val xs = vs.map(_._2)
        f -> (if (f == "max_bucket_width") xs.max else xs.sum)
      }

  /** The bench near-dup queries REBUILT WITHOUT their final global orderBy:
    * the sort exists only for the deterministic oracle dump, and its range
    * exchange's boundary sampling re-executes the top stage, double-counting
    * any observe above the last shuffle (q25's verified_pairs read 7491
    * against 2628 candidates on the ordered plan). Same corpus
    * constructions and parameters as SparkEntry q25/q26/q74. */
  private def probeQueries(spark: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val perturbed = d.filter(col("doc_id") < 50)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" perturbed tail token")).as("text"))
    val union = d.unionByName(perturbed)
    val ref = d.filter(col("doc_id") % 5 =!= 0)
    val inc = d.filter(col("doc_id") % 5 === 0).unionByName(
      ref.filter(col("doc_id") < 50)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text")))
    Seq(
      "q25_near_dup_pairs" -> DedupOps.nearDuplicatePairs(union, "doc_id",
        "text", numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100),
      "q26_near_dedup" -> DedupOps.nearDedup(union, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100),
      "q74_near_dedup_against" -> DedupOps.nearDedupAgainst(inc, "doc_id",
        "text", ref, "text", numHashes = 64, bands = 16, threshold = 0.5))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val wanted = args.toSeq.tail
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()

    val queries = probeQueries(spark, sfDir)
      .filter { case (n, _) => wanted.isEmpty || wanted.contains(n) }
    val perQuery = queries.map { case (name, df) =>
      // one untimed pass (JIT + footer caches, same reasoning as Bench)
      df.write.format("noop").mode("overwrite").save()
      val (elapsed, metrics) = runWithMetrics(spark, df)
      name -> (elapsed, aggregate(metrics))
    }

    def q(s: String) = "\"" + s + "\""
    val body = perQuery.map { case (name, (elapsed, agg)) =>
      val m = agg.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
      s"${q(name)}:{" + s""""elapsed_sec":$elapsed,"metrics":$m}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"probe":"neardup_scale","sf":${q(sfDir)},"n_docs":$nDocs,"queries":$body}"""
    println(json)
    sys.env.get("SPARK_GRAFT_PROBE_OUT").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
