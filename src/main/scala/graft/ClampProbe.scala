package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, SimOps}

/**
 * Derived-parameter CLAMP boundary probe (VERDICT r13 #3): the two ANN
 * derive formulas are clamped —
 *
 *   cells:     clamp(ceil(n/128), 16, 16384)   binds above n ~ 2.10M
 *   shortlist: clamp(ceil(n/40),  50, 4096)    binds above n ~ 164k
 *
 * and past a binding clamp the candidate volume per query grows linearly
 * with the corpus again — exactly the fixed-parameter failure class the
 * derives were built to kill (r10 q163, r11 q179), one decade further
 * out. This main measures the CELLS side at corpora straddling its
 * boundary: a fixed-size query sample runs the two-sided
 * [[SimOps.ivfJoinTopK]] at derived cells, and the probe reports the
 * observed candidate count per query (the linearity signal), wall, and
 * the twin-rank-1 quality contract. The SHORTLIST side is measured by
 * [[RecallCurve]] at the same corpora (its `n/40` point IS the q179
 * derive, clamp included). `scripts/run_clamp_probe_r14.sh` drives both;
 * ClampEnvelopeSpec pins the formulas' arithmetic and the documented
 * envelope.
 *
 * Usage: ClampProbe <embDir>   (reads <embDir>/embeddings.parquet)
 * Prints one JSON line {"metric":"clamp_probe","n":...,...}.
 */
object ClampProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: ClampProbe <embDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = e.count()
    // the op under probe (ivfJoinTopK) derives via the r15 lifted-ceiling
    // formula; report both it and the flat/landed one for the record
    val derivedCells = SimOps.derivedCellsHier(n)

    // fixed ~8k-query sample regardless of corpus size, so the measured
    // candidates-per-query isolates the per-query cost curve (a corpus-
    // sized query side would conflate it with query-count growth)
    val every = math.max(1L, n / 8192L)
    val queries = e.filter(pmod(col("vec_id"), lit(every)) === 0L)
      .select((col("vec_id") + 100000000L).as("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQ = queries.count()

    val t0 = System.nanoTime()
    val top = SimOps.ivfJoinTopK(queries, e, "vec_id", "embedding",
      k = 3, nCells = 0, nProbe = 4)
    val (_, metrics) = ScalingProbe.runWithMetrics(spark, top,
      waitForPrefix = DedupOps.ObservedMetrics.NearDupCandidateMetrics,
      timeoutSec = 1800)
    val wall = (System.nanoTime() - t0) / 1e9
    val agg = ScalingProbe.aggregate(metrics)
    val candidates = agg.getOrElse("candidate_pairs", -1L)

    // quality: every query is an offset twin of a corpus vector; rank 1
    // must be that twin (the q163 planted contract, re-held per corpus)
    val rank1 = SimOps.ivfJoinTopK(queries, e, "vec_id", "embedding",
        k = 1, nCells = 0, nProbe = 4)
      .filter(col("rank") === 1 &&
        col("neighbor_id") === col("query_id") - 100000000L)
      .count()
    val twinPpm = rank1 * 1000000L / math.max(nQ, 1L)

    println(s"""{"metric":"clamp_probe","dir":"$dir","n":$n,""" +
      s""""derived_cells":$derivedCells,"clamp_bound":${derivedCells == (1 << 20)},""" +
      s""""two_level":${derivedCells > SimOps.FlatAssignMaxCells},""" +
      s""""derived_cells_flat":${SimOps.derivedCells(n)},""" +
      s""""n_queries":$nQ,"candidate_pairs":$candidates,""" +
      s""""candidates_per_query":${if (nQ > 0) candidates / nQ else -1},""" +
      s""""twin_rank1_ppm":$twinPpm,"wall_s":${math.round(wall * 100) / 100.0}}""")
    spark.stop()
  }
}
