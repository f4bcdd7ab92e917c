package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.SimOps

/**
 * Recall/cost curve for the three ANN serving paths (VERDICT r11 task #6):
 * q177-q179 pin recall FLOORS at one operating point each; this main
 * sweeps the operating parameter per path and reports recall@10 (ppm over
 * the same seeded 200-query sample the contract queries use) plus the
 * wall-clock of the approximate leg, so a user can pick an operating
 * point from measured data instead of the single pinned one.
 *
 *   ivf:       nProbe in {1, 4, 8}            (nCells = 16, int-Lloyd
 *              trained codebook — the q177 r15 operating point)
 *   lsh:       bands  in {4, 8, 16}           (nPlanes = 4, the q178 pin)
 *   projected: shortlist in {n/80, n/40, n/20} (outDim 32, q179 derives n/40)
 *
 * Ground truth (exact brute-force top-10) is computed ONCE per run and
 * persisted; only the approximate leg is timed, because that is the part
 * an operating point changes. Prints one JSON line:
 *   {"metric":"recall_curve","sf":...,"points":[{"path":...,"param":...,
 *     "recall_ppm":N,"wall_s":S}, ...]}
 * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.RecallCurve".
 */
object RecallCurve {

  // the contract queries' seeding, REUSED (not re-derived): if q177-q179's
  // sample ever changes, this curve follows automatically
  private def seededQueries(e: DataFrame): DataFrame =
    SparkEntry.annRecallQueries(e)

  private def recallPpm(exact: DataFrame, ann: DataFrame, qs: DataFrame,
                        k: Int): Long = {
    val inter = exact.select(col("query_id"), col("neighbor_id"))
      .join(ann.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .agg(count(lit(1)).as("h")).head().getLong(0)
    val n = qs.count()
    inter * 1000000L / (n * k)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val k = 10
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = e.count()
    val qs = seededQueries(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQueries = qs.count()
    val exact = SimOps.cosineTopK(e, qs, "vec_id", "embedding", k = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count(): Unit

    def timedPpm(ann: () => DataFrame): (Long, Double) = {
      // warm once (JIT + codegen), then time the approximate leg
      ann().write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val df = ann().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val ppm = recallPpm(exact, df, qs, k)
      df.unpersist(blocking = false)
      (ppm, wall)
    }

    val points = scala.collection.mutable.ArrayBuffer[String]()
    def record(path: String, param: String, r: (Long, Double)): Unit = {
      points += s"""{"path":"$path","param":"$param","recall_ppm":${r._1},""" +
        s""""wall_s":${math.round(r._2 * 1000) / 1000.0}}"""
      System.err.println(f"[recall_curve] $path $param -> ${r._1} ppm, ${r._2}%.2f s")
    }

    for (nProbe <- Seq(1, 4, 8))
      record("ivf", s"nProbe=$nProbe", timedPpm(() =>
        SimOps.ivfTopK(e, qs, "vec_id", "embedding", k = k,
          nCells = 16, nProbe = nProbe, intLloydIters = 5)))

    for (bands <- Seq(4, 8, 16))
      record("lsh", s"bands=$bands", timedPpm(() =>
        SimOps.lshCosineTopK(e, qs, "vec_id", "embedding", k = k,
          nPlanes = 4, bands = bands)))

    val m = SimOps.projectionMatrix(outDim = 32, dim = 64)
    val proj = e.select(col("vec_id"),
        SimOps.randomProject(col("embedding"), m).as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    proj.count(): Unit
    val qsP = proj.join(qs.select(col("vec_id")), Seq("vec_id"))
    for (div <- Seq(80, 40, 20)) {
      // div=40 IS SimOps.derivedShortlist (the q179 derive, clamp
      // included); 80/20 bracket it with the same clamp bounds
      val shortK =
        if (div == 40) SimOps.derivedShortlist(nCorpus)
        else math.max(50L, math.min(4096L,
          math.ceil(nCorpus.toDouble / div).toLong)).toInt
      record("projected", s"shortlist=n/$div($shortK)", timedPpm(() =>
        SimOps.rerankTopK(
          SimOps.cosineTopK(proj, qsP, "vec_id", "embedding", k = shortK),
          e, qs, "vec_id", "embedding", k = k)))
    }

    println(s"""{"metric":"recall_curve","sf_dir":"$sfDir","n_corpus":$nCorpus,""" +
      s""""n_queries":$nQueries,"k":$k,"points":[${points.mkString(",")}]}""")
    spark.stop()
  }
}
