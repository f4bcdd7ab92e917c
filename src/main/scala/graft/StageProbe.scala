package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Per-stage task-skew diagnostic: runs one named query and prints, for
 * every completed stage, its task count / median / max task seconds and
 * the stage's name+callsite — the instrument that localizes a fat
 * `task_max` from Bench's SPARK_GRAFT_TASKSTATS to the exact operator.
 * (Bench's per-query stats aggregate across ALL stages, so a 40x
 * max/median there only says "somewhere in this query"; this says
 * where.)
 *
 * Usage: StageProbe <sfDir> <benchEntry>
 * where <benchEntry> is a SparkEntry.queries key or one of the skew
 * entries' shapes hard-coded below.
 */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StageProbe <sfDir> <entry>")
    val Array(sfDir, entry) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tasks = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Double]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        if (te.taskInfo != null) {
          tasks.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Double]())
            .add(te.taskInfo.duration / 1e3)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val q = tasks.get(s.stageInfo.stageId)
        if (q != null) {
          val ts = q.toArray(Array.empty[java.lang.Double])
            .map(_.doubleValue()).sorted
          if (ts.nonEmpty) {
            val med = ts(ts.length / 2); val mx = ts.last
            if (mx > 0.2) // only stages that matter
              println(f"[stage ${s.stageInfo.stageId}%4d] n=${ts.length}%4d " +
                f"med=$med%8.3f max=$mx%8.2f  ${s.stageInfo.name}%s")
          }
        }
      }
    })

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val df = entry match {
      case "skew_ivf_join_capped" =>
        val e = emb
        val q = e.select((col("vec_id") + 1000000).as("vec_id"),
          col("embedding"))
        graft.ops.SimOps.ivfJoinTopK(q, e, "vec_id", "embedding", k = 3,
          nCells = 0, nProbe = 4, maxCell = 512)
      case "skew_semantic_capped" =>
        graft.ops.SimOps.semanticDedupPairs(emb, "vec_id", "embedding",
          threshold = 0.9, nCells = 0, maxCell = 512)
      case "skew_near_dup_capped" =>
        graft.ops.DedupOps.nearDuplicatePairs(docs, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
      case other =>
        SparkEntry.queries.getOrElse(other,
          sys.error(s"unknown entry $other"))(spark, sfDir)
    }
    df.write.format("noop").mode("overwrite").save()
    spark.stop()
  }
}
