package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Generic one-time bucketed landing: write any DataFrame as a sorted
 * bucketed parquet table so every later per-key pipeline (windows,
 * groupByKey chains) reads a scan that ALREADY satisfies its clustered
 * distribution — zero exchanges per run instead of re-shuffling the corpus
 * every pipeline execution (the same pattern as `CtdRead.ingestBucketed`,
 * generalized beyond instrument files; PlanShapeSpec pins the
 * exchange-free plan).
 *
 * `landOnce` is idempotent per session: the write happens only when the
 * table isn't registered yet, so repeated query construction (warmup
 * passes, bench reps) reuses the landed table — exactly the land-once /
 * query-many operating shape a 10^12-row events table needs.
 */
object BucketedLand {

  def landOnce(df: DataFrame, table: String, bucketCol: String,
               sortCols: Seq[String], buckets: Int = 8,
               path: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val w = df.write.mode("overwrite")
        .bucketBy(buckets, bucketCol)
        .sortBy(sortCols.head, sortCols.tail: _*)
        .format("parquet")
      path.fold(w)(p => w.option("path", p)).saveAsTable(table)
    }
    spark.table(table)
  }
}
