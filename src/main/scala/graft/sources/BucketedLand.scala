package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.TableIdentifier

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
    } else {
      // A pre-existing table is only served if it actually provides the
      // clustered distribution the caller asked for — a stale or
      // differently-bucketed table would silently void the zero-exchange
      // guarantee (ADVICE r4).
      val meta = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table))
      val spec = meta.bucketSpec.getOrElse(
        throw new IllegalStateException(
          s"landOnce('$table'): existing table is not bucketed; drop it " +
            "or land under a different name"))
      val specOk = spec.numBuckets == buckets &&
        spec.bucketColumnNames == Seq(bucketCol) &&
        spec.sortColumnNames == sortCols
      if (!specOk) throw new IllegalStateException(
        s"landOnce('$table'): existing bucket spec (${spec.numBuckets} x " +
          s"${spec.bucketColumnNames.mkString(",")} sorted by " +
          s"${spec.sortColumnNames.mkString(",")}) != requested ($buckets x " +
          s"$bucketCol sorted by ${sortCols.mkString(",")}); drop the table " +
          "or land under a different name")
      // catalogString ignores nullability/containsNull, which parquet
      // round-trips loosen (array<string> lands back containsNull=true) —
      // strict DataType equality would reject a re-land of the identical
      // frame
      val have = meta.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
      val want = df.schema.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
      if (have != want) throw new IllegalStateException(
        s"landOnce('$table'): existing schema ${meta.schema.simpleString} " +
          s"!= incoming ${df.schema.simpleString}; drop the table or land " +
          "under a different name")
    }
    spark.table(table)
  }
}
