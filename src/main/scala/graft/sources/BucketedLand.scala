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
      // Align write partitions with bucket ids before the bucketed write:
      // repartition(buckets, col) is the SAME Murmur3-pmod hash Spark
      // assigns bucket ids with, so each task holds exactly one bucket and
      // writes ONE file — without it every upstream task emits a file per
      // bucket it touches (numTasks x buckets small files; 256 on the
      // local 32-thread bench, tens of thousands from a real cluster
      // write), and every later probe pays the per-file open cost. Write
      // parallelism therefore equals `buckets`: size the bucket count to
      // the corpus (8 suffices for the bench tables; a 100 TB land wants
      // hundreds to low thousands of buckets, which this same line then
      // turns into exactly that many write tasks and files).
      val w = df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
        .write.mode("overwrite")
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

  /**
   * Rewrite a bucketed table in place, collapsing its accumulated append
   * files to ONE file per bucket. Every append (a streaming ingest's
   * per-micro-batch [[graft.ops.DedupOps.appendNearDupIndex]], a corpus
   * refresh's [[graft.ops.SearchOps.appendSearchIndex]]) adds up to
   * numBuckets files; after thousands of micro-batches the probe side pays
   * thousands of per-file opens per bucket. Compaction is the lifecycle
   * step that restores the freshly-landed file shape without changing a
   * single row — bucket spec, sort order, path, and schema are all taken
   * from the catalog, so the rewritten table serves the same zero-exchange
   * plans.
   *
   * Mechanics: the current contents are PINNED with a `localCheckpoint`
   * (executor block storage — distributed, one extra copy of the table for
   * the duration, never the driver), then written back with
   * `mode(Overwrite)` through the same bucket-aligned repartition the land
   * uses. The pin makes read-then-overwrite-same-table safe; it also means
   * compaction of a table larger than cluster storage should instead
   * re-land from upstream. NOT crash-atomic: the overwrite clears the
   * target before committing, so a mid-compact crash loses the on-disk
   * copy (the pinned copy dies with the session) — run it where a re-land
   * is possible, the same operational contract as any
   * non-transactional-metastore compaction.
   *
   * Returns (filesBefore, filesAfter) parquet data-file counts for
   * observability; `filesAfter == numBuckets` on success.
   */
  def compactTable(spark: org.apache.spark.sql.SparkSession,
                   table: String): (Long, Long) = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalStateException(
      s"compactTable('$table'): table is not bucketed — compaction " +
        "preserves a bucket spec; for plain tables just rewrite"))
    val bucketCol = spec.bucketColumnNames.head
    val sortCols = spec.sortColumnNames
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    def dataFiles(): Long = {
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) 0L
      else {
        val it = fs.listFiles(loc, true)
        var n = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) n += 1
        }
        n
      }
    }
    val before = dataFiles()
    val pinned = spark.table(table).localCheckpoint()
    pinned.count() // materialize the pin BEFORE the target is cleared
    val external = meta.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL
    // explicit drop + location clear (the pin holds the data): a CTAS into
    // a non-empty external location is rejected by default, so the
    // overwrite is done by hand rather than via mode(Overwrite)
    spark.sql(s"DROP TABLE `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (external && fs.exists(loc)) fs.delete(loc, true)
    val aligned = pinned.repartition(spec.numBuckets,
      org.apache.spark.sql.functions.col(bucketCol))
    val w0 = aligned.write.mode("errorifexists")
      .bucketBy(spec.numBuckets, bucketCol)
    val w1 = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
             else w0
    val w2 = w1.format("parquet")
    // an external table must be re-created at ITS path, not the warehouse
    (if (external) w2.option("path", meta.location.toString) else w2)
      .saveAsTable(table)
    (before, dataFiles())
  }

  /**
   * [[compactTable]] for a PARTITIONED (not bucketed) table — the ANN
   * index's cell-partitioned assignments accrete one file per touched
   * partition per [[graft.ops.SimOps.appendAnnIndex]] batch the same way
   * the bucketed tables do per append. Same pin-then-rewrite mechanics
   * and crash contract as [[compactTable]]; each partition's rows coalesce
   * through one shuffle on the partition column so the rewrite emits one
   * file per partition value. Returns (filesBefore, filesAfter).
   */
  def compactPartitionedTable(spark: org.apache.spark.sql.SparkSession,
                              table: String): (Long, Long) = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table))
    require(meta.partitionColumnNames.nonEmpty,
      s"compactPartitionedTable('$table'): table is not partitioned — " +
        "use compactTable for bucketed tables")
    val partCols = meta.partitionColumnNames
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    def dataFiles(): Long = {
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(loc)) 0L
      else {
        val it = fs.listFiles(loc, true)
        var n = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) n += 1
        }
        n
      }
    }
    val before = dataFiles()
    val pinned = spark.table(table).localCheckpoint()
    pinned.count()
    val external = meta.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL
    spark.sql(s"DROP TABLE `$table`")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (external && fs.exists(loc)) fs.delete(loc, true)
    val w = pinned
      .repartition(partCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("errorifexists")
      .partitionBy(partCols: _*)
      .format("parquet")
    (if (external) w.option("path", meta.location.toString) else w)
      .saveAsTable(table)
    (before, dataFiles())
  }
}
