package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/**
 * Leaf-scan parallelism audit — the productized form of the round-13
 * scaling lesson: a plan can be perfectly shuffle-parallel and still
 * serialize, because scan parallelism is an INPUT the storage layout
 * grants, not something any downstream operator can recover. The first
 * shuffle sits downstream of the damage; every map-side phase (parse,
 * kernel expressions, broadcast-join probes, partial window/top-k) runs
 * on however many splits actually PRODUCE rows. Measured: one 6 MB
 * single-file embeddings table at the 100× scale put q163's whole map
 * side — IVF cell assignment plus the partial WindowGroupLimit — into
 * ONE 700 s task while 31 cores idled; the same data in 100 files reads
 * 32.7 s.
 *
 * The scan RDD's partition count is NOT the right signal: Spark
 * byte-range-splits large files, but a parquet file is effectively
 * unsplittable below its row-group size, so a 20 MB one-row-group file
 * plans 4 "splits" of which 3 emit zero rows (measured in
 * PlanAuditSpec). The audit therefore reads the parquet FOOTERS
 * (driver-side, a few KB each, capped — listing already happened at
 * planning time) and reports `rowGroups`: the true upper bound on
 * row-producing tasks is `min(plannedSplits, rowGroups)`.
 *
 * [[scans]] lists every file-source / DSv2 leaf with files, bytes,
 * planned splits, and row groups; [[serialScanHazards]] turns that into
 * loud advisory strings when the effective parallelism is a small
 * fraction of the session's cores while the leaf carries non-trivial
 * bytes. Byte floor deliberately LOW (4 MiB): the 100× incident file
 * was 6 MB compressed — per-row compute, not I/O volume, is what a
 * serial scan multiplies. Advisory, not a gate: a dimension table
 * SHOULD be one small file (that is what makes it broadcast-able).
 */
object PlanAudit {

  /** Footers read per leaf, at most: beyond this many files the file
    * count alone already exceeds any sane parallelism floor. */
  private val FooterCap = 64

  /** One leaf scan. `splits` = the scan RDD's partition count (what the
    * scheduler sees); `rowGroups` = total parquet row groups across the
    * leaf's files (-1 when unknown: non-parquet, DSv2, or more files
    * than [[FooterCap]]); `effectiveSplits` = the audit's bound on tasks
    * that can actually produce rows. */
  final case class ScanInfo(relation: String, files: Long, bytes: Long,
                            splits: Int, rowGroups: Long,
                            parquet: Boolean) {
    def effectiveSplits: Long = {
      val planned = if (splits >= 0) splits.toLong else Long.MaxValue
      if (rowGroups >= 0) math.min(planned, rowGroups)
      else if (parquet && files >= 0)
        // parquet with uncounted footers (file count over the cap): each
        // file grants at least one row group, and byte-range splits past
        // the file count cannot be trusted to produce rows
        math.min(planned, math.max(files, 1L))
      else if (files >= 0) planned // splittable formats: trust the plan
      else -1L // fully unknown (DPP leaf) — never flagged
    }
  }

  /** Every file-source / DSv2 leaf of `df`'s physical plan (pre-AQE —
    * AQE re-plans exchanges, never leaf scans). Job-free: the listing
    * happened at planning time, footer reads are driver-side. */
  def scans(df: DataFrame): Seq[ScanInfo] =
    df.queryExecution.sparkPlan.collectLeaves().flatMap {
      case f: FileSourceScanExec =>
        val rel = f.relation.location.rootPaths.mkString(",")
        // A scan whose partition filters carry a DynamicPruning subquery
        // (DPP — e.g. a partitioned ANN cells table joined through its
        // probe list) cannot list or build its RDD before execution:
        // both throw INTERNAL_ERROR "Cannot evaluate expression:
        // dynamicpruning#N". The audit is advisory and pre-execution by
        // contract, so such leaves degrade to an all-unknown row instead
        // of failing the caller (measured on q76/q153's landed-ANN
        // probes).
        try {
          val listing = f.selectedPartitions
          // cheap cap check BEFORE materializing the file array — a
          // million-file listing should not allocate a path set just to
          // learn the cap excludes it
          val overCap = listing.totalNumberOfFiles > FooterCap
          val paths =
            if (overCap) Set.empty[org.apache.hadoop.fs.Path]
            else listing.toPartitionArray.iterator
              .map(_.filePath.toPath).toSet
          val isParquet = overCap || // over-cap leaves assumed parquet:
            // the conservative (files-bound) fallback is correct for
            // parquet and merely pessimistic otherwise, and a >64-file
            // leaf clears any sane floor regardless
            paths.forall(_.getName.endsWith(".parquet"))
          val rowGroups =
            if (overCap || !isParquet) -1L
            else {
              val conf = df.sparkSession.sessionState
                .newHadoopConf()
              try paths.iterator.map { p =>
                val in = org.apache.parquet.hadoop.util.HadoopInputFile
                  .fromPath(p, conf)
                val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
                try r.getFooter.getBlocks.size.toLong finally r.close()
              }.sum
              catch { case _: Exception => -1L } // advisory: never throw
            }
          val splits =
            try f.inputRDD.getNumPartitions catch { case _: Exception => -1 }
          Some(ScanInfo(rel, listing.totalNumberOfFiles,
            listing.totalFileSize, splits, rowGroups, isParquet))
        } catch { case _: Exception =>
          Some(ScanInfo(rel, -1L, -1L, -1, -1L, parquet = false))
        }
      case b: BatchScanExec =>
        // DSv2 (e.g. the ctd reader): one InputPartition per planned
        // split; sources report no uniform byte/row-group statistic.
        // inputPartitions can throw for runtime-filtered scans (the
        // FileSourceScanExec DPP hazard has a DSv2 twin) — advisory
        // contract says degrade, never throw.
        try Some(ScanInfo(b.scan.description(),
          b.inputPartitions.size.toLong, -1L, b.inputPartitions.size,
          -1L, parquet = false))
        catch { case _: Exception =>
          Some(ScanInfo(b.scan.description(), -1L, -1L, -1, -1L,
            parquet = false))
        }
      case _ => None
    }

  /**
   * Advisory strings for leaves that will serialize map-side work:
   * `effectiveSplits < minSplits` while `bytes >= minBytes` (DSv2
   * leaves with unknown bytes are flagged on splits alone when they
   * plan exactly 1). Defaults: `minSplits` = a quarter of the session's
   * default parallelism (a scan feeding under a quarter of the cores
   * starves the map side even before skew), `minBytes` = 4 MiB (see
   * class doc — the measured incident file was 6 MB). Empty = no
   * hazard.
   */
  def serialScanHazards(df: DataFrame, minSplits: Int = -1,
                        minBytes: Long = 4L << 20): Seq[String] = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val floor = if (minSplits > 0) minSplits else math.max(2, cores / 4)
    scans(df).flatMap {
      case s @ ScanInfo(rel, files, bytes, splits, rowGroups, _)
          if bytes >= minBytes && s.effectiveSplits < floor =>
        Some(s"serial scan: $rel lists $files file(s) / $bytes bytes, " +
          s"plans $splits split(s), but only ${s.effectiveSplits} can " +
          s"produce rows (${if (rowGroups >= 0) s"$rowGroups parquet row " +
            "group(s)" else "file-count bound"}) on a $cores-core " +
          "session — map-side phases (parse, kernels, broadcast probes, " +
          "partial windows) serialize here and no downstream shuffle can " +
          "recover the lost parallelism; rewrite the table in more files " +
          "(or smaller row groups) if this leaf is not a broadcast-side " +
          "dim")
      case ScanInfo(rel, _, -1L, 1, _, _)
          // A ctd leaf plans one partition per file, so 1 partition just
          // means a 1-file read — inherently serial, not a layout hazard;
          // flagging every tiny instrument file trains users to ignore
          // the advisories that matter (ADVICE r13).
          if !rel.matches("(?s)ctd ftype=.*files=1 .*") =>
        Some(s"serial scan: DSv2 leaf $rel planned exactly 1 input " +
          "partition — whole-source work runs in one task")
      case _ => None
    }
  }
}
