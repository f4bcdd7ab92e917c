package graft

import org.apache.spark.sql.functions._

import graft.ops.PlanAudit

/**
 * [[graft.ops.PlanAudit]] — the serial-scan advisory distilled from the
 * round-13 100× incident (one 6 MB single-file table serialized a whole
 * map side into one 700 s task). The spec builds its own corpora so the
 * layout under test is explicit: same rows, one file vs many.
 */
class PlanAuditSpec extends SparkTestBase {

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("plan-audit").toString
    // ~6 MB of rows in ONE file (the incident shape) and the same rows
    // in 16 files
    val df = spark.range(0L, 300000L).select(col("id"),
      concat(lit("padding text for bytes "), col("id"),
        // md5 twice defeats parquet's dictionary+snappy enough that the
        // single file clears the 4 MiB advisory floor
        md5(col("id").cast("string")),
        md5(concat(lit("x"), col("id").cast("string"))),
        lit(" abcdefghijklmnopqrstuvwxyz0123456789")).as("s"))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/one")
    df.repartition(16).write.mode("overwrite").parquet(s"$dir/many")
    dir
  }

  test("scans() reports files, bytes, splits, and row groups per leaf") {
    val one = PlanAudit.scans(spark.read.parquet(s"$root/one")).head
    assert(one.files == 1L)
    assert(one.bytes > (4L << 20), s"fixture too small: $one")
    // Spark byte-range-splits the big single file, but the one row group
    // bounds row-producing tasks to 1 — exactly the trap the audit names
    assert(one.rowGroups == 1L, one.toString)
    assert(one.splits >= 1 && one.effectiveSplits == 1L, one.toString)
    val many = PlanAudit.scans(spark.read.parquet(s"$root/many")).head
    assert(many.files == 16L && many.rowGroups == 16L &&
      many.effectiveSplits >= 4L, many.toString)
  }

  test("a joined plan lists BOTH leaves") {
    val a = spark.read.parquet(s"$root/one")
    val b = spark.read.parquet(s"$root/many").select(col("id"),
      col("s").as("s2"))
    val infos = PlanAudit.scans(a.join(b, "id"))
    assert(infos.size == 2, infos.mkString("; "))
  }

  test("serialScanHazards flags the single-file layout and not the " +
       "multi-file one") {
    val haz = PlanAudit.serialScanHazards(spark.read.parquet(s"$root/one"))
    assert(haz.size == 1 && haz.head.contains("only 1 can produce rows"),
      haz.mkString("; "))
    assert(PlanAudit.serialScanHazards(
      spark.read.parquet(s"$root/many")).isEmpty)
  }

  test("small files (dims) stay unflagged by the byte floor") {
    val dir = s"$root/dim"
    spark.range(0L, 100L).select(col("id"), col("id").cast("string").as("n"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    assert(PlanAudit.serialScanHazards(spark.read.parquet(dir)).isEmpty)
  }

  test("the audit schedules no Spark job") {
    val df = spark.read.parquet(s"$root/one")
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    PlanAudit.serialScanHazards(df): Unit
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(before == after, "PlanAudit ran a job")
  }

  test("a big single CSV file is NOT flagged — byte-range splits of a " +
       "splittable format all produce rows") {
    val dir = s"$root/csv"
    spark.range(0L, 300000L).select(col("id"),
      concat(md5(col("id").cast("string")),
        md5(concat(lit("y"), col("id").cast("string")))).as("s"))
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
    val df = spark.read.option("header", "true").csv(dir)
    val info = PlanAudit.scans(df).head
    assert(!info.parquet && info.files == 1L && info.bytes > (4L << 20),
      info.toString)
    // Spark byte-range-splits the csv; unlike the one-row-group parquet
    // case every split yields rows, so effective = planned and no flag
    assert(info.splits > 1 && info.effectiveSplits == info.splits.toLong,
      info.toString)
    assert(PlanAudit.serialScanHazards(df).isEmpty)
  }

  test("a leaf behind a DynamicPruning subquery degrades to an unknown " +
       "row instead of throwing") {
    // partitioned fact + selective dim join -> the optimizer injects a
    // dynamicpruning#N partition filter; listing or building that scan's
    // RDD before execution throws INTERNAL_ERROR (measured on the landed
    // ANN probes q76/q153), and the audit must absorb it
    val dir = s"$root/dpp"
    spark.range(0L, 20000L)
      .select(col("id"), (col("id") % 16).as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = spark.range(0L, 16L).select(col("id").as("part"),
      col("id").as("w")).filter(col("w") < 2)
    val joined = fact.join(dim, "part")
    val hasDpp = joined.queryExecution.sparkPlan.toString
      .contains("dynamicpruning")
    assume(hasDpp, "planner did not inject DPP on this Spark build")
    val infos = PlanAudit.scans(joined)
    assert(infos.nonEmpty)
    // no exception, and the DPP leaf reports unknowns, never a hazard
    val unknown = infos.filter(_.files == -1L)
    assert(unknown.forall(_.effectiveSplits == -1L), infos.mkString("; "))
    assert(PlanAudit.serialScanHazards(joined)
      .forall(!_.contains("-1 file")), "unknown leaf was flagged")
  }

  test("the ctd DSv2 leaf reports one partition per file") {
    val cnv = spark.read.format("ctd").option("ftype", "cnv")
      .load(s"$dataDir/CTD/g01l01s01.cnv.gz")
    val infos = PlanAudit.scans(cnv)
    assert(infos.size == 1 && infos.head.splits == 1, infos.mkString("; "))
  }
}
