package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query ...]")
    val Array(sfDir, outDir) = args.take(2)
    // optional trailing args: run only the named queries (local iteration;
    // the driver always calls with exactly two)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // events.parquet ts is TIMESTAMP(MICROS, isAdjustedToUTC=false) at
      // every sf (checked via parquet_schema) — i.e. NTZ micros. The event
      // ops bucket/sessionize on epoch micros, so the session timezone is
      // pinned to UTC to make that mapping engine-replayable (DuckDB's
      // epoch_us reads the same NTZ value); see EventOps.micros for the
      // DST caveat if anyone unpins this.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Defensive only: a no-op on the MICROS testdata, but keeps Verify
      // readable against NANOS-written parquet from other producers.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // opt-in layout advisories (SPARK_GRAFT_SCAN_AUDIT=1): print
    // PlanAudit.serialScanHazards per query before executing it —
    // planning-only, so the correctness run is unchanged; off by default
    // to keep the driver's stderr contract stable
    val audit = sys.env.get("SPARK_GRAFT_SCAN_AUDIT").contains("1")
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name))
      try {
        val df = fn(spark, sfDir)
        // audit is advisory by contract — an audit-time exception must
        // not mark the query failed or skip its verify output
        if (audit) try graft.ops.PlanAudit.serialScanHazards(df)
          .foreach(h => System.err.println(s"[verify:audit] $name $h"))
        catch { case e: Throwable =>
          System.err.println(s"[verify:audit] $name audit error: " +
            e.getMessage)
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** The exact oracle_sql.json payload the driver consumes — exposed so
    * OracleTypePortabilitySpec guards the same bytes it will see. */
  def oracleJson: String = SparkEntry.oracleSql
    .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
}
