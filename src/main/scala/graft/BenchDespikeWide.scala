package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Cast => CastOps}

/**
 * A/B micro-benchmark for the `despike(channelGroups > 1)` input snapshot
 * (VERDICT r11 task #4): the channel-group fan-out re-evaluates the
 * upstream lineage once per group + once for the scaffold, which on the
 * ctd source is a full re-parse per group. Three strategies timed on the
 * real 4-cast gz fixture set:
 *
 *   none    — despike(channelGroups=4) with the snapshot disabled is not
 *             constructible from the public API, so "none" times the g+1
 *             re-parses directly: one single-group despike per group slice
 *             plus the scaffold scan (exactly what the fan-out would do
 *             without a snapshot);
 *   persist — the shipped path: MEMORY_AND_DISK cache, lineage KEPT (a
 *             lost executor recomputes; preemption-safe at cluster scale);
 *   single  — the channelGroups=1 baseline the fan-out must beat.
 *
 * Prints one JSON line. Run: sbt "runMain graft.BenchDespikeWide [dir]".
 */
object BenchDespikeWide {
  def main(args: Array[String]): Unit = {
    val dir  = args.headOption.getOrElse("src/test/resources/ctd-data/CTD")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cnv.gz")).map(_.getPath).sorted
    def read() = spark.read.format("ctd").option("ftype", "cnv")
      .load(files.toIndexedSeq: _*)
    val valueCols = read().schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.DoubleType &&
        f.name != "pressure" => f.name
    }.toSeq
    val g = 4
    val slices = valueCols.zipWithIndex.groupBy(_._2 % g).toSeq
      .sortBy(_._1).map(_._2.map(_._1))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warm: JIT + codegen + dictionary caches
    noop(CastOps.despike(read(), "cast_id", "scan_order", valueCols,
      n1 = 2.0, n2 = 20.0, block = 100))

    val single = timed(noop(CastOps.despike(read(), "cast_id", "scan_order",
      valueCols, n1 = 2.0, n2 = 20.0, block = 100)))

    // "none": the g skinny kernels + scaffold, each re-parsing the source
    val none = timed {
      slices.foreach { gc =>
        noop(CastOps.despike(
          read().select((Seq("cast_id", "scan_order") ++ gc).map(col): _*),
          "cast_id", "scan_order", gc, n1 = 2.0, n2 = 20.0, block = 100))
      }
      noop(read().drop(valueCols: _*))
    }

    val persist = timed(noop(CastOps.despike(read(), "cast_id", "scan_order",
      valueCols, n1 = 2.0, n2 = 20.0, block = 100, channelGroups = g)))
    val released = CastOps.releaseDespikeSnapshots()

    println(s"""{"metric":"despike_wide_ab","files":${files.length},""" +
      s""""n_channels":${valueCols.length},"groups":$g,""" +
      s""""single_s":$single,"reparse_s":$none,"persist_s":$persist,""" +
      s""""snapshots_released":$released}""")
    spark.stop()
  }
}
