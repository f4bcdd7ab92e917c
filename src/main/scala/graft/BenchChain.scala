package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Cast => CastOps}

/**
 * Engine-side timing of the QC chain (BASELINE.md head-to-head #2) —
 * the counterpart of `scripts/bench_reference_chain.py`, same four gz
 * casts, same steps:
 *
 *   ctd source -> despike(n1=2, n2=20, block=100) -> pressCheck
 *              -> split (down leg) -> bindataAverage(delta=1.0)
 *
 * over EVERY numeric channel (the reference's `DataFrame.apply` processes
 * all columns). Reported warm (one untimed pass first), with a second
 * timing that ADDS lpFilter on pressure — the step the reference side
 * must skip because scipy is absent in this container; included here so
 * the engine number is also available for the full documented chain.
 */
object BenchChain {
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

    def chain(withLp: Boolean) = {
      val base = read()
      val lp = if (withLp)
        graft.ops.SeqOps.lpFilter(base, "cast_id", "scan_order")
      else base
      val d  = CastOps.despike(lp, "cast_id", "scan_order", valueCols,
        n1 = 2.0, n2 = 20.0, block = 100)
      val pc = CastOps.pressCheck(d, "cast_id", "scan_order", valueCols)
      val dn = CastOps.split(pc, "cast_id", "scan_order")
        .filter(col("direction") === "down")
      CastOps.bindataAverage(dn, "cast_id", "scan_order", valueCols,
        delta = 1.0)
    }

    val rows = read().count()
    noop(chain(withLp = false)) // warm: JIT + codegen + parquet-free parse
    noop(chain(withLp = true))

    val t0 = System.nanoTime()
    noop(chain(withLp = false))
    val noLp = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    noop(chain(withLp = true))
    val withLp = (System.nanoTime() - t1) / 1e9

    val outRows = chain(withLp = false).count()
    println(s"""{"metric":"engine_qc_chain","files":${files.length},""" +
      s""""rows":$rows,"out_rows":$outRows,"chain_s":$noLp,""" +
      s""""chain_with_lp_s":$withLp,"n_channels":${valueCols.length},""" +
      s""""steps":"despike(2,20,100)+pressCheck+split.down+bindata(1.0)"}""")
    spark.stop()
  }
}
