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

    def chain(withLp: Boolean, refExact: Boolean = false) = {
      val base = read()
      val lp = if (withLp)
        graft.ops.SeqOps.lpFilter(base, "cast_id", "scan_order")
      else base
      val d  = CastOps.despike(lp, "cast_id", "scan_order", valueCols,
        n1 = 2.0, n2 = 20.0, block = 100, refExact = refExact)
      val pc = CastOps.pressCheck(d, "cast_id", "scan_order", valueCols)
      val dn = CastOps.split(pc, "cast_id", "scan_order")
        .filter(col("direction") === "down")
      CastOps.bindataAverage(dn, "cast_id", "scan_order", valueCols,
        delta = 1.0, edgesViaWindow = true)
    }

    val rows = read().count()

    // INTERLEAVED reps (the graft.Bench protocol): sequential per-variant
    // blocks confound JIT warm-up with the variant — four r15 windows
    // measured the FIRST timed variant at 12.5-15.2 s and the LAST at
    // 6.7-8.2 s whatever the variant order, while the fully-warm ledger
    // prefixes ran the whole chain in 4.3 s. Two warm passes per shape,
    // then round-robin reps; median AND min ship (steal only adds time,
    // so min is the machine number when they disagree).
    val variants = Seq(
      "chain" -> (() => chain(withLp = false)),
      "refexact" -> (() => chain(withLp = false, refExact = true)),
      "with_lp" -> (() => chain(withLp = true)))
    variants.foreach { case (_, mk) => noop(mk()); noop(mk()) }
    val reps = 5
    val samples: Map[String, Seq[Double]] =
      (1 to reps).flatMap { _ =>
        variants.map { case (name, mk) =>
          val t = System.nanoTime()
          noop(mk())
          name -> (System.nanoTime() - t) / 1e9
        }
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    def med(n: String): Double = samples(n)(reps / 2)
    def mn(n: String): Double = samples(n).head
    val (noLp, noLpMin) = (med("chain"), mn("chain"))
    val (refExactS, refExactMin) = (med("refexact"), mn("refexact"))
    val (withLp, withLpMin) = (med("with_lp"), mn("with_lp"))

    // ---- PER-STAGE LEDGER (VERDICT r14 #7): cumulative prefixes of the
    // refExact chain (the q181 anchor path) — each prefix re-executes its
    // upstream, so successive DELTAS attribute wall to parse / despike
    // kernel / pressCheck+split windows / bindata aggregation. MIN of 5
    // reps per prefix: this VM's CPU-steal bursts only ADD time, so min
    // is the burst-robust estimator (the first r15 window measured a
    // median-of-3 cum[2] ABOVE cum[3] — a physically impossible ordering
    // a single 50%-stolen rep produces). The prefixes pipeline inside
    // one task per cast exactly like the full chain, so the deltas are
    // honest attribution, not artifacts of materialization boundaries
    // (noop sink throughout).
    def prefix(stage: Int) = {
      val base = read()
      if (stage == 0) base
      else {
        val d = CastOps.despike(base, "cast_id", "scan_order", valueCols,
          n1 = 2.0, n2 = 20.0, block = 100, refExact = true)
        if (stage == 1) d
        else {
          val pc = CastOps.pressCheck(d, "cast_id", "scan_order", valueCols)
          val dn = CastOps.split(pc, "cast_id", "scan_order")
            .filter(col("direction") === "down")
          if (stage == 2) dn
          else CastOps.bindataAverage(dn, "cast_id", "scan_order",
            valueCols, delta = 1.0, edgesViaWindow = true)
        }
      }
    }
    noop(prefix(0)); noop(prefix(2)) // warm the prefix shapes
    def minTimed(mk: () => org.apache.spark.sql.DataFrame,
                 reps: Int = 5): Double =
      (1 to reps).map { _ =>
        val t = System.nanoTime()
        noop(mk())
        (System.nanoTime() - t) / 1e9
      }.min
    val cum0 = (0 to 3).map(s => minTimed(() => prefix(s)))
    // enforce the physical ordering (each prefix strictly contains the
    // previous); a residual inversion after min-of-5 is clamped and the
    // raw mins stay in cum_s for the reader
    val cum = cum0.scanLeft(0.0)(math.max).tail
    val ledger =
      s""""ledger":{"parse_s":${cum(0)},""" +
      s""""despike_s":${cum(1) - cum(0)},""" +
      s""""press_split_s":${cum(2) - cum(1)},""" +
      s""""bindata_s":${cum(3) - cum(2)},""" +
      s""""cum_s":[${cum0.mkString(",")}]}"""

    val outRows = chain(withLp = false).count()
    println(s"""{"metric":"engine_qc_chain","files":${files.length},""" +
      s""""rows":$rows,"out_rows":$outRows,"chain_s":$noLp,""" +
      s""""chain_min_s":$noLpMin,""" +
      s""""chain_refexact_s":$refExactS,""" +
      s""""chain_refexact_min_s":$refExactMin,""" +
      s""""chain_with_lp_s":$withLp,""" +
      s""""chain_with_lp_min_s":$withLpMin,""" +
      s""""n_channels":${valueCols.length},""" +
      s"""$ledger,""" +
      s""""steps":"despike(2,20,100)+pressCheck+split.down+bindata(1.0)"}""")
    spark.stop()
  }
}
