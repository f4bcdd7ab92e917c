package graft

import org.apache.spark.sql.functions._

import graft.ops.Extras
import graft.sources.CtdRead

class ExtrasSpec extends SparkTestBase {

  import spark.implicits._

  test("cellThermalMass matches the hand-computed intended SBE formula") {
    val df = Seq(("c", 0L, 10.0, 3.5), ("c", 1L, 12.0, 3.6), ("c", 2L, 11.0, 3.55))
      .toDF("cast_id", "scan_order", "temp", "cond")
    val a = 2 * 0.03 / ((1.0 / 15) * (1.0 / 7) + 2)
    val b = 1 - (2 * a / 0.03)
    val out = Extras.cellThermalMass(df, "cast_id", "scan_order", "temp", "cond")
      .orderBy("scan_order").select("ctm").collect()
    assert(out(0).isNullAt(0)) // no previous sample -> null dT
    val expected1 = -1.0 * b * 3.6 + a * (0.1 * (1 + 0.006 * (12.0 - 20))) * 2.0
    assert(math.abs(out(1).getDouble(0) - expected1) < 1e-12)
  }

  test("barrierLayerMask: sigma_theta present, mask boolean, mixed layer rows masked") {
    val df = Seq(
      ("c", 0L, 35.0, 20.0), ("c", 1L, 35.1, 19.9), ("c", 2L, 35.2, 19.7),
      ("c", 3L, 35.3, 15.0), ("c", 4L, 35.4, 10.0))
      .toDF("cast_id", "scan_order", "sa", "ct")
    val out = Extras.barrierLayerMask(df, "cast_id", "scan_order", "sa", "ct")
      .orderBy("scan_order").collect()
    assert(out.forall(!_.isNullAt(out(0).fieldIndex("sigma_theta"))))
    // density increases with depth here
    val sig = out.map(_.getAs[Double]("sigma_theta"))
    assert(sig.zip(sig.tail).forall { case (x, y) => x < y })
  }

  test("section: binned casts with monotone cumulative station distance") {
    // continuous casts: bin the ascending downcast (ros bottle casts descend
    // -> empty arange grid, faithful to pandas)
    val raw = CtdRead.cnv(spark, s"$dataDir/CTD")
    val samples = graft.ops.Cast.split(
      graft.ops.Cast.removeAboveWater(raw), "cast_id", "scan_order")
      .filter(col("direction") === "down")
    val meta = CtdRead.casts(spark, "cnv", s"$dataDir/CTD")
    val sec = Extras.section(samples, meta, "cast_id", "scan_order", "t090C", 50.0)
    val rows = sec.collect()
    assert(rows.length > 0)
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("t090C"))))
    val dists = sec.select("cast_id", "station_dist_m").distinct().collect()
      .flatMap(r => Option(r.get(1)).map(_ => r.getDouble(1)))
    assert(dists.forall(_ >= 0.0))
    assert(dists.max > 0.0) // fixtures span distinct stations
  }

  test("plotCastData: ordered non-null channel") {
    val df = CtdRead.cnv(spark, s"$dataDir/CTD_with_sigma_e00.cnv")
    val out = Extras.plotCastData(df, "cast_id", "t068C").collect()
    assert(out.nonEmpty)
    val ps = out.map(_.getAs[Double]("pressure"))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
  }
}
