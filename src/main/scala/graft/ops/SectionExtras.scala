package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dsp.Interp

/**
 * Driver-side section helpers — the reference's `extrap_sec`, `_extrap1d`
 * and `gen_topomask` (ctd/extras.py:9-33, 42-103, 106-152). These operate on
 * the COLLECTED section matrix (stations x depth levels): station count
 * bounds the size, so they are deliberately not distributed (SURVEY §2.7) —
 * the distributed half is `Extras.section`, which reduces 10^9 samples to
 * the small matrix collected here.
 */
object SectionExtras {

  /** `_extrap1d`: linear interpolation that EXTRAPOLATES beyond the input
    * range using the edge gradients (unlike np.interp's clamping). xs must
    * be ascending. */
  def extrap1d(xs: Array[Double], ys: Array[Double])(x: Double): Double = {
    val n = xs.length
    require(n >= 2, "extrap1d needs at least two points")
    if (x < xs(0)) ys(0) + (x - xs(0)) * (ys(1) - ys(0)) / (xs(1) - xs(0))
    else if (x > xs(n - 1))
      ys(n - 1) + (x - xs(n - 1)) * (ys(n - 1) - ys(n - 2)) / (xs(n - 1) - xs(n - 2))
    else Interp.linearOne(x, xs, ys)
  }

  private def fillSeries(coord: Array[Double], values: Array[Double]): Array[Double] = {
    val mask = values.map(v => !v.isNaN)
    val nValid = mask.count(identity)
    if (nValid == 0) values.clone()
    else if (nValid == 1) {
      val v = values(mask.indexOf(true))
      Array.fill(values.length)(v)
    } else {
      val xs = coord.zip(mask).collect { case (x, true) => x }
      val ys = values.filter(v => !v.isNaN)
      coord.map(extrap1d(xs, ys))
    }
  }

  /**
   * `extrap_sec`: fill the shadow zone of a section (shallow stations beside
   * deep ones) by extrapolating each row along-track and each column in
   * depth, blended `w1*rows + w2*cols`. `data(i)(j)` = depth level i,
   * station j (NaN = missing); `dist` = station distances; `depth` = level
   * depths.
   */
  def extrapSec(data: Array[Array[Double]], dist: Array[Double],
                depth: Array[Double], w1: Double = 1.0,
                w2: Double = 0.0): Array[Array[Double]] = {
    val rows = data.map(row => fillSeries(dist, row))
    val nI = data.length
    val nJ = if (nI == 0) 0 else data(0).length
    val colsFilled = Array.tabulate(nJ) { j =>
      fillSeries(depth, Array.tabulate(nI)(i => data(i)(j)))
    }
    Array.tabulate(nI)(i => Array.tabulate(nJ)(j =>
      rows(i)(j) * w1 + colsFilled(j)(i) * w2))
  }

  /**
   * `gen_topomask`: bottom topography along the transect — cumulative
   * station distance [km] on a `dx`-km grid, depth from the deepest scan of
   * each station via TEOS-10 `z_from_p`, linearly interpolated (beyond the
   * last station: the last station's depth, scipy `fill_value=h[-1]`
   * with `bounds_error=False`).
   */
  def genTopomask(h: Array[Double], lon: Array[Double], lat: Array[Double],
                  dx: Double = 1.0): (Array[Double], Array[Double]) = {
    require(h.length == lon.length && h.length == lat.length)
    val latMean = lat.sum / lat.length
    val x = new Array[Double](h.length)
    var i = 1
    while (i < h.length) {
      x(i) = x(i - 1) +
        graft.gsw.Gsw.distance(lon(i - 1), lat(i - 1), lon(i), lat(i)) / 1e3
      i += 1
    }
    val depths = h.map(p => -graft.gsw.Gsw.zFromP(p, latMean))
    // reference grid = np.arange(0, x.max() + dx, dx): one point PAST the
    // last station when x.max() is not a multiple of dx (the trailing
    // partial-dx stretch is filled with the last depth below)
    val nGrid = math.ceil(x.last / dx + 1 - 1e-12).toInt
    val xm = Array.tabulate(nGrid)(k => k * dx)
    val hm = xm.map { xq =>
      if (xq > x.last) depths.last else Interp.linearOne(xq, x, depths)
    }
    (xm, hm)
  }

  /** Collect a long-form section (from `Extras.section`) into the
    * stations-x-depths matrix the reference's `plot_section` consumes:
    * returns (stationIds ordered by distance, depths ascending, matrix
    * [depth][station], stationDistances). */
  def sectionMatrix(section: DataFrame, castCol: String, pressure: String,
                    valueCol: String): (Array[String], Array[Double], Array[Array[Double]], Array[Double]) = {
    val rows = section
      .select(col(castCol).cast("string"), col(pressure).cast("double"),
        col(valueCol).cast("double"), col("station_dist_m").cast("double"))
      .collect()
    val stations = rows.map(r => (r.getString(0), if (r.isNullAt(3)) 0.0 else r.getDouble(3)))
      .distinct.sortBy(t => (t._2, t._1))
    val depths = rows.map(_.getDouble(1)).distinct.sorted
    val sIdx = stations.map(_._1).zipWithIndex.toMap
    val dIdx = depths.zipWithIndex.toMap
    val m = Array.fill(depths.length, stations.length)(Double.NaN)
    rows.foreach { r =>
      val v = if (r.isNullAt(2)) Double.NaN else r.getDouble(2)
      m(dIdx(r.getDouble(1)))(sIdx(r.getString(0))) = v
    }
    (stations.map(_._1), depths, m, stations.map(_._2))
  }
}
