package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Derived-quantity operators from the reference's extras module
 * (ctd/extras.py): conductivity thermal-mass correction, barrier-layer
 * thickness, and the section pivot that backs `plot_section`.
 */
object Extras {

  // native codegen expression (null-intolerant, same math as Gsw.sigma0)
  private def sigma0Col(sa: Column, ct: Column): Column =
    org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions.sigma0(sa, ct)

  /**
   * Conductivity cell thermal-mass correction [S/m].
   *
   * The reference implementation (ctd/extras.py:262-279) is BROKEN: it wraps
   * the dc/dt expression in a Python list (`[temperature - 20]`) and uses
   * `np.diff` whose output is one element short, so it raises on any real
   * input. This implements the INTENDED SBE formula it documents:
   * `a = 2*alpha/(si*beta + 2)`, `b = 1 - 2a/alpha`,
   * `dcdt = 0.1*(1 + 0.006*(T - 20))`, `ctm = -b*C + a*dcdt*dT` with
   * `dT = T - lag(T)` (first sample -> null). Divergence documented here and
   * pinned in ExtrasSpec.
   */
  def cellThermalMass(df: DataFrame, castCol: String, orderCol: String,
                      tempCol: String, condCol: String,
                      alpha: Double = 0.03, beta: Double = 1.0 / 7,
                      sampleInterval: Double = 1 / 15.0,
                      out: String = "ctm"): DataFrame = {
    val a = 2 * alpha / (sampleInterval * beta + 2)
    val b = 1 - (2 * a / alpha)
    val w = Window.partitionBy(castCol).orderBy(col(orderCol))
    val dt = col(tempCol) - lag(col(tempCol), 1).over(w)
    val dcdt = lit(0.1) * (lit(1.0) + lit(0.006) * (col(tempCol) - lit(20.0)))
    df.withColumn(out, lit(-1.0) * lit(b) * col(condCol) + lit(a) * dcdt * dt)
  }

  /**
   * Barrier-layer mask (ctd/extras.py:293-311): with
   * `sigma_theta = sigma0(SA, CT)`, the mixed-layer mask `ct[0]-ct < 0.5`,
   * `mld` = LAST row where the mask holds, the barrier layer is
   * `sigma_theta - sigma0(sa[0], ct[mld]) < sigma_theta[0] - sigma0(sa[0],
   * ct[mld])`. First/last-in-cast values come from unbounded windows — fully
   * relational apart from the sigma0 scalar.
   */
  def barrierLayerMask(df: DataFrame, castCol: String, orderCol: String,
                       saCol: String, ctCol: String,
                       out: String = "blt_mask"): DataFrame = {
    val wAll = Window.partitionBy(castCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val s0    = sigma0Col(col(saCol), col(ctCol))
    val mld   = (first(col(ctCol)).over(wAll) - col(ctCol)) < lit(0.5)
    val ctMld = last(when(mld, col(ctCol)), ignoreNulls = true).over(wAll)
    val saSfc = first(col(saCol)).over(wAll)
    val sigSurface   = first(s0).over(wAll)
    val sigBottomMld = sigma0Col(saSfc, ctMld)
    df.withColumn("sigma_theta", s0)
      .withColumn(out, (col("sigma_theta") - sigBottomMld) < (sigSurface - sigBottomMld))
  }

  /** Column-algebra twin of [[graft.gsw.Gsw.distance]] (haversine, TEOS-10
    * earth radius) — same operation order, so values are bit-identical to
    * the scalar port while staying inside whole-stage codegen (this was the
    * last boxed Scala UDF in an operator path, VERDICT r7 #3). */
  private def haversineM(lon1: Column, lat1: Column,
                         lon2: Column, lat2: Column): Column = {
    val d2r = lit(math.Pi / 180.0)
    val dLon = (lon2 - lon1) * d2r
    val dLat = (lat2 - lat1) * d2r
    val sLat = sin(dLat * 0.5)
    val sLon = sin(dLon * 0.5)
    val a = sLat * sLat + cos(lat1 * d2r) * cos(lat2 * d2r) * sLon * sLon
    lit(6371000.0 * 2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /**
   * Section view (the engine half of `plot_section`, ctd/extras.py:155-259):
   * casts binned onto a shared pressure grid (long form — the matrix is one
   * `groupBy(pressure).pivot(cast_id)` away, which stays driver-side since
   * the station count, not the sample count, bounds it). Station distance is
   * the cumulative haversine between consecutive casts' positions, from the
   * `casts` metadata table (gsw.distance, extras.py:146,176).
   */
  def section(samples: DataFrame, casts: DataFrame, castCol: String,
              orderCol: String, valueCol: String, delta: Double = 1.0,
              pressure: String = "pressure"): DataFrame = {
    val binned = Cast.bindataAverage(samples, castCol, orderCol,
      Seq(valueCol), delta, pressure, keepEmpty = false)
    // unpartitioned window is deliberate: it runs on the CASTS table (one
    // row per station), which a section bounds to ~10^2-10^3 rows — the
    // cumulative-distance scan is inherently sequential over stations and
    // never touches the samples
    val wOrd = Window.orderBy(col("lon"), col("lat"), col(castCol))
    val pLon = lag(col("lon"), 1).over(wOrd)
    val pLat = lag(col("lat"), 1).over(wOrd)
    // cumulative along-track distance per cast (stations ordered by position;
    // callers with a cruise order should pre-sort and pass a station index).
    // Casts WITHOUT a position are excluded from the distance chain — mapping
    // them to distance 0 would silently place them at the origin AND shift
    // every later station's cumulative distance; they surface with a null
    // station_dist_m through the left join instead.
    val stations = casts
      .dropDuplicates(castCol) // one station per cast (e.g. ros + cnv of the same cast)
      .filter(col("lon").isNotNull && col("lat").isNotNull)
      .withColumn("__seg", when(pLon.isNull || pLat.isNull,
          lit(0.0)) // first station: no predecessor
        .otherwise(haversineM(pLon, pLat, col("lon"), col("lat"))))
      .withColumn("station_dist_m",
        sum(col("__seg")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col(castCol), col("lon"), col("lat"), col("station_dist_m"))
    binned.join(broadcast(stations), Seq(castCol), "left")
  }

  /**
   * Recompute BTL-style per-bottle statistics from a ROS bottle log
   * (SURVEY §2.4: the .btl file's avg/sdev/min/max rows, as SBE software
   * derives them from the scans around each bottle closure). `sdev` is the
   * SAMPLE standard deviation — SBE convention (stddev_samp, not the
   * population std despike uses; SURVEY §7.4 item 4). Long output: one row
   * per (cast, bottle, statistic).
   */
  def bottleStats(ros: DataFrame, castCol: String, bottleCol: String,
                  valueCols: Seq[String]): DataFrame = {
    def forStat(stat: String, f: Column => Column): DataFrame =
      ros.groupBy(col(castCol), col(bottleCol))
        .agg(f(col(valueCols.head)).as(valueCols.head),
          valueCols.tail.map(c => f(col(c)).as(c)): _*)
        .withColumn("Statistic", lit(stat))
    forStat("avg", avg)
      .unionByName(forStat("sdev", stddev_samp))
      .unionByName(forStat("min", min))
      .unionByName(forStat("max", max))
  }

  /** Data path behind `plot_cast` (ctd/plotting.py:12-58): one channel of
    * one cast ordered by pressure, ready for the renderer. */
  def plotCastData(df: DataFrame, castCol: String, valueCol: String,
                   pressure: String = "pressure"): DataFrame =
    df.select(col(castCol), col(pressure), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .orderBy(col(castCol), col(pressure))
}
