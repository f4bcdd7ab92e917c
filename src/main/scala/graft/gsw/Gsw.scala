package graft.gsw

import org.apache.spark.sql.SparkSession

/**
 * Pure-Scala ports of the TEOS-10 (GSW) functions the reference calls:
 *
 *  - `gsw.p_from_z` — ctd/read.py:473-478 (depth-indexed CNV -> pressure)
 *  - `gsw.z_from_p` — ctd/extras.py:147 (topo mask depth)
 *  - `gsw.distance` — ctd/extras.py:146,176 (station distances)
 *  - `gsw.sigma0`   — ctd/extras.py:303,307 (barrier layer thickness)
 *
 * Formulas and coefficients are from the published TEOS-10 standard
 * (IOC/SCOR/IAPSO Manual 56; Roquet, Madec, McDougall & Barker 2015,
 * "Accurate polynomial expressions for the density and specific volume of
 * seawater using the TEOS-10 standard", Ocean Modelling 90) — the same public
 * source the Python `gsw` package implements. All functions are pure scalar
 * math (null-safety handled at the UDF boundary).
 */
object Gsw {

  private val Db2Pa    = 1e4
  private val Gamma    = 2.26e-7
  private val Deg2Rad  = math.Pi / 180.0
  private val EarthRad = 6371000.0 // m, TEOS-10 convention

  /** Dynamic-enthalpy polynomial coefficients at SSO, CT=0 (h001..h007):
    * the pressure integral of specvolSso0. */
  private val H = Array(
    9.726613854843870e-04, -2.252956605630465e-05, 2.376909655387404e-06,
    -1.664294869986011e-07, -5.988108894465758e-09, -2.1078768810e-09,
    2.8019291329e-10)

  /** Specific volume at Standard Ocean Salinity, CT = 0, as a function of
    * pressure [dbar]; coefficients are (n+1)*H(n) (exact integral pair). */
  def specvolSso0(p: Double): Double = {
    val z = p * 1e-4
    var acc = 7.0 * H(6)
    var i = 5
    while (i >= 0) { acc = (i + 1) * H(i) + z * acc; i -= 1 }
    acc
  }

  /** Dynamic enthalpy at SSO, CT = 0 [J/kg], pressure in dbar. */
  def enthalpySso0(p: Double): Double = {
    val z = p * 1e-4
    var acc = H(6)
    var i = 5
    while (i >= 0) { acc = H(i) + z * acc; i -= 1 }
    // polynomial was in z = p*1e-4; \int v dP over Pa: * 1e4 (z->dbar) * db2pa
    z * acc * Db2Pa * 1e4
  }

  /** Gravity at the surface for latitude (GSW "gs" in p_from_z/z_from_p). */
  private def grav0(lat: Double): Double = {
    val sin2 = { val s = math.sin(lat * Deg2Rad); s * s }
    9.780327 * (1.0 + (5.2792e-3 + 2.32e-5 * sin2) * sin2)
  }

  /** Height [m, negative below surface] from sea pressure [dbar].
    * gsw_z_from_p with zero dynamic height / geopotential anomalies. */
  def zFromP(p: Double, lat: Double): Double = {
    val gs = grav0(lat)
    val a  = -0.5 * Gamma * gs
    val c  = enthalpySso0(p)
    -2.0 * c / (gs + math.sqrt(gs * gs - 4.0 * a * c))
  }

  /** Sea pressure [dbar] from height [m]: Saunders (1981) first guess +
    * two modified-Newton iterations, exactly the published gsw algorithm. */
  def pFromZ(z: Double, lat: Double): Double = {
    val gs   = grav0(lat)
    val sin2 = { val s = math.sin(lat * Deg2Rad); s * s }
    val c1   = 5.25e-3 * sin2 + 5.92e-3
    var p    = -2.0 * z / ((1.0 - c1) + math.sqrt((1.0 - c1) * (1.0 - c1) + 8.84e-6 * z))
    var dfDp = Db2Pa * specvolSso0(p)
    val f    = enthalpySso0(p) + gs * (z - 0.5 * Gamma * z * z)
    val pOld = p
    p = pOld - f / dfDp
    val pMid = 0.5 * (p + pOld)
    dfDp = Db2Pa * specvolSso0(pMid)
    pOld - f / dfDp
  }

  /** Haversine distance [m] between two (lon, lat) points at the surface
    * (gsw_distance with p = 0, earth radius 6371 km). */
  def distance(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLon = (lon2 - lon1) * Deg2Rad
    val dLat = (lat2 - lat1) * Deg2Rad
    val sLat = math.sin(0.5 * dLat)
    val sLon = math.sin(0.5 * dLon)
    val a = sLat * sLat +
      math.cos(lat1 * Deg2Rad) * math.cos(lat2 * Deg2Rad) * sLon * sLon
    EarthRad * 2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }

  // --- sigma0: 75-term specific-volume polynomial evaluated at p = 0 -------

  private val SFac   = 0.0248826675584615     // 1 / (40 * 35.16504/35)
  private val Offset = 5.971840214030754e-1   // deltaS * SFac, deltaS = 24

  /** Potential density anomaly referenced to 0 dbar [kg/m^3]:
    * 1/v(SA, CT, 0) - 1000, with v the 75-term polynomial's p = 0 slice
    * (Roquet et al. 2015, coefficients v000..v060). */
  def sigma0(sa: Double, ct: Double): Double = {
    val xs = math.sqrt(SFac * sa + Offset)
    val ys = ct * 0.025
    val vp0 =
      1.0769995862e-03 + xs*(-3.1038981976e-04 + xs*(6.6928067038e-04 +
        xs*(-8.5047933937e-04 + xs*(5.8086069943e-04 + xs*(-2.1092370507e-04 +
        xs*3.1932457305e-05))))) +
      ys*(-1.5649734675e-05 + xs*(3.5009599764e-05 + xs*(-4.3592678561e-05 +
        xs*(3.4532461828e-05 + xs*(-1.1959409788e-05 + xs*1.3864594581e-06)))) +
      ys*(2.7762106484e-05 + xs*(-3.7435842344e-05 + xs*(3.5907822760e-05 +
        xs*(-1.8698584187e-05 + xs*3.8595339244e-06))) +
      ys*(-1.6521159259e-05 + xs*(2.4141479483e-05 + xs*(-1.4353633048e-05 +
        xs*2.2863324556e-06)) +
      ys*(6.9111322702e-06 + xs*(-8.7595873154e-06 + xs*4.3703680598e-06) +
      ys*(-8.0539615540e-07 + xs*(-3.3052758900e-07) + ys*2.0543094268e-07)))))
    1.0 / vp0 - 1000.0
  }

  /** Register all TEOS-10 functions for SQL use (`SELECT gsw_sigma0(sa, ct)`). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("gsw_p_from_z", (z: Double, lat: Double) => pFromZ(z, lat))
    spark.udf.register("gsw_z_from_p", (p: Double, lat: Double) => zFromP(p, lat))
    spark.udf.register("gsw_sigma0", (sa: Double, ct: Double) => sigma0(sa, ct))
    spark.udf.register("gsw_distance",
      (lon1: Double, lat1: Double, lon2: Double, lat2: Double) => distance(lon1, lat1, lon2, lat2))
  }
}
