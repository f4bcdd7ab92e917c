package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.gsw.Gsw

class GswSpec extends AnyFunSuite {

  // Standard TEOS-10 check profile (IOC Manual 56 / GSW documentation).
  private val SA = Array(34.7118, 34.8915, 35.0256, 34.8472, 34.7366, 34.7324)
  private val CT = Array(28.8099, 28.4392, 22.7862, 10.2262, 6.8272, 4.3236)
  private val P  = Array(10.0, 50.0, 125.0, 250.0, 600.0, 1000.0)

  test("z_from_p: ~0.99 m per dbar near surface, deeper less") {
    val z10 = Gsw.zFromP(10.0, 4.0)
    assert(math.abs(z10 - (-9.9446)) < 5e-3, s"z(10 dbar) = $z10")
    val z1000 = Gsw.zFromP(1000.0, 4.0)
    assert(z1000 < -980 && z1000 > -1000, s"z(1000 dbar) = $z1000")
    // gravity increases with latitude -> same pressure is shallower at the pole
    assert(math.abs(Gsw.zFromP(1000.0, 90.0)) < math.abs(Gsw.zFromP(1000.0, 0.0)))
  }

  test("p_from_z inverts z_from_p to < 1e-6 dbar") {
    for (p <- P; lat <- Seq(0.0, 4.0, 30.0, 60.0)) {
      val z = Gsw.zFromP(p, lat)
      assert(math.abs(Gsw.pFromZ(z, lat) - p) < 1e-6, s"round trip p=$p lat=$lat")
    }
  }

  test("sigma0 against oceanographic check values") {
    // Expected from the GSW check table (gsw_sigma0 on the standard profile):
    val expected = Array(21.798, 22.052, 23.894, 26.668, 27.107, 27.410)
    SA.indices.foreach { i =>
      val got = Gsw.sigma0(SA(i), CT(i))
      assert(math.abs(got - expected(i)) < 0.05, s"i=$i: got $got expected ${expected(i)}")
    }
    // Fresh water at 4 C is within a few hundredths of 1000 kg/m^3
    assert(math.abs(Gsw.sigma0(0.0, 4.0)) < 0.3)
  }

  test("distance: 1 degree of latitude ~ 111.2 km, zero for same point") {
    val d = Gsw.distance(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(d - 111194.9) < 100.0, s"got $d")
    assert(Gsw.distance(10.0, 20.0, 10.0, 20.0) == 0.0)
    // longitude arc shrinks with cos(lat)
    val dEq = Gsw.distance(0.0, 0.0, 1.0, 0.0)
    val d60 = Gsw.distance(0.0, 60.0, 1.0, 60.0)
    assert(math.abs(d60 / dEq - 0.5) < 0.01)
  }
}
