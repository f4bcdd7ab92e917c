package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SectionExtras

class SectionExtrasSpec extends AnyFunSuite {

  test("extrap1d: interior interpolation, edge-gradient extrapolation") {
    val xs = Array(0.0, 1.0, 2.0)
    val ys = Array(0.0, 10.0, 30.0)
    val f = SectionExtras.extrap1d(xs, ys) _
    assert(f(0.5) == 5.0)
    assert(f(-1.0) == -10.0) // left gradient 10/1
    assert(f(3.0) == 50.0)   // right gradient 20/1
  }

  test("extrapSec fills NaN shadow zones along-track (w1=1)") {
    val nan = Double.NaN
    val data = Array(
      Array(1.0, 2.0, 3.0),
      Array(4.0, 5.0, nan), // shadow at deep level of station 3
      Array(nan, 8.0, nan))
    val dist  = Array(0.0, 1.0, 2.0)
    val depth = Array(0.0, 10.0, 20.0)
    val out = SectionExtras.extrapSec(data, dist, depth, w1 = 1.0, w2 = 0.0)
    assert(out(0).toSeq == Seq(1.0, 2.0, 3.0))
    assert(out(1)(2) == 6.0)  // row gradient 1 per station
    assert(out(2)(0) == 8.0 && out(2)(2) == 8.0) // single valid -> repeat
  }

  test("extrapSec single-valid row repeats; all-NaN columns poison the blend (numpy faithful)") {
    val nan = Double.NaN
    val data = Array(Array(nan, 7.0, nan), Array(nan, nan, nan))
    val out = SectionExtras.extrapSec(data, Array(0.0, 1.0, 2.0),
      Array(0.0, 10.0), w1 = 1.0, w2 = 0.0)
    // reference computes rows*w1 + cols.T*w2 with numpy arithmetic: columns
    // 0 and 2 have no valid data, stay NaN, and NaN*0 = NaN — so even at
    // w2=0 the row-filled 7.0 survives only where the column had data
    assert(out(0)(1) == 7.0)
    assert(out(0)(0).isNaN && out(0)(2).isNaN)
    assert(out(1)(1).isNaN) // all-NaN row stays NaN regardless of column fill
  }

  test("genTopomask: distances cumulative in km, depths positive, grid spacing dx") {
    val h   = Array(100.0, 500.0, 1000.0)
    val lon = Array(0.0, 0.0, 0.0)
    val lat = Array(0.0, 0.5, 1.0)
    val (xm, hm) = SectionExtras.genTopomask(h, lon, lat, dx = 10.0)
    assert(xm.head == 0.0)
    // reference np.arange(0, x.max()+dx, dx): ~111.2 km total -> grid runs
    // one point PAST the last station (120), covering the partial stretch
    assert(math.abs(xm.last - 120.0) < 1e-9)
    assert(xm.last >= 111.0, "grid must cover the full section extent")
    assert(xm.zip(xm.tail).forall { case (a, b) => math.abs(b - a - 10.0) < 1e-12 })
    assert(hm.head > 99.0 && hm.head < 101.0)   // ~0.99 m/dbar near surface
    assert(hm.last > hm.head)                   // deepens along track
    assert(hm.last == hm(hm.length - 2) || hm.last > 0) // beyond-last fill
  }
}
