package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dsp._

class DspSpec extends AnyFunSuite {

  private def assertArr(a: Array[Double], b: Array[Double], tol: Double = 1e-12): Unit = {
    assert(a.length == b.length, s"length ${a.length} != ${b.length}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) <= tol, s"idx $i: $x vs $y")
    }
  }

  test("butter2LowPass matches scipy.signal.butter(2, 0.25, 'low')") {
    // Well-known scipy output for wn = 0.25:
    //   b = [0.09763107, 0.19526215, 0.09763107], a = [1, -0.94280904, 1/3]
    val (b, a) = Butterworth.butter2LowPass(0.25)
    assertArr(b, Array(0.0976310729378175, 0.195262145875635, 0.0976310729378175), 1e-12)
    assertArr(a, Array(1.0, -0.9428090415820634, 0.3333333333333333), 1e-12)
  }

  test("lp_filter wn formula matches reference defaults") {
    // ctd/processing.py:86: wn = (1/time_constant) / (2 * sample_rate)
    val wn = (1.0 / 0.15) / (24.0 * 2.0)
    assert(math.abs(wn - 0.1388888888888889) < 1e-15)
    val (b, a) = Butterworth.butter2LowPass(wn)
    // basic filter sanity: DC gain = 1 (sum b = sum a)
    assert(math.abs(b.sum - a.sum) < 1e-14)
  }

  test("lfilterZi steady state: filtering a constant from zi*c yields c everywhere") {
    val (b, a) = Butterworth.butter2LowPass(0.25)
    val zi = FiltFilt.lfilterZi(b, a)
    val x  = Array.fill(20)(3.7)
    val y  = FiltFilt.lfilter(b, a, x, Array(zi(0) * x(0), zi(1) * x(0)))
    y.foreach(v => assert(math.abs(v - 3.7) < 1e-12))
  }

  test("filtfilt is zero-phase: constants exact, ramps exact in the interior") {
    val (b, a) = Butterworth.butter2LowPass(0.2)
    val const = Array.fill(50)(2.5)
    assertArr(FiltFilt.filtfilt(b, a, const), const, 1e-10)
    // A ramp passes exactly away from the ends; the ends carry a small
    // transient because lfilter_zi assumes a constant input (scipy identical).
    val ramp = Array.tabulate(100)(i => 0.5 * i + 1.0)
    val y = FiltFilt.filtfilt(b, a, ramp)
    assertArr(y.slice(20, 80), ramp.slice(20, 80), 1e-5)
    y.zip(ramp).foreach { case (a0, b0) => assert(math.abs(a0 - b0) < 0.01) }
  }

  test("filtfilt attenuates high frequency, passes low") {
    val (b, a) = Butterworth.butter2LowPass(0.1)
    val n = 400
    val lo = Array.tabulate(n)(i => math.sin(2 * math.Pi * 0.01 * i))
    val hi = Array.tabulate(n)(i => math.sin(2 * math.Pi * 0.45 * i))
    val yLo = FiltFilt.filtfilt(b, a, lo)
    val yHi = FiltFilt.filtfilt(b, a, hi)
    val ampLo = yLo.slice(50, n - 50).map(math.abs).max
    val ampHi = yHi.slice(50, n - 50).map(math.abs).max
    assert(ampLo > 0.9, s"low band should pass, got $ampLo")
    assert(ampHi < 0.01, s"high band should be crushed, got $ampHi")
  }

  test("convolveSame matches numpy examples") {
    // np.convolve([1,2,3], [0,1,0.5], 'same') = [1.0, 2.5, 4.0]
    assertArr(Kernels.convolveSame(Array(1, 2, 3), Array(0, 1, 0.5)), Array(1.0, 2.5, 4.0))
    // np.convolve([1,2,3,4], ones(2)/2, 'same') = [0.5, 1.5, 2.5, 3.5]
    assertArr(Kernels.convolveSame(Array(1, 2, 3, 4), Array(0.5, 0.5)),
      Array(0.5, 1.5, 2.5, 3.5))
  }

  test("window kernels match numpy closed forms") {
    // np.hanning(5) = [0, 0.5, 1, 0.5, 0]
    assertArr(Kernels.hanning(5), Array(0.0, 0.5, 1.0, 0.5, 0.0))
    // np.hamming(5) = [0.08, 0.54, 1, 0.54, 0.08]
    assertArr(Kernels.hamming(5), Array(0.08, 0.54, 1.0, 0.54, 0.08), 1e-12)
    // np.bartlett(5) = [0, 0.5, 1, 0.5, 0]
    assertArr(Kernels.bartlett(5), Array(0.0, 0.5, 1.0, 0.5, 0.0))
    // np.blackman(5) = [-1.38e-17, 0.34, 1, 0.34, -1.38e-17]
    assertArr(Kernels.blackman(5), Array(0.0, 0.34, 1.0, 0.34, 0.0), 1e-10)
  }

  test("smooth: window_len < 3 is identity; flat window matches hand-computed reference") {
    val x = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    assertArr(Kernels.smooth(x, 2, "hanning"), x)
    // Reference semantics on the ramp x_i = 2i, wl = 5, flat:
    // left ext = 2*x0 - x[5:1:-1] = [-10,-8,-6,-4] (skips x[1]: off-by-one
    // replicated from ctd/processing.py:219-223), so out[0] = mean(-6,-4,0,2,4)
    // = -0.8 and out[1] = mean(-4,0,2,4,6) = 1.6; interior is exact.
    val ramp = Array.tabulate(30)(i => 2.0 * i)
    val y = Kernels.smooth(ramp, 5, "flat")
    assert(math.abs(y(0) - (-0.8)) < 1e-12)
    assert(math.abs(y(1) - 1.6) < 1e-12)
    assertArr(y.slice(2, 28), ramp.slice(2, 28), 1e-10)
  }

  test("smooth output length equals input length") {
    for (n <- Seq(12, 13, 50); wl <- Seq(3, 8, 11)) {
      val x = Array.tabulate(n)(i => math.sin(i * 0.3))
      assert(Kernels.smooth(x, wl, "hanning").length == n)
    }
  }

  test("interp matches np.interp incl. edge clamping") {
    val xp = Array(1.0, 2.0, 4.0)
    val fp = Array(10.0, 20.0, 40.0)
    assertArr(Interp.linear(Array(0.0, 1.0, 1.5, 3.0, 4.0, 9.0), xp, fp),
      Array(10.0, 10.0, 15.0, 30.0, 40.0, 40.0))
  }
}
