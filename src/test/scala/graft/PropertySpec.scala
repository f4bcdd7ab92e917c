package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.dsp.{FiltFilt, Butterworth, Interp, Kernels}
import graft.io.CastHeader

/** Property-based invariants for the pure kernels and parsers. */
class PropertySpec extends AnyFunSuite {

  /** Minimal ScalaCheck runner (scalatestplus bridge not in offline cache). */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAllNoShrink(g) { a => f(a); true })
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAllNoShrink(g1, g2) { (a: A, b: B) => f(a, b); true })
  private def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAllNoShrink(g1, g2, g3) { (a: A, b: B, c: C) => f(a, b, c); true })
  private def forAll[A, B, C, D](g1: Gen[A], g2: Gen[B], g3: Gen[C], g4: Gen[D])(f: (A, B, C, D) => Unit): Unit =
    check(Prop.forAllNoShrink(g1, g2, g3, g4) { (a: A, b: B, c: C, d: D) => f(a, b, c, d); true })
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val series: Gen[Array[Double]] =
    Gen.chooseNum(12, 200).flatMap(n =>
      Gen.containerOfN[Array, Double](n, Gen.chooseNum(-1e3, 1e3)))

  test("filtfilt output is finite, length-preserving, bounded by input range + margin") {
    val (b, a) = Butterworth.butter2LowPass(0.2)
    forAll(series) { x =>
      val y = FiltFilt.filtfilt(b, a, x)
      assert(y.length == x.length)
      assert(y.forall(java.lang.Double.isFinite))
      val lo = x.min; val hi = x.max
      val margin = (hi - lo) * 2 + 1e-6 // odd-reflection padding can overshoot
      assert(y.forall(v => v >= lo - margin && v <= hi + margin))
    }
  }

  test("filtfilt is linear: filt(ax + c) == a*filt(x) + c") {
    val (b, a) = Butterworth.butter2LowPass(0.15)
    forAll(series, Gen.chooseNum(-5.0, 5.0), Gen.chooseNum(-100.0, 100.0)) {
      (x, k, c) =>
        val y1 = FiltFilt.filtfilt(b, a, x.map(v => k * v + c))
        val y2 = FiltFilt.filtfilt(b, a, x).map(v => k * v + c)
        y1.zip(y2).foreach { case (p, q) =>
          assert(math.abs(p - q) <= 1e-6 * (1 + math.abs(q)))
        }
    }
  }

  test("smooth preserves length and constants for every window kind") {
    val windows = Seq("flat", "hanning", "hamming", "bartlett", "blackman")
    forAll(Gen.chooseNum(5, 100), Gen.chooseNum(3, 15), Gen.oneOf(windows),
      Gen.chooseNum(-50.0, 50.0)) { (n, wl, w, c) =>
      whenever(n > wl) {
        val x = Array.fill(n)(c)
        val y = Kernels.smooth(x, wl, w)
        assert(y.length == n)
        y.foreach(v => assert(math.abs(v - c) < 1e-9))
      }
    }
  }

  test("interp is monotone-preserving and clamps to endpoint values") {
    forAll(Gen.chooseNum(2, 40)) { n =>
      val xs = Array.tabulate(n)(i => i * 2.0)
      val ys = Array.tabulate(n)(i => i * i * 1.0) // monotone increasing
      val q  = Array.tabulate(3 * n)(i => i * 0.7 - 2.0)
      val out = Interp.linear(q, xs, ys)
      out.zip(out.tail).foreach { case (a, b) => assert(a <= b + 1e-12) }
      assert(Interp.linear(Array(-100.0), xs, ys)(0) == ys(0))
      assert(Interp.linear(Array(1e9), xs, ys)(0) == ys(n - 1))
    }
  }

  test("renameDuplicates: output names unique; non-dups untouched") {
    val nameGen = Gen.oneOf("a", "b", "c", "d", "e", "f")
    forAll(Gen.listOfN(8, nameGen)) { names =>
      val v = names.toVector
      whenever(v.groupBy(identity).values.forall(_.size <= 2)) {
        val out = CastHeader.renameDuplicates(v)
        assert(out.size == v.size)
        assert(out.distinct.size == out.size)
        v.zip(out).foreach { case (orig, renamed) =>
          assert(renamed == orig || renamed == orig + "_")
        }
      }
    }
  }

  test("NMEA parse round-trip: degrees+minutes reconstructs within 1e-9") {
    forAll(Gen.chooseNum(0, 89), Gen.chooseNum(0.0, 59.99),
      Gen.oneOf('N', 'S')) { (deg, min, hemi) =>
      val parsed = CastHeader.nmeaDegrees(f"$deg $min%.4f", hemi).get
      val expected = (deg + BigDecimal(f"$min%.4f").toDouble / 60.0) *
        (if (hemi == 'S') -1 else 1)
      assert(math.abs(parsed - expected) < 1e-9)
    }
  }

  test("nfcNormalize kernel: idempotent, agrees with java.text.Normalizer, " +
       "ASCII identity") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.expressions.grafttext.GraftTextKernels
    // mix ASCII with combining marks, precomposed chars, compat singletons,
    // CJK, and surrogate-pair emoji
    val unicodeChar: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.oneOf("́", "̈", "é", "Å", "Å",
        "の", "水", "😀", "ẛ", "̣"))
    val strGen: Gen[String] =
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, unicodeChar)).map(_.mkString)
    forAll(strGen) { s =>
      val once = GraftTextKernels.nfcNormalize(UTF8String.fromString(s)).toString
      val ref = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(once == ref, s"kernel diverged from Normalizer on ${s.codePoints().toArray.toSeq}")
      val twice = GraftTextKernels.nfcNormalize(UTF8String.fromString(once)).toString
      assert(twice == once, "NFC must be idempotent")
    }
    // pure ASCII: zero-copy identity
    forAll(Gen.asciiPrintableStr) { s =>
      val u = UTF8String.fromString(s)
      assert(GraftTextKernels.nfcNormalize(u) eq u)
    }
  }

  test("audioFeatures: RMS bounded by peak amplitude, constant signal exact, " +
       "segment count honored") {
    import graft.ops.MultimodalOps
    val sig: Gen[Array[Double]] = Gen.chooseNum(1, 400).flatMap(n =>
      Gen.containerOfN[Array, Double](n, Gen.chooseNum(-1.0, 1.0)))
    forAll(sig, Gen.chooseNum(1, 8)) { (samples, dim) =>
      val f = MultimodalOps.audioFeatures(samples, dim)
      assert(f.length == dim)
      val peak = samples.map(math.abs).max
      assert(f.forall(v => v >= 0.0 && v <= peak + 1e-12))
    }
    // constant-amplitude signal: every non-empty segment's RMS == |amplitude|
    forAll(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(8, 64)) { (amp, n) =>
      val f = MultimodalOps.audioFeatures(Array.fill(n)(amp), 4)
      f.foreach(v => assert(math.abs(v - math.abs(amp)) < 1e-12))
    }
  }
}
