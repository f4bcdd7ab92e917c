package graft.dsp

/**
 * numpy window kernels and `np.convolve(..., "same")`, used by the
 * reference's `smooth` (ctd/processing.py:197-229) and `movingaverage`
 * (ctd/processing.py:243-246).
 */
object Kernels {

  /** np.hanning(m): 0.5 - 0.5*cos(2*pi*i/(m-1)); m==1 -> [1]. */
  def hanning(m: Int): Array[Double] =
    if (m == 1) Array(1.0)
    else Array.tabulate(m)(i => 0.5 - 0.5 * math.cos(2.0 * math.Pi * i / (m - 1)))

  /** np.hamming(m): 0.54 - 0.46*cos(2*pi*i/(m-1)). */
  def hamming(m: Int): Array[Double] =
    if (m == 1) Array(1.0)
    else Array.tabulate(m)(i => 0.54 - 0.46 * math.cos(2.0 * math.Pi * i / (m - 1)))

  /** np.bartlett(m): triangular, 2i/(m-1) rising then falling. */
  def bartlett(m: Int): Array[Double] =
    if (m == 1) Array(1.0)
    else Array.tabulate(m) { i =>
      val x = 2.0 * i / (m - 1)
      if (x <= 1.0) x else 2.0 - x
    }

  /** np.blackman(m): 0.42 - 0.5*cos(2*pi*i/(m-1)) + 0.08*cos(4*pi*i/(m-1)). */
  def blackman(m: Int): Array[Double] =
    if (m == 1) Array(1.0)
    else Array.tabulate(m) { i =>
      val t = 2.0 * math.Pi * i / (m - 1)
      0.42 - 0.5 * math.cos(t) + 0.08 * math.cos(2.0 * t)
    }

  def flat(m: Int): Array[Double] = Array.fill(m)(1.0)

  def byName(window: String, m: Int): Array[Double] = window match {
    case "flat"     => flat(m)
    case "hanning"  => hanning(m)
    case "hamming"  => hamming(m)
    case "bartlett" => bartlett(m)
    case "blackman" => blackman(m)
    case other =>
      throw new IllegalArgumentException(
        s"window must be one of 'flat', 'hanning', 'hamming', 'bartlett', 'blackman'; got $other")
  }

  /** np.convolve(x, w, "same"): full linear convolution cropped to
    * max(len(x), len(w)) centered — start offset (min(len)-1)/2.
    * Zero-padded edges (NOT rescaled), matching numpy exactly. */
  def convolveSame(x: Array[Double], w: Array[Double]): Array[Double] = {
    val n = x.length; val m = w.length
    val outLen = math.max(n, m)
    val start  = (math.min(n, m) - 1) / 2
    val out    = new Array[Double](outLen)
    var k = 0
    while (k < outLen) {
      val kk = k + start
      var s  = 0.0
      // full[kk] = sum_j x(j) * w(kk - j)
      var j = math.max(0, kk - m + 1)
      val jEnd = math.min(n - 1, kk)
      while (j <= jEnd) { s += x(j) * w(kk - j); j += 1 }
      out(k) = s
      k += 1
    }
    out
  }

  /**
   * The reference's `_smooth` (ctd/processing.py:197-229): mirror-extend by
   * `2*x0 - x[wl..2]` on the left and `2*x_last - x[n-1-k], k=0..wl-2` on the
   * right (the right extension INCLUDES the endpoint itself — reference
   * off-by-one replicated verbatim), convolve with the normalized kernel in
   * "same" mode, crop `[wl-1, len-wl+1)`. window_len < 3 -> identity.
   */
  def smooth(x: Array[Double], windowLen: Int, window: String): Array[Double] = {
    val n = x.length
    if (windowLen < 3 || n == 0) return x.clone()
    val wl  = windowLen
    val ext = new Array[Double](n + 2 * (wl - 1))
    var i = 0
    // left: data[window_len:1:-1] = indices wl, wl-1, ..., 2  (clamped for tiny n)
    while (i < wl - 1) { ext(i) = 2.0 * x(0) - x(math.min(n - 1, wl - i)); i += 1 }
    System.arraycopy(x, 0, ext, wl - 1, n)
    i = 0
    // right: data[-1:-window_len:-1] = indices n-1, n-2, ..., n-wl+1
    while (i < wl - 1) { ext(wl - 1 + n + i) = 2.0 * x(n - 1) - x(math.max(0, n - 1 - i)); i += 1 }
    val w   = byName(window, wl)
    val sum = w.sum
    val wn  = w.map(_ / sum)
    val conv = convolveSame(ext, wn)
    conv.slice(wl - 1, conv.length - wl + 1)
  }
}
