package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Relational (Catalyst-optimizable) cast operators.
 *
 * The reference (pyoceans/python-ctd) operates on a single pandas DataFrame
 * indexed by pressure; here a DataFrame holds MANY casts keyed by `castCol`,
 * totally ordered within a cast by `orderCol` (parse-time scan/line number —
 * row order is load-bearing in pandas but undefined in Spark, see SURVEY §7.4).
 *
 * Every operator is `DataFrame => DataFrame` and purely declarative where
 * possible so that predicate pushdown / column pruning / exchange reuse apply.
 * Genuinely sequential kernels (lp_filter, smooth, bindata-interpolate) live
 * in [[SeqOps]]; press_check turned out to be window-expressible (below).
 */
object Cast {

  /** Rows with `pressure < 0` are above the waterline — drop them.
    * Reference: ctd/processing.py:21-25 (`remove_above_water`). */
  def removeAboveWater(df: DataFrame, pressure: String = "pressure"): DataFrame =
    removeUpTo(df, 0.0, pressure)

  /** Drop rows with `pressure < idx`. Reference: ctd/processing.py:28-35. */
  def removeUpTo(df: DataFrame, idx: Double, pressure: String = "pressure"): DataFrame =
    df.filter(col(pressure) >= lit(idx))

  /**
   * Label each row `down` / `up`: the downcast is rows up to and including the
   * FIRST row (in scan order) attaining the cast's maximum pressure; the rest
   * is the upcast. Reference: ctd/processing.py:38-46 (`split`), which slices
   * `[0, argmax]` / `(argmax, end]` positionally.
   *
   * Relational form: one window over `castCol` — no sequential kernel needed.
   * The reference also REVERSES the upcast; in Spark row order is a sort
   * downstream, so we expose `direction` and leave ordering to the caller.
   */
  def split(df: DataFrame, castCol: String, orderCol: String,
            pressure: String = "pressure"): DataFrame = {
    val wOrd  = Window.partitionBy(castCol).orderBy(col(orderCol))
    val wAll  = Window.partitionBy(castCol)
    val rn    = row_number().over(wOrd)
    val pmax  = max(col(pressure)).over(wAll)
    // first row number attaining the max
    val argmax = min(when(col(pressure) === pmax, rn)).over(wAll)
    df.withColumn("__rn", rn)
      .withColumn("direction", when(col("__rn") <= argmax, lit("down")).otherwise(lit("up")))
      .drop("__rn")
  }

  /**
   * Average-bin `valueCols` into fixed-width pressure bins of width `delta`.
   *
   * Reference: ctd/processing.py:112-143 (`bindata(method="average")`):
   * `start = ceil(index[0])`, `end = floor(index[-1])`, bins are
   * RIGHT-CLOSED intervals `(start + k*delta, start + (k+1)*delta]`
   * (pandas `cut` default) labelled at `left + delta/2`, and EMPTY BINS ARE
   * KEPT as null rows (`observed=False`).
   *
   * `index[0]` / `index[-1]` = first/last value in scan order (down-casts are
   * ascending so these are min/max for them).
   *
   * Spark form: bin id via `ceil((p - start)/delta)` (right-closed), groupBy
   * (cast, bin) with map-side partial aggregation; the empty-bin spine is
   * `sequence()` + `explode` per cast, left-joined — broadcast-sized since it
   * is one row per bin.
   */
  def bindataAverage(df: DataFrame, castCol: String, orderCol: String,
                     valueCols: Seq[String], delta: Double = 1.0,
                     pressure: String = "pressure",
                     keepEmpty: Boolean = true): DataFrame = {
    // Per-cast first/last pressure (in scan order) as a partial-aggregable
    // groupBy + broadcast join — two scalars per cast don't justify a full
    // window sort over every sample row (VERDICT r1 "What's wrong" #5).
    val edges = df.groupBy(col(castCol)).agg(
      ceil(min_by(col(pressure), col(orderCol))).cast(DoubleType).as("__start"),
      floor(max_by(col(pressure), col(orderCol))).cast(DoubleType).as("__end"))
    val withEdges = df.join(broadcast(edges), Seq(castCol))
    // Reference edges = np.arange(start, stop, delta) (stop EXCLUSIVE), so
    // nbins = ceil((stop-start)/delta) - 1; values beyond the last edge fall
    // outside every bin. pd.cut is right-closed: x in (left, right] -> bin
    // k = ceil((x-start)/delta) - 1; x == start (leftmost edge) is dropped.
    val k = (ceil((col(pressure) - col("__start")) / lit(delta)) - lit(1)).cast("long")
    val nbins = (ceil((col("__end") - col("__start")) / lit(delta)) - lit(1)).cast("long")
    val binned = withEdges
      .withColumn("__k", k)
      .withColumn("__nbins", nbins)
      .filter(col(pressure) > col("__start") && col("__k") < col("__nbins"))
    val aggs = valueCols.map(c => avg(col(c)).as(c))
    val grouped = binned.groupBy(col(castCol), col("__start"), col("__k"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(pressure, col("__start") + (col("__k") + lit(0.5)) * lit(delta))
    val out =
      if (!keepEmpty) grouped
      else {
        // spine: one row per (cast, k) for k in [0, nbins) — pandas
        // observed=False keeps empty bins as null rows. Built from the
        // already-computed broadcast-sized `edges` (one row per cast);
        // re-aggregating the joined fact table cost a third full scan —
        // on the ctd source, a full re-parse of every cast file.
        val spine = edges
          .withColumn("__nb", (ceil((col("__end") - col("__start")) / lit(delta)) - lit(1)).cast("long"))
          .filter(col("__nb") > 0)
          .withColumn("__k", explode(sequence(lit(0L), col("__nb") - 1)))
          .withColumn(pressure, col("__start") + (col("__k") + lit(0.5)) * lit(delta))
          .select(col(castCol), col("__k"), col(pressure))
        spine.join(grouped.drop(pressure, "__start"), Seq(castCol, "__k"), "left")
      }
    out.drop("__k", "__start").select(castCol, (pressure +: valueCols): _*)
  }

  /**
   * Centered moving average with numpy `convolve(..., "same")` semantics:
   * ZERO-padded edges — the window sum near the boundary is divided by the
   * FULL window size `w`, damping edge values (do not "fix" silently,
   * SURVEY §7.4 item 5). Reference: ctd/processing.py:243-262.
   *
   * numpy 'same' alignment: output[i] = sum(x[i-(w-1)+(w-1)/2 .. i+(w-1)/2])/w
   * (integer division) — odd w: symmetric +/-(w-1)/2; even w: [i-w/2, i+w/2-1].
   * A null inside the window propagates (numpy NaN arithmetic), unlike Spark's
   * null-ignoring sum — guarded explicitly.
   */
  def movingAverage(df: DataFrame, castCol: String, orderCol: String,
                    valueCols: Seq[String], windowSize: Int = 48): DataFrame = {
    val hi = (windowSize - 1) / 2
    val lo = hi - (windowSize - 1)
    val w = Window.partitionBy(castCol).orderBy(col(orderCol)).rowsBetween(lo, hi)
    valueCols.foldLeft(df) { (d, c) =>
      val hasNull = count(lit(1)).over(w) > count(col(c)).over(w)
      d.withColumn(c,
        when(hasNull, lit(null).cast(DoubleType))
          .otherwise(coalesce(sum(col(c)).over(w), lit(0.0)) / lit(windowSize.toDouble)))
    }
  }

  /**
   * Seabird Wild Edit two-pass despike. Reference: ctd/processing.py:146-194.
   *
   * Pass 1: forward-looking rolling window of `block` rows; null-ignoring mean
   * and POPULATION std (numpy ma ddof=0 — hence `stddev_pop`, SURVEY §7.4
   * item 4); values `|x - mean| > n1*std` -> null.
   * Pass 2: recompute rolling stats on the CLEANED data; flag ORIGINAL values
   * beyond `n2*std` -> null in the output.
   *
   * Tail padding (processing.py:157-158): rows past the last full window reuse
   * the stats of the last full window (start row `n - block`, 0-based). We
   * reproduce that by computing per-row forward stats, then substituting the
   * stats of row `min(i, n-block)` via a self-equi-join-free window trick:
   * the stats at fixed row `n-block+1` (1-based) are spread with `max(when(...))`.
   *
   * Divergence: a cast SHORTER than `block` crashes the reference (negative
   * stride-tricks shape); here it degrades to partial-window stats.
   */
  def despike(df: DataFrame, castCol: String, orderCol: String,
              valueCols: Seq[String], n1: Double = 2.0, n2: Double = 20.0,
              block: Int = 100): DataFrame = {
    val wOrd  = Window.partitionBy(castCol).orderBy(col(orderCol))
    val wFwd  = wOrd.rowsBetween(Window.currentRow, block - 1)
    val wAll  = Window.partitionBy(castCol)
    def pass(d: DataFrame, c: String, srcCol: String, n: Double, outCol: String): DataFrame = {
      // per-row forward-window stats of column c
      val d1 = d
        .withColumn("__m", avg(col(c)).over(wFwd))
        .withColumn("__s", stddev_pop(col(c)).over(wFwd))
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
      // stats of the last FULL window start: rn0 = max(1, n - block + 1)
      val rn0 = greatest(lit(1), col("__n") - lit(block) + lit(1))
      val d2 = d1
        .withColumn("__mlast", max(when(col("__rn") === rn0, col("__m"))).over(wAll))
        .withColumn("__slast", max(when(col("__rn") === rn0, col("__s"))).over(wAll))
        .withColumn("__mu", when(col("__rn") > rn0, col("__mlast")).otherwise(col("__m")))
        .withColumn("__sd", when(col("__rn") > rn0, col("__slast")).otherwise(col("__s")))
      d2.withColumn(outCol,
          when(abs(col(srcCol) - col("__mu")) > lit(n) * col("__sd"), lit(null).cast(DoubleType))
            .otherwise(col(srcCol)))
        .drop("__m", "__s", "__rn", "__n", "__mlast", "__slast", "__mu", "__sd")
    }
    valueCols.foldLeft(df) { (d, c) =>
      val orig = s"__orig_$c"
      val p1   = s"__p1_$c"
      val d1 = d.withColumn(orig, col(c))
      // pass 1: stats of original, null outliers
      val d2 = pass(d1, c, c, n1, p1)
      // pass 2: stats of the CLEANED column (p1), flag ORIGINAL values,
      // writing the final result over c
      val d3 = pass(d2, p1, orig, n2, c)
      d3.drop(orig, p1)
    }
  }

  /**
   * Remove pressure reversals. Reference loop (ctd/processing.py:93-109): at
   * each inversion (`press[k+1] < press[k]`) set `ref = press[k]`; every
   * later row with `press < ref` has its DATA columns set to NaN (the
   * pressure index itself is kept).
   *
   * Closed form (equivalent because each inversion contributes its threshold
   * independently): row j is masked iff
   * `press[j] < max(press[k] : k < j, press[k+1] < press[k])` — a running
   * max over inversion starts. One window, no sequential kernel; null/NaN
   * pressures are never inversion starts and never masked (numpy NaN
   * comparison semantics, guarded explicitly since Spark orders NaN last).
   */
  def pressCheck(df: DataFrame, castCol: String, orderCol: String,
                 valueCols: Seq[String],
                 pressure: String = "pressure"): DataFrame = {
    val wOrd   = Window.partitionBy(castCol).orderBy(col(orderCol))
    val wPrev  = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val p      = col(pressure)
    val invRef = when(!isnan(p) && lead(p, 1).over(wOrd) < p, p)
    val runmax = max(invRef).over(wPrev)
    val mask   = coalesce(p < runmax, lit(false))
    val masked = df.withColumn("__pc_mask", mask)
    valueCols.foldLeft(masked) { (d, c) =>
      d.withColumn(c, when(col("__pc_mask"), lit(null)).otherwise(col(c)))
    }.drop("__pc_mask")
  }

  /**
   * pandas `.interpolate(method="index", limit_direction="both",
   * limit_area="inside")` — linear-in-pressure fill of nulls strictly BETWEEN
   * valid samples (both neighbors must exist). Reference: README.md:52-54.
   * Fully relational: previous/next non-null value+pressure via ignoreNulls
   * window scans, then the two-point interpolation expression.
   */
  def interpolateIndex(df: DataFrame, castCol: String, orderCol: String,
                       valueCols: Seq[String], pressure: String = "pressure"): DataFrame = {
    val wPrev = Window.partitionBy(castCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(castCol).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    valueCols.foldLeft(df) { (d, c) =>
      val pv = last(when(col(c).isNotNull, col(c)), ignoreNulls = true).over(wPrev)
      val pp = last(when(col(c).isNotNull, col(pressure)), ignoreNulls = true).over(wPrev)
      val nv = first(when(col(c).isNotNull, col(c)), ignoreNulls = true).over(wNext)
      val np = first(when(col(c).isNotNull, col(pressure)), ignoreNulls = true).over(wNext)
      val interp = pv + (nv - pv) * (col(pressure) - pp) / (np - pp)
      d.withColumn(c,
        when(col(c).isNotNull, col(c))
          .when(pv.isNotNull && nv.isNotNull,
            when(np === pp, pv).otherwise(interp))
          .otherwise(lit(null).cast(DoubleType)))
    }
  }

  /** Mixed-layer-depth mask: `ct[0] - ct < delta` against the cast's first
    * (shallowest, scan order) value. Reference: ctd/extras.py:282-290. */
  def mixedLayerMask(df: DataFrame, castCol: String, orderCol: String,
                     ct: String, delta: Double = 0.5): DataFrame = {
    val w = Window.partitionBy(castCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("mld_mask", (first(col(ct)).over(w) - col(ct)) < lit(delta))
  }

  /** Max pressure at which each value column is non-null, per cast.
    * Reference: ctd/extras.py:36-39 (`get_maxdepth`).
    *
    * Intentional divergence from the reference, which multiplies the index
    * by the validity mask: there an all-null column yields 0.0 (not
    * null/NaN) and negative pressures clamp toward 0 because invalid rows
    * contribute literal zeros to the max. Here an all-null column yields
    * null and only valid rows participate — the SQL-native semantics. */
  def maxDepth(df: DataFrame, castCol: String, valueCols: Seq[String],
               pressure: String = "pressure"): DataFrame = {
    val aggs = valueCols.map(c => max(when(col(c).isNotNull, col(pressure))).as(c))
    df.groupBy(col(castCol)).agg(aggs.head, aggs.tail: _*)
  }
}

/** pandas-flavor-style fluent API (reference registers ops as DataFrame
  * methods via pandas_flavor, ctd/processing.py:21-22): Scala equivalent is
  * an implicit extension class. */
object implicits {
  implicit class CastDataFrameOps(val df: DataFrame) extends AnyVal {
    def removeAboveWater(pressure: String = "pressure"): DataFrame =
      Cast.removeAboveWater(df, pressure)
    def removeUpTo(idx: Double, pressure: String = "pressure"): DataFrame =
      Cast.removeUpTo(df, idx, pressure)
    def splitCast(castCol: String = "cast_id", orderCol: String = "scan_order",
                  pressure: String = "pressure"): DataFrame =
      Cast.split(df, castCol, orderCol, pressure)
    def bindata(valueCols: Seq[String], delta: Double = 1.0,
                castCol: String = "cast_id", orderCol: String = "scan_order",
                pressure: String = "pressure", keepEmpty: Boolean = true): DataFrame =
      Cast.bindataAverage(df, castCol, orderCol, valueCols, delta, pressure, keepEmpty)
    def movingAverage(valueCols: Seq[String], windowSize: Int = 48,
                      castCol: String = "cast_id", orderCol: String = "scan_order"): DataFrame =
      Cast.movingAverage(df, castCol, orderCol, valueCols, windowSize)
    def despike(valueCols: Seq[String], n1: Double = 2.0, n2: Double = 20.0,
                block: Int = 100, castCol: String = "cast_id",
                orderCol: String = "scan_order"): DataFrame =
      Cast.despike(df, castCol, orderCol, valueCols, n1, n2, block)
    def interpolateIndex(valueCols: Seq[String], castCol: String = "cast_id",
                         orderCol: String = "scan_order",
                         pressure: String = "pressure"): DataFrame =
      Cast.interpolateIndex(df, castCol, orderCol, valueCols, pressure)
    def pressCheck(valueCols: Seq[String], castCol: String = "cast_id",
                   orderCol: String = "scan_order",
                   pressure: String = "pressure"): DataFrame =
      Cast.pressCheck(df, castCol, orderCol, valueCols, pressure)
    def lpFilter(castCol: String = "cast_id", orderCol: String = "scan_order",
                 pressure: String = "pressure", sampleRate: Double = 24.0,
                 timeConstant: Double = 0.15): DataFrame =
      SeqOps.lpFilter(df, castCol, orderCol, pressure, sampleRate, timeConstant)
    def smoothCast(valueCols: Seq[String], windowLen: Int = 11,
                   window: String = "hanning", castCol: String = "cast_id",
                   orderCol: String = "scan_order"): DataFrame =
      SeqOps.smooth(df, castCol, orderCol, valueCols, windowLen, window)
    def bindataInterpolate(valueCols: Seq[String], delta: Double = 1.0,
                           castCol: String = "cast_id",
                           orderCol: String = "scan_order",
                           pressure: String = "pressure"): DataFrame =
      SeqOps.bindataInterpolate(df, castCol, orderCol, valueCols, delta, pressure)
    def mixedLayerMask(ct: String, delta: Double = 0.5,
                       castCol: String = "cast_id",
                       orderCol: String = "scan_order"): DataFrame =
      Cast.mixedLayerMask(df, castCol, orderCol, ct, delta)
    def maxDepth(valueCols: Seq[String], castCol: String = "cast_id",
                 pressure: String = "pressure"): DataFrame =
      Cast.maxDepth(df, castCol, valueCols, pressure)
  }
}
