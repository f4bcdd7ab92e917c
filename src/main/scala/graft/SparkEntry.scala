package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Cast, DedupOps, MultimodalOps, SeqOps, SimOps, TextOps}
import graft.sources.CtdRead

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, each with DuckDB-equivalent `oracleSql` where the semantics
 * are ANSI-SQL-expressible (sequential kernels get rows-only checks).
 *
 * Numeric determinism policy (oracle is DuckDB on the same parquet):
 *  - exact-sum trick: per-row values are cast to DECIMAL before SUM so the
 *    aggregate is exact and engine-order-independent, then cast back to
 *    DOUBLE (both engines produce the identical nearest-double).
 *  - per-row arithmetic (interp, masks) is IEEE-deterministic — no rounding.
 *  - small-window aggregates round(6): assoc-order noise is ~1e-16 relative.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Instrument-file fixtures (copied verbatim from the reference's
    * tests/data); reader queries ignore the sf dir — file formats have no
    * parquet/DuckDB oracle, so they get rows-only checks here and exact
    * golden assertions in the ScalaTest suites. */
  private def fixtures: String =
    sys.env.getOrElse("GRAFT_FIXTURES", "/root/repo/src/test/resources/ctd-data")

  /** q181's anchored channel set: the continuously-varying sensor channels
    * of the 4-cast fixture, where the despike threshold is numerically
    * well-posed and engine/reference values are bit-identical (see the
    * q181 query comment for why the step-quantized channels are out). */
  private[graft] val qcChainChannels: Seq[String] = Seq(
    "c0S/m", "dz/dtM", "pla", "sbeox0Mm/Kg", "sbeox1Mm/Kg", "scan",
    "sva", "t090C", "t190C", "timeS", "tsa", "v5", "wetCDOM")

  /** The full §2.5 QC chain (ctd source → despike(2,20,100) →
    * pressCheck → split.down → bindataAverage(1.0)) over the four real
    * .cnv.gz casts, plus the despiked channel list — ONE builder shared
    * by q181 and q181b so the two anchors cannot diverge on the chain
    * itself. */
  private def qcChainBinned(s: SparkSession): (DataFrame, Seq[String]) = {
    val files = new java.io.File(s"$fixtures/CTD").listFiles()
      .filter(_.getName.endsWith(".cnv.gz")).map(_.getPath).sorted
    val base0 = s.read.format("ctd").option("ftype", "cnv")
      .load(files.toIndexedSeq: _*)
    // the engine types bpos as int and pumps/flag as boolean (intended
    // semantics, Parsers.scala:87); the reference's df.apply chain runs
    // them as float64 — cast them up so the anchor covers EVERY channel
    // the reference processes (booleans become exact 0.0/1.0, integer
    // sums are FP-exact, so the cast costs no fidelity)
    val keys = Set("pressure", "cast_id", "scan_order")
    val upCast = base0.schema.fields.collect {
      case f if !keys(f.name) &&
        (f.dataType == IntegerType || f.dataType == BooleanType) => f.name
    }.toSeq
    val base1 = upCast.foldLeft(base0)((df, c) =>
      df.withColumn(c, col(c).cast(DoubleType)))
    // flag wart-replay (anchor layer only, like the mask_bad replay): the
    // reference builds its frame from split STRINGS and `astype(bool)`
    // (read.py:427-435), so any present token — including the literal
    // "0.000e+00" every row of these casts carries — is truthy True, and
    // only short rows (None-padded trailing columns) read False. The
    // engine parses the VALUE (flag := token != 0, Parsers.scala:87); the
    // reference's behavior reduces to presence, which maps exactly onto
    // the engine's null-for-missing: non-null -> 1.0, null -> 0.0.
    val base =
      if (base1.columns.contains("flag"))
        base1.withColumn("flag",
          when(col("flag").isNotNull, lit(1.0)).otherwise(lit(0.0)))
      else base1
    val valueCols = base.schema.fields.collect {
      case f if f.dataType == DoubleType && f.name != "pressure" => f.name
    }.toSeq
    // refExact (r15): rolling stats in the reference's own numpy.ma
    // arithmetic, so the knife-edge |x-mean| = n*std flag decisions land
    // bit-for-bit where the reference landed them — this is what retires
    // the q181b flip list (0 excluded cells; gen_q181b_flips.py verifies)
    val d  = Cast.despike(base, "cast_id", "scan_order", valueCols,
      n1 = 2.0, n2 = 20.0, block = 100, refExact = true)
    val pc = Cast.pressCheck(d, "cast_id", "scan_order", valueCols)
    val dn = Cast.split(pc, "cast_id", "scan_order")
      .filter(col("direction") === "down")
    // edgesViaWindow: the despike kernel blocks column pruning, so the
    // default mode's separate edges aggregate would re-run parse+despike
    // wholesale (measured: 4.5 s of the chain's 9.2 s at r15); the window
    // mode derives the same edges from one upstream pass — bit-identical
    // output (KernelSpec parity pin; q181/q181b goldens unchanged)
    (Cast.bindataAverage(dn, "cast_id", "scan_order", valueCols,
      delta = 1.0, keepEmpty = true, edgesViaWindow = true), valueCols)
  }

  /** SUM(CAST(x AS DECIMAL(s))) back as the exact nearest double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)
  private def dsumWide(c: Column, scale: Int = 10): Column =
    sum(c.cast(DecimalType(28, scale))).cast(DoubleType)

  /** Flagship: metadata-style broadcast join + aggregation on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_join_enrich")(spark, "/root/testdata/sf0.001")

  /** q170's mixture weights; the integer strides derive ONCE here and feed
    * BOTH the query and its oracle (the shared-constants rule). */
  private val q170Weights: Map[String, Double] =
    Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)

  /** q174's blocklist; the compiled pattern derives ONCE
    * (TextOps.blocklistPattern) and feeds BOTH the query and its oracle. */
  private val q174Phrases: Seq[String] =
    Seq("slow scan", "big table", "merge batch")

  /** Shared q163/q173 two-sided-IVF oracle chain (derived cell count,
    * argmax cells, 4-way multi-probe ranks, rounded cosine, per-query
    * rank) — ONE builder parameterized by the probe-side filter, so the
    * two oracles cannot diverge on the fold / tie-breaks / derive
    * formula (the q163 cell-count fix would otherwise need manual
    * mirroring into q173). The ncells CTE mirrors
    * `SimOps.derivedCellsHier` (r15 lifted ceiling); the flat
    * assignment this replay performs is the engine's path for every
    * derived count <= FlatAssignMaxCells = 4096 — all oracle scales sit
    * on the 16-cell floor, far below the two-level switch. */
  private def ivfJoinOracleCtes(probeWhere: String): String =
    s"""WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      |), ncells AS (
      |  SELECT least(1048576, greatest(16,
      |    CAST(ceil(count(*) / 128.0) AS BIGINT))) AS k
      |  FROM e
      |), c AS (
      |  SELECT vec_id AS cent_id, v AS cv FROM e
      |  WHERE vec_id < (SELECT k FROM ncells)
      |), assign AS (
      |  SELECT e.vec_id, e.v, c.cent_id,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      CASE WHEN sqrt(list_inner_product(e.v, e.v))
      |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
      |        THEN list_inner_product(e.v, c.cv)
      |             / (sqrt(list_inner_product(e.v, e.v))
      |                * sqrt(list_inner_product(c.cv, c.cv)))
      |        ELSE 0.0 END DESC, c.cent_id) AS rn
      |  FROM e CROSS JOIN c
      |), cell AS (
      |  SELECT vec_id, v, cent_id AS cl FROM assign WHERE rn = 1
      |), probes AS (
      |  SELECT q.vec_id + 1000000 AS query_id, q.v AS qv,
      |    c.cent_id AS cl,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |      CASE WHEN sqrt(list_inner_product(q.v, q.v))
      |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
      |        THEN list_inner_product(q.v, c.cv)
      |             / (sqrt(list_inner_product(q.v, q.v))
      |                * sqrt(list_inner_product(c.cv, c.cv)))
      |        ELSE 0.0 END DESC, c.cent_id) AS prn
      |  FROM e q CROSS JOIN c
      |  $probeWhere
      |), scored AS (
      |  SELECT p.query_id, ce.vec_id AS neighbor_id,
      |    round(CASE WHEN sqrt(list_inner_product(p.qv, p.qv))
      |                    * sqrt(list_inner_product(ce.v, ce.v)) > 0
      |      THEN list_inner_product(p.qv, ce.v)
      |           / (sqrt(list_inner_product(p.qv, p.qv))
      |              * sqrt(list_inner_product(ce.v, ce.v)))
      |      ELSE 0.0 END, 6) AS cos_sim
      |  FROM probes p JOIN cell ce ON ce.cl = p.cl
      |  WHERE p.prn <= 4 AND ce.vec_id <> p.query_id
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos_sim DESC, neighbor_id) AS rank
      |  FROM scored
      |)""".stripMargin
  private lazy val q170Strides: Seq[(String, Long)] =
    graft.ops.SampleOps.interleaveStrides(q170Weights)

  /** Shared CTE chain of the q166/q171 UniMax oracles: per-language char
    * counts, budget = 1.4x total, 2-epoch caps, the capped-prefix closed
    * form, floor split + remainder -> `alloc (lang, n_tokens, cap_tokens,
    * is_capped, budget_tokens)`. One chain feeds both oracles so the two
    * queries pin the same allocation. */
  private val unimaxCtes: String =
    """counts AS (
      |  SELECT lang, CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang
      |), params AS (
      |  SELECT CAST((SUM(n_tokens) * 14) // 10 AS BIGINT) AS b FROM counts
      |), pos AS (
      |  SELECT lang, n_tokens,
      |    CAST((n_tokens // 1000000) * 2000000
      |      + ((n_tokens % 1000000) * 2000000) // 1000000 AS BIGINT) AS cap_tokens
      |  FROM counts WHERE n_tokens > 0
      |), ranked AS (
      |  SELECT lang, n_tokens, cap_tokens,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cap_tokens, lang) AS BIGINT) AS i,
      |    CAST(COALESCE(SUM(cap_tokens) OVER (ORDER BY cap_tokens, lang
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS ng
      |  FROM pos
      |), flagged AS (
      |  SELECT r.*, (r.cap_tokens * (r.ng - r.i + 1) + r.pre <= p.b) AS is_capped, p.b AS b
      |  FROM ranked r CROSS JOIN params p
      |), uranked AS (
      |  SELECT *, CAST(SUM(CASE WHEN is_capped THEN 0 ELSE 1 END) OVER
      |    (ORDER BY cap_tokens, lang
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ur
      |  FROM flagged
      |), stats AS (
      |  SELECT CAST(COALESCE(SUM(CASE WHEN is_capped THEN cap_tokens END), 0) AS BIGINT) AS capped_sum,
      |         CAST(SUM(CASE WHEN is_capped THEN 0 ELSE 1 END) AS BIGINT) AS k
      |  FROM uranked
      |), alloc AS (
      |  SELECT u.lang, u.n_tokens, u.cap_tokens, u.is_capped,
      |    CAST(CASE WHEN u.is_capped THEN u.cap_tokens
      |      ELSE (u.b - s.capped_sum) // s.k
      |        + (CASE WHEN u.ur <= (u.b - s.capped_sum) % s.k THEN 1 ELSE 0 END)
      |      END AS BIGINT) AS budget_tokens
      |  FROM uranked u CROSS JOIN stats s
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- relational core --------------------------------------------------
    "q01_tpch_q1" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q02_remove_up_to" -> ((s: SparkSession, dir: String) => {
      Cast.removeUpTo(t(s, dir, "events"), 5.0, "value")
        .select(col("event_id"), col("value"))
        .orderBy(col("event_id"))
    }),

    "q03_remove_above_water" -> ((s: SparkSession, dir: String) => {
      // signal centered at 100 so the waterline filter is non-trivial
      val ev = t(s, dir, "events").withColumn("pressure", col("value") - lit(100.0))
      Cast.removeAboveWater(ev, "pressure")
        .select(col("event_id"), col("pressure"))
        .orderBy(col("event_id"))
    }),

    "q04_join_enrich" -> ((s: SparkSession, dir: String) => {
      // samples ⋈ broadcast(metadata): revenue per nation
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders")
      val c  = t(s, dir, "customer")
      val n  = t(s, dir, "nation")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsumWide(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),

    "q05_topk" -> ((s: SparkSession, dir: String) => {
      val o = t(s, dir, "orders")
      o.groupBy(col("o_custkey"))
        .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("o_custkey"))
        .limit(10)
    }),

    "q06_bindata_avg" -> ((s: SparkSession, dir: String) => {
      val li = t(s, dir, "lineitem")
        .withColumn("ord", col("l_orderkey") * 8 + col("l_linenumber"))
        .withColumn("price", col("l_extendedprice"))
      Cast.bindataAverage(li, "l_returnflag", "ord", Seq("price"),
          delta = 5.0, pressure = "l_quantity", keepEmpty = true)
        .select(col("l_returnflag").as("flag"), col("l_quantity").as("qty_bin"),
          round(col("price"), 6).as("avg_price"))
        .orderBy(col("flag"), col("qty_bin"))
    }),

    "q07_split" -> ((s: SparkSession, dir: String) => {
      Cast.split(t(s, dir, "events"), "user_id", "event_id", "value")
        .select(col("user_id"), col("event_id"), col("direction"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q08_moving_average" -> ((s: SparkSession, dir: String) => {
      Cast.movingAverage(t(s, dir, "events"), "user_id", "event_id", Seq("value"), 5)
        .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value_ma"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q09_despike" -> ((s: SparkSession, dir: String) => {
      // prune BEFORE the kernel: flatMapGroups is opaque to Catalyst, so
      // unused columns (props is a fat string) would ride the shuffle and
      // the external-Row encode — measured 0.74 s vs 1.1 s at 10x sf0.1
      Cast.despike(t(s, dir, "events")
            .select(col("user_id"), col("event_id"), col("value")),
          "user_id", "event_id", Seq("value"),
          n1 = 2.0, n2 = 20.0, block = 16)
        .select(col("user_id"), col("event_id"), col("value").as("value_despiked"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q10_interpolate" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .withColumn("pressure", col("event_id").cast(DoubleType))
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null).cast(DoubleType)).otherwise(col("value")))
      Cast.interpolateIndex(ev, "user_id", "event_id", Seq("value"), "pressure")
        .select(col("user_id"), col("event_id"), col("value").as("value_interp"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q11_mld_mask" -> ((s: SparkSession, dir: String) => {
      Cast.mixedLayerMask(t(s, dir, "events"), "user_id", "event_id", "value", 0.5)
        .select(col("user_id"), col("event_id"), col("mld_mask"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q12_dedup_exact" -> ((s: SparkSession, dir: String) => {
      // digest-keyed (32-byte shuffle keys, never the document body)
      DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q13_token_count" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit("[A-Za-z0-9]+")).cast(LongType).as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q14_maxdepth" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .withColumn("pressure", col("event_id").cast(DoubleType))
        .withColumn("value",
          when(col("event_id") % 7 === 0, lit(null).cast(DoubleType)).otherwise(col("value")))
      Cast.maxDepth(ev, "user_id", Seq("value"), "pressure")
        .select(col("user_id"), col("value").as("max_valid_depth"))
        .orderBy(col("user_id"))
    }),

    "q15_rosette_summary" -> ((s: SparkSession, dir: String) => {
      // groupBy(nbf).mean() analog (ctd/read.py:540-545 doctest)
      t(s, dir, "lineitem")
        .groupBy(col("l_linenumber"))
        .agg(
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_linenumber"))
    }),

    // ---- instrument-file readers (DataSourceV2, rows-only checks) ---------
    "q16_cnv_read" -> ((s: SparkSession, _: String) => {
      CtdRead.cnv(s, s"$fixtures/CTD_with_sigma_e00.cnv")
        .select(col("cast_id"), col("scan_order"), col("pressure"),
          round(col("t068C"), 4).as("t068C"), round(col("sal00"), 4).as("sal00"))
        .orderBy(col("cast_id"), col("scan_order"))
    }),

    "q17_casts_meta" -> ((s: SparkSession, _: String) => {
      CtdRead.casts(s, "cnv", s"$fixtures/CTD_with_sigma_e00.cnv")
        .unionByName(CtdRead.casts(s, "ros", s"$fixtures/CTD/g01l01s01.ros"))
        .select(col("cast_id"), round(col("lat"), 7).as("lat"),
          round(col("lon"), 7).as("lon"), col("prkey"), col("n_rows"))
        .orderBy(col("cast_id"))
    }),

    "q18_rosette_golden" -> ((s: SparkSession, _: String) => {
      // the reference doctest vector [835, 806, ..., 1] (ctd/read.py:540-545)
      CtdRead.rosetteSummary(s, s"$fixtures/CTD/g01l01s01.ros")
        .groupBy(col("nbf"))
        .agg(avg(col("pressure")).cast("int").as("mean_pressure_int"))
        .orderBy(col("nbf"))
    }),

    "q19_btl_read" -> ((s: SparkSession, _: String) => {
      CtdRead.btl(s, s"$fixtures/btl/bottletest.btl")
        .select(col("Bottle"), col("Statistic"), col("Date"),
          round(col("Sal00"), 4).as("sal00"))
        .orderBy(col("Bottle"), col("Statistic"))
    }),

    "q20_multiformat_read" -> ((s: SparkSession, _: String) => {
      // every remaining format through the same DSv2 (edf/fsi/bl/castaway)
      val edf = CtdRead.edf(s, s"$fixtures/XBT.EDF.zip")
        .agg(count(lit(1)).as("n")).withColumn("fmt", lit("edf"))
      val fsi = CtdRead.fsi(s, s"$fixtures/FSI.txt.gz")
        .agg(count(lit(1)).as("n")).withColumn("fmt", lit("fsi"))
      val bl = CtdRead.bl(s, s"$fixtures/bl/bottletest.bl")
        .agg(count(lit(1)).as("n")).withColumn("fmt", lit("bl"))
      val ca = CtdRead.castawayCsv(s, s"$fixtures/castaway_data.csv")
        .agg(count(lit(1)).as("n")).withColumn("fmt", lit("castaway"))
      edf.unionByName(fsi).unionByName(bl).unionByName(ca)
        .select(col("fmt"), col("n")).orderBy(col("fmt"))
    }),

    // ---- order-dependent kernels over the events table --------------------
    "q21_press_check" -> ((s: SparkSession, dir: String) => {
      // value plays the pressure index; props is the data column masked at
      // reversals. Exact float compares only — engine-deterministic.
      Cast.pressCheck(t(s, dir, "events"), "user_id", "event_id",
          valueCols = Seq("props"), pressure = "value")
        .select(col("user_id"), col("event_id"), col("props").as("props_checked"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q22_lp_filter" -> ((s: SparkSession, dir: String) => {
      // Sequential IIR; the oracle replays the identical direct-form-II
      // recurrence as a recursive CTE (OracleSqlGen.lpFilterSql); numeric
      // fidelity additionally pinned by the SBE golden-file test.
      SeqOps.lpFilter(t(s, dir, "events"), "user_id", "event_id",
          pressure = "value")
        .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value_lp"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q23_smooth" -> ((s: SparkSession, dir: String) => {
      SeqOps.smooth(t(s, dir, "events"), "user_id", "event_id",
          valueCols = Seq("value"), windowLen = 11, window = "hanning")
        .select(col("user_id"), col("event_id"), round(col("value"), 6).as("value_smooth"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q24_bindata_interp" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .withColumn("pressure", col("event_id").cast(DoubleType))
      // unrounded: the per-row interpolation arithmetic is bit-identical
      // across engines, while round(6) would split on exact-half values
      // (Spark HALF_UP vs DuckDB half-even)
      SeqOps.bindataInterpolate(ev, "user_id", "event_id",
          valueCols = Seq("value"), delta = 100.0)
        .select(col("user_id"), col("pressure"), col("value").as("value_interp"))
        .orderBy(col("user_id"), col("pressure"))
    }),

    // ---- training-data pipeline ops ---------------------------------------
    "q25_near_dup_pairs" -> ((s: SparkSession, dir: String) => {
      // corpus + perturbed copies of the first 50 docs (guaranteed near-dups)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.nearDuplicatePairs(d.unionByName(perturbed), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q26_near_dedup" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.nearDedup(d.unionByName(perturbed), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q48_near_dedup_cc" -> ((s: SparkSession, dir: String) => {
      // connected-components near-dedup (the exact-semantics opt-in): keep
      // the minimum id per component of the near-dup pair graph; the oracle
      // replays the component closure with a recursive CTE
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.nearDedupConnected(d.unionByName(perturbed), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q27_simhash" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
        .withColumn("sh", DedupOps.simHash64(TextOps.tokens(col("text"))))
      val a = d.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      val b = d.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"),
          DedupOps.hamming64(col("sh_a"), col("sh_b")).cast(LongType).as("hamming"))
        .orderBy(col("id_a"))
    }),

    "q28_ngram_jaccard" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val pairs = d.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
        .filter(col("id_b") < 500)
      DedupOps.jaccardForPairs(d, pairs, "doc_id", "text", shingleSize = 3)
        .orderBy(col("id_a"))
    }),

    "q29_ann_cosine" -> ((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      SimOps.cosineTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q30_ann_lsh" -> ((s: SparkSession, dir: String) => {
      val e = t(s, dir, "embeddings")
      SimOps.lshCosineTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nPlanes = 6)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q63_ann_lsh_banded" -> ((s: SparkSession, dir: String) => {
      // the multi-band top-k scale path, oracle-verified like q59: union
      // of per-band collisions, ids-only candidates, vectors join back
      val e = t(s, dir, "embeddings")
      SimOps.lshCosineTopK(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          k = 5, nPlanes = 6, bands = 3)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q42_ann_ivf" -> ((s: SparkSession, dir: String) => {
      // IVF scale path: 16-cell coarse quantizer, 4 probes per query
      val e = t(s, dir, "embeddings")
      SimOps.ivfTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q76_ann_ivf_indexed" -> ((s: SparkSession, dir: String) => {
      // q42's steady-state shape: codebook + cell assignments persist as a
      // cell-partitioned index (land-once per session) and each query batch
      // reads only its probed cells. Same oracle as q42 — the index path
      // must be row-identical to the direct path.
      val idx = "graft_q76_" + math.abs(dir.hashCode).toString
      val e = t(s, dir, "embeddings")
      SimOps.landAnnIndex(e, "vec_id", "embedding", idx, nCells = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      SimOps.annTopKAgainstIndex(e.filter(col("vec_id") < 5), "vec_id",
          "embedding", idx, k = 5, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q163_ann_join" -> ((s: SparkSession, dir: String) => {
      // the TWO-SIDED IVF join: the whole (offset-id) corpus queries the
      // corpus — neither side broadcasts; probe cells come from the
      // map-side multi-probe kernel, the only big op is one cell-key
      // equi-join. Every query's identical twin must surface at rank 1.
      // nCells DERIVES from the corpus (derivedCellsHier: clamp
      // (ceil(n/128), 16, 2^20), two-level assignment past 4096 cells):
      // with both sides corpus-scale a fixed cell count is quadratic —
      // the 10x rerun measured 137x wall at fixed 16 cells vs 7.1x
      // derived; at every test sf the derived value IS 16 (clamp floor)
      val e = t(s, dir, "embeddings")
      val q = e.select((col("vec_id") + 1000000).as("vec_id"),
        col("embedding"))
      SimOps.ivfJoinTopK(q, e, "vec_id", "embedding", k = 3, nCells = 0,
          nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q177_ann_recall_ivf" -> ((s: SparkSession, dir: String) => {
      // the retrieval-QUALITY contract the plan-shape specs cannot pin:
      // recall@10 of the IVF path (16 cells, 4 probes) against exact
      // brute-force top-10 over the seeded 200-query sample — per-query
      // intersection counts are exact integers (hash-verified), and the
      // aggregate floor is required loudly at build time.
      // r15: the codebook is TRAINED with the q128 integer-exact Lloyd
      // recurrence (5 iterations, scale 1000) instead of the 16 lowest-id
      // seed vectors — measured recall ~0.56-0.60 vs the seed codebook's
      // ~0.48-0.50 at the SAME nProbe, and still bit-replayable by the
      // DuckDB oracle (annRecallIvfTrainedSql unrolls the iterations)
      val e = t(s, dir, "embeddings")
      val qs = annRecallQueries(e)
      annRecallHits(qs,
        SimOps.cosineTopK(e, qs, "vec_id", "embedding", k = 10),
        SimOps.ivfTopK(e, qs, "vec_id", "embedding", k = 10,
          nCells = 16, nProbe = 4, intLloydIters = 5),
        k = 10, floorPpm = annRecallFloorPpm("ivf"))
    }),

    "q178_ann_recall_lsh" -> ((s: SparkSession, dir: String) => {
      // recall@10 of the banded-LSH path (8 bands x 4 planes — the same
      // pair the DuckDB oracle embeds) against exact top-10 — same seeded
      // sample and floor contract as q177
      val e = t(s, dir, "embeddings")
      val qs = annRecallQueries(e)
      annRecallHits(qs,
        SimOps.cosineTopK(e, qs, "vec_id", "embedding", k = 10),
        SimOps.lshCosineTopK(e, qs, "vec_id", "embedding", k = 10,
          nPlanes = 4, bands = 8),
        k = 10, floorPpm = annRecallFloorPpm("lsh"))
    }),

    "q179_ann_recall_projected" -> ((s: SparkSession, dir: String) => {
      // recall@10 of the OPERATIONAL projection pattern — shortlist 50 in
      // the 32-dim projected space, exact-rerank in the original 64-dim
      // space — against brute-force top-10. Measures the shortlist's
      // quality alone (ranking the survivors is exact), which is how a
      // projected index is actually served; raw top-10-in-projected-space
      // recall is noise-bound on isotropic embeddings and not a contract
      // anyone deploys
      val e = t(s, dir, "embeddings")
      val qs = annRecallQueries(e)
      val m = SimOps.projectionMatrix(outDim = 32, dim = 64)
      val proj = e.select(col("vec_id"),
        SimOps.randomProject(col("embedding"), m).as("embedding"))
      val qsP = proj.join(qs.select(col("vec_id")), Seq("vec_id"))
      // the shortlist DERIVES from corpus size (the q163 candidate-
      // bounding rule, recall-flavored: a fixed 50 of a 10x corpus
      // measured 18% — under the floor — because the noise band holds
      // more competitors as n grows; clamp(ceil(n/40), 50, 4096) keeps
      // the shortlist a ~2.5% corpus slice, floor at the test sfs)
      val shortK = SimOps.derivedShortlist(e.count())
      val shortlist = SimOps.cosineTopK(proj, qsP, "vec_id", "embedding",
        k = shortK)
      annRecallHits(qs,
        SimOps.cosineTopK(e, qs, "vec_id", "embedding", k = 10),
        SimOps.rerankTopK(shortlist, e, qs, "vec_id", "embedding", k = 10),
        k = 10, floorPpm = annRecallFloorPpm("projected"))
    }),

    "q77_hamming_near_dup" -> ((s: SparkSession, dir: String) => {
      // batch banded Hamming dedup over a 64-bit sketch — the operator
      // behind image near-dup (dHash) and batch SimHash dedup; oracle-able
      // through the SimHash sketch family (q27's bit-exact md5 votes).
      // Corpus + perturbed copies of the first 50 docs: a tail-token edit
      // moves few token votes, so the planted pairs land within the
      // pigeonhole radius
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      val sk = d.unionByName(perturbed)
        .filter(size(TextOps.tokens(col("text"))) > 0)
        .withColumn("sketch", DedupOps.simHash64(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("sketch"))
      DedupOps.hammingNearDupPairs(sk, "doc_id", "sketch",
          bands = 4, radius = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q79_semantic_pairs" -> ((s: SparkSession, dir: String) => {
      // SemDeDup-style semantic pairs: IVF cells partition the candidate
      // space, within-cell cosine >= 0.9 survives. Planted exact copies of
      // the first 20 vectors (q40's setup) assign to their original's cell
      // (identical vector, identical argmax), so they MUST pair at cos = 1
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      // nCells <= 0: clamp(ceil(n/128), 16, 2^20) cells (derivedCellsHier,
      // two-level assignment past 4096) — the linear-candidates scale
      // default (fixed 16 cells measured 35x at 10x data); the oracle
      // embeds the same formula as a subquery
      SimOps.semanticDedupPairs(e.unionByName(dups), "vec_id", "embedding",
          threshold = 0.9, nCells = 0)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q85_ngram_lm_indexed" -> ((s: SparkSession, dir: String) => {
      // q83's steady-state shape: the reference LM lands once as bucketed
      // tables; scoring reads counts instead of re-training. Same oracle
      // as q83 — the landed path must be row-identical to the direct path.
      val idx = "graft_q85_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      TextOps.landNgramLm(d.filter(col("doc_id") % 10 =!= 0), "text", idx,
        n = 3, path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      TextOps.ngramLogProbScoreIndexed(d.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", idx)
        .orderBy(col("doc_id"))
    }),

    "q86_bpe_tokenize" -> ((s: SparkSession, dir: String) => {
      // in-engine tokenizer training: 200 BPE merges learned from the 90%
      // reference slice, subword counts for every document at scan speed.
      // No DuckDB oracle (the merge loop is iterative, not SQL-expressible;
      // the hand-derived-merge ScalaTest pins the algorithm) -> rows-only.
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val merges = TextOps.trainBpeMerges(
        d.filter(col("doc_id") % 10 =!= 0), "text", numMerges = 200)
      d.select(col("doc_id"),
          TextOps.bpeSubwordCount(col("text"), merges).as("n_subwords"))
        .orderBy(col("doc_id"))
    }),

    "q86b_bpe_segment" -> ((s: SparkSession, dir: String) => {
      // the ENCODE half of q86 made hash-verifiable: per-word
      // segmentation under the FIXED well-formed merge list (see
      // q86bMerges) for which applying each merge ONCE in rank order
      // equals the kernel's repeated-min greedy — the property that lets
      // the DuckDB oracle replay the identical segmentation as a chain
      // of left-to-right replace() passes over paren-wrapped symbols.
      // q86 (trained merges) keeps its golden check; this pins the
      // shared BpeEncodeExpr kernel's VALUES end-to-end.
      import org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions
      val enc = TextKernelExpressions.bpeEncode(array(col("word")), q86bMerges)
      t(s, dir, "documents").select(col("doc_id"), col("text"))
        .select(col("doc_id"),
          posexplode(TextOps.tokens(col("text"))).as(Seq("word_pos", "word")))
        .select(col("doc_id"), col("word_pos").cast(LongType).as("word_pos"),
          col("word"),
          array_join(enc, " ").as("subwords"),
          size(enc).cast(LongType).as("n_subwords"))
        .orderBy(col("doc_id"), col("word_pos"))
    }),

    "q84_corpus_diff" -> ((s: SparkSession, dir: String) => {
      // snapshot audit between two corpus versions: every-7th doc removed,
      // every-5th edited, 15 new docs appended — unchanged ids emit no row
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val newer = d.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
        .unionByName(d.filter(col("doc_id") < 15)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      graft.ops.SampleOps.corpusDiff(d, newer, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q83_ngram_lm_score" -> ((s: SparkSession, dir: String) => {
      // CCNet-style quality scoring: a trigram LM trained on the 90%
      // "reference" slice scores the held-out 10% by mean negative
      // log-probability (micro-nat-exact; md5-31 keys, DuckDB-replayable)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = TextOps.trainNgramLm(d.filter(col("doc_id") % 10 =!= 0), "text", n = 3)
      TextOps.ngramLogProbScore(d.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", lm)
        .orderBy(col("doc_id"))
    }),

    "q81_duplicate_spans" -> ((s: SparkSession, dir: String) => {
      // substring-level dedup: exact copies (whole-doc spans) and hybrid
      // docs (an original plus a unique tail — the span stops where the
      // tail's grams become unique) planted over the natural corpus
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val hybrids = d.filter(col("doc_id") < 10)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" uniquetail"), col("doc_id").cast("string"),
            lit(" appended words")).as("text"))
      DedupOps.duplicateSpans(d.unionByName(copies).unionByName(hybrids),
          "doc_id", "text", k = 8)
        .orderBy(col("doc_id"), col("span_id"))
    }),

    "q82_strip_spans" -> ((s: SparkSession, dir: String) => {
      // the excision side: originals (lowest ids) keep their text, copies
      // and hybrids lose exactly the duplicated characters
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val hybrids = d.filter(col("doc_id") < 10)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" uniquetail"), col("doc_id").cast("string"),
            lit(" appended words")).as("text"))
      DedupOps.stripDuplicateSpans(d.unionByName(copies).unionByName(hybrids),
          "doc_id", "text", k = 8)
        .select(col("doc_id"), col("clean_text"))
        .orderBy(col("doc_id"))
    }),

    "q80_semantic_dedup" -> ((s: SparkSession, dir: String) => {
      // the keep-side: drop every vector with a lower-id semantic duplicate
      // in its cell — the 20 planted copies all lose to their originals
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      SimOps.semanticDedup(e.unionByName(dups), "vec_id", "embedding",
          threshold = 0.9, nCells = 0)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    "q31_langid" -> ((s: SparkSession, dir: String) => {
      TextOps.langId(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("lang_pred"), col("lang_pred_score"))
        .orderBy(col("doc_id"))
    }),

    "q32_quality" -> ((s: SparkSession, dir: String) => {
      TextOps.qualityScore(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("alpha_ratio"), col("punct_ratio"),
          col("mean_tok_len"), col("quality"))
        .orderBy(col("doc_id"))
    }),

    "q33_fingerprint" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    "q34_multimodal" -> ((s: SparkSession, dir: String) => {
      // the batched mapPartitions plumbing (schema, ids, byte counts) and
      // the frame-sampling arithmetic are oracle-verified exactly; the stub
      // feature values are pinned by PipelineOpsSpec instead (their rolling
      // hash needs 64-bit wraparound, which SQL BIGINT refuses)
      val media = MultimodalOps.syntheticMedia(t(s, dir, "documents"), "doc_id", "text")
      val feats = MultimodalOps.extractFeatures(media, dim = 16)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          size(col("feat")).cast(LongType).as("feat_dim"))
      val frames = MultimodalOps.sampleFrames(media)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
      feats.join(frames, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"), col("n_bytes"), col("feat_dim"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy(col("media_id"))
    }),

    // ---- extras -----------------------------------------------------------
    "q35_cell_thermal_mass" -> ((s: SparkSession, dir: String) => {
      // temperature/conductivity stand-ins from events (deterministic
      // arithmetic; the real-data path is exercised in ExtrasSpec)
      val ev = t(s, dir, "events")
        .withColumn("temp", col("value") / 10.0)
        .withColumn("cond", col("value") / 100.0 + 3.0)
      graft.ops.Extras.cellThermalMass(ev, "user_id", "event_id", "temp", "cond")
        .select(col("user_id"), col("event_id"), round(col("ctm"), 6).as("ctm"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q36_barrier_layer" -> ((s: SparkSession, dir: String) => {
      // SA/CT stand-ins; sigma0 is the TEOS-10 75-term polynomial, which the
      // oracle inlines with identical association order (OracleSqlGen)
      val ev = t(s, dir, "events")
        .withColumn("sa", col("value") / 4.0 + 20.0)
        .withColumn("ct", lit(30.0) - col("value") / 10.0)
      graft.ops.Extras.barrierLayerMask(ev, "user_id", "event_id", "sa", "ct")
        .select(col("user_id"), col("event_id"),
          round(col("sigma_theta"), 6).as("sigma_theta"), col("blt_mask"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q37_section" -> ((s: SparkSession, _: String) => {
      // multi-cast section from real fixtures: ascending downcasts binned
      // per cast, cumulative station distance from the casts metadata table.
      // DETERMINISTIC input (r12): the four continuous .cnv.gz casts by
      // explicit file list — reading the whole CTD/ dir also parses the
      // .ros bottle logs, and a .ros sharing its cast id AND scan_order
      // range with its .cnv makes "first pressure in scan order" depend on
      // a scan_order TIE between two files (an input ambiguity, not an
      // operator property). The reference-generated golden parquet this
      // query is now hash-anchored to requires well-defined input.
      // persist: bindata's edge aggregate + main aggregate each scan the
      // samples, and a ctd-source scan is a full re-parse (no columnar cache
      // behind it, unlike parquet)
      val files = Seq("g01l01s01", "g01l02s01", "g01l04s01", "g01l05s01")
        .map(n => s"$fixtures/CTD/$n.cnv.gz")
      val raw = CtdRead.cnv(s, files)
      val samples = Cast.split(Cast.removeAboveWater(raw), "cast_id", "scan_order")
        .filter(col("direction") === "down")
        // project BEFORE persist: pruning then reaches the ctd scan, whose
        // tokenizer skips the ~12 unprojected channels per line
        .select(col("cast_id"), col("scan_order"), col("pressure"), col("t090C"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val meta = CtdRead.casts(s, "cnv", files)
      graft.ops.Extras.section(samples, meta, "cast_id", "scan_order",
          "t090C", delta = 50.0)
        .select(col("cast_id"), col("pressure"),
          round(col("t090C"), 6).as("t090C"),
          round(col("station_dist_m"), 2).as("station_dist_m"))
        .orderBy(col("cast_id"), col("pressure"))
    }),

    "q38_bottle_stats" -> ((s: SparkSession, _: String) => {
      // BTL avg/sdev/min/max recomputed from the ROS bottle log
      // (rows-only: DuckDB cannot read .ros; shape mirrored from the real
      // .btl fixture in CtdSourceSpec)
      val ros = CtdRead.rosetteSummary(s, s"$fixtures/CTD/g01l01s01.ros")
        .filter(col("nbf") > 0)
        .withColumn("cond", col("`c0S/m`"))
      graft.ops.Extras.bottleStats(ros, "cast_id", "nbf",
          Seq("pressure", "t090C", "cond"))
        .select(col("nbf"), col("Statistic"), round(col("pressure"), 4).as("pressure"),
          round(col("t090C"), 4).as("t090C"), round(col("cond"), 4).as("cond"))
        .orderBy(col("nbf"), col("Statistic"))
    }),

    "q41_token_count_bpe" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokenCountBpe(col("text")).as("n_tokens_bpe"))
        .orderBy(col("doc_id"))
    }),

    "q40_embedding_near_dup" -> ((s: SparkSession, dir: String) => {
      // corpus + exact copies of the first 20 vectors under new ids: the
      // LSH-bucketed pass must find them (cos = 1); the oracle embeds the
      // same seed-42 hyperplanes as literals (OracleSqlGen)
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      SimOps.embeddingNearDupPairs(e.unionByName(dups), "vec_id", "embedding",
          threshold = 0.98, nPlanes = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q59_embedding_near_dup_banded" -> ((s: SparkSession, dir: String) => {
      // the multi-band scale path (union of per-band bucket collisions)
      // under q40's planted-copies setup — the banding itself is now
      // oracle-verified, not just recall-spec'd
      val e = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val dups = e.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      SimOps.embeddingNearDupPairs(e.unionByName(dups), "vec_id", "embedding",
          threshold = 0.98, nPlanes = 12, bands = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q46_decontaminate" -> ((s: SparkSession, dir: String) => {
      // probe set = first 3 docs (standing in for an eval benchmark); any
      // doc sharing a 5-gram with them is flagged — the probe docs flag
      // themselves, plus any genuine n-gram overlap in the corpus
      val d = t(s, dir, "documents")
      DedupOps.contaminatedIds(d, "doc_id", "text",
          d.filter(col("doc_id") < 3), "text", shingleSize = 5)
        .orderBy(col("doc_id"))
    }),

    "q43_pii_redact" -> ((s: SparkSession, dir: String) => {
      // counts pre-redaction; sha2 of the redacted text keeps the output
      // small while staying sensitive to every replacement
      val d = t(s, dir, "documents")
      val (ne, ni, np) = TextOps.piiCounts(col("text"))
      d.select(col("doc_id"), ne.as("n_emails"), ni.as("n_ips"), np.as("n_phones"),
          sha2(TextOps.redactPii(col("text")), 256).as("redacted_sha"))
        .orderBy(col("doc_id"))
    }),

    "q44_repetition" -> ((s: SparkSession, dir: String) => {
      TextOps.repetitionSignals(t(s, dir, "documents"), "text")
        .select(col("doc_id"), col("dup_2gram_frac"), col("top_token_frac"))
        .orderBy(col("doc_id"))
    }),

    "q45_hash_split" -> ((s: SparkSession, dir: String) => {
      graft.ops.SampleOps.hashSplit(t(s, dir, "documents"), "doc_id", nSplits = 10)
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("split"))
    }),

    "q87_weighted_sample" -> ((s: SparkSession, dir: String) => {
      // quality-weighted sampling: keep probability = per-row weight
      // (here length-derived, in (0,1)), decided by the same engine-
      // portable md5 hash gate as q45's splits — map-side, no shuffle
      val d = t(s, dir, "documents")
        .withColumn("w", col("n_chars") / lit(600.0))
      graft.ops.SampleOps.weightedSampleByHash(d, "doc_id", "w")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q88_sessions" -> ((s: SparkSession, dir: String) => {
      // gap-based sessionization via Spark's NATIVE session_window (30-min
      // inactivity rule); boundaries decided on unix_micros integers, the
      // per-session value sum exact via the decimal trick. One shuffle on
      // user_id; the oracle replays the session rule with a lag/running-sum
      // window over epoch_us.
      val sess = graft.ops.EventOps.sessionStats(t(s, dir, "events"),
        "user_id", "ts", gapSeconds = 1800,
        aggs = Seq(dsum(col("value")).as("total_value")))
      sess.select(col("user_id"),
          unix_micros(col("session_start").cast("timestamp")).as("start_us"),
          unix_micros(col("session_end").cast("timestamp")).as("end_us"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    "q89_windowed_events" -> ((s: SparkSession, dir: String) => {
      // tumbling 1-hour event-time windows x event_type, with a typed JSON
      // field pulled out of the props column (get_json_object, codegen'd)
      // — the map-side bucket + two-phase hash agg shape
      val ev = t(s, dir, "events")
      graft.ops.EventOps.tumblingStats(ev, "ts", widthSeconds = 3600,
          keyCols = Seq("event_type"),
          aggs = Seq(
            count(lit(1)).as("n_events"),
            dsum(col("value")).as("total_value"),
            sum(graft.ops.EventOps.jsonField(col("props"), "$.k", "long"))
              .as("sum_k")))
        .select(unix_micros(col("bucket_start").cast("timestamp")).as("bucket_us"),
          col("event_type"), col("n_events"), col("total_value"), col("sum_k"))
        .orderBy(col("bucket_us"), col("event_type"))
    }),

    "q90_sessionize" -> ((s: SparkSession, dir: String) => {
      // per-row session LABELING (the row-preserving sibling of q88):
      // session_seq / session_id as pure functions of (user, ts, id) —
      // two windows over one shared exchange on user_id
      graft.ops.EventOps.sessionize(t(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800)
        .select(col("event_id"), col("user_id"), col("session_seq"),
          col("session_id"))
        .orderBy(col("event_id"))
    }),

    "q182_sessionize_bucketed" -> ((s: SparkSession, dir: String) => {
      // the skew-bounded sibling (r14): BIT-IDENTICAL output to q90 by
      // contract (SessionizeParitySpec pins it), but the event-side
      // windows partition on (user, hour-bucket) with a session-level
      // boundary fixup, so a bot user holding 10% of all events — the
      // r14 skew record's one >3x per-stage task skew, on q90's
      // whole-user partition — splits across its active hours. Shares
      // q90's oracle verbatim: same semantics IS the contract.
      graft.ops.EventOps.sessionizeBucketed(t(s, dir, "events"),
          "user_id", "ts", "event_id", gapSeconds = 1800,
          bucketSeconds = 3600)
        .select(col("event_id"), col("user_id"), col("session_seq"),
          col("session_id"))
        .orderBy(col("event_id"))
    }),

    "q183_deflate_ratio" -> ((s: SparkSession, dir: String) => {
      // the deflate compression-ratio quality signal (Gopher/DCLM-style:
      // templated or repetitive docs compress far below prose), the one
      // map-side text op that was spec-only through r14 (DuckDB has no
      // deflate). Golden-anchored by the q86 pattern: an independent
      // Python-zlib raw-deflate writes golden_oracle/q183_deflate.parquet
      // keyed by corpus fingerprint (scripts/gen_golden_oracle_deflate.py);
      // the oracle recomputes the same quantized ratio from it. The
      // quantization (ratio computed FIRST, then *1e6, +0.5, floor) is
      // mirrored operation-for-operation in the oracle SQL — identical
      // IEEE ops on identical integers, so the hash is exact. Empty text
      // short-circuits to ratio 1.0 on both sides.
      t(s, dir, "documents").select(col("doc_id"),
          floor(TextOps.compressionRatio(col("text")) * lit(1e6) + lit(0.5))
            .cast(LongType).as("ratio_q6"))
        .orderBy(col("doc_id"))
    }),

    "q184_kll_band_contract" -> ((s: SparkSession, dir: String) => {
      // the KLL quantile sketch's contract as a hash-green row (the one
      // sketch family still spec-only through r14). The DataSketches KLL
      // estimate is run-randomized — compaction flips a real coin — so
      // the row pins what IS deterministic: the exact positional rank
      // band around each target rank, recomputed independently by the
      // oracle from the raw table (real oracle work: n, band positions,
      // band VALUES all hash-compared), plus the boolean that the merged
      // sketch's estimate landed inside it. Band halfwidth 0.03 ≈ 2.26×
      // the k=200 99%-confidence rank error (0.013295 per
      // KllSketch.getNormalizedRankError — ~5.8σ), so the boolean is
      // run-stable while still pinning the estimate to ±3% rank. The
      // build exercises the full landed shape: per-(source, shard)
      // sketches unioned, merged per source with no re-scan, read at 5
      // ranks. Exact ground truth by per-group sort is the q177–q179
      // recall-contract pattern — the audit query pays for exactness.
      import s.implicits._
      val pcts = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
        "p90" -> 0.9, "p99" -> 0.99)
      val d = t(s, dir, "documents").filter(col("n_chars").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val segs = (0 until 3).map(i => graft.ops.SketchOps.quantileSketches(
        d.filter(pmod(col("doc_id"), lit(3L)) === i), "source", "n_chars"))
      val est = graft.ops.SketchOps.mergedQuantiles(
        segs.reduce(_ unionByName _), "source", pcts.map(_._2))
      val estLong = est.select(col("source"), explode(map(
        pcts.flatMap { case (lbl, _) => Seq(lit(lbl), col(lbl)) }: _*))
        .as(Seq("pct", "est")))
      val n = d.groupBy("source").agg(count(lit(1)).as("n_rows"))
      // band positions: double arithmetic mirrored literal-for-literal in
      // the oracle SQL (identical IEEE ops on identical ints, q183 rule)
      val pos = n.crossJoin(pcts.toDF("pct", "p")).select(
        col("source"), col("pct"), col("n_rows"),
        greatest(lit(1L),
          ceil((col("p") - lit(0.03)) * col("n_rows"))).as("lo_pos"),
        least(col("n_rows"), greatest(lit(1L),
          floor((col("p") + lit(0.03)) * col("n_rows")))).as("hi_pos"))
      val ranked = d.select(col("source").as("__rs"), col("n_chars"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("__rs")).orderBy(col("n_chars"))))
      pos
        .join(ranked.select(col("__rs"), col("rn"),
            col("n_chars").as("v_lo")),
          col("__rs") === col("source") && col("rn") === col("lo_pos"))
        .drop("__rs", "rn")
        .join(ranked.select(col("__rs"), col("rn"),
            col("n_chars").as("v_hi")),
          col("__rs") === col("source") && col("rn") === col("hi_pos"))
        .drop("__rs", "rn")
        .join(estLong, Seq("source", "pct"))
        .select(col("source"), col("pct"), col("n_rows"),
          col("v_lo"), col("v_hi"),
          (col("est") >= col("v_lo") && col("est") <= col("v_hi"))
            .as("within_band"))
        .orderBy(col("source"), col("pct"))
    }),

    "q185_hll_merge_contract" -> ((s: SparkSession, dir: String) => {
      // the mergeable HLL distinct-token sketches' contract (q95's
      // approx sibling, spec-only through r14): per-(source, shard)
      // sketches merged per source must land within the lgK=12 error
      // envelope of the EXACT per-source distinct count (relative σ =
      // 1.04/√2¹² ≈ 1.63%; bound 0.05 ≈ 3σ). Unlike KLL, HLL state is a
      // pure function of the input multiset (register max over hashes —
      // no RNG, order-insensitive), so the boolean is exactly stable
      // run-to-run; the exact count is the oracle's verifiable half.
      val d = t(s, dir, "documents")
      val segs = (0 until 3).map(i => TextOps.distinctTokenSketches(
        d.filter(pmod(col("doc_id"), lit(3L)) === i), "source", "text"))
      val est = TextOps.mergeDistinctSketches(
          segs.reduce(_ unionByName _), "source")
        .withColumnRenamed("n_distinct_tokens", "est")
      TextOps.distinctTokens(d, "source", "text")
        .join(est, "source")
        .select(col("source"), col("n_distinct_tokens"),
          (abs(col("est") / col("n_distinct_tokens") - lit(1.0))
            <= lit(0.05)).as("within_bound"))
        .orderBy(col("source"))
    }),

    "q93_shard_manifest" -> ((s: SparkSession, dir: String) => {
      // corpus-landing audit: deterministic hash shards + a per-shard
      // manifest (counts, token sums, order-independent key checksum) —
      // the certificate a 100 TB corpus ships with so any engine can
      // re-derive shard membership and detect drift. Map-side shard
      // assignment, one two-phase hash agg.
      val sharded = graft.ops.SampleOps.assignShards(
        t(s, dir, "documents"), "doc_id", nShards = 8)
      graft.ops.SampleOps.shardManifest(sharded, "doc_id", Some("n_chars"))
        .orderBy(col("shard"))
    }),

    "q96_funnel" -> ((s: SparkSession, dir: String) => {
      // ordered conversion funnel view -> click -> signup -> purchase:
      // each step is a per-user scalar agg over that step's events only
      // (predicate pushed to the scan), chained by at-or-after joins on
      // user-id scalars — never an event-sequence materialization
      graft.ops.EventOps.funnel(t(s, dir, "events"), "user_id", "ts", Seq(
          "view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "signup" -> (col("event_type") === "signup"),
          "purchase" -> (col("event_type") === "purchase")))
        .orderBy(col("step_index"))
    }),

    "q97_retention" -> ((s: SparkSession, dir: String) => {
      // daily cohort retention over a 30-day horizon: first-event cohort
      // per user (exact long floor-div bucketing), distinct-active counts
      // per (cohort, period) — integers end to end
      graft.ops.EventOps.retention(t(s, dir, "events"), "user_id", "ts",
          cohortWidthSeconds = 86400, horizonPeriods = 30)
        .orderBy(col("cohort_start_us"), col("period"))
    }),

    "q98_bm25" -> ((s: SparkSession, dir: String) => {
      // ranked keyword retrieval (decontamination audit / quality triage):
      // Okapi BM25 top-10 for a 3-term query; the only full-corpus pass is
      // the one-row (N, total_dl) stats broadcast
      graft.ops.SearchOps.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
          terms = Seq("spark", "query", "filter"), k = 10)
        .orderBy(col("rank"))
    }),

    "q99_bm25_indexed" -> ((s: SparkSession, dir: String) => {
      // q98's steady-state shape: postings land once bucketed by token;
      // the query prunes to its terms' buckets. Same oracle as q98 — the
      // landed path must be row-identical to the inline path.
      val idx = "graft_q99_" + math.abs(dir.hashCode).toString
      graft.ops.SearchOps.landSearchIndex(t(s, dir, "documents"), "doc_id",
        "text", idx,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      graft.ops.SearchOps.bm25AgainstIndex(s, idx,
          terms = Seq("spark", "query", "filter"), k = 10)
        .orderBy(col("rank"))
    }),

    "q107_winnow" -> ((s: SparkSession, dir: String) => {
      // MOSS winnowing: rightmost-min fingerprint per 4-window of 3-gram
      // hashes — positional overlap detection with the w+k-1 guarantee
      DedupOps.winnowFingerprints(t(s, dir, "documents"), "doc_id", "text",
          k = 3, w = 4)
        .orderBy(col("doc_id"), col("pos"))
    }),

    "q108_winnow_overlap" -> ((s: SparkSession, dir: String) => {
      // the MOSS match step: 80-char excerpts resolve back to their
      // source docs via a fingerprint equi-join — partial overlap no
      // whole-doc sketch would see
      val d = t(s, dir, "documents")
      val probes = d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 3000000).as("doc_id"),
          substring(col("text"), 30, 80).as("text"))
      DedupOps.winnowOverlapPairs(probes, d, "doc_id", "doc_id",
          "text", "text", k = 3, w = 4, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q100_near_dedup_keep_best" -> ((s: SparkSession, dir: String) => {
      // canonical selection: q48's planted clusters, but keep the LONGEST
      // member (the perturbed copies are longer, so the survivor set
      // inverts q48's min-id choice on every cluster)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.nearDedupKeepBest(d.unionByName(perturbed), "doc_id", "text",
          score = length(col("text")).cast(LongType),
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q101_key_skew" -> ((s: SparkSession, dir: String) => {
      // shuffle pre-flight: hottest join-key values with exact integer
      // share (ppm) and the salt fan-out that levels each to one average
      // partition — all long arithmetic, reproducible anywhere
      graft.ops.StatsOps.keySkewProfile(t(s, dir, "events"), "user_id",
          k = 20, nPartitions = 32)
        .orderBy(col("rank"))
    }),

    "q102_transitions" -> ((s: SparkSession, dir: String) => {
      // behavioral Markov matrix: (prev -> next) event-type counts within
      // 30-minute sessions + row-normalized probabilities
      graft.ops.EventOps.transitions(t(s, dir, "events"), "user_id", "ts",
          "event_id", "event_type", gapSeconds = 1800)
        .orderBy(col("prev_type"), col("next_type"))
    }),

    "q103_fuzzy_join" -> ((s: SparkSession, dir: String) => {
      // entity resolution: planted one-substitution "titles" resolved back
      // to their source docs via blocked (prefix/suffix) candidates +
      // exact levenshtein verify — never all-pairs
      val d = t(s, dir, "documents")
      val base = d.select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
      val probe = d.filter(col("doc_id") < 40)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(substring(col("text"), 1, 9), lit("#"),
            substring(col("text"), 11, 14)).as("title"))
      graft.ops.JoinOps.fuzzyJoinBlocked(probe, base, "doc_id", "doc_id",
          "title", "title", maxDist = 2, blockChars = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q104_curriculum" -> ((s: SparkSession, dir: String) => {
      // staged-pretraining schedule: value-threshold quality tiers +
      // deterministic intra-tier shuffle, all map-side scalars + one
      // range-partitioned sort (no ntile / global window)
      graft.ops.SampleOps.curriculumOrder(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          "doc_id", col("n_chars").cast(DoubleType), Seq(220.0, 380.0),
          salt = "curr1")
    }),

    "q105_collocations" -> ((s: SparkSession, dir: String) => {
      // phrase-mining pre-pass: top adjacent-token bigrams by PMI,
      // micro-nat-quantized before ranking so ln() ulp drift cannot
      // reorder the top-k across engines
      TextOps.collocations(t(s, dir, "documents"), "doc_id", "text",
          k = 30, minCount = 5)
        .orderBy(col("rank"))
    }),

    "q106_bm25_appended" -> ((s: SparkSession, dir: String) => {
      // steady-state retrieval ingest: land 80% of the corpus, FOLD the
      // remaining 20% in via appendSearchIndex — scores must equal q98's
      // full-corpus inline computation (same oracle)
      val idx = "graft_q106_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents")
      graft.ops.SearchOps.landSearchIndex(d.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", idx,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      graft.ops.SearchOps.appendSearchIndex(d.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", idx,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      graft.ops.SearchOps.bm25AgainstIndex(s, idx,
          terms = Seq("spark", "query", "filter"), k = 10)
        .orderBy(col("rank"))
    }),

    "q109_salted_join" -> ((s: SparkSession, dir: String) => {
      // skew-mitigated join, end to end: plant a hot key (30% of events
      // collapse onto key 0), PROFILE it (q101's pre-flight, driver-size
      // top-k), then salted-join facts against the per-key dim using the
      // profiler's own salt factors. The salt decides placement only, so
      // the result — aggregated back per event_type to verify every row
      // joined exactly once — is bit-identical to the plain join the
      // oracle runs.
      val ev = t(s, dir, "events")
        .withColumn("skew_key",
          when(pmod(col("user_id"), lit(10L)) < 3, lit(0L))
            .otherwise(pmod(col("user_id"), lit(50L))))
      val dim = ev.groupBy(col("skew_key"))
        .agg(count(lit(1)).as("key_n"), dsum(col("value")).as("key_total"))
      val hot = graft.ops.StatsOps.keySkewProfile(ev, "skew_key",
          k = 5, nPartitions = 32)
        .select(col("key_value"), col("salt_factor")).collect()
        .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      graft.ops.JoinOps.saltedJoin(ev, dim, "skew_key", "event_id", hot)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), sum(col("key_n")).as("sum_key_n"),
          dsum(col("key_total")).as("sum_key_total"))
        .orderBy(col("event_type"))
    }),

    "q110_interval_join" -> ((s: SparkSession, dir: String) => {
      // incident-window association: every event inside [t, t+5min) of any
      // error event, via the overlap-bucket equi-join (never a nested-loop
      // theta join); per-incident counts + exact decimal value sums
      val us = unix_micros(col("ts").cast(TimestampType))
      val ev = t(s, dir, "events").filter(col("ts").isNotNull)
        .select(col("event_id"), us.as("us"), col("value"), col("event_type"))
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"), col("us").as("lo"),
          (col("us") + 300000000L).as("hi"))
      graft.ops.JoinOps.intervalJoin(ev.select(col("us"), col("value")),
          incidents, "us", "lo", "hi", bucketWidth = 300000000L)
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("incident_id"))
    }),

    "q111_cms_heavy_hitters" -> ((s: SparkSession, dir: String) => {
      // mergeable frequency summary: a 4x2048 count-min sketch built as
      // ONE hash aggregation (shuffle bounded by sketch dims, not corpus
      // size), point-queried for the exact top-20 tokens; est >= exact
      // always, the overestimate gap is the collision error the oracle
      // reproduces cell for cell
      val d = t(s, dir, "documents")
      val items = d.select(explode(TextOps.tokens(col("text"))).as("token"))
      val sketch = graft.ops.SketchOps.cmsSketch(items, "token",
        depth = 4, width = 2048)
      val probes = TextOps.vocabulary(d, "doc_id", "text", k = 20)
        .select(col("token"), col("n_occurrences").as("exact"))
      graft.ops.SketchOps.cmsEstimate(sketch, probes, "token",
          depth = 4, width = 2048)
        .select(col("token"), col("exact"), col("est"))
        .orderBy(col("token"))
    }),

    "q115_cms_landed" -> ((s: SparkSession, dir: String) => {
      // steady-state frequency serving: land the sketch on 80% of the
      // corpus, fold the rest in as a counter SEGMENT (pure insert,
      // idempotent by segment id), then probe — cell-identical to q111's
      // inline full-corpus sketch, so it ships the same oracle
      val name = "graft_q115_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents")
      def toks(dd: org.apache.spark.sql.DataFrame) =
        dd.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
      graft.ops.SketchOps.landCmsSketch(
        toks(d.filter(col("doc_id") % 5 =!= 0)), "token", name,
        depth = 4, width = 2048,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$name"))
      graft.ops.SketchOps.appendToCmsSketch(
        toks(d.filter(col("doc_id") % 5 === 0)), "token", name,
        segmentId = "ingest-1")
      val probes = TextOps.vocabulary(d, "doc_id", "text", k = 20)
        .select(col("token"), col("n_occurrences").as("exact"))
      graft.ops.SketchOps.cmsEstimateAgainstSketch(probes, "token", name)
        .select(col("token"), col("exact"), col("est"))
        .orderBy(col("token"))
    }),

    "q121_join_overlap" -> ((s: SparkSession, dir: String) => {
      // the join pre-flight: how do events.user_id (with planted nulls)
      // and customer.c_custkey actually relate — distinct keys per side,
      // shared keys, integer-ppm containment, null-row counts
      val ev = t(s, dir, "events")
        .select(when(pmod(col("user_id"), lit(37L)) === 0,
          lit(null).cast(LongType)).otherwise(col("user_id")).as("user_id"))
      graft.ops.StatsOps.joinKeyOverlap(ev, t(s, dir, "customer"),
        "user_id", "c_custkey")
    }),

    "q122_profile_columns" -> ((s: SparkSession, dir: String) => {
      // the data-card profiler: one scan, one row per column with exact
      // null/distinct counts and native-typed min/max rendered as strings
      graft.ops.StatsOps.profileColumns(t(s, dir, "documents"))
    }),

    "q123_cluster_sizes" -> ((s: SparkSession, dir: String) => {
      // what did dedup actually find: q118's exact provenance mapping
      // rolled up to (cluster_size, n_clusters) — organic size-2 pairs
      // vs a boilerplate mega-cluster read straight off this table
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.clusterSizeHistogram(
          DedupOps.canonicalMapping(d.unionByName(perturbed), "doc_id",
            "text", numHashes = 64, bands = 16, threshold = 0.5,
            maxBucket = 100))
        .orderBy(col("cluster_size"))
    }),

    "q124_url_dedup" -> ((s: SparkSession, dir: String) => {
      // crawl-URL dedup: deterministic synthetic URLs that differ only in
      // case, www., default port, tracking params, and fragments collapse
      // to one canonical form; keep the minimum doc_id per canonical
      val id = col("doc_id")
      val g  = pmod(id, lit(25L)).cast(StringType)
      val url = concat(
        when(pmod(id, lit(2L)) === 0, lit("HTTPS://")).otherwise(lit("https://")),
        when(pmod(id, lit(3L)) === 0, lit("WWW.")).otherwise(lit("")),
        col("source"), lit(".Example.COM"),
        when(pmod(id, lit(4L)) === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/"), g, lit("/page"),
        when(pmod(id, lit(5L)) === 0,
            concat(lit("?utm_source=feed&id="), g, lit("&utm_campaign=x")))
          .when(pmod(id, lit(5L)) === 1,
            concat(lit("?id="), g, lit("&gclid=abc")))
          .otherwise(concat(lit("?id="), g)),
        when(pmod(id, lit(6L)) === 0, lit("#section-2")).otherwise(lit("")))
      t(s, dir, "documents")
        .select(id.as("doc_id"),
          TextOps.canonicalizeUrl(url).as("canonical_url"))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper_doc_id"),
          count(lit(1)).as("n_dups"))
        .orderBy(col("canonical_url"))
    }),

    "q125_contamination_report" -> ((s: SparkSession, dir: String) => {
      // q46's decontamination upgraded to evidence: per flagged doc, how
      // many distinct 5-grams hit the probe set, out of how many, as ppm
      val d = t(s, dir, "documents")
      DedupOps.contaminationReport(d, "doc_id", "text",
          d.filter(col("doc_id") < 3), "text", shingleSize = 5)
        .orderBy(col("doc_id"))
    }),

    "q126_ewma" -> ((s: SparkSession, dir: String) => {
      // per-user smoothed metric in event-time order; every 17th value
      // nulled to pin the carry rule (state repeats, trend not reset)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("user_id"),
          when(pmod(col("event_id"), lit(17L)) === 0,
            lit(null).cast(DoubleType)).otherwise(col("value")).as("value"))
      graft.ops.EventOps.ewma(ev, "user_id", "ts", "event_id", "value",
          alpha = 0.5)
        .select(col("event_id"), col("user_id"), col("value"), col("ewma"))
        .orderBy(col("event_id"))
    }),

    "q127_heavy_hitters" -> ((s: SparkSession, dir: String) => {
      // guaranteed token heavy hitters: a Misra-Gries candidate pass (≤49
      // counters of aggregate state) then an exact recount — every token
      // with count strictly over n/50, exact counts, no stowaways
      val toks = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      graft.ops.SketchOps.heavyHitters(toks, "token", k = 50)
        .orderBy(col("n_rows").desc, col("token"))
    }),

    "q128_kmeans" -> ((s: SparkSession, dir: String) => {
      // full-corpus distributed Lloyd in exact integer arithmetic: 8
      // clusters, 3 iterations, milli-unit quantization — per-iteration
      // shuffle is (k x dim) rows, bit-identical on any engine
      graft.ops.SimOps.kmeansAssignInt(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 3)
        .orderBy(col("vec_id"))
    }),

    "q173_semantic_decontam" -> ((s: SparkSession, dir: String) => {
      // SEMANTIC decontamination — the embedding leg of the q46/q54
      // n-gram/bloom trio: flag train vectors whose cosine to any eval
      // item clears 0.999. Planted eval = exact twins of every 17th
      // train vector, so the flags are exactly the twins (cos 1.0);
      // rides the two-sided IVF join (derived cells), so BOTH sides may
      // be corpus-scale
      val e = t(s, dir, "embeddings")
      val eval = e.filter(pmod(col("vec_id"), lit(17L)) === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      SimOps.ivfJoinTopK(eval, e, "vec_id", "embedding", k = 1,
          nCells = 0, nProbe = 4)
        .filter(col("cos_sim") >= 0.999)
        .select(col("neighbor_id").as("train_id"),
          (col("query_id") - 1000000).as("eval_id"), col("cos_sim"))
        .orderBy(col("train_id"), col("eval_id"))
    }),

    "q172_prototypes" -> ((s: SparkSession, dir: String) => {
      // prototypicality selection (SSL-prune / D4): the q128 integer
      // Lloyd clusters, then the 5 most-central vectors per cluster by
      // exact integer distance — the curated-exemplar read; flip
      // keepClosest for the paper's keep-hard-examples pruning rule
      graft.ops.SimOps.prototypeSelect(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8, iters = 3, perCluster = 5)
        .orderBy(col("cluster_id"), col("proto_rank"))
    }),

    "q129_margin_matches" -> ((s: SparkSession, dir: String) => {
      // bitext-style mining between the even- and odd-id halves: mutual
      // best cosine match + ratio margin over both 4-NN neighborhoods,
      // integer micro-unit sums so no float accumulation order can drift
      val e = t(s, dir, "embeddings")
      graft.ops.SimOps.marginMutualMatches(
          e.filter(pmod(col("vec_id"), lit(2L)) === 0),
          e.filter(pmod(col("vec_id"), lit(2L)) === 1),
          "vec_id", "embedding", k = 4, minMarginMicro = 1000000L)
        .orderBy(col("src_id"))
    }),

    "q164_margin_banded" -> ((s: SparkSession, dir: String) => {
      // q129's mining rule on the SCALE path: banded-LSH candidates (one
      // (band, bucket) equi-join, no cross product) feeding the shared
      // mutual+margin tail — the 1e9 x 1e9 composition, oracle-verified
      val e = t(s, dir, "embeddings")
      graft.ops.SimOps.marginMutualMatchesBanded(
          e.filter(pmod(col("vec_id"), lit(2L)) === 0),
          e.filter(pmod(col("vec_id"), lit(2L)) === 1),
          "vec_id", "embedding", k = 4, minMarginMicro = 1000000L,
          nPlanes = 12, bands = 8)
        .orderBy(col("src_id"), col("tgt_id"))
    }),

    "q130_distinctive_terms" -> ((s: SparkSession, dir: String) => {
      // c-TF-IDF: what vocabulary distinguishes each source — group-df
      // idf in integer micro-nats times integer tf, top 10 per source;
      // tokens present in every source score exactly 0
      TextOps.distinctiveTerms(t(s, dir, "documents"), "source", "text",
          k = 10)
        .orderBy(col("source"), col("rank"))
    }),

    "q131_token_drift" -> ((s: SparkSession, dir: String) => {
      // PSI drift between two snapshots: B keeps even ids and every 10th
      // doc gains a planted marker suffix — the marker tokens and the
      // dropped-half shift must surface as the top contributors
      val d = t(s, dir, "documents")
      val b = d.filter(pmod(col("doc_id"), lit(2L)) === 0)
        .select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(10L)) === 0,
              lit(" driftmarker alpha beta")).otherwise(lit("")))
            .as("text"))
      TextOps.tokenDrift(d, b, "text", k = 20)
        .orderBy(col("contrib_pico").desc, col("token"))
    }),

    "q132_embedding_outliers" -> ((s: SparkSession, dir: String) => {
      // vector-space QC: distance to own label's centroid in exact
      // integer arithmetic, flagged over the label's p95 — mislabeled or
      // corrupt vectors surface here before they poison training
      graft.ops.SimOps.embeddingOutliers(t(s, dir, "embeddings"),
          "vec_id", "label", "embedding", hiP = 0.95)
        .orderBy(col("vec_id"))
    }),

    "q133_hopping_windows" -> ((s: SparkSession, dir: String) => {
      // sliding 1-hour windows every 15 min x event_type: each event in
      // exactly 4 windows, micro-quantized value sums (integer-exact)
      graft.ops.EventOps.hoppingStats(t(s, dir, "events"), "ts",
          "event_type", "value", widthSeconds = 3600, hopSeconds = 900)
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    "q134_set_similarity_join" -> ((s: SparkSession, dir: String) => {
      // exact Jaccard set join via prefix filtering (never all-pairs):
      // token sets of docs 0-199 against planted perturbed copies
      // (+1000000) and exact copies (+2000000) — absolute-id bounds keep
      // the oracle's brute-force cross product constant at any SF
      val dd = t(s, dir, "documents")
      def sets(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id"),
          array_distinct(TextOps.tokens(col("text"))).as("toks"))
      val left = sets(dd.filter(col("doc_id") < 200))
      val right = sets(
        dd.filter(col("doc_id") < 50)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" perturbed tail token")).as("text")))
        .unionByName(sets(
          dd.filter(col("doc_id") >= 100 && col("doc_id") < 300)
            .select((col("doc_id") + 2000000).as("doc_id"), col("text"))))
      DedupOps.setSimilarityJoin(left, "doc_id", right, "doc_id",
          "toks", thresholdMilli = 700)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q135_join_cardinality" -> ((s: SparkSession, dir: String) => {
      // the third join pre-flight: EXACT output rows of events x orders
      // on the user key, plus the hot key driving it, without running
      // the join — integer arithmetic from two count aggregates
      graft.ops.StatsOps.joinCardinality(t(s, dir, "events"),
        t(s, dir, "orders"), "user_id", "o_custkey")
    }),

    "q136_session_paths" -> ((s: SparkSession, dir: String) => {
      // user-journey mining: top 3-step event-type paths within gap
      // sessions — counts are pure functions of (user, ts, id, type)
      graft.ops.EventOps.sessionPaths(t(s, dir, "events"), "user_id",
          "ts", "event_id", "event_type", gapSeconds = 1800, n = 3, k = 15)
        .orderBy(col("rank"))
    }),

    "q138_rate_spikes" -> ((s: SparkSession, dir: String) => {
      // ops COMPOSITION: hopping windows -> per-type z-scores over the
      // window counts -> spike flags — the rate-anomaly monitor every
      // event pipeline wants; the generator's own rate variation
      // exercises the z math (no planting needed)
      val win = graft.ops.EventOps.hoppingStats(t(s, dir, "events"), "ts",
        "event_type", "value", widthSeconds = 3600, hopSeconds = 900)
      val stats = win.groupBy(col("event_type"))
        .agg(avg(col("n_events")).as("__mu"),
          stddev_pop(col("n_events")).as("__sigma"))
      win.join(broadcast(stats), Seq("event_type"))
        .withColumn("z",
          when(col("__sigma") > 0,
            round((col("n_events") - col("__mu")) / col("__sigma"), 6))
            .otherwise(lit(0.0)))
        .withColumn("is_spike", col("z") > 2.0)
        .select(col("window_start_us"), col("event_type"), col("n_events"),
          col("z"), col("is_spike"))
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    "q153_ann_appended" -> ((s: SparkSession, dir: String) => {
      // the ANN ingest path: index landed on 3/4 of the corpus (codebook
      // = lowest-16 ids of THAT subset), the remaining quarter folded in
      // via appendAnnIndex under the frozen codebook, then the q76 probe.
      // Row-identical to direct IVF over the full corpus with the landed
      // codebook — the oracle replays exactly that
      val idx = "graft_q153_" + math.abs(dir.hashCode).toString
      val e = t(s, dir, "embeddings")
      SimOps.landAnnIndex(e.filter(col("vec_id") % 4 =!= 0), "vec_id",
        "embedding", idx, nCells = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      SimOps.appendAnnIndex(e.filter(col("vec_id") % 4 === 0), "vec_id",
        "embedding", idx)
      SimOps.annTopKAgainstIndex(e.filter(col("vec_id") < 5), "vec_id",
          "embedding", idx, k = 5, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q154_paragraph_dedup" -> ((s: SparkSession, dir: String) => {
      // Dolma-style first-occurrence paragraph dedup. The synthetic docs
      // are single-paragraph, so two-paragraph docs are composed by
      // pairing each doc with its successor: doc i = [text_i, text_i+1].
      // Every text then appears twice — as doc i's first paragraph and
      // doc i-1's second — and the (id, position) keeper rule resolves
      // each doc to one surviving paragraph (the smallest id keeps both)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val nxt = d.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("__t2"))
      val two = d.join(nxt, Seq("doc_id"))
        .select(col("doc_id"),
          concat_ws("\n\n", col("text"), col("__t2")).as("text"))
      DedupOps.paragraphDedup(two, "doc_id", "text")
        .select(col("doc_id"), col("text_dedup"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    "q155_hard_negatives" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // retrieval-training mining: 3 queries, gold = each query's top-2
      // BM25 docs (mined with the same batch ranker), negatives = the
      // next 10 under the same ranking — exclusion happens before the
      // top-k window, so ranks re-pack and every row is usable
      val d = t(s, dir, "documents")
      val qs = Seq((0L, "spark query filter"), (1L, "stream window batch"),
        (2L, "join merge sort")).toDF("qid", "qtext")
      val gold = graft.ops.SearchOps.bm25TopKPerQuery(d, "doc_id", "text",
          qs, "qid", "qtext", k = 2)
        .select(col("qid"), col("doc_id"))
      graft.ops.SearchOps.mineHardNegatives(d, "doc_id", "text",
          qs, "qid", "qtext", gold, k = 10)
        .orderBy(col("qid"), col("rank"))
    }),

    "q156_domain_quality" -> ((s: SparkSession, dir: String) => {
      // per-site keep-or-drop ranking: q147's synthesized URL column,
      // metric = n_chars, empirical-Bayes shrinkage toward the corpus
      // mean with 100 pseudo-docs — exact integer micro-unit arithmetic
      val id = col("doc_id")
      val url = when(pmod(id, lit(6L)) === 0,
          concat(lit("https://cdn."), col("source"), lit(".co.uk/p")))
        .when(pmod(id, lit(6L)) === 1,
          concat(lit("https://sub."), col("source"), lit(".net/x")))
        .when(pmod(id, lit(6L)) === 2, lit("http://192.168.0.1/admin"))
        .when(pmod(id, lit(6L)) === 3, lit("not a url"))
        .otherwise(concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.COM:8443/page")))
      TextOps.domainQualityRanking(
          t(s, dir, "documents").withColumn("url", url),
          "url", "n_chars", pseudoCount = 100)
        .orderBy(col("shrunk_micro").desc, col("domain").asc_nulls_first)
    }),

    "q157_hard_negatives_indexed" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      // q155 at steady state: the same mining against a LANDED search
      // index — postings bucket-pruned to the batch's term union, zero
      // corpus re-tokenization; row-identical to the inline path (shared
      // scoring tail), so the oracle is q155's SQL verbatim
      val idx = "graft_q157_" + math.abs(dir.hashCode).toString
      graft.ops.SearchOps.landSearchIndex(t(s, dir, "documents"),
        "doc_id", "text", idx,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      val qs = Seq((0L, "spark query filter"), (1L, "stream window batch"),
        (2L, "join merge sort")).toDF("qid", "qtext")
      val gold = graft.ops.SearchOps.bm25AgainstIndexPerQuery(s, idx,
          qs, "qid", "qtext", k = 2)
        .select(col("qid"), col("doc_id"))
      graft.ops.SearchOps.bm25AgainstIndexPerQuery(s, idx, qs, "qid",
          "qtext", k = 10, exclude = Some(gold))
        .orderBy(col("qid"), col("rank"))
    }),

    "q158_paragraph_store" -> ((s: SparkSession, dir: String) => {
      // q154 at steady state: docs < 250 land as the paragraph-hash
      // store; the "incoming batch" pairs each doc >= 250 with the text
      // of doc - 250, so every batch doc carries one store-owned
      // paragraph (excised via the bucketed hash probe) and one fresh
      // one (first-occurrence-kept within the batch)
      val store = "graft_q158_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      DedupOps.landParagraphStore(d.filter(col("doc_id") < 250), "text",
        store,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$store"))
      val older = d.select((col("doc_id") + 250).as("doc_id"),
        col("text").as("__t2"))
      val batch = d.filter(col("doc_id") >= 250).join(older, Seq("doc_id"))
        .select(col("doc_id"),
          concat_ws("\n\n", col("text"), col("__t2")).as("text"))
      DedupOps.paragraphDedupAgainstStore(batch, "doc_id", "text", store)
        .select(col("doc_id"), col("text_dedup"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    "q159_paragraph_stream_replay" -> ((s: SparkSession, dir: String) => {
      // the STREAMING paragraph-dedup composite
      // (StreamOps.paragraphDedupBatch) driven as two micro-batches — the
      // q143 pattern at sub-document granularity. Batch 0 docs pair
      // text_i with store-owned text_{i-100} (excised via the landed
      // store); batch 1 docs pair text_i with text_{i-50} — batch 0's
      // SURVIVING first paragraphs, owned only because batch 0's sink-
      // then-append folded them in
      val store = "graft_q159_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      DedupOps.landParagraphStore(d.filter(col("doc_id") < 100), "text",
        store,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$store"))
      def twoPara(lo: Int, hi: Int, shift: Int): DataFrame = {
        val older = d.select((col("doc_id") + shift).as("doc_id"),
          col("text").as("__t2"))
        d.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .join(older, Seq("doc_id"))
          .select(col("doc_id"),
            concat_ws("\n\n", col("text"), col("__t2")).as("text"))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val body = graft.streaming.StreamOps.paragraphDedupBatch(
        "doc_id", "text", store) { (df, bid) =>
          out += df.select(lit(bid).as("batch_id"), col("doc_id"),
            col("text_dedup"), col("n_removed")) }
      body(twoPara(100, 150, 100), 0L)
      body(twoPara(150, 200, 50), 1L)
      out.reduce(_.unionByName(_))
        .orderBy(col("batch_id"), col("doc_id"))
    }),

    "q160_perplexity_buckets" -> ((s: SparkSession, dir: String) => {
      // the CCNet head/middle/tail decision table: tertile the held-out
      // slice by its q83 LM score, report per-bucket counts + score
      // range — what a perplexity-filtered pipeline reads before picking
      // keep thresholds. ntile gives EXACT tertiles; fine for an eval
      // slice (3 report rows), but the global-order window moves the
      // scored slice to one partition — corpus-scale bucketing should
      // cut on approx quantiles (the KLL path) with a map-side gate
      // instead
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val lm = TextOps.trainNgramLm(d.filter(col("doc_id") % 10 =!= 0),
        "text", n = 3)
      val scored = TextOps.ngramLogProbScore(
        d.filter(col("doc_id") % 10 === 0), "doc_id", "text", lm)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("avg_neg_logp"), col("doc_id"))
      scored.withColumn("bucket", ntile(3).over(w).cast(LongType))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_neg_logp")).as("min_score"),
          max(col("avg_neg_logp")).as("max_score"))
        .orderBy(col("bucket"))
    }),

    "q161_dsir_scores" -> ((s: SparkSession, dir: String) => {
      // DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
      // distributions over a target slice vs the raw remainder, per-doc
      // logw_micro = exact integer sum of per-side micro-nat log probs.
      // dim kept small (1024) so the oracle's dense bucket spine is cheap
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = TextOps.trainDsir(d.filter(col("doc_id") % 11 === 0),
        d.filter(col("doc_id") % 11 =!= 0), "text", dim = 1024)
      TextOps.dsirScore(d, "doc_id", "text", model)
        .orderBy(col("doc_id"))
    }),

    "q162_dsir_resample" -> ((s: SparkSession, dir: String) => {
      // the resampling half of DSIR: Gumbel top-k per shard over the raw
      // pool's importance weights — sampling ∝ w decided wholly in log
      // space (integer micro-nats + quantized Gumbel noise), per-shard
      // top-k as the scale-safe global sample
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = TextOps.trainDsir(d.filter(col("doc_id") % 11 === 0),
        d.filter(col("doc_id") % 11 =!= 0), "text", dim = 1024)
      val pool = TextOps.dsirScore(d.filter(col("doc_id") % 11 =!= 0),
        "doc_id", "text", model)
      val sharded = graft.ops.SampleOps.assignShards(pool, "doc_id", 4)
      graft.ops.SampleOps.gumbelTopKPerGroup(sharded, "shard", "doc_id",
          "logw_micro", 25)
        .select(col("shard").cast(LongType), col("sample_rank"),
          col("doc_id"), col("logw_micro"))
        .orderBy(col("shard"), col("sample_rank"))
    }),

    "q165_dsir_indexed" -> ((s: SparkSession, dir: String) => {
      // q161's steady-state shape: the ratio table lands ONCE as a
      // bucketed catalog table with meta-pinned (dim, alpha) and every
      // batch scores against it — row-identical to the direct path, so
      // this runs q161's oracle (the q75/q85 convention)
      val idx = "graft_q165_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      TextOps.landDsir(d.filter(col("doc_id") % 11 === 0),
        d.filter(col("doc_id") % 11 =!= 0), "text", idx, dim = 1024,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      TextOps.dsirScoreIndexed(d, "doc_id", "text", idx)
        .orderBy(col("doc_id"))
    }),

    "q166_unimax_budgets" -> ((s: SparkSession, dir: String) => {
      // UniMax (arXiv:2304.09151) over the corpus's per-language char
      // counts: budget = 1.4x total chars, cap = 2 epochs — at sf0.01 the
      // two smallest languages cap and the other three split the freed
      // budget (+remainder), so the oracle exercises BOTH branches of the
      // closed-form water-filling. The one-row total collect is bounded
      // by construction (the resampleToMixtureTokens convention).
      val counts = t(s, dir, "documents").groupBy(col("lang"))
        .agg(sum(coalesce(col("n_chars"), lit(0L))).as("n_chars_total"))
      val total = counts.agg(sum(col("n_chars_total"))).head().getLong(0)
      graft.ops.SampleOps.unimaxBudgets(counts, "lang", "n_chars_total",
        totalBudget = total * 14L / 10L, maxEpochsMicro = 2000000L)
        .orderBy(col("lang"))
    }),

    "q151_quality_gate" -> ((s: SparkSession, dir: String) => {
      // the per-document filter report (C4/Gopher/FineWeb release
      // convention): kept verdict, first-failing rule (funnel
      // attribution), all failing rules (independent attribution). The
      // failed_rules array rides out joined to VARCHAR — the comparator
      // cannot sort ARRAY columns (verify recipe)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"),
        col("lang"))
      graft.ops.GateOps.gate(d,
          graft.ops.GateOps.standardTextRules("text", "lang"))
        .select(col("doc_id"), col("kept"), col("fail_first"),
          array_join(col("failed_rules"), ",").as("failed_rules"),
          col("n_failed"))
        .orderBy(col("doc_id"))
    }),

    "q152_gate_funnel" -> ((s: SparkSession, dir: String) => {
      // the per-rule funnel over the same ruleset: one aggregation, one
      // collected row, k result rows built driver-side (bounded by the
      // rule count, never the corpus)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"),
        col("lang"))
      graft.ops.GateOps.gateFunnel(d,
        graft.ops.GateOps.standardTextRules("text", "lang"))
    }),

    "q150_near_dup_matches" -> ((s: SparkSession, dir: String) => {
      // the audit companion of the against-index drop path: WHICH landed
      // docs matched, and how strongly. Perturbed copies match their one
      // base (high jaccard), exact copies match at 1.0, fresh docs emit
      // no row (sparse report)
      val idx = "graft_q150_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") % 5 =!= 0 && col("doc_id") < 300)
      DedupOps.landNearDupIndex(ref, "text", idx, numHashes = 64,
        bands = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      val probes = d.filter(col("doc_id") % 5 =!= 0 && col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 =!= 0 &&
            col("doc_id") >= 100 && col("doc_id") < 110)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 5 === 0 && col("doc_id") < 100))
      DedupOps.nearDupMatchesAgainstIndex(probes, "doc_id", "text", idx,
          threshold = 0.5)
        .orderBy(col("doc_id"))
    }),

    "q149_cdc_delta" -> ((s: SparkSession, dir: String) => {
      // the content-addressed delta-storage report between the q84
      // corpus versions (every-7th doc removed, every-5th edited, 15
      // vowel-rotated genuinely-new docs appended): unchanged docs cost
      // zero new chars, edited docs cost ~their tail chunk, new docs
      // cost everything — the one-row release summary
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val newer = d.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text", when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" edited"))).otherwise(col("text")))
        .select((col("doc_id") + 2000000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") < 15)
          .select((col("doc_id") + 3000000).as("doc_id"),
            translate(col("text"), "aeiou", "xyzvw").as("text")))
      TextOps.cdcDeltaReport(d, newer, "doc_id", "text",
        minLen = 16, maskBits = 4, maxLen = 64)
    }),

    "q148_cdc_chunks" -> ((s: SparkSession, dir: String) => {
      // content-defined chunking resync property: each edited copy
      // (+1000000, a preamble INSERTED at the front) shares almost all
      // its chunks with its original — the delta-dedup signal a
      // fixed-size chunker would lose entirely (every boundary shifts)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .filter(col("doc_id") < 100)
      val edited = d.select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("zq inserted preamble token "), col("text")).as("text"))
      val chunks = TextOps.cdcChunks(d.unionByName(edited), "doc_id",
        "text", minLen = 16, maskBits = 4, maxLen = 64)
      val orig = chunks.filter(col("doc_id") < 1000000)
        .select(col("doc_id").as("orig_id"), col("chunk_hash")).distinct()
      val cop = chunks.filter(col("doc_id") >= 1000000)
        .select(col("doc_id"), (col("doc_id") - 1000000).as("orig_id"),
          col("chunk_hash"))
      val totals = cop.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"))
      val shared = cop
        .join(orig, Seq("orig_id", "chunk_hash"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      totals.join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    "q147_domain_stats" -> ((s: SparkSession, dir: String) => {
      // web-crawl audit: per-registrable-domain rows/bytes/share over a
      // synthesized URL column exercising subdomains, a co.uk multi-part
      // suffix, a port, an IPv4 host, and junk (null-domain bucket)
      val id = col("doc_id")
      val url = when(pmod(id, lit(6L)) === 0,
          concat(lit("https://cdn."), col("source"), lit(".co.uk/p")))
        .when(pmod(id, lit(6L)) === 1,
          concat(lit("https://sub."), col("source"), lit(".net/x")))
        .when(pmod(id, lit(6L)) === 2, lit("http://192.168.0.1/admin"))
        .when(pmod(id, lit(6L)) === 3, lit("not a url"))
        .otherwise(concat(lit("HTTPS://WWW."), col("source"),
          lit(".Example.COM:8443/page")))
      TextOps.domainStats(
          t(s, dir, "documents").withColumn("url", url), "url", "text")
        .orderBy(col("domain").asc_nulls_first)
    }),

    "q144_hybrid_rrf" -> ((s: SparkSession, dir: String) => {
      // hybrid retrieval: BM25 top-20 for a 3-term query fused with the
      // cosine top-20 around vec 0 (vec_id == doc_id in the testdata) by
      // reciprocal-rank fusion — integer 1e9 DIV (60 + rank) units, so
      // the fusion is exactly oracle-able on top of the two established
      // ranking contracts
      val d = t(s, dir, "documents")
      val e = t(s, dir, "embeddings")
      val bm = graft.ops.SearchOps.bm25TopK(d, "doc_id", "text",
          terms = Seq("spark", "query", "filter"), k = 20)
        .select(col("doc_id"), col("rank"))
      val cos = SimOps.cosineTopK(e, e.filter(col("vec_id") === 0),
          "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.ops.SearchOps.rrfFuse(Seq("bm25" -> bm, "cos" -> cos),
          "doc_id", k = 10)
        .orderBy(col("rank"))
    }),

    "q145_corpus_containment" -> ((s: SparkSession, dir: String) => {
      // dataset-release audit: what fraction of corpus B's distinct
      // trigrams is already in corpus A? B = the odd half plus copies of
      // 30 even docs, so the containment is genuinely mixed
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val a = d.filter(col("doc_id") % 2 === 0)
      val b = d.filter(col("doc_id") % 2 === 1)
        .unionByName(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 60)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      DedupOps.corpusContainment(a, "text", b, "text", shingleSize = 3)
    }),

    "q146_temperature_sample" -> ((s: SparkSession, dir: String) => {
      // multilingual-style temperature rebalancing: per-source keep rates
      // follow n^0.5 shares toward a 200-row budget; the md5 gate makes
      // the kept set a pure function of (salt, doc_id)
      graft.ops.SampleOps.temperatureSampleByHash(t(s, dir, "documents"),
          "doc_id", "source", alpha = 0.5, targetRows = 200)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "q143_stream_ingest_replay" -> ((s: SparkSession, dir: String) => {
      // the STREAMING steady-state ingest composite
      // (StreamOps.dedupAgainstIndexBatch) driven as two micro-batches —
      // the same foreachBatch body Structured Streaming would invoke,
      // with the sink collecting accepted rows. Exercises all four legs:
      // WITHIN-batch near-dedup (+6000000 perturbed copies drop in batch
      // 0, +9100000 second-variants drop in batch 1), the index PROBE
      // (batch-0 base docs are disjoint from the landed corpus and
      // survive), the APPEND (+7000000 perturbed copies of batch-0
      // accepted docs are caught ONLY because batch 0 folded back), and
      // novel-text survival (+8000000/+9000000 vowel-rotations)
      val idx = "graft_q143_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      DedupOps.landNearDupIndex(d.filter(col("doc_id") % 5 =!= 0), "text",
        idx, numHashes = 64, bands = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      val m5 = d.filter(col("doc_id") % 5 === 0)
      val b1 = m5.filter(col("doc_id") < 300)
        .unionByName(m5.filter(col("doc_id") < 40)
          .select((col("doc_id") + 6000000).as("doc_id"),
            concat(col("text"), lit(" perturbed tail token")).as("text")))
      val b2 = m5.filter(col("doc_id") < 100)
        .select((col("doc_id") + 7000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
        .unionByName(m5.filter(col("doc_id") >= 100 && col("doc_id") < 200)
          .select((col("doc_id") + 8000000).as("doc_id"),
            translate(col("text"), "aeiou", "xyzvw").as("text")))
        .unionByName(m5.filter(col("doc_id") >= 200 && col("doc_id") < 240)
          .select((col("doc_id") + 9000000).as("doc_id"),
            translate(col("text"), "aeiou", "xyzvw").as("text")))
        .unionByName(m5.filter(col("doc_id") >= 200 && col("doc_id") < 240)
          .select((col("doc_id") + 9100000).as("doc_id"),
            concat(translate(col("text"), "aeiou", "xyzvw"),
              lit(" extra tail token")).as("text")))
      val accepted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val body = graft.streaming.StreamOps.dedupAgainstIndexBatch(
        "doc_id", "text", idx, threshold = 0.5) { (df, bid) =>
          accepted += df.select(lit(bid).as("batch_id"), col("doc_id")) }
      body(b1, 0L)
      body(b2, 1L)
      accepted.reduce(_.unionByName(_))
        .orderBy(col("batch_id"), col("doc_id"))
    }),

    "q180_watermark_replay" -> ((s: SparkSession, dir: String) => {
      // the WATERMARK late-data contract on the REAL micro-batch engine
      // (not a foreachBatch replay): a file-source stream (one parquet
      // file per trigger, mod-time + name ordered) drives a watermarked
      // 1-day windowed count through three batches. Batch 0 = the live
      // head [Jan 25, Jan 30) plus a '__clock' row at Jan 31 00:00 that
      // pins the watermark to exactly Jan 30 00:00 (24 h delay). Batch 1
      // = the planted late rows: every event before Jan 25 (window end
      // <= watermark -> the engine MUST drop them) and the whole Jan 30
      // day (within horizon -> MUST keep). Batch 2 = a '__flush' anchor
      // at Feb 10 that finalizes every data window. The append-mode
      // output therefore equals the BATCH rule the drop semantics reduce
      // to — counts over ts >= Jan 25 exactly — which is the oracle.
      val base = s"${sys.props("java.io.tmpdir")}/graft_wm/" +
        math.abs(dir.hashCode).toString + "_" +
        java.lang.ProcessHandle.current().pid().toString
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete(): Unit
      }
      rmrf(new java.io.File(base))
      val inDir = new java.io.File(s"$base/in")
      inDir.mkdirs()
      val ev = t(s, dir, "events").select(col("ts"), col("event_type"))
      def plant(tsLit: String, tpe: String) =
        s.range(1).select(to_timestamp(lit(tsLit)).as("ts"),
          lit(tpe).as("event_type"))
      val b0 = ev.filter(col("ts") >= lit("2024-01-25") &&
          col("ts") < lit("2024-01-30"))
        .unionByName(plant("2024-01-31 00:00:00", "__clock"))
      // the late-event filter uses the PREVIOUS batch's committed
      // watermark (SPARK-24634's two-phase rule: lateEvents wm lags
      // eviction wm by one batch), so a spacer trigger must sit between
      // the clock and the stragglers for the Jan 30 watermark to be the
      // one the stragglers are judged against — with MemoryStream the
      // automatic no-data batch provides this gap; a file source running
      // back-to-back triggers does not
      val b1 = plant("2024-01-31 00:00:00", "__clock")
      val b2 = ev.filter(col("ts") < lit("2024-01-25"))
        .unionByName(ev.filter(col("ts") >= lit("2024-01-30")))
      val b3 = plant("2024-02-10 00:00:00", "__flush")
      Seq(b0, b1, b2, b3).zipWithIndex.foreach { case (df, i) =>
        val stage = s"$base/stage$i"
        df.repartition(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val target = new java.io.File(inDir, s"b$i.parquet")
        java.nio.file.Files.move(part.toPath, target.toPath)
        target.setLastModified(60000L * (i + 1)): Unit
      }
      val schema = StructType(Seq(StructField("ts", TimestampType),
        StructField("event_type", StringType)))
      // state-store instances (and their per-batch checkpoint files)
      // scale with shuffle partitions; a 4-trigger replay over one small
      // table doesn't need 32 of them (measured 2x wall: 4.5 vs 8-12 s
      // at sf0.1). The override lives in a DEDICATED newSession() — same
      // SparkContext, isolated SQLConf — so a concurrently-planned query
      // in the caller's session keeps its own partition count (a bare
      // s.conf.set here would silently re-plan it under 8). The memory
      // sink's temp view registers in this private session too, so bench
      // reps don't accumulate sink tables in the caller's catalog. At
      // cluster scale the count comes from the session, sized to the
      // executor fleet.
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      val src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(inDir.getPath)
      val agg = src.withWatermark("ts", "24 hours")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val qn = "graft_q180_sink_" + java.lang.Long.toHexString(
        java.lang.System.nanoTime())
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName(qn)
        .option("checkpointLocation", s"$base/ckpt").start()
      try q.processAllAvailable() finally q.stop()
      ss.table(qn)
        .filter(!col("event_type").isin("__clock", "__flush"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    "q181_qc_chain_golden" -> ((s: SparkSession, _: String) => {
      // The §2.5 composition end-to-end against REFERENCE-EXECUTED parquet
      // (scripts/gen_golden_oracle.py q181 section): the full QC chain
      //   ctd source -> despike(2,20,100) -> pressCheck -> split.down
      //   -> bindataAverage(1.0)
      // over the four real .cnv.gz casts — graft.BenchChain's workload —
      // melted to long (cast_id, bin-mid pressure, channel, value).
      // Despike runs over ALL double channels (the flags interact with
      // nothing, but this keeps the chain the reference's df.apply
      // shape) in refExact mode (r15): the rolling stats replay the
      // reference's numpy.ma arithmetic bit-for-bit (dsp.NumpyPairwise),
      // so engine flags and bin means match the reference on EVERY
      // channel — this query anchors the 13 continuously-varying sensor
      // channels, q181b anchors the 16 step-quantized ones, with no
      // excluded cells anywhere.
      // Quantization: floor(value*1e5 + 1/pi) in DOUBLE arithmetic on both
      // sides. Not round(): Spark HALF_UP vs DuckDB differ on exact
      // halves. Not +0.5 either: the sensor data is decimal-quantized, so
      // bin means land EXACTLY on .5 boundaries where pandas' Kahan group
      // mean and the engine's plain-sum mean differ by 1 ULP (192 of
      // 37,908 cells measured). The irrational offset puts the boundary
      // where no decimal-quantized mean can sit: measured min distance to
      // a boundary is 1.1e-4 grid units (1.1e-9 absolute) vs ~1e-13 ULP
      // noise — GoldenChainSpec guards that margin on the committed
      // parquet.
      val (binned, _) = qcChainBinned(s)
      binned.unpivot(Array(col("cast_id"), col("pressure")),
          qcChainChannels.map(col).toArray, "channel", "value")
        .select(col("cast_id"), col("pressure"), col("channel"),
          floor(col("value") * lit(1e5) + lit(0.31830988618)).as("value_q5"))
        .orderBy(col("cast_id"), col("pressure"), col("channel"))
    }),

    "q181b_qc_chain_full" -> ((s: SparkSession, _: String) => {
      // The OTHER half of the q181 anchor (VERDICT r13 #2): the 16
      // step-quantized channels (altimeter, raw voltages, PAR, lat/lon,
      // oxygen saturation, bottle/pump/flag columns) that q181 documents
      // out — so ALL 29 reference channels are now hash-anchored.
      // On these channels many points sit exactly AT the despike
      // |x - mean| = n*std threshold, where the keep/flag decision is
      // made by summation-order ulps. r14 ENUMERATED the 86 divergent
      // cells as an anti-joined flip list; r15 RETIRED it: the chain's
      // despike runs refExact — the reference's own numpy.ma arithmetic
      // (pairwise sums, fill-zero masking, the masked-slot/tail
      // data-leak warts; see CastOps.despike and dsp.NumpyPairwise) —
      // so EVERY one of the 46,656 cells matches the reference-executed
      // golden bit-for-bit with no exclusion (gen_q181b_flips.py
      // verifies 0 flips; GoldenOracleSpec pins the committed list
      // empty).
      val (binned, valueCols) = qcChainBinned(s)
      val excludedChannels = valueCols.filterNot(qcChainChannels.contains)
      binned.unpivot(Array(col("cast_id"), col("pressure")),
          excludedChannels.map(col).toArray, "channel", "value")
        .select(col("cast_id"), col("pressure"), col("channel"),
          floor(col("value") * lit(1e5) + lit(0.31830988618)).as("value_q5"))
        .orderBy(col("cast_id"), col("pressure"), col("channel"))
    }),

    "q142_rate_spikes_landed" -> ((s: SparkSession, dir: String) => {
      // the PRODUCTION split of q138, and the batch-reconciliation form
      // of StreamOps.streamingRateSpikes (shared spikeJoin — the oracle
      // here covers the streaming composite's semantics): history
      // (3/4 of events, 'error' withheld) lands the per-type (mu, sigma)
      // baseline; the live quarter contributes only window counts.
      // 'error' windows exercise the unknown-type path: null z, never a
      // flag
      val ev = t(s, dir, "events")
      val history = ev.filter(col("event_id") % 4 =!= 0 &&
        col("event_type") =!= "error")
      val live = ev.filter(col("event_id") % 4 === 0)
      val baseline = graft.ops.EventOps.windowCountBaseline(history, "ts",
        "event_type", "value", widthSeconds = 3600, hopSeconds = 900)
      graft.ops.EventOps.rateSpikesAgainstBaseline(live, baseline, "ts",
          "event_type", "value", widthSeconds = 3600, hopSeconds = 900,
          zThreshold = 1.0)
        .orderBy(col("window_start_us"), col("event_type"))
    }),

    "q141_vocab_coverage" -> ((s: SparkSession, dir: String) => {
      // tokenizer fit: per-doc occurrence-weighted coverage against the
      // corpus's own top-50 vocabulary (the q51 ranking) — low rows are
      // the encoding/language outliers a tokenizer will shatter
      val d = t(s, dir, "documents")
      TextOps.vocabCoverage(d, "doc_id", "text",
          TextOps.vocabulary(d, "doc_id", "text", k = 50))
        .orderBy(col("doc_id"))
    }),

    "q140_phrase_search" -> ((s: SparkSession, dir: String) => {
      // quote-level retrieval: docs containing the exact consecutive
      // phrase "hash join", with match counts — the positional-postings
      // n-way equi-join (term-filtered before any shuffle)
      graft.ops.SearchOps.phraseSearch(t(s, dir, "documents"), "doc_id",
          "text", Seq("hash", "join"))
        .orderBy(col("doc_id"))
    }),

    "q139_dedup_impact" -> ((s: SparkSession, dir: String) => {
      // the dedup impact report: q118's provenance mapping joined back to
      // document sizes — docs in clusters, clusters, dropped docs, bytes
      // saved, integer ppm — the one-row summary a drop decision reads
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      val corpus = d.unionByName(perturbed)
      val mapping = DedupOps.canonicalMapping(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
      val dropped = mapping.filter(col("doc_id") =!= col("canonical_id"))
        .join(corpus, Seq("doc_id"))
        .agg(count(lit(1)).as("n_dropped"),
          coalesce(sum(length(col("text")).cast(LongType)), lit(0L))
            .as("bytes_dropped"))
      val clustered = mapping.agg(count(lit(1)).as("n_docs_in_clusters"),
        count_distinct(col("canonical_id")).as("n_clusters"))
      corpus.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(length(col("text")).cast(LongType)), lit(0L))
            .as("bytes_total"))
        .crossJoin(clustered).crossJoin(dropped)
        .withColumn("drop_ppm",
          expr("bytes_dropped * 1000000 DIV bytes_total"))
    }),

    "q137_profile_segments" -> ((s: SparkSession, dir: String) => {
      // mergeable profiling: three hash-disjoint segments profiled
      // independently, then merged with NO re-scan — exact counts and
      // native-typed min/max (the HLL distinct estimate is spec-pinned;
      // the oracle checks the exactly-mergeable stats)
      val d = t(s, dir, "documents")
      val cols = Seq("doc_id", "lang", "n_chars")
      val segs = (0 until 3).map(i =>
        graft.ops.StatsOps.profileSegment(
          d.filter(pmod(col("doc_id"), lit(3L)) === i), cols))
      graft.ops.StatsOps.mergeProfileSegments(
          segs.reduce(_ unionByName _), cols)
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("min_value"), col("max_value"))
        .orderBy(col("column_name"))
    }),

    "q119_winsorize" -> ((s: SparkSession, dir: String) => {
      // robust per-source length scaling: clamp n_chars into each
      // source's exact [p5, p95] band — one groups-sized percentile agg
      // broadcast back, bounds kept on every row for auditability
      graft.ops.StatsOps.winsorize(
          t(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars", loP = 0.05, hiP = 0.95)
        .orderBy(col("doc_id"))
    }),

    "q120_script_mix" -> ((s: SparkSession, dir: String) => {
      // mixed-script routing signals on a deterministic multi-script
      // corpus: every 3rd doc gains a Cyrillic tail, every 3rd+1 a Han
      // tail — latin/cyrillic/han/digit fractions over non-space chars
      val suffix = when(pmod(col("doc_id"), lit(3L)) === 0,
          lit(" привет мир 42"))
        .when(pmod(col("doc_id"), lit(3L)) === 1, lit(" 你好世界 世界"))
        .otherwise(lit(""))
      TextOps.scriptSignals(
          t(s, dir, "documents")
            .select(col("doc_id"),
              concat(col("text"), suffix).as("text")),
          "text")
        .select(col("doc_id"), col("latin_frac"), col("cyrillic_frac"),
          col("han_frac"), col("digit_frac"))
        .orderBy(col("doc_id"))
    }),

    "q118_canonical_mapping" -> ((s: SparkSession, dir: String) => {
      // the dedup provenance table (q48's planted clusters): every doc in
      // a duplicate cluster mapped to its surviving canonical — what a
      // consumer needs to re-attribute metadata after the drop
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      DedupOps.canonicalMapping(d.unionByName(perturbed), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
        .orderBy(col("doc_id"))
    }),

    "q167_leakage_free_split" -> ((s: SparkSession, dir: String) => {
      // leakage-free train/eval split over q118's planted-twin corpus:
      // every doc takes the hash split of its near-dup CANONICAL, so the
      // 50 perturbed twins provably land in the same split as their
      // originals (the oracle checks every assignment, which pins that
      // property row-for-row)
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val perturbed = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
      val corpus = d.unionByName(perturbed)
      val canon = DedupOps.canonicalMapping(corpus, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucket = 100)
      graft.ops.SampleOps.leakageFreeSplit(corpus, "doc_id", canon,
          nSplits = 10)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "q176_data_card" -> ((s: SparkSession, dir: String) => {
      // the per-source DATA CARD — the release table every model ships:
      // docs, chars, mean length, exact-dup ppm (digest-keyed distinct:
      // bodies never shuffle on the engine side), and the keep rate under
      // a simple length+blocklist gate. One groupBy; every column integer
      val d = t(s, dir, "documents")
      val hits = TextOps.blocklistHits(col("text"), q174Phrases)
      d.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_chars"), lit(0L))).as("n_chars_total"),
          count_distinct(sha2(col("text"), 256)).as("distinct_texts"),
          sum(when(coalesce(col("n_chars"), lit(0L)) >= 150 &&
            hits === 0, 1L).otherwise(0L)).as("kept_docs"))
        .select(col("source"), col("n_docs"), col("n_chars_total"),
          expr("n_chars_total div n_docs").as("mean_chars"),
          expr("((n_docs - distinct_texts) * 1000000) div n_docs")
            .as("dup_ppm"),
          expr("(kept_docs * 1000000) div n_docs").as("kept_ppm"))
        .orderBy(col("source"))
    }),

    "q175_jsonl_ingest" -> ((s: SparkSession, dir: String) => {
      // the export->ingest round-trip with a POISONED drop: documents
      // export as JSONL shards, three planted bad lines (truncated JSON,
      // non-JSON text, a type-mismatched field) join the drop, and the
      // quarantining reader must hand back EXACTLY the original rows
      // (the oracle is the source table — any swallowed good row or
      // null-filled bad row breaks the hash) with exactly the 3 poisons
      // quarantined (required loudly)
      import org.apache.spark.sql.types._
      // path is unique per (testdata dir, JVM): two concurrent drivers
      // pointed at the same dir write disjoint directories instead of
      // racing one JSONL round-trip (the oracle reads only the query's
      // OUTPUT, so the suffix changes nothing downstream)
      val tmp = s"${sys.props("java.io.tmpdir")}/graft_jsonl/" +
        math.abs(dir.hashCode).toString + "_" +
        java.lang.ProcessHandle.current().pid().toString
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .write.mode("overwrite").json(tmp)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp, "zz_poison.json"),
        ("""{"doc_id": 99999, "text": "trunc""" + "\n" +
          "this line is not json at all\n" +
          """{"doc_id": "notanumber", "text": "x", "lang": "en", "source": "s", "n_chars": 1}""" + "\n")
          .getBytes("UTF-8"))
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      val (good, quarantine, release) =
        graft.sources.IngestOps.readJsonlQuarantine(s, tmp, schema)
      val nQ = quarantine.count()
      require(nQ == 3, s"expected exactly the 3 planted poisons, got $nQ")
      val out = good.select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
      release() // good re-parses uncached; quarantine is already counted
      out
    }),

    "q174_blocklist_gate" -> ((s: SparkSession, dir: String) => {
      // the C4 blocklist step: per-doc hits of any blocked phrase (one
      // compiled word-boundary alternation, RE2-and-Java-portable so the
      // oracle runs the IDENTICAL pattern text) + the hits==0 keep verdict
      t(s, dir, "documents").select(col("doc_id"),
          TextOps.blocklistHits(col("text"), q174Phrases)
            .as("blocklist_hits"))
        .withColumn("kept", col("blocklist_hits") === 0)
        .orderBy(col("doc_id"))
    }),

    "q171_unimax_resample" -> ((s: SparkSession, dir: String) => {
      // the execution half of q166: UniMax decides per-language token
      // budgets, the md5-31 hash gate ships them — capped languages thin
      // to ~2 epochs' worth, uncapped ones to their equal share; a budget
      // bump would only ADD docs (hash-threshold monotonicity)
      val d = t(s, dir, "documents")
      val counts = d.groupBy(col("lang"))
        .agg(sum(coalesce(col("n_chars"), lit(0L))).as("n_chars_total"))
      val total = counts.agg(sum(col("n_chars_total"))).head().getLong(0)
      val budgets = graft.ops.SampleOps.unimaxBudgets(counts, "lang",
        "n_chars_total", totalBudget = total * 14L / 10L,
        maxEpochsMicro = 2000000L)
      graft.ops.SampleOps.sampleToBudgets(
          d.select(col("doc_id"), col("lang")), "doc_id", "lang", budgets)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "q170_mixture_interleave" -> ((s: SparkSession, dir: String) => {
      // the loader-order half of mixture sampling: a 4:2:1:1 blend over
      // four sources as one deterministic virtual-time schedule — over
      // any window of the vtime order, src0 contributes ~2x src1 and
      // ~4x src2/src3; unweighted sources ship nothing
      graft.ops.SampleOps.mixtureInterleave(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source", q170Weights)
        .select(col("doc_id"), col("source"), col("src_pos"), col("vtime"))
        .orderBy(col("vtime"), col("source"), col("src_pos"))
    }),

    "q169_threshold_sweep" -> ((s: SparkSession, dir: String) => {
      // the keep-curve over DSIR importance: which logw cutoff keeps how
      // many documents/features — q161's scored table swept over five
      // candidate cutoffs in ONE corpus pass (vs re-filtering per
      // candidate); empty top tiers still emit their spine row
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val model = TextOps.trainDsir(d.filter(col("doc_id") % 11 === 0),
        d.filter(col("doc_id") % 11 =!= 0), "text", dim = 1024)
      val scored = TextOps.dsirScore(d, "doc_id", "text", model)
      graft.ops.GateOps.thresholdSweep(scored, "logw_micro", "n_features",
        Seq(-20000000L, -10000000L, -5000000L, 0L, 5000000L))
    }),

    "q168_length_batches" -> ((s: SparkSession, dir: String) => {
      // length-bucketed batching + the padding-waste ledger: per (tier,
      // batch), rows, the batch's pad-to length, and the pad tokens the
      // loader would burn — the report that decides tier boundaries.
      // Bodies never enter: ids + lengths only
      val b = graft.ops.SampleOps.lengthBucketBatches(
        t(s, dir, "documents"), "doc_id", "n_chars",
        boundaries = Seq(150L, 300L, 450L), batchSize = 8)
      b.groupBy(col("bucket"), col("batch_id"))
        .agg(count(lit(1)).as("n_rows"), max(col("len")).as("max_len"),
          sum(col("len")).as("sum_len"))
        .select(col("bucket"), col("batch_id"), col("n_rows"), col("max_len"),
          (col("n_rows") * col("max_len") - col("sum_len")).as("pad_tokens"))
        .orderBy(col("bucket"), col("batch_id"))
    }),

    "q116_weighted_topk" -> ((s: SparkSession, dir: String) => {
      // quality-weighted curation without replacement: keep the 5 docs
      // per language with the largest u^(1/weight) priority (A-ES), u
      // from the md5-31 gate, ranking in integer micro-nats — membership
      // is a pure function of (salt, doc_id, n_chars) on any engine
      graft.ops.SampleOps.weightedTopKPerGroup(
          t(s, dir, "documents"), "lang", "doc_id", "n_chars", k = 5)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
        .orderBy(col("lang"), col("sample_rank"))
    }),

    "q117_corpus_report" -> ((s: SparkSession, dir: String) => {
      // the corpus-audit ROLLUP: per (source, lang) cells, per-source
      // subtotals, and the grand total in one pass — grouping_id
      // disambiguates subtotal rows from genuine null dimension values
      t(s, dir, "documents")
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(TextOps.tokenCount(col("text"))).as("total_tokens"),
          grouping_id().cast(IntegerType).as("gid"))
        .orderBy(col("gid"), col("source"), col("lang"))
    }),

    "q112_pagerank" -> ((s: SparkSession, dir: String) => {
      // link-graph authority in fixed-point long arithmetic (bit-identical
      // on any engine/layout): a deterministic 3-out expander over doc_ids
      // plus hub edges (doc -> doc_id % 16) concentrating rank on 16
      // hubs; 5 power steps, damping 0.85, ranks in pico-units
      val d = t(s, dir, "documents").select(col("doc_id"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val ex = d.crossJoin(broadcast(n))
        .select(col("doc_id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("j"), col("n_docs"))
        .select(col("src"),
          pmod(col("src") * 31 + col("j") * 1009, col("n_docs")).as("dst"))
      val hub = d.select(col("doc_id").as("src"),
        pmod(col("doc_id"), lit(16L)).as("dst"))
      graft.ops.GraphOps.pageRank(ex.unionByName(hub), "src", "dst",
          iters = 5)
        .orderBy(col("rank_u").desc, col("node")).limit(30)
    }),

    "q113_standardize_embeddings" -> ((s: SparkSession, dir: String) => {
      // per-source feature normalization: z-score each (label, dim) cell
      // — the centroid aggregation pattern plus a broadcast stats join
      // back; constant dims -> 0.0, never NaN
      graft.ops.SimOps.standardizeEmbeddings(t(s, dir, "embeddings"),
          "vec_id", "label", "embedding")
        // exploded to (vec_id, dim, z) rows — the q65 oracle-output shape
        // (the comparators don't order array cells)
        .select(col("vec_id"), col("label"),
          posexplode(col("vec_std")).as(Seq("dim", "z")))
        .select(col("vec_id"), col("label"),
          col("dim").cast(LongType).as("dim"), col("z"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    "q114_markup_strip" -> ((s: SparkSession, dir: String) => {
      // web-corpus text extraction: wrap each doc in deterministic HTML
      // (tags, entities, a script element, an anchor), then strip to
      // running text + the link-density boilerplate signal — a fixed
      // RE2-portable regex pipeline the oracle replays verbatim
      val d = t(s, dir, "documents")
      val id = col("doc_id").cast(StringType)
      val html = concat(
        lit("<html><body><h1>Doc "), id,
        lit("</h1><p class=\"main\">"), col("text"),
        lit("</p><a href=\"/d/"), id, lit("\">see &amp; doc "), id,
        lit("</a><script>var x = 1 < 2;</script>"),
        lit("<style>p { color: red }</style>&nbsp;&lt;end&gt;</body></html>"))
      d.select(col("doc_id"),
          TextOps.stripMarkup(html).as("clean_text"),
          TextOps.linkDensity(html).as("link_density"))
        .orderBy(col("doc_id"))
    }),

    "q49_stratified_sample" -> ((s: SparkSession, dir: String) => {
      // corpus rebalancing: downsample the dominant language, keep the rest
      // (map-side pure-function-of-key, like q45's splits)
      graft.ops.SampleOps.stratifiedSampleByHash(t(s, dir, "documents"),
          "doc_id", "lang", Map("en" -> 0.25, "de" -> 0.5))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    "q50_pack_sequences" -> ((s: SparkSession, dir: String) => {
      // pretraining sequence packing: docs -> fixed token-budget packs,
      // greedy in doc_id order within hash splits (one bounded window)
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
      val split = graft.ops.SampleOps.hashSplit(d, "doc_id", 4)
      graft.ops.SampleOps.packSequences(split, "split", "doc_id",
          "n_tokens", budget = 2048L)
        .select(col("doc_id"), col("split"), col("pack_id"), col("pack_offset"))
        .orderBy(col("doc_id"))
    }),

    "q51_vocabulary" -> ((s: SparkSession, dir: String) => {
      // tokenizer-training pre-pass: top-50 tokens with occurrence +
      // document-frequency counts
      TextOps.vocabulary(t(s, dir, "documents"), "doc_id", "text", k = 50)
        .select(col("token"), col("n_occurrences"), col("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
    }),

    "q52_line_dedup" -> ((s: SparkSession, dir: String) => {
      // RefinedWeb-style corpus-frequency segment removal. The synthetic
      // documents are single-line, so the demonstration unit is the token
      // (delimiter " "): segments appearing in > 390 of the 500 docs are
      // boilerplate by the rule and get dropped; reassembly preserves
      // remaining order and spacing exactly.
      graft.ops.DedupOps.lineDedup(t(s, dir, "documents"), "doc_id", "text",
          maxDocFreq = 390, delimiter = " ")
        .select(col("doc_id"), col("text_dedup"), col("n_removed"))
        .orderBy(col("doc_id"))
    }),

    "q53_normalize" -> ((s: SparkSession, dir: String) => {
      // canonical text cleanup (control-strip + NFC). The synthetic docs are
      // pure ASCII, so a deterministic suffix exercises the real paths:
      // combining acute (e+U+0301 -> U+00E9), Angstrom sign (U+212B ->
      // U+00C5), and a BEL control char that must vanish.
      val suffix = " cafe\u0301 \u212B x\u0007y"
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.normalizeText(concat(col("text"), lit(suffix))).as("text_norm"))
        .orderBy(col("doc_id"))
    }),

    "q54_decontaminate_bloom" -> ((s: SparkSession, dir: String) => {
      // q46's semantics on the bloom scale path: distributed sketch build,
      // map-side might_contain prefilter, exact verify semi-join — the
      // approximation never reaches the answer, so the oracle is q46's.
      val d = t(s, dir, "documents")
      DedupOps.contaminatedIdsBloom(d, "doc_id", "text",
          d.filter(col("doc_id") < 3), "text", shingleSize = 5, fpp = 0.01)
        .orderBy(col("doc_id"))
    }),

    "q55_mixture_resample" -> ((s: SparkSession, dir: String) => {
      // data-mixing with upsampling: reshape three sources to 50/25/25 at
      // a 230-row target — src0's rate lands at 4.6 copies (4 full + a
      // hash-gated 5th), src1/src2 at 2.3, everything else drops
      graft.ops.SampleOps.resampleToMixture(t(s, dir, "documents"),
          "doc_id", "source",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25), totalRows = 230)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    "q94_mixture_tokens" -> ((s: SparkSession, dir: String) => {
      // TOKEN-weighted data mixing: the 50/25/25 mix specified in tokens
      // (n_chars as the proxy) — copy rates derive from per-source token
      // SUMS, so a long-doc source replicates fewer documents for the
      // same token mass; same deterministic hash-gated machinery as q55
      graft.ops.SampleOps.resampleToMixtureTokens(t(s, dir, "documents"),
          "doc_id", "source", "n_chars",
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
          totalTokens = 60000)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    "q95_distinct_tokens" -> ((s: SparkSession, dir: String) => {
      // lexical-diversity audit: exact distinct tokens per source (the
      // oracle-checked path; approx = true swaps in mergeable HLL sketches
      // for unbounded cardinality — spec-pinned against this exact answer)
      TextOps.distinctTokens(t(s, dir, "documents"), "source", "text")
        .orderBy(col("source"))
    }),

    "q56_group_centroids" -> ((s: SparkSession, dir: String) => {
      // class-prototype centroids over the embeddings table: map-side
      // explode + partial agg, shuffle carries labels x dim partial sums
      graft.ops.SimOps.groupCentroids(t(s, dir, "embeddings"),
          "label", "embedding")
        .select(col("label"), col("dim").cast("long").as("dim"),
          col("centroid"), col("n_vectors"))
        .orderBy(col("label"), col("dim"))
    }),

    "q57_corpus_stats" -> ((s: SparkSession, dir: String) => {
      // per-source length audit: count, mean, exact p50/p90/p99 of n_chars
      TextOps.groupStats(t(s, dir, "documents"), "source", "n_chars")
        .orderBy(col("source"))
    }),

    "q58_pipeline_e2e" -> ((s: SparkSession, dir: String) => {
      // the whole training-data pipeline end to end, every stage exactly
      // reproducible: exact dedup -> quality gate (>= 0.75) -> token count
      // -> deterministic 4-way split -> 2048-token sequence packing
      val docs = t(s, dir, "documents")
      val deduped = DedupOps.exactDedup(docs, "doc_id", "text")
      val gated = TextOps.qualityScore(deduped, "text")
        .filter(col("quality") >= 0.75)
      val counted = gated.withColumn("n_tokens", TextOps.tokenCount(col("text")))
      val split = graft.ops.SampleOps.hashSplit(counted, "doc_id", 4)
      graft.ops.SampleOps.packSequences(split, "split", "doc_id",
          "n_tokens", budget = 2048L)
        .select(col("doc_id"), col("quality"), col("n_tokens"), col("split"),
          col("pack_id"), col("pack_offset"))
        .orderBy(col("doc_id"))
    }),

    "q60_deterministic_shuffle" -> ((s: SparkSession, dir: String) => {
      // epoch reshuffle as a pure hash function: the salted shuffle key IS
      // the permutation (order by it + tie-break), so the oracle verifies
      // the full ordering without a global row_number window; emitKeyCol
      // sorts on the one materialized hash (no duplicate computation)
      graft.ops.SampleOps.deterministicShuffle(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", salt = "epoch1", emitKeyCol = Some("shuffle_key"))
    }),

    "q61_chunk_documents" -> ((s: SparkSession, dir: String) => {
      // context-window chunking: 16-token windows, 2-token overlap
      // (the char_start/char_end provenance columns are q69's surface)
      TextOps.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
          maxTokens = 16, overlap = 2)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"),
          col("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "q69_chunk_offsets" -> ((s: SparkSession, dir: String) => {
      // chunk provenance: each chunk's 1-based character span in the
      // ORIGINAL text, plus the substring round-trip a RAG display needs —
      // the passage is recomputed from (text, char_start, char_end) so the
      // oracle verifies the offsets, not just the token join
      val docs = t(s, dir, "documents")
      TextOps.chunkDocuments(docs, "doc_id", "text",
          maxTokens = 16, overlap = 2, keep = Seq("text"))
        .select(col("doc_id"), col("chunk_id"), col("char_start"), col("char_end"),
          col("text").substr(col("char_start").cast("int"),
            (col("char_end") - col("char_start") + 1).cast("int")).as("passage"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "q62_dedup_against" -> ((s: SparkSession, dir: String) => {
      // rolling-ingest dedup: docs with id < 100 stand in for the already-
      // landed corpus; the incoming batch keeps only texts not seen there
      val d = t(s, dir, "documents")
      DedupOps.exactDedupAgainst(d, "text", d.filter(col("doc_id") < 100), "text")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q64_hashing_tf" -> ((s: SparkSession, dir: String) => {
      // fixed-width featurizer: 64-bucket hashed term frequencies, emitted
      // as (doc, bucket, n) rows (non-zero only) for the oracle compare
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(TextOps.hashingTfVector(col("text"), 64))
            .as(Seq("bucket", "n")))
        .where(col("n") > 0)
        .select(col("doc_id"), col("bucket").cast("long").as("bucket"), col("n"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    "q65_l2_normalize" -> ((s: SparkSession, dir: String) => {
      // normalize-at-ingest: unit-norm embeddings as (vec_id, dim, value)
      // rows — after this every downstream dot product is a cosine
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(SimOps.l2Normalize(col("embedding"))).as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          round(col("v"), 6).as("val"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    "q91_random_projection" -> ((s: SparkSession, dir: String) => {
      // JL dimensionality reduction at ingest: 64 -> 16 dims via a
      // deterministic pre-scaled Gaussian matrix (native one-pass kernel,
      // matrix as a codegen reference object) — downstream ANN scans and
      // shuffles carry a quarter of the bytes. Output in integer
      // micro-units: DuckDB's dot-product kernels sum VECTORIZED (±1 ulp
      // vs the strict left-to-right fold — measured, not hypothetical;
      // it cost this query a hash at sf0.1 when one raw double crossed
      // the comparator's 12-sig-digit boundary), so raw-double equality
      // is not an engine-portable contract; floor(x*1e6 + 0.5) is.
      val m = SimOps.projectionMatrix(outDim = 16, dim = 64)
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(SimOps.randomProject(col("embedding"), m)).as(Seq("dim", "p")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          floor(col("p") * 1000000d + lit(0.5)).as("proj_micro"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    "q92_ann_projected" -> ((s: SparkSession, dir: String) => {
      // exact cosine top-k in the PROJECTED 16-dim space — the
      // reduced-dimension ANN path (project once at ingest, search cheap
      // forever); q29's contract shape, oracle-exact end to end
      val m = SimOps.projectionMatrix(outDim = 16, dim = 64)
      val proj = t(s, dir, "embeddings")
        .select(col("vec_id"), SimOps.randomProject(col("embedding"), m).as("p"))
      SimOps.cosineTopK(proj, proj.filter(col("vec_id") < 20), "vec_id", "p", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q66_hashing_tfidf" -> ((s: SparkSession, dir: String) => {
      // the featurizer capstone: hashed TF re-weighted by smoothed idf
      TextOps.hashingTfIdf(t(s, dir, "documents"), "doc_id", "text", dim = 64)
        .orderBy(col("doc_id"), col("bucket"))
    }),

    "q67_hashing_tf_sparse" -> ((s: SparkSession, dir: String) => {
      // the scale-safe featurizer: sparse (bucket, tf) structs — must emit
      // exactly q64's rows (same md5 buckets, non-zero only) without ever
      // allocating a dim-wide vector
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.hashingTfSparseVector(col("text"), 64)).as("bt"))
        .select(col("doc_id"), col("bt.bucket").as("bucket"), col("bt.tf").as("n"))
        .orderBy(col("doc_id"), col("bucket"))
    }),

    "q68_score_linear" -> ((s: SparkSession, dir: String) => {
      // trained-model scoring at scan speed: sigmoid(w · tf + b) in one
      // native pass per document. Weights are dyadic rationals (k/1024, |k|
      // <= 10) so every partial sum is exact in doubles and the oracle's
      // arbitrary summation order cannot diverge; only exp() can differ
      // across engines (by an ulp), absorbed by round(6).
      val w = Array.tabulate(64)(b => ((b * 37 % 21) - 10) / 1024.0)
      TextOps.scoreLinear(t(s, dir, "documents"), "doc_id", "text", w, bias = 0.25)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"))
    }),

    "q70_quantize_embeddings" -> ((s: SparkSession, dir: String) => {
      // storage-side int8 quantization: (vec_id, scale, dim, q) rows; the
      // floor-based half-up rounding makes the kernel exactly replayable
      // in any engine (round() half conventions differ; floor does not)
      t(s, dir, "embeddings")
        .select(col("vec_id"), SimOps.quantizeInt8(col("embedding")).as("qs"))
        .select(col("vec_id"), col("qs.scale").as("scale"),
          posexplode(col("qs.q")).as(Seq("dim", "q")))
        .select(col("vec_id"), round(col("scale"), 9).as("scale"),
          col("dim").cast("long").as("dim"), col("q"))
        .orderBy(col("vec_id"), col("dim"))
    }),

    "q73_asof_join" -> ((s: SparkSession, dir: String) => {
      // point-in-time join: every non-reference event picks up the value of
      // the latest reference event (event_id % 20 == 0) at-or-before its
      // timestamp, per user. The reference side is pre-aggregated to one
      // row per (user, ts) so the as-of winner is unambiguous; ts is
      // TIMESTAMP(MICROS, NTZ) in the testdata at every sf, joined under
      // the pinned-UTC session. The oracle orders on epoch_ns(ts) — an
      // equally monotone key (micros * 1000), so the as-of winner matches
      val ev = t(s, dir, "events")
      val ref = ev.filter(col("event_id") % 20 === 0)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("ref_value"))
      val lhs = ev.filter(col("event_id") % 20 =!= 0)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      graft.ops.JoinOps.asofJoin(lhs, ref, "user_id", "ts", Seq("ref_value"))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 6).as("value"),
          round(col("ref_value_asof"), 6).as("ref_value_asof"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q74_near_dedup_against" -> ((s: SparkSession, dir: String) => {
      // incremental ingest vs landed corpus: the increment is a disjoint
      // doc slice plus perturbed copies of 40 landed docs (guaranteed
      // near-dups that exact digests would miss); survivors are the
      // genuinely new documents
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") % 5 =!= 0)
      val inc = d.filter(col("doc_id") % 5 === 0).unionByName(
        ref.filter(col("doc_id") < 50)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" perturbed tail token")).as("text")))
      DedupOps.nearDedupAgainst(inc, "doc_id", "text", ref, "text",
          numHashes = 64, bands = 16, threshold = 0.5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q75_near_dedup_indexed" -> ((s: SparkSession, dir: String) => {
      // q74's steady-state shape: the landed corpus' shingles + band keys
      // persist as bucketed index tables (land-once per session), and each
      // ingest probes them with zero landed-side recompute or shuffle. Same
      // oracle as q74 — the index path must be row-identical to the direct
      // path.
      val idx = "graft_q75_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") % 5 =!= 0)
      DedupOps.landNearDupIndex(ref, "text", idx, numHashes = 64, bands = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      val inc = d.filter(col("doc_id") % 5 === 0).unionByName(
        ref.filter(col("doc_id") < 50)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" perturbed tail token")).as("text")))
      DedupOps.nearDedupAgainstIndex(inc, "doc_id", "text", idx, threshold = 0.5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q78_near_dedup_index_append" -> ((s: SparkSession, dir: String) => {
      // index MAINTENANCE (two-day ingest): day-1 survivors fold back into
      // the landed index via appendNearDupIndex, so day 2 catches near-dups
      // of day-1 ACCEPTED docs — perturbed day-1 copies are caught only
      // because of the append, perturbed corpus copies by the day-0 index,
      // and vowel-rotated novel texts survive
      val idx = "graft_q78_" + math.abs(dir.hashCode).toString
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") % 5 =!= 0)
      DedupOps.landNearDupIndex(ref, "text", idx, numHashes = 64, bands = 16,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$idx"))
      val inc1 = d.filter(col("doc_id") % 5 === 0)
      val acc1 = DedupOps.nearDedupAgainstIndex(inc1, "doc_id", "text", idx,
        threshold = 0.5)
      DedupOps.appendNearDupIndex(acc1, "text", idx)
      val inc2 = d.filter(col("doc_id") % 5 === 0 && col("doc_id") < 250)
        .select((col("doc_id") + 3000000).as("doc_id"),
          concat(col("text"), lit(" perturbed tail token")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 =!= 0 && col("doc_id") < 50)
          .select((col("doc_id") + 4000000).as("doc_id"),
            concat(col("text"), lit(" perturbed tail token")).as("text")))
        .unionByName(d.filter(col("doc_id") % 5 === 0 && col("doc_id") < 100)
          .select((col("doc_id") + 5000000).as("doc_id"),
            translate(col("text"), "aeiou", "xyzvw").as("text")))
      DedupOps.nearDedupAgainstIndex(inc2, "doc_id", "text", idx,
          threshold = 0.5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "q72_cap_per_group" -> ((s: SparkSession, dir: String) => {
      // per-source quota: at most 15 docs per source, chosen by salted key
      // hash (deterministic representatives across reruns; 25 docs/source
      // at sf0.01, so the cap genuinely binds)
      graft.ops.SampleOps.capPerGroup(t(s, dir, "documents"),
          "source", "doc_id", n = 15)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "q71_ann_quantized" -> ((s: SparkSession, dir: String) => {
      // q29's top-k over the int8 codes: the symmetric scale cancels in the
      // cosine, integer dots are exact in doubles at any summation order,
      // so the quantized ANN path is exactly oracle-able end to end
      val e = t(s, dir, "embeddings")
      SimOps.cosineTopKQuantized(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    "q47_bucketed_qc" -> ((s: SparkSession, dir: String) => {
      // the land-once / query-many operating pattern as part of the VERIFIED
      // surface (not only PlanShapeSpec): events lands ONCE per session as a
      // bucketed table (bucketBy user_id, sortBy user_id+event_id), then the
      // QC chain (split direction + moving average) runs from the bucketed
      // scan with zero hash exchanges. Values are independent of the landing,
      // so the DuckDB oracle is the plain q07+q08 composition over events.
      val tbl = "graft_q47_" + math.abs(dir.hashCode).toString
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"), col("value"))
      val b = graft.sources.BucketedLand.landOnce(ev, tbl, "user_id",
        Seq("user_id", "event_id"), buckets = 8,
        path = Some(s"${sys.props("java.io.tmpdir")}/graft_bucketed/$tbl"))
      val chained = Cast.movingAverage(
        Cast.split(b, "user_id", "event_id", "value"),
        "user_id", "event_id", Seq("value"), 5)
      chained.select(col("user_id"), col("event_id"), col("direction"),
          round(col("value"), 6).as("value_ma"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q39_set_ops" -> ((s: SparkSession, dir: String) => {
      // §2.6 set-operation surface: users active in both halves of the
      // event stream, minus a blocklist (intersect + except). The midpoint
      // is a broadcast 1-row aggregate joined in (a scalar subquery), NOT a
      // driver-side .first() — an eager action inside query construction
      // cost an extra scan per invocation (VERDICT r3 #5).
      val ev = t(s, dir, "events")
      val mid = ev.agg((max(col("event_id")) / 2).as("__mid"))
      val evm = ev.crossJoin(broadcast(mid))
      val early = evm.filter(col("event_id") <= col("__mid")).select(col("user_id"))
      val late  = evm.filter(col("event_id") > col("__mid")).select(col("user_id"))
      val blocked = ev.filter(col("user_id") % 17 === 0).select(col("user_id"))
      early.intersect(late).except(blocked)
        .orderBy(col("user_id"))
    }),
  )


  /** q42's DuckDB oracle, shared verbatim by q76 (landed-index path): the
    * codebook is data-derived (vec_id < 16) so the oracle needs no
    * literals; cosine folds are DOUBLE[] list_inner_product = bit-exact. */
  private val IvfOracleSql: String =
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), c AS (
        |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16
        |), assign AS (
        |  SELECT e.vec_id, e.v, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      CASE WHEN sqrt(list_inner_product(e.v, e.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
        |        THEN list_inner_product(e.v, c.cv)
        |             / (sqrt(list_inner_product(e.v, e.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)))
        |        ELSE 0.0 END DESC, c.cent_id) AS rn
        |  FROM e CROSS JOIN c
        |), cell AS (
        |  SELECT vec_id, v, cent_id AS cl FROM assign WHERE rn = 1
        |), probes AS (
        |  SELECT q.vec_id AS query_id, q.v AS qv, c.cent_id AS cl,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      CASE WHEN sqrt(list_inner_product(q.v, q.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
        |        THEN list_inner_product(q.v, c.cv)
        |             / (sqrt(list_inner_product(q.v, q.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)))
        |        ELSE 0.0 END DESC, c.cent_id) AS prn
        |  FROM e q CROSS JOIN c WHERE q.vec_id < 5
        |), scored AS (
        |  SELECT p.query_id, ce.vec_id AS neighbor_id,
        |    round(CASE WHEN sqrt(list_inner_product(p.qv, p.qv))
        |                    * sqrt(list_inner_product(ce.v, ce.v)) > 0
        |      THEN list_inner_product(p.qv, ce.v)
        |           / (sqrt(list_inner_product(p.qv, p.qv))
        |              * sqrt(list_inner_product(ce.v, ce.v)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM probes p JOIN cell ce ON ce.cl = p.cl
        |  WHERE p.prn <= 4 AND ce.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Shared CTE prefix of the q79/q80 semantic-dedup oracles: q40's
    * planted-copies corpus, the data-derived codebook — the
    * `clamp(ceil(n/128), 16, 2^20)` LOWEST ids of the unioned corpus
    * (`SimOps.derivedCellsHier`, the r15 lifted ceiling), the exact
    * occupancy-targeting formula `semanticDedupPairs` derives for
    * `nCells <= 0` (dense 0-based vec_ids, so lowest-k-ids == id < k)
    * — argmax-cosine cell assignment, then within-cell pairs at cosine
    * >= 0.9. All folds are DOUBLE[] list_inner_product — bit-exact vs
    * the native expressions. The flat assignment replayed here is the
    * engine's path for every derived count <= FlatAssignMaxCells; the
    * oracle scales sit on the 16-cell floor. */
  private val SemanticDedupCtes: String =
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 20
        |), ncells AS (
        |  SELECT least(1048576, greatest(16,
        |    CAST(ceil(count(*) / 128.0) AS BIGINT))) AS k
        |  FROM base
        |), c AS (
        |  SELECT vec_id AS cent_id, v AS cv FROM base
        |  WHERE vec_id < (SELECT k FROM ncells)
        |), assign AS (
        |  SELECT b.vec_id, b.v, c.cent_id,
        |    row_number() OVER (PARTITION BY b.vec_id ORDER BY
        |      CASE WHEN sqrt(list_inner_product(b.v, b.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
        |        THEN list_inner_product(b.v, c.cv)
        |             / (sqrt(list_inner_product(b.v, b.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)))
        |        ELSE 0.0 END DESC, c.cent_id) AS rn
        |  FROM base b CROSS JOIN c
        |), cell AS (
        |  SELECT vec_id, v, cent_id AS cl FROM assign WHERE rn = 1
        |), pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cl AS cell,
        |    round(CASE WHEN sqrt(list_inner_product(a.v, a.v))
        |                    * sqrt(list_inner_product(b.v, b.v)) > 0
        |      THEN list_inner_product(a.v, b.v)
        |           / (sqrt(list_inner_product(a.v, a.v))
        |              * sqrt(list_inner_product(b.v, b.v)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM cell a JOIN cell b ON a.cl = b.cl AND a.vec_id < b.vec_id
        |)""".stripMargin

  /** Shared CTE prefix of the q81/q82 duplicate-span oracles: q81's
    * planted corpus (copies + uniquetail hybrids), q69's first-principles
    * tokenization (per-char alnum runs, 1-based offsets), 8-grams via a
    * bounded self-join, document-frequency >= 2 on the gram TEXT (the
    * Spark side hashes; identical absent xxhash64 collisions), and
    * coverage-contiguous run merging (gap > 8 starts a new span). */
  private val DuplicateSpanCtes: String =
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    text || ' uniquetail' || CAST(doc_id AS VARCHAR) || ' appended words' AS text
        |  FROM documents WHERE doc_id < 10
        |), pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i FROM docs
        |), cls AS (
        |  SELECT doc_id, text, i,
        |    substr(lower(text), i, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i, 1) BETWEEN '0' AND '9' AS alnum,
        |    i = 1 OR NOT (substr(lower(text), i - 1, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i - 1, 1) BETWEEN '0' AND '9') AS prev_non
        |  FROM pos
        |), truns AS (
        |  SELECT doc_id, text, i,
        |    SUM(CASE WHEN alnum AND prev_non THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY i) AS tok_idx
        |  FROM cls WHERE alnum
        |), tk AS (
        |  SELECT doc_id, text, tok_idx, min(i) AS cs, max(i) AS ce
        |  FROM truns GROUP BY doc_id, text, tok_idx
        |), tok AS (
        |  SELECT doc_id, tok_idx, cs, ce,
        |    substr(lower(text), CAST(cs AS INT), CAST(ce - cs + 1 AS INT)) AS tk_text
        |  FROM tk
        |), gram AS (
        |  SELECT a.doc_id, a.tok_idx AS gpos,
        |    string_agg(b.tk_text, ' ' ORDER BY b.tok_idx) AS g
        |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
        |    AND b.tok_idx BETWEEN a.tok_idx AND a.tok_idx + 7
        |  GROUP BY a.doc_id, a.tok_idx HAVING count(*) = 8
        |), dup AS (
        |  SELECT g FROM gram GROUP BY g HAVING count(DISTINCT doc_id) >= 2
        |), dpos AS (
        |  SELECT doc_id, gpos FROM gram WHERE g IN (SELECT g FROM dup)
        |), marks AS (
        |  SELECT doc_id, gpos,
        |    CASE WHEN lag(gpos) OVER (PARTITION BY doc_id ORDER BY gpos) IS NULL
        |      OR gpos - lag(gpos) OVER (PARTITION BY doc_id ORDER BY gpos) > 8
        |      THEN 1 ELSE 0 END AS nw
        |  FROM dpos
        |), rg AS (
        |  SELECT doc_id, gpos,
        |    CAST(SUM(nw) OVER (PARTITION BY doc_id ORDER BY gpos) AS BIGINT) AS run
        |  FROM marks
        |), sp AS (
        |  SELECT doc_id, run AS span_id, min(gpos) AS tok_start,
        |    max(gpos) + 7 AS tok_end, count(*) AS n_dup_grams
        |  FROM rg GROUP BY doc_id, run
        |)""".stripMargin

  /** q83's DuckDB oracle, shared verbatim by q85 (landed-model path):
    * first-principles replay of the trigram LM — per-char tokenization
    * (the q69/q81 CTE pattern), contexts via a bounded self-join, md5-31
    * keys (q64's hash form), add-1 smoothing over the train vocabulary,
    * and per-position micro-nat flooring so the per-doc aggregation sums
    * INTEGERS — ln() ulp drift cannot reorder-diverge. */
  /**
   * q177-q179 recall contract: the seeded query sample (md5-31 hash order
   * of "graft:vec_id", ties by vec_id — the engine-portable sampling
   * family, so DuckDB draws the identical 200), capped at 200.
   */
  private[graft] def annRecallQueries(e: DataFrame): DataFrame = {
    val h = org.apache.spark.sql.catalyst.expressions.graftdedup
      .HashSketchExpressions.md5Hash31(
        concat_ws(":", lit("graft"), col("vec_id").cast("string")))
    e.orderBy(h.asc, col("vec_id").asc).limit(200)
  }

  /**
   * Pinned integer recall floors (ppm of recall@10 over the seeded
   * sample) per approximate path. Measured at sf0.001/0.01/0.1 and set
   * ~10 recall points under the observed minimum, so a parameter or
   * kernel regression that costs real retrieval quality fails the build
   * loudly while corpus drift does not flap the gate.
   */
  private def annRecallFloorPpm(path: String): Long = path match {
    case "ivf"       => 450000L // 16 int-Lloyd cells, nProbe=4; r15 trained
                                // codebook measured ~560000-600000 (was
                                // 452500-496500 on the seed codebook at
                                // floor 350000)
    case "lsh"       => 550000L // bands=8, nPlanes=4; measured 655500-718500
    case "projected" => 250000L // outDim 32, shortlist 50; measured 346500-567500
    case other => throw new IllegalArgumentException(s"no recall floor for $other")
  }

  /** Per-query recall hits: |exact top-k ∩ ann top-k| with zero-fill, and
    * the loud aggregate floor check. All-integer output — the recall
    * number itself is DuckDB-hash-verified, not just the plan shape. */
  private def annRecallHits(qs: DataFrame, exact: DataFrame, ann: DataFrame,
                            k: Int, floorPpm: Long): DataFrame = {
    val inter = exact.select(col("query_id"), col("neighbor_id"))
      .join(ann.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    val perQ = qs.select(col("vec_id").as("query_id"))
      .join(inter, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("hits"))
    // SINGLE-EXECUTION floor gate (r15 optimization): the old shape ran
    // `perQ.agg(...).head()` at construction — an eager action whose input
    // is ALSO the returned frame's lineage (VERDICT r3 #5's antipattern),
    // so every bench rep / verify pass executed the whole brute-force +
    // ANN pipeline TWICE (measured: q177-q179 were 3 of the suite's 4 most
    // expensive queries, ~2x their single-pass cost). The floor check now
    // rides the plan itself: a global window totals the 200-row perQ frame
    // (one tiny single-partition pass — the heavy lineage below it runs
    // once), and assert_true raises the same loud message on violation —
    // at first execution rather than at construction; rows are unchanged.
    val wAll = Window.partitionBy()
    val gated = perQ
      .withColumn("__tot", sum(col("hits")).over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(assert_true(
        col("__tot") * 1000000L >= lit(floorPpm) * col("__n") * k,
        concat(lit(s"ANN recall@$k = "),
          expr(s"__tot * 1000000 DIV (__n * $k)").cast(StringType),
          lit(s" ppm under the pinned floor $floorPpm ppm"))).isNull)
      .select(col("query_id"), col("hits"))
    gated.orderBy(col("query_id"))
  }

  /**
   * q86b's FIXED merge list. Well-formed by construction, verified at
   * first use: every component is a single code point, the `</w>`
   * terminal, or the product of an EARLIER merge, and all products are
   * distinct strings. Under exactly these conditions a newly created
   * adjacent pair always contains the just-created symbol, whose own
   * merges all rank LATER — so applying each merge once in rank order is
   * provably identical to the kernel's repeated-lowest-rank greedy
   * (BpeEncodeParitySpec pins the equivalence property on random words),
   * and the DuckDB oracle can replay segmentation as a rank-ordered
   * chain of left-to-right `replace()` passes.
   */
  private[graft] lazy val q86bMerges: Seq[(String, String)] = {
    val merges = Seq(
      "t" -> "h", "th" -> "e", "the" -> "</w>",
      "i" -> "n", "in" -> "g", "ing" -> "</w>",
      "a" -> "n", "an" -> "d", "and" -> "</w>",
      "e" -> "r", "er" -> "</w>",
      "o" -> "n", "r" -> "e", "o" -> "f", "of" -> "</w>",
      "e" -> "d", "ed" -> "</w>",
      "o" -> "u", "e" -> "n", "t" -> "o", "to" -> "</w>",
      "e" -> "s", "es" -> "</w>",
      "s" -> "</w>", "e" -> "</w>", "d" -> "</w>", "y" -> "</w>",
      "t" -> "</w>", "a" -> "</w>", "o" -> "</w>",
      "1" -> "0", "0" -> "0", "2" -> "0", "0" -> "</w>",
      "c" -> "h", "s" -> "t", "q" -> "u", "l" -> "l",
      "o" -> "r", "or" -> "</w>")
    val products = scala.collection.mutable.Set[String]()
    merges.foreach { case (l, r) =>
      Seq(l, r).foreach(c => require(
        c == "</w>" || c.codePointCount(0, c.length) == 1 || products.contains(c),
        s"q86b merge component '$c' is neither a code point, </w>, nor an earlier product"))
      val p = l + r
      require(products.add(p), s"duplicate q86b merge product '$p'")
    }
    merges
  }

  /** q86b's oracle: DuckDB replays the BPE segmentation of every token
    * as the rank-ordered replace chain over paren-wrapped symbols —
    * `replace()` is left-to-right and non-overlapping in both engines,
    * which is exactly the kernel's merge-all-occurrences pass; the
    * wrapping makes pair patterns unambiguous (parens cannot occur
    * inside a symbol: symbols are [a-z0-9] runs plus `</w>`). */
  private def q86bOracleSql: String = {
    val chain = q86bMerges.foldLeft(
      """'(' || regexp_replace(word, '(.)', '(\1)', 'g') || '(</w>)'""") {
      case (acc, (l, r)) => s"replace($acc, '($l)($r)', '($l$r)')"
    }
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word,
       |    unnest(generate_series(0,
       |      len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1)) AS word_pos
       |  FROM documents
       |), seg AS (
       |  SELECT doc_id, word_pos, word,
       |    $chain AS state
       |  FROM toks
       |)
       |SELECT doc_id, word_pos, word,
       |  array_to_string(regexp_extract_all(state, '[^()]+'), ' ') AS subwords,
       |  CAST(len(regexp_extract_all(state, '[^()]+')) AS BIGINT) AS n_subwords
       |FROM seg ORDER BY doc_id, word_pos""".stripMargin
  }

  /** Winnowing CTE chain over source CTE `src`, names prefixed `p` —
    * q107's selection pipeline, reusable per side for the q108 overlap
    * join. Emits `<p>fp(doc_id, gram_hash)`. */
  private def winnowCtes(src: String, p: String): String =
    s"""${p}tokarr AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM $src
       |), ${p}idx AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(1, len(toks) - 2)) AS i
       |  FROM ${p}tokarr
       |), ${p}grams AS (
       |  SELECT doc_id, i,
       |    (('0x' || substr(md5(array_to_string(
       |        toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')), 1, 16))::UBIGINT
       |      & 2147483647::UBIGINT)::BIGINT AS h
       |  FROM ${p}idx
       |), ${p}win AS (
       |  SELECT doc_id, i, h,
       |    min(struct_pack(h := h, np := -i)) OVER (PARTITION BY doc_id
       |      ORDER BY i ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
       |    count(*) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS c
       |  FROM ${p}grams
       |), ${p}fp AS (
       |  SELECT DISTINCT doc_id, m.h AS gram_hash FROM ${p}win WHERE c = 4
       |)""".stripMargin

  /** Okapi BM25 replay (q98/q99). The scored CTE's parenthesization mirrors
    * SearchOps.bm25Term EXACTLY — float arithmetic is association-sensitive
    * — and per-term contributions go through DECIMAL(18,9) before the
    * per-doc sum (order-independent exact aggregate), so the rank order is
    * deterministic in both engines. */
  /** The q114 strip pipeline as nested DuckDB calls over `inExpr` — one
    * definition expanded for both the clean text and the anchor-text
    * numerator so the two sides cannot drift. Mirrors
    * [[graft.ops.TextOps.stripMarkup]] stage for stage. */
  private def stripPipeSql(inExpr: String): String =
    s"""trim(regexp_replace(replace(replace(replace(replace(replace(replace(
       |    regexp_replace(regexp_replace(regexp_replace($inExpr,
       |        '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'),
       |      '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g'),
       |    '<[^>]*>', ' ', 'g'),
       |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
       |  '&nbsp;', ' '), '&amp;', '&'),
       |  '[ \\t\\r\\n]+', ' ', 'g'))""".stripMargin

  /** q111/q115's oracle: cell-for-cell CMS replay — the same md5-31 bucket
    * per (row, token), counter = occurrences per cell, estimate = min over
    * the token's 4 cells; probes = the exact top-20 vocabulary. Shared by
    * the inline (q111) and landed+appended (q115) paths: counter addition
    * IS sketch merging, so both must produce identical cells. */
  private val CmsOracleSql: String =
    """WITH tok AS (
      |  SELECT unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
      |  FROM documents
      |), probes AS (
      |  SELECT token, count(*) AS exact FROM tok
      |  GROUP BY token ORDER BY count(*) DESC, token LIMIT 20
      |), rows_ AS (
      |  SELECT unnest(generate_series(0, 3)) AS cms_row
      |), cells AS (
      |  SELECT cms_row,
      |    (('0x' || substr(md5('graft-cms' || CAST(cms_row AS VARCHAR) || ':' || token), 1, 16))::UBIGINT
      |      & 2147483647::UBIGINT)::BIGINT % 2048 AS cms_bucket,
      |    count(*) AS cnt
      |  FROM tok CROSS JOIN rows_ GROUP BY 1, 2
      |), lookup AS (
      |  SELECT p.token, p.exact, r.cms_row,
      |    (('0x' || substr(md5('graft-cms' || CAST(r.cms_row AS VARCHAR) || ':' || p.token), 1, 16))::UBIGINT
      |      & 2147483647::UBIGINT)::BIGINT % 2048 AS cms_bucket
      |  FROM probes p CROSS JOIN rows_ r
      |)
      |SELECT l.token, CAST(l.exact AS BIGINT) AS exact,
      |  CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
      |FROM lookup l LEFT JOIN cells c USING (cms_row, cms_bucket)
      |GROUP BY l.token, l.exact ORDER BY l.token""".stripMargin

  /** q112's oracle: the fixed-point power iteration unrolled into one CTE
    * chain per step — pure long floor-division arithmetic, so the replay
    * is bit-identical to the Spark loop. */
  private val PageRankOracleSql: String = {
    val steps = (1 to 5).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(sum(r.rank_u // d.out_deg) AS BIGINT) AS in_sum
         |  FROM edges e JOIN deg d USING (src)
         |  JOIN r${i - 1} r ON r.node = e.src GROUP BY 1
         |), r$i AS (
         |  SELECT nd2.node,
         |    ((150000 * (1000000000000 // n.n_nodes)) // 1000000)
         |      + ((850000 * coalesce(c.in_sum, 0)) // 1000000) AS rank_u
         |  FROM nodes nd2 CROSS JOIN n LEFT JOIN c$i c ON c.node = nd2.node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH ndocs AS (SELECT count(*) AS n_docs FROM documents),
       |edges AS (
       |  SELECT doc_id AS src,
       |    (doc_id * 31 + j * 1009) % ndocs.n_docs AS dst
       |  FROM documents CROSS JOIN ndocs
       |  CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS j) jj
       |  UNION ALL
       |  SELECT doc_id, doc_id % 16 FROM documents
       |), deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1),
       |nodes AS (
       |  SELECT DISTINCT node FROM
       |    (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
       |), n AS (SELECT count(*) AS n_nodes FROM nodes),
       |r0 AS (
       |  SELECT node, (1000000000000 // n_nodes) AS rank_u
       |  FROM nodes CROSS JOIN n
       |), $steps
       |SELECT node, rank_u FROM r5
       |ORDER BY rank_u DESC, node LIMIT 30""".stripMargin
  }

  private val Bm25OracleSql: String =
    """WITH tokarr AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |  FROM documents
      |), dl AS (
      |  SELECT doc_id, coalesce(len(toks), 0) AS dl FROM tokarr
      |), stats AS (
      |  SELECT count(*) AS n_docs, coalesce(sum(dl), 0) AS total_dl FROM dl
      |), post AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS token FROM tokarr)
      |  WHERE token IN ('spark', 'query', 'filter')
      |  GROUP BY doc_id, token
      |), dfreq AS (
      |  SELECT token, count(*) AS df FROM post GROUP BY token
      |), scored AS (
      |  SELECT p.doc_id,
      |    CAST((ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) * p.tf)
      |      * (1.2 + 1.0)
      |      / (p.tf + 1.2 * ((1.0 - 0.75)
      |          + (0.75 * d.dl) / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))
      |      AS DECIMAL(18,9)) AS c
      |  FROM post p
      |  JOIN dfreq f USING (token)
      |  JOIN dl d USING (doc_id)
      |  CROSS JOIN stats s
      |), agg AS (
      |  SELECT doc_id, sum(c) AS sc FROM scored GROUP BY doc_id
      |), top AS (
      |  SELECT doc_id, sc FROM agg ORDER BY sc DESC, doc_id LIMIT 10
      |)
      |SELECT doc_id, CAST(round(CAST(sc AS DOUBLE), 6) AS DOUBLE) AS score,
      |  row_number() OVER (ORDER BY sc DESC, doc_id) AS rank
      |FROM top ORDER BY rank""".stripMargin

  /** q155/q157's shared oracle: the q98 BM25 chain generalized
    * per-query — DECIMAL(18,9) staging, full ranking first (r0),
    * gold = full_rank <= 2, negatives re-ranked after exclusion
    * (exactly the engine's anti-join-then-window order). The landed
    * q157 path shares scoreAndRankPerQuery with the inline q155, so
    * one SQL serves both (the q99-reuses-q98 convention). */
  private val HardNegativesOracleSql: String =
    """WITH tokarr AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, coalesce(len(toks), 0) AS dl FROM tokarr
        |), stats AS (
        |  SELECT count(*) AS n_docs, coalesce(sum(dl), 0) AS total_dl FROM dl
        |), qs(qid, qtext) AS (
        |  VALUES (0, 'spark query filter'), (1, 'stream window batch'),
        |         (2, 'join merge sort')
        |), qterms AS (
        |  SELECT DISTINCT qid, token FROM (
        |    SELECT qid, unnest(list_filter(
        |      string_split_regex(lower(qtext), '[^a-z0-9]+'),
        |      x -> x <> '')) AS token
        |    FROM qs)
        |), post AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS token FROM tokarr)
        |  WHERE token IN (SELECT DISTINCT token FROM qterms)
        |  GROUP BY doc_id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM post GROUP BY token
        |), scored AS (
        |  SELECT q.qid, p.doc_id,
        |    CAST((ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) * p.tf)
        |      * (1.2 + 1.0)
        |      / (p.tf + 1.2 * ((1.0 - 0.75)
        |          + (0.75 * d.dl) / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))
        |      AS DECIMAL(18,9)) AS c
        |  FROM post p
        |  JOIN qterms q USING (token)
        |  JOIN dfreq f USING (token)
        |  JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s
        |), agg AS (
        |  SELECT qid, doc_id, sum(c) AS sc FROM scored GROUP BY qid, doc_id
        |), r0 AS (
        |  SELECT qid, doc_id, sc, row_number() OVER (PARTITION BY qid
        |    ORDER BY sc DESC, doc_id) AS full_rank
        |  FROM agg
        |), negs AS (
        |  SELECT qid, doc_id, sc,
        |    row_number() OVER (PARTITION BY qid
        |      ORDER BY sc DESC, doc_id) AS rank
        |  FROM r0 WHERE full_rank > 2
        |)
        |SELECT CAST(qid AS BIGINT) AS qid, doc_id,
        |  CAST(round(CAST(sc AS DOUBLE), 6) AS DOUBLE) AS score, rank
        |FROM negs WHERE rank <= 10 ORDER BY qid, rank""".stripMargin

  private val NgramLmOracleSql: String =
    """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i
        |  FROM documents
        |), cls AS (
        |  SELECT doc_id, text, i,
        |    substr(lower(text), i, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i, 1) BETWEEN '0' AND '9' AS alnum,
        |    i = 1 OR NOT (substr(lower(text), i - 1, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i - 1, 1) BETWEEN '0' AND '9') AS prev_non
        |  FROM pos
        |), truns AS (
        |  SELECT doc_id, text, i,
        |    SUM(CASE WHEN alnum AND prev_non THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY i) AS tok_idx
        |  FROM cls WHERE alnum
        |), tk AS (
        |  SELECT doc_id, text, tok_idx, min(i) AS cs, max(i) AS ce
        |  FROM truns GROUP BY doc_id, text, tok_idx
        |), tok AS (
        |  SELECT doc_id, tok_idx,
        |    substr(lower(text), CAST(cs AS INT), CAST(ce - cs + 1 AS INT)) AS tt
        |  FROM tk
        |), ctx AS (
        |  SELECT a.doc_id, a.tok_idx AS i,
        |    string_agg(b.tt, ' ' ORDER BY b.tok_idx) AS c
        |  FROM tok a JOIN tok b ON b.doc_id = a.doc_id
        |    AND b.tok_idx BETWEEN a.tok_idx - 2 AND a.tok_idx - 1
        |  GROUP BY a.doc_id, a.tok_idx HAVING count(*) = 2
        |), pr AS (
        |  SELECT c.doc_id, c.i,
        |    (('0x' || substr(md5(c.c), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS ctx_h,
        |    (('0x' || substr(md5(t.tt), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS tok_h
        |  FROM ctx c JOIN tok t ON t.doc_id = c.doc_id AND t.tok_idx = c.i
        |), grams AS (
        |  SELECT ctx_h, tok_h, count(*) AS cnt FROM pr
        |  WHERE doc_id % 10 <> 0 GROUP BY ctx_h, tok_h
        |), ctxs AS (
        |  SELECT ctx_h, sum(cnt) AS ctx_cnt FROM grams GROUP BY ctx_h
        |), vocab AS (
        |  SELECT count(DISTINCT (('0x' || substr(md5(tt), 1, 16))::UBIGINT
        |    & 2147483647::UBIGINT)::BIGINT) AS v
        |  FROM tok WHERE doc_id % 10 <> 0
        |), scored AS (
        |  SELECT s.doc_id,
        |    CAST(floor(ln((coalesce(g.cnt, 0) + 1.0)
        |      / (coalesce(x.ctx_cnt, 0) + 1.0 * (SELECT v FROM vocab)))
        |      * 1e6 + 0.5) AS BIGINT) AS lpu
        |  FROM pr s
        |  LEFT JOIN grams g ON g.ctx_h = s.ctx_h AND g.tok_h = s.tok_h
        |  LEFT JOIN ctxs x ON x.ctx_h = s.ctx_h
        |  WHERE s.doc_id % 10 = 0
        |)
        |SELECT doc_id, count(*) AS n_scored,
        |  round(-(CAST(sum(lpu) AS DOUBLE) / 1e6) / count(*), 6) AS avg_neg_logp
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Reference-EXECUTED golden parquet (scripts/gen_golden_oracle.py):
    * every value produced by the unmodified reference package running over
    * its own fixtures; DuckDB reads them via read_parquet so the driver
    * hash-anchors the reader queries like every SQL-expressible one.
    * Resolution: the CURRENT checkout's copy when Verify runs from a repo
    * root (so a worktree tests its own golden files, never a stale main
    * checkout's), absolutized at VERIFY time because the driver's DuckDB
    * process owes us no cwd; `GRAFT_GOLDEN_DIR` overrides for deployments
    * whose cwd is not a repo root. No silent machine-specific fallback —
    * a missing dir fails loudly here rather than hash-red 40 queries
    * against another checkout's stale artifacts. */
  private lazy val goldenDir = {
    val fromEnv = sys.env.get("GRAFT_GOLDEN_DIR")
      .orElse(sys.props.get("graft.golden.dir"))
    val dir = fromEnv.map(new java.io.File(_))
      .getOrElse(new java.io.File("golden_oracle"))
    require(dir.isDirectory,
      s"golden_oracle dir not found at '${dir.getAbsolutePath}' — run from " +
        "the repo root or set GRAFT_GOLDEN_DIR / -Dgraft.golden.dir")
    dir.getAbsolutePath
  }

  /** q90/q182's shared oracle: the lag/running-sum replay of the
    * sessionize semantics (one text, two implementations). */
  private val SessionizeOracleSql: String =
      // q88's lag/running-sum replay, kept per-row: seq is 0-based,
      // session_id = 'user:seq'; ties break by event_id exactly as the
      // Spark window's orderBy does. seq is CAST to BIGINT because
      // DuckDB's windowed sum(INT) widens to HUGEINT (int128) — a
      // non-portable result type (see q89 note).
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |), f AS (
        |  SELECT event_id, user_id, us,
        |    CASE WHEN user_id IS NULL OR us IS NULL THEN 0
        |         WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us NULLS LAST, event_id)
        |), s AS (
        |  SELECT event_id, user_id, us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us NULLS LAST, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS seq
        |  FROM f
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN user_id IS NOT NULL AND us IS NOT NULL THEN seq END AS session_seq,
        |  CASE WHEN user_id IS NOT NULL AND us IS NOT NULL
        |       THEN CAST(user_id AS VARCHAR) || ':' || CAST(seq AS VARCHAR) END AS session_id
        |FROM s ORDER BY event_id""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // ---- reference-generated golden anchors (r12, VERDICT task #2) ------
    "q16_cnv_read" ->
      s"""SELECT cast_id, scan_order, pressure,
         |  round(t068C, 4) AS t068C, round(sal00, 4) AS sal00
         |FROM read_parquet('$goldenDir/q16_cnv_read.parquet')""".stripMargin,

    "q17_casts_meta" ->
      s"""SELECT cast_id, round(lat, 7) AS lat, round(lon, 7) AS lon,
         |  prkey, n_rows
         |FROM read_parquet('$goldenDir/q17_casts_meta.parquet')""".stripMargin,

    "q18_rosette_golden" ->
      s"""SELECT nbf, mean_pressure_int
         |FROM read_parquet('$goldenDir/q18_rosette_golden.parquet')""".stripMargin,

    "q19_btl_read" ->
      s"""SELECT Bottle, Statistic, Date, round(sal00, 4) AS sal00
         |FROM read_parquet('$goldenDir/q19_btl_read.parquet')""".stripMargin,

    "q20_multiformat_read" ->
      s"""SELECT fmt, n
         |FROM read_parquet('$goldenDir/q20_multiformat_read.parquet')""".stripMargin,

    "q37_section" ->
      s"""SELECT cast_id, pressure, round(t090C, 6) AS t090C,
         |  round(station_dist_m, 2) AS station_dist_m
         |FROM read_parquet('$goldenDir/q37_section.parquet')""".stripMargin,

    "q38_bottle_stats" ->
      s"""SELECT nbf, Statistic, round(pressure, 4) AS pressure,
         |  round(t090C, 4) AS t090C, round(cond, 4) AS cond
         |FROM read_parquet('$goldenDir/q38_bottle_stats.parquet')""".stripMargin,

    "q86_bpe_tokenize" ->
      // independent-implementation anchor (gen_golden_oracle_bpe.py: a
      // naive recount-everything Python trainer + textbook greedy encoder).
      // Rows are keyed by a corpus fingerprint so the one committed file
      // serves every driver SF; sum(length) is CAST before concat because
      // DuckDB widens it to HUGEINT.
      s"""SELECT doc_id, n_subwords
         |FROM read_parquet('$goldenDir/q86_bpe_tokenize.parquet')
         |WHERE corpus_key = (
         |  SELECT CAST(count(*) AS VARCHAR) || ':' ||
         |         CAST(CAST(sum(length(text)) AS BIGINT) AS VARCHAR)
         |  FROM documents)""".stripMargin,

    "q84_corpus_diff" ->
      // digest equality == text equality absent sha2 collisions (the q62
      // rule), so the oracle compares texts directly
      """WITH older AS (SELECT doc_id, text FROM documents),
        |newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 15
        |)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS DISTINCT FROM n.text THEN 'changed' END AS change
        |FROM older o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id
        |WHERE o.doc_id IS NULL OR n.doc_id IS NULL
        |   OR o.text IS DISTINCT FROM n.text
        |ORDER BY doc_id""".stripMargin,

    "q83_ngram_lm_score" -> NgramLmOracleSql,

    "q160_perplexity_buckets" ->
      // the q83 chain as a derived table, tertiled: ntile splits on the
      // identical (score, doc_id) total order in both engines; min/max
      // of the round(6) scores are selections, not arithmetic — portable
      ("WITH lm_scores AS (\n  SELECT * FROM (\n" +
        NgramLmOracleSql.linesIterator.map("    " + _).mkString("\n") +
        "\n  )\n), bucketed AS (\n" +
        "  SELECT avg_neg_logp,\n" +
        "    ntile(3) OVER (ORDER BY avg_neg_logp, doc_id) AS bucket\n" +
        "  FROM lm_scores\n)\n" +
        "SELECT CAST(bucket AS BIGINT) AS bucket,\n" +
        "  count(*) AS n_docs,\n" +
        "  min(avg_neg_logp) AS min_score,\n" +
        "  max(avg_neg_logp) AS max_score\n" +
        "FROM bucketed GROUP BY bucket ORDER BY bucket"),

    "q85_ngram_lm_indexed" -> NgramLmOracleSql,

    "q86b_bpe_segment" -> q86bOracleSql,

    "q180_watermark_replay" ->
      // the batch rule the streaming drop semantics reduce to: the
      // beyond-watermark stragglers are EXACTLY ts < Jan 25 (batch 1
      // arrives under a watermark pinned to Jan 30 by the batch-0 clock
      // row), so kept rows are exactly ts >= Jan 25
      // CAST: date_trunc('day', ts) returns DATE on some DuckDB versions
      // (1.0.0) and TIMESTAMP on others; the engine emits TIMESTAMP, so
      // pin the oracle's type explicitly
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
        |  event_type, count(*) AS n
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q181_qc_chain_golden" ->
      // reference-EXECUTED full QC chain (despike -> press_check ->
      // split.down -> bindata) over the 4 real casts; values computed by
      // the unmodified reference package (scripts/gen_golden_oracle.py
      // q181 section). floor(v*1e5 + 1/pi) in double arithmetic matches
      // the engine's quantization bit-for-bit: the irrational offset
      // keeps the boundary away from the exact-half decimal means where
      // the two sides' doubles differ by 1 ULP (see the query comment).
      // The channel list mirrors SparkEntry.qcChainChannels.
      s"""SELECT cast_id, pressure, channel,
         |  CAST(floor(value * 1e5 + 0.31830988618) AS BIGINT) AS value_q5
         |FROM read_parquet('$goldenDir/q181_qc_chain.parquet')
         |WHERE channel IN ('c0S/m','dz/dtM','pla','sbeox0Mm/Kg',
         |  'sbeox1Mm/Kg','scan','sva','t090C','t190C','timeS','tsa',
         |  'v5','wetCDOM')""".stripMargin,

    "q181b_qc_chain_full" ->
      // the complement of q181's channel set: the step-quantized
      // channels, hash-anchored to the SAME reference-executed parquet —
      // ALL cells, no exclusion (the r14 flip list is retired: the
      // chain's refExact despike lands every knife-edge decision where
      // the reference's numpy did; gen_q181b_flips.py verifies 0 flips).
      // Same quantization contract as q181.
      s"""SELECT g.cast_id, g.pressure, g.channel,
         |  CAST(floor(g.value * 1e5 + 0.31830988618) AS BIGINT) AS value_q5
         |FROM read_parquet('$goldenDir/q181_qc_chain.parquet') g
         |WHERE g.channel NOT IN ('c0S/m','dz/dtM','pla','sbeox0Mm/Kg',
         |  'sbeox1Mm/Kg','scan','sva','t090C','t190C','timeS','tsa',
         |  'v5','wetCDOM')""".stripMargin,

    "q177_ann_recall_ivf" ->
      OracleSqlGen.annRecallIvfTrainedSql(k = 10, nQueries = 200,
        nCells = 16, nProbe = 4, iters = 5, scale = 1000),

    "q178_ann_recall_lsh" ->
      OracleSqlGen.annRecallLshSql(k = 10, nQueries = 200, bands = 8, nPlanes = 4),

    "q179_ann_recall_projected" ->
      OracleSqlGen.annRecallProjectedSql(k = 10, nQueries = 200, outDim = 32,
        dim = 64),

    "q161_dsir_scores" ->
      // OracleSqlGen.dsirScoreCtes replays the hashed-ngram ratio model:
      // per-side ln fixed to micro-nats before differencing, logw is an
      // exact integer sum (any order); sums CAST BIGINT (HUGEINT rule)
      (s"WITH ${OracleSqlGen.dsirScoreCtes(1024, 11)}\n" +
        "SELECT doc_id, n_features, logw_micro FROM scored ORDER BY doc_id"),

    "q165_dsir_indexed" ->
      // the landed path is row-identical to q161 by construction (same
      // feature expression, same ratio arithmetic, the model just rides
      // a bucketed catalog table) — same oracle
      (s"WITH ${OracleSqlGen.dsirScoreCtes(1024, 11)}\n" +
        "SELECT doc_id, n_features, logw_micro FROM scored ORDER BY doc_id"),

    "q166_unimax_budgets" ->
      // closed-form UniMax water-filling replayed term for term: the
      // capped prefix on the (cap, lang)-ascending order, then the floor
      // split + remainder among the uncapped. All non-negative integers,
      // so DuckDB's // (floor) == Spark's div (trunc); epochs is the one
      // double division of two exact longs
      (s"WITH $unimaxCtes\n" +
        """SELECT lang, n_tokens, cap_tokens, is_capped, budget_tokens,
          |  CAST(budget_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs
          |FROM alloc ORDER BY lang""".stripMargin),

    "q171_unimax_resample" ->
      // the q166 allocation chain driving the md5-31 hash gate: cut =
      // floor(min(1, budget/n) * 2^31) per language (2147483648.0 stays a
      // double literal - int32 would overflow), membership replayed per doc
      (s"WITH $unimaxCtes, gate AS (\n" +
        """  SELECT lang, CAST(floor(least(1.0,
          |    CAST(budget_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          |    * 2147483648.0) AS BIGINT) AS cut
          |  FROM alloc
          |)
          |SELECT d.doc_id, d.lang
          |FROM documents d JOIN gate g ON g.lang = d.lang
          |WHERE (('0x' || substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
          |        & 2147483647::UBIGINT)::BIGINT < g.cut
          |ORDER BY d.doc_id""".stripMargin),

    "q162_dsir_resample" ->
      // Gumbel top-k replay: shard + noise from the named md5-31 salts,
      // rank = logw_micro + quantized Gumbel, ties to doc_id — the same
      // integer total order the engine window uses
      (s"WITH ${OracleSqlGen.dsirScoreCtes(1024, 11)},\n" +
        """pool AS (
          |  SELECT * FROM scored WHERE doc_id % 11 <> 0
          |), rk AS (
          |  SELECT doc_id, logw_micro,
          |    (('0x' || substr(md5('graft-shard:' || CAST(doc_id AS VARCHAR)),
          |      1, 16))::UBIGINT & 2147483647::UBIGINT)::BIGINT % 4 AS shard,
          |    logw_micro + CAST(floor(-ln(-ln(
          |      ((('0x' || substr(md5('graft-gumbel:'
          |            || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
          |        & 2147483647::UBIGINT)::BIGINT + 1.0) / 2147483649.0))
          |      * 1000000.0 + 0.5) AS BIGINT) AS r
          |  FROM pool
          |), ranked AS (
          |  SELECT shard, doc_id, logw_micro,
          |    row_number() OVER (PARTITION BY shard ORDER BY r DESC, doc_id)
          |      AS sample_rank
          |  FROM rk
          |)
          |SELECT shard, CAST(sample_rank AS BIGINT) AS sample_rank,
          |  doc_id, logw_micro
          |FROM ranked WHERE sample_rank <= 25
          |ORDER BY shard, sample_rank""".stripMargin),


    "q81_duplicate_spans" -> (DuplicateSpanCtes +
      """
        |SELECT sp.doc_id, sp.span_id,
        |  CAST(sp.tok_start AS BIGINT) AS tok_start,
        |  CAST(sp.tok_end AS BIGINT) AS tok_end,
        |  CAST(f.cs AS BIGINT) AS char_start, CAST(l.ce AS BIGINT) AS char_end,
        |  sp.n_dup_grams
        |FROM sp
        |JOIN tk f ON f.doc_id = sp.doc_id AND f.tok_idx = sp.tok_start
        |JOIN tk l ON l.doc_id = sp.doc_id AND l.tok_idx = sp.tok_end
        |ORDER BY sp.doc_id, sp.span_id""".stripMargin),

    "q82_strip_spans" -> (DuplicateSpanCtes +
      """
        |, occ AS (
        |  SELECT sp.doc_id, sp.tok_start, f.cs, l.ce,
        |    substr(dd.text, CAST(f.cs AS INT), CAST(l.ce - f.cs + 1 AS INT)) AS stext
        |  FROM sp
        |  JOIN tk f ON f.doc_id = sp.doc_id AND f.tok_idx = sp.tok_start
        |  JOIN tk l ON l.doc_id = sp.doc_id AND l.tok_idx = sp.tok_end
        |  JOIN docs dd ON dd.doc_id = sp.doc_id
        |), rankedo AS (
        |  SELECT *, row_number() OVER (PARTITION BY stext
        |    ORDER BY doc_id, tok_start) AS rk
        |  FROM occ
        |), cuts AS (
        |  SELECT doc_id, cs, ce FROM rankedo WHERE rk > 1
        |), keptch AS (
        |  SELECT p.doc_id, p.i, substr(p.text, CAST(p.i AS INT), 1) AS ch
        |  FROM pos p
        |  WHERE NOT EXISTS (SELECT 1 FROM cuts c
        |    WHERE c.doc_id = p.doc_id AND p.i BETWEEN c.cs AND c.ce)
        |)
        |SELECT d.doc_id, coalesce(kc.ct, '') AS clean_text
        |FROM docs d
        |LEFT JOIN (SELECT doc_id, string_agg(ch, '' ORDER BY i) AS ct
        |  FROM keptch GROUP BY doc_id) kc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin),

    "q79_semantic_pairs" -> (SemanticDedupCtes +
      """
        |SELECT id_a, id_b, cell, cos_sim FROM pairs
        |WHERE cos_sim >= 0.9 ORDER BY id_a, id_b""".stripMargin),

    "q80_semantic_dedup" -> (SemanticDedupCtes +
      """
        |SELECT vec_id FROM base
        |WHERE vec_id NOT IN (SELECT id_b FROM pairs WHERE cos_sim >= 0.9)
        |ORDER BY vec_id""".stripMargin),

    "q01_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_remove_up_to" ->
      "SELECT event_id, value FROM events WHERE value >= 5.0 ORDER BY event_id",

    "q03_remove_above_water" ->
      """SELECT event_id, value - 100.0 AS pressure FROM events
        |WHERE value - 100.0 >= 0.0 ORDER BY event_id""".stripMargin,

    "q04_join_enrich" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q05_topk" ->
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spent DESC, o_custkey LIMIT 10""".stripMargin,

    "q06_bindata_avg" ->
      """WITH ord AS (
        |  SELECT l_returnflag AS flag, l_quantity AS q, l_extendedprice AS price,
        |         l_orderkey*8 + l_linenumber AS ord
        |  FROM lineitem
        |), edges AS (
        |  SELECT flag, q, price,
        |    ceil(first_value(q) OVER (PARTITION BY flag ORDER BY ord
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS start,
        |    floor(last_value(q) OVER (PARTITION BY flag ORDER BY ord
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS stop
        |  FROM ord
        |), binned AS (
        |  SELECT flag, start, price, q,
        |    CAST(ceil((q - start)/5.0) - 1 AS BIGINT) AS k,
        |    CAST(ceil((stop - start)/5.0) - 1 AS BIGINT) AS nbins
        |  FROM edges
        |), casts AS (
        |  SELECT flag, min(start) AS start, min(nbins) AS nbins FROM binned GROUP BY flag
        |), spine AS (
        |  SELECT flag, start, unnest(generate_series(0, nbins-1)) AS k
        |  FROM casts WHERE nbins > 0
        |), agg AS (
        |  SELECT flag, k, round(avg(price), 6) AS avg_price
        |  FROM binned WHERE q > start AND k < nbins GROUP BY flag, k
        |)
        |SELECT s.flag AS flag, s.start + (s.k + 0.5)*5.0 AS qty_bin, a.avg_price AS avg_price
        |FROM spine s LEFT JOIN agg a ON s.flag = a.flag AND s.k = a.k
        |ORDER BY flag, qty_bin""".stripMargin,

    "q07_split" ->
      """WITH w1 AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    max(value) OVER (PARTITION BY user_id) AS mx
        |  FROM events
        |), w2 AS (
        |  SELECT *, min(CASE WHEN value = mx THEN rn END) OVER (PARTITION BY user_id) AS am
        |  FROM w1
        |)
        |SELECT user_id, event_id, CASE WHEN rn <= am THEN 'down' ELSE 'up' END AS direction
        |FROM w2 ORDER BY user_id, event_id""".stripMargin,

    "q08_moving_average" ->
      // the CASE guard mirrors Cast.movingAverage's null propagation (a null
      // inside the window -> null, numpy NaN semantics); events.value has no
      // nulls today but the oracle must stay equivalent on any data
      """SELECT user_id, event_id,
        |  CASE WHEN count(*) OVER w > count(value) OVER w THEN NULL
        |       ELSE round(coalesce(sum(value) OVER w, 0) / 5.0, 6) END AS value_ma
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q09_despike" ->
      """WITH s1 AS (
        |  SELECT user_id u, event_id i, value x,
        |    CASE WHEN min(value) OVER wf = max(value) OVER wf
        |         THEN min(value) OVER wf ELSE avg(value) OVER wf END AS m,
        |    CASE WHEN min(value) OVER wf = max(value) OVER wf
        |         THEN 0.0 ELSE stddev_pop(value) OVER wf END AS s,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY event_id
        |                ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING)
        |), s2 AS (SELECT *, greatest(1, n - 15) AS rn0 FROM s1
        |), s3 AS (
        |  SELECT *,
        |    max(CASE WHEN rn = rn0 THEN m END) OVER (PARTITION BY u) AS mlast,
        |    max(CASE WHEN rn = rn0 THEN s END) OVER (PARTITION BY u) AS slast
        |  FROM s2
        |), p1 AS (
        |  SELECT u, i, x,
        |    CASE WHEN abs(x - (CASE WHEN rn > rn0 THEN mlast ELSE m END))
        |              > 2.0 * (CASE WHEN rn > rn0 THEN slast ELSE s END)
        |         THEN NULL ELSE x END AS x1
        |  FROM s3
        |), t1 AS (
        |  SELECT u, i, x,
        |    CASE WHEN min(x1) OVER wf = max(x1) OVER wf
        |         THEN min(x1) OVER wf ELSE avg(x1) OVER wf END AS m,
        |    CASE WHEN min(x1) OVER wf = max(x1) OVER wf
        |         THEN 0.0 ELSE stddev_pop(x1) OVER wf END AS s,
        |    row_number() OVER (PARTITION BY u ORDER BY i) AS rn,
        |    count(*) OVER (PARTITION BY u) AS n
        |  FROM p1
        |  WINDOW wf AS (PARTITION BY u ORDER BY i
        |                ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING)
        |), t2 AS (SELECT *, greatest(1, n - 15) AS rn0 FROM t1
        |), t3 AS (
        |  SELECT *,
        |    max(CASE WHEN rn = rn0 THEN m END) OVER (PARTITION BY u) AS mlast,
        |    max(CASE WHEN rn = rn0 THEN s END) OVER (PARTITION BY u) AS slast
        |  FROM t2
        |)
        |SELECT u AS user_id, i AS event_id,
        |  CASE WHEN abs(x - (CASE WHEN rn > rn0 THEN mlast ELSE m END))
        |            > 20.0 * (CASE WHEN rn > rn0 THEN slast ELSE s END)
        |       THEN NULL ELSE x END AS value_despiked
        |FROM t3 ORDER BY user_id, event_id""".stripMargin,

    "q10_interpolate" ->
      """WITH base AS (
        |  SELECT user_id u, event_id i, CAST(event_id AS DOUBLE) p,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS x
        |  FROM events
        |), w AS (
        |  SELECT u, i, p, x,
        |    last_value(x IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN x IS NOT NULL THEN p END IGNORE NULLS) OVER wp AS pp,
        |    first_value(x IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN x IS NOT NULL THEN p END IGNORE NULLS) OVER wn AS np
        |  FROM base
        |  WINDOW
        |    wp AS (PARTITION BY u ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY u ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT u AS user_id, i AS event_id,
        |  CASE WHEN x IS NOT NULL THEN x
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |         CASE WHEN np = pp THEN pv ELSE pv + (nv - pv) * (p - pp) / (np - pp) END
        |       ELSE NULL END AS value_interp
        |FROM w ORDER BY user_id, event_id""".stripMargin,

    "q11_mld_mask" ->
      """SELECT user_id, event_id,
        |  (first_value(value) OVER (PARTITION BY user_id ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) - value) < 0.5 AS mld_mask
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q12_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q13_token_count" ->
      """SELECT doc_id,
        |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q14_maxdepth" ->
      """SELECT user_id,
        |  max(CASE WHEN event_id % 7 <> 0 THEN CAST(event_id AS DOUBLE) END) AS max_valid_depth
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q15_rosette_summary" ->
      """SELECT l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,

    // q16-q20 (file-format readers) have no SQL-expressible oracle ->
    // rows-only checks; exact semantics are pinned by golden-fixture
    // ScalaTests (rosette vector, SBE-filtered file, lat/lon decimals).

    "q22_lp_filter" -> OracleSqlGen.lpFilterSql,
    "q23_smooth" -> OracleSqlGen.smoothSql,

    "q21_press_check" ->
      """WITH w AS (
        |  SELECT user_id u, event_id i, value p, props,
        |    CASE WHEN lead(value) OVER (PARTITION BY user_id ORDER BY event_id) < value
        |         THEN value END AS invref
        |  FROM events
        |), m AS (
        |  SELECT u, i, p, props,
        |    max(invref) OVER (PARTITION BY u ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
        |  FROM w
        |)
        |SELECT u AS user_id, i AS event_id,
        |  CASE WHEN p < runmax THEN NULL ELSE props END AS props_checked
        |FROM m ORDER BY user_id, event_id""".stripMargin,

    "q34_multimodal" ->
      // mirrors syntheticMedia + extractFeatures plumbing + sampleFrames:
      // n_bytes = UTF-8 byte length of the blob, n_sampled = every 30th
      // frame index of video rows, 0 otherwise
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |    (doc_id % 300 + 1)::INT AS n_frames
        |  FROM documents
        |)
        |SELECT media_id, kind, n_bytes, 16::BIGINT AS feat_dim,
        |  CASE WHEN kind = 'video'
        |       THEN CAST((n_frames - 1) // 30 + 1 AS BIGINT)
        |       ELSE 0::BIGINT END AS n_sampled
        |FROM media ORDER BY media_id""".stripMargin,

    "q42_ann_ivf" -> IvfOracleSql,
    // same oracle as q42 by contract: the landed-index path must be
    // row-identical to the direct ivfTopK call (the q74/q75 rule)
    "q76_ann_ivf_indexed" -> IvfOracleSql,

    "q173_semantic_decontam" ->
      // the shared ivfJoinOracleCtes chain with the probe side filtered
      // to the planted eval twins (vec_id % 17 = 0, offset 1e6), k = 1,
      // then the 0.999 gate - same fold, tie-breaks, derived cell count
      (ivfJoinOracleCtes("WHERE q.vec_id % 17 = 0") + "\n" +
        """SELECT neighbor_id AS train_id, query_id - 1000000 AS eval_id, cos_sim
          |FROM ranked WHERE rank <= 1 AND cos_sim >= 0.999
          |ORDER BY train_id, eval_id""".stripMargin),

    "q163_ann_join" ->
      // q42's IVF oracle reshaped for the two-sided join via the shared
      // ivfJoinOracleCtes chain (probes = the offset-id copy of the whole
      // corpus — every query's exact twin surfaces at rank 1, cos 1.0)
      (ivfJoinOracleCtes("") + "\n" +
        """SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
          |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin),

    "q25_near_dup_pairs" -> OracleSqlGen.nearDupPairsSql,
    "q74_near_dedup_against" -> OracleSqlGen.nearDedupAgainstSql(64, 16),
    "q75_near_dedup_indexed" -> OracleSqlGen.nearDedupAgainstSql(64, 16),
    "q78_near_dedup_index_append" -> OracleSqlGen.nearDedupIndexAppendSql(64, 16),
    "q26_near_dedup"     -> OracleSqlGen.nearDedupSql,
    "q48_near_dedup_cc"  -> OracleSqlGen.nearDedupConnectedSql,
    "q118_canonical_mapping" -> OracleSqlGen.canonicalMappingSql,

    "q167_leakage_free_split" -> OracleSqlGen.leakageFreeSplitSql(10),

    "q176_data_card" ->
      // distinct-by-text in DuckDB == distinct-by-digest in the engine
      // (same count, no raw-text shuffle Spark-side); the gate reuses the
      // shared q174 pattern; all ratios BIGINT floor-div ppm
      (s"""SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS n_chars_total,
        |  CAST(SUM(COALESCE(n_chars, 0)) // COUNT(*) AS BIGINT) AS mean_chars,
        |  CAST(((COUNT(*) - COUNT(DISTINCT text)) * 1000000) // COUNT(*) AS BIGINT) AS dup_ppm,
        |  CAST((SUM(CASE WHEN COALESCE(n_chars, 0) >= 150
        |    AND COALESCE(len(regexp_extract_all(text,
        |      '${graft.ops.TextOps.blocklistPattern(q174Phrases).replace("'", "''")}')), 0) = 0
        |    THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS kept_ppm
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),

    "q175_jsonl_ingest" ->
      // lossless round-trip proof: the quarantining reader's good rows
      // must equal the SOURCE table bit-for-bit (a swallowed good row or
      // a null-filled poison both break the compare); the 3-poison
      // quarantine count is required in-query
      "SELECT doc_id, lang FROM documents ORDER BY doc_id",

    "q174_blocklist_gate" ->
      // DuckDB runs the IDENTICAL pattern text (TextOps.blocklistPattern —
      // RE2∩Java syntax, ASCII phrases enforced; portable on the ASCII
      // corpus, see the scaladoc's measured Unicode caveats);
      // len(regexp_extract_all) = Spark's regexp_count (both
      // leftmost-first, non-overlapping). Single quotes SQL-escape ('')
      // so a future apostrophe phrase cannot break the literal
      (s"""SELECT doc_id,
        |  CAST(COALESCE(len(regexp_extract_all(text,
        |    '${graft.ops.TextOps.blocklistPattern(q174Phrases).replace("'", "''")}')), 0) AS BIGINT)
        |    AS blocklist_hits,
        |  COALESCE(len(regexp_extract_all(text,
        |    '${graft.ops.TextOps.blocklistPattern(q174Phrases).replace("'", "''")}')), 0) = 0 AS kept
        |FROM documents ORDER BY doc_id""".stripMargin),

    "q170_mixture_interleave" ->
      // per-source md5-31 rank x the SAME integer stride literals the
      // engine embeds (q170Strides — one derivation feeds both sides);
      // vtime is BIGINT x INT, no float crosses engines
      (s"""WITH w AS (
        |  SELECT doc_id, source,
        |    (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS h
        |  FROM documents
        |  WHERE source IN (${q170Strides.map(s => s"'${s._1}'").mkString(", ")})
        |), pos AS (
        |  SELECT doc_id, source,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS src_pos
        |  FROM w
        |)
        |SELECT doc_id, source, src_pos,
        |  CAST(src_pos * (CASE source ${q170Strides.map { case (s, st) =>
             s"WHEN '$s' THEN $st" }.mkString(" ")} END) AS BIGINT) AS vtime
        |FROM pos ORDER BY vtime, source, src_pos""".stripMargin),

    "q169_threshold_sweep" ->
      // the q161 score chain feeding the sweep replay: tier CASE (highest
      // cleared cutoff), VALUES spine so empty tiers emit, suffix-window
      // cumulative mass, BIGINT floor-div ppm of the WHOLE scored input
      (s"WITH ${OracleSqlGen.dsirScoreCtes(1024, 11)}, sw_tiered AS (\n" +
        """  SELECT CASE WHEN logw_micro >= 5000000 THEN 4
          |              WHEN logw_micro >= 0 THEN 3
          |              WHEN logw_micro >= -5000000 THEN 2
          |              WHEN logw_micro >= -10000000 THEN 1
          |              WHEN logw_micro >= -20000000 THEN 0
          |              ELSE -1 END AS tier,
          |         n_features
          |  FROM scored
          |), sw_per_tier AS (
          |  SELECT tier, CAST(COUNT(*) AS BIGINT) AS docs,
          |         CAST(SUM(n_features) AS BIGINT) AS toks
          |  FROM sw_tiered GROUP BY tier
          |), sw_tot AS (
          |  SELECT CAST(COALESCE(SUM(docs), 0) AS BIGINT) AS td,
          |         CAST(COALESCE(SUM(toks), 0) AS BIGINT) AS tt
          |  FROM sw_per_tier
          |), sw_spine AS (
          |  SELECT * FROM (VALUES
          |    (0, CAST(-20000000 AS BIGINT)), (1, CAST(-10000000 AS BIGINT)),
          |    (2, CAST(-5000000 AS BIGINT)), (3, CAST(0 AS BIGINT)),
          |    (4, CAST(5000000 AS BIGINT))) v(tier, cutoff)
          |), sw_joined AS (
          |  SELECT s.tier, s.cutoff, COALESCE(p.docs, 0) AS docs,
          |         COALESCE(p.toks, 0) AS toks
          |  FROM sw_spine s LEFT JOIN sw_per_tier p ON p.tier = s.tier
          |), sw_kept AS (
          |  SELECT cutoff,
          |    CAST(SUM(docs) OVER (ORDER BY tier
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS kept_docs,
          |    CAST(SUM(toks) OVER (ORDER BY tier
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS kept_tokens
          |  FROM sw_joined
          |)
          |SELECT cutoff, kept_docs, kept_tokens,
          |  CAST(CASE WHEN (SELECT td FROM sw_tot) > 0
          |    THEN (kept_docs * 1000000) // (SELECT td FROM sw_tot) ELSE 0 END AS BIGINT) AS kept_docs_ppm,
          |  CAST(CASE WHEN (SELECT tt FROM sw_tot) > 0
          |    THEN (kept_tokens * 1000000) // (SELECT tt FROM sw_tot) ELSE 0 END AS BIGINT) AS kept_tokens_ppm
          |FROM sw_kept ORDER BY cutoff""".stripMargin),

    "q168_length_batches" ->
      // hash-order + row_number + floor-div batch chunking replayed; the
      // pad ledger is integer arithmetic (DuckDB's SUM widens to HUGEINT
      // — CAST back per the portability whitelist)
      """WITH base AS (
        |  SELECT doc_id, GREATEST(COALESCE(n_chars, 0), 0) AS len,
        |    (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS h
        |  FROM documents
        |), tiers AS (
        |  SELECT doc_id, len, h,
        |    CASE WHEN len < 150 THEN 0 WHEN len < 300 THEN 1
        |         WHEN len < 450 THEN 2 ELSE 3 END AS bucket
        |  FROM base
        |), rn AS (
        |  SELECT bucket, len,
        |    ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS r
        |  FROM tiers
        |), batches AS (
        |  SELECT bucket, CAST((r - 1) // 8 AS BIGINT) AS batch_id, len FROM rn
        |)
        |SELECT bucket, batch_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(MAX(len) AS BIGINT) AS max_len,
        |  CAST(COUNT(*) * MAX(len) - SUM(len) AS BIGINT) AS pad_tokens
        |FROM batches GROUP BY bucket, batch_id
        |ORDER BY bucket, batch_id""".stripMargin,
    "q30_ann_lsh"        -> OracleSqlGen.annLshSql,
    "q91_random_projection" -> OracleSqlGen.randomProjectionSql(outDim = 16, dim = 64),
    "q92_ann_projected"  -> OracleSqlGen.annProjectedSql(outDim = 16, dim = 64, k = 5),
    "q63_ann_lsh_banded" -> OracleSqlGen.annLshBandedSql(bands = 3, nPlanes = 6, k = 5),
    "q36_barrier_layer"  -> OracleSqlGen.barrierLayerSql,
    "q40_embedding_near_dup" -> OracleSqlGen.embeddingNearDupSql,
    "q59_embedding_near_dup_banded" ->
      OracleSqlGen.embeddingNearDupBandedSql(bands = 4, nPlanes = 12),

    "q24_bindata_interp" ->
      // np.interp regridding via ASOF joins: prev/next bracketing samples,
      // clamped at the cast's first/last pressure; arithmetic order matches
      // the Scala kernel exactly (bit-identical doubles, no rounding)
      """WITH s AS (
        |  SELECT user_id u, CAST(event_id AS DOUBLE) x, value y FROM events
        |), edges AS (
        |  SELECT u, ceil(min(x)) AS start, floor(max(x)) AS stop,
        |         min(x) AS xmin, max(x) AS xmax FROM s GROUP BY u
        |), grid AS (
        |  SELECT u, start + CAST(k AS DOUBLE) * 100.0 AS g, xmin, xmax
        |  FROM edges, unnest(range(CAST(ceil((stop - start)/100.0 - 1e-12) AS BIGINT))) t(k)
        |), prev AS (
        |  SELECT grid.u, grid.g, grid.xmin, grid.xmax, s.x AS xp, s.y AS yp
        |  FROM grid ASOF JOIN s ON grid.u = s.u AND grid.g >= s.x
        |), nxt AS (
        |  SELECT grid.u, grid.g, s.x AS xn, s.y AS yn
        |  FROM grid ASOF JOIN s ON grid.u = s.u AND grid.g <= s.x
        |), j AS (
        |  SELECT p.u, p.g, p.xmin, p.xmax, p.xp, p.yp, n.xn, n.yn
        |  FROM prev p JOIN nxt n ON p.u = n.u AND p.g = n.g
        |), ymin AS (
        |  SELECT u, y AS y_lo FROM s QUALIFY row_number() OVER (PARTITION BY u ORDER BY x) = 1
        |), ymax AS (
        |  SELECT u, y AS y_hi FROM s QUALIFY row_number() OVER (PARTITION BY u ORDER BY x DESC) = 1
        |)
        |SELECT j.u AS user_id, j.g AS pressure,
        |  CASE WHEN j.g <= j.xmin THEN ymin.y_lo
        |       WHEN j.g >= j.xmax THEN ymax.y_hi
        |       WHEN j.xn = j.xp THEN j.yp
        |       ELSE j.yp + (j.yn - j.yp) * (j.g - j.xp) / (j.xn - j.xp)
        |  END AS value_interp
        |FROM j JOIN ymin ON j.u = ymin.u JOIN ymax ON j.u = ymax.u
        |ORDER BY user_id, pressure""".stripMargin,

    "q27_simhash" ->
      // md5-based simhash votes reproduced bit-for-bit: '0x'+first-16-hex ->
      // UBIGINT equals the big-endian byte fold the Scala UDF performs;
      // hamming of consecutive ids is signedness-free
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok
        |), votes AS (
        |  SELECT doc_id, b.b, sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
        |  GROUP BY doc_id, b.b
        |), sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS sh
        |  FROM votes GROUP BY doc_id
        |), sh2 AS (
        |  SELECT d.doc_id, COALESCE(sh.sh, 0::UBIGINT) AS sh
        |  FROM documents d LEFT JOIN sh USING (doc_id)
        |)
        |SELECT a.doc_id AS id_a, CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        |FROM sh2 a JOIN sh2 b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,

    "q77_hamming_near_dup" ->
      // q27's bit-exact UBIGINT simhash replayed over the perturbed corpus,
      // then 4×16-bit banding: (sh >> 16b) & 65535 on UBIGINT equals the
      // engine's unsigned shift + mask on signed longs; docs without tokens
      // never enter `votes`, matching the engine's token-count filter
      """WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text || ' perturbed tail token' AS text
        |  FROM documents WHERE doc_id < 50
        |), tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM base
        |), h AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM tok
        |), votes AS (
        |  SELECT doc_id, b.b, sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
        |  GROUP BY doc_id, b.b
        |), sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS sh
        |  FROM votes GROUP BY doc_id
        |), bandrows AS (
        |  SELECT doc_id, b.b AS band_id,
        |    CAST((sh >> (b.b * 16)) & 65535 AS BIGINT) AS band_hash
        |  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS b) b
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bandrows a JOIN bandrows b USING (band_id, band_hash)
        |  WHERE a.doc_id < b.doc_id
        |)
        |SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(sa.sh, sb.sh)) AS BIGINT) AS hamming
        |FROM cand c
        |JOIN sh sa ON sa.doc_id = c.id_a
        |JOIN sh sb ON sb.doc_id = c.id_b
        |WHERE bit_count(xor(sa.sh, sb.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q28_ngram_jaccard" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM tok
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
        |    THEN CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |         / len(list_distinct(list_concat(a.s, b.s)))
        |    ELSE 0.0 END, 6) AS jaccard
        |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        |WHERE b.doc_id < 500
        |ORDER BY id_a""".stripMargin,

    "q29_ann_cosine" ->
      // CAST to DOUBLE[] so DuckDB's fold runs in double precision like the
      // Spark-side aggregate — verified bit-identical (incl. ranks) locally.
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(CASE WHEN sqrt(list_inner_product(q.v, q.v))
        |                  * sqrt(list_inner_product(c.v, c.v)) > 0
        |      THEN list_inner_product(q.v, c.v)
        |           / (sqrt(list_inner_product(q.v, q.v))
        |              * sqrt(list_inner_product(c.v, c.v)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q31_langid" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sc AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t,
        |      x -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], x))) AS DOUBLE) / len(t) ELSE 0.0 END AS s_de,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t,
        |      x -> list_contains(['the','a','of','and','is','to','in','that'], x))) AS DOUBLE) / len(t) ELSE 0.0 END AS s_en,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t,
        |      x -> list_contains(['el','la','de','que','y','en','un','por'], x))) AS DOUBLE) / len(t) ELSE 0.0 END AS s_es,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t,
        |      x -> list_contains(['le','la','les','et','est','un','une','dans'], x))) AS DOUBLE) / len(t) ELSE 0.0 END AS s_fr
        |  FROM tok
        |)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0.0 THEN NULL
        |       WHEN s_fr > s_es AND s_fr > s_en AND s_fr > s_de THEN 'fr'
        |       WHEN s_es > s_en AND s_es > s_de THEN 'es'
        |       WHEN s_en > s_de THEN 'en'
        |       ELSE 'de' END AS lang_pred,
        |  round(greatest(s_de, s_en, s_es, s_fr), 6) AS lang_pred_score
        |FROM sc ORDER BY doc_id""".stripMargin,

    "q32_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS punct,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, n, alpha, punct, t,
        |    CASE WHEN len(t) > 0 THEN
        |      CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
        |    ELSE 0.0 END AS mtl,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> list_contains(
        |      ['der','die','das','und','ist','nicht','ein','mit','the','a','of','and',
        |       'is','to','in','that','el','la','de','que','y','en','un','por','le',
        |       'les','et','est','une','dans'], x))) AS DOUBLE) / len(t)
        |    ELSE 0.0 END AS stop
        |  FROM base
        |)
        |SELECT doc_id,
        |  round(alpha / greatest(n, 1.0), 6) AS alpha_ratio,
        |  round(punct / greatest(n, 1.0), 6) AS punct_ratio,
        |  round(mtl, 6) AS mean_tok_len,
        |  CASE WHEN n < 20 THEN 0.0 ELSE
        |    round(least(1.0, (alpha / greatest(n, 1.0)) * 0.5
        |      + least(stop * 5.0, 1.0) * 0.3
        |      + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.2 ELSE 0.0 END), 6)
        |  END AS quality
        |FROM m ORDER BY doc_id""".stripMargin,

    "q33_fingerprint" ->
      """SELECT doc_id,
        |  sha256(array_to_string(
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''),
        |    ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q35_cell_thermal_mass" ->
      // a = 2*0.03/((1/15)*(1/7)+2) ; b = 1 - 2a/0.03 ; ctm = -b*C + a*dcdt*dT
      """WITH base AS (
        |  SELECT user_id, event_id, value/10.0 AS temp, value/100.0 + 3.0 AS cond
        |  FROM events
        |), d AS (
        |  SELECT user_id, event_id, temp, cond,
        |    temp - lag(temp) OVER (PARTITION BY user_id ORDER BY event_id) AS dt
        |  FROM base
        |)
        |SELECT user_id, event_id,
        |  round(-1.0 * (1.0 - 2.0*(2.0*0.03/((1.0/15.0)*(1.0/7.0)+2.0))/0.03) * cond
        |    + (2.0*0.03/((1.0/15.0)*(1.0/7.0)+2.0))
        |      * (0.1*(1.0 + 0.006*(temp - 20.0))) * dt, 6) AS ctm
        |FROM d ORDER BY user_id, event_id""".stripMargin,

    "q41_token_count_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]')) AS BIGINT)
        |  + CAST(length(regexp_replace(text, '[^\p{L}]', '', 'g')) // 8 AS BIGINT)
        |    AS n_tokens_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q46_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) >= 5
        |      THEN list_transform(range(1, len(t) - 3),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
        |      ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM tok
        |), probe AS (
        |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 3
        |)
        |SELECT DISTINCT doc_id
        |FROM (SELECT doc_id, unnest(s) AS g FROM sh) d
        |JOIN probe USING (g)
        |ORDER BY doc_id""".stripMargin,

    "q54_decontaminate_bloom" ->
      // identical semantics to q46 — the bloom prefilter is removed by the
      // exact verify join, so the oracle is the same plain SQL
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) >= 5
        |      THEN list_transform(range(1, len(t) - 3),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
        |      ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM tok
        |), probe AS (
        |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 3
        |)
        |SELECT DISTINCT doc_id
        |FROM (SELECT doc_id, unnest(s) AS g FROM sh) d
        |JOIN probe USING (g)
        |ORDER BY doc_id""".stripMargin,

    "q55_mixture_resample" ->
      // recomputes the copy counts from first principles with the SAME
      // double arithmetic order as the Scala driver (((w / W) * T) / n,
      // floor-based base/cut) and the q45 md5-31 hash family; the sorted
      // weight fold makes W = 0.25 + 0.25 + 0.5 exactly
      """WITH counts AS (
        |  SELECT source, count(*) AS n FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
        |), par AS (
        |  SELECT source,
        |    ((CASE source WHEN 'src0' THEN 0.5::DOUBLE
        |                  WHEN 'src1' THEN 0.25::DOUBLE
        |                  ELSE 0.25::DOUBLE END
        |      / (0.5::DOUBLE + 0.25::DOUBLE + 0.25::DOUBLE)) * 230.0) / n AS r
        |  FROM counts
        |), cuts AS (
        |  SELECT source, CAST(floor(r) AS BIGINT) AS base,
        |    CAST(floor((r - floor(r)) * 2147483648.0) AS BIGINT) AS cut
        |  FROM par
        |), cop AS (
        |  SELECT d.doc_id, d.source,
        |    c.base + CASE WHEN
        |      (('0x' || substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |        & 2147483647::UBIGINT)::BIGINT < c.cut THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN cuts c USING (source)
        |)
        |SELECT doc_id, source, unnest(generate_series(0, copies - 1))::BIGINT AS epoch
        |FROM cop WHERE copies > 0 ORDER BY doc_id, epoch""".stripMargin,

    "q95_distinct_tokens" ->
      // q51's tokenizer, count(DISTINCT) per source
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents
        |)
        |SELECT source, count(DISTINCT token) AS n_distinct_tokens
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "q94_mixture_tokens" ->
      // q55's replay with per-source TOKEN sums in the denominator:
      // ((w / W) * totalTokens) / T_s, W folded in sorted-source order,
      // floor-based base/cut, q45's md5-31 hash family
      """WITH sums AS (
        |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t FROM documents
        |  WHERE source IN ('src0', 'src1', 'src2') GROUP BY source
        |), par AS (
        |  SELECT source,
        |    ((CASE source WHEN 'src0' THEN 0.5::DOUBLE
        |                  WHEN 'src1' THEN 0.25::DOUBLE
        |                  ELSE 0.25::DOUBLE END
        |      / (0.5::DOUBLE + 0.25::DOUBLE + 0.25::DOUBLE)) * 60000.0) / t AS r
        |  FROM sums
        |), cuts AS (
        |  SELECT source, CAST(floor(r) AS BIGINT) AS base,
        |    CAST(floor((r - floor(r)) * 2147483648.0) AS BIGINT) AS cut
        |  FROM par
        |), cop AS (
        |  SELECT d.doc_id, d.source,
        |    c.base + CASE WHEN
        |      (('0x' || substr(md5('graft:' || CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |        & 2147483647::UBIGINT)::BIGINT < c.cut THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN cuts c USING (source)
        |)
        |SELECT doc_id, source, unnest(generate_series(0, copies - 1))::BIGINT AS epoch
        |FROM cop WHERE copies > 0 ORDER BY doc_id, epoch""".stripMargin,

    "q56_group_centroids" ->
      // parallel unnests zip element with its 1-based position; float
      // elements promote to double in both engines' avg, round(6) absorbs
      // summation-order ulps
      """SELECT label, pos - 1 AS dim, round(avg(v), 6) AS centroid,
        |       count(v) AS n_vectors
        |FROM (SELECT label, unnest(embedding) AS v,
        |             unnest(generate_series(1, len(embedding))) AS pos
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, dim""".stripMargin,

    "q57_corpus_stats" ->
      // quantile_cont is the same (n-1)*p linear interpolation Spark's
      // exact percentile computes
      """SELECT source, count(*) AS n, round(avg(n_chars), 6) AS mean,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 6) AS p90,
        |  round(quantile_cont(n_chars, 0.99), 6) AS p99
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q58_pipeline_e2e" ->
      // q12's dedup + q32's quality formula + q13's token count + q45's
      // hash split + q50's packing window, chained — every stage of the
      // pipeline stays bit-reproducible under composition
      """WITH dedup AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents
        |  ) WHERE rn = 1
        |), base AS (
        |  SELECT doc_id, text, CAST(length(text) AS DOUBLE) AS n,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM dedup
        |), m AS (
        |  SELECT doc_id, text, n, alpha, t,
        |    CASE WHEN len(t) > 0 THEN
        |      CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t)
        |    ELSE 0.0 END AS mtl,
        |    CASE WHEN len(t) > 0 THEN CAST(len(list_filter(t, x -> list_contains(
        |      ['der','die','das','und','ist','nicht','ein','mit','the','a','of','and',
        |       'is','to','in','that','el','la','de','que','y','en','un','por','le',
        |       'les','et','est','une','dans'], x))) AS DOUBLE) / len(t)
        |    ELSE 0.0 END AS stop
        |  FROM base
        |), scored AS (
        |  SELECT doc_id, text,
        |    CASE WHEN n < 20 THEN 0.0 ELSE
        |      round(least(1.0, (alpha / greatest(n, 1.0)) * 0.5
        |        + least(stop * 5.0, 1.0) * 0.3
        |        + CASE WHEN mtl BETWEEN 3.0 AND 10.0 THEN 0.2 ELSE 0.0 END), 6)
        |    END AS quality
        |  FROM m
        |), gated AS (
        |  SELECT * FROM scored WHERE quality >= 0.75
        |), split AS (
        |  SELECT doc_id, quality,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
        |    (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT % 4 AS split
        |  FROM gated
        |), packed AS (
        |  SELECT doc_id, quality, n_tokens, split,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM split
        |)
        |SELECT doc_id, quality, n_tokens, split,
        |  CAST(cb // 2048 AS BIGINT) AS pack_id,
        |  CAST(cb % 2048 AS BIGINT) AS pack_offset
        |FROM packed ORDER BY doc_id""".stripMargin,

    "q60_deterministic_shuffle" ->
      // q45's md5-31 hash family with the epoch salt; the key column makes
      // the permutation itself hash-checkable
      """SELECT doc_id, source,
        |  (('0x' || substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |    & 2147483647::UBIGINT)::BIGINT AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,

    "q61_chunk_documents" ->
      // same token stream as q13/q51; windows = ceil((n - overlap) / step),
      // slice clamps at the tail in both engines
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sized AS (
        |  SELECT doc_id, t,
        |    greatest(CAST(ceil(CAST(len(t) - 2 AS DOUBLE) / 14) AS INT), 1) AS nchunks
        |  FROM tok WHERE len(t) > 0
        |), c AS (
        |  SELECT doc_id, t, unnest(generate_series(0, nchunks - 1)) AS i
        |  FROM sized
        |)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |  array_to_string(t[i*14+1 : i*14+16], ' ') AS chunk_text,
        |  CAST(len(t[i*14+1 : i*14+16]) AS BIGINT) AS n_chunk_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "q69_chunk_offsets" ->
      // token offsets recomputed from first principles: explode every
      // character position, mark alphanumeric runs (documents text is
      // ASCII, so lower() preserves positions), number the runs, and take
      // each chunk's span = [start of token k*14+1, end of token
      // least(n, k*14+16)]; passage = substr over that span. Window count
      // mirrors q61 (ceil((n-2)/14), min 1).
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS i
        |  FROM documents
        |), cls AS (
        |  SELECT doc_id, text, i,
        |    substr(lower(text), i, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i, 1) BETWEEN '0' AND '9' AS alnum,
        |    i = 1 OR NOT (substr(lower(text), i - 1, 1) BETWEEN 'a' AND 'z'
        |      OR substr(text, i - 1, 1) BETWEEN '0' AND '9') AS prev_non
        |  FROM pos
        |), runs AS (
        |  SELECT doc_id, text, i,
        |    SUM(CASE WHEN alnum AND prev_non THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY i) AS tok_idx
        |  FROM cls WHERE alnum
        |), tk AS (
        |  SELECT doc_id, text, tok_idx, min(i) AS cs, max(i) AS ce
        |  FROM runs GROUP BY doc_id, text, tok_idx
        |), nt AS (
        |  SELECT doc_id, text, count(*) AS n FROM tk GROUP BY doc_id, text
        |), ch AS (
        |  SELECT doc_id, text, n, unnest(generate_series(0,
        |    greatest(CAST(ceil(CAST(n - 2 AS DOUBLE) / 14) AS BIGINT), 1) - 1)) AS k
        |  FROM nt WHERE n > 0
        |)
        |SELECT ch.doc_id, ch.k AS chunk_id,
        |  f.cs AS char_start, l.ce AS char_end,
        |  substr(ch.text, CAST(f.cs AS INT), CAST(l.ce - f.cs + 1 AS INT)) AS passage
        |FROM ch
        |JOIN tk f ON f.doc_id = ch.doc_id AND f.tok_idx = ch.k * 14 + 1
        |JOIN tk l ON l.doc_id = ch.doc_id
        |  AND l.tok_idx = least(ch.n, ch.k * 14 + 16)
        |ORDER BY ch.doc_id, chunk_id""".stripMargin,

    "q62_dedup_against" ->
      // text equality == digest equality absent sha2 collisions
      """SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents r WHERE r.doc_id < 100 AND r.text = d.text
        |)
        |ORDER BY doc_id""".stripMargin,

    "q64_hashing_tf" ->
      // bucket = md5-31(token) % 64 — the same engine-portable hash family
      // as q45; zero buckets are absent rows on both sides
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (('0x' || substr(md5(t), 1, 16))::UBIGINT
        |    & 2147483647::UBIGINT)::BIGINT % 64 AS bucket,
        |  count(*) AS n
        |FROM tok GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q65_l2_normalize" ->
      // the oracle replays the kernel's max-abs-scaled fold exactly
      // (m * sqrt(sum (v_i/m)^2), left-to-right); zero-norm rows pass
      // through undivided, and vectors with a NULL element emit no rows
      // (Spark nulls the whole vector, so posexplode drops them)
      """SELECT vec_id, pos - 1 AS dim,
        |  round(CASE WHEN m > 0
        |    THEN ve / (m * sqrt(list_inner_product(sv, sv)))
        |    ELSE ve END, 6) AS val
        |FROM (
        |  SELECT vec_id, pos, ve, m,
        |    list_transform(v, x -> x / CASE WHEN m > 0 THEN m ELSE 1 END) AS sv
        |  FROM (
        |    SELECT vec_id, v, unnest(v) AS ve,
        |           unnest(generate_series(1, len(v))) AS pos,
        |           coalesce(list_max(list_transform(v, x -> abs(x))), 0) AS m
        |    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |    WHERE len(v) = len(list_filter(v, x -> x IS NOT NULL))
        |  )
        |)
        |ORDER BY vec_id, dim""".stripMargin,

    "q66_hashing_tfidf" ->
      // smoothed idf recomputed from first principles; ln differs from
      // Math.log by at most an ulp, absorbed by round(6)
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(t), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT % 64 AS bucket,
        |    count(*) AS tf
        |  FROM tok GROUP BY doc_id, bucket
        |), dfc AS (
        |  SELECT bucket, count(*) AS df FROM tf GROUP BY bucket
        |), nn AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, bucket,
        |  round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        |FROM tf JOIN dfc USING (bucket) CROSS JOIN nn
        |ORDER BY doc_id, bucket""".stripMargin,

    "q70_quantize_embeddings" ->
      // replay the kernel exactly: m = max |v_i| (float->double is exact),
      // scale = m/127, q_i = floor(v_i/m*127 + 0.5); zero vector -> all-0 q
      // at scale 0; vectors with a NULL element emit no rows (Spark nulls
      // the struct, like q65)
      """SELECT vec_id, round(m / 127.0, 9) AS scale, pos - 1 AS dim,
        |  CAST(CASE WHEN m > 0 THEN floor(ve / m * 127.0 + 0.5)
        |       ELSE 0 END AS TINYINT) AS q
        |FROM (
        |  SELECT vec_id, unnest(v) AS ve,
        |         unnest(generate_series(1, len(v))) AS pos,
        |         coalesce(list_max(list_transform(v, x -> abs(x))), 0) AS m
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |  WHERE len(v) = len(list_filter(v, x -> x IS NOT NULL))
        |)
        |ORDER BY vec_id, dim""".stripMargin,

    "q73_asof_join" ->
      // replay the union+window formulation (portable across DuckDB
      // versions, unlike native ASOF JOIN): right rows tag 0 sort before
      // left rows at equal ts -> '<=' semantics. The payload rides inside
      // a STRUCT marker: the struct is non-null for every ref row even
      // when its VALUE is null, so IGNORE NULLS skips left rows only —
      // a null-valued latest observation yields NULL (engine semantics),
      // it does not fall through to an older non-null ref
      """WITH ref AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, max(value) AS ref_value
        |  FROM events WHERE event_id % 20 = 0 GROUP BY user_id, epoch_ns(ts)
        |), lft AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn, value
        |  FROM events WHERE event_id % 20 <> 0
        |), u AS (
        |  SELECT user_id, tsn, 1 AS tag, event_id, value,
        |         CAST(NULL AS STRUCT(v DOUBLE)) AS rvs
        |  FROM lft
        |  UNION ALL
        |  SELECT user_id, tsn, 0 AS tag, NULL, NULL,
        |         {'v': ref_value} FROM ref
        |), filled AS (
        |  SELECT user_id, tag, event_id, value,
        |    (last_value(rvs IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tsn, tag
        |      ROWS UNBOUNDED PRECEDING)).v AS ref_asof
        |  FROM u
        |)
        |SELECT user_id, event_id, round(value, 6) AS value,
        |       round(ref_asof, 6) AS ref_value_asof
        |FROM filled WHERE tag = 1
        |ORDER BY user_id, event_id""".stripMargin,

    "q72_cap_per_group" ->
      // same md5-31 key hash as q45; QUALIFY needs the window inline
      """SELECT doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source ORDER BY
        |  (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |    & 2147483647::UBIGINT)::BIGINT, doc_id) <= 15
        |ORDER BY doc_id""".stripMargin,

    "q71_ann_quantized" ->
      // q29's shape over recomputed int8 codes (q70's quantization formula
      // inline); integer dots are exact, so no rounding subtleties beyond
      // the final round(6)
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), qz AS (
        |  SELECT vec_id,
        |    list_transform(v, x -> CASE WHEN m > 0
        |      THEN floor(x / m * 127.0 + 0.5) ELSE 0.0 END) AS q
        |  FROM (SELECT vec_id, v,
        |          coalesce(list_max(list_transform(v, x -> abs(x))), 0) AS m
        |        FROM e)
        |), scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(CASE WHEN sqrt(list_inner_product(q.q, q.q))
        |                  * sqrt(list_inner_product(c.q, c.q)) > 0
        |      THEN list_inner_product(q.q, c.q)
        |           / (sqrt(list_inner_product(q.q, q.q))
        |              * sqrt(list_inner_product(c.q, c.q)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM qz q JOIN qz c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 5
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q67_hashing_tf_sparse" ->
      // identical oracle to q64 by design: the sparse kernel must reproduce
      // the dense kernel's non-zero rows exactly
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  (('0x' || substr(md5(t), 1, 16))::UBIGINT
        |    & 2147483647::UBIGINT)::BIGINT % 64 AS bucket,
        |  count(*) AS n
        |FROM tok GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,

    "q68_score_linear" ->
      // w(b) = ((b*37 % 21) - 10)/1024 — dyadic, so the per-doc sum is
      // exact regardless of order; zero-token docs score sigmoid(bias),
      // null text scores NULL on both sides
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t
        |  FROM documents
        |), contrib AS (
        |  SELECT doc_id,
        |    ((((('0x' || substr(md5(t), 1, 16))::UBIGINT
        |        & 2147483647::UBIGINT)::BIGINT % 64) * 37 % 21) - 10) / 1024.0 AS w
        |  FROM tok
        |), z AS (
        |  SELECT doc_id, sum(w) AS sw FROM contrib GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       ELSE round(1.0 / (1.0 + exp(-(0.25 + coalesce(z.sw, 0)))), 6)
        |  END AS score
        |FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q43_pii_redact" ->
      // same RE2-compatible patterns; DuckDB regexp_replace needs the 'g'
      // flag to match Spark's replace-all default
      s"""WITH r AS (
         |  SELECT doc_id, text,
         |    regexp_replace(text, '${TextOps.EmailRe}', '<EMAIL>', 'g') AS after_email
         |  FROM documents
         |), r2 AS (
         |  SELECT doc_id, text, after_email,
         |    regexp_replace(after_email, '${TextOps.Ipv4Re}', '<IP>', 'g') AS after_ip
         |  FROM r
         |)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(after_email, '${TextOps.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(after_ip, '${TextOps.PhoneRe}')) AS BIGINT) AS n_phones,
         |  sha256(regexp_replace(after_ip,
         |    '${TextOps.PhoneRe}', '<PHONE>', 'g')) AS redacted_sha
         |FROM r2 ORDER BY doc_id""".stripMargin,

    "q44_repetition" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), base AS (
        |  SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS n,
        |    len(list_distinct(CASE WHEN len(t) >= 2
        |      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE [array_to_string(t, ' ')] END)) AS d2
        |  FROM tok
        |), tf AS (
        |  SELECT doc_id, max(c) AS mx FROM (
        |    SELECT doc_id, w, count(*) AS c
        |    FROM (SELECT doc_id, unnest(t) AS w FROM tok) GROUP BY doc_id, w
        |  ) GROUP BY doc_id
        |)
        |SELECT b.doc_id,
        |  CASE WHEN b.n >= 2
        |       THEN round(1.0 - CAST(b.d2 AS DOUBLE) / greatest(b.n - 1, 1.0), 6)
        |       ELSE 0.0 END AS dup_2gram_frac,
        |  CASE WHEN b.n > 0
        |       THEN round(CAST(coalesce(tf.mx, 0) AS DOUBLE) / b.n, 6)
        |       ELSE 0.0 END AS top_token_frac
        |FROM base b LEFT JOIN tf ON b.doc_id = tf.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q87_weighted_sample" ->
      // the q45 hash family with a per-row cut: keep iff
      // hash < clamp(n_chars/600) * 2^31 (weight 1.0 keeps always)
      """SELECT doc_id FROM documents
        |WHERE CAST((('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |        & 2147483647::UBIGINT)::BIGINT AS DOUBLE)
        |  < least(greatest(n_chars / 600.0, 0.0), 1.0) * 2147483648.0
        |ORDER BY doc_id""".stripMargin,

    "q88_sessions" ->
      // replay of Spark's session_window rule on epoch_us integers: a row
      // starts a session iff it is the user's first or the gap since the
      // previous event is STRICTLY over 30 min (Spark merges an event
      // landing exactly on the previous window's ts+gap bound —
      // EventOpsSpec pins the boundary); session_end = last event + gap.
      // Ties at equal us land in the same session whichever orders first,
      // so the running sum is tie-order-independent.
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT user_id, us, value,
        |    CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), s AS (
        |  SELECT user_id, us, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM f
        |)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, seq ORDER BY user_id, start_us""".stripMargin,

    "q89_windowed_events" ->
      // time_bucket's hour grid is epoch-aligned like Spark's window().
      // The json_valid guard + TRY_CAST replay get_json_object's LENIENT
      // semantics (malformed JSON, missing key, non-numeric value -> NULL)
      // — a bare props->>'k' / CAST would ABORT on rows Spark nulls.
      // The outer CAST(... AS BIGINT) matters: DuckDB widens sum(BIGINT)
      // to HUGEINT (int128), which different client fetch paths render
      // differently (9 vs 9.0 vs Decimal('9')) — not an engine-portable
      // result type. Every oracle must stay inside the portable-type
      // whitelist enforced by OracleTypePortabilitySpec.
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  CAST(sum(TRY_CAST(CASE WHEN json_valid(props) THEN props->>'k' END
        |                    AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q90_sessionize" -> SessionizeOracleSql,

    // same SQL verbatim: q182 is the skew-bounded implementation of the
    // SAME semantics — one oracle text makes divergence unrepresentable
    "q182_sessionize_bucketed" -> SessionizeOracleSql,

    "q183_deflate_ratio" ->
      // golden-anchored deflate lengths (independent Python zlib raw
      // deflate, level 6 — byte-length-identical to JDK Deflater(6,true),
      // measured); the ratio/quantization arithmetic mirrors the engine
      // operation-for-operation on the same integers. corpus_key guards
      // against serving another SF's rows (the q86 rule).
      s"""SELECT d.doc_id,
         |  CAST(floor(CASE WHEN strlen(d.text) = 0 THEN 1.0
         |    ELSE CAST(g.deflate_len AS DOUBLE) / strlen(d.text)
         |    END * 1e6 + 0.5) AS BIGINT) AS ratio_q6
         |FROM documents d
         |JOIN read_parquet('$goldenDir/q183_deflate.parquet') g
         |  ON g.doc_id = d.doc_id
         |WHERE g.corpus_key = (
         |  SELECT CAST(count(*) AS VARCHAR) || ':' ||
         |         CAST(CAST(sum(length(text)) AS BIGINT) AS VARCHAR)
         |  FROM documents)
         |ORDER BY d.doc_id""".stripMargin,

    "q184_kll_band_contract" ->
      // the deterministic half of the KLL contract recomputed from the
      // raw table: per-source counts, rank-band positions (same double
      // literals, same IEEE ops), and the band VALUES by positional sort
      // — plus the constant the engine's boolean must equal. Ties in
      // n_chars are position-safe: the value at a fixed sorted position
      // is well-defined whatever order row_number breaks ties in.
      """WITH d AS (
        |  SELECT source, n_chars FROM documents WHERE n_chars IS NOT NULL
        |), n AS (SELECT source, count(*) AS n_rows FROM d GROUP BY source),
        |p AS (SELECT * FROM (VALUES
        |  ('p25', CAST(0.25 AS DOUBLE)), ('p50', CAST(0.5 AS DOUBLE)),
        |  ('p75', CAST(0.75 AS DOUBLE)), ('p90', CAST(0.9 AS DOUBLE)),
        |  ('p99', CAST(0.99 AS DOUBLE))) AS t(pct, p)),
        |pos AS (
        |  SELECT n.source, p.pct, n.n_rows,
        |    greatest(1, CAST(ceil((p.p - 0.03) * n.n_rows) AS BIGINT)) AS lo_pos,
        |    least(n.n_rows, greatest(1,
        |      CAST(floor((p.p + 0.03) * n.n_rows) AS BIGINT))) AS hi_pos
        |  FROM n CROSS JOIN p
        |), r AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn
        |  FROM d
        |)
        |SELECT pos.source, pos.pct, pos.n_rows,
        |  lo.n_chars AS v_lo, hi.n_chars AS v_hi, true AS within_band
        |FROM pos
        |JOIN r lo ON lo.source = pos.source AND lo.rn = pos.lo_pos
        |JOIN r hi ON hi.source = pos.source AND hi.rn = pos.hi_pos
        |ORDER BY pos.source, pos.pct""".stripMargin,

    "q185_hll_merge_contract" ->
      // q95's exact distinct per source (same tokenizer), plus the
      // constant the engine's 3σ envelope boolean must equal
      """WITH tok AS (
        |  SELECT source, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents
        |)
        |SELECT source, count(DISTINCT token) AS n_distinct_tokens,
        |  true AS within_bound
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "q96_funnel" ->
      // chained per-user min-ts CTEs: step k's completion = earliest step-k
      // event at-or-after the step-(k-1) completion (same-microsecond
      // counts, the Spark op's '>=' rule)
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), s0 AS (
        |  SELECT user_id, min(us) AS done FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s1 AS (
        |  SELECT e.user_id, min(e.us) AS done FROM e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.us >= s0.done GROUP BY e.user_id
        |), s2 AS (
        |  SELECT e.user_id, min(e.us) AS done FROM e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'signup' AND e.us >= s1.done GROUP BY e.user_id
        |), s3 AS (
        |  SELECT e.user_id, min(e.us) AS done FROM e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.us >= s2.done GROUP BY e.user_id
        |)
        |SELECT * FROM (
        |  SELECT 'view' AS step, 0 AS step_index, (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT 'click', 1, (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 'signup', 2, (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 'purchase', 3, (SELECT count(*) FROM s3)
        |) ORDER BY step_index""".stripMargin,

    "q97_retention" ->
      // exact long floor-div bucketing (the pmod form, negative-safe like
      // the Spark op); '//' keeps DuckDB in integer division
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), b AS (
        |  SELECT user_id, us,
        |    (us - ((us % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS bk
        |  FROM e
        |), c AS (
        |  SELECT user_id, min(us) AS first_us FROM e GROUP BY user_id
        |), cb AS (
        |  SELECT user_id,
        |    (first_us - ((first_us % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS cohort
        |  FROM c
        |)
        |SELECT cohort * 86400000000 AS cohort_start_us, bk - cohort AS period,
        |  count(DISTINCT b.user_id) AS n_users
        |FROM b JOIN cb USING (user_id)
        |WHERE bk - cohort <= 30
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q98_bm25" -> Bm25OracleSql,
    // the landed path must be row-identical to the inline path
    "q99_bm25_indexed" -> Bm25OracleSql,
    // land + append must reconstruct the full corpus exactly
    "q106_bm25_appended" -> Bm25OracleSql,

    "q107_winnow" ->
      // the rightmost-min tie rule rides inside the struct order
      // (h asc, -i asc == pos desc); md5-31 grams replay exactly
      """WITH tokarr AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents
        |), idx AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(1, len(toks) - 2)) AS i
        |  FROM tokarr
        |), grams AS (
        |  SELECT doc_id, i,
        |    (('0x' || substr(md5(array_to_string(
        |        toks[CAST(i AS INT):CAST(i + 2 AS INT)], ' ')), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS h
        |  FROM idx
        |), win AS (
        |  SELECT doc_id, i, h,
        |    min(struct_pack(h := h, np := -i)) OVER (PARTITION BY doc_id
        |      ORDER BY i ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS m,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS c
        |  FROM grams
        |)
        |SELECT DISTINCT doc_id, CAST(-(m.np) - 1 AS BIGINT) AS pos,
        |  m.h AS gram_hash
        |FROM win WHERE c = 4
        |ORDER BY doc_id, pos""".stripMargin,

    "q108_winnow_overlap" ->
      (s"""WITH probes AS (
         |  SELECT doc_id + 3000000 AS doc_id, substr(text, 30, 80) AS text
         |  FROM documents WHERE doc_id < 30
         |), corpus AS (
         |  SELECT doc_id, text FROM documents
         |), ${winnowCtes("probes", "a")},
         |${winnowCtes("corpus", "b")}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |FROM afp a JOIN bfp b USING (gram_hash)
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY id_a, id_b""").stripMargin,
    "q100_near_dedup_keep_best" -> OracleSqlGen.nearDedupKeepBestSql,

    "q101_key_skew" ->
      // integer-exact replay: floor-division ppm share, ceil-division salt
      // factor; NULL keys sort first like the Spark asc_nulls_first
      """WITH counts AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key_value, count(*) AS n_rows
        |  FROM events GROUP BY 1
        |), totals AS (
        |  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
        |         count(*) AS n_keys FROM counts
        |), top AS (
        |  SELECT key_value, n_rows FROM counts
        |  ORDER BY n_rows DESC, key_value NULLS FIRST LIMIT 20
        |)
        |SELECT
        |  row_number() OVER (ORDER BY n_rows DESC, key_value NULLS FIRST) AS rank,
        |  key_value, n_rows,
        |  (n_rows * 1000000) // t.total_rows AS share_ppm,
        |  greatest(1, (n_rows * 32 + t.total_rows - 1) // t.total_rows) AS salt_factor,
        |  t.n_keys, t.total_rows
        |FROM top CROSS JOIN totals t ORDER BY rank""".stripMargin,

    "q109_salted_join" ->
      // the PLAIN join — salting is placement-only, so the salted plan
      // must reproduce this exactly; sum(key_n) pins join multiplicity
      // (a double-counted salted replica would inflate it)
      """WITH f AS (
        |  SELECT CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id % 50 END
        |           AS skew_key, event_type, value
        |  FROM events
        |), d AS (
        |  SELECT skew_key, count(*) AS key_n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS key_total
        |  FROM f GROUP BY 1
        |), j AS (
        |  SELECT f.event_type, d.key_n, d.key_total
        |  FROM f JOIN d USING (skew_key)
        |)
        |SELECT event_type, count(*) AS n_rows,
        |  CAST(sum(key_n) AS BIGINT) AS sum_key_n,
        |  CAST(sum(CAST(key_total AS DECIMAL(18,2))) AS DOUBLE) AS sum_key_total
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q110_interval_join" ->
      // the theta-join the bucketed equi-join must reproduce: every event
      // with lo <= us < hi of any error-event window
      """WITH e AS (
        |  SELECT event_id, epoch_us(ts) AS us, value, event_type
        |  FROM events WHERE ts IS NOT NULL
        |), iv AS (
        |  SELECT event_id AS incident_id, us AS lo, us + 300000000 AS hi
        |  FROM e WHERE event_type = 'error'
        |), j AS (
        |  SELECT iv.incident_id, e.value
        |  FROM e JOIN iv ON e.us >= iv.lo AND e.us < iv.hi
        |)
        |SELECT incident_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // cell-for-cell sketch replay: the same md5-31 bucket per (row,
    // token), counter = occurrences per cell, estimate = min over the
    // token's 4 cells; probes = the exact top-20 vocabulary
    "q111_cms_heavy_hitters" -> CmsOracleSql,

    // the landed+appended sketch must be cell-identical to the inline
    // full-corpus sketch (counter addition IS merging) -> same oracle
    "q115_cms_landed" -> CmsOracleSql,

    "q121_join_overlap" ->
      // integer-exact replay: distinct key sets, shared join, ppm floor
      // division, null-row counts
      """WITH l AS (
        |  SELECT CASE WHEN user_id % 37 = 0 THEN NULL ELSE user_id END AS k
        |  FROM events
        |), r AS (
        |  SELECT c_custkey AS k FROM customer
        |), lk AS (SELECT DISTINCT k FROM l WHERE k IS NOT NULL),
        |rk AS (SELECT DISTINCT k FROM r WHERE k IS NOT NULL),
        |s AS (SELECT count(*) AS n_shared_keys FROM lk JOIN rk USING (k)),
        |lc AS (SELECT count(*) AS n_left_keys FROM lk),
        |rc AS (SELECT count(*) AS n_right_keys FROM rk),
        |ln_ AS (SELECT count(*) FILTER (WHERE k IS NULL) AS n_left_null_rows FROM l),
        |rn_ AS (SELECT count(*) FILTER (WHERE k IS NULL) AS n_right_null_rows FROM r)
        |SELECT n_left_keys, n_right_keys, n_shared_keys,
        |  n_left_null_rows, n_right_null_rows,
        |  CASE WHEN n_left_keys > 0
        |    THEN (n_shared_keys * 1000000) // n_left_keys ELSE 0 END
        |    AS left_in_right_ppm,
        |  CASE WHEN n_right_keys > 0
        |    THEN (n_shared_keys * 1000000) // n_right_keys ELSE 0 END
        |    AS right_in_left_ppm
        |FROM lc CROSS JOIN rc CROSS JOIN s CROSS JOIN ln_ CROSS JOIN rn_""".stripMargin,

    "q122_profile_columns" ->
      // one SELECT per column; min/max in native type, then cast — the
      // same binary UTF-8 string ordering on both engines
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, count(*) AS n_rows,
        |    count(*) - count(doc_id) AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_value,
        |    CAST(max(doc_id) AS VARCHAR) AS max_value
        |  FROM documents
        |  UNION ALL
        |  SELECT 'text', count(*), count(*) - count(text),
        |    count(DISTINCT text), CAST(min(text) AS VARCHAR),
        |    CAST(max(text) AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(*), count(*) - count(lang),
        |    count(DISTINCT lang), CAST(min(lang) AS VARCHAR),
        |    CAST(max(lang) AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'source', count(*), count(*) - count(source),
        |    count(DISTINCT source), CAST(min(source) AS VARCHAR),
        |    CAST(max(source) AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |    count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
        |    CAST(max(n_chars) AS VARCHAR) FROM documents
        |)
        |SELECT * FROM p ORDER BY column_name""".stripMargin,

    "q123_cluster_sizes" -> OracleSqlGen.clusterSizeHistogramSql,

    "q124_url_dedup" ->
      // same URL synthesis, same regex pipeline (RE2 both sides); DuckDB
      // needs the explicit 'g' flag only on the multi-param strip
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
        |    || source || '.Example.COM'
        |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
        |    || '/Docs/' || CAST(doc_id % 25 AS VARCHAR) || '/page'
        |    || (CASE WHEN doc_id % 5 = 0
        |          THEN '?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR) || '&utm_campaign=x'
        |        WHEN doc_id % 5 = 1
        |          THEN '?id=' || CAST(doc_id % 25 AS VARCHAR) || '&gclid=abc'
        |        ELSE '?id=' || CAST(doc_id % 25 AS VARCHAR) END)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END) AS url
        |  FROM documents
        |), parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 1)) AS scheme,
        |    lower(regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 2)) AS host0,
        |    regexp_extract(trim(url), '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$', 3) AS rest0,
        |    trim(url) AS u0
        |  FROM u
        |), hostfix AS (
        |  SELECT doc_id, scheme, u0,
        |    regexp_replace(
        |      CASE WHEN scheme = 'https' THEN regexp_replace(host0, ':443$', '')
        |           WHEN scheme = 'http' THEN regexp_replace(host0, ':80$', '')
        |           ELSE host0 END, '^www\.', '') AS host,
        |    regexp_replace(rest0, '#.*$', '') AS nofrag
        |  FROM parts
        |), split_pq AS (
        |  SELECT doc_id, scheme, host, u0,
        |    regexp_extract(nofrag, '^([^?]*)', 1) AS path,
        |    CASE WHEN strpos(nofrag, '?') > 0
        |      THEN regexp_extract(nofrag, '^[^?]*\?(.*)$', 1)
        |      ELSE '' END AS query0
        |  FROM hostfix
        |), stripd AS (
        |  SELECT doc_id, scheme, host, u0, path,
        |    regexp_replace(regexp_replace(
        |      regexp_replace(query0,
        |        '(^|&)(utm_[A-Za-z0-9]+|fbclid|gclid)=[^&]*', '', 'g'),
        |      '^&+', ''), '&+$', '') AS query
        |  FROM split_pq
        |), sep AS (
        |  SELECT doc_id, scheme, host, u0,
        |    CASE WHEN query <> '' THEN path || '?' || query ELSE path END
        |      AS rest
        |  FROM stripd
        |), canon AS (
        |  SELECT doc_id,
        |    CASE WHEN scheme <> '' THEN scheme || '://' || host || rest
        |         ELSE u0 END AS canonical_url
        |  FROM sep
        |)
        |SELECT canonical_url, min(doc_id) AS keeper_doc_id,
        |  count(*) AS n_dups
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    "q125_contamination_report" ->
      // q46's shingle chain with per-doc counts; integer floor-div ppm
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) >= 5
        |      THEN list_transform(range(1, len(t) - 3),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4])
        |      ELSE [array_to_string(t, ' ')] END) AS s
        |  FROM tok
        |), probe AS (
        |  SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id < 3
        |), d AS (
        |  SELECT doc_id, unnest(s) AS g FROM sh
        |), agg AS (
        |  SELECT d.doc_id, count(*) AS n_shingles,
        |    count(p.g) AS n_contaminated
        |  FROM d LEFT JOIN probe p ON d.g = p.g
        |  GROUP BY d.doc_id
        |)
        |SELECT doc_id, n_shingles, n_contaminated,
        |  (n_contaminated * 1000000) // n_shingles AS contamination_ppm
        |FROM agg WHERE n_contaminated > 0 ORDER BY doc_id""".stripMargin,

    "q126_ewma" ->
      // the recurrence replayed per user by a recursive CTE advancing one
      // time-ordered row per step (q22 lp_filter precedent): same IEEE
      // ops in the same order -> bit-exact; null values carry the state
      """WITH RECURSIVE e AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, event_id, rn, value, value AS ewma
        |  FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.rn, e.value,
        |    CASE WHEN e.value IS NULL THEN r.ewma
        |         WHEN r.ewma IS NULL THEN e.value
        |         ELSE 0.5 * e.value + 0.5 * r.ewma END
        |  FROM rec r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT event_id, user_id, value, ewma
        |FROM rec ORDER BY event_id""".stripMargin,

    "q127_heavy_hitters" ->
      // the exact definition the two-phase MG query guarantees: every
      // token with count*k strictly over n, exact counts, floor-div ppm
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '')) AS token
        |  FROM documents
        |), tot AS (SELECT count(*) AS n FROM tok),
        |c AS (SELECT token, count(*) AS n_rows FROM tok GROUP BY token)
        |SELECT c.token, c.n_rows, (c.n_rows * 1000000) // t.n AS share_ppm
        |FROM c CROSS JOIN tot t WHERE c.n_rows * 50 > t.n
        |ORDER BY c.n_rows DESC, c.token""".stripMargin,

    "q128_kmeans" -> OracleSqlGen.kmeansIntSql(k = 8, iters = 3, scale = 1000),

    "q172_prototypes" -> OracleSqlGen.prototypeSelectSql(k = 8, iters = 3,
      scale = 1000, perCluster = 5, keepClosest = true),

    "q129_margin_matches" ->
      // raw-double cosine for ranking (same IEEE fold), micro-int sums
      // for the neighborhoods, one positive floor division for the margin
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), l AS (SELECT vec_id AS src_id, v AS lv FROM e WHERE vec_id % 2 = 0),
        |r AS (SELECT vec_id AS tgt_id, v AS rv FROM e WHERE vec_id % 2 = 1),
        |p AS (
        |  SELECT src_id, tgt_id,
        |    (CASE WHEN sqrt(list_inner_product(lv, lv))
        |               * sqrt(list_inner_product(rv, rv)) > 0
        |      THEN list_inner_product(lv, rv)
        |           / (sqrt(list_inner_product(lv, lv))
        |              * sqrt(list_inner_product(rv, rv)))
        |      ELSE 0.0 END) AS c
        |  FROM l CROSS JOIN r
        |), pm AS (
        |  SELECT src_id, tgt_id, c,
        |    CAST(floor(c * 1000000 + 0.5) AS BIGINT) AS cm
        |  FROM p
        |), ranked AS (
        |  SELECT src_id, tgt_id, c, cm,
        |    row_number() OVER (PARTITION BY src_id ORDER BY c DESC, tgt_id) AS rf,
        |    row_number() OVER (PARTITION BY tgt_id ORDER BY c DESC, src_id) AS rb
        |  FROM pm
        |), sl AS (
        |  SELECT src_id, CAST(sum(cm) AS BIGINT) AS s_l,
        |    CAST(count(*) AS BIGINT) AS n_l
        |  FROM ranked WHERE rf <= 4 GROUP BY src_id
        |), sr AS (
        |  SELECT tgt_id, CAST(sum(cm) AS BIGINT) AS s_r,
        |    CAST(count(*) AS BIGINT) AS n_r
        |  FROM ranked WHERE rb <= 4 GROUP BY tgt_id
        |), m AS (
        |  SELECT k.src_id, k.tgt_id, k.cm AS cos_micro,
        |    CASE WHEN (s_l * n_r + s_r * n_l) > 0
        |      THEN CAST((k.cm * 2 * n_l * n_r * 1000000)
        |                // (s_l * n_r + s_r * n_l) AS BIGINT)
        |      ELSE 0 END AS margin_micro
        |  FROM ranked k JOIN sl USING (src_id) JOIN sr USING (tgt_id)
        |  WHERE k.rf = 1 AND k.rb = 1
        |)
        |SELECT src_id, tgt_id, cos_micro, margin_micro
        |FROM m WHERE margin_micro >= 1000000 ORDER BY src_id""".stripMargin,

    "q164_margin_banded" ->
      // banded candidates (planes from the shared Scala constants) + the
      // q129 tail over candidates only — one arithmetic definition
      OracleSqlGen.marginBandedSql(8, 12, 4, 1000000L),

    "q130_distinctive_terms" ->
      // same tokenizer, same micro-nat idf quantization, same rank rule
      """WITH tok AS (
        |  SELECT source,
        |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT source, tok, count(*) AS tf FROM tok GROUP BY source, tok
        |), dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |ng AS (SELECT count(DISTINCT source) AS ng FROM tf),
        |sc AS (
        |  SELECT tf.source, tf.tok, tf.tf, dfq.df,
        |    tf.tf * CAST(floor(ln(CAST(ng.ng AS DOUBLE) / dfq.df) * 1000000
        |      + 0.5) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN ng
        |), r AS (
        |  SELECT source, tok, tf, df, score_micro,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score_micro DESC, tok) AS rank
        |  FROM sc
        |)
        |SELECT source, tok AS token, tf, df, score_micro,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin,

    "q131_token_drift" ->
      // add-one smoothed PSI per token, pico-nat-quantized BEFORE any
      // summation; same planted B-snapshot
      """WITH b AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 10 = 0 THEN ' driftmarker alpha beta'
        |         ELSE '' END AS text
        |  FROM documents WHERE doc_id % 2 = 0
        |), ta AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '')) AS tok
        |  FROM documents
        |), tb AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '')) AS tok
        |  FROM b
        |), ca AS (SELECT tok, count(*) AS c_a FROM ta GROUP BY tok),
        |cb AS (SELECT tok, count(*) AS c_b FROM tb GROUP BY tok),
        |j AS (
        |  SELECT COALESCE(ca.tok, cb.tok) AS tok,
        |    COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        |  FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
        |), tot AS (
        |  SELECT sum(c_a) AS na, sum(c_b) AS nb, count(*) AS v FROM j
        |), sc AS (
        |  SELECT tok, c_a, c_b,
        |    CAST(floor(
        |      ((CAST(c_a + 1 AS DOUBLE) / (na + v))
        |        - (CAST(c_b + 1 AS DOUBLE) / (nb + v)))
        |      * ln((CAST(c_a + 1 AS DOUBLE) / (na + v))
        |           / (CAST(c_b + 1 AS DOUBLE) / (nb + v)))
        |      * 1000000000000 + 0.5) AS BIGINT) AS contrib_pico
        |  FROM j CROSS JOIN tot
        |)
        |SELECT tok AS token, c_a, c_b, contrib_pico
        |FROM sc ORDER BY contrib_pico DESC, token LIMIT 20""".stripMargin,

    "q132_embedding_outliers" ->
      // milli-unit integer distances (vectorized summation exact on
      // integer-valued doubles), exact-percentile threshold per label
      """WITH q AS (
        |  SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> floor(x * 1000 + 0.5)) AS q
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), cd AS (
        |  SELECT label, dim, floor(sum(v) / count(*)) AS c
        |  FROM (
        |    SELECT label, unnest(q) AS v,
        |      unnest(generate_series(1, len(q))) - 1 AS dim
        |    FROM q
        |  ) GROUP BY label, dim
        |), cent AS (SELECT label, list(c ORDER BY dim) AS cv FROM cd GROUP BY label),
        |d AS (
        |  SELECT vec_id, q.label,
        |    CAST(list_inner_product(q.q, q.q)
        |      - 2*list_inner_product(q.q, cent.cv)
        |      + list_inner_product(cent.cv, cent.cv) AS BIGINT) AS dist2
        |  FROM q JOIN cent ON q.label = cent.label
        |), thr AS (
        |  SELECT label, quantile_cont(dist2, 0.95) AS t FROM d GROUP BY label
        |)
        |SELECT d.vec_id, d.label, d.dist2, thr.t AS dist2_threshold,
        |  d.dist2 > thr.t AS is_outlier
        |FROM d JOIN thr USING (label) ORDER BY d.vec_id""".stripMargin,

    "q133_hopping_windows" ->
      // hop-aligned window starts from integer microseconds; 4 windows
      // per event; micro-int value sums. The ((us % hop) + hop) % hop
      // floor-mod matches Spark's pmod for pre-epoch (negative-micros)
      // timestamps too — DuckDB's bare % is sign-of-dividend
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
        |  FROM events WHERE ts IS NOT NULL
        |), w AS (
        |  SELECT unnest(generate_series(
        |      us - ((us % 900000000) + 900000000) % 900000000 - CAST(2700000000 AS BIGINT),
        |      us - ((us % 900000000) + 900000000) % 900000000, 900000000)) AS window_start_us,
        |    event_type, vm
        |  FROM e
        |)
        |SELECT window_start_us, event_type, count(*) AS n_events,
        |  CAST(sum(vm) AS BIGINT) AS sum_value_micro
        |FROM w GROUP BY window_start_us, event_type
        |ORDER BY window_start_us, event_type""".stripMargin,

    "q138_rate_spikes" ->
      // q133's window CTE + per-type count stats + the q113 z rule
      """WITH e AS (
        |  SELECT epoch_us(ts) AS us, event_type
        |  FROM events WHERE ts IS NOT NULL
        |), w AS (
        |  SELECT unnest(generate_series(
        |      us - ((us % 900000000) + 900000000) % 900000000 - CAST(2700000000 AS BIGINT),
        |      us - ((us % 900000000) + 900000000) % 900000000, 900000000)) AS window_start_us,
        |    event_type
        |  FROM e
        |), win AS (
        |  SELECT window_start_us, event_type, count(*) AS n_events
        |  FROM w GROUP BY window_start_us, event_type
        |), st AS (
        |  SELECT event_type, avg(n_events) AS mu,
        |    stddev_pop(n_events) AS sigma
        |  FROM win GROUP BY event_type
        |)
        |SELECT w2.window_start_us, w2.event_type, w2.n_events,
        |  CASE WHEN st.sigma > 0
        |    THEN round((w2.n_events - st.mu) / st.sigma, 6)
        |    ELSE 0.0 END AS z,
        |  (CASE WHEN st.sigma > 0
        |    THEN round((w2.n_events - st.mu) / st.sigma, 6)
        |    ELSE 0.0 END) > 2.0 AS is_spike
        |FROM win w2 JOIN st USING (event_type)
        |ORDER BY w2.window_start_us, w2.event_type""".stripMargin,

    "q139_dedup_impact" -> OracleSqlGen.dedupImpactSql,

    "q143_stream_ingest_replay" ->
      OracleSqlGen.streamIngestReplaySql(64, 16),

    "q148_cdc_chunks" ->
      // the CDC sliding-window walk lives in OracleSqlGen.cdcWalkCtes
      // (shared with q149) — chunks hashed md5-31 and semi-join-counted
      // against each original
      OracleSqlGen.cdcChunksSql(16, 4, 64),

    "q149_cdc_delta" ->
      OracleSqlGen.cdcDeltaSql(16, 4, 64),

    "q150_near_dup_matches" ->
      OracleSqlGen.nearDupMatchesSql(64, 16),

    "q153_ann_appended" ->
      // q42/q76's IVF oracle with ONE change: the codebook CTE takes the
      // 16 lowest ids of the LANDED subset (vec_id % 4 <> 0) — the frozen
      // codebook appendAnnIndex assigns under — while cells and probes
      // range over the full corpus (landed + appended)
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), c AS (
        |  SELECT vec_id AS cent_id, v AS cv FROM e
        |  WHERE vec_id % 4 <> 0 ORDER BY vec_id LIMIT 16
        |), assign AS (
        |  SELECT e.vec_id, e.v, c.cent_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      CASE WHEN sqrt(list_inner_product(e.v, e.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
        |        THEN list_inner_product(e.v, c.cv)
        |             / (sqrt(list_inner_product(e.v, e.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)))
        |        ELSE 0.0 END DESC, c.cent_id) AS rn
        |  FROM e CROSS JOIN c
        |), cell AS (
        |  SELECT vec_id, v, cent_id AS cl FROM assign WHERE rn = 1
        |), probes AS (
        |  SELECT q.vec_id AS query_id, q.v AS qv, c.cent_id AS cl,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      CASE WHEN sqrt(list_inner_product(q.v, q.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)) > 0
        |        THEN list_inner_product(q.v, c.cv)
        |             / (sqrt(list_inner_product(q.v, q.v))
        |                * sqrt(list_inner_product(c.cv, c.cv)))
        |        ELSE 0.0 END DESC, c.cent_id) AS prn
        |  FROM e q CROSS JOIN c WHERE q.vec_id < 5
        |), scored AS (
        |  SELECT p.query_id, ce.vec_id AS neighbor_id,
        |    round(CASE WHEN sqrt(list_inner_product(p.qv, p.qv))
        |                    * sqrt(list_inner_product(ce.v, ce.v)) > 0
        |      THEN list_inner_product(p.qv, ce.v)
        |           / (sqrt(list_inner_product(p.qv, p.qv))
        |              * sqrt(list_inner_product(ce.v, ce.v)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM probes p JOIN cell ce ON ce.cl = p.cl
        |  WHERE p.prn <= 4 AND ce.vec_id <> p.query_id
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, neighbor_id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q154_paragraph_dedup" ->
      // the keeper rule replayed by TEXT (the engine keys on xxhash64 —
      // identical modulo 64-bit collisions, the q52 convention): rn over
      // (doc_id, pos) per distinct paragraph; whitespace-only segments
      // are never candidates; string_agg skips the CASE NULLs like the
      // positional-filter rebuild; counts CAST BIGINT
      """WITH base AS (SELECT doc_id, text FROM documents),
        |two AS (
        |  SELECT a.doc_id, a.text || chr(10) || chr(10) || b.text AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id + 1
        |), segs AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10) || chr(10))) AS seg,
        |    unnest(generate_series(1,
        |      len(string_split(text, chr(10) || chr(10))))) AS pos
        |  FROM two
        |), ranked AS (
        |  SELECT doc_id, pos, seg,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn,
        |    trim(seg) <> '' AS cand
        |  FROM segs
        |)
        |SELECT doc_id,
        |  COALESCE(string_agg(
        |    CASE WHEN (NOT cand) OR rn = 1 THEN seg END,
        |    chr(10) || chr(10) ORDER BY pos), '') AS text_dedup,
        |  CAST(count(CASE WHEN cand AND rn > 1 THEN 1 END) AS BIGINT)
        |    AS n_removed
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q155_hard_negatives" -> HardNegativesOracleSql,

    "q157_hard_negatives_indexed" ->
      // same oracle as q155: the landed path shares the per-query scoring
      // tail with the inline one (scoreAndRankPerQuery), so the contract
      // is row-identity — the q99-reuses-q98 convention
      HardNegativesOracleSql,

    "q158_paragraph_store" ->
      // the against-store rule replayed by TEXT (the q154/q52
      // convention): store = distinct v1 paragraphs; batch paragraphs
      // excise when store-owned, else first-occurrence within the batch
      """WITH v1 AS (
        |  SELECT text FROM documents WHERE doc_id < 250
        |), store AS (
        |  SELECT DISTINCT seg FROM (
        |    SELECT unnest(string_split(text, chr(10) || chr(10))) AS seg
        |    FROM v1)
        |  WHERE trim(seg) <> ''
        |), batch AS (
        |  SELECT a.doc_id, a.text || chr(10) || chr(10) || b.text AS text
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 250
        |  WHERE a.doc_id >= 250
        |), segs AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10) || chr(10))) AS seg,
        |    unnest(generate_series(1,
        |      len(string_split(text, chr(10) || chr(10))))) AS pos
        |  FROM batch
        |), marked AS (
        |  SELECT s.doc_id, s.pos, s.seg,
        |    trim(s.seg) <> '' AS cand,
        |    st.seg IS NOT NULL AS seen
        |  FROM segs s LEFT JOIN store st ON s.seg = st.seg
        |), rk AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM marked WHERE cand AND NOT seen
        |), verdict AS (
        |  SELECT m.doc_id, m.pos, m.seg,
        |    (NOT m.cand) OR (NOT m.seen AND r.rn = 1) AS keep
        |  FROM marked m LEFT JOIN rk r USING (doc_id, pos)
        |)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN keep THEN seg END,
        |    chr(10) || chr(10) ORDER BY pos), '') AS text_dedup,
        |  CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_removed
        |FROM verdict GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q159_paragraph_stream_replay" ->
      // the two-batch replay by TEXT: batch 0 against the landed store,
      // batch 1 against store ∪ batch-0 survivors (the sink-then-append
      // leg) — each batch runs the identical q158 CTE chain
      """WITH base AS (SELECT doc_id, text FROM documents),
        |store0 AS (
        |  SELECT DISTINCT seg FROM (
        |    SELECT unnest(string_split(text, chr(10) || chr(10))) AS seg
        |    FROM base WHERE doc_id < 100)
        |  WHERE trim(seg) <> ''
        |), b1 AS (
        |  SELECT a.doc_id, a.text || chr(10) || chr(10) || b.text AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id - 100
        |  WHERE a.doc_id >= 100 AND a.doc_id < 150
        |), s1 AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10) || chr(10))) AS seg,
        |    unnest(generate_series(1,
        |      len(string_split(text, chr(10) || chr(10))))) AS pos
        |  FROM b1
        |), m1 AS (
        |  SELECT s.doc_id, s.pos, s.seg, trim(s.seg) <> '' AS cand,
        |    st.seg IS NOT NULL AS seen
        |  FROM s1 s LEFT JOIN store0 st ON s.seg = st.seg
        |), r1 AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM m1 WHERE cand AND NOT seen
        |), v1 AS (
        |  SELECT m.doc_id, m.pos, m.seg,
        |    (NOT m.cand) OR (NOT m.seen AND r.rn = 1) AS keep
        |  FROM m1 m LEFT JOIN r1 r USING (doc_id, pos)
        |), out1 AS (
        |  SELECT doc_id,
        |    COALESCE(string_agg(CASE WHEN keep THEN seg END,
        |      chr(10) || chr(10) ORDER BY pos), '') AS text_dedup,
        |    CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_removed
        |  FROM v1 GROUP BY doc_id
        |), store1 AS (
        |  SELECT seg FROM store0
        |  UNION
        |  SELECT DISTINCT seg FROM (
        |    SELECT unnest(string_split(text_dedup, chr(10) || chr(10))) AS seg
        |    FROM out1)
        |  WHERE trim(seg) <> ''
        |), b2 AS (
        |  SELECT a.doc_id, a.text || chr(10) || chr(10) || b.text AS text
        |  FROM base a JOIN base b ON b.doc_id = a.doc_id - 50
        |  WHERE a.doc_id >= 150 AND a.doc_id < 200
        |), s2 AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, chr(10) || chr(10))) AS seg,
        |    unnest(generate_series(1,
        |      len(string_split(text, chr(10) || chr(10))))) AS pos
        |  FROM b2
        |), m2 AS (
        |  SELECT s.doc_id, s.pos, s.seg, trim(s.seg) <> '' AS cand,
        |    st.seg IS NOT NULL AS seen
        |  FROM s2 s LEFT JOIN store1 st ON s.seg = st.seg
        |), r2 AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM m2 WHERE cand AND NOT seen
        |), v2 AS (
        |  SELECT m.doc_id, m.pos, m.seg,
        |    (NOT m.cand) OR (NOT m.seen AND r.rn = 1) AS keep
        |  FROM m2 m LEFT JOIN r2 r USING (doc_id, pos)
        |), out2 AS (
        |  SELECT doc_id,
        |    COALESCE(string_agg(CASE WHEN keep THEN seg END,
        |      chr(10) || chr(10) ORDER BY pos), '') AS text_dedup,
        |    CAST(count(CASE WHEN NOT keep THEN 1 END) AS BIGINT) AS n_removed
        |  FROM v2 GROUP BY doc_id
        |)
        |SELECT CAST(0 AS BIGINT) AS batch_id, doc_id, text_dedup, n_removed
        |FROM out1
        |UNION ALL
        |SELECT CAST(1 AS BIGINT) AS batch_id, doc_id, text_dedup, n_removed
        |FROM out2
        |ORDER BY batch_id, doc_id""".stripMargin,

    "q156_domain_quality" ->
      // q147's URL synthesis + registrable-domain algebra, then the
      // integer shrinkage: micro-quantized metric, BIGINT-cast sums (the
      // q89 HUGEINT rule), floor-division means — replayed term for term
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 6 = 0 THEN 'https://cdn.' || source || '.co.uk/p'
        |         WHEN doc_id % 6 = 1 THEN 'https://sub.' || source || '.net/x'
        |         WHEN doc_id % 6 = 2 THEN 'http://192.168.0.1/admin'
        |         WHEN doc_id % 6 = 3 THEN 'not a url'
        |         ELSE 'HTTPS://WWW.' || source || '.Example.COM:8443/page'
        |    END AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, n_chars,
        |    nullif(regexp_replace(lower(regexp_extract(trim(url),
        |      '^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)(?:.*)$', 1)),
        |      ':\d+$', ''), '') AS host
        |  FROM u
        |), d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN regexp_matches(host,
        |           '^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$') THEN host
        |         ELSE coalesce(
        |           nullif(regexp_extract(host,
        |             '([^.]+\.(?:co\.uk|org\.uk|ac\.uk|gov\.uk|com\.au|net\.au|org\.au|co\.jp|ne\.jp|or\.jp|co\.kr|com\.br|com\.mx|com\.cn|com\.tw|co\.in|co\.za|com\.ar|com\.tr|co\.nz))$', 1), ''),
        |           nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), ''),
        |           host)
        |    END AS domain
        |  FROM h
        |), per AS (
        |  SELECT domain, count(*) AS n_docs,
        |    CAST(sum(coalesce(
        |      CAST(floor(CAST(n_chars AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT),
        |      0)) AS BIGINT) AS s
        |  FROM d GROUP BY domain
        |), g AS (
        |  SELECT CAST(coalesce(sum(s), 0) AS BIGINT) AS gs,
        |    CAST(coalesce(sum(n_docs), 1) AS BIGINT) AS gn
        |  FROM per
        |)
        |SELECT domain, n_docs, s // n_docs AS mean_micro,
        |  (s + 100 * (gs // gn)) // (n_docs + 100) AS shrunk_micro
        |FROM per CROSS JOIN g
        |ORDER BY shrunk_micro DESC, domain NULLS FIRST""".stripMargin,

    "q151_quality_gate" ->
      // flag CTE replays GateOps.standardTextRules verbatim: NULL
      // predicate = FAIL via coalesce(p, false); fail_first is the same
      // ordered CASE; concat_ws skips the NULL legs exactly like
      // array_join over the concat-of-empty-arrays form; counts CAST
      // BIGINT (the q89 HUGEINT lesson)
      """WITH tk AS (
        |  SELECT doc_id, text, lang,
        |    CASE WHEN length(body) = 0 THEN 0
        |         ELSE length(regexp_split_to_array(body, '[ \t\n\r\f]+'))
        |    END AS ntok,
        |    CASE WHEN length(body) = 0 THEN 0
        |         ELSE length(list_distinct(
        |           regexp_split_to_array(body, '[ \t\n\r\f]+')))
        |    END AS ndis
        |  FROM (SELECT doc_id, text, lang,
        |          regexp_replace(text, '^[ \t\n\r\f]+|[ \t\n\r\f]+$',
        |            '', 'g') AS body
        |        FROM documents)
        |), f AS (
        |  SELECT doc_id,
        |    NOT coalesce(length(text) >= 150, FALSE) AS f0,
        |    NOT coalesce(ntok >= 25, FALSE) AS f1,
        |    NOT coalesce(CASE WHEN ntok > 0
        |      THEN CAST(ndis AS DOUBLE) / ntok >= 0.32 END, FALSE) AS f2,
        |    NOT coalesce(lang IN ('en'), FALSE) AS f3
        |  FROM tk)
        |SELECT doc_id, NOT (f0 OR f1 OR f2 OR f3) AS kept,
        |  CASE WHEN f0 THEN 'min_chars' WHEN f1 THEN 'min_tokens'
        |       WHEN f2 THEN 'diversity' WHEN f3 THEN 'lang' END AS fail_first,
        |  concat_ws(',',
        |    CASE WHEN f0 THEN 'min_chars' END,
        |    CASE WHEN f1 THEN 'min_tokens' END,
        |    CASE WHEN f2 THEN 'diversity' END,
        |    CASE WHEN f3 THEN 'lang' END) AS failed_rules,
        |  CAST((CASE WHEN f0 THEN 1 ELSE 0 END) +
        |       (CASE WHEN f1 THEN 1 ELSE 0 END) +
        |       (CASE WHEN f2 THEN 1 ELSE 0 END) +
        |       (CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
        |FROM f ORDER BY doc_id""".stripMargin,

    "q152_gate_funnel" ->
      // sequential-funnel replay: first-fail index once, per-rule first-
      // fail + independent sums in ONE aggregate CTE, k rows via UNION ALL
      // with n_in unwound cumulatively; every sum CAST BIGINT
      """WITH tk AS (
        |  SELECT text, lang,
        |    CASE WHEN length(body) = 0 THEN 0
        |         ELSE length(regexp_split_to_array(body, '[ \t\n\r\f]+'))
        |    END AS ntok,
        |    CASE WHEN length(body) = 0 THEN 0
        |         ELSE length(list_distinct(
        |           regexp_split_to_array(body, '[ \t\n\r\f]+')))
        |    END AS ndis
        |  FROM (SELECT text, lang,
        |          regexp_replace(text, '^[ \t\n\r\f]+|[ \t\n\r\f]+$',
        |            '', 'g') AS body
        |        FROM documents)
        |), f AS (
        |  SELECT
        |    NOT coalesce(length(text) >= 150, FALSE) AS f0,
        |    NOT coalesce(ntok >= 25, FALSE) AS f1,
        |    NOT coalesce(CASE WHEN ntok > 0
        |      THEN CAST(ndis AS DOUBLE) / ntok >= 0.32 END, FALSE) AS f2,
        |    NOT coalesce(lang IN ('en'), FALSE) AS f3
        |  FROM tk),
        |x AS (
        |  SELECT CASE WHEN f0 THEN 0 WHEN f1 THEN 1 WHEN f2 THEN 2
        |              WHEN f3 THEN 3 END AS ff, f0, f1, f2, f3 FROM f),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN ff = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
        |    CAST(sum(CASE WHEN ff = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN ff = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |    CAST(sum(CASE WHEN ff = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        |    CAST(sum(CASE WHEN f0 THEN 1 ELSE 0 END) AS BIGINT) AS i0,
        |    CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS i1,
        |    CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS i2,
        |    CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS i3
        |  FROM x)
        |SELECT CAST(0 AS BIGINT) AS rule_idx, 'min_chars' AS rule,
        |  total AS n_in, d0 AS n_dropped, total - d0 AS n_out,
        |  i0 AS n_fail_independent FROM a
        |UNION ALL SELECT 1, 'min_tokens', total - d0, d1,
        |  total - d0 - d1, i1 FROM a
        |UNION ALL SELECT 2, 'diversity', total - d0 - d1, d2,
        |  total - d0 - d1 - d2, i2 FROM a
        |UNION ALL SELECT 3, 'lang', total - d0 - d1 - d2, d3,
        |  total - d0 - d1 - d2 - d3, i3 FROM a
        |ORDER BY rule_idx""".stripMargin,

    "q147_domain_stats" ->
      // urlHost + registrableDomain regex algebra replayed stage for
      // stage (RE2 both engines); sum(len) CAST BIGINT (portability
      // rule); null domains keep their own row. Row order irrelevant to
      // the hasher
      """WITH u AS (
        |  SELECT doc_id, text,
        |    CASE WHEN doc_id % 6 = 0 THEN 'https://cdn.' || source || '.co.uk/p'
        |         WHEN doc_id % 6 = 1 THEN 'https://sub.' || source || '.net/x'
        |         WHEN doc_id % 6 = 2 THEN 'http://192.168.0.1/admin'
        |         WHEN doc_id % 6 = 3 THEN 'not a url'
        |         ELSE 'HTTPS://WWW.' || source || '.Example.COM:8443/page'
        |    END AS url
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, text,
        |    nullif(regexp_replace(lower(regexp_extract(trim(url),
        |      '^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)(?:.*)$', 1)),
        |      ':\d+$', ''), '') AS host
        |  FROM u
        |), d AS (
        |  SELECT doc_id, text,
        |    CASE WHEN regexp_matches(host,
        |           '^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$') THEN host
        |         ELSE coalesce(
        |           nullif(regexp_extract(host,
        |             '([^.]+\.(?:co\.uk|org\.uk|ac\.uk|gov\.uk|com\.au|net\.au|org\.au|co\.jp|ne\.jp|or\.jp|co\.kr|com\.br|com\.mx|com\.cn|com\.tw|co\.in|co\.za|com\.ar|com\.tr|co\.nz))$', 1), ''),
        |           nullif(regexp_extract(host, '([^.]+\.[^.]+)$', 1), ''),
        |           host)
        |    END AS domain
        |  FROM h
        |), per AS (
        |  SELECT domain, count(*) AS n_docs,
        |    CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS text_bytes
        |  FROM d GROUP BY domain
        |), tot AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM per
        |)
        |SELECT domain, n_docs, text_bytes,
        |  n_docs * 1000000 // t AS share_ppm
        |FROM per CROSS JOIN tot
        |ORDER BY domain NULLS FIRST""".stripMargin,

    "q144_hybrid_rrf" ->
      // the q98 BM25 chain (top-20) + the q29 cosine chain (query 0,
      // top-20) fused with integer 1e9 DIV (60 + rank) units; FULL OUTER
      // preserves single-list docs, final ties break on doc_id
      """WITH tokarr AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, coalesce(len(toks), 0) AS dl FROM tokarr
        |), stats AS (
        |  SELECT count(*) AS n_docs, coalesce(sum(dl), 0) AS total_dl FROM dl
        |), post AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS token FROM tokarr)
        |  WHERE token IN ('spark', 'query', 'filter')
        |  GROUP BY doc_id, token
        |), dfreq AS (
        |  SELECT token, count(*) AS df FROM post GROUP BY token
        |), scored AS (
        |  SELECT p.doc_id,
        |    CAST((ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)) * p.tf)
        |      * (1.2 + 1.0)
        |      / (p.tf + 1.2 * ((1.0 - 0.75)
        |          + (0.75 * d.dl) / (CAST(s.total_dl AS DOUBLE) / s.n_docs)))
        |      AS DECIMAL(18,9)) AS c
        |  FROM post p
        |  JOIN dfreq f USING (token)
        |  JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s
        |), agg AS (
        |  SELECT doc_id, sum(c) AS sc FROM scored GROUP BY doc_id
        |), bmtop AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY sc DESC, doc_id) AS BIGINT)
        |      AS rank_bm25
        |  FROM (SELECT doc_id, sc FROM agg ORDER BY sc DESC, doc_id LIMIT 20)
        |), ev AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), csc AS (
        |  SELECT c.vec_id AS doc_id,
        |    round(CASE WHEN sqrt(list_inner_product(q.v, q.v))
        |                  * sqrt(list_inner_product(c.v, c.v)) > 0
        |      THEN list_inner_product(q.v, c.v)
        |           / (sqrt(list_inner_product(q.v, q.v))
        |              * sqrt(list_inner_product(c.v, c.v)))
        |      ELSE 0.0 END, 6) AS cos_sim
        |  FROM ev q JOIN ev c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id = 0
        |), cranked AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS BIGINT)
        |      AS rank_cos
        |  FROM csc
        |), ctop AS (
        |  SELECT doc_id, rank_cos FROM cranked WHERE rank_cos <= 20
        |), fused AS (
        |  SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
        |    b.rank_bm25, c.rank_cos,
        |    coalesce(CAST(1000000000 AS BIGINT) // (60 + b.rank_bm25),
        |             CAST(0 AS BIGINT))
        |      + coalesce(CAST(1000000000 AS BIGINT) // (60 + c.rank_cos),
        |                 CAST(0 AS BIGINT)) AS rrf_units
        |  FROM bmtop b FULL OUTER JOIN ctop c ON b.doc_id = c.doc_id
        |)
        |SELECT doc_id, rank_bm25, rank_cos, rrf_units,
        |  CAST(row_number() OVER (ORDER BY rrf_units DESC, doc_id) AS BIGINT)
        |    AS rank
        |FROM (SELECT * FROM fused ORDER BY rrf_units DESC, doc_id LIMIT 10)
        |ORDER BY rank""".stripMargin,

    "q145_corpus_containment" ->
      // the DedupOps.shingles chain (tok -> per-doc distinct trigram sets,
      // the againstSide construction) on both corpora, then corpus-level
      // DISTINCT + a semi-join count; floor-division ppm
      """WITH da AS (
        |  SELECT text FROM documents WHERE doc_id % 2 = 0
        |), db AS (
        |  SELECT text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 2 = 0 AND doc_id < 60
        |), atok AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '') AS t FROM da
        |), ash AS (
        |  SELECT DISTINCT sg FROM (
        |    SELECT unnest(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [array_to_string(t, ' ')] END) AS sg
        |    FROM atok)
        |), btok AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |    x -> x <> '') AS t FROM db
        |), bsh AS (
        |  SELECT DISTINCT sg FROM (
        |    SELECT unnest(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [array_to_string(t, ' ')] END) AS sg
        |    FROM btok)
        |)
        |SELECT
        |  (SELECT count(*) FROM ash) AS n_shingles_a,
        |  (SELECT count(*) FROM bsh) AS n_shingles_b,
        |  (SELECT count(*) FROM bsh WHERE sg IN (SELECT sg FROM ash))
        |    AS n_shared,
        |  (SELECT count(*) FROM bsh WHERE sg IN (SELECT sg FROM ash))
        |    * 1000000
        |    // (SELECT count(*) FROM bsh) AS containment_ppm""".stripMargin,

    "q146_temperature_sample" ->
      // n^alpha micro-unit quantization BEFORE the normalizing sum (exact
      // integer total), one double division for the rate, md5-31 gate —
      // the q45/q87 replay pattern. sum(BIGINT) CAST back to BIGINT (the
      // portability rule)
      """WITH sizes AS (
        |  SELECT source, count(*) AS n FROM documents GROUP BY source
        |), pw AS (
        |  SELECT source, n,
        |    CAST(floor(pow(CAST(n AS DOUBLE), 0.5) * 1000000) AS BIGINT)
        |      AS pw
        |  FROM sizes
        |), tot AS (
        |  SELECT CAST(sum(pw) AS BIGINT) AS tot FROM pw
        |), cuts AS (
        |  SELECT source,
        |    CAST(floor(least(1.0, (200.0 * pw)
        |        / (CAST(tot AS DOUBLE) * CAST(n AS DOUBLE)))
        |      * 2147483648.0) AS BIGINT) AS cut
        |  FROM pw CROSS JOIN tot
        |)
        |SELECT doc_id, source FROM documents JOIN cuts USING (source)
        |WHERE (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |       & 2147483647::UBIGINT)::BIGINT < cut
        |ORDER BY doc_id""".stripMargin,

    "q142_rate_spikes_landed" ->
      // history windows -> per-type avg/stddev_pop baseline ('error'
      // withheld); live-quarter windows LEFT JOIN the baseline. Same
      // floor-mod alignment as q133; unknown types emit null z and a
      // false flag (the coalesce)
      """WITH he AS (
        |  SELECT epoch_us(ts) AS us, event_type FROM events
        |  WHERE ts IS NOT NULL AND event_id % 4 <> 0
        |    AND event_type <> 'error'
        |), hw AS (
        |  SELECT unnest(generate_series(
        |      us - ((us % 900000000) + 900000000) % 900000000
        |        - CAST(2700000000 AS BIGINT),
        |      us - ((us % 900000000) + 900000000) % 900000000,
        |      900000000)) AS ws, event_type
        |  FROM he
        |), hc AS (
        |  SELECT ws, event_type, count(*) AS n FROM hw GROUP BY 1, 2
        |), base AS (
        |  SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
        |  FROM hc GROUP BY 1
        |), le AS (
        |  SELECT epoch_us(ts) AS us, event_type FROM events
        |  WHERE ts IS NOT NULL AND event_id % 4 = 0
        |), lw AS (
        |  SELECT unnest(generate_series(
        |      us - ((us % 900000000) + 900000000) % 900000000
        |        - CAST(2700000000 AS BIGINT),
        |      us - ((us % 900000000) + 900000000) % 900000000,
        |      900000000)) AS window_start_us, event_type
        |  FROM le
        |), lc AS (
        |  SELECT window_start_us, event_type, count(*) AS n_events
        |  FROM lw GROUP BY 1, 2
        |), z AS (
        |  SELECT lc.window_start_us, lc.event_type, lc.n_events,
        |    CASE WHEN base.sigma > 0
        |           THEN round((lc.n_events - base.mu) / base.sigma, 6)
        |         WHEN base.mu IS NOT NULL THEN 0.0 END AS z
        |  FROM lc LEFT JOIN base USING (event_type)
        |)
        |SELECT window_start_us, event_type, n_events, z,
        |  coalesce(z > 1.0, false) AS is_spike
        |FROM z ORDER BY window_start_us, event_type""".stripMargin,

    "q141_vocab_coverage" ->
      // q51's top-50 ranking as the vocab; occurrence-weighted coverage
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents
        |), voc AS (
        |  SELECT token FROM (
        |    SELECT token, count(*) AS n_occurrences
        |    FROM tok GROUP BY token
        |    ORDER BY n_occurrences DESC, token LIMIT 50
        |  )
        |), agg AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |    count(v.token) AS n_in_vocab
        |  FROM tok t LEFT JOIN voc v ON t.token = v.token
        |  GROUP BY t.doc_id
        |)
        |SELECT doc_id, n_tokens, n_in_vocab,
        |  (n_in_vocab * 1000000) // n_tokens AS coverage_ppm
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q140_phrase_search" ->
      // positional postings via parallel unnest; same (doc, pos - i) join
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '') AS t
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, unnest(t) AS tok,
        |    unnest(generate_series(1, len(t))) - 1 AS pos
        |  FROM tk
        |), a0 AS (SELECT doc_id, pos AS anchor FROM p WHERE tok = 'hash'),
        |a1 AS (SELECT doc_id, pos - 1 AS anchor FROM p WHERE tok = 'join')
        |SELECT a0.doc_id, count(*) AS n_matches
        |FROM a0 JOIN a1 USING (doc_id, anchor)
        |GROUP BY a0.doc_id ORDER BY a0.doc_id""".stripMargin,

    "q134_set_similarity_join" ->
      // brute-force exact Jaccard over the bounded id ranges — the prefix
      // filter must be invisible in the result
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |      x -> x <> '')) AS s
        |  FROM documents
        |), l AS (
        |  SELECT doc_id AS id_a, s AS sa FROM tok
        |  WHERE doc_id < 200 AND len(s) > 0
        |), pr AS (
        |  SELECT doc_id + 1000000 AS id_b,
        |    list_distinct(list_filter(string_split_regex(
        |      lower(text || ' perturbed tail token'), '[^a-z0-9]+'),
        |      x -> x <> '')) AS sb
        |  FROM documents WHERE doc_id < 50
        |), cp AS (
        |  SELECT doc_id + 2000000 AS id_b, s AS sb FROM tok
        |  WHERE doc_id >= 100 AND doc_id < 300
        |), r AS (
        |  SELECT * FROM pr UNION ALL SELECT * FROM cp
        |), p AS (
        |  SELECT id_a, id_b,
        |    CAST(len(list_intersect(sa, sb)) AS BIGINT) AS inter_size,
        |    CAST(len(sa) + len(sb) - len(list_intersect(sa, sb)) AS BIGINT)
        |      AS union_size
        |  FROM l CROSS JOIN r WHERE len(sb) > 0
        |)
        |SELECT id_a, id_b, inter_size, union_size,
        |  (inter_size * 1000) // union_size AS jaccard_milli
        |FROM p WHERE inter_size * 1000 >= union_size * 700
        |ORDER BY id_a, id_b""".stripMargin,

    "q135_join_cardinality" ->
      """WITH lc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |), rc AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS k, count(*) AS c
        |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
        |), con AS (
        |  SELECT lc.k, CAST(lc.c * rc.c AS BIGINT) AS o
        |  FROM lc JOIN rc USING (k)
        |), tot AS (
        |  SELECT (SELECT count(*) FROM events) AS n_left_rows,
        |    (SELECT count(*) FROM orders) AS n_right_rows,
        |    CAST(COALESCE((SELECT sum(o) FROM con), 0) AS BIGINT)
        |      AS join_output_rows
        |), hot AS (SELECT k, o FROM con ORDER BY o DESC, k LIMIT 1)
        |SELECT n_left_rows, n_right_rows, join_output_rows,
        |  CASE WHEN greatest(n_left_rows, n_right_rows) > 0
        |    THEN (join_output_rows * 1000000)
        |         // greatest(n_left_rows, n_right_rows)
        |    ELSE 0 END AS expansion_ppm,
        |  (SELECT k FROM hot) AS hot_key,
        |  (SELECT o FROM hot) AS hot_key_rows
        |FROM tot""".stripMargin,

    "q136_session_paths" ->
      // q90's session closure + a per-session lead chain; || NULL kills
      // boundary-crossing paths on both engines
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |), f AS (
        |  SELECT event_id, user_id, event_type, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |              OR us - lag(us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT event_id, user_id, event_type, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
        |  FROM f
        |), p AS (
        |  SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |    || '>' || lead(event_type, 2) OVER w2 AS path
        |  FROM s WINDOW w2 AS (PARTITION BY user_id, seq ORDER BY us, event_id)
        |), c AS (
        |  SELECT path, count(*) AS n_paths FROM p
        |  WHERE path IS NOT NULL GROUP BY path
        |), r AS (
        |  SELECT path, n_paths,
        |    row_number() OVER (ORDER BY n_paths DESC, path) AS rank
        |  FROM c
        |)
        |SELECT path, n_paths, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 15 ORDER BY rank""".stripMargin,

    "q137_profile_segments" ->
      // the merged profile's exactly-mergeable stats: counts and
      // native-typed min/max equal the one-shot corpus profile
      """WITH p AS (
        |  SELECT 'doc_id' AS column_name, count(*) AS n_rows,
        |    count(*) - count(doc_id) AS n_nulls,
        |    CAST(min(doc_id) AS VARCHAR) AS min_value,
        |    CAST(max(doc_id) AS VARCHAR) AS max_value
        |  FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(*), count(*) - count(lang),
        |    CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*), count(*) - count(n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents
        |)
        |SELECT * FROM p ORDER BY column_name""".stripMargin,

    "q119_winsorize" ->
      // quantile_cont == Spark's exact linear-interpolation percentile
      """WITH b AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.05) AS n_chars_lo,
        |    quantile_cont(n_chars, 0.95) AS n_chars_hi
        |  FROM documents GROUP BY 1
        |)
        |SELECT d.doc_id, d.source, d.n_chars, b.n_chars_lo, b.n_chars_hi,
        |  CASE WHEN d.n_chars IS NULL THEN NULL
        |    ELSE least(greatest(CAST(d.n_chars AS DOUBLE), b.n_chars_lo),
        |      b.n_chars_hi) END AS n_chars_winsorized
        |FROM documents d JOIN b USING (source) ORDER BY d.doc_id""".stripMargin,

    "q120_script_mix" ->
      // same planted suffixes; per-class counts via regexp_extract_all,
      // denominators = non-space char counts
      """WITH t AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' привет мир 42'
        |         WHEN doc_id % 3 = 1 THEN ' 你好世界 世界'
        |         ELSE '' END AS text
        |  FROM documents
        |), c AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_replace(text, '[ \t\r\n]+', '', 'g')) AS DOUBLE) AS ns,
        |    len(regexp_extract_all(text, '[A-Za-z]')) AS lat,
        |    len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS cyr,
        |    len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS han,
        |    len(regexp_extract_all(text, '[0-9]')) AS dig
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN ns > 0 THEN round(lat / ns, 6) ELSE 0.0 END AS latin_frac,
        |  CASE WHEN ns > 0 THEN round(cyr / ns, 6) ELSE 0.0 END AS cyrillic_frac,
        |  CASE WHEN ns > 0 THEN round(han / ns, 6) ELSE 0.0 END AS han_frac,
        |  CASE WHEN ns > 0 THEN round(dig / ns, 6) ELSE 0.0 END AS digit_frac
        |FROM c ORDER BY doc_id""".stripMargin,

    "q116_weighted_topk" ->
      // the A-ES priority replay: same md5-31 uniform, same micro-nat
      // quantized ln(u)/w ranking, same tie-break
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5('graft-wtopk:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS h31,
        |    CAST(n_chars AS DOUBLE) AS w
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
        |), q AS (
        |  SELECT doc_id, lang,
        |    CAST(floor(ln((h31 + 1) / 2147483648.0) / w * 1000000 + 0.5)
        |      AS BIGINT) AS qk
        |  FROM h
        |), r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY qk DESC, doc_id)
        |      AS sample_rank
        |  FROM q
        |)
        |SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
        |FROM r WHERE sample_rank <= 5 ORDER BY lang, sample_rank""".stripMargin,

    "q117_corpus_report" ->
      // same ROLLUP lattice; token counts via the regexp_count-equivalent
      // token-run pattern the q13 family pins
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS BIGINT)
        |    AS total_tokens,
        |  CAST(GROUPING(source, lang) AS INT) AS gid
        |FROM documents GROUP BY ROLLUP (source, lang)
        |ORDER BY gid, source, lang""".stripMargin,

    "q112_pagerank" -> PageRankOracleSql,

    "q113_standardize_embeddings" ->
      // same explode -> (label, dim) stats -> z rebuild; constant dims
      // (stddev_pop = 0) pin to 0.0 exactly like the Spark guard
      """WITH ex AS (
        |  SELECT vec_id, label,
        |    unnest(embedding) AS v,
        |    unnest(generate_series(1, len(embedding))) - 1 AS dim
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), st AS (
        |  SELECT label, dim, avg(CAST(v AS DOUBLE)) AS mu,
        |    stddev_pop(CAST(v AS DOUBLE)) AS sigma
        |  FROM ex GROUP BY 1, 2
        |), z AS (
        |  SELECT vec_id, e.label, dim,
        |    CASE WHEN sigma IS NULL OR sigma = 0 THEN 0.0
        |         ELSE round((CAST(v AS DOUBLE) - mu) / sigma, 6) END AS z
        |  FROM ex e JOIN st USING (label, dim)
        |)
        |SELECT vec_id, label, dim, z FROM z ORDER BY vec_id, dim""".stripMargin,

    "q114_markup_strip" ->
      // identical HTML construction + the shared strip pipeline; link
      // density = stripped anchor chars / stripped total chars
      s"""WITH h AS (
        |  SELECT doc_id,
        |    '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</h1><p class="main">' || text ||
        |    '</p><a href="/d/' || CAST(doc_id AS VARCHAR) ||
        |    '">see &amp; doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</a><script>var x = 1 < 2;</script>' ||
        |    '<style>p { color: red }</style>&nbsp;&lt;end&gt;</body></html>'
        |      AS html
        |  FROM documents
        |), stripped AS (
        |  SELECT doc_id,
        |    ${stripPipeSql("html")} AS clean_text,
        |    ${stripPipeSql(
             "array_to_string(regexp_extract_all(html, " +
             "'(?is)<a\\b[^>]*>(.*?)</a\\s*>', 1), ' ')")} AS anchor_text
        |  FROM h
        |)
        |SELECT doc_id, clean_text,
        |  CASE WHEN length(clean_text) > 0
        |    THEN round(CAST(length(anchor_text) AS DOUBLE) / length(clean_text), 6)
        |    ELSE 0.0 END AS link_density
        |FROM stripped ORDER BY doc_id""".stripMargin,

    "q102_transitions" ->
      // q90's lag-window replay reduced to the (prev, next) pair stream;
      // null user/ts/type rows are out up front (a null type would alias
      // the session-start lag null)
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL
        |), l AS (
        |  SELECT event_type AS next_type, us,
        |    lag(event_type) OVER w AS prev_type,
        |    lag(us) OVER w AS prev_us
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), c AS (
        |  SELECT prev_type, next_type, count(*) AS n_transitions
        |  FROM l
        |  WHERE prev_type IS NOT NULL AND us - prev_us <= 1800000000
        |  GROUP BY 1, 2
        |)
        |SELECT prev_type, next_type, n_transitions,
        |  round(CAST(n_transitions AS DOUBLE) /
        |        sum(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
        |FROM c ORDER BY prev_type, next_type""".stripMargin,

    "q103_fuzzy_join" ->
      // blocked-candidate replay: two block rows per record (prefix /
      // explicit positive-start suffix), distinct pair hits, exact
      // levenshtein verify
      """WITH base AS (
        |  SELECT doc_id, lower(substr(text, 1, 24)) AS key FROM documents
        |), probe AS (
        |  SELECT doc_id + 2000000 AS doc_id,
        |    lower(substr(text, 1, 9) || '#' || substr(text, 11, 14)) AS key
        |  FROM documents WHERE doc_id < 40
        |), lb AS (
        |  SELECT doc_id AS id_a, key AS key_a, length(key) AS block_len,
        |         0 AS block_id, substr(key, 1, 6) AS block_val
        |  FROM probe WHERE key IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, key, length(key), 1,
        |         substr(key, greatest(length(key) - 5, 1), 6)
        |  FROM probe WHERE key IS NOT NULL
        |), rb AS (
        |  SELECT doc_id AS id_b, key AS key_b, length(key) AS block_len,
        |         0 AS block_id, substr(key, 1, 6) AS block_val
        |  FROM base WHERE key IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, key, length(key), 1,
        |         substr(key, greatest(length(key) - 5, 1), 6)
        |  FROM base WHERE key IS NOT NULL
        |), cand AS (
        |  SELECT DISTINCT id_a, key_a, id_b, key_b
        |  FROM lb JOIN rb USING (block_id, block_len, block_val)
        |)
        |SELECT id_a, id_b, CAST(levenshtein(key_a, key_b) AS BIGINT) AS dist
        |FROM cand WHERE levenshtein(key_a, key_b) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q104_curriculum" ->
      // tier = count of thresholds at-or-below the score (map-side CASE
      // sum); shuffle key = the q45 md5-31 family under the 'curr1' salt;
      // the emitted key makes the schedule permutation hash-checkable
      """SELECT doc_id, n_chars,
        |  CASE WHEN n_chars IS NOT NULL THEN CAST(
        |    (CASE WHEN CAST(n_chars AS DOUBLE) >= 220.0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(n_chars AS DOUBLE) >= 380.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) END AS tier,
        |  CASE WHEN doc_id IS NOT NULL THEN
        |    (('0x' || substr(md5('curr1:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT END AS shuffle_key
        |FROM documents
        |ORDER BY tier NULLS LAST, shuffle_key NULLS LAST, doc_id NULLS LAST""".stripMargin,

    "q105_collocations" ->
      // PMI = ln((n_pair * Nuni^2) / (Nbi * c_a * c_b)) in one
      // integer-ratio argument; floor(x*1e6 + 0.5) micro-nats BEFORE the
      // rank so both engines order identical integers
      """WITH tokarr AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
        |  FROM documents
        |), uni AS (
        |  SELECT unnest(toks) AS tok FROM tokarr
        |), idx AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(1, len(toks) - 1)) AS i
        |  FROM tokarr
        |), bi0 AS (
        |  SELECT toks[CAST(i AS INT)] AS token_a,
        |         toks[CAST(i + 1 AS INT)] AS token_b
        |  FROM idx
        |), uc AS (
        |  SELECT tok, count(*) AS c FROM uni GROUP BY tok
        |), bc AS (
        |  SELECT token_a, token_b, count(*) AS n_pair FROM bi0
        |  GROUP BY 1, 2 HAVING count(*) >= 5
        |), tot AS (
        |  SELECT count(*) AS nuni FROM uni
        |), totb AS (
        |  SELECT count(*) AS nbi FROM bi0
        |), sc AS (
        |  SELECT b.token_a, b.token_b, b.n_pair,
        |    CAST(floor(ln((CAST(b.n_pair AS DOUBLE) * t.nuni * t.nuni)
        |        / (CAST(tb.nbi AS DOUBLE) * ca.c * cb.c))
        |      * 1000000.0 + 0.5) AS BIGINT) AS pu
        |  FROM bc b
        |  JOIN uc ca ON ca.tok = b.token_a
        |  JOIN uc cb ON cb.tok = b.token_b
        |  CROSS JOIN tot t CROSS JOIN totb tb
        |), top AS (
        |  SELECT * FROM sc ORDER BY pu DESC, token_a, token_b LIMIT 30
        |)
        |SELECT token_a, token_b, n_pair,
        |  CAST(pu AS DOUBLE) / 1000000.0 AS pmi,
        |  row_number() OVER (ORDER BY pu DESC, token_a, token_b) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    "q45_hash_split" ->
      """SELECT (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |         & 2147483647::UBIGINT)::BIGINT % 10 AS split,
        |       count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q93_shard_manifest" ->
      // the q45 md5-31 family under the 'graft-shard' salt; bit_xor is
      // order-independent in both engines; DuckDB's HUGEINT sum cast back
      // to BIGINT to match Spark's long
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    (('0x' || substr(md5('graft-shard:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT AS h
        |  FROM documents
        |)
        |SELECT h % 8 AS shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_tokens,
        |  bit_xor(h) AS key_checksum,
        |  min(doc_id) AS min_key, max(doc_id) AS max_key
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_stratified_sample" ->
      // cut literals = (rate * 2^31).toLong for 0.25 / 0.5 / 1.0 (scaled by
      // 2^31, not 2^31-1, so rate 1.0 keeps hash == 2^31-1 rows too);
      // same md5-31 'graft:'||key hash family as q45
      """SELECT doc_id, lang FROM documents
        |WHERE (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |        & 2147483647::UBIGINT)::BIGINT
        |  < CASE WHEN lang = 'en' THEN 536870912
        |         WHEN lang = 'de' THEN 1073741824
        |         ELSE 2147483648 END
        |ORDER BY doc_id""".stripMargin,

    "q50_pack_sequences" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5('graft:' || CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      & 2147483647::UBIGINT)::BIGINT % 4 AS split,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, split, n_tokens,
        |    COALESCE(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM base
        |)
        |SELECT doc_id, split,
        |  CAST(cb // 2048 AS BIGINT) AS pack_id,
        |  CAST(cb % 2048 AS BIGINT) AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    "q51_vocabulary" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
        |  FROM documents
        |)
        |SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM tok GROUP BY token
        |ORDER BY n_occurrences DESC, token LIMIT 50""".stripMargin,

    "q52_line_dedup" ->
      // same rule in plain SQL: per-segment distinct-doc counts, blocklist =
      // count > 390, rebuild by position with blocked segments skipped.
      // string_agg skips the CASE's NULLs exactly like the Spark-side
      // filtered array_join; COALESCE covers an all-blocked document.
      """WITH segs AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS seg,
        |         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
        |  FROM documents
        |), freq AS (
        |  SELECT seg FROM segs WHERE trim(seg) <> ''
        |  GROUP BY seg HAVING count(DISTINCT doc_id) > 390
        |), kept AS (
        |  SELECT s.doc_id, s.pos, s.seg, (f.seg IS NOT NULL) AS blocked
        |  FROM segs s LEFT JOIN freq f ON s.seg = f.seg
        |)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN NOT blocked THEN seg END, ' ' ORDER BY pos), '') AS text_dedup,
        |  CAST(count(CASE WHEN blocked THEN 1 END) AS BIGINT) AS n_removed
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q53_normalize" ->
      // chr() builds the same decomposed suffix; DuckDB's nfc_normalize is
      // the same Unicode NFC the native expression implements
      """SELECT doc_id,
        |  nfc_normalize(regexp_replace(
        |    text || ' cafe' || chr(769) || ' ' || chr(8491) || ' x' || chr(7) || 'y',
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q47_bucketed_qc" ->
      // q07's split composed with q08's moving average; the bucketed landing
      // changes the PLAN (zero exchanges), never the values
      """WITH w1 AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    max(value) OVER (PARTITION BY user_id) AS mx
        |  FROM events
        |), w2 AS (
        |  SELECT *, min(CASE WHEN value = mx THEN rn END) OVER (PARTITION BY user_id) AS am
        |  FROM w1
        |)
        |SELECT user_id, event_id,
        |  CASE WHEN rn <= am THEN 'down' ELSE 'up' END AS direction,
        |  CASE WHEN count(*) OVER w > count(value) OVER w THEN NULL
        |       ELSE round(coalesce(sum(value) OVER w, 0) / 5.0, 6) END AS value_ma
        |FROM w2
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,

    "q39_set_ops" ->
      """WITH mid AS (SELECT max(event_id) / 2.0 AS m FROM events)
        |SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_id <= (SELECT m FROM mid)
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_id > (SELECT m FROM mid)
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 0
        |) ORDER BY user_id""".stripMargin,
  )
}
