package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Shuffle-planning diagnostics. At 100 TB the difference between a job that
 * finishes and one that dies on a straggler is usually ONE hot key — a null
 * join column, a default user id, a boilerplate domain. This profiler is
 * the pre-flight check: run it on a prospective join/groupBy key, read off
 * the hot keys' share and the recommended salt fan-out, then decide
 * broadcast / salting / AQE skew-join before launching the real job.
 *
 * Everything is integer arithmetic (counts, floor-division ppm shares,
 * ceil-division salt factors) — exactly reproducible in any engine, so the
 * profile itself is oracle-checkable.
 */
object StatsOps {

  /** Backtick-quote an arbitrary column name for splicing into SQL text or
    * `col()` — backticks inside the name double per Spark's quoting rule,
    * so a name containing quotes, dots, or backticks cannot generate
    * broken SQL or resolve as a nested-field path. */
  private def qi(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** SQL string literal of an arbitrary value (backslash escaping — the
    * Spark/Hive literal rule). */
  private def ql(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /**
   * Top-`k` hottest values of `keyCol` with exact integer diagnostics:
   *
   *  - `share_ppm`: the key's row share in parts-per-million
   *    (`n_rows * 1e6 DIV total`), floor division;
   *  - `salt_factor`: the minimum salt fan-out that levels this key to at
   *    most one average partition's rows —
   *    `max(1, ceil(n_rows * nPartitions / total))`, the number a caller
   *    plugs straight into a salted-join key (`pmod(rand_suffix, salt)`);
   *  - `n_keys` / `total_rows`: corpus-wide context on every row.
   *
   * NULL keys profile like any other value (a null join column is the
   * single most common skew culprit — hiding it would defeat the tool).
   * Plan shape: one two-phase hash agg over the key, a one-row totals
   * aggregate broadcast onto the top-k (TakeOrderedAndProject, never a
   * global sort), and the rank window runs on k rows.
   */
  def keySkewProfile(df: DataFrame, keyCol: String, k: Int = 20,
                     nPartitions: Int = 200): DataFrame = {
    require(k > 0 && nPartitions > 0,
      "keySkewProfile: k and nPartitions must be positive")
    val counts = df
      .groupBy(col(keyCol).cast(StringType).as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = counts.agg(sum(col("n_rows")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts
      .orderBy(col("n_rows").desc, col("key_value").asc_nulls_first)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_rows").desc, col("key_value").asc_nulls_first)
    top.crossJoin(broadcast(totals))
      .withColumn("rank", row_number().over(w).cast(LongType))
      // floor/ceil division in pure long arithmetic — bit-reproducible
      .withColumn("share_ppm",
        expr("n_rows * 1000000 DIV total_rows"))
      .withColumn("salt_factor",
        greatest(lit(1L),
          expr(s"(n_rows * $nPartitions + total_rows - 1) DIV total_rows")))
      .select(col("rank"), col("key_value"), col("n_rows"), col("share_ppm"),
        col("salt_factor"), col("n_keys"), col("total_rows"))
  }

  /**
   * JOIN-KEY OVERLAP profile — the second shuffle pre-flight next to
   * [[keySkewProfile]]: before launching a join, measure how the two
   * sides' key sets actually relate. One row:
   *
   *  - `n_left_keys` / `n_right_keys`: distinct non-null keys per side;
   *  - `n_shared_keys`: distinct keys present on BOTH sides — the join's
   *    effective key universe;
   *  - `left_in_right_ppm` / `right_in_left_ppm`: containment ratios in
   *    parts-per-million (floor division, integer-exact) — low
   *    left-in-right means the fact side is mostly dangling (anti-join
   *    fodder, or a key-normalization bug); 10^6 means perfect coverage;
   *  - `n_left_null_rows` / `n_right_null_rows`: rows whose key is null —
   *    they match NOTHING in an equi-join, and a surprise null pile is
   *    the most common "why did my join drop rows" answer.
   *
   * Shape: one distinct-aggregate per side (shuffle carries keys only),
   * one equi-join of the two DISTINCT key sets (each side already
   * deduplicated, so the join output is bounded by min(n_left, n_right)),
   * and three one-row aggregates broadcast together. Integer arithmetic
   * end to end.
   */
  def joinKeyOverlap(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String): DataFrame = {
    def sideStats(df: DataFrame, key: String) = {
      val keys = df.select(col(key).as("__k"))
      (keys.filter(col("__k").isNotNull).distinct(),
       keys.agg(count(when(col("__k").isNull, 1)).as("nulls")))
    }
    val (lk, lnulls) = sideStats(left, leftKey)
    val (rk, rnulls) = sideStats(right, rightKey)
    val lCount = lk.agg(count(lit(1)).as("n_left_keys"))
    val rCount = rk.agg(count(lit(1)).as("n_right_keys"))
    val shared = lk.join(rk, Seq("__k"))
      .agg(count(lit(1)).as("n_shared_keys"))
    lCount.crossJoin(rCount).crossJoin(shared)
      .crossJoin(lnulls.select(col("nulls").as("n_left_null_rows")))
      .crossJoin(rnulls.select(col("nulls").as("n_right_null_rows")))
      .withColumn("left_in_right_ppm",
        when(col("n_left_keys") > 0,
          expr("n_shared_keys * 1000000 DIV n_left_keys")).otherwise(0L))
      .withColumn("right_in_left_ppm",
        when(col("n_right_keys") > 0,
          expr("n_shared_keys * 1000000 DIV n_right_keys")).otherwise(0L))
  }

  /**
   * JOIN OUTPUT-SIZE pre-flight — the third check in the shuffle-planning
   * trio ([[keySkewProfile]]: is one key hot; [[joinKeyOverlap]]: do the
   * key sets relate; this: HOW MANY ROWS will the join emit). The exact
   * inner-equi-join output count is `Σ_k cl(k) · cr(k)` over shared keys
   * — computable from two key-count aggregates without running the join,
   * which is how you catch a 10^12-row accidental many-to-many BEFORE
   * launching it. One row:
   *
   *  - `n_left_rows` / `n_right_rows`: input sizes;
   *  - `join_output_rows`: the exact inner-join row count;
   *  - `expansion_ppm`: `output · 10^6 DIV max(left, right)` — over 10^6
   *    means the join AMPLIFIES its larger input (the many-to-many smell);
   *  - `hot_key` / `hot_key_rows`: the single key contributing the most
   *    output rows (ties → lexically smallest key) — the row that tells
   *    you WHERE the explosion lives.
   *
   * Shape: one count agg per side (shuffle = distinct keys), an equi-join
   * of the two count tables (bounded by distinct-key counts, not rows),
   * and a one-row aggregate. Pure integer arithmetic.
   */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String): DataFrame = {
    def counts(df: DataFrame, key: String) = df
      .filter(col(key).isNotNull)
      .groupBy(col(key).cast(StringType).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val lc = counts(left, leftKey)
    val rc = counts(right, rightKey)
    val contrib = lc.join(rc.withColumnRenamed("__c", "__cr"), Seq("__k"))
      .select(col("__k"), (col("__c") * col("__cr")).as("__out"))
    // hot key via a rank window on the contrib table (bounded by the
    // shared-key count, not by rows)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__out").desc, col("__k").asc)
    val hot = contrib.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__k").as("hot_key"), col("__out").as("hot_key_rows"))
    val totals = left.agg(count(lit(1)).as("n_left_rows"))
      .crossJoin(right.agg(count(lit(1)).as("n_right_rows")))
      .crossJoin(contrib.agg(
        coalesce(sum(col("__out")), lit(0L)).as("join_output_rows")))
    val withHot = totals.crossJoin(
      hot.unionByName(
        // empty-intersection guard: emit a null hot key instead of
        // dropping the row entirely; the real hot row (non-null rows)
        // sorts first when one exists
        left.sparkSession.sql(
          "SELECT CAST(NULL AS STRING) hot_key, CAST(NULL AS BIGINT) hot_key_rows"))
        .orderBy(col("hot_key_rows").desc_nulls_last).limit(1))
    withHot.withColumn("expansion_ppm",
      when(greatest(col("n_left_rows"), col("n_right_rows")) > 0,
        expr("join_output_rows * 1000000 DIV " +
          "greatest(n_left_rows, n_right_rows)")).otherwise(0L))
      .select(col("n_left_rows"), col("n_right_rows"),
        col("join_output_rows"), col("expansion_ppm"),
        col("hot_key"), col("hot_key_rows"))
  }

  /**
   * One-pass DATASET PROFILE — the "data card" a corpus drop ships with:
   * one output row per column with `n_rows`, `n_nulls`, exact
   * `n_distinct`, and `min_value`/`max_value` rendered as strings (the
   * min/max are taken in the column's NATIVE type, then cast, so numeric
   * columns order numerically, not lexically). This is the first query a
   * pipeline runs against an unfamiliar 100 TB delivery: null-riddled
   * join keys, constant columns, and cardinality blowups all surface
   * here before any real job is launched.
   *
   * Shape: ONE aggregate over the data — Spark plans the multiple exact
   * `count(DISTINCT)`s as a single Expand + two-phase agg (rows replicate
   * #columns ways map-side, but the corpus is still scanned once and the
   * shuffle carries only distinct values per column). The unpivot to long
   * format runs on the one-row aggregate via `stack`, driver-free. For
   * 10^9-distinct columns swap `count_distinct` for
   * `approx_count_distinct` upstream; exact is the right default for a
   * profile that feeds join planning.
   */
  def profileColumns(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val names = if (columns.nonEmpty) columns else df.columns.toSeq
    require(names.nonEmpty, "profileColumns: no columns to profile")
    val aggs = Seq(count(lit(1)).as("__n_rows")) ++ names.flatMap { c =>
      Seq(
        count(col(qi(c))).as(s"__nn_$c"),
        count_distinct(col(qi(c))).as(s"__nd_$c"),
        min(col(qi(c))).cast(StringType).as(s"__min_$c"),
        max(col(qi(c))).cast(StringType).as(s"__max_$c"))
    }
    val wide  = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = names.map { c =>
      s"${ql(c)}, ${qi(s"__nn_$c")}, ${qi(s"__nd_$c")}, " +
        s"${qi(s"__min_$c")}, ${qi(s"__max_$c")}"
    }.mkString(", ")
    wide
      .select(col("__n_rows"), expr(
        s"stack(${names.length}, $stackArgs) AS " +
          "(column_name, __nonnull, n_distinct, min_value, max_value)"))
      .select(col("column_name"), col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("__nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }

  /**
   * MERGEABLE PROFILE SEGMENTS — the landed form of [[profileColumns]]
   * for corpora that arrive in batches: each batch computes ONE wide
   * segment row ([[profileSegment]]) holding per-column counts, native-
   * typed min/max, and an HLL distinct sketch (Spark's own
   * `hll_sketch_agg`); any union of segment rows later merges to the
   * corpus profile ([[mergeProfileSegments]]) with NO re-scan — counts
   * add, min/max fold in the native type (so numerics stay numeric until
   * the final render), sketches union. This is how a 100 TB delivery
   * keeps per-day profiles and answers "profile of any date range" from
   * kilobytes.
   *
   * Exactness split: `n_rows`/`n_nulls`/`min`/`max` merge EXACTLY;
   * `n_distinct_est` is the HLL estimate (±~2%), the price of
   * mergeability — [[profileColumns]] remains the exact one-shot.
   */
  def profileSegment(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val names = if (columns.nonEmpty) columns else df.columns.toSeq
    require(names.nonEmpty, "profileSegment: no columns to profile")
    val aggs = Seq(count(lit(1)).as("__n_rows")) ++ names.flatMap { c =>
      Seq(
        count(col(qi(c))).as(s"__nn_$c"),
        // sketch over the STRING form: hll_sketch_agg rejects
        // double/timestamp/boolean inputs, and the cast is
        // value-injective so distinct counts are unchanged
        expr(s"hll_sketch_agg(CAST(${qi(c)} AS STRING))").as(s"__hll_$c"),
        min(col(qi(c))).as(s"__min_$c"),
        max(col(qi(c))).as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Merge [[profileSegment]] rows to the long-format corpus profile.
    * `columns` must match the profiled set. */
  def mergeProfileSegments(segments: DataFrame,
                           columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "mergeProfileSegments: no columns")
    val aggs = Seq(sum(col("__n_rows")).as("__n_rows")) ++
      columns.flatMap { c =>
        Seq(
          sum(col(qi(s"__nn_$c"))).as(s"__nn_$c"),
          expr(s"hll_union_agg(${qi(s"__hll_$c")})").as(s"__hll_$c"),
          min(col(qi(s"__min_$c"))).as(s"__min_$c"),
          max(col(qi(s"__max_$c"))).as(s"__max_$c"))
      }
    val wide = segments.agg(aggs.head, aggs.tail: _*)
      .select(col("*") +: columns.map(c =>
        expr(s"hll_sketch_estimate(${qi(s"__hll_$c")})").as(s"__nd_$c")): _*)
    val stackArgs = columns.map { c =>
      s"${ql(c)}, ${qi(s"__nn_$c")}, ${qi(s"__nd_$c")}, " +
        s"CAST(${qi(s"__min_$c")} AS STRING), " +
        s"CAST(${qi(s"__max_$c")} AS STRING)"
    }.mkString(", ")
    wide
      .select(col("__n_rows"), expr(
        s"stack(${columns.length}, $stackArgs) AS " +
          "(column_name, __nonnull, n_distinct_est, min_value, max_value)"))
      .select(col("column_name"), col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("__nonnull")).as("n_nulls"),
        col("n_distinct_est"), col("min_value"), col("max_value"))
      .orderBy(col("column_name"))
  }

  /**
   * Per-group WINSORIZATION: clamp `valueCol` into its own group's
   * `[loP, hiP]` exact percentile band — the robust-scaling step before a
   * length/score feature feeds sampling weights or a classifier (one
   * 10^8-char document otherwise owns the scale). Adds
   * `<valueCol>_winsorized` plus the applied `__wlo`/`__whi` bounds
   * renamed `<valueCol>_lo`/`<valueCol>_hi` so the clipping is auditable.
   *
   * Percentiles are Spark's exact linear-interpolation `percentile` —
   * the same definition as DuckDB's `quantile_cont`, so the op is
   * exactly oracle-able (the [[graft.ops.TextOps.groupStats]] rule; swap
   * to approx_percentile upstream if a single group holds 10^9 rows).
   * Shape: one two-phase percentile agg to a groups-sized table,
   * broadcast back — no window over the corpus, no sort. Null values
   * pass through null; a group's bounds come from its non-null values.
   */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loP: Double = 0.01, hiP: Double = 0.99): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP <= hiP,
      s"need 0 <= loP <= hiP <= 1, got ($loP, $hiP)")
    val v = col(qi(valueCol)).cast(DoubleType)
    val bounds = df.groupBy(col(qi(groupCol))).agg(
      expr(s"percentile(${qi(valueCol)}, $loP)").as("__wlo"),
      expr(s"percentile(${qi(valueCol)}, $hiP)").as("__whi"))
    df.join(broadcast(bounds), Seq(groupCol))
      // explicit null guard: greatest/least SKIP nulls (in Spark and
      // DuckDB alike), which would clamp a null value to the lower bound
      .withColumn(s"${valueCol}_winsorized",
        when(v.isNull, lit(null).cast(DoubleType))
          .otherwise(least(greatest(v, col("__wlo")), col("__whi"))))
      .withColumnRenamed("__wlo", s"${valueCol}_lo")
      .withColumnRenamed("__whi", s"${valueCol}_hi")
  }
}
