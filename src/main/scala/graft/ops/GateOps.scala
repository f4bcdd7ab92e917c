package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative rule gates — the "filter report" layer every corpus pipeline
 * (C4, Gopher, RefinedWeb, FineWeb) publishes alongside its data release:
 * not just WHICH documents were dropped but by WHICH rule, both as a
 * per-document verdict ([[gate]]) and as the per-rule funnel table
 * ([[gateFunnel]]) that shows where the corpus shrinks.
 *
 * Rules are ordered (name, pass-predicate Column) pairs, so the machinery
 * is generic over any table — text quality gates, event sanity gates,
 * embedding validity gates — and the predicates stay inside whole-stage
 * codegen: the gate itself adds ZERO shuffles (a pure projection) and the
 * funnel is ONE aggregation producing one row regardless of corpus size.
 *
 * A NULL predicate value counts as a FAILURE of that rule, not a pass —
 * the safety default for data gates (a doc whose signal could not be
 * computed should not silently ship), and the convention DuckDB oracles
 * replay exactly via `coalesce(p, false)`.
 */
object GateOps {

  /** The report columns [[gate]] adds (and [[gateKeep]] strips). */
  val OutCols: Seq[String] = Seq("kept", "fail_first", "failed_rules", "n_failed")

  private def checkRules(df: DataFrame, rules: Seq[(String, Column)]): Unit = {
    require(rules.nonEmpty, "gate: at least one rule required")
    val names = rules.map(_._1)
    require(names.distinct == names,
      s"gate: duplicate rule names in ${names.mkString(", ")}")
    // case-INsensitive clash check: withColumn resolves case-insensitively
    // under the default spark.sql.caseSensitive=false, so a pre-existing
    // "KEPT" column would be silently clobbered past an exact-case guard
    val clash = OutCols.filter(o => df.columns.exists(_.equalsIgnoreCase(o)))
    require(clash.isEmpty,
      s"gate: input already has output column(s) ${clash.mkString(", ")}")
  }

  /**
   * Per-row verdict: `kept` (all rules pass), `fail_first` (the FIRST rule
   * in declaration order that fails — the funnel attribution — null when
   * kept), `failed_rules` (ALL failing rules, declaration order — the
   * independent attribution) and `n_failed`. Keeps every input row; the
   * caller filters on `kept` when it wants the surviving corpus, or ships
   * the whole frame as the release's filter report.
   */
  def gate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    checkRules(df, rules)
    val fails = rules.map { case (_, p) => !coalesce(p, lit(false)) }
    val emptyArr = array().cast(ArrayType(StringType, containsNull = false))
    val failedArr = concat(rules.zip(fails).map { case ((name, _), f) =>
      when(f, array(lit(name))).otherwise(emptyArr)
    }: _*)
    df.withColumn("failed_rules", failedArr)
      .withColumn("kept", size(col("failed_rules")) === 0)
      // failed_rules is already in declaration order, so the funnel
      // attribution is just its head (null when kept) — one place owns
      // the NULL-as-failure convention instead of a second CASE chain
      .withColumn("fail_first", get(col("failed_rules"), lit(0)))
      .withColumn("n_failed", size(col("failed_rules")).cast(LongType))
  }

  /**
   * The per-rule funnel: one row per rule with `n_in` (rows that survived
   * every earlier rule), `n_dropped` (rows whose FIRST failure is this
   * rule — so n_dropped sums to total minus kept), `n_out` (= n_in -
   * n_dropped, the next rule's n_in) and `n_fail_independent` (rows
   * failing this rule regardless of order — the overlap diagnostic: a rule
   * whose independent count is large but whose n_dropped is small is
   * shadowed by earlier rules).
   *
   * ONE aggregation over the corpus (2k+1 scalar sums for k rules), one
   * collected row, and a k-row result built driver-side — bounded by the
   * rule count, never the corpus.
   */
  def gateFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    checkRules(df, rules)
    val spark = df.sparkSession
    val fails = rules.map { case (_, p) => !coalesce(p, lit(false)) }
    val firstIdx = rules.indices.zip(fails).foldRight(lit(null).cast(IntegerType)) {
      case ((i, f), acc) => when(f, lit(i)).otherwise(acc)
    }
    val aggs = count(lit(1)).as("__total") +:
      rules.indices.map(i => sum(when(firstIdx === i, 1L).otherwise(0L))
        .as(s"__drop_$i")) ++:
      rules.indices.zip(fails).map { case (i, f) =>
        sum(when(f, 1L).otherwise(0L)).as(s"__fail_$i") }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val total = r.getAs[Long]("__total")
    var nIn = total
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      val dropped = r.getAs[Long](s"__drop_$i")
      val indep = r.getAs[Long](s"__fail_$i")
      val row = Row(i.toLong, name, nIn, dropped, nIn - dropped, indep)
      nIn -= dropped
      row
    }
    val schema = StructType(Seq(
      StructField("rule_idx", LongType, nullable = false),
      StructField("rule", StringType, nullable = false),
      StructField("n_in", LongType, nullable = false),
      StructField("n_dropped", LongType, nullable = false),
      StructField("n_out", LongType, nullable = false),
      StructField("n_fail_independent", LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** [[gate]] + keep-only-survivors, report columns stripped — the common
    * chain position between dedup and sampling. */
  def gateKeep(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    gate(df, rules).filter(col("kept")).drop(OutCols: _*)

  /** Prefix of the `Dataset.observe` metric [[gateObserved]] emits (the
    * [[graft.ops.DedupOps.ObservedMetrics]] convention: consumers match on
    * the prefix; the suffix keeps CollectMetrics names unique within one
    * query). The metric row carries `total`, `kept`, and one
    * `fail_<rule>` independent-failure count per rule. */
  val FunnelMetrics = "graft.gate.funnel"

  /**
   * [[gate]] plus the funnel counts as a `Dataset.observe` metric — the
   * STREAMING funnel: in a `writeStream` the per-batch counts arrive at
   * a `StreamingQueryListener` (or `QueryExecutionListener` in batch) on
   * rows already flowing, zero extra jobs and no second aggregation
   * pass. The metric carries `total`, `kept`, and per-rule INDEPENDENT
   * failure counts (a doc failing two rules counts in both) — total
   * minus kept is the dropped count; first-fail funnel attribution
   * needs [[gateFunnel]], it cannot be reconstructed from these sums
   * when rules overlap. Counts are accumulator
   * semantics: per executed query, exact below any shuffle boundary
   * (see the [[graft.ops.DedupOps.ObservedMetrics]] caveats on limited
   * executions).
   */
  def gateObserved(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val gated = gate(df, rules)
    val aggs = count(lit(1)).as("total") +:
      sum(when(col("kept"), 1L).otherwise(0L)).as("kept") +:
      rules.map { case (name, _) =>
        sum(when(array_contains(col("failed_rules"), name), 1L)
          .otherwise(0L)).as(s"fail_$name") }
    gated.observe(DedupOps.obsName(FunnelMetrics), aggs.head, aggs.tail: _*)
  }

  /**
   * A reference text-quality ruleset over pure portable expressions
   * (length, whitespace token count, distinct-token diversity, language
   * tag) — the C4/Gopher-flavored defaults a release pipeline starts from
   * before tuning. All four replay verbatim in a DuckDB oracle; signals
   * needing tokenizer state (repetition 2-grams, langId n-gram scores)
   * come from their dedicated ops and join the gate as extra rules.
   */
  def standardTextRules(textCol: String, langCol: String,
                        minChars: Int = 150, minTokens: Int = 25,
                        minDistinctRatio: Double = 0.32,
                        keepLangs: Seq[String] = Seq("en"))
      : Seq[(String, Column)] = {
    val t = col(textCol)
    // WHITESPACE tokenization (the C4/Gopher convention — newline/tab
    // separated text must count as many tokens, runs of spaces must not
    // mint empty ones): strip edge whitespace, split on runs. Explicit
    // [ \t\n\r\f] class because Java's \s and RE2's \s disagree on \x0B —
    // this one replays identically in any engine.
    val ws = "[ \\t\\n\\r\\f]"
    val body = regexp_replace(t, s"^$ws+|$ws+$$", "")
    val tok = split(body, s"$ws+")
    // all-whitespace/empty text splits to [""] — count it as 0 tokens
    val nTok = when(length(body) === 0, lit(0)).otherwise(size(tok))
    Seq(
      "min_chars" -> (length(t) >= minChars),
      "min_tokens" -> (nTok >= minTokens),
      // guarded ratio: 0 tokens -> NULL -> fail-closed (and never a
      // float division by zero, which ANSI float math turns into Inf)
      "diversity" ->
        when(nTok > 0, size(array_distinct(tok)).cast(DoubleType) /
          nTok.cast(DoubleType) >= minDistinctRatio),
      "lang" -> col(langCol).isInCollection(keepLangs))
  }

  /**
   * THRESHOLD SWEEP: the keep-curve decision table for a scalar quality /
   * importance score — for each candidate cutoff, how many documents and
   * tokens survive `score >= cutoff`, as counts and corpus ppm. This is
   * the table a curation campaign reads to pick its FineWeb-Edu-style
   * classifier threshold (or a DSIR importance cutoff) BEFORE committing
   * to the filter, instead of re-running the corpus once per candidate.
   *
   * One corpus pass regardless of how many cutoffs: each row maps to the
   * HIGHEST cutoff it clears (a literal CASE chain inside codegen; null
   * scores clear none, the gate convention), one tier-keyed aggregation,
   * then a descending cumulative sum over the CUTOFF SPINE (every cutoff
   * emits a row even when its tier is empty — the bindata empty-bin rule)
   * turns per-tier mass into at-or-above-cutoff mass. Totals include the
   * below-all-cutoffs tier, so ppm is of the WHOLE input. All integer;
   * ppm is BIGINT floor division (bounds: kept_tokens < 2^63/1e6 ≈ 9e12
   * — quantize coarser above that).
   *
   * Output: (cutoff, kept_docs, kept_tokens, kept_docs_ppm,
   * kept_tokens_ppm), one row per cutoff, ascending.
   */
  def thresholdSweep(df: DataFrame, scoreCol: String, tokensCol: String,
                     cutoffs: Seq[Long]): DataFrame = {
    require(cutoffs.nonEmpty && cutoffs == cutoffs.sorted &&
        cutoffs.distinct.size == cutoffs.size,
      s"cutoffs must be non-empty and strictly ascending, got $cutoffs")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val tok = greatest(coalesce(col(tokensCol).cast("long"), lit(0L)), lit(0L))
    // highest cleared cutoff wins (outermost CASE arm); nulls fall to -1
    val tier = cutoffs.zipWithIndex.foldLeft(lit(-1): Column) {
      case (acc, (c, i)) => when(col(scoreCol) >= c, lit(i)).otherwise(acc)
    }
    val perTier = df.select(tier.as("tier"), tok.as("__tok"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("__docs"), sum(col("__tok")).as("__toks"))
    // totals BEFORE the spine join (the -1 tier must count toward ppm)
    val totals = perTier.agg(
      coalesce(sum(col("__docs")), lit(0L)).as("__td"),
      coalesce(sum(col("__toks")), lit(0L)).as("__tt"))
    val spine = cutoffs.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("tier", "cutoff")
    // unpartitioned window is deliberate and row-bounded: it runs over the
    // tier SPINE (one row per cutoff — parameter-sized, never data-sized),
    // after the per-tier aggregation already collapsed the corpus
    val fromHere = Window.orderBy(col("tier"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(perTier, Seq("tier"), "left")
      .withColumn("kept_docs",
        sum(coalesce(col("__docs"), lit(0L))).over(fromHere))
      .withColumn("kept_tokens",
        sum(coalesce(col("__toks"), lit(0L))).over(fromHere))
      .crossJoin(broadcast(totals)) // one-row aggregate broadcast
      .withColumn("kept_docs_ppm", when(col("__td") > 0,
        expr("(kept_docs * 1000000) div __td")).otherwise(lit(0L)))
      .withColumn("kept_tokens_ppm", when(col("__tt") > 0,
        expr("(kept_tokens * 1000000) div __tt")).otherwise(lit(0L)))
      .select(col("cutoff"), col("kept_docs"), col("kept_tokens"),
        col("kept_docs_ppm"), col("kept_tokens_ppm"))
      .orderBy(col("cutoff"))
  }
}
