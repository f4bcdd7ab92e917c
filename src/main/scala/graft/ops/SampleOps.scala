package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / splitting for training-data pipelines. A split
 * must be a pure function of the ROW KEY — not of partitioning, row order,
 * or an RNG — so re-running the pipeline (or running it on a different
 * cluster layout) assigns every document to the same split. The md5-based
 * 31-bit hash is the same engine-portable family MinHash uses, so split
 * assignment is exactly reproducible in the DuckDB oracle (and any other
 * engine a consumer re-implements it in).
 */
object SampleOps {

  /** Codegen'd md5-31 of "salt:key" (graftdedup.Md5Hash31Expr — native, no
    * UDF boundary on the full-corpus sampling/splitting paths). */
  private def keyHash(key: Column, salt: String): Column =
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions
      .md5Hash31(concat_ws(":", lit(salt), key.cast("string")))

  /** Stable split id in [0, nSplits) from the key column + salt. Change the
    * salt to draw an independent split. */
  def splitId(key: Column, nSplits: Int, salt: String = "graft"): Column =
    keyHash(key, salt) % nSplits

  /** Assign train/val/test-style splits: adds `split` in [0, nSplits). */
  def hashSplit(df: DataFrame, keyCol: String, nSplits: Int,
                salt: String = "graft"): DataFrame =
    df.withColumn("split", splitId(col(keyCol), nSplits, salt))

  /** Cut for `hash < cut` over the INCLUSIVE [0, 2^31 - 1] hash range:
    * scaled by 2^31 (not 2^31 - 1) so rate 1.0 keeps EVERY row, including
    * the ~2^-31 of keys hashing to exactly 2^31 - 1. */
  private def cutOf(rate: Double): Long = (rate * (DedupOps.P31 + 1).toDouble).toLong

  /** Deterministic keep-rate sample: keep rows whose hash lands under
    * `rate` of the 31-bit space. Map-side, no shuffle, stable across runs. */
  def sampleByHash(df: DataFrame, keyCol: String, rate: Double,
                   salt: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(keyHash(col(keyCol), salt) < cutOf(rate))
  }

  /**
   * Deterministic QUALITY-WEIGHTED sample: each row's keep probability is
   * its own `weightCol` value (clamped to [0, 1]) — the
   * sample-proportional-to-quality-score step (DCLM-style) between scoring
   * and training. Same hash-gate mechanics as [[sampleByHash]] with a
   * PER-ROW cut: keep iff `hash(salt:key) < clamp(weight) * 2^31`, so the
   * decision is a pure function of (salt, key, weight) — map-side, no
   * shuffle, stable across runs/engines, and monotone in the weight (a row
   * kept at weight w is kept at any w' >= w under the same salt; null
   * weights drop). Scaling by 2^31 keeps weight-1.0 rows ALWAYS, the
   * [[sampleByHash]] boundary rule.
   */
  def weightedSampleByHash(df: DataFrame, keyCol: String, weightCol: String,
                           salt: String = "graft"): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    df.filter(keyHash(col(keyCol), salt).cast("double") <
      w * (DedupOps.P31 + 1).toDouble)
  }

  /**
   * Deterministic STRATIFIED sample: per-stratum keep rates (e.g. keep 100%
   * of low-resource languages, 10% of English) — the standard corpus
   * rebalancing step before training. Map-side like [[sampleByHash]]: each
   * row's fate is a pure function of (salt, key), the stratum only selects
   * the cut, so no shuffle, no stratum-size pre-pass, stable across runs
   * and engines. Strata absent from `rates` fall back to `defaultRate`.
   */
  def stratifiedSampleByHash(df: DataFrame, keyCol: String, stratumCol: String,
                             rates: Map[String, Double], defaultRate: Double = 1.0,
                             salt: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    // fold the rate table into one codegen'd CASE chain; deterministic
    // order so plans (and oracles) are reproducible
    val cut = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(cutOf(defaultRate))) { case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(cutOf(r))).otherwise(acc)
      }
    df.filter(keyHash(col(keyCol), salt) < cut)
  }

  /**
   * TEMPERATURE-BASED group rebalancing (the multilingual-corpus
   * `p_g ∝ n_g^alpha` rule, mBERT/XLM-R style): a group's share of the
   * output follows its size raised to `alpha < 1`, boosting low-resource
   * groups relative to their raw share; `targetRows` sets the output
   * budget. Keep rate per group: `min(1, targetRows * q_g / n_g)` with
   * `q_g = n_g^alpha / Σ_h n_h^alpha`, applied through the same
   * deterministic md5-31 hash gate as [[sampleByHash]].
   *
   * Engine-portable arithmetic: each `n_g^alpha` is quantized to integer
   * MICRO-UNITS (`floor(pow * 1e6)` — the q116 micro-nat rule) BEFORE the
   * normalizing sum, so the only aggregate over doubles becomes an exact
   * integer sum no engine can reorder-diverge; the remaining rate math is
   * a single division of integers in doubles, reproducible
   * expression-for-expression in any engine.
   *
   * Scale shape: one groups-sized count agg, a one-row integer total,
   * cuts broadcast back, map-side gate — no shuffle of the corpus, no
   * per-row state; identical to the [[stratifiedSampleByHash]] plan with
   * the rate table COMPUTED instead of provided.
   */
  def temperatureSampleByHash(df: DataFrame, keyCol: String,
                              groupCol: String, alpha: Double,
                              targetRows: Long,
                              salt: String = "graft"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0,
      s"temperatureSampleByHash: alpha in (0, 1], got $alpha")
    require(targetRows >= 0,
      s"temperatureSampleByHash: targetRows must be >= 0, got $targetRows")
    val sizes = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val pw = sizes.withColumn("__pw",
      floor(pow(col("__n").cast("double"), lit(alpha)) * lit(1e6))
        .cast("long"))
    val tot = pw.agg(sum(col("__pw")).as("__tot"))
    val cuts = pw.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0),
        (lit(targetRows.toDouble) * col("__pw")) /
          (col("__tot").cast("double") * col("__n").cast("double"))))
      .withColumn("__cut",
        floor(col("__rate") * lit((DedupOps.P31 + 1).toDouble)).cast("long"))
      .select(col(groupCol), col("__cut"))
    // NULL-SAFE join: a null group is a real group (groupBy counted it),
    // so it must meet its own computed cut rather than silently vanish
    // through an equi-join; the final select restores df's column order
    // (the join moved groupCol first), matching the other hash gates.
    df.join(broadcast(cuts.withColumnRenamed(groupCol, "__g")),
        col(groupCol) <=> col("__g"))
      .filter(keyHash(col(keyCol), salt) < col("__cut"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * Deterministic global shuffle: order the corpus by the md5-31 hash of
   * the key (ties broken by the key itself) — the shuffle-before-packing /
   * epoch-reshuffle step of a training pipeline, as a pure function of
   * (salt, key): any engine, any partitioning, any rerun produces the
   * identical permutation, and a new salt draws an independent one.
   * One range-partitioned sort; Spark samples range bounds so the sort
   * parallelizes across the cluster.
   *
   * NULL keys hash to NULL (concat_ws would silently drop the null and
   * hash the bare salt — a mid-range value no other engine reproduces) and
   * sort LAST as a group, matching SQL's default `ASC NULLS LAST`.
   * `emitKeyCol` materializes the hash as a column, so a consumer (or an
   * oracle) can verify the permutation without recomputing it.
   */
  def deterministicShuffle(df: DataFrame, keyCol: String,
                           salt: String = "graft",
                           emitKeyCol: Option[String] = None): DataFrame = {
    val h = when(col(keyCol).isNotNull, keyHash(col(keyCol), salt))
    emitKeyCol match {
      case Some(name) =>
        df.withColumn(name, h)
          .orderBy(col(name).asc_nulls_last, col(keyCol).asc_nulls_last)
      case None =>
        df.orderBy(h.asc_nulls_last, col(keyCol).asc_nulls_last)
    }
  }

  /**
   * CURRICULUM SCHEDULE: order the corpus into quality tiers for staged
   * pretraining — tier 0 first (scores below `thresholds(0)`), the top
   * tier last, each tier internally shuffled by the [[deterministicShuffle]]
   * hash family so no tier streams in source/id order. The returned frame
   * adds `tier` (= number of thresholds at or below the score) and
   * `shuffle_key`, and IS the schedule: consume in row order (the dense
   * step index is the row position after landing — at 100 TB the schedule
   * is shard order, not a materialized counter).
   *
   * Scale shape: tier and shuffle key are pure map-side scalars (no
   * window, no global rank — an `ntile` curriculum would single-partition
   * the corpus); the only distributed work is the final range-partitioned
   * sort, which is exactly what writing the schedule out costs anyway.
   * Null scores have no place in a curriculum: `tier` is null and the
   * rows sort last, after every scheduled tier.
   */
  /** Derive `nTiers - 1` ascending thresholds for [[curriculumOrder]] from
    * the score distribution itself (equi-populated tiers up to score ties):
    * `approx_percentile` at the interior quantiles — a one-row aggregate at
    * any corpus size, the bounded-memory sketch the exact-ntile curriculum
    * this module deliberately avoids would need a global sort for.
    * Duplicate quantile values (heavily tied scores) collapse, so the
    * returned list is strictly ascending and may be shorter than
    * `nTiers - 1`. */
  def quantileThresholds(df: DataFrame, score: Column, nTiers: Int,
                         accuracy: Int = 10000): Seq[Double] = {
    require(nTiers >= 2, s"need >= 2 tiers, got $nTiers")
    val qs = (1 until nTiers).map(_.toDouble / nTiers)
    val row = df.agg(percentile_approx(score,
      array(qs.map(lit(_)): _*), lit(accuracy)).as("q")).head()
    row.getSeq[Double](0).distinct.sorted
  }

  def curriculumOrder(df: DataFrame, keyCol: String, score: Column,
                      thresholds: Seq[Double],
                      salt: String = "graft"): DataFrame = {
    require(thresholds.nonEmpty, "curriculumOrder: need >= 1 threshold")
    require(thresholds == thresholds.sorted && thresholds.distinct == thresholds,
      s"thresholds must be strictly ascending, got $thresholds")
    val tierExpr = thresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(score >= lit(t), lit(1L)).otherwise(lit(0L))
    }
    df.withColumn("tier", when(score.isNotNull, tierExpr))
      .withColumn("shuffle_key",
        when(col(keyCol).isNotNull, keyHash(col(keyCol), salt)))
      .orderBy(col("tier").asc_nulls_last, col("shuffle_key").asc_nulls_last,
        col(keyCol).asc_nulls_last)
  }

  /**
   * Deterministic MIXTURE resampling: reshape the corpus to target
   * per-source weights, INCLUDING upsampling — the pre-training data-mixing
   * step ("2 epochs of books, 0.3 epochs of web"). For source s with n_s
   * rows and normalized weight w_s, the expected copy count is
   * r_s = ((w_s / W) * totalRows) / n_s: every row gets floor(r_s) full
   * copies, plus one more iff its md5-31 hash lands under frac(r_s) of the
   * hash space — so the output is w_s-proportioned in expectation, every
   * row's multiplicity is a pure function of (salt, key), and light-tailed
   * sources replicate whole-row-deterministically instead of by RNG.
   * Sources absent from `weights` are dropped. Output rows carry `epoch`
   * (0-based copy index) for loaders that salt their shuffle per epoch.
   *
   * Scale shape: one tiny groupBy-count over the source column (#sources
   * rows), then a map-side CASE chain + `explode(sequence(...))` — the
   * corpus itself never shuffles, and the explode emits exactly the output
   * multiplicity (no generate-then-filter pass).
   */
  def resampleToMixture(df: DataFrame, keyCol: String, sourceCol: String,
                        weights: Map[String, Double], totalRows: Long,
                        salt: String = "graft"): DataFrame = {
    require(totalRows > 0, s"totalRows must be positive, got $totalRows")
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (s, w) =>
      require(w >= 0.0, s"weight for '$s' must be >= 0, got $w") }
    // sorted fold so the normalizing sum (and with it every derived double)
    // is deterministic and exactly reproducible by the oracle's literal SQL
    val sortedW = weights.toSeq.sortBy(_._1)
    val wSum = sortedW.map(_._2).sum
    require(wSum > 0.0, "at least one weight must be positive")
    val counts = df
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a positively-weighted source with NO corpus rows cannot be silently
    // skipped: its mixture mass would vanish (the output undershoots
    // totalRows and over-represents every other source) with no signal —
    // almost always a typo'd source name or a broken upstream filter
    val missing = weights.collect {
      case (s, w) if w > 0.0 && counts.getOrElse(s, 0L) == 0L => s
    }
    require(missing.isEmpty,
      s"resampleToMixture: positively-weighted source(s) ${missing.mkString(", ")} " +
        "have no rows in the corpus — fix the weights or the source column")
    // per-source (full copies, 31-bit cut for the fractional extra copy);
    // parenthesization mirrors the oracle SQL exactly: ((w / W) * T) / n
    val params = sortedW.collect {
      case (s, w) if counts.getOrElse(s, 0L) > 0L =>
        val r = ((w / wSum) * totalRows.toDouble) / counts(s).toDouble
        val base = math.floor(r).toLong
        val cut = math.floor((r - math.floor(r)) * (DedupOps.P31 + 1).toDouble).toLong
        (s, base, cut)
    }
    explodeCopies(df, keyCol, sourceCol, params, salt)
  }

  /** Shared tail of the mixture resamplers: map-side CASE chain picking
    * (base copies, 31-bit fractional cut) per source, then one
    * `explode(sequence(...))` emitting exactly the output multiplicity. */
  private def explodeCopies(df: DataFrame, keyCol: String, sourceCol: String,
                            params: Seq[(String, Long, Long)],
                            salt: String): DataFrame = {
    val hash = keyHash(col(keyCol), salt)
    val copies = params.foldLeft(lit(0L)) { case (acc, (s, base, cut)) =>
      when(col(sourceCol) === s,
        lit(base) + when(hash < lit(cut), lit(1L)).otherwise(lit(0L)))
        .otherwise(acc)
    }
    val copiesCol = TextOps.tempName(df, "__copies")
    df.withColumn(copiesCol, copies)
      .filter(col(copiesCol) > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col(copiesCol) - 1, lit(1L))))
      .drop(copiesCol)
  }

  /**
   * TOKEN-weighted mixture resampling: [[resampleToMixture]] with the copy
   * rates derived from per-source TOKEN sums instead of row counts — the
   * form a pre-training mix is actually specified in ("books should be 20%
   * of the TOKENS", not of the documents; with 100x length spread between
   * a web snippet and a book, row-proportioning misses the token mix by
   * orders of magnitude). For source s with T_s tokens and normalized
   * weight w_s, the copy rate is r_s = ((w_s / W) * totalTokens) / T_s:
   * every row of s gets floor(r_s) copies plus a hash-gated extra, so the
   * EXPECTED token output is w_s-proportioned while each row's multiplicity
   * stays a pure function of (salt, key) — deterministic, engine-portable,
   * layout-independent. Null or non-positive token counts contribute 0 to
   * T_s and the rows still replicate at the source's rate (caller filters
   * empties first if they should drop). Same scale shape as the row form:
   * one tiny per-source agg, then map-side CASE + explode.
   */
  def resampleToMixtureTokens(df: DataFrame, keyCol: String, sourceCol: String,
                              tokenCountCol: String,
                              weights: Map[String, Double], totalTokens: Long,
                              salt: String = "graft"): DataFrame = {
    require(totalTokens > 0, s"totalTokens must be positive, got $totalTokens")
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (s, w) =>
      require(w >= 0.0, s"weight for '$s' must be >= 0, got $w") }
    val sortedW = weights.toSeq.sortBy(_._1)
    val wSum = sortedW.map(_._2).sum
    require(wSum > 0.0, "at least one weight must be positive")
    val tokenSums = df
      .filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol))
      // greatest(.., 0) zeroes NEGATIVE counts too (a -1 'unknown' sentinel
      // must not subtract from T_s and deflate every other row's rate)
      .agg(sum(greatest(coalesce(col(tokenCountCol).cast("long"), lit(0L)),
        lit(0L))).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.collect {
      case (s, w) if w > 0.0 && tokenSums.getOrElse(s, 0L) <= 0L => s
    }
    require(missing.isEmpty,
      s"resampleToMixtureTokens: positively-weighted source(s) ${missing.mkString(", ")} " +
        "have no tokens in the corpus — fix the weights or the token column")
    // ((w / W) * totalTokens) / T_s — the oracle replays this association order
    val params = sortedW.collect {
      case (s, w) if tokenSums.getOrElse(s, 0L) > 0L =>
        val r = ((w / wSum) * totalTokens.toDouble) / tokenSums(s).toDouble
        val base = math.floor(r).toLong
        val cut = math.floor((r - math.floor(r)) * (DedupOps.P31 + 1).toDouble).toLong
        (s, base, cut)
    }
    explodeCopies(df, keyCol, sourceCol, params, salt)
  }

  /**
   * Deterministic per-group cap: keep at most `n` rows per `groupCol`,
   * selected in salted-key-hash order (ties by key) — the "at most N
   * documents per domain / per source" quota every web-corpus pipeline
   * applies so one giant site cannot dominate the mixture. Selection is a
   * pure function of (salt, key), so reruns and incremental re-ingests pick
   * the SAME representatives; change the salt to draw an independent quota.
   *
   * Scale shape: one shuffle on `groupCol`; the `row_number <= n` filter is
   * rewritten by Spark into WindowGroupLimit, which maintains a per-group
   * top-n BELOW the sort map-side — a hot domain costs its top-n
   * maintenance streaming over the partition, not a full-group
   * materialization (same pushdown the ANN top-k relies on, pinned by
   * PlanShapeSpec).
   */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int,
                  salt: String = "graft"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val rn = TextOps.tempName(df, "__rn")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(keyHash(col(keyCol), salt), col(keyCol))
    df.withColumn(rn, org.apache.spark.sql.functions.row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }

  /**
   * Deterministic WEIGHTED TOP-K per group — sampling WITHOUT replacement
   * with inclusion probability proportional to each row's own weight
   * (A-ES / Efraimidis-Spirakis priority sampling: rank by `u^(1/w)` for
   * a per-row uniform `u`, keep the k largest per group). The curation
   * step "keep the k best-ish docs per domain, quality-weighted, but
   * reproducibly" — where [[capPerGroup]] is the unweighted version.
   *
   * Determinism contract (the [[weightedSampleByHash]] family): `u` comes
   * from the md5-31 hash of `(salt, key)` mapped to `(0, 1]` — never
   * `rand()` — so membership is a pure function of (salt, key, weight),
   * identical on any engine, partitioning, or retry. Ranking uses
   * `ln(u)/w` (monotone in `u^(1/w)`, both negative) quantized to
   * integer MICRO-NATS (`floor(x*1e6 + 0.5)`, the PMI/n-gram-LM rule) so
   * an ulp of `ln` drift cannot reorder rows across engines; ties break
   * by the key column. Rows with null, zero, or negative weights never
   * qualify (a zero-weight row must have zero inclusion probability).
   *
   * Shape: one map-side scalar per row + the same single
   * window-partitioned top-k as [[capPerGroup]] — Spark's
   * WindowGroupLimit pushes the k-row maintenance below the sort, so no
   * group ever materializes fully. Output: the input rows that made the
   * cut, plus their 1-based `sample_rank`.
   */
  def weightedTopKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                           weightCol: String, k: Int,
                           salt: String = "graft-wtopk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qk = TextOps.tempName(df, "__wtopk_q")
    // u in (0, 1]: (h + 1) / 2^31 over the inclusive [0, 2^31 - 1] range
    val u = (keyHash(col(keyCol), salt).cast("double") + 1.0) /
      (DedupOps.P31 + 1).toDouble
    val lnOverW = org.apache.spark.sql.functions.log(u) /
      col(weightCol).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(qk).desc, col(keyCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn(qk,
        org.apache.spark.sql.functions.floor(lnOverW * 1e6 + 0.5))
      .withColumn("sample_rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop(qk)
  }

  /**
   * Deterministic GUMBEL top-k per group — weighted sampling without
   * replacement ∝ `exp(weight_micro / 1e6)`, decided entirely in LOG
   * space (Gumbel-max: rank by `log w + g`, `g = −ln(−ln(u))` with the
   * md5-31 deterministic uniform). The log-space sibling of
   * [[weightedTopKPerGroup]]: A-ES needs the weight as a positive double,
   * which dies when the weight IS a log (a DSIR `logw_micro` spans
   * thousands of nats — `exp` overflows any double). Both the weight and
   * the quantized Gumbel noise are integer micro-nats, so the rank order
   * is a total order any engine reproduces (ties on the sum break to the
   * key). Same WindowGroupLimit shape as [[capPerGroup]]/q116 — the
   * top-k maintenance runs below the sort, no group ever materializes.
   * For a global budget over a huge corpus, group by [[assignShards]]
   * shards and take `k = budget / nShards` per shard (ranks are iid
   * across shards, so per-shard top-k is the scale-safe global sample).
   * Null weights never qualify (a doc that could not be scored must not
   * win a sampling slot).
   */
  def gumbelTopKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                         weightMicroCol: String, k: Int,
                         salt: String = "graft-gumbel"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rk = TextOps.tempName(df, "__gumbel_r")
    // u in (0, 1) strictly: (h + 1) / (2^31 + 1) over h in [0, 2^31 - 1]
    // (u = 1 would send the Gumbel to +inf)
    val u = (keyHash(col(keyCol), salt).cast("double") + 1.0) /
      (DedupOps.P31 + 2).toDouble
    val g = -org.apache.spark.sql.functions.log(
      -org.apache.spark.sql.functions.log(u))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(rk).desc, col(keyCol))
    df.filter(col(weightMicroCol).isNotNull)
      .withColumn(rk, col(weightMicroCol).cast("long") +
        org.apache.spark.sql.functions.floor(g * 1e6 + 0.5).cast("long"))
      .withColumn("sample_rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop(rk)
  }

  /**
   * Deterministic sequence PACKING: group consecutive docs (in `orderCol`
   * order within each `splitCol` partition) into packs of at most `budget`
   * tokens — the pretraining step that concatenates documents into
   * fixed-length training sequences. The pack id is the running token
   * total integer-divided by the budget, i.e. a greedy sequential packer
   * whose assignment is a pure function of the ordered token counts: fully
   * window-expressible (one shuffle on `splitCol`), reproducible on any
   * engine, and parallel across splits — at 10^9 docs the split column
   * (e.g. a [[hashSplit]] over 10^4 splits) bounds every window partition.
   * Docs longer than `budget` spill across pack boundaries (`pack_offset`
   * records where in the pack a doc starts); truncation is caller policy.
   */
  def packSequences(df: DataFrame, splitCol: String, orderCol: String,
                    tokenCountCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(splitCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // cumulative tokens BEFORE the current doc decide which pack it starts in
    val cumBefore = coalesce(sum(col(tokenCountCol)).over(w), lit(0L))
    df.withColumn("pack_id", (cumBefore / lit(budget)).cast("long"))
      .withColumn("pack_offset", (cumBefore % lit(budget)).cast("long"))
  }

  /**
   * Deterministic SHARD assignment: `shard` in [0, nShards) from the salted
   * md5-31 of the key — the map-side, shuffle-free layout step before a
   * training corpus lands as fixed shards. Expected-equal shard sizes at
   * any corpus size (binomial concentration: ±0.1% at 10^9/1024 rows per
   * shard); a pure function of (salt, key), so re-runs, re-partitions and
   * other engines place every document identically. Same hash family as
   * [[hashSplit]] — a different salt draws independent shards.
   */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int,
                   salt: String = "graft-shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard", splitId(col(keyCol), nShards, salt))
  }

  /**
   * Per-shard MANIFEST over a [[assignShards]]-labeled frame: one row per
   * shard with `n_docs`, `n_tokens` (sum of `tokenCountCol` if given, else
   * null), `key_checksum` (bit-XOR of the salted md5-31 key hashes — order-
   * independent, engine-portable; 31-bit, so a drift DETECTOR, not a
   * cryptographic seal) and `min_key`/`max_key`. One two-phase hash agg;
   * every value is a pure function of the shard's row set, so two corpora
   * disagree on a manifest row iff their shards differ.
   */
  def shardManifest(sharded: DataFrame, keyCol: String,
                    tokenCountCol: Option[String] = None,
                    salt: String = "graft-shard"): DataFrame = {
    val tokens = tokenCountCol.map(c => sum(col(c).cast("long")))
      .getOrElse(lit(null).cast("long"))
    sharded.groupBy(col("shard")).agg(
      count(lit(1)).as("n_docs"),
      tokens.as("n_tokens"),
      bit_xor(keyHash(col(keyCol), salt)).as("key_checksum"),
      min(col(keyCol)).as("min_key"),
      max(col(keyCol)).as("max_key"))
  }

  /**
   * Land a training corpus as deterministic SHARDS with a manifest:
   * assigns shards ([[assignShards]]), writes `outDir/data` partitioned by
   * `shard` (one directory per shard — the loader's unit of work), then
   * reads the LANDED bytes back to compute and write `outDir/manifest`, so
   * the manifest certifies what is on disk, not what was about to be
   * written. Returns the manifest. Deterministic end to end: rewriting the
   * same corpus reproduces identical shard membership and checksums on any
   * cluster layout.
   */
  def writeShards(df: DataFrame, outDir: String, keyCol: String, nShards: Int,
                  tokenCountCol: Option[String] = None,
                  salt: String = "graft-shard"): DataFrame =
    writeShards(df, outDir, keyCol, nShards, tokenCountCol, salt, "parquet")

  /**
   * [[writeShards]] with a data format: `"parquet"` (the default — typed,
   * splittable, what downstream Spark jobs read) or `"json"` (JSON LINES
   * — one object per row, the interchange format LLM trainer loaders
   * consume directly). The manifest is parquet either way, computed from
   * a re-read of the LANDED data so it certifies what is actually on
   * disk, not what was about to be written — for json that also
   * round-trips the values through the trainer's own parse path, so a
   * lossy serialization would fail the manifest checksum instead of
   * corrupting a training run silently.
   */
  def writeShards(df: DataFrame, outDir: String, keyCol: String, nShards: Int,
                  tokenCountCol: Option[String], salt: String,
                  format: String): DataFrame = {
    require(format == "parquet" || format == "json",
      s"writeShards: format must be parquet or json, got $format")
    val spark = df.sparkSession
    assignShards(df, keyCol, nShards, salt)
      .write.mode("overwrite").partitionBy("shard").format(format)
      .save(s"$outDir/data")
    // partition discovery infers shard as INT; cast back to long so the
    // landed manifest's schema matches shardManifest(assignShards(...));
    // json re-reads with the writer's schema (minus the partition col) so
    // integer-valued fields keep their types
    val landed0 = if (format == "json")
      // re-read with the writer's schema so integer-valued fields keep
      // their types (json inference would widen); the shard partition
      // column is appended automatically
      spark.read.schema(df.schema).format(format).load(s"$outDir/data")
    else spark.read.format(format).load(s"$outDir/data")
    val landed = landed0.withColumn("shard", col("shard").cast("long"))
    val manifest = shardManifest(landed, keyCol, tokenCountCol, salt)
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    spark.read.parquet(s"$outDir/manifest")
  }

  /**
   * Corpus SNAPSHOT DIFF: classify every id across two corpus versions as
   * `added` (only in `newer`), `removed` (only in `older`) or `changed`
   * (present in both, text digest differs) — the audit a versioned
   * training-data pipeline runs between crawls before deciding what to
   * re-process (unchanged ids, the overwhelming bulk, emit NO row).
   *
   * Shape at 100 TB: both sides reduce map-side to (id, sha2-256 digest)
   * — document bodies never enter the join — then one full-outer hash
   * join on the id. Null texts digest to null and compare null-safely
   * (two null texts = unchanged). Output: (idCol, change).
   */
  def corpusDiff(older: DataFrame, newer: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    require(!Set("change", "__d_old", "__d_new", "__in_old", "__in_new")
        .contains(idCol),
      s"idCol '$idCol' collides with a corpusDiff internal/output column — rename it first")
    val o = older.select(col(idCol), sha2(col(textCol), 256).as("__d_old"),
      lit(1).as("__in_old"))
    val n = newer.select(col(idCol), sha2(col(textCol), 256).as("__d_new"),
      lit(1).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__d_old") <=> col("__d_new")), "changed"))
      .filter(col("change").isNotNull)
      .select(col(idCol), col("change"))
  }

  /**
   * Sample each group down to a TOKEN BUDGET decided elsewhere (the
   * execution half of [[unimaxBudgets]]: UniMax decides how many tokens
   * each language may contribute, this gate ships them). `budgets` is a
   * per-group table carrying (groupCol, n_tokens, budget_tokens) — the
   * unimaxBudgets output schema; each group keeps rows whose md5-31 hash
   * clears `floor((budget/n) · 2^31)`, so expected kept tokens ≈ the
   * budget (keep decisions are length-independent) and membership is a
   * pure function of (salt, key) — re-runs, engines, and layouts agree,
   * and a budget increase only ADDS documents (hash-threshold
   * monotonicity: the incremental-sampling property).
   *
   * The rate is `budget/n` — one IEEE-exact double division of two
   * longs ([[temperatureSampleByHash]]'s convention) — computed IN-PLAN
   * from the broadcast budgets table, never a driver map; groups with
   * budget >= n keep everything (rate clamps to 1). A null budget or a
   * non-positive token count gates its group CLOSED (cut 0 — the gate
   * fail-safe convention: a group whose allocation could not be computed
   * must not silently ship in full), and groups absent from `budgets`
   * drop entirely (inner join). `budgets` must be one row per group —
   * the [[unimaxBudgets]] output shape; duplicate group rows would fan
   * out the join.
   *
   * Scale shape: one broadcast join (budgets = groups-sized) + the
   * map-side hash gate; the corpus never shuffles. Output keeps `df`'s
   * column order (the sibling hash gates' pure-filter contract).
   */
  def sampleToBudgets(df: DataFrame, keyCol: String, groupCol: String,
                      budgets: DataFrame, salt: String = "graft"): DataFrame = {
    Seq("n_tokens", "budget_tokens").foreach { c =>
      require(budgets.columns.contains(c),
        s"budgets must carry '$c' (the unimaxBudgets output schema)")
    }
    val cuts = budgets.select(col(groupCol),
      when(col("budget_tokens").isNull || coalesce(col("n_tokens"), lit(0L)) <= 0,
          lit(0L))
        .otherwise(floor(least(lit(1.0),
            col("budget_tokens").cast("double") / col("n_tokens").cast("double"))
          * lit((DedupOps.P31 + 1).toDouble)).cast("long")).as("__cut"))
    df.join(broadcast(cuts), Seq(groupCol))
      .filter(keyHash(col(keyCol), salt) < col("__cut"))
      .select(df.columns.map(col): _*)
  }

  /** The per-source integer virtual-time strides of [[mixtureInterleave]],
    * exposed so an oracle can embed the IDENTICAL literals (the
    * OracleSqlGen shared-constants rule). stride_s = max(1,
    * round(1e6 · W / w_s)) — computed once driver-side; zero/negative
    * weights drop their source. */
  def interleaveStrides(weights: Map[String, Double]): Seq[(String, Long)] = {
    require(weights.nonEmpty, "weights must be non-empty")
    weights.foreach { case (s, w) =>
      require(!w.isNaN && !w.isInfinite, s"weight for '$s' must be finite") }
    val total = weights.values.filter(_ > 0.0).sum
    require(total > 0.0, "at least one weight must be positive")
    weights.toSeq.sortBy(_._1).collect { case (s, w) if w > 0.0 =>
      s -> math.max(1L, math.round(1e6 * total / w))
    }
  }

  /**
   * DETERMINISTIC MIXTURE INTERLEAVE: the loader-order half of mixture
   * sampling — [[resampleToMixture]] decides how MUCH of each source
   * ships; this decides in WHAT ORDER, so a sequential consumer (a
   * trainer streaming shards) sees sources blended at their weights over
   * every window of the stream instead of clumped source-by-source.
   * Each row gets a VIRTUAL TIME `vtime = src_pos · stride(source)`
   * (the leaky-bucket schedule: stride ∝ 1/weight, so per unit vtime
   * source s contributes ∝ w_s rows); `src_pos` is the row's rank within
   * its source under the (md5-31(salt:key), key) order — the
   * [[deterministicShuffle]] permutation per source. Sorting by
   * (vtime, source, src_pos) is therefore a pure integer function of
   * (salt, key, source): any engine, rerun, or layout produces the
   * identical loader order, and a new salt redraws the within-source
   * permutations without touching the blend.
   *
   * Strides are computed ONCE driver-side ([[interleaveStrides]]) and
   * embedded as literals — no float arithmetic crosses engines. Rows
   * from unweighted (or non-positive-weight) sources are excluded, the
   * [[resampleToMixture]] convention.
   *
   * Scale shape: ONE per-source window (rank over ids — bodies ride the
   * projection untouched); the global order is the consumer's
   * range-partitioned sort on the emitted `vtime`, never a
   * single-partition row_number. Bounds: `src_pos · stride < 2^63` —
   * holds through ~1e9 rows/source at weight ratios ≤ 1e3.
   */
  def mixtureInterleave(df: DataFrame, keyCol: String, sourceCol: String,
                        weights: Map[String, Double],
                        salt: String = "graft"): DataFrame = {
    require(!df.columns.contains("src_pos") && !df.columns.contains("vtime"),
      "df must not already carry src_pos / vtime columns")
    val strides = interleaveStrides(weights)
    val strideCol = strides.foldLeft(lit(null).cast("long")) {
      case (acc, (s, st)) => when(col(sourceCol) === s, lit(st)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(keyHash(col(keyCol), salt), col(keyCol))
    df.filter(col(sourceCol).isin(strides.map(_._1): _*))
      .withColumn("src_pos", row_number().over(w).cast("long"))
      .withColumn("vtime", col("src_pos") * strideCol)
  }

  /**
   * LENGTH-BUCKETED BATCHING: group rows into fixed-size batches WITHIN
   * length tiers — the padding-minimization move every tokenize-and-pad
   * training/inference loader applies (batching a 10-token doc with a
   * 4000-token doc pays 3990 pad positions per row; batching within tiers
   * bounds per-row waste by the tier width). Bucket = index of the first
   * boundary strictly greater than the length (lengths >= the last
   * boundary take bucket `boundaries.size`); within a bucket rows order
   * by (md5-31 hash, id) and chunk into `batchSize` batches — batch
   * roster, order, and position are a pure function of (salt, id), so
   * any engine, rerun, or cluster layout loads the identical batches.
   * Null/negative lengths coalesce to 0 (bucket 0).
   *
   * Scale shape: the projection drops bodies BEFORE the one row_number
   * window per bucket partition (ids + lengths sort, the
   * [[deterministicShuffle]] cost class); a hot bucket is one partition —
   * split tiers further if one tier dominates the corpus. Downstream
   * per-batch stats partial-aggregate on (bucket, batch_id).
   *
   * Output: (idCol, len, bucket, batch_id, batch_pos).
   */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: String,
                          boundaries: Seq[Long], batchSize: Int,
                          salt: String = "graft"): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
        boundaries.distinct.size == boundaries.size,
      s"boundaries must be strictly ascending, got $boundaries")
    require(!Set("len", "bucket", "batch_id", "batch_pos").contains(idCol),
      s"idCol '$idCol' collides with a lengthBucketBatches output column")
    import org.apache.spark.sql.expressions.Window
    val len = greatest(coalesce(col(lenCol).cast("long"), lit(0L)), lit(0L))
    val bucket = boundaries.zipWithIndex
      .foldRight(lit(boundaries.size): Column) { case ((b, i), acc) =>
        when(col("len") < b, lit(i)).otherwise(acc)
      }
    val w = Window.partitionBy(col("bucket"))
      .orderBy(keyHash(col(idCol), salt), col(idCol))
    df.select(col(idCol), len.as("len"))
      .withColumn("bucket", bucket)
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(__rn - 1) div $batchSize"))
      .withColumn("batch_pos", pmod(col("__rn") - 1, lit(batchSize)))
      .drop("__rn")
  }

  /**
   * LEAKAGE-FREE train/eval split: assign every document the hash split
   * of its near-dup cluster CANONICAL rather than of its own id, so two
   * near-duplicate documents can never straddle a train/eval boundary —
   * the split-contamination failure mode plain id-keyed splits have on
   * crawled corpora (the same page under two URLs lands in train AND
   * test, inflating eval). `canonicalMap` is the
   * [[graft.ops.DedupOps.canonicalMapping]] output (idCol, canonical_id);
   * docs in no duplicate cluster keep their own id as the split key, so
   * on a dup-free corpus this IS [[hashSplit]].
   *
   * Scale shape: one left equi-join on the id (the map is bounded by
   * duplicate-cluster MEMBERSHIP, typically a small fraction of the
   * corpus — size-based broadcast selection applies; worst case one
   * id-keyed shuffle, the dedup-impact join shape), then the map-side
   * md5-31 split gate on the coalesced key. Membership is a pure
   * function of (salt, canonical id): re-splitting after an incremental
   * re-crawl keeps every surviving cluster in its split.
   */
  def leakageFreeSplit(df: DataFrame, idCol: String, canonicalMap: DataFrame,
                       nSplits: Int, salt: String = "graft"): DataFrame = {
    require(nSplits >= 2, s"nSplits must be >= 2, got $nSplits")
    require(canonicalMap.columns.contains("canonical_id"),
      "canonicalMap must carry a canonical_id column " +
        "(the canonicalMapping output)")
    require(!df.columns.contains("canonical_id") && idCol != "split",
      "df must not already carry canonical_id / idCol must not be 'split'")
    val m = canonicalMap.select(col(idCol), col("canonical_id"))
    df.join(m, Seq(idCol), "left")
      .withColumn("split",
        splitId(coalesce(col("canonical_id"), col(idCol)), nSplits, salt))
      .drop("canonical_id")
  }

  /**
   * UniMax budget allocation (Chung et al., ICLR 2023, arXiv:2304.09151):
   * split a total training budget (tokens/characters) across groups
   * (languages, domains) as UNIFORMLY as possible subject to a per-group
   * repetition cap — every group receives the equal share unless that
   * would repeat its data more than `maxEpochsMicro`/1e6 epochs, in which
   * case it is capped at `cap_i = floor(n_i * maxEpochs)` and the freed
   * budget re-splits among the rest. This is the sampling rule multilingual
   * pretraining uses instead of temperature sampling
   * ([[temperatureSampleByHash]]) when low-resource groups must not be
   * over-epoched.
   *
   * The paper's iterative water-filling has a CLOSED FORM on the
   * (cap, group)-ascending total order: group i (1-based rank) is capped
   * iff `cap_i * (N - i + 1) + Σ_{j<i} cap_j <= B` — the LHS−RHS gap is
   * non-decreasing along the sorted order (caps ascend while the budget
   * shrinks by exactly the granted caps), so the capped groups are a
   * PREFIX and one window pass decides them all. The remaining budget
   * floor-splits among the k uncapped groups; the remainder `R mod k`
   * goes one token each to the first uncapped groups in the same order.
   * Every step is integer arithmetic (the cap is the overflow-safe exact
   * `floor(n*m/1e6) = (n div 1e6)*m + ((n mod 1e6)*m) div 1e6`), so any
   * engine replays the allocation bit-for-bit; the reported `epochs` is
   * one double division of the two integers (IEEE-exact in any engine).
   *
   * Scale shape: `counts` is the PER-GROUP table (one row per language /
   * domain — the user's one corpus-sized agg lives upstream), so the
   * unpartitioned windows here sort thousands of rows on one task, never
   * corpus rows. Zero/negative/null-token groups take no budget and emit
   * no row. Bounds: caps must keep `cap_i * N` inside a long — holds
   * through ~1e13-token groups at 1e5 groups.
   *
   * Output: (groupCol, n_tokens, cap_tokens, is_capped, budget_tokens,
   * epochs).
   */
  def unimaxBudgets(counts: DataFrame, groupCol: String, tokensCol: String,
                    totalBudget: Long, maxEpochsMicro: Long): DataFrame = {
    require(totalBudget >= 0, s"totalBudget must be >= 0, got $totalBudget")
    require(maxEpochsMicro > 0,
      s"maxEpochsMicro must be positive, got $maxEpochsMicro")
    require(!Set("n_tokens", "cap_tokens", "is_capped", "budget_tokens",
        "epochs").contains(groupCol),
      s"groupCol '$groupCol' collides with a unimaxBudgets output column — " +
        "rename it first")
    import org.apache.spark.sql.expressions.Window
    val base = counts
      .select(col(groupCol),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("cap_tokens",
        expr(s"(n_tokens div 1000000) * $maxEpochsMicro + " +
          s"((n_tokens % 1000000) * $maxEpochsMicro) div 1000000"))
    // unpartitioned window is deliberate: `base` has one row per GROUP
    // (language/domain — the unimax budget universe, 10^1-10^4 rows), not
    // per document; the water-filling scan is inherently sequential over
    // the sorted group list
    val asc = Window.orderBy(col("cap_tokens"), col(groupCol))
    val nG = base.agg(count(lit(1)).as("__ng"))
    val flagged = base
      .withColumn("__i", row_number().over(asc))
      .withColumn("__pre", coalesce(sum(col("cap_tokens")).over(
        asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(nG)) // one-row aggregate broadcast
      .withColumn("is_capped",
        col("cap_tokens") * (col("__ng") - col("__i") + 1) + col("__pre") <=
          lit(totalBudget))
      // rank among the uncapped, same total order (remainder distribution)
      .withColumn("__ur", sum(when(col("is_capped"), 0L).otherwise(1L))
        .over(asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val stats = flagged.agg(
      coalesce(sum(when(col("is_capped"), col("cap_tokens"))), lit(0L))
        .as("__capped_sum"),
      sum(when(col("is_capped"), 0L).otherwise(1L)).as("__k"))
    flagged.crossJoin(broadcast(stats)) // one-row aggregate broadcast
      .withColumn("__r", lit(totalBudget) - col("__capped_sum"))
      .withColumn("budget_tokens",
        when(col("is_capped"), col("cap_tokens"))
          // the otherwise-branch only evaluates on uncapped rows => __k >= 1
          .otherwise(expr("__r div __k") +
            when(col("__ur") <= expr("__r % __k"), lit(1L)).otherwise(lit(0L))))
      .withColumn("epochs",
        col("budget_tokens").cast("double") / col("n_tokens").cast("double"))
      .select(col(groupCol), col("n_tokens"), col("cap_tokens"),
        col("is_capped"), col("budget_tokens"), col("epochs"))
  }
}
