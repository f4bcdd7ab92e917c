package graft

import graft.ops.{DedupOps, SimOps}

/**
 * Generators for the DuckDB oracle SQL of queries whose constants (TEOS-10
 * polynomial coefficients, LSH hyperplanes, convolution kernels, MinHash
 * permutation parameters) live in Scala: the SQL is built from the SAME
 * values the Spark-side operators use, so both engines compute bit-identical
 * arithmetic. `java.lang.Double.toString` literals round-trip exactly
 * (shortest-repr doubles parse back to the same bits in DuckDB).
 */
object OracleSqlGen {

  private def d(x: Double): String = {
    val s = java.lang.Double.toString(x)
    // DuckDB parses 1.0E-5 fine; keep as-is
    s
  }

  // --- sigma0 75-term polynomial (p = 0 slice), transliterated from
  // graft.gsw.Gsw.sigma0 with IDENTICAL association order ------------------

  /** SQL expression for sigma0 given column/expr names for xs and ys
    * (xs = sqrt(SFac*SA + Offset), ys = CT*0.025, computed by the caller). */
  def sigma0PolySql(xs: String, ys: String): String =
    s"""(1.0/(
       |1.0769995862e-03 + $xs*(-3.1038981976e-04 + $xs*(6.6928067038e-04 +
       |  $xs*(-8.5047933937e-04 + $xs*(5.8086069943e-04 + $xs*(-2.1092370507e-04 +
       |  $xs*3.1932457305e-05))))) +
       |$ys*(-1.5649734675e-05 + $xs*(3.5009599764e-05 + $xs*(-4.3592678561e-05 +
       |  $xs*(3.4532461828e-05 + $xs*(-1.1959409788e-05 + $xs*1.3864594581e-06)))) +
       |$ys*(2.7762106484e-05 + $xs*(-3.7435842344e-05 + $xs*(3.5907822760e-05 +
       |  $xs*(-1.8698584187e-05 + $xs*3.8595339244e-06))) +
       |$ys*(-1.6521159259e-05 + $xs*(2.4141479483e-05 + $xs*(-1.4353633048e-05 +
       |  $xs*2.2863324556e-06)) +
       |$ys*(6.9111322702e-06 + $xs*(-8.7595873154e-06 + $xs*4.3703680598e-06) +
       |$ys*(-8.0539615540e-07 + $xs*(-3.3052758900e-07) + $ys*2.0543094268e-07)))))
       |) - 1000.0)""".stripMargin

  private val SFacSql   = "0.0248826675584615"
  private val OffsetSql = "5.971840214030754e-1"

  def xsSql(sa: String): String = s"sqrt($SFacSql*($sa) + $OffsetSql)"
  def ysSql(ct: String): String = s"(($ct)*0.025)"

  /** q36: barrier-layer mask over events stand-ins (mirrors
    * Extras.barrierLayerMask exactly, sigma0 inlined as the polynomial). */
  def barrierLayerSql: String =
    s"""WITH base AS (
       |  SELECT user_id u, event_id i,
       |         value/4.0 + 20.0 AS sa, 30.0 - value/10.0 AS ct
       |  FROM events
       |), w AS (
       |  SELECT u, i, sa, ct,
       |    first_value(ct) OVER wa AS ct0,
       |    first_value(sa) OVER wa AS sa0
       |  FROM base
       |  WINDOW wa AS (PARTITION BY u ORDER BY i
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |), m AS (
       |  SELECT *, last_value(CASE WHEN (ct0 - ct) < 0.5 THEN ct END IGNORE NULLS)
       |    OVER (PARTITION BY u ORDER BY i
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ct_mld
       |  FROM w
       |), pre AS (
       |  SELECT u, i,
       |    ${xsSql("sa")} AS xs1, ${ysSql("ct")} AS ys1,
       |    ${xsSql("sa0")} AS xs2, ${ysSql("ct_mld")} AS ys2
       |  FROM m
       |), sig AS (
       |  SELECT u, i,
       |    ${sigma0PolySql("xs1", "ys1")} AS s0,
       |    ${sigma0PolySql("xs2", "ys2")} AS s_bot
       |  FROM pre
       |), sig2 AS (
       |  SELECT *, first_value(s0) OVER (PARTITION BY u ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS s_sfc
       |  FROM sig
       |)
       |SELECT u AS user_id, i AS event_id, round(s0, 6) AS sigma_theta,
       |       (s0 - s_bot) < (s_sfc - s_bot) AS blt_mask
       |FROM sig2 ORDER BY user_id, event_id""".stripMargin

  // --- LSH sign sketches with the planes embedded as literals -------------

  private def planeLiteral(p: Array[Double]): String =
    p.map(d).mkString("[", ", ", "]::DOUBLE[]")

  /** VALUES rows (bit, plane) for the hyperplane set. */
  private def planesValues(planes: Array[Array[Double]]): String =
    planes.zipWithIndex
      .map { case (p, i) => s"($i, ${planeLiteral(p)})" }
      .mkString(",\n    ")

  /** Sign-sketch bucket as DuckDB SQL (same bit convention as
    * SimOps.signSketch: bit b set iff dot(v, plane_b) >= 0). `band` adds a
    * constant band-id column so the banded oracle reuses the SAME
    * sign-convention-critical snippet rather than a diverging copy. */
  private def bucketSql(planes: Array[Array[Double]], band: Option[Int] = None): String = {
    val bandCol = band.map(b => s"$b AS band, ").getOrElse("")
    s"""SELECT vec_id, ${bandCol}sum(CASE WHEN list_inner_product(v, p.plane) >= 0
       |      THEN (1::BIGINT << p.b) ELSE 0 END)::BIGINT AS bucket
       |    FROM e CROSS JOIN (VALUES
       |    ${planesValues(planes)}) p(b, plane)
       |    GROUP BY vec_id""".stripMargin
  }

  /** Rounded cosine between `$a.v` and `$b.v` — alias-parameterized so
    * every oracle shares one arithmetic definition. */
  private def cosineSqlFor(a: String, b: String): String =
    s"""round(CASE WHEN sqrt(list_inner_product($a.v, $a.v))
       |            * sqrt(list_inner_product($b.v, $b.v)) > 0
       |  THEN list_inner_product($a.v, $b.v)
       |       / (sqrt(list_inner_product($a.v, $a.v))
       |          * sqrt(list_inner_product($b.v, $b.v)))
       |  ELSE 0.0 END, 6)""".stripMargin

  private val cosineSql = cosineSqlFor("a", "b")

  /** Shared CTE body for the q91/q92 random projection: `(vec_id, j, ip)`
    * rows via cross join against the literal pre-scaled rows, exactly the
    * left-to-right fold MatProjectExpr performs. */
  private def projRowsSql(outDim: Int, dim: Int): String = {
    val rows = SimOps.projectionMatrix(outDim, dim, 42L)
    // NOTE: DuckDB's double summation (list_inner_product, long `+`
    // chains, list_reduce alike) is vectorized and can differ ±1 ulp from
    // a strict left-to-right fold — consumers must quantize or rank,
    // never compare the raw doubles (q91 learned this at sf0.1).
    s"""SELECT e.vec_id, r.j, list_inner_product(e.v, r.row) AS ip
       |  FROM e CROSS JOIN (VALUES
       |    ${planesValues(rows)}) r(j, row)""".stripMargin
  }

  /** q91: random-projection (JL) dim reduction, exploded to
    * (vec_id, dim, proj_micro). Micro-quantized, NOT raw doubles: DuckDB
    * evaluates double summation with vectorized kernels that drift ±1 ulp
    * from MatProjectExpr's strict left-to-right loop (verified against
    * list_inner_product, an explicit left-associated term chain, AND
    * list_reduce — all three return the same vectorized result), so the
    * engine-portable contract is the micro-unit integer, same as the
    * PMI/A-ES scores. */
  def randomProjectionSql(outDim: Int, dim: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |)
       |SELECT vec_id, j AS dim,
       |  CAST(floor(ip * 1000000 + 0.5) AS BIGINT) AS proj_micro
       |FROM (${projRowsSql(outDim, dim)})
       |ORDER BY vec_id, dim""".stripMargin

  /** q92: exact cosine top-k in the PROJECTED space (queries vec_id < 20,
    * k = 5) — the reduced-dimension ANN path, oracle-exact end to end. */
  def annProjectedSql(outDim: Int, dim: Int, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), proj AS (
       |  SELECT vec_id, list(ip ORDER BY j) AS v
       |  FROM (${projRowsSql(outDim, dim)})
       |  GROUP BY vec_id
       |), scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $cosineSql AS cos_sim
       |  FROM proj a JOIN proj b ON b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 20
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** q30: LSH-bucketed approximate top-k (6 planes, dim 64, seed 42 — the
    * exact planes SimOps generates; queries = vec_id < 20, k = 5). */
  def annLshSql: String = {
    val planes = SimOps.hyperplanes(6, 64, 42L)
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sk AS (
       |    ${bucketSql(planes)}
       |), c AS (
       |  SELECT e.vec_id, e.v, sk.bucket FROM e JOIN sk USING (vec_id)
       |), scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    $cosineSql AS cos_sim
       |  FROM c a JOIN c b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
       |  WHERE a.vec_id < 20
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** q40: embedding near-dup pairs over corpus + exact copies of the first
    * 20 vectors (8 planes, dim 64, seed 42; threshold 0.98). */
  def embeddingNearDupSql: String = {
    val planes = SimOps.hyperplanes(8, 64, 42L)
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM read_parquet_union
       |), sk AS (
       |    ${bucketSql(planes)}
       |), c AS (
       |  SELECT e.vec_id, e.v, sk.bucket FROM e JOIN sk USING (vec_id)
       |), pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    $cosineSql AS cos_sim
       |  FROM c a JOIN c b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT id_a, id_b, cos_sim FROM pairs
       |WHERE cos_sim >= 0.98 ORDER BY id_a, id_b"""
      .stripMargin
      .replace("FROM read_parquet_union",
        """FROM (SELECT vec_id, embedding FROM embeddings
          |        UNION ALL
          |        SELECT vec_id + 1000000 AS vec_id, embedding
          |        FROM embeddings WHERE vec_id < 20)""".stripMargin)
  }

  /**
   * q59: the BANDED embedding near-dup scale path (VERDICT r5 #1) under the
   * same corpus+planted-copies setup as q40 — candidates are the UNION of
   * per-band bucket collisions, deduplicated, then cosine-verified. Band b's
   * plane set derives from seed 42+b, exactly as
   * `SimOps.embeddingNearDupPairs(bands = n)` computes it, so the result is
   * bit-exact oracle-checkable even on the multi-band path.
   */
  def embeddingNearDupBandedSql(bands: Int, nPlanes: Int): String = {
    val perBand = (0 until bands).map { b =>
      "  " + bucketSql(SimOps.hyperplanes(nPlanes, 64, 42L + b), band = Some(b))
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM read_parquet_union
       |), sk AS (
       |$perBand
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM sk a JOIN sk b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |), pairs AS (
       |  SELECT id_a, id_b,
       |    ${cosineSqlFor("ea", "eb")} AS cos_sim
       |  FROM cand
       |  JOIN e ea ON ea.vec_id = cand.id_a
       |  JOIN e eb ON eb.vec_id = cand.id_b
       |)
       |SELECT id_a, id_b, cos_sim FROM pairs
       |WHERE cos_sim >= 0.98 ORDER BY id_a, id_b"""
      .stripMargin
      .replace("FROM read_parquet_union",
        """FROM (SELECT vec_id, embedding FROM embeddings
          |        UNION ALL
          |        SELECT vec_id + 1000000 AS vec_id, embedding
          |        FROM embeddings WHERE vec_id < 20)""".stripMargin)
  }

  /**
   * q63: the banded ANN top-k scale path — candidates are the DISTINCT
   * union of per-band bucket collisions (band b's planes from seed 42+b,
   * matching `SimOps.lshCosineTopK(bands = n)`), then ranked by the shared
   * cosine definition.
   */
  def annLshBandedSql(bands: Int, nPlanes: Int, k: Int): String = {
    val perBand = (0 until bands).map { b =>
      "  " + bucketSql(SimOps.hyperplanes(nPlanes, 64, 42L + b), band = Some(b))
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), sk AS (
       |$perBand
       |), cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sk q JOIN sk c
       |    ON q.band = c.band AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20
       |), scored AS (
       |  SELECT query_id, neighbor_id, ${cosineSqlFor("a", "b")} AS cos_sim
       |  FROM cand
       |  JOIN e a ON a.vec_id = cand.query_id
       |  JOIN e b ON b.vec_id = cand.neighbor_id
       |), ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, neighbor_id, cos_sim FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /**
   * q164: banded margin-mutual mining — the q129 mutual+margin tail
   * computed over banded-LSH candidates instead of the cross product
   * (band b's planes from seed 42+b, matching
   * `SimOps.marginMutualMatchesBanded`). Left = even vec_ids, right =
   * odd; neighborhood sums/ranks run over the CANDIDATE set, exactly as
   * the engine's shared tail does.
   */
  def marginBandedSql(bands: Int, nPlanes: Int, k: Int,
                      minMarginMicro: Long): String = {
    val perBand = (0 until bands).map { b =>
      "  " + bucketSql(SimOps.hyperplanes(nPlanes, 64, 42L + b), band = Some(b))
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings WHERE embedding IS NOT NULL
       |), sk AS (
       |$perBand
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS tgt_id
       |  FROM sk a JOIN sk b ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
       |), p AS (
       |  SELECT cd.src_id, cd.tgt_id,
       |    (CASE WHEN sqrt(list_inner_product(l.v, l.v))
       |               * sqrt(list_inner_product(r.v, r.v)) > 0
       |      THEN list_inner_product(l.v, r.v)
       |           / (sqrt(list_inner_product(l.v, l.v))
       |              * sqrt(list_inner_product(r.v, r.v)))
       |      ELSE 0.0 END) AS c
       |  FROM cand cd
       |  JOIN e l ON l.vec_id = cd.src_id
       |  JOIN e r ON r.vec_id = cd.tgt_id
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
       |  FROM ranked WHERE rf <= $k GROUP BY src_id
       |), sr AS (
       |  SELECT tgt_id, CAST(sum(cm) AS BIGINT) AS s_r,
       |    CAST(count(*) AS BIGINT) AS n_r
       |  FROM ranked WHERE rb <= $k GROUP BY tgt_id
       |), m AS (
       |  SELECT kk.src_id, kk.tgt_id, kk.cm AS cos_micro,
       |    CASE WHEN (s_l * n_r + s_r * n_l) > 0
       |      THEN CAST((kk.cm * 2 * n_l * n_r * 1000000)
       |                // (s_l * n_r + s_r * n_l) AS BIGINT)
       |      ELSE 0 END AS margin_micro
       |  FROM ranked kk JOIN sl USING (src_id) JOIN sr USING (tgt_id)
       |  WHERE kk.rf = 1 AND kk.rb = 1
       |)
       |SELECT src_id, tgt_id, cos_micro, margin_micro
       |FROM m WHERE margin_micro >= $minMarginMicro
       |ORDER BY src_id, tgt_id""".stripMargin
  }

  // --- lp_filter: Butterworth filtfilt as recursive-CTE recurrences -------

  /**
   * q22: zero-phase Butterworth low-pass (`SeqOps.lpFilter` defaults:
   * sampleRate 24, timeConstant 0.15). The filter taps and `lfilter_zi`
   * steady-state come from the SAME Scala code the kernel uses, embedded as
   * literals; each lfilter pass is a DuckDB recursive CTE carrying the
   * direct-form-II-transposed state (z0, z1) — one row per cast per
   * iteration, recursion depth = padded cast length (~n + 18), identical
   * arithmetic order to FiltFilt.lfilter, so doubles are bit-exact.
   *
   * Odd-extension padding, the zi*x0 initial state, and the reverse pass all
   * mirror FiltFilt.filtfilt (padlen = min(9, n-1)); n = 1 casts pass
   * through unchanged, n = 0 impossible (group exists only with rows).
   */
  def lpFilterSql: String = {
    val wn     = (1.0 / 0.15) / (24.0 * 2.0)
    val (b, a) = graft.dsp.Butterworth.butter2LowPass(wn)
    val zi     = graft.dsp.FiltFilt.lfilterZi(b, a)
    val (b0, b1, b2) = (d(b(0)), d(b(1)), d(b(2)))
    val (a1, a2)     = (d(a(1)), d(a(2)))
    val (zi0, zi1)   = (d(zi(0)), d(zi(1)))

    /** One lfilter pass over list column `src` of CTE `in`, emitting CTE
      * `out(u, k, y)` 1-based. `in` must provide (u, $src, m). */
    def pass(in: String, src: String, out: String): String =
      s"""$out AS (
         |  SELECT u, 1 AS k, $src, m, yi,
         |         $b1*xi - $a1*yi + z1i AS z0,
         |         $b2*xi - $a2*yi AS z1
         |  FROM (
         |    SELECT u, $src, m, $src[1] AS xi,
         |           $b0*$src[1] + $zi0*$src[1] AS yi,
         |           $zi1*$src[1] AS z1i
         |    FROM $in
         |  )
         |  UNION ALL
         |  SELECT u, k+1, $src, m, yi,
         |         $b1*xi - $a1*yi + z1 AS z0,
         |         $b2*xi - $a2*yi AS z1
         |  FROM (
         |    SELECT u, k, $src, m, $src[k+1] AS xi,
         |           $b0*$src[k+1] + z0 AS yi, z1
         |    FROM $out WHERE k < m
         |  )
         |)""".stripMargin

    s"""WITH RECURSIVE s AS (
       |  SELECT user_id u, event_id i, value x FROM events
       |), arr AS (
       |  SELECT u, list(x ORDER BY i) AS a, list(i ORDER BY i) AS ids,
       |         count(*)::INT AS n
       |  FROM s GROUP BY u
       |), ext AS (
       |  -- odd extension by e = min(9, n-1) on both ends
       |  SELECT u, ids, n, e,
       |    list_concat(list_concat(
       |      list_transform(range(1, e + 1), j -> 2.0*a[1] - a[e - j + 2]),
       |      a),
       |      list_transform(range(1, e + 1), j -> 2.0*a[n] - a[n - j])) AS xe,
       |    n + 2*e AS m
       |  FROM (SELECT *, least(9, n - 1) AS e FROM arr WHERE n >= 2)
       |), ${pass("ext", "xe", "f")},
       |fwd AS (
       |  SELECT u, list(yi ORDER BY k) AS yf, any_value(m) AS m FROM f GROUP BY u
       |), rev AS (
       |  SELECT u, list_transform(range(1, m + 1), j -> yf[m - j + 1]) AS xr, m
       |  FROM fwd
       |), ${pass("rev", "xr", "g")},
       |bwd AS (
       |  SELECT u, list(yi ORDER BY k) AS yb, any_value(m) AS m FROM g GROUP BY u
       |), outp AS (
       |  SELECT u, list_transform(range(1, m + 1), j -> yb[m - j + 1]) AS yo
       |  FROM bwd
       |), sliced AS (
       |  SELECT ext.u, ext.ids,
       |    list_transform(range(1, ext.n + 1), kk -> outp.yo[ext.e + kk]) AS yv
       |  FROM ext JOIN outp ON ext.u = outp.u
       |  UNION ALL
       |  SELECT u, ids, a AS yv FROM arr WHERE n = 1
       |)
       |SELECT u AS user_id, unnest(ids) AS event_id,
       |       round(unnest(yv), 6) AS value_lp
       |FROM sliced ORDER BY user_id, event_id""".stripMargin
  }

  // --- MinHash + banded LSH, md5-based (engine-portable) ------------------

  /** The q25/q26 corpus: documents plus perturbed copies of the first 50. */
  private val corpusSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text || ' perturbed tail token' AS text
      |  FROM documents WHERE doc_id < 50
      |)""".stripMargin

  /** Shared CTE chain: shingles -> md5-31 hashes -> k minhashes -> band keys
    * -> candidate pairs -> exact jaccard. Mirrors DedupOps exactly:
    * permutation constants and the band fold are the same values/order. */
  private def minhashChain(numHashes: Int, bands: Int, shingleSize: Int): String = {
    require(shingleSize == 3, "oracle SQL is written for 3-gram shingles")
    val perms = DedupOps.permConstants(numHashes)
    val permValues = perms.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
      .mkString(", ")
    val r = numHashes / bands
    val bandFold = (2 to r).foldLeft("bm[1]") { (acc, j) =>
      s"(($acc)*31 + bm[$j]) % 2147483647"
    }
    s"""tok AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
       |  FROM corpus
       |), sh AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1),
       |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |      ELSE [array_to_string(t, ' ')] END) AS s
       |  FROM tok
       |), shx AS (
       |  SELECT doc_id, unnest(s) AS sg FROM sh
       |), h AS (
       |  SELECT doc_id,
       |    (('0x' || substr(md5(sg), 1, 16))::UBIGINT & 2147483647::UBIGINT)::BIGINT AS h31
       |  FROM shx
       |), mh AS (
       |  SELECT doc_id, p.i, min((p.a * h31 + p.b) % 2147483647) AS m
       |  FROM h CROSS JOIN (VALUES $permValues) p(i, a, b)
       |  GROUP BY doc_id, p.i
       |), bandarr AS (
       |  SELECT doc_id, i // $r AS band_id, list(m ORDER BY i) AS bm
       |  FROM mh GROUP BY doc_id, i // $r
       |), bandk AS (
       |  -- hot-bucket cap (maxBucket = 100), mirroring the Spark-side guard
       |  SELECT doc_id, band_id, $bandFold AS bk FROM bandarr
       |  QUALIFY count(*) OVER (PARTITION BY band_id, $bandFold) <= 100
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandk a JOIN bandk b
       |    ON a.band_id = b.band_id AND a.bk = b.bk AND a.doc_id < b.doc_id
       |), jac AS (
       |  SELECT id_a, id_b,
       |    round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
       |      THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |           / len(list_distinct(list_concat(sa.s, sb.s)))
       |      ELSE 0.0 END, 6) AS jaccard
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = id_a
       |  JOIN sh sb ON sb.doc_id = id_b
       |)""".stripMargin
  }

  /** q74: incremental near-dedup of an ingest slice against the landed
    * corpus (k=64, 16 bands, threshold 0.5, no bucket cap). Replays the
    * two-sided chain: shingle + minhash + band keys on BOTH sides, band
    * equi-join for candidates, exact Jaccard verify, then anti-join. The
    * landed side keys by its own doc_id here — the Spark side's internal
    * xxhash64(text) identity is existence-equivalent (no cap in play). */
  /** One side of the asymmetric two-sided chain: shingles → minhash → band
    * keys over CTE source `src`, every CTE name prefixed `name` (no bucket
    * cap — the against paths run uncapped). */
  private def againstSide(name: String, src: String,
                          numHashes: Int, bands: Int): String = {
    val perms = DedupOps.permConstants(numHashes)
    val permValues = perms.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}, ${b})" }
      .mkString(", ")
    val r = numHashes / bands
    val bandFold = (2 to r).foldLeft("bm[1]") { (acc, j) =>
      s"(($acc)*31 + bm[$j]) % 2147483647"
    }
    s"""${name}tok AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
         |  FROM $src
         |), ${name}sh AS (
         |  SELECT doc_id,
         |    list_distinct(CASE WHEN len(t) >= 3
         |      THEN list_transform(range(1, len(t) - 1),
         |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
         |      ELSE [array_to_string(t, ' ')] END) AS s
         |  FROM ${name}tok
         |), ${name}h AS (
         |  SELECT doc_id,
         |    (('0x' || substr(md5(sg), 1, 16))::UBIGINT & 2147483647::UBIGINT)::BIGINT AS h31
         |  FROM (SELECT doc_id, unnest(s) AS sg FROM ${name}sh)
         |), ${name}mh AS (
         |  SELECT doc_id, p.i, min((p.a * h31 + p.b) % 2147483647) AS m
         |  FROM ${name}h CROSS JOIN (VALUES $permValues) p(i, a, b)
         |  GROUP BY doc_id, p.i
         |), ${name}bandk AS (
         |  SELECT doc_id, band_id, $bandFold AS bk FROM (
         |    SELECT doc_id, i // $r AS band_id, list(m ORDER BY i) AS bm
         |    FROM ${name}mh GROUP BY doc_id, i // $r)
         |)""".stripMargin
  }

  /** Exact-Jaccard verify of an asymmetric candidate set: ids of `candCte`
    * rows (iid, rid) whose shingle sets (from `incShCte` / `refShCte`) meet
    * `threshold` — the CTE pair (cand→jac) shared by every against-style
    * oracle. */
  private def againstJac(candCte: String, incShCte: String,
                         refShCte: String): String =
    s"""  SELECT iid,
       |    round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
       |      THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |           / len(list_distinct(list_concat(sa.s, sb.s)))
       |      ELSE 0.0 END, 6) AS jaccard
       |  FROM $candCte
       |  JOIN $incShCte sa ON sa.doc_id = iid
       |  JOIN $refShCte sb ON sb.doc_id = rid""".stripMargin

  def nearDedupAgainstSql(numHashes: Int, bands: Int): String =
    s"""WITH ref AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
       |), inc AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 <> 0 AND doc_id < 50
       |), ${againstSide("i", "inc", numHashes, bands)},
       |${againstSide("r", "ref", numHashes, bands)},
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS iid, r.doc_id AS rid
       |  FROM ibandk i JOIN rbandk r ON i.band_id = r.band_id AND i.bk = r.bk
       |), jac AS (
       |${againstJac("cand", "ish", "rsh")}
       |)
       |SELECT doc_id FROM inc
       |WHERE doc_id NOT IN (SELECT iid FROM jac WHERE jaccard >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** q78: TWO-day incremental ingest against a maintained index. Day 1
    * dedups the `%5 = 0` slice against the landed corpus and folds the
    * survivors back into the index ([[graft.ops.DedupOps
    * .appendNearDupIndex]]); day 2's probe then carries perturbed copies of
    * day-1 docs (caught ONLY because of the append), perturbed copies of
    * the original corpus (caught by the day-0 index), and vowel-rotated
    * novel texts (survivors). The oracle replays both passes: the day-2
    * reference side is ref ∪ day-1 survivors, band keys and shingles
    * reused from the already-computed day-1 side CTEs. */
  def nearDedupIndexAppendSql(numHashes: Int, bands: Int): String =
    s"""WITH ref AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
       |), inc1 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
       |), inc2 AS (
       |  SELECT doc_id + 3000000 AS doc_id, text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 250
       |  UNION ALL
       |  SELECT doc_id + 4000000 AS doc_id, text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 <> 0 AND doc_id < 50
       |  UNION ALL
       |  SELECT doc_id + 5000000 AS doc_id, translate(text, 'aeiou', 'xyzvw') AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 100
       |), ${againstSide("r", "ref", numHashes, bands)},
       |${againstSide("i", "inc1", numHashes, bands)},
       |${againstSide("j", "inc2", numHashes, bands)},
       |cand1 AS (
       |  SELECT DISTINCT i.doc_id AS iid, r.doc_id AS rid
       |  FROM ibandk i JOIN rbandk r ON i.band_id = r.band_id AND i.bk = r.bk
       |), jac1 AS (
       |${againstJac("cand1", "ish", "rsh")}
       |), surv1 AS (
       |  SELECT doc_id FROM inc1
       |  WHERE doc_id NOT IN (SELECT iid FROM jac1 WHERE jaccard >= 0.5)
       |), r2bandk AS (
       |  SELECT * FROM rbandk
       |  UNION ALL
       |  SELECT * FROM ibandk WHERE doc_id IN (SELECT doc_id FROM surv1)
       |), r2sh AS (
       |  SELECT * FROM rsh
       |  UNION ALL
       |  SELECT * FROM ish WHERE doc_id IN (SELECT doc_id FROM surv1)
       |), cand2 AS (
       |  SELECT DISTINCT j.doc_id AS iid, r.doc_id AS rid
       |  FROM jbandk j JOIN r2bandk r ON j.band_id = r.band_id AND j.bk = r.bk
       |), jac2 AS (
       |${againstJac("cand2", "jsh", "r2sh")}
       |)
       |SELECT doc_id FROM inc2
       |WHERE doc_id NOT IN (SELECT iid FROM jac2 WHERE jaccard >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** q143: the STREAMING ingest composite
    * (`StreamOps.dedupAgainstIndexBatch`) replayed as a batch chain — two
    * micro-batches through within-batch near-dedup → index probe → append.
    * Replays, per batch: (1) the in-batch pairwise drop (id_a < id_b,
    * drop id_b — the q26 rule) over the batch's own band keys, (2) the
    * probe of the SURVIVORS against the reference side, (3) the append
    * (batch-2's reference = ref ∪ batch-1 accepted, the q78 move). Output
    * is (batch_id, doc_id) of accepted rows per batch. */
  def streamIngestReplaySql(numHashes: Int, bands: Int): String =
    s"""WITH ref AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
       |), b1 AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0 AND doc_id < 300
       |  UNION ALL
       |  SELECT doc_id + 6000000 AS doc_id, text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 40
       |), b2 AS (
       |  SELECT doc_id + 7000000 AS doc_id, text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 100
       |  UNION ALL
       |  SELECT doc_id + 8000000 AS doc_id, translate(text, 'aeiou', 'xyzvw') AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id >= 100 AND doc_id < 200
       |  UNION ALL
       |  SELECT doc_id + 9000000 AS doc_id, translate(text, 'aeiou', 'xyzvw') AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id >= 200 AND doc_id < 240
       |  UNION ALL
       |  SELECT doc_id + 9100000 AS doc_id,
       |    translate(text, 'aeiou', 'xyzvw') || ' extra tail token' AS text
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id >= 200 AND doc_id < 240
       |), ${againstSide("r", "ref", numHashes, bands)},
       |${againstSide("a", "b1", numHashes, bands)},
       |${againstSide("b", "b2", numHashes, bands)},
       |w1 AS (
       |  SELECT DISTINCT y.doc_id AS iid, x.doc_id AS rid
       |  FROM abandk x JOIN abandk y
       |    ON x.band_id = y.band_id AND x.bk = y.bk AND x.doc_id < y.doc_id
       |), wj1 AS (
       |${againstJac("w1", "ash", "ash")}
       |), s1 AS (
       |  SELECT doc_id FROM b1
       |  WHERE doc_id NOT IN (SELECT iid FROM wj1 WHERE jaccard >= 0.5)
       |), c1 AS (
       |  SELECT DISTINCT a.doc_id AS iid, r.doc_id AS rid
       |  FROM abandk a JOIN rbandk r ON a.band_id = r.band_id AND a.bk = r.bk
       |  WHERE a.doc_id IN (SELECT doc_id FROM s1)
       |), pj1 AS (
       |${againstJac("c1", "ash", "rsh")}
       |), acc1 AS (
       |  SELECT doc_id FROM s1
       |  WHERE doc_id NOT IN (SELECT iid FROM pj1 WHERE jaccard >= 0.5)
       |), r2bandk AS (
       |  SELECT * FROM rbandk
       |  UNION ALL
       |  SELECT * FROM abandk WHERE doc_id IN (SELECT doc_id FROM acc1)
       |), r2sh AS (
       |  SELECT * FROM rsh
       |  UNION ALL
       |  SELECT * FROM ash WHERE doc_id IN (SELECT doc_id FROM acc1)
       |), w2 AS (
       |  SELECT DISTINCT y.doc_id AS iid, x.doc_id AS rid
       |  FROM bbandk x JOIN bbandk y
       |    ON x.band_id = y.band_id AND x.bk = y.bk AND x.doc_id < y.doc_id
       |), wj2 AS (
       |${againstJac("w2", "bsh", "bsh")}
       |), s2 AS (
       |  SELECT doc_id FROM b2
       |  WHERE doc_id NOT IN (SELECT iid FROM wj2 WHERE jaccard >= 0.5)
       |), c2 AS (
       |  SELECT DISTINCT b.doc_id AS iid, r.doc_id AS rid
       |  FROM bbandk b JOIN r2bandk r ON b.band_id = r.band_id AND b.bk = r.bk
       |  WHERE b.doc_id IN (SELECT doc_id FROM s2)
       |), pj2 AS (
       |${againstJac("c2", "bsh", "r2sh")}
       |), acc2 AS (
       |  SELECT doc_id FROM s2
       |  WHERE doc_id NOT IN (SELECT iid FROM pj2 WHERE jaccard >= 0.5)
       |)
       |SELECT CAST(0 AS BIGINT) AS batch_id, doc_id FROM acc1
       |UNION ALL
       |SELECT CAST(1 AS BIGINT) AS batch_id, doc_id FROM acc2
       |ORDER BY batch_id, doc_id""".stripMargin

  /** q150: the against-index MATCH EXPLANATION — per probe doc, how many
    * distinct landed documents it near-duplicates (text-keyed identity:
    * md5(text), mirroring the index's xxhash64(text) dedup of landed
    * copies) and the best Jaccard. Unmatched probes emit no row. */
  def nearDupMatchesSql(numHashes: Int, bands: Int): String =
    s"""WITH ref AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 5 <> 0 AND doc_id < 300
       |), inc AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' perturbed tail token' AS text
       |  FROM documents WHERE doc_id % 5 <> 0 AND doc_id < 50
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
       |  WHERE doc_id % 5 <> 0 AND doc_id >= 100 AND doc_id < 110
       |  UNION ALL
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % 5 = 0 AND doc_id < 100
       |), ${againstSide("i", "inc", numHashes, bands)},
       |${againstSide("r", "ref", numHashes, bands)},
       |cand AS (
       |  SELECT DISTINCT i.doc_id AS iid, r.doc_id AS rid
       |  FROM ibandk i JOIN rbandk r ON i.band_id = r.band_id AND i.bk = r.bk
       |), jac AS (
       |  SELECT iid, rid,
       |    round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
       |      THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |           / len(list_distinct(list_concat(sa.s, sb.s)))
       |      ELSE 0.0 END, 6) AS jaccard
       |  FROM cand
       |  JOIN ish sa ON sa.doc_id = iid
       |  JOIN rsh sb ON sb.doc_id = rid
       |), m AS (
       |  SELECT iid, rid, jaccard FROM jac WHERE jaccard >= 0.5
       |), rtid AS (
       |  SELECT doc_id, md5(text) AS tid FROM ref
       |)
       |SELECT m.iid AS doc_id,
       |  CAST(count(DISTINCT r.tid) AS BIGINT) AS n_matched_refs,
       |  max(m.jaccard) AS best_jaccard
       |FROM m JOIN rtid r ON r.doc_id = m.rid
       |GROUP BY m.iid ORDER BY doc_id""".stripMargin

  /** The CDC sliding-window walk as recursive-CTE SQL: consumes a
    * `corp(doc_id, text)` CTE already in scope, emits a `hashed(doc_id,
    * clen, ch)` CTE — one row per chunk with its code-point length and
    * md5-31 content hash. Replays `graftdedup.GraftCdcKernel` exactly:
    * sliding `windowLen`-code-point polynomial hash mod 2^31 (eviction
    * constant 31^windowLen mod 2^31 computed here from the same rule;
    * two's-complement `&` makes the eviction subtraction exact on both
    * engines), cut at len >= minLen with low maskBits zero, forced cut at
    * maxLen, final partial chunk closes at text end. Shared by the
    * q148/q149 oracles so the recurrence lives in one place.
    * `windowLen` must match the kernel call being replayed (default 16,
    * the engine default) — the eviction offset and 31^W constant are
    * derived from it, so a mismatched window silently diverges. */
  def cdcWalkCtes(minLen: Int, maskBits: Int, maxLen: Int,
                  windowLen: Int = 16): String = {
    val mask = (1 << maskBits) - 1
    require(windowLen >= 1, s"cdcWalkCtes: windowLen >= 1, got $windowLen")
    val pow = (1 to windowLen).foldLeft(1L)((a, _) => (a * 31L) & 0x7fffffffL)
    s"""walk AS (
       |  SELECT doc_id, text, 0 AS pos, CAST(0 AS BIGINT) AS h,
       |    0 AS last_b, false AS is_b
       |  FROM corp
       |  UNION ALL
       |  SELECT doc_id, text, pos + 1, nh,
       |    CASE WHEN bnd THEN pos + 1 ELSE last_b END,
       |    bnd
       |  FROM (
       |    SELECT doc_id, text, pos, last_b, nh,
       |      (((pos + 1 - last_b) >= $minLen AND (nh & $mask) = 0)
       |        OR (pos + 1 - last_b) >= $maxLen) AS bnd
       |    FROM (
       |      SELECT doc_id, text, pos, last_b,
       |        CASE WHEN pos >= $windowLen
       |          THEN ((h * 31 + ord(substr(text, pos + 1, 1))
       |                 - ((CAST(ord(substr(text, pos - ${windowLen - 1}, 1))
       |                       AS BIGINT)
       |                     * $pow) & 2147483647)) & 2147483647)
       |          ELSE ((h * 31 + ord(substr(text, pos + 1, 1)))
       |                & 2147483647)
       |        END AS nh
       |      FROM walk WHERE pos < len(text)
       |    )
       |  )
       |), ends0 AS (
       |  SELECT doc_id, text, pos AS e FROM walk WHERE is_b
       |), lastpos AS (
       |  SELECT doc_id, text, max(pos) AS n FROM walk
       |  GROUP BY doc_id, text
       |), fin AS (
       |  SELECT l.doc_id, l.text, l.n AS e FROM lastpos l
       |  LEFT JOIN ends0 x ON x.doc_id = l.doc_id AND x.e = l.n
       |  WHERE l.n > 0 AND x.e IS NULL
       |), ends AS (
       |  SELECT * FROM ends0 UNION ALL SELECT * FROM fin
       |), chunkspan AS (
       |  SELECT doc_id, text, e,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS s
       |  FROM ends
       |), hashed AS (
       |  SELECT doc_id, e - s AS clen,
       |    (('0x' || substr(md5(substr(text, s + 1, e - s)), 1, 16))::UBIGINT
       |     & 2147483647::UBIGINT)::BIGINT AS ch
       |  FROM chunkspan
       |)""".stripMargin
  }

  /** DSIR score replay (q161/q162): hashed unigram+bigram buckets
    * (md5-31 % dim, the q64 family; bigrams via the q105 adjacent-pair
    * pattern), per-side counts split on `doc_id % targetMod`, DENSE
    * ratio spine over range(dim) so unseen buckets go through the row
    * path, each side's ln fixed to integer micro-nats BEFORE the
    * difference (alpha = 1.0, the engine default). Emits a
    * `scored(doc_id, n_features, logw_micro)` CTE. */
  def dsirScoreCtes(dim: Int, targetMod: Int): String =
    s"""tokarr AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, unnest(toks) AS f FROM tokarr
       |  UNION ALL
       |  SELECT doc_id,
       |    toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS f
       |  FROM (SELECT doc_id, toks,
       |          unnest(generate_series(1, len(toks) - 1)) AS i FROM tokarr)
       |), fb AS (
       |  SELECT doc_id, (('0x' || substr(md5(f), 1, 16))::UBIGINT
       |    & 2147483647::UBIGINT)::BIGINT % $dim AS bucket
       |  FROM feats
       |), tc AS (
       |  SELECT bucket, count(*) AS ct FROM fb
       |  WHERE doc_id % $targetMod = 0 GROUP BY bucket
       |), rc AS (
       |  SELECT bucket, count(*) AS cr FROM fb
       |  WHERE doc_id % $targetMod <> 0 GROUP BY bucket
       |), tot AS (
       |  SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tc) AS nt,
       |         (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rc) AS nr
       |), ratio AS (
       |  SELECT s.range AS bucket,
       |    CAST(floor(ln((coalesce(t.ct, 0) + 1.0) / (tot.nt + 1.0 * $dim))
       |      * 1000000.0 + 0.5) AS BIGINT)
       |    - CAST(floor(ln((coalesce(r.cr, 0) + 1.0) / (tot.nr + 1.0 * $dim))
       |      * 1000000.0 + 0.5) AS BIGINT) AS lru
       |  FROM range(0, $dim) s
       |  LEFT JOIN tc t ON t.bucket = s.range
       |  LEFT JOIN rc r ON r.bucket = s.range
       |  CROSS JOIN tot
       |), scored AS (
       |  SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_features,
       |    CAST(sum(ratio.lru) AS BIGINT) AS logw_micro
       |  FROM fb JOIN ratio USING (bucket)
       |  GROUP BY fb.doc_id
       |)""".stripMargin

  /** q148: CDC chunk sharing between originals and front-edited copies. */
  def cdcChunksSql(minLen: Int, maskBits: Int, maxLen: Int,
                   windowLen: Int = 16): String =
    s"""WITH RECURSIVE corp AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < 100
       |  UNION ALL
       |  SELECT doc_id + 1000000, 'zq inserted preamble token ' || text
       |  FROM documents WHERE doc_id < 100
       |), ${cdcWalkCtes(minLen, maskBits, maxLen, windowLen)},
       |orig AS (
       |  SELECT DISTINCT doc_id AS orig_id, ch FROM hashed
       |  WHERE doc_id < 1000000
       |), cop AS (
       |  SELECT doc_id, doc_id - 1000000 AS orig_id, ch FROM hashed
       |  WHERE doc_id >= 1000000
       |), tot AS (
       |  SELECT doc_id, count(*) AS n_chunks FROM cop GROUP BY doc_id
       |), shr AS (
       |  SELECT c.doc_id, count(*) AS n_shared
       |  FROM cop c JOIN orig o ON o.orig_id = c.orig_id AND o.ch = c.ch
       |  GROUP BY c.doc_id
       |)
       |SELECT t.doc_id, t.n_chunks,
       |  coalesce(s.n_shared, CAST(0 AS BIGINT)) AS n_shared
       |FROM tot t LEFT JOIN shr s USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** q149: the content-addressed delta-storage report between two corpus
    * versions (the q84 corpusDiff construction: every-7th doc removed,
    * every-5th edited, 15 appended). Distinct-chunk accounting: a chunk
    * hash already in v1's store costs nothing to store for v2. */
  def cdcDeltaSql(minLen: Int, maskBits: Int, maxLen: Int,
                  windowLen: Int = 16): String =
    s"""WITH RECURSIVE corp AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN text || ' edited' ELSE text END
       |      AS text
       |  FROM documents WHERE doc_id % 7 <> 0
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id,
       |    translate(text, 'aeiou', 'xyzvw') AS text
       |  FROM documents WHERE doc_id < 15
       |), ${cdcWalkCtes(minLen, maskBits, maxLen, windowLen)},
       |flags AS (
       |  SELECT ch, max(clen) AS clen,
       |    max(CASE WHEN doc_id < 2000000 THEN 1 ELSE 0 END) AS in1,
       |    max(CASE WHEN doc_id >= 2000000 THEN 1 ELSE 0 END) AS in2
       |  FROM hashed GROUP BY ch
       |)
       |SELECT
       |  CAST(sum(in2) AS BIGINT) AS n_chunks_v2,
       |  CAST(sum(CASE WHEN in2 = 1 AND in1 = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_new_chunks,
       |  CAST(sum(CASE WHEN in2 = 1 THEN clen ELSE 0 END) AS BIGINT)
       |    AS chars_v2,
       |  CAST(sum(CASE WHEN in2 = 1 AND in1 = 0 THEN clen ELSE 0 END)
       |    AS BIGINT) AS chars_new,
       |  CASE WHEN CAST(sum(CASE WHEN in2 = 1 THEN clen ELSE 0 END)
       |              AS BIGINT) > 0
       |    THEN CAST(sum(CASE WHEN in2 = 1 AND in1 = 0 THEN clen ELSE 0 END)
       |           AS BIGINT) * 1000000
       |         // CAST(sum(CASE WHEN in2 = 1 THEN clen ELSE 0 END)
       |              AS BIGINT)
       |    ELSE CAST(0 AS BIGINT) END AS delta_ppm
       |FROM flags""".stripMargin

  /** q25: near-duplicate pairs (k=64, 16 bands, threshold 0.5). */
  def nearDupPairsSql: String =
    s"""WITH $corpusSql, ${minhashChain(64, 16, 3)}
       |SELECT id_a, id_b, jaccard FROM jac
       |WHERE jaccard >= 0.5 ORDER BY id_a, id_b""".stripMargin

  /** q26: near-dedup survivors (drop id_b of every qualifying pair). */
  def nearDedupSql: String =
    s"""WITH $corpusSql, ${minhashChain(64, 16, 3)}
       |SELECT doc_id FROM corpus
       |WHERE doc_id NOT IN (SELECT id_b FROM jac WHERE jaccard >= 0.5)
       |ORDER BY doc_id""".stripMargin

  /** q48: connected-components near-dedup. The oracle replays the exact
    * component semantics with a RECURSIVE reachability closure over the
    * verified pair graph (UNION-dedup recursion terminates at the fixpoint,
    * like the lp_filter recurrence oracle): a doc survives iff it is the
    * MINIMUM id among everything reachable from it. */
  def nearDedupConnectedSql: String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}
       |SELECT doc_id FROM corpus
       |WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp <> id)
       |ORDER BY doc_id""".stripMargin

  /** q118: the canonical-mapping provenance table — q48's component
    * closure emitted as (id, canonical) rows instead of the survivor
    * filter; canonicals map to themselves, unclustered docs emit no row. */
  /** The near-dup component closure shared by every provenance-family
    * oracle (q118/q123/q139): verified edges -> symmetric reach ->
    * recursive walk -> min-label components. ONE definition so the
    * oracles cannot desynchronize (review finding). */
  private def componentClosure(threshold: Double): String =
    s"""edges AS (
       |  SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold
       |), sym AS (
       |  SELECT id_a AS id, id_b AS reach FROM edges
       |  UNION
       |  SELECT id_b AS id, id_a AS reach FROM edges
       |), walk AS (
       |  SELECT id, reach FROM sym
       |  UNION
       |  SELECT w.id, s.reach FROM walk w JOIN sym s ON s.id = w.reach
       |), comp AS (
       |  SELECT id, least(id, min(reach)) AS comp FROM walk GROUP BY id
       |)""".stripMargin

  def canonicalMappingSql: String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}
       |SELECT id AS doc_id, comp AS canonical_id FROM comp
       |ORDER BY doc_id""".stripMargin

  /** q167: leakage-free split — [[canonicalMappingSql]]'s component
    * closure left-joined back to the corpus, then the q45 md5-31 split
    * gate keyed on COALESCE(canonical, own id). Shares every constant
    * with the canonical-mapping chain so the two queries pin the same
    * clusters. */
  def leakageFreeSplitSql(nSplits: Int): String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}
       |SELECT c.doc_id,
       |  (('0x' || substr(md5('graft:' ||
       |      CAST(COALESCE(k.comp, c.doc_id) AS VARCHAR)), 1, 16))::UBIGINT
       |    & 2147483647::UBIGINT)::BIGINT % $nSplits AS split
       |FROM corpus c LEFT JOIN comp k ON k.id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  /** q123: cluster-size histogram — q118's component closure, rolled up
    * to (cluster_size, n_clusters). Shares every constant with
    * [[canonicalMappingSql]] so the two queries pin the same chain. */
  def clusterSizeHistogramSql: String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}, sz AS (
       |  SELECT comp, count(*) AS cluster_size FROM comp GROUP BY comp
       |)
       |SELECT cluster_size, count(*) AS n_clusters
       |FROM sz GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** q139: the dedup impact report — q118's component closure joined back
    * to document byte sizes, rolled to one row of integer aggregates. */
  def dedupImpactSql: String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}, dropped AS (
       |  SELECT count(*) AS n_dropped,
       |    CAST(COALESCE(sum(length(t.text)), 0) AS BIGINT) AS bytes_dropped
       |  FROM comp c JOIN corpus t ON t.doc_id = c.id
       |  WHERE c.id <> c.comp
       |), clustered AS (
       |  SELECT count(*) AS n_docs_in_clusters,
       |    count(DISTINCT comp) AS n_clusters
       |  FROM comp
       |), tot AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(COALESCE(sum(length(text)), 0) AS BIGINT) AS bytes_total
       |  FROM corpus
       |)
       |SELECT n_docs, bytes_total, n_docs_in_clusters, n_clusters,
       |  n_dropped, bytes_dropped,
       |  (bytes_dropped * 1000000) // bytes_total AS drop_ppm
       |FROM tot CROSS JOIN clustered CROSS JOIN dropped""".stripMargin

  /** q128: the distributed integer Lloyd recurrence unrolled — one
    * (assign, update) CTE pair per iteration, then the final assignment.
    * Every value is an exact integer in a double (quantize/floor rules
    * identical to [[graft.ops.SimOps.kmeansAssignInt]]), so no summation
    * order or tie can drift between engines. */
  def kmeansIntSql(k: Int, iters: Int, scale: Int): String =
    s"""${kmeansIntChain(k, iters, scale)}, fin AS (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id
       |      ORDER BY ${kmeansDistExpr("q", "cv")}, cid) AS rn
       |  FROM q CROSS JOIN c$iters
       |)
       |SELECT vec_id, cid AS cluster_id FROM fin WHERE rn = 1
       |ORDER BY vec_id""".stripMargin

  /** q172: [[kmeansIntSql]]'s chain + the per-cluster prototypicality
    * rank on the exact integer distance (ties by id) — the engine's
    * `prototypeSelect` replayed through the SAME Lloyd CTEs. */
  def prototypeSelectSql(k: Int, iters: Int, scale: Int, perCluster: Int,
                         keepClosest: Boolean): String = {
    val dir = if (keepClosest) "ASC" else "DESC"
    s"""${kmeansIntChain(k, iters, scale)}, fin AS (
       |  SELECT vec_id, cid, CAST(d AS BIGINT) AS dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |  FROM (SELECT vec_id, cid, ${kmeansDistExpr("q", "cv")} AS d
       |        FROM q CROSS JOIN c$iters)
       |), assigned AS (
       |  SELECT vec_id, cid AS cluster_id, dist FROM fin WHERE rn = 1
       |), pranked AS (
       |  SELECT vec_id, cluster_id, dist,
       |    CAST(row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY dist $dir, vec_id) AS BIGINT) AS proto_rank
       |  FROM assigned
       |)
       |SELECT vec_id, cluster_id, dist, proto_rank FROM pranked
       |WHERE proto_rank <= $perCluster
       |ORDER BY cluster_id, proto_rank""".stripMargin
  }

  private def kmeansDistExpr(qc: String, cv: String): String =
    s"(list_inner_product($qc, $qc) - 2*list_inner_product($qc, $cv)" +
      s" + list_inner_product($cv, $cv))"

  /** The integer-Lloyd CTE chain. `p` prefixes every CTE name so the
    * chain can compose with other CTE families (the trained-IVF recall
    * oracle's prefix "k" — its recallPrefixSql already owns `q`/`e`);
    * the default "" keeps q128/q172 byte-identical. Emits `WITH ${p}q
    * AS (...) ... ${p}c$iters`. */
  private def kmeansIntChain(k: Int, iters: Int, scale: Int,
                             p: String = ""): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH ${p}q AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> floor(x * $scale + 0.5)) AS q
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), ${p}c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         |    q AS cv
         |  FROM ${p}q ORDER BY vec_id LIMIT $k
         |)""".stripMargin)
    sb.append(kmeansIntIterations(iters, p))
    sb.toString
  }

  /** [[kmeansIntChain]] with MAXIMIN (farthest-point) init instead of the
    * k lowest ids — the trained-IVF codebook's init
    * ([[graft.ops.SimOps.ivfTopK]] intLloydIters): seed = lowest vec_id,
    * then k-1 steps each taking the corpus argmax of
    * min-distance-to-chosen (exact integers; ORDER BY dm DESC, vec_id =
    * the engine's tie-to-lowest-id). Cell id = pick order. */
  private def kmeansIntChainMaximin(k: Int, iters: Int, scale: Int,
                                    p: String): String = {
    val sb = new StringBuilder
    // every chained CTE is MATERIALIZED: d_j and m_j are each referenced
    // twice downstream, so DuckDB's default CTE INLINING doubles the
    // expansion per step — 2^k re-scans of the corpus ("Too many open
    // files" at k=16, measured); materialization makes each step one scan
    sb.append(
      s"""WITH ${p}q AS MATERIALIZED (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> floor(x * $scale + 0.5)) AS q
         |  FROM embeddings WHERE embedding IS NOT NULL
         |), ${p}m0 AS MATERIALIZED (
         |  SELECT vec_id, q AS cv FROM ${p}q ORDER BY vec_id LIMIT 1
         |)""".stripMargin)
    for (j <- 1 until k) {
      val dprev = if (j == 1)
        s"""SELECT z.vec_id, z.q,
           |    ${kmeansDistExpr("z.q", "m.cv")} AS dm
           |  FROM ${p}q z CROSS JOIN ${p}m0 m""".stripMargin
      else
        s"""SELECT z.vec_id, z.q,
           |    least(z.dm, ${kmeansDistExpr("z.q", "m.cv")}) AS dm
           |  FROM ${p}d${j - 1} z CROSS JOIN ${p}m${j - 1} m""".stripMargin
      sb.append(
        s""", ${p}d$j AS MATERIALIZED (
           |  $dprev
           |), ${p}m$j AS MATERIALIZED (
           |  SELECT vec_id, q AS cv FROM ${p}d$j
           |  ORDER BY dm DESC, vec_id LIMIT 1
           |)""".stripMargin)
    }
    val union = (0 until k).map(j =>
      s"SELECT CAST($j AS BIGINT) AS cid, cv FROM ${p}m$j")
      .mkString("\n  UNION ALL ")
    sb.append(
      s""", ${p}c0 AS (
         |  $union
         |)""".stripMargin)
    sb.append(kmeansIntIterations(iters, p))
    sb.toString
  }

  /** The shared unrolled Lloyd iterations `${p}a$i/${p}u$i/${p}c$i` over
    * an init CTE `${p}c0`. */
  private def kmeansIntIterations(iters: Int, p: String): String = {
    def distExpr(qc: String, cv: String): String = kmeansDistExpr(qc, cv)
    val sb = new StringBuilder
    for (i <- 1 to iters) {
      val prev = s"${p}c${i - 1}"
      sb.append(
        s""", ${p}a$i AS (
           |  SELECT vec_id, q, cid,
           |    row_number() OVER (PARTITION BY vec_id
           |      ORDER BY ${distExpr("q", "cv")}, cid) AS rn
           |  FROM ${p}q CROSS JOIN $prev
           |), ${p}u$i AS (
           |  SELECT cid, dim, floor(sum(v) / count(*)) AS cv_d
           |  FROM (
           |    SELECT cid, unnest(q) AS v,
           |      unnest(generate_series(1, len(q))) - 1 AS dim
           |    FROM ${p}a$i WHERE rn = 1
           |  ) GROUP BY cid, dim
           |), ${p}c$i AS (
           |  SELECT $prev.cid, COALESCE(n.cv, $prev.cv) AS cv
           |  FROM $prev LEFT JOIN (
           |    SELECT cid, list(cv_d ORDER BY dim) AS cv FROM ${p}u$i GROUP BY cid
           |  ) n USING (cid)
           |)""".stripMargin)
    }
    sb.toString
  }

  /** q100: keep-best canonical near-dedup — q48's component closure, but
    * the survivor per component is the argmax of (length(text) DESC,
    * doc_id ASC) instead of the minimum id. The planted perturbed copies
    * are LONGER than their originals, so the keep-best survivors invert
    * q48's choice on every planted cluster — the two queries pin each
    * other's selection rules apart. */
  def nearDedupKeepBestSql: String =
    s"""WITH RECURSIVE $corpusSql, ${minhashChain(64, 16, 3)},
       |${componentClosure(0.5)}, ranked AS (
       |  SELECT c.id, row_number() OVER (
       |    PARTITION BY c.comp ORDER BY length(t.text) DESC, c.id) AS rn
       |  FROM comp c JOIN corpus t ON t.doc_id = c.id
       |)
       |SELECT doc_id FROM corpus
       |WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
       |ORDER BY doc_id""".stripMargin

  // --- smooth: mirror-extended convolution as per-user list arithmetic ----

  /**
   * q23: `smooth(windowLen = 11, hanning)` — the normalized kernel weights
   * are embedded as literals; each output sample is the ascending-d fold
   * sum_{d=-5..5} v(k+d) * wn(5-d) over the mirror-extended series, exactly
   * the fold Kernels.smooth/convolveSame performs (term order and operand
   * order preserved, so doubles are bit-identical).
   *
   * Mirror rule (reference off-by-one replicated): left v(-t) = 2*x(1) -
   * x(min(n, t+2)), right v(n+e) = 2*x(n) - x(max(1, n-e+1)), 1-based.
   */
  def smoothSql: String = {
    val wl = 11
    val w  = graft.dsp.Kernels.hanning(wl)
    val s  = w.sum
    val wn = w.map(_ / s)
    // term for offset d (ascending): v(k+d) * wn(5-d)
    val terms = (-5 to 5).map { dd =>
      val j = s"(k + ${dd})" // 1-based target position
      val v =
        s"""(CASE
           |  WHEN $j >= 1 AND $j <= n THEN a[$j]
           |  WHEN $j < 1 THEN 2.0*a[1] - a[least(n, 3 - k - ${dd})]
           |  ELSE 2.0*a[n] - a[greatest(1, n - (k + ${dd} - n) + 1)]
           |END)""".stripMargin.replaceAll("\\s+", " ")
      s"$v * ${d(wn(5 - dd))}"
    }
    val foldSum = terms.mkString("(", "\n       + ", ")")
    s"""WITH s AS (
       |  SELECT user_id u, event_id i, value x FROM events
       |), arr AS (
       |  SELECT u, list(x ORDER BY i) AS a, list(i ORDER BY i) AS ids,
       |         len(list(x ORDER BY i)) AS n
       |  FROM s GROUP BY u
       |), sm AS (
       |  SELECT u, ids,
       |    list_transform(range(1, n + 1), k ->
       |      $foldSum) AS y
       |  FROM arr
       |)
       |SELECT u AS user_id, unnest(ids) AS event_id,
       |       round(unnest(y), 6) AS value_smooth
       |FROM sm ORDER BY user_id, event_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q177-q179: the ANN recall contract. Ground truth = exact brute-force
  // cosine top-k over the seeded 200-query sample (hash-ordered md5-31 of
  // "graft:vec_id", ties by vec_id — the engine-portable sampling family);
  // each oracle replays ONE approximate path's top-k with the same
  // rounded-cosine ranking and counts the per-query intersection — an
  // all-integer result, so the recall number itself is hash-verified, not
  // just the plan shape.
  // ---------------------------------------------------------------------

  /** Shared CTE prefix: corpus `e`, seeded query sample `q`, exact
    * ground-truth set `exactk` at `k`. */
  private def recallPrefixSql(k: Int, nQueries: Int): String =
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), q AS (
       |  SELECT vec_id, v FROM e
       |  ORDER BY (('0x' || substr(md5('graft:' || CAST(vec_id AS VARCHAR)),
       |      1, 16))::UBIGINT & 2147483647::UBIGINT)::BIGINT, vec_id
       |  LIMIT $nQueries
       |), exact AS (
       |  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosineSqlFor("q", "e2")} DESC, e2.vec_id) AS rnk
       |  FROM q JOIN e e2 ON e2.vec_id <> q.vec_id
       |), exactk AS (
       |  SELECT query_id, neighbor_id FROM exact WHERE rnk <= $k
       |)""".stripMargin

  /** Shared suffix: per-query hit counts over `exactk` vs `annk`,
    * zero-filled so every sampled query emits a row. */
  private val recallSuffixSql: String =
    """SELECT q.vec_id AS query_id, CAST(coalesce(h.h, 0) AS BIGINT) AS hits
      |FROM q LEFT JOIN (
      |  SELECT x.query_id, count(*) AS h
      |  FROM exactk x JOIN annk a
      |    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
      |  GROUP BY x.query_id
      |) h ON h.query_id = q.vec_id
      |ORDER BY query_id""".stripMargin

  /** q177: recall of the IVF path (lowest-id codebook, argmax-cosine
    * cells, nProbe probes) against exact top-k. */
  def annRecallIvfSql(k: Int, nQueries: Int, nCells: Int, nProbe: Int): String =
    s"""WITH ${recallPrefixSql(k, nQueries)}, c AS (
       |  SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < $nCells
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
       |  FROM q CROSS JOIN c
       |), scoredann AS (
       |  SELECT p.query_id, ce.vec_id AS neighbor_id,
       |    round(CASE WHEN sqrt(list_inner_product(p.qv, p.qv))
       |                    * sqrt(list_inner_product(ce.v, ce.v)) > 0
       |      THEN list_inner_product(p.qv, ce.v)
       |           / (sqrt(list_inner_product(p.qv, p.qv))
       |              * sqrt(list_inner_product(ce.v, ce.v)))
       |      ELSE 0.0 END, 6) AS cs
       |  FROM probes p JOIN cell ce ON ce.cl = p.cl
       |  WHERE p.prn <= $nProbe AND ce.vec_id <> p.query_id
       |), annk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, neighbor_id) AS rnk
       |    FROM scoredann
       |  ) WHERE rnk <= $k
       |)
       |$recallSuffixSql""".stripMargin

  /** q177 (r15): recall of the TRAINED-codebook IVF path — cells from the
    * q128 integer-exact Lloyd recurrence (unrolled via [[kmeansIntChain]]
    * under prefix "k"; its own `q`/`e` names are taken by the recall
    * prefix), corpus assignment and probe selection by the same exact
    * integer L2 distance (ORDER BY dist, cid = the engine's first-min
    * tie), candidate ranking by cosine on the ORIGINAL vectors — against
    * exact top-k. */
  def annRecallIvfTrainedSql(k: Int, nQueries: Int, nCells: Int, nProbe: Int,
                             iters: Int, scale: Int): String =
    s"""WITH ${recallPrefixSql(k, nQueries)},
       |${kmeansIntChainMaximin(nCells, iters, scale, p = "k").stripPrefix("WITH ")},
       |cfin AS (
       |  SELECT cid, cv FROM kc$iters
       |), kassign AS (
       |  SELECT kq.vec_id, cfin.cid,
       |    row_number() OVER (PARTITION BY kq.vec_id
       |      ORDER BY ${kmeansDistExpr("kq.q", "cfin.cv")}, cfin.cid) AS rn
       |  FROM kq CROSS JOIN cfin
       |), cell AS (
       |  SELECT vec_id, cid AS cl FROM kassign WHERE rn = 1
       |), probes AS (
       |  SELECT a.vec_id AS query_id, a.cid AS cl
       |  FROM kassign a JOIN q ON q.vec_id = a.vec_id
       |  WHERE a.rn <= $nProbe
       |), scoredann AS (
       |  SELECT p.query_id, m.vec_id AS neighbor_id,
       |    round(${cosineSqlFor("qo", "co")}, 6) AS cs
       |  FROM probes p
       |  JOIN cell m ON m.cl = p.cl AND m.vec_id <> p.query_id
       |  JOIN e qo ON qo.vec_id = p.query_id
       |  JOIN e co ON co.vec_id = m.vec_id
       |), annk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, neighbor_id) AS rnk
       |    FROM scoredann
       |  ) WHERE rnk <= $k
       |)
       |$recallSuffixSql""".stripMargin

  /** q178: recall of the banded-LSH path (band b's planes from seed
    * 42 + b, union of per-band collisions) against exact top-k. */
  def annRecallLshSql(k: Int, nQueries: Int, bands: Int, nPlanes: Int): String = {
    val perBand = (0 until bands).map { b =>
      "  " + bucketSql(SimOps.hyperplanes(nPlanes, 64, 42L + b), band = Some(b))
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${recallPrefixSql(k, nQueries)}, sk AS (
       |$perBand
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM sk a JOIN sk b
       |    ON a.band = b.band AND a.bucket = b.bucket AND b.vec_id <> a.vec_id
       |  WHERE a.vec_id IN (SELECT vec_id FROM q)
       |), scoredann AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosineSqlFor("qa", "cb")} AS cs
       |  FROM cand
       |  JOIN e qa ON qa.vec_id = cand.query_id
       |  JOIN e cb ON cb.vec_id = cand.neighbor_id
       |), annk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, neighbor_id) AS rnk
       |    FROM scoredann
       |  ) WHERE rnk <= $k
       |)
       |$recallSuffixSql""".stripMargin
  }

  /** q179: recall of the OPERATIONAL projection pattern — shortlist
    * clamp(ceil(n/40), 50, 4096) in the projected space (DERIVED from
    * corpus size, the q163 candidate-bounding rule: a fixed shortlist of
    * a growing corpus decays below any recall floor), exact rerank in
    * the original space — against exact top-k in the original space. */
  def annRecallProjectedSql(k: Int, nQueries: Int, outDim: Int,
                            dim: Int): String =
    s"""WITH ${recallPrefixSql(k, nQueries)}, proj AS (
       |  SELECT vec_id, list(ip ORDER BY j) AS v
       |  FROM (${projRowsSql(outDim, dim)})
       |  GROUP BY vec_id
       |), qp AS (
       |  SELECT p.vec_id, p.v FROM proj p JOIN q ON q.vec_id = p.vec_id
       |), shortl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      ${cosineSqlFor("a", "b")} AS cs,
       |      row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${cosineSqlFor("a", "b")} DESC, b.vec_id) AS rnk
       |    FROM qp a JOIN proj b ON b.vec_id <> a.vec_id
       |  ) WHERE rnk <= (SELECT greatest(50, least(4096,
       |      CAST(ceil(count(*) / 40.0) AS BIGINT))) FROM e)
       |), rer AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${cosineSqlFor("qo", "co")} AS cs
       |  FROM shortl s
       |  JOIN e qo ON qo.vec_id = s.query_id
       |  JOIN e co ON co.vec_id = s.neighbor_id
       |), annk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cs DESC, neighbor_id) AS rnk
       |    FROM rer
       |  ) WHERE rnk <= $k
       |)
       |$recallSuffixSql""".stripMargin
}
