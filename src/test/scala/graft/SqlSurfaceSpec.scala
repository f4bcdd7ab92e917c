package graft

import org.apache.spark.sql.functions._

/**
 * The SQL-surface contract (VERDICT r13 #6): which of the engine's
 * operators are reachable from PURE SQL text — the
 * `GraftExtensions`/`Shell` registration surface — versus Scala-only
 * `DataFrame => DataFrame` ops. This spec pins the registration list by
 * name (a silent unregistration fails here, not in a user's session)
 * and drives one representative `spark.sql` query per SQL-reachable
 * family, asserting against known values or an independently computed
 * twin. README §"SQL surface" documents the same list for users.
 */
class SqlSurfaceSpec extends SparkTestBase {

  private lazy val registered: Unit = {
    graft.gsw.Gsw.registerAll(spark)
    org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftsketch.KllExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftsketch.MisraGriesExpressions.registerInto(spark)
  }

  /** The COMPLETE SQL-registered surface, by family. Adding a function
    * without extending this list (and README) fails the first test. */
  private val SqlSurface: Map[String, Seq[String]] = Map(
    "gsw" -> Seq("gsw_p_from_z", "gsw_z_from_p", "gsw_sigma0",
      "gsw_distance"),
    "array-math" -> Seq("array_dot", "l2_normalize", "int8_quantize"),
    "hash-sketch" -> Seq("md5_hash31", "simhash64", "word_shingles",
      "shingle_hash_set", "lsh_band_keys", "max_token_freq", "hashing_tf",
      "hashing_tf_sparse", "drop_segments_by_index"),
    "text-kernel" -> Seq("ascii_class_counts", "nfc_normalize",
      "deflate_ratio", "tokenize_with_offsets"),
    "sketch-agg" -> Seq("kll_sketch_agg", "kll_merge_agg", "kll_quantile",
      "mg_candidates_agg"))

  test("every declared SQL function is registered (and nothing silently " +
       "fell off the GraftExtensions surface)") {
    registered
    val missing = SqlSurface.flatMap { case (fam, fns) =>
      fns.filterNot(f => spark.catalog.functionExists(f)).map(f => s"$fam/$f")
    }
    assert(missing.isEmpty, s"unregistered SQL functions: $missing")
    // the same list must ship through the cluster-wide extension point
    val ext = new GraftExtensions
    assert(ext != null) // constructible with a no-arg ctor (spark.sql.extensions contract)
  }

  test("gsw family: SQL literal call matches the Scala implementation " +
       "to the bit") {
    registered
    val viaSql = spark.sql("SELECT gsw_sigma0(34.7118D, 28.8099D)")
      .head().getDouble(0)
    assert(viaSql == graft.gsw.Gsw.sigma0(34.7118, 28.8099),
      s"SQL gsw_sigma0 diverges from Gsw.sigma0: $viaSql")
    val dist = spark.sql(
      "SELECT gsw_distance(-89.25D, 28.25D, -89.0D, 28.5D)")
      .head().getDouble(0)
    assert(dist > 30000 && dist < 50000, s"implausible distance $dist m")
  }

  test("array-math family: dot product and normalization from SQL text") {
    registered
    val dot = spark.sql(
      "SELECT array_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>), " +
        "CAST(array(3.0, 4.0) AS ARRAY<FLOAT>))").head().getDouble(0)
    assert(dot == 11.0, s"array_dot([1,2],[3,4]) = $dot, want 11.0")
    val unit = spark.sql(
      "SELECT array_dot(l2_normalize(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)), " +
        "l2_normalize(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)))")
      .head().getDouble(0)
    assert(math.abs(unit - 1.0) < 1e-6, s"normalized self-dot $unit != ~1")
  }

  test("hash-sketch family: a pure-SQL exact-dedup pipeline agrees with " +
       "a text-keyed replay on the documents table") {
    registered
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("sqlsurface_docs")
    // duplicate-text groups found through the engine's md5_hash31 gate
    // vs through the raw text key: identical on a corpus with no 31-bit
    // collisions (deterministic data, so this pins both usability and
    // collision-freedom at this scale)
    val viaHash = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT md5_hash31(text) h FROM sqlsurface_docs
        |  WHERE text IS NOT NULL GROUP BY 1 HAVING count(*) > 1)"""
        .stripMargin).head().getLong(0)
    val viaText = spark.sql(
      """SELECT count(*) FROM (
        |  SELECT text FROM sqlsurface_docs
        |  WHERE text IS NOT NULL GROUP BY 1 HAVING count(*) > 1)"""
        .stripMargin).head().getLong(0)
    assert(viaHash == viaText,
      s"md5_hash31 dup groups $viaHash != text dup groups $viaText")
    // simhash64 over tokenized text is a deterministic function of it
    val sh = spark.sql(
      "SELECT simhash64(split('the quick brown fox', ' ')) = " +
        "simhash64(split('the quick brown fox', ' ')), " +
        "simhash64(split('the quick brown fox', ' ')) = " +
        "simhash64(split('zz yy xx ww', ' '))")
      .head()
    assert(sh.getBoolean(0) && !sh.getBoolean(1))
  }

  test("text-kernel family: normalization, tokenization, and " +
       "compressibility from SQL text") {
    registered
    // decomposed e + U+0301 combining acute in, precomposed U+00E9 out
    // (Scala resolves the \u escape at compile time, so the SQL literal
    // carries the real combining character)
    val nfc = spark.sql("SELECT nfc_normalize('e\u0301')")
      .head().getString(0)
    assert(nfc == "\u00e9", s"NFC of e+combining-acute = ${nfc.codePoints()
      .toArray.toSeq}, want [233]")
    val nTok = spark.sql(
      "SELECT size(tokenize_with_offsets('alpha  beta gamma').toks)")
      .head().getInt(0)
    assert(nTok == 3, s"3 tokens expected, got $nTok")
    val ratios = spark.sql(
      "SELECT deflate_ratio(repeat('ab', 500)), " +
        "deflate_ratio('q7f3kz0pw9xj2mv8r5tb1ycn6hd4lg')").head()
    assert(ratios.getDouble(0) < ratios.getDouble(1),
      s"repetitive text must compress better: $ratios")
  }

  test("sketch-agg family: KLL median and Misra-Gries heavy hitter from " +
       "SQL text") {
    registered
    spark.range(0L, 10001L).createOrReplaceTempView("sqlsurface_range")
    val med = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(CAST(id AS DOUBLE), 200), 0.5D) " +
        "FROM sqlsurface_range").head().getDouble(0)
    assert(math.abs(med - 5000.0) < 300,
      s"KLL median of 0..10000 = $med, want ~5000")
    // bare decimal literal (what users actually type): SQL parses 0.5 as
    // DECIMAL(1,1); the registry builder must cast it up, not error
    val medDec = spark.sql(
      "SELECT kll_quantile(kll_sketch_agg(CAST(id AS DOUBLE), 200), 0.5) " +
        "FROM sqlsurface_range").head().getDouble(0)
    assert(math.abs(medDec - 5000.0) < 300,
      s"KLL median via decimal-literal rank = $medDec, want ~5000")
    val hot = spark.sql(
      "SELECT mg_candidates_agg(CASE WHEN id % 2 = 0 THEN 'hot' " +
        "ELSE CAST(id AS STRING) END, 4) FROM sqlsurface_range")
      .head().get(0).toString
    assert(hot.contains("hot"),
      s"Misra-Gries must surface the 50% key, got $hot")
  }

  test("the ctd DSv2 source is reachable from pure SQL (CREATE TEMPORARY " +
       "VIEW ... USING ctd)") {
    // Spark 4 restricts the `format.`path`` direct-query syntax to file
    // formats, so the pure-SQL route into a custom DSv2 source is the
    // USING clause — still zero Scala
    spark.sql("DROP VIEW IF EXISTS sqlsurface_cnv")
    spark.sql(
      s"""CREATE TEMPORARY VIEW sqlsurface_cnv
         |USING ctd OPTIONS (
         |  path '$dataDir/CTD/g01l01s01.cnv.gz', ftype 'cnv')""".stripMargin)
    val n = spark.sql("SELECT count(*) FROM sqlsurface_cnv")
      .head().getLong(0)
    assert(n == 90013L, s"cnv row count via SQL = $n, want 90013")
    spark.sql("DROP VIEW IF EXISTS sqlsurface_cnv")
  }
}
