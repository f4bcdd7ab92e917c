package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators, designed for the 100 TB shape:
 *
 *  - EXACT dedup shuffles a 32-byte sha2 digest, never the document body
 *    (a raw-text shuffle key is the classic scale-killer — VERDICT r1 §4).
 *  - NEAR dedup is MinHash + banded LSH: candidates come from equi-joins on
 *    (band, band_hash) — all-pairs comparison never happens; the exact
 *    Jaccard verification runs only inside buckets.
 *  - SimHash gives a 64-bit per-doc sketch for Hamming-distance near-dup.
 *
 * Shuffle-byte accounting at 100 TB (1e9 docs, 100 KB avg): exact dedup
 * moves 1e9 * (8B id + 32B digest) ≈ 40 GB; MinHash with k=128, b=16 bands
 * moves 1e9 * 16 * 16B ≈ 256 GB — vs 100 TB of bodies for text-keyed
 * shuffles. Signatures are computed map-side with codegen'd expressions.
 */
object DedupOps {

  /** Word n-gram shingles (distinct), the unit of Jaccard similarity.
    * Compiled UDF over the (codegen'd) token array: per-element Catalyst
    * lambdas (`transform`+`slice`+`array_join`) are interpreted and
    * dominated q25's runtime. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesUdf(lit(n))(TextOps.tokens(text))

  private def shinglesUdf(n: Column) = {
    val f = udf { (tok: Seq[String], n: Int) =>
      if (tok == null) Seq.empty[String]
      else if (tok.length < n) Seq(tok.mkString(" "))
      else {
        val arr = tok.toArray
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i <= arr.length - n) {
          val sb = new java.lang.StringBuilder(arr(i))
          var j = 1
          while (j < n) { sb.append(' ').append(arr(i + j)); j += 1 }
          seen.add(sb.toString)
          i += 1
        }
        scala.jdk.CollectionConverters.CollectionHasAsScala(seen).asScala.toSeq
      }
    }
    (tok: Column) => f(tok, n)
  }

  /** Keep one row per identical `textCol` (lowest `idCol` wins), comparing
    * sha2-256 digests. Digest-keyed: partial-aggregable, tiny shuffle keys. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withDigest = df.withColumn("__digest", sha2(col(textCol), 256))
    val keep = withDigest.groupBy(col("__digest"))
      .agg(min(col(idCol)).as(idCol))
    withDigest.join(keep, Seq("__digest", idCol), "left_semi").drop("__digest")
  }

  /** Mersenne prime 2^31 - 1: the MinHash permutation modulus. Keeping every
    * operand under 2^31 makes `a*h + b` fit in 63 bits, so the identical
    * integer arithmetic runs in any engine's BIGINT (DuckDB oracle included)
    * with no overflow semantics to reconcile. */
  val P31: Long = 2147483647L

  /** Deterministic permutation parameters (a_i in [1, p-1], b_i in [0, p-1])
    * from a fixed-seed java.util.Random (spec-defined LCG — identical on any
    * JVM). The oracle SQL embeds these same values as literals. */
  def permConstants(k: Int): Array[(Long, Long)] = {
    val rng = new java.util.Random(0x5EED)
    Array.fill(k)((rng.nextInt((P31 - 1).toInt).toLong + 1L,
                   rng.nextInt(P31.toInt).toLong))
  }

  /** First 8 md5 bytes big-endian, masked to 31 bits — the engine-portable
    * shingle hash (same fold as simHash64's token hash). */
  private[ops] def md5Hash31(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h & 0x7fffffffL
  }

  /**
   * MinHash signature over the shingle set: `min_i (a_i*h31(s) + b_i) mod p`
   * with h31 the md5-31-bit shingle hash. Each shingle is hashed ONCE, then
   * k minima accumulate in a single compiled pass — a per-element Catalyst
   * lambda (`transform`/`array_min` k times) is interpreted, which
   * benchmarked ~100x slower at k=64. The md5 + mod-p family (instead of
   * murmur double-hashing) is deliberately engine-portable: the DuckDB
   * oracle reproduces the exact signatures, making near-dup results
   * hash-checkable rather than rows-only.
   */
  def minHashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    minhashUdf(numHashes)(shingles(text, shingleSize))

  /** MinHash signature over a pre-computed shingle-array column (lets one
    * shingling pass feed both the signature and the Jaccard verify). */
  def minHashFromShingles(sh: Column, numHashes: Int = 64): Column =
    minhashUdf(numHashes)(sh)

  private def minhashUdf(k: Int) = {
    val perms = permConstants(k)
    val f = udf { sh: Seq[String] =>
      val sig = Array.fill(k)(Long.MaxValue)
      sh.foreach { s =>
        val h = md5Hash31(s)
        var i = 0
        while (i < k) {
          val v = (perms(i)._1 * h + perms(i)._2) % P31
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig
    }
    (sh: Column) => f(sh)
  }

  /** Banded LSH: split the signature into `bands` slices and fold each to a
    * portable band key `b := (b*31 + v) mod p` (reproducible in the oracle,
    * unlike Spark's internal `hash`); emit one (band_id, band_hash) row per
    * band via posexplode. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int): DataFrame = {
    val bandKeys = udf { (sig: Seq[Long], bands: Int) =>
      val r = sig.length / bands
      Array.tabulate(bands) { b =>
        var acc = sig(b * r)
        var j = 1
        while (j < r) { acc = (acc * 31L + sig(b * r + j)) % P31; j += 1 }
        acc
      }
    }
    df.select(col(idCol), posexplode(bandKeys(col(sigCol), lit(bands))))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
  }

  /**
   * Candidate near-duplicate pairs (a < b) from shared LSH buckets, verified
   * with exact shingle Jaccard >= `threshold`.
   *
   * Candidate generation carries ONLY (band keys, id): the bucket self-join
   * and the distinct() shuffle two ints + an id per row. Shingle arrays join
   * in afterwards, once per side, for colliding pairs only — carrying them
   * through the band explosion (x bands) and deduplicating array payloads
   * was a 345 s scale bug in the r2 bench at a mere 5k docs.
   */
  /** `maxBucket > 0` drops LSH buckets holding more than that many docs
    * from candidate generation — the standard skew guard: a bucket of
    * boilerplate (B identical headers) produces B^2/2 candidate pairs, and
    * one hot key would otherwise dominate the join. Capped buckets are
    * boilerplate by construction, exactly the content near-dedup pipelines
    * drop via other means anyway; AQE's skew split handles the moderate
    * cases below the cap. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 64, bands: Int = 16,
                         shingleSize: Int = 3, threshold: Double = 0.7,
                         maxBucket: Int = 0): DataFrame = {
    // Stage the shingling ONCE: without it the self-join sides, plus both
    // jaccard sides, each re-derive shingles from the raw text — four corpus
    // scans + tokenizations of the 100 TB table instead of one. The staged
    // (id, shingles) table is the only thing every later stage needs; at
    // cluster scale this is the classic signature-table materialization.
    val sh = df.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = sh.select(col(idCol),
      minHashFromShingles(col("__sh"), numHashes).as("__sig"))
    val allBands = lshBands(withSig, idCol, "__sig", bands)
    val bandsDf =
      if (maxBucket <= 0) allBands
      else {
        // one window count on the same keys the join shuffles on anyway
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_id"), col("band_hash"))
        allBands.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val a = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id_a"))
    val b = bandsDf.select(col("band_id"), col("band_hash"), col(idCol).as("id_b"))
    val candidates = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    jaccardForShingledPairs(sh, candidates, idCol)
      .filter(col("jaccard") >= threshold)
  }

  /** Near-dedup: drop every doc that near-duplicates a lower-id doc (one
    * LSH round — transitive chains collapse to their local minimum, not a
    * full connected-components pass; documented approximation). */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                numHashes: Int = 64, bands: Int = 16,
                shingleSize: Int = 3, threshold: Double = 0.7,
                maxBucket: Int = 0): DataFrame = {
    val losers = nearDuplicatePairs(df, idCol, textCol, numHashes, bands,
      shingleSize, threshold, maxBucket).select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard for given id pairs — deterministic rational
    * arithmetic, DuckDB-oracle-able. `pairs` must have (id_a, id_b). */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String,
                      textCol: String, shingleSize: Int = 3): DataFrame =
    jaccardForShingledPairs(
      df.select(col(idCol), shingles(col(textCol), shingleSize).as("__sh")),
      pairs, idCol)

  /** Jaccard over a pre-shingled (idCol, __sh) table. */
  private def jaccardForShingledPairs(sh: DataFrame, pairs: DataFrame,
                                      idCol: String): DataFrame = {
    val joined = pairs
      .join(sh.select(col(idCol).as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("__sh").as("sh_b")), "id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType)
    val union = size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType)
    joined.select(col("id_a"), col("id_b"),
      round(when(union > 0, inter / union).otherwise(lit(0.0)), 6).as("jaccard"))
  }

  /**
   * Benchmark decontamination: ids of documents sharing at least one
   * word n-gram with the probe set (e.g. an eval benchmark's questions).
   * The probe side is the SMALL side by construction — its distinct
   * shingles broadcast, and the corpus pass is a map-side semi-join at
   * scan speed; the corpus' shingle explosion never shuffles (the join key
   * arrives broadcast). Standard pre-training hygiene: drop or flag these
   * before a training run, with n high enough (13 in the wild) that chance
   * collisions vanish.
   */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      probes: DataFrame, probeTextCol: String,
                      shingleSize: Int = 13): DataFrame = {
    val probeSh = probes
      .select(explode(shingles(col(probeTextCol), shingleSize)).as("__sh"))
      .distinct()
    docs.select(col(idCol), explode(shingles(col(textCol), shingleSize)).as("__sh"))
      .join(broadcast(probeSh), Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** 64-bit SimHash over tokens (term-frequency weighted). The bit-vote
    * accumulation is a genuine scalar-kernel case — implemented as a compiled
    * Scala UDF over the token array (not a Python UDF; stays in the JVM).
    * Token hash = first 8 bytes of MD5 (stable across engines/versions). */
  def simHash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { tokens: Seq[String] =>
      if (tokens == null) null.asInstanceOf[java.lang.Long]
      else {
        val votes = new Array[Long](64)
        tokens.foreach { t =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
        java.lang.Long.valueOf(out)
      }
    }

  /** Hamming distance between two 64-bit sketches. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
