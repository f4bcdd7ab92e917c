/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * names a private[sql] type — the standard pattern for third-party native
 * expressions (same as graftarray / graftgsw).
 */
package org.apache.spark.sql.catalyst.expressions.graftdedup

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, TypeCheckResult}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static kernels shared by eval and generated code. Operating on
 * `ArrayData` + `UTF8String` directly (rather than a Scala UDF's
 * `Seq[String]`) skips the per-row catalyst-to-Scala conversion — at 1e9
 * docs that conversion allocates one String per token per row purely to
 * re-extract the UTF-8 bytes md5 needs. `UTF8String.getBytes` returns
 * exactly those bytes, so every hash is bit-identical to the UDF (and
 * DuckDB-oracle) values.
 */
object GraftHashKernels {

  /** Static " " separator — per-row fromString allocation is exactly the
    * garbage these kernels exist to avoid. */
  private val SpaceSep = UTF8String.fromString(" ")

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 bytes, big-endian — `('0x' || substr(md5(t),1,16))::UBIGINT`. */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val md = md5Local.get().digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over a token array (term-frequency-weighted bit votes);
    * null elements are skipped; an empty array yields 0L. */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = md5Hash64(tokens.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** md5-based 31-bit key hash of a string — the split/sample family's
    * per-row kernel (`('0x'||substr(md5(salt||':'||key),1,16))::UBIGINT &
    * 2147483647` in the oracle). */
  def md5Hash31(s: UTF8String): Long =
    if (s == null) 0L else md5Hash64(s.getBytes) & 0x7fffffffL

  /** Hashing-trick term-frequency vector: one pass over the token array
    * counting md5-31(token) mod `dim` per bucket — the fixed-width
    * featurizer (fastText-style classifier input) whose bucket ids any
    * engine reproduces from md5. Null elements are skipped; an empty
    * array yields the zero vector. */
  def hashingTf(tokens: ArrayData, dim: Int): ArrayData = {
    val out = new Array[Long](dim)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash64(tokens.getUTF8String(i).getBytes) & 0x7fffffffL
        out((h % dim).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DSIR feature-bucket stream: md5-31 mod `dim` of every unigram plus
    * every adjacent-token bigram ("a b"), unigrams first — one pass, no
    * per-element lambda (the interpreted `transform` chain this replaces
    * dominated the DSIR family's wall time). Token arrays are null-free
    * by construction (the tokens() splitter); n tokens yield `2n - 1`
    * buckets (n >= 1), an empty array yields an empty array. */
  def dsirBuckets(tokens: ArrayData, dim: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](2 * n - 1)
    val sep = SpaceSep // static — no per-row garbage on the corpus scan
    var i = 0
    while (i < n) {
      out(i) = md5Hash31(tokens.getUTF8String(i)) % dim
      i += 1
    }
    i = 1
    while (i < n) {
      val bi = UTF8String.concat(tokens.getUTF8String(i - 1), sep,
        tokens.getUTF8String(i))
      out(n + i - 1) = md5Hash31(bi) % dim
      i += 1
    }
    new GenericArrayData(out)
  }

  /** N-gram LM (context, token) hash pairs: for every position with a
    * full (n-1)-token context, `(md5-31(ctx joined by " "), md5-31(tok))`
    * — one pass, no per-element lambda (the interpreted
    * `transform(sequence)/slice/array_join` chain this replaces dominated
    * the LM family's wall time, the DSIR-kernel lesson). Fewer than n
    * tokens yield an empty array. */
  def ngramPairs(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    // hoisted and reused across positions (concat copies bytes out);
    // the constant separator slots fill once
    val parts = new Array[UTF8String](2 * (n - 1) - 1)
    var s = 1
    while (s < parts.length) { parts(s) = SpaceSep; s += 2 }
    var i = n - 1
    while (i < len) {
      var j = 0
      while (j < n - 1) {
        parts(2 * j) = tokens.getUTF8String(i - (n - 1) + j)
        j += 1
      }
      val ctx = UTF8String.concat(parts: _*)
      out(i - (n - 1)) = new GenericInternalRow(Array[Any](
        md5Hash31(ctx), md5Hash31(tokens.getUTF8String(i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sparse hashing-trick term frequencies: `(bucket, tf)` structs for the
    * NON-ZERO buckets only, sorted by bucket. Bucket ids are identical to
    * [[hashingTf]] (md5-31 mod `dim`), but work is O(tokens) and memory
    * O(distinct buckets) regardless of `dim` — the dense kernel allocates
    * `dim` longs per row, which at the fastText-realistic 2^18–2^21 feature
    * widths is a 2–16 MB allocation per document. Null elements are
    * skipped; an empty array yields an empty struct array. */
  def hashingTfSparse(tokens: ArrayData, dim: Int): ArrayData = {
    val n = tokens.numElements()
    val counts = new java.util.HashMap[Integer, Long](math.max(8, n * 2))
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash64(tokens.getUTF8String(i).getBytes) & 0x7fffffffL
        counts.merge(Integer.valueOf((h % dim).toInt), 1L, (a, b) => a + b)
      }
      i += 1
    }
    val buckets = new Array[Int](counts.size)
    var k = 0
    val keys = counts.keySet.iterator()
    while (keys.hasNext) { buckets(k) = keys.next(); k += 1 }
    java.util.Arrays.sort(buckets)
    val out = new Array[Any](buckets.length)
    k = 0
    while (k < buckets.length) {
      out(k) = new GenericInternalRow(
        Array[Any](buckets(k).toLong, counts.get(buckets(k)).longValue()))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass linear-model score: `sigmoid(bias + Σ_tokens w(md5-31(tok) mod
    * |w|))`. Algebraically `sigmoid(w · tf + bias)` over the hashed TF
    * vector of width `|w|`, computed WITHOUT materializing it — each token
    * occurrence contributes its bucket's weight once, so the scorer runs at
    * scan speed with zero per-row allocation. Null tokens are skipped. */
  def linearScore(tokens: ArrayData, weights: Array[Double], bias: Double): Double = {
    var acc = bias
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash64(tokens.getUTF8String(i).getBytes) & 0x7fffffffL
        acc += weights((h % weights.length).toInt)
      }
      i += 1
    }
    1.0 / (1.0 + math.exp(-acc))
  }

  /** Linear margin over PRE-HASHED sparse (bucket, tf) pairs:
    * `bias + Σ tf · w(bucket)`. The training-loop inner product — tokens
    * are hashed ONCE into sparse pairs, then every gradient iteration
    * re-reads integer buckets instead of re-tokenizing and re-hashing the
    * corpus. Buckets outside [0, |w|) fold mod |w| (defensive; the kernel
    * that produced them already bounded them). */
  def sparseMargin(pairs: ArrayData, weights: Array[Double], bias: Double): Double = {
    var acc = bias
    val n = pairs.numElements()
    var i = 0
    while (i < n) {
      val row = pairs.getStruct(i, 2)
      val b = java.lang.Math.floorMod(row.getLong(0), weights.length.toLong)
      acc += row.getLong(1) * weights(b.toInt)
      i += 1
    }
    acc
  }

  /** Banded LSH keys: fold each of `bands` signature slices to
    * `((acc*31 + v) mod p)` — the portable band key DedupOps.lshBands
    * documents. */
  def lshBandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val p = 2147483647L
    val k = sig.numElements()
    // internal callers always pass k % bands == 0; the SQL surface can't —
    // fail loudly rather than silently ignoring trailing signature slots
    require(k > 0 && k % bands == 0,
      s"lsh_band_keys: signature length $k must be a positive multiple of bands=$bands")
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = sig.getLong(b * r)
      var j = 1
      while (j < r) { acc = (acc * 31L + sig.getLong(b * r + j)) % p; j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Highest single-token frequency (byte-equality on UTF8String). */
  def maxTokenFreq(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val m = new java.util.HashMap[UTF8String, Long](n * 2)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        m.merge(tokens.getUTF8String(i), 1L, (a, b) => a + b)
      i += 1
    }
    var mx = 0L
    val it = m.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > mx) mx = v }
    mx
  }

  /** MinHash signature: `min_i (a_i * h31(s) + b_i) mod p` over the shingle
    * array, h31 = md5Hash64 masked to 31 bits, p = 2^31 - 1. Each shingle is
    * hashed once; the k minima accumulate in one pass. */
  def minhashSig(shingles: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val p = 2147483647L
    val k = as.length
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        val h = md5Hash64(shingles.getUTF8String(s).getBytes) & 0x7fffffffL
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Sorted distinct md5-31 hashes of a shingle array — the streaming
    * near-dedup STATE payload: exact-set Jaccard runs by merge-intersection
    * over two sorted long arrays at 8 bytes/shingle, instead of carrying
    * shingle strings through every chained state stage. Same h31 family as
    * [[minhashSig]], so the hashed-set Jaccard equals the batch string-set
    * Jaccard (`array_intersect` in DedupOps.jaccardForPairs) up to md5-31
    * collisions (~n^2/2^32 per doc pair — negligible at document shingle
    * counts). Null elements are skipped; an empty array yields an empty
    * set. */
  def shingleHashSet(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val hs = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        hs(k) = md5Hash64(shingles.getUTF8String(i).getBytes) & 0x7fffffffL
        k += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs, 0, k)
    var w = 0
    var r = 0
    while (r < k) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    val out = new Array[Long](w)
    System.arraycopy(hs, 0, out, 0, w)
    new GenericArrayData(out)
  }

  /** lineDedup rebuild: keep segments whose Spark `xxhash64` (seed 42) is
    * NOT in `sorted` (an ascending long[]). Replaces the interpreted
    * `filter(segs, s -> NOT xxhash64(s) IN (...))` higher-order lambda —
    * Catalyst evaluates lambda bodies interpreted per element — with a
    * codegen-reachable kernel; the sorted-array binary search keeps the
    * probe allocation-free (~21 compares at the 2e6 maxBlocklist cap,
    * no per-element boxing into a hash set). Null-element parity with the
    * lambda is exact: the SQL hash of null leaves the seed untouched, so a
    * null segment carries h = 42 into the membership test instead of
    * short-circuiting (split() never emits nulls; parity is for free
    * anyway). */
  def filterSegsNotInHash(segs: ArrayData, sorted: Array[Long]): ArrayData = {
    val n = segs.numElements()
    val kept = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      val nul = segs.isNullAt(i)
      val s = if (nul) null else segs.getUTF8String(i)
      val h = if (nul) 42L
        else org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L)
      if (java.util.Arrays.binarySearch(sorted, h) < 0) { kept(k) = s; k += 1 }
      i += 1
    }
    if (k == n) new GenericArrayData(kept)
    else {
      val out = new Array[Any](k)
      System.arraycopy(kept, 0, out, 0, k)
      new GenericArrayData(out)
    }
  }

  /** lineDedup exact-verify rebuild: keep segments whose TEXT is not in
    * `sorted` (ascending UTF8String[] under natural byte order). A null
    * segment is dropped — the lambda form's `s IN (...)` predicate is null
    * there and ArrayFilter drops null-predicate elements — preserved for
    * exact parity even though split() never produces null elements. */
  def filterSegsNotInText(segs: ArrayData, sorted: Array[AnyRef]): ArrayData = {
    val n = segs.numElements()
    val kept = new Array[Any](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!segs.isNullAt(i)) {
        val s = segs.getUTF8String(i)
        if (java.util.Arrays.binarySearch(sorted, s) < 0) { kept(k) = s; k += 1 }
      }
      i += 1
    }
    if (k == n) new GenericArrayData(kept)
    else {
      val out = new Array[Any](k)
      System.arraycopy(kept, 0, out, 0, k)
      new GenericArrayData(out)
    }
  }

  /** paragraphDedup rebuild: keep segments whose 0-based POSITION is not
    * in `drops` (ascending int array — the caller sorts). Unlike the
    * blocklist rebuilds above, the drop set is a per-ROW column (each
    * document drops different positions), so it arrives as a second
    * ArrayData rather than a plan-constant reference object; the two-
    * pointer walk costs O(n + |drops|) with zero allocation beyond the
    * output. Out-of-range or null drop entries are ignored. */
  def dropSegsByIndex(segs: ArrayData, drops: ArrayData): ArrayData = {
    val n = segs.numElements()
    val m = drops.numElements()
    val kept = new Array[Any](n)
    var k = 0
    var i = 0
    var d = 0
    while (i < n) {
      while (d < m && (drops.isNullAt(d) || drops.getInt(d) < i)) d += 1
      if (d < m && !drops.isNullAt(d) && drops.getInt(d) == i) d += 1
      else { kept(k) = if (segs.isNullAt(i)) null else segs.getUTF8String(i); k += 1 }
      i += 1
    }
    if (k == n) new GenericArrayData(kept)
    else {
      val out = new Array[Any](k)
      System.arraycopy(kept, 0, out, 0, k)
      new GenericArrayData(out)
    }
  }
}

/** Native word n-gram shingling: `array<string> -> array<string>` of
  * DISTINCT space-joined n-grams in first-occurrence order; an array
  * shorter than n collapses to the single all-token join (including the
  * empty string for an empty array — mirroring the reference UDF exactly).
  * Builds `UTF8String`s directly (byte-level concat), so the hottest
  * pipeline stage (shingling feeds near-dup, jaccard, repetition,
  * decontamination) never leaves the codegen'd row format. */
object GraftShingleKernel {
  import org.apache.spark.unsafe.types.UTF8String

  private val Space = UTF8String.fromString(" ")

  /** duplicateSpans' positional k-gram hash stream: xxhash64(seed 42 —
    * Spark's `xxhash64()` default, the q81 oracle family) of every
    * k-token gram joined by " ", one entry per position IN ORDER (no
    * dedupe — the spans machinery consumes positions; [[shingles]]'
    * LinkedHashSet would collapse repeats). Fewer than k tokens yield an
    * empty array. Null elements map to "" (the array_join form it
    * replaces SKIPS them — parity holds because the offset tokenizer
    * never emits null tokens). */
  def gramXxHashes(tokens: ArrayData, k: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < k) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[UTF8String](len)
    var e = 0
    while (e < len) {
      val t = tokens.getUTF8String(e)
      toks(e) = if (t == null) UTF8String.EMPTY_UTF8 else t
      e += 1
    }
    val out = new Array[Long](len - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= len - k) {
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      val g = UTF8String.concatWs(Space, parts: _*)
      out(i) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(g, org.apache.spark.sql.types.StringType, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    // extract every token ONCE (getUTF8String re-materializes a view per
    // call — inside the n-wide sliding window that would be n extractions
    // per token)
    val toks = new Array[UTF8String](len)
    var e = 0
    while (e < len) {
      val t = tokens.getUTF8String(e)
      toks(e) = if (t == null) UTF8String.EMPTY_UTF8 else t
      e += 1
    }
    if (len < n) {
      new GenericArrayData(Array[Any](UTF8String.concatWs(Space, toks: _*)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val parts = new Array[UTF8String](n) // reused: concatWs copies bytes out
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        seen.add(UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}

/** `array<string> -> array<bigint>` positional k-gram xxhash64 stream
  * (see [[GraftShingleKernel.gramXxHashes]]); codegen'd one-pass kernel. */
case class GramXxHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_xxhashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftShingleKernel.gramXxHashes(tokens.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftShingleKernel.getClass.getName.stripSuffix("$")}.gramXxHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native shingling expression (see [[GraftShingleKernel]]). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftShingleKernel.shingles(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftShingleKernel.getClass.getName.stripSuffix("$")}.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<bigint>` sorted distinct md5-31 hash set (see
  * [[GraftHashKernels.shingleHashSet]]); the compact exact-Jaccard state
  * payload for streaming near-dedup. */
case class ShingleHashSetExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(shingles: Any): Any =
    GraftHashKernels.shingleHashSet(shingles.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.shingleHashSet($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<struct<ctx_h:bigint, tok_h:bigint>>` n-gram LM
  * (context, token) hash pairs (see [[GraftHashKernels.ngramPairs]]);
  * codegen'd one-pass kernel. */
case class NgramPairsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, s"n must be >= 2, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ctx_h", LongType, nullable = false),
      StructField("tok_h", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.ngramPairs(tokens.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.ngramPairs($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<bigint>` DSIR unigram+bigram feature buckets
  * (see [[GraftHashKernels.dsirBuckets]]); codegen'd one-pass kernel. */
case class DsirBucketsExpr(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dsir_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.dsirBuckets(tokens.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.dsirBuckets($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<bigint>` hashing-trick term-frequency vector
  * of width `dim` (see [[GraftHashKernels.hashingTf]]); codegen'd one-pass
  * kernel, engine-portable md5 bucket ids. */
case class HashingTfExpr(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashing_tf"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.hashingTf(tokens.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.hashingTf($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<struct<bucket:bigint, tf:bigint>>` sparse
  * hashing-trick term frequencies (see [[GraftHashKernels.hashingTfSparse]]).
  * The scale-safe form of [[HashingTfExpr]]: per-row cost tracks the token
  * count, not the feature width, so the realistic 2^18–2^21-bucket
  * parameterizations are usable. */
case class HashingTfSparseExpr(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bucket", LongType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashing_tf_sparse"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.hashingTfSparse(tokens.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.hashingTfSparse($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass linear-model scorer (`array<string> -> double`): sigmoid
  * of the hashed-TF dot product with a trained weight vector (see
  * [[GraftHashKernels.linearScore]]). Weights ride as a codegen reference
  * object — never as per-element plan literals — so a 2^21-dim model adds
  * ~16 MB to the broadcast plan state, not a 2M-node expression tree.
  * Constants are a `Seq` (not an array) so expression equality /
  * canonicalization compares by content, like [[MinHashSigExpr]]. */
case class LinearScoreExpr(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")
  // bias is embedded as a Java double literal in generated code — NaN or
  // Infinity would not parse there
  require(java.lang.Double.isFinite(bias), s"bias must be finite, got $bias")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val wArr = weights.toArray

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.linearScore(tokens.asInstanceOf[ArrayData], wArr, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("linearScoreW", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.linearScore($c, $wRef, $bias)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native linear margin (`array<struct<bucket,tf>> -> double`) over
  * pre-hashed sparse TF pairs (see [[GraftHashKernels.sparseMargin]]);
  * weights ride as a codegen reference object like [[LinearScoreExpr]]. */
case class SparseMarginExpr(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must be non-empty")
  require(java.lang.Double.isFinite(bias), s"bias must be finite, got $bias")

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparse_margin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<bigint,bigint>>, got ${t.catalogString}")
  }

  @transient private lazy val wArr = weights.toArray

  override protected def nullSafeEval(pairs: Any): Any =
    GraftHashKernels.sparseMargin(pairs.asInstanceOf[ArrayData], wArr, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("sparseMarginW", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.sparseMargin($c, $wRef, $bias)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 64-bit SimHash of an `array<string>` token column. Stays inside
  * whole-stage codegen (the generated code calls the static kernel — no UDF
  * boundary, no Seq[String] materialization). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.simhash64(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // scalac emits static forwarders for object methods — generated Java
    // calls the kernel directly, staying inside the codegen'd stage
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash signature (`array<string> -> array<bigint>`) with the
  * permutation constants compiled into the plan. Constants are `Seq`s (not
  * arrays) so expression equality/canonicalization compares by content and
  * identical signature computations stay exchange-reusable. */
case class MinHashSigExpr(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {
  require(as.length == bs.length && as.nonEmpty, "permutation constants mismatch")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val aArr = as.toArray
  @transient private lazy val bArr = bs.toArray

  override protected def nullSafeEval(shingles: Any): Any =
    GraftHashKernels.minhashSig(shingles.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the constants via a codegen object reference (arrays as literals
    // would re-parse k=128 longs per generated class)
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.minhashSig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native md5-31 key hash (`string -> bigint`) — the split/sample kernel. */
case class Md5Hash31Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = false // null key hashes to 0, like the UDF
  override def prettyName: String = "md5_hash31"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    GraftHashKernels.md5Hash31(
      child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val kernel = GraftHashKernels.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = $kernel.md5Hash31(${c.isNull} ? null : ${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native banded LSH keys (`array<bigint> -> array<bigint>`). */
case class LshBandKeysExpr(child: Expression, bands: Int) extends UnaryExpression {
  require(bands >= 1, s"bands must be >= 1, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_band_keys"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(sig: Any): Any =
    GraftHashKernels.lshBandKeys(sig.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.lshBandKeys($c, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native max single-token frequency (`array<string> -> bigint`). */
case class MaxTokenFreqExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "max_token_freq"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  override protected def nullSafeEval(tokens: Any): Any =
    GraftHashKernels.maxTokenFreq(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.maxTokenFreq($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native lineDedup rebuild (`array<string> -> array<string>`): drops
  * segments whose `xxhash64` lands in the corpus-frequency blocklist (see
  * [[GraftHashKernels.filterSegsNotInHash]]). The blocklist rides sorted as
  * a codegen reference object like [[LinearScoreExpr]]'s weights — one
  * task-binary copy per executor, never per-element plan literals (a 2e6
  * entry `IN` list would be a 2M-node expression tree). Constants are a
  * Seq so expression equality / canonicalization compares by content. */
case class SegmentsNotInHashExpr(child: Expression, blockedHashes: Seq[Long])
    extends UnaryExpression {
  require(blockedHashes.nonEmpty,
    "blockedHashes must be non-empty — an empty blocklist should skip the " +
      "rebuild entirely (the caller short-circuits)")

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "segments_not_in_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val sorted: Array[Long] = {
    val a = blockedHashes.toArray
    java.util.Arrays.sort(a)
    a
  }

  override protected def nullSafeEval(segs: Any): Any =
    GraftHashKernels.filterSegsNotInHash(segs.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockedHashes", sorted, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.filterSegsNotInHash($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native lineDedup exact-verify rebuild: drops segments whose TEXT is in
  * the verified blocklist (see [[GraftHashKernels.filterSegsNotInText]]).
  * Same reference-object discipline as [[SegmentsNotInHashExpr]]; the
  * UTF8String conversion happens once at plan build, not per row. */
case class SegmentsNotInTextExpr(child: Expression, blockedTexts: Seq[String])
    extends UnaryExpression {
  require(blockedTexts.nonEmpty,
    "blockedTexts must be non-empty — an empty blocklist should skip the " +
      "rebuild entirely (the caller short-circuits)")

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "segments_not_in_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val sorted: Array[AnyRef] = {
    val a: Array[AnyRef] =
      blockedTexts.map(t => UTF8String.fromString(t): AnyRef).toArray
    java.util.Arrays.sort(a)
    a
  }

  override protected def nullSafeEval(segs: Any): Any =
    GraftHashKernels.filterSegsNotInText(segs.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockedTexts", sorted, "java.lang.Object[]")
    defineCodeGen(ctx, ev, c =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.filterSegsNotInText($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native paragraphDedup rebuild (`(array<string>, array<int>) ->
  * array<string>`): drops the segments at the given ascending 0-based
  * positions (see [[GraftHashKernels.dropSegsByIndex]]). The drop set is a
  * per-row COLUMN (each document excises its own duplicate positions), so
  * unlike the blocklist rebuilds it is a second child expression, not a
  * reference object — keeping the per-row filter inside whole-stage
  * codegen instead of an interpreted `filter(transform(...))` lambda
  * chain. */
case class DropSegmentsByIndexExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "drop_segments_by_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(segs: Any, drops: Any): Any =
    GraftHashKernels.dropSegsByIndex(
      segs.asInstanceOf[ArrayData], drops.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, d) =>
      s"${GraftHashKernels.getClass.getName.stripSuffix("$")}.dropSegsByIndex($s, $d)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HashSketchExpressions {

  private def arity(fn: String, c: Seq[Expression], n: Int): Unit =
    if (c.length != n) throw new IllegalArgumentException(
      s"$fn requires exactly $n argument(s), got ${c.length}")

  private def litInt(fn: String, e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an INT literal (e.g. 3), got ${other.sql}")
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (c: Seq[Expression]) => { arity("simhash64", c, 1); SimHash64Expr(c(0)) }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "word_shingles"),
      (c: Seq[Expression]) => {
        arity("word_shingles", c, 2)
        ShinglesExpr(c(0), litInt("word_shingles", c(1), "shingle size"))
      }),
    (FunctionIdentifier("shingle_hash_set"),
      new ExpressionInfo(classOf[ShingleHashSetExpr].getName, "shingle_hash_set"),
      (c: Seq[Expression]) => {
        arity("shingle_hash_set", c, 1); ShingleHashSetExpr(c(0))
      }),
    (FunctionIdentifier("md5_hash31"),
      new ExpressionInfo(classOf[Md5Hash31Expr].getName, "md5_hash31"),
      (c: Seq[Expression]) => { arity("md5_hash31", c, 1); Md5Hash31Expr(c(0)) }),
    (FunctionIdentifier("lsh_band_keys"),
      new ExpressionInfo(classOf[LshBandKeysExpr].getName, "lsh_band_keys"),
      (c: Seq[Expression]) => {
        arity("lsh_band_keys", c, 2)
        LshBandKeysExpr(c(0), litInt("lsh_band_keys", c(1), "bands"))
      }),
    (FunctionIdentifier("max_token_freq"),
      new ExpressionInfo(classOf[MaxTokenFreqExpr].getName, "max_token_freq"),
      (c: Seq[Expression]) => { arity("max_token_freq", c, 1); MaxTokenFreqExpr(c(0)) }),
    (FunctionIdentifier("hashing_tf"),
      new ExpressionInfo(classOf[HashingTfExpr].getName, "hashing_tf"),
      (c: Seq[Expression]) => {
        arity("hashing_tf", c, 2)
        HashingTfExpr(c(0), litInt("hashing_tf", c(1), "dim"))
      }),
    (FunctionIdentifier("hashing_tf_sparse"),
      new ExpressionInfo(classOf[HashingTfSparseExpr].getName, "hashing_tf_sparse"),
      (c: Seq[Expression]) => {
        arity("hashing_tf_sparse", c, 2)
        HashingTfSparseExpr(c(0), litInt("hashing_tf_sparse", c(1), "dim"))
      }),
    (FunctionIdentifier("drop_segments_by_index"),
      new ExpressionInfo(classOf[DropSegmentsByIndexExpr].getName,
        "drop_segments_by_index"),
      (c: Seq[Expression]) => {
        arity("drop_segments_by_index", c, 2)
        DropSegmentsByIndexExpr(c(0), c(1))
      }))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-API form: codegen'd simhash64 over a token array column. */
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(tokens)))

  /** Column-API form: codegen'd distinct word n-gram shingles. */
  def wordShingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(tokens), n))

  /** Column-API form: codegen'd sorted distinct md5-31 shingle hash set. */
  def shingleHashSet(shingles: Column): Column =
    ExpressionUtils.column(ShingleHashSetExpr(ExpressionUtils.expression(shingles)))

  /** Column-API form: codegen'd md5-31 key hash (null key -> 0). */
  def md5Hash31(key: Column): Column =
    ExpressionUtils.column(Md5Hash31Expr(ExpressionUtils.expression(key)))

  /** Column-API form: codegen'd banded LSH keys over a signature array. */
  def lshBandKeys(sig: Column, bands: Int): Column =
    ExpressionUtils.column(LshBandKeysExpr(ExpressionUtils.expression(sig), bands))

  /** Column-API form: codegen'd max single-token frequency. */
  def maxTokenFreq(tokens: Column): Column =
    ExpressionUtils.column(MaxTokenFreqExpr(ExpressionUtils.expression(tokens)))

  /** Column-API form: codegen'd blocked-hash segment filter (the lineDedup
    * rebuild; blocklist rides as a reference object). */
  def segmentsNotInHash(segs: Column, blockedHashes: Seq[Long]): Column =
    ExpressionUtils.column(
      SegmentsNotInHashExpr(ExpressionUtils.expression(segs), blockedHashes))

  /** Column-API form: codegen'd blocked-text segment filter (the lineDedup
    * exact-verify rebuild). */
  def segmentsNotInText(segs: Column, blockedTexts: Seq[String]): Column =
    ExpressionUtils.column(
      SegmentsNotInTextExpr(ExpressionUtils.expression(segs), blockedTexts))

  /** Column-API form: codegen'd per-row positional segment filter (the
    * paragraphDedup rebuild; the drop set is a column, not a constant). */
  def dropSegmentsByIndex(segs: Column, dropIdx: Column): Column =
    ExpressionUtils.column(DropSegmentsByIndexExpr(
      ExpressionUtils.expression(segs), ExpressionUtils.expression(dropIdx)))

  /** Column-API form: codegen'd hashing-trick TF vector of width `dim`. */
  def hashingTf(tokens: Column, dim: Int): Column =
    ExpressionUtils.column(HashingTfExpr(ExpressionUtils.expression(tokens), dim))

  /** Column-API form: codegen'd DSIR unigram+bigram feature buckets. */
  def dsirBuckets(tokens: Column, dim: Int): Column =
    ExpressionUtils.column(DsirBucketsExpr(ExpressionUtils.expression(tokens), dim))

  /** Column-API form: codegen'd n-gram LM (ctx_h, tok_h) pairs. */
  def ngramPairs(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramPairsExpr(ExpressionUtils.expression(tokens), n))

  /** Column-API form: codegen'd positional k-gram xxhash64 stream. */
  def gramXxHashes(tokens: Column, k: Int): Column =
    ExpressionUtils.column(GramXxHashesExpr(ExpressionUtils.expression(tokens), k))

  /** Column-API form: codegen'd SPARSE hashing-trick TF — non-zero
    * `(bucket, tf)` structs only; the scale-safe form for large `dim`. */
  def hashingTfSparse(tokens: Column, dim: Int): Column =
    ExpressionUtils.column(HashingTfSparseExpr(ExpressionUtils.expression(tokens), dim))

  /** Column-API form: codegen'd one-pass linear-model score over a token
    * array (weights ship as a codegen reference object, like minhashSig's
    * permutation constants — Column-API-only for the same reason). */
  def linearScore(tokens: Column, weights: Seq[Double], bias: Double): Column =
    ExpressionUtils.column(
      LinearScoreExpr(ExpressionUtils.expression(tokens), weights, bias))

  /** Column-API form: codegen'd linear margin over pre-hashed sparse
    * (bucket, tf) pairs — the gradient-descent inner product. */
  def sparseMargin(pairs: Column, weights: Seq[Double], bias: Double): Column =
    ExpressionUtils.column(
      SparseMarginExpr(ExpressionUtils.expression(pairs), weights, bias))

  /** Column-API form: codegen'd MinHash signature over a shingle array. */
  def minhashSig(shingles: Column, as: Seq[Long], bs: Seq[Long]): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(shingles), as, bs))

  /** Distributed bloom-filter build over a LONG column (pair with
    * `xxhash64` of the value): Spark's own runtime-filter aggregate
    * (`BloomFilterAggregate`), exposed for explicit pipeline use. Returns
    * one BINARY row — the serialized sketch. `nItems`/`nBits` are clamped
    * by the runtime-filter confs (`spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems` / `.maxNumBits`); raise those for very large probe
    * sets. */
  def bloomAggregate(hashed: Column, nItems: Long, nBits: Long): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ExpressionUtils.expression(hashed),
        Literal(nItems), Literal(nBits)).toAggregateExpression())

  /** Membership probe against a serialized bloom sketch (codegen'd
    * `BloomFilterMightContain`; the sketch deserializes once per task).
    * `hashed` must be the same `xxhash64` the build side inserted. */
  def bloomMightContain(bloom: Array[Byte], hashed: Column): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloom, BinaryType),
        ExpressionUtils.expression(hashed)))
}
