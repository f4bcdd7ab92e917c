/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * names a private[sql] type — the standard pattern for third-party native
 * expressions (same as graftarray / graftgsw / graftdedup).
 */
package org.apache.spark.sql.catalyst.expressions.grafttext

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled BPE merge table (r16 rewrite of the string-keyed form). The
 * old kernel built a `left + NUL + right` String key for EVERY adjacent
 * pair at EVERY merge round — O(word-length x rounds) string concats and
 * hash-of-string probes per word, the dominant cost of q86/q86b. Here
 * symbols are interned to dense int ids once at plan time, the pair
 * lookup is an allocation-free open-addressed probe on the packed
 * `(left << 32) | right` long, merge products are precomputed
 * UTF8Strings, and — BPE being a pure function of the word — a bounded
 * per-table memo makes repeated words (the Zipf bulk of any corpus) a
 * single hash lookup, the standard tokenizer-cache design. The greedy
 * itself is unchanged operation-for-operation: lowest-rank adjacent pair
 * (first merge-list occurrence wins for duplicate pairs, as putIfAbsent
 * did), merge ALL its non-overlapping occurrences left-to-right, repeat
 * until no adjacent pair is in the table. BpeOracleParitySpec and the
 * q41/q86/q86b oracles pin output equality.
 */
final class BpeTable(merges: Seq[(String, String)]) extends Serializable {
  // symbol universe: every merge component and product, interned by
  // string; ids are dense and >= 0
  private val symId = new java.util.HashMap[String, Integer]()
  private val symStrs = new java.util.ArrayList[String]()
  private def intern(s: String): Int = {
    val got = symId.get(s)
    if (got != null) got.intValue()
    else {
      val id = symStrs.size()
      symId.put(s, Integer.valueOf(id)); symStrs.add(s); id
    }
  }
  // open-addressed pair table: key = (leftId << 32) | rightId (ids are
  // non-negative, so key >= 0 and -1L is a safe empty sentinel); first
  // insertion wins (the old putIfAbsent rule). Capacity is a power of
  // two >= 4x entries — short probe chains.
  private val cap: Int = {
    var c = 8
    while (c < math.max(8, merges.size * 4)) c <<= 1
    c
  }
  private val keyArr = Array.fill[Long](cap)(-1L)
  private val rankArr = new Array[Int](cap)
  private val prodArr = new Array[Int](cap)
  merges.zipWithIndex.foreach { case ((l, r), rank) =>
    val key = (intern(l).toLong << 32) | (intern(r).toLong & 0xffffffffL)
    val prod = intern(l + r)
    var slot = java.lang.Long.hashCode(key) & (cap - 1)
    var placed = false
    while (!placed) {
      if (keyArr(slot) == -1L) {
        keyArr(slot) = key; rankArr(slot) = rank; prodArr(slot) = prod
        placed = true
      } else if (keyArr(slot) == key) placed = true // first wins
      else slot = (slot + 1) & (cap - 1)
    }
  }
  /** Probe slot for the pair key, or -1 when the pair is unmergeable. */
  private def slotOf(a: Int, b: Int): Int = {
    val key = (a.toLong << 32) | (b.toLong & 0xffffffffL)
    var slot = java.lang.Long.hashCode(key) & (cap - 1)
    while (true) {
      val k = keyArr(slot)
      if (k == key) return slot
      if (k == -1L) return -1
      slot = (slot + 1) & (cap - 1)
    }
    -1
  }
  private val symUtf8: Array[UTF8String] = {
    val a = new Array[UTF8String](symStrs.size())
    var i = 0
    while (i < a.length) {
      a(i) = UTF8String.fromString(symStrs.get(i)); i += 1
    }
    a
  }
  private val eowId: Int = {
    val got = symId.get("</w>")
    if (got != null) got.intValue() else -1
  }
  @transient private lazy val eowUtf8 = UTF8String.fromString("</w>")
  // bounded pure-function memo: word -> segmentation, shared by every
  // task thread running this plan. Insertion stops at the bound; the
  // hot head of the Zipf distribution is cached long before that.
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[AnyRef]]()
  private val memoMax = 1 << 17

  /** Encode one word: code-point symbols + terminal `</w>`, the exact
    * greedy of the old kernel, over int ids. */
  private def compute(word: String): Array[AnyRef] = {
    var cpCount = 0
    var i = 0
    while (i < word.length) {
      i += Character.charCount(word.codePointAt(i)); cpCount += 1
    }
    var size = cpCount + 1
    val ids = new Array[Int](size)
    // raw UTF8 for symbols outside the merge universe — they can never
    // merge and are emitted verbatim
    val raw = new Array[AnyRef](size)
    i = 0
    var k = 0
    while (i < word.length) {
      val cc = Character.charCount(word.codePointAt(i))
      val s = word.substring(i, i + cc)
      val got = symId.get(s)
      if (got != null) ids(k) = got.intValue()
      else { ids(k) = -1; raw(k) = UTF8String.fromString(s) }
      i += cc; k += 1
    }
    ids(cpCount) = eowId
    if (eowId < 0) raw(cpCount) = eowUtf8
    var done = false
    while (!done && size > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < size - 1) {
        if (ids(j) >= 0 && ids(j + 1) >= 0) {
          val s = slotOf(ids(j), ids(j + 1))
          if (s >= 0 && rankArr(s) < bestRank) bestRank = rankArr(s)
        }
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // merge all non-overlapping occurrences left-to-right, in place
        var w = 0
        var p = 0
        while (p < size) {
          var mergedHere = false
          if (p < size - 1 && ids(p) >= 0 && ids(p + 1) >= 0) {
            val s = slotOf(ids(p), ids(p + 1))
            if (s >= 0 && rankArr(s) == bestRank) {
              ids(w) = prodArr(s); raw(w) = null
              p += 2; mergedHere = true
            }
          }
          if (!mergedHere) { ids(w) = ids(p); raw(w) = raw(p); p += 1 }
          w += 1
        }
        size = w
      }
    }
    val out = new Array[AnyRef](size)
    var m = 0
    while (m < size) {
      out(m) = if (ids(m) >= 0) symUtf8(ids(m)) else raw(m)
      m += 1
    }
    out
  }

  def encodeWord(word: String): Array[AnyRef] = {
    val hit = memo.get(word)
    if (hit != null) return hit
    val res = compute(word)
    if (memo.size() < memoMax) memo.put(word, res)
    res
  }
}

/** Static kernels shared by eval and generated code. */
object GraftTextKernels {

  /** One pass over the UTF-8 bytes counting `[A-Za-z]`, `[0-9]`, and
    * `[.,;:!?]` occurrences. All three classes are pure ASCII, and UTF-8
    * continuation bytes are >= 0x80, so a byte scan counts code points
    * exactly — this replaces THREE `regexp_count` scans of the document
    * (the dominant cost of the quality query). */
  def asciiClassCounts(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var alpha = 0L
    var digit = 0L
    var punct = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      else if (b >= '0' && b <= '9') digit += 1
      else if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?') punct += 1
      i += 1
    }
    new GenericArrayData(Array(alpha, digit, punct))
  }

  // per-thread Deflater + output buffer, reset() between rows: native
  // zlib stream init/free and an 8 KB allocation per DOCUMENT would
  // dominate the actual compression work on short web snippets
  private val deflaters = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(6, true))
  private val deflateBuf = ThreadLocal.withInitial[Array[Byte]](
    () => new Array[Byte](8192))

  /** Raw-DEFLATE compression ratio of the UTF-8 bytes (compressed length /
    * raw length, level 6, no zlib wrapper): the Gopher/DCLM-style
    * boilerplate signal — templated or repetitive documents compress far
    * below natural prose (ratio < ~0.2 vs ~0.4–0.7), and the signal needs
    * no tokenizer, language model, or vocabulary. Deterministic for a
    * given JVM's zlib (spec pins behavior via a reference call, not golden
    * bytes). Empty input → 1.0 (incompressible by convention). */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = deflateBuf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  /** Count of tokens that are members of the marker set (byte-equality on
    * UTF8String — identical to string equality for UTF-8). */
  def markerHits(tokens: ArrayData, markers: java.util.HashSet[UTF8String]): Long = {
    val n = tokens.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && markers.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  def toMarkerSet(markers: Seq[String]): java.util.HashSet[UTF8String] = {
    val set = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => set.add(UTF8String.fromString(m)))
    set
  }

  /** BPE-encode a token array into the flat subword stream. */
  def bpeEncode(tokens: ArrayData, table: BpeTable): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val segs = table.encodeWord(tokens.getUTF8String(i).toString)
        var k = 0
        while (k < segs.length) { out.add(segs(k)); k += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Tokenize with 1-based inclusive CHARACTER offsets into the ORIGINAL
    * text: returns `struct(toks, starts, ends)` where `toks` are the
    * lowercased alphanumeric runs and `substring(text, starts[i],
    * ends[i] - starts[i] + 1)` is token i's original spelling — the
    * provenance a RAG indexer needs to display source passages.
    *
    * ASCII fast path scans bytes (byte index == char index there); the
    * non-ASCII path walks code points so offsets match `substring`
    * semantics (code-point counting) in Spark and DuckDB. Token chars are
    * classified per code point via `Character.toLowerCase`, which agrees
    * with `lower()`-then-regexp tokenization everywhere except one-to-many
    * case folds (e.g. U+0130 lowercases to two code points in `lower()`) —
    * those cannot carry original-text offsets at all, which is why this
    * kernel folds per code point. */
  def tokenizeWithOffsets(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (i < bytes.length && ascii) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    val toks = new java.util.ArrayList[Any]()
    val starts = new java.util.ArrayList[Any]()
    val ends = new java.util.ArrayList[Any]()
    if (ascii) {
      var p = 0
      while (p < bytes.length) {
        val b = bytes(p)
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
            (b >= '0' && b <= '9')) {
          val st = p
          while (p < bytes.length && {
            val c = bytes(p)
            (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
          }) p += 1
          val tok = new Array[Byte](p - st)
          var k = st
          while (k < p) {
            val c = bytes(k)
            tok(k - st) = if (c >= 'A' && c <= 'Z') (c | 0x20).toByte else c
            k += 1
          }
          toks.add(UTF8String.fromBytes(tok))
          starts.add(st + 1)
          ends.add(p) // p is one past the last token byte; 1-based inclusive
        } else p += 1
      }
    } else {
      val str = s.toString
      val sb = new java.lang.StringBuilder
      var cp = 0 // 1-based code-point position of the CURRENT code point - 1
      var j = 0  // UTF-16 index
      var tokStart = -1
      def flush(endCp: Int): Unit = if (tokStart >= 0) {
        toks.add(UTF8String.fromString(sb.toString))
        starts.add(tokStart)
        ends.add(endCp)
        sb.setLength(0)
        tokStart = -1
      }
      while (j < str.length) {
        val c = str.codePointAt(j)
        val lc = Character.toLowerCase(c)
        cp += 1
        if ((lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')) {
          if (tokStart < 0) tokStart = cp
          sb.appendCodePoint(lc)
        } else flush(cp - 1)
        j += Character.charCount(c)
      }
      flush(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new GenericArrayData(toks.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(starts.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(ends.toArray.asInstanceOf[Array[Any]])))
  }

  /** Unicode NFC normalization with an ASCII fast path: pure-ASCII byte
    * sequences (the overwhelming share of a web corpus) return the input
    * UTF8String untouched — no String materialization, no Normalizer call.
    * Already-normalized non-ASCII text also avoids the rebuild via
    * `isNormalized`. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) {
        val str = s.toString
        if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC))
          return s
        return UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s
  }
}

/** `string -> array<bigint>` of [alpha, digit, punct] counts in one byte
  * pass (see [[GraftTextKernels.asciiClassCounts]]). */
case class AsciiClassCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_class_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.asciiClassCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.asciiClassCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> bigint` marker-set membership count; the set is a
  * plan constant shipped as a codegen reference. `markers` is a Seq so
  * expression equality compares by content. */
case class MarkerHitsExpr(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val set = GraftTextKernels.toMarkerSet(markers)

  override protected def nullSafeEval(tokens: Any): Any =
    GraftTextKernels.markerHits(tokens.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set, classOf[java.util.HashSet[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.markerHits($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<string> -> array<string>` BPE segmentation of a token array
  * under a learned merge list; the compiled rank table rides as a codegen
  * reference object (see [[GraftTextKernels.bpeEncode]]). `merges` is a
  * Seq so expression equality compares by content. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.catalogString}")
  }

  @transient private lazy val table = new BpeTable(merges)

  override protected def nullSafeEval(tokens: Any): Any =
    GraftTextKernels.bpeEncode(tokens.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.bpeEncode($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> string` Unicode NFC normalization (composed form), matching
  * DuckDB's `nfc_normalize` / Python's `unicodedata.normalize('NFC', s)`.
  * ASCII rows pass through zero-copy (see [[GraftTextKernels.nfcNormalize]]). */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.nfcNormalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> double` raw-deflate compression ratio (see
  * [[GraftTextKernels.deflateRatio]]) — the tokenizer-free
  * repetition/boilerplate quality signal, one codegen'd pass per doc. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.deflateRatio(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `string -> struct<toks: array<string>, starts: array<int>, ends:
  * array<int>>` tokenizer with 1-based inclusive character offsets into the
  * original text (see [[GraftTextKernels.tokenizeWithOffsets]]). */
case class TokenizeWithOffsetsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("starts", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ends", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tokenize_with_offsets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    GraftTextKernels.tokenizeWithOffsets(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${GraftTextKernels.getClass.getName.stripSuffix("$")}.tokenizeWithOffsets($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernelExpressions {

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("ascii_class_counts"),
      new ExpressionInfo(classOf[AsciiClassCountsExpr].getName, "ascii_class_counts"),
      (c: Seq[Expression]) => AsciiClassCountsExpr(c(0))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (c: Seq[Expression]) => NfcNormalizeExpr(c(0))),
    (FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName, "deflate_ratio"),
      (c: Seq[Expression]) => DeflateRatioExpr(c(0))),
    (FunctionIdentifier("tokenize_with_offsets"),
      new ExpressionInfo(classOf[TokenizeWithOffsetsExpr].getName, "tokenize_with_offsets"),
      (c: Seq[Expression]) => TokenizeWithOffsetsExpr(c(0))))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  /** Column-API form: [alpha, digit, punct] counts in one byte pass. */
  def asciiClassCounts(text: Column): Column =
    ExpressionUtils.column(AsciiClassCountsExpr(ExpressionUtils.expression(text)))

  /** Column-API form: marker-set membership count over a token array. */
  def markerHits(tokens: Column, markers: Seq[String]): Column =
    ExpressionUtils.column(MarkerHitsExpr(ExpressionUtils.expression(tokens), markers))

  /** Column-API form: Unicode NFC normalization, ASCII rows zero-copy. */
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))

  /** Column-API form: raw-deflate compression ratio (boilerplate signal). */
  def deflateRatio(text: Column): Column =
    ExpressionUtils.column(DeflateRatioExpr(ExpressionUtils.expression(text)))

  /** Column-API form: tokens with 1-based character offsets into the
    * original text. */
  def tokenizeWithOffsets(text: Column): Column =
    ExpressionUtils.column(TokenizeWithOffsetsExpr(ExpressionUtils.expression(text)))

  /** Column-API form: BPE segmentation of a token array under a learned
    * merge list. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncodeExpr(ExpressionUtils.expression(tokens), merges))
}
