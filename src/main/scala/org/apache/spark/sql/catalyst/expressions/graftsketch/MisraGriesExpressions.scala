package org.apache.spark.sql.catalyst.expressions.graftsketch

import scala.collection.mutable

import org.apache.spark.sql.{Column, classic}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * MERGEABLE MISRA-GRIES heavy-hitter summaries (Misra & Gries 1982;
 * mergeability per Agarwal et al. 2013, "Mergeable summaries") — the
 * frequent-items sibling of the KLL quantile sketches: at most `k - 1`
 * (key, counter) pairs of state with the guarantee that EVERY item whose
 * true frequency exceeds `n / k` survives in the summary, at any corpus
 * size, under any partitioning, after any merge order.
 *
 * The guarantee is one-sided (the summary may also hold infrequent
 * stowaways and its counters undercount by at most `n / k`), which is why
 * [[graft.ops.SketchOps.heavyHitters]] uses this aggregate as the CANDIDATE
 * step of a two-phase exact query: MG narrows 10^9 distinct keys to k
 * candidates in one pass with kilobytes of state, then an exact recount of
 * the candidates alone (a broadcast-membership scan) restores exact counts
 * and drops the stowaways. The final answer is deterministic even though
 * the intermediate summary content is partition-order-dependent.
 *
 * Spark-first shape: a `TypedImperativeAggregate` — the counter map lives
 * in the hash-aggregate buffer, serializes only at shuffle boundaries, and
 * map-side partials mean the shuffle carries at most `k - 1` counters per
 * task regardless of row count (the same contract as Spark's own
 * `hll_sketch_agg`).
 */
object MisraGriesExpressions {
  import classic.ExpressionUtils

  /** Aggregate a string key column into the MG candidate-key array
    * (sorted, ≤ k-1 entries). Superset guarantee: contains every key with
    * true count > n/k. */
  def mgCandidatesAgg(key: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(key), k)
        .toAggregateExpression())

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  /** SQL registration (GraftExtensions): mg_candidates_agg(key, k). */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("mg_candidates_agg"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "mg_candidates_agg"),
      (c: Seq[Expression]) => {
        require(c.length == 2, s"mg_candidates_agg expects 2 arguments, got ${c.length}")
        val k = c(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"mg_candidates_agg: k must be an integer literal, got $other")
        }
        MisraGriesAgg(c(0), k)
      }))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `mg_candidates_agg(key, k)`: one Misra-Gries summary per group, emitted
  * as the SORTED array of surviving keys. Null keys are skipped (profile
  * them with [[graft.ops.StatsOps.keySkewProfile]], which keeps nulls
  * visible by design — here a null can never be a *string* heavy hitter
  * of the exploded-token use case this serves). */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= 1000000,
    s"mg_candidates_agg: k must be in [2, 1e6], got $k")

  override def prettyName: String = "mg_candidates_agg"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      row: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(row)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k - 1 => buf.update(key, 1L)
        case None =>
          // classic MG decrement-all step: every counter pays one, zeros
          // evicted — amortized O(1) per input (each decrement is funded
          // by a prior increment)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (kk, c) => if (c <= 0) dead += kk }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > k - 1) {
      // mergeable-summaries shrink: subtract the k-th largest counter
      // from all, drop non-positives -> back to ≤ k-1 entries with total
      // error still bounded by n/k
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k - 1) - 1) // k-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - pivot)
      a.foreach { case (kk, c) => if (c <= 0) dead += kk }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}
