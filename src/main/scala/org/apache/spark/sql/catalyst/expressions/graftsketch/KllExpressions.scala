package org.apache.spark.sql.catalyst.expressions.graftsketch

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, classic}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/**
 * MERGEABLE QUANTILE SKETCHES over the bundled Apache DataSketches KLL
 * library (Karnin-Lang-Liberty 2016, "Optimal quantile approximation in
 * streams") — the quantile sibling of the engine's HLL distinct-count
 * sketches: per-batch/per-shard sketches land as BYTES, union later with
 * no re-scan, and answer any-rank quantile queries with a proven
 * `~1.7/k`-ish rank-error bound at a few KB of state per group.
 *
 * Spark-first shape: both aggregates are `TypedImperativeAggregate`s —
 * the sketch object lives in the hash-aggregate buffer and serializes
 * ONLY at shuffle boundaries (the same machinery Spark's own
 * `hll_sketch_agg` / `approx_percentile` ride), so building is one
 * two-phase aggregation with map-side partials of sketch-sized state.
 *
 * Where Spark's built-in `approx_percentile` answers quantiles in one
 * query, these persist the INTERMEDIATE state: the property that lets a
 * 100 TB corpus keep per-(day, source) sketches and later answer "p99
 * doc length over any month x source slice" from kilobytes of summaries.
 * Estimates are approximate (rank error, not value error) and the merge
 * of shard sketches answers within the same bound as a single pass.
 */
object KllExpressions {
  import classic.ExpressionUtils

  /** Aggregate a double column into one KLL sketch (binary). */
  def kllSketchAgg(value: Column, k: Int = 200): Column =
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(value), k)
        .toAggregateExpression())

  /** Merge a column of KLL sketch bytes into one sketch (binary). */
  def kllMergeAgg(sketch: Column): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(sketch))
        .toAggregateExpression())

  /** Quantile at `rank` in [0, 1] from sketch bytes (inclusive search
    * criteria — DataSketches' default); null for a null/empty sketch. */
  def kllQuantile(sketch: Column, rank: Double): Column =
    ExpressionUtils.column(
      KllQuantile(ExpressionUtils.expression(sketch),
        org.apache.spark.sql.catalyst.expressions.Literal(rank)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}

  private def arity(name: String, c: Seq[Expression], n: Int): Unit =
    require(c.length == n, s"$name expects $n arguments, got ${c.length}")
  private def litInt(name: String, e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$name: $what must be an integer literal, got $e")
  }

  /** SQL registration (GraftExtensions): kll_sketch_agg / kll_merge_agg /
    * kll_quantile. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (c: Seq[Expression]) => {
        arity("kll_sketch_agg", c, 2)
        KllSketchAgg(c(0), litInt("kll_sketch_agg", c(1), "k"))
      }),
    (FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (c: Seq[Expression]) => { arity("kll_merge_agg", c, 1); KllMergeAgg(c(0)) }),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (c: Seq[Expression]) => {
        arity("kll_quantile", c, 2)
        // SQL literals like 0.5 parse as DECIMAL(1,1) — admit any numeric
        // rank at the SQL surface by casting up front (the expression
        // itself still requires a strict double)
        val rank = c(1).dataType match {
          case DoubleType => c(1)
          case _: NumericType =>
            org.apache.spark.sql.catalyst.expressions.Cast(c(1), DoubleType)
          case _ => c(1) // let checkInputDataTypes produce the typed error
        }
        KllQuantile(c(0), rank)
      }))

  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** `kll_sketch_agg(value, k)`: build one KLL doubles sketch per group.
  * Null inputs are skipped; an all-null group yields an EMPTY sketch's
  * bytes (not null), so downstream merges stay total. */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k must be in [8, 65535], got $k")

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric column, got ${t.catalogString}")
  }

  private lazy val toDouble =
    org.apache.spark.sql.catalyst.expressions.Cast(child, DoubleType)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = toDouble.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_merge_agg(sketch_bytes)`: union a column of landed sketches —
  * per-batch sketches answer corpus-wide quantiles with no re-scan. The
  * merged capacity follows the inputs' (DataSketches keeps the smallest
  * k among merged sketches, the error-dominant one). Null rows skip. */
case class KllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires sketch bytes (binary), got ${t.catalogString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance()

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_quantile(sketch_bytes, rank)`: point-read a sketch. Interpreted
  * eval only — it runs on AGGREGATED rows (one per group), never in a
  * per-corpus-row hot path, so codegen would buy nothing. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, double), got " +
        s"(${l.catalogString}, ${r.catalogString})")
    }

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val r = right.eval(input)
    if (s == null || r == null) null
    else {
      val sk = KllDoublesSketch.heapify(
        Memory.wrap(s.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null else sk.getQuantile(r.asInstanceOf[Double])
    }
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
}
