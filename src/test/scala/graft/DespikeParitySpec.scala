package graft

import org.apache.spark.sql.functions._

import graft.ops.Cast

/** The despike kernel (per-cast sequential loop, the fast path) must be
  * BIT-IDENTICAL to the declarative window formulation it replaced — the
  * kernel replicates Spark's Average/CentralMomentAgg recurrences
  * operation-for-operation, so any divergence (ulp drift, null/tail-rule
  * mismatch) is a bug. This is what keeps the q09 DuckDB oracle valid
  * without re-deriving it. */
class DespikeParitySpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  test("kernel == windowed despike bit-for-bit on multi-cast data with " +
       "nulls, spikes, short casts, and a NaN") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (for {
      cast <- 0 until 5
      i    <- 0 until (if (cast == 4) 3 else 200) // cast 4 shorter than block
    } yield {
      val base = math.sin(i / 7.0) * 10 + cast
      val v: java.lang.Double =
        if (cast == 1 && i == 50) null                     // hole
        else if (cast == 2 && i == 60) Double.NaN          // poison
        else if (i % 37 == 0) base + 500.0                 // spike
        else base + rnd.nextGaussian()
      (cast.toLong, i.toLong, v)
    }).toSeq
    val df = rows.toDF("cast_id", "scan_order", "value")
      .withColumn("v2", col("value") * 2 + 1) // second channel
    val cols = Seq("value", "v2")

    def collect(d: org.apache.spark.sql.DataFrame): Seq[Row] =
      d.select("cast_id", "scan_order", "value", "v2")
        .orderBy("cast_id", "scan_order").collect().toSeq

    val kern = collect(Cast.despike(df, "cast_id", "scan_order", cols,
      n1 = 2.0, n2 = 6.0, block = 16))
    val wind = collect(Cast.despikeWindowed(df, "cast_id", "scan_order",
      cols, n1 = 2.0, n2 = 6.0, block = 16))
    assert(kern.length == wind.length)
    kern.zip(wind).foreach { case (a, b) =>
      // bit-level comparison: NaN == NaN, -0.0 != 0.0
      def bits(r: Row, i: Int): Any =
        if (r.isNullAt(i)) null
        else java.lang.Double.doubleToLongBits(r.getDouble(i))
      assert((0 until 4).forall(i =>
        (a.isNullAt(i) && b.isNullAt(i)) ||
        (i < 2 && a.get(i) == b.get(i)) ||
        (i >= 2 && bits(a, i) == bits(b, i))), s"kernel $a != windowed $b")
    }
    // sanity: the op actually did something (spikes nulled, NaN kept)
    assert(kern.exists(r => r.isNullAt(2)), "no spike was nulled")
    assert(kern.exists(r => !r.isNullAt(2) && r.getDouble(2).isNaN),
      "NaN input must survive as NaN, not become null")
  }
}
