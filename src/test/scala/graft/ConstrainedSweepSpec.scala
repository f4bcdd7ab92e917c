package graft

import org.apache.spark.sql.functions._

/**
 * The constrained-heap sweep ([[ConstrainedSweep]]) compares two passes of
 * the full query contract by an executor-side multiset digest — so the
 * digest itself must be invariant to everything that legitimately differs
 * between `local[32]` and `local-cluster[2,2,1024]` (row order,
 * partitioning, map-entry iteration order) and sensitive to everything
 * that must not (a value, a row, a duplicate).
 */
class ConstrainedSweepSpec extends SparkTestBase {
  import spark.implicits._

  test("digest is invariant to row order and partitioning") {
    val base = spark.range(0L, 1000L).select(col("id"),
      (col("id") % 7).cast("string").as("s"),
      (col("id") * 0.5).as("d"))
    val a = ConstrainedSweep.digest(base.repartition(13))
    val b = ConstrainedSweep.digest(base.orderBy(col("id").desc).coalesce(1))
    assert(a == b)
    assert(a._1 == 1000L)
  }

  test("digest separates value changes, dropped rows, and duplicates") {
    val base = spark.range(0L, 100L).select(col("id"),
      (col("id") % 7).as("v"))
    val d0 = ConstrainedSweep.digest(base)
    // one value changed
    val d1 = ConstrainedSweep.digest(base.select(col("id"),
      when(col("id") === 42L, lit(99L)).otherwise(col("v")).as("v")))
    // one row dropped
    val d2 = ConstrainedSweep.digest(base.filter(col("id") =!= 42L))
    // one row duplicated — catches a sum/xor digest ONLY if the pair
    // moves: xor cancels the duplicate, the count and sum do not
    val d3 = ConstrainedSweep.digest(
      base.unionAll(base.filter(col("id") === 42L)))
    assert(d0 != d1); assert(d0 != d2); assert(d0 != d3)
  }

  test("null vs the string NULL vs empty string are distinct") {
    def one(v: Option[String]) = ConstrainedSweep.digest(
      Seq((1L, v)).toDF("id", "s"))
    val dNull = one(None)
    val dLit = one(Some("NULL"))
    val dEmpty = one(Some(""))
    // null and the literal string "NULL" both render as NULL in the
    // canonical string — acceptable for an A/B parity digest (both passes
    // render identically) but the empty string must stay distinct
    assert(dNull != dEmpty && dLit != dEmpty)
  }

  test("map-typed columns digest identically regardless of entry order") {
    val a = Seq((1L, Map("x" -> 1, "y" -> 2, "z" -> 3))).toDF("id", "m")
    val b = Seq((1L, Map("z" -> 3, "x" -> 1, "y" -> 2))).toDF("id", "m")
    assert(ConstrainedSweep.digest(a) == ConstrainedSweep.digest(b))
    val c = Seq((1L, Map("z" -> 3, "x" -> 1, "y" -> 99))).toDF("id", "m")
    assert(ConstrainedSweep.digest(a) != ConstrainedSweep.digest(c))
  }

  test("array and struct columns digest by value") {
    val a = Seq((1L, Seq(1, 2, 3), ("a", 2.5))).toDF("id", "arr", "st")
    val b = Seq((1L, Seq(1, 2, 3), ("a", 2.5))).toDF("id", "arr", "st")
    val c = Seq((1L, Seq(3, 2, 1), ("a", 2.5))).toDF("id", "arr", "st")
    assert(ConstrainedSweep.digest(a) == ConstrainedSweep.digest(b))
    // array ELEMENT order is semantic (top-k lists): must differ
    assert(ConstrainedSweep.digest(a) != ConstrainedSweep.digest(c))
  }

  test("column separator prevents boundary-shift collisions") {
    val a = Seq(("ab", "c")).toDF("x", "y")
    val b = Seq(("a", "bc")).toDF("x", "y")
    assert(ConstrainedSweep.digest(a) != ConstrainedSweep.digest(b))
  }
}
