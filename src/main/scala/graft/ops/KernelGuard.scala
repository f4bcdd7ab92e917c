package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

/**
 * Guard for the in-memory one-cast-per-task assumption the sequential
 * kernels ([[Cast.despike]], [[SeqOps]]) rely on: each `flatMapGroups`
 * task materializes ONE cast (documented 10^3-10^4 rows, SURVEY §2.5).
 * A malformed input — e.g. a constant cast-id column turning a 100M-row
 * table into one "cast" — would otherwise OOM the executor with a generic
 * heap error that names nothing. This cap converts that into a loud,
 * immediate error naming the offending cast id and the conf to raise.
 *
 * The default (2M rows) is ~200x the documented cast size yet well under
 * a task's share of executor memory; raise per-session via
 * `spark.conf.set("graft.kernel.maxGroupRows", n)` for genuinely huge
 * casts. The happy path pays one integer compare per row.
 */
object KernelGuard {
  val ConfKey = "graft.kernel.maxGroupRows"
  val DefaultMaxGroupRows: Int = 2000000

  /** Resolve the cap at PLAN time (driver side) so the kernel closure
    * captures a plain Int, not a SparkSession. */
  def maxGroupRows(df: DataFrame): Int =
    df.sparkSession.conf.get(ConfKey, DefaultMaxGroupRows.toString).toInt

  /** Materialize one group's rows, refusing loudly past `cap`. */
  def toArrayCapped(key: String, it: Iterator[Row], cap: Int,
                    op: String): Array[Row] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Row](256)
    while (it.hasNext) {
      buf += it.next()
      if (buf.length > cap)
        throw new IllegalStateException(
          s"$op: cast group '$key' exceeds $ConfKey=$cap rows — the " +
          "per-cast kernels materialize one cast per task and this group " +
          "does not look like a cast. Check the cast-id column, or raise " +
          s"the cap with spark.conf.set(\"$ConfKey\", n).")
    }
    buf.toArray
  }
}
