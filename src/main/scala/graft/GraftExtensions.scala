package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extension entry point: ship the engine's native expressions to
 * every session on a cluster with
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * (For an already-running session, `org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions
 * .registerInto(spark)` does the same.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions.all.foreach(ext.injectFunction)
    org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions.all.foreach(ext.injectFunction)
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions.all.foreach(ext.injectFunction)
    org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions.all.foreach(ext.injectFunction)
    org.apache.spark.sql.catalyst.expressions.graftsketch.KllExpressions.all.foreach(ext.injectFunction)
    org.apache.spark.sql.catalyst.expressions.graftsketch.MisraGriesExpressions.all.foreach(ext.injectFunction)
  }
}
