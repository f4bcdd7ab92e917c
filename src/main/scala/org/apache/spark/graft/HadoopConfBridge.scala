package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkEnv
import org.apache.spark.deploy.SparkHadoopUtil

/**
 * Bridge into Spark's Hadoop-configuration plumbing (package-private in
 * Spark, hence this `org.apache.spark` subpackage — same pattern as the
 * graftarray codegen expressions).
 *
 * `SparkHadoopUtil.newConfiguration` folds `spark.hadoop.*` (and the
 * s3a credential conveniences) from the live SparkConf into the Hadoop
 * Configuration — on the DRIVER and on EXECUTORS alike, which is what lets
 * the ctd readers open `hdfs://` / `s3a://` paths inside partition readers
 * with the credentials the user configured on the session. Outside a Spark
 * runtime (unit code paths) it falls back to XML-default configuration.
 */
object HadoopConfBridge {
  // Keyed on the SparkEnv INSTANCE: a later SparkSession in the same JVM
  // (new spark.hadoop.* / s3a credentials) gets a freshly folded conf
  // instead of silently reusing the first session's settings.
  @volatile private var cached: (SparkEnv, Configuration) = _

  def conf(): Configuration = SparkEnv.get match {
    // never cache the bare fallback: it would freeze credential-less
    // defaults for the JVM's lifetime if any code path (tests, driver-side
    // parsing) ran before the session was up
    case null => new Configuration()
    case env =>
      val c = cached
      if (c != null && (c._1 eq env)) c._2
      else {
        val fresh = SparkHadoopUtil.get.newConfiguration(env.conf)
        cached = (env, fresh)
        fresh
      }
  }
}
