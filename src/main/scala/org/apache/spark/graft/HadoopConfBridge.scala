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
  @volatile private var cached: Configuration = _

  def conf(): Configuration = {
    val c = cached
    if (c != null) c
    else SparkEnv.get match {
      // cache ONLY a SparkEnv-derived conf: caching the bare fallback would
      // freeze credential-less defaults for the JVM's lifetime if any code
      // path (tests, driver-side parsing) ran before the session was up
      case null => new Configuration()
      case env =>
        val fresh = SparkHadoopUtil.get.newConfiguration(env.conf)
        cached = fresh
        fresh
    }
  }
}
