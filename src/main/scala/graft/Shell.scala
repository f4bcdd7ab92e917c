package graft

import org.apache.spark.sql.SparkSession

/** Tiny CLI surface for driving the library end-to-end: runs one SQL
  * statement (args joined by space) with all graft UDFs registered and the
  * testdata tables of `SPARK_GRAFT_SF_DIR` (default sf0.001) registered as
  * temp views, printing the result. Usage:
  *   sbt "runMain graft.Shell SELECT gsw_sigma0(34.7118, 28.8099)"
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.gsw.Gsw.registerAll(spark)
    // native codegen expressions override the UDF registrations by name
    org.apache.spark.sql.catalyst.expressions.graftgsw.GswExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftarray.ArrayMathExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftdedup.HashSketchExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.grafttext.TextKernelExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftsketch.KllExpressions.registerInto(spark)
    org.apache.spark.sql.catalyst.expressions.graftsketch.MisraGriesExpressions.registerInto(spark)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = new java.io.File(s"$sfDir/$t.parquet")
      if (p.exists) spark.read.parquet(p.getPath).createOrReplaceTempView(t)
    }
    spark.sql(args.mkString(" ")).show(100, truncate = false)
    spark.stop()
  }
}
