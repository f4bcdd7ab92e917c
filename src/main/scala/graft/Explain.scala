package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints `explain("formatted")` for the named queries (or a
  * default headline set) against sf0.001 — used to check pushdown, exchange
  * reuse, and broadcast selection without running the data. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_tpch_q1", "q06_bindata_avg", "q09_despike", "q12_dedup_exact",
        "q16_cnv_read", "q25_near_dup_pairs", "q29_ann_cosine",
        "q52_line_dedup", "q58_pipeline_e2e", "q59_embedding_near_dup_banded",
        "q61_chunk_documents")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
