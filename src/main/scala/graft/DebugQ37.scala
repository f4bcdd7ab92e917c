package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugQ37 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "src/test/resources/ctd-data/CTD"
    val raw = graft.sources.CtdRead.cnv(spark, dir)
    val samples = graft.ops.Cast.split(graft.ops.Cast.removeAboveWater(raw), "cast_id", "scan_order")
      .filter(col("direction") === "down")
      .select(col("cast_id"), col("scan_order"), col("pressure"), col("t090C"))
    samples.groupBy("cast_id").agg(count(lit(1)).as("down_n"),
      min("pressure").as("pmin"), max("pressure").as("pmax"),
      min_by(col("pressure"), col("scan_order")).as("first_p"),
      max_by(col("pressure"), col("scan_order")).as("last_p")).orderBy("cast_id").show(50,false)
    val binned = graft.ops.Cast.bindataAverage(samples, "cast_id", "scan_order",
      Seq("t090C"), 50.0, keepEmpty = false)
    binned.groupBy("cast_id").agg(count(lit(1)).as("bins")).orderBy("cast_id").show(50,false)
    spark.stop()
  }
}
