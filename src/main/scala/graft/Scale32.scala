package graft
import org.apache.spark.sql.SparkSession
object Scale32 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", T.warehouseDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[scale32] dir: " + ScaleProbe.buildScaledDir(spark, "/root/testdata/sf0.1", 32))
    spark.stop()
  }
}
