package graft.tools
import org.apache.spark.sql.SparkSession
object P01Timing {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 3).foreach { i =>
      time(s"p01 run $i") {
        graft.SparkEntry.queries("p01_hom_pipeline")(spark, "/root/testdata/sf0.01")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
