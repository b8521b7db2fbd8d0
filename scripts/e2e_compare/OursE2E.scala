import org.apache.spark.sql.SparkSession
object OursE2E {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // all four reference configs (script_1.py:263-328); fp=True uses the
    // same MAX_DISTANCE=40.0 the reference script sets
    for (fp <- Seq(false, true); cluster <- Seq(false, true)) {
      val cfg = graft.ExstreamConfig(cluster = cluster, falsePositiveFiltering = fp)
      val t0 = System.nanoTime()
      val out = graft.ExstreamPipeline.constructExplanations(
        spark, "/tmp/folder1scale", "labels", cfg)
      out.write.mode("overwrite").format("noop").save()
      println(f"cluster=$cluster fp=$fp: ${(System.nanoTime()-t0)/1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
