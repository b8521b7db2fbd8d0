import org.apache.spark.sql.SparkSession
object OursE2E {
  def main(args: Array[String]): Unit = {
    // args: [dataDir] [parityDumpPath] — dataDir defaults to the 8-column
    // folder_1-scale fixture; r10 passes /tmp/folder1scale_f2 (12-column
    // schema at the same scale). parityDumpPath, when set, writes the
    // cluster=False fp=False MAIN explanation map (script mode:
    // applyWorstCase=false, the reference script path) as JSON for the
    // at-scale compare against ref_driver.py's E2E_DUMP.
    val data = args.headOption.getOrElse("/tmp/folder1scale")
    val dump = args.drop(1).headOption
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
        spark, data, "labels", cfg)
      out.write.mode("overwrite").format("noop").save()
      println(f"cluster=$cluster fp=$fp: ${(System.nanoTime()-t0)/1e9}%.1f s")
      spark.catalog.clearCache()
    }
    dump.foreach { path =>
      val (traceLong, featureOrder) =
        graft.sources.Sources.readAllTraces(spark, data, "labels")
      val labels = graft.sources.Sources.readLabels(spark, s"$data/labels.csv")
      val obs = graft.operators.IntervalLabeler.labelObservations(traceLong, labels)
      val m = graft.ExstreamPipeline.explanatoryFeatures(
          obs, featureOrder, graft.ExstreamConfig(cluster = false, applyWorstCase = false))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).sortBy(_._1)
      val json = m.map { case (k, fs) =>
        "\"" + k + "\": [" + fs.map("\"" + _ + "\"").mkString(", ") + "]"
      }.mkString("{\n ", ",\n ", "\n}\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    }
    spark.stop()
  }
}
