package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): run every query on SPARK_GRAFT_SF_DIR,
 * force full materialization through the noop sink (count() could skip
 * work via column pruning), print one JSON line.
 *
 * Methodology: the host is a noisy VM (observed up to 5x wall-clock
 * variance on a single cold sweep), so each query gets one untimed
 * warm-up run (JIT + codegen compilation + page cache) followed by
 * SPARK_GRAFT_RUNS timed runs, reporting the per-query MINIMUM — for
 * wall-clock on shared hardware, noise is strictly additive, so min is
 * the stable estimator. Knobs: SPARK_GRAFT_RUNS (default 2),
 * SPARK_GRAFT_WARMUP (default 1, set 0 to skip),
 * SPARK_GRAFT_ONLY=q26_...,q27_... to micro-benchmark a subset.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt.max(0)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated query filter for micro-benchmarking
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val results = selected.map { case (name, fn) =>
      (1 to warmup).foreach(_ => runOnce(name, fn))
      name -> (1 to runs).map(_ => runOnce(name, fn)).min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
