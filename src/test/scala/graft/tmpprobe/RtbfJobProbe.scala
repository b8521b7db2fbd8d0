package graft.tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.mutable
object RtbfJobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = mutable.Map[Int, Long]()
    val durs = mutable.ArrayBuffer[(Int, Double)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        durs += ((j.jobId, (j.time - starts.getOrElse(j.jobId, j.time)) / 1e3))
    })
    // warm-up
    graft.SparkEntry.queries("q151_rtbf_apply")(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.foreach(_ => ())
    Thread.sleep(500)
    durs.clear()
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q151_rtbf_apply")(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.foreach(_ => ())
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"q151 timed: $sec%.2f s, jobs=${durs.size}")
    durs.sortBy(-_._2).take(12).foreach { case (id, d) => println(f"  job $id%3d: $d%8.1f ms") }
    spark.stop()
  }
}
