package graft.tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet").select("doc_id","text")
    // warm-up
    Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .queryExecution.toRdd.foreach(_ => ())
    for (i <- 1 to 2) {
      val hsetUdf = udf((text: String) => graft.functions.ShingleKernel.md5ShingleSet(text, 3))
      val base = docs.select(col("doc_id").as("doc"), hsetUdf(col("text")).as("hset"))
        .where(size(col("hset")) > 0)
      time(s"[$i] hset only")(base.queryExecution.toRdd.foreach(_ => ()))
      val sig = base.withColumn("sig",
        graft.plans.MinHashSignature.minhashSignature(spark, "hset", 64))
      time(s"[$i] hset+sig")(sig.queryExecution.toRdd.foreach(_ => ()))
      val sigRep = sig.repartition(spark.sparkContext.defaultParallelism, col("doc"))
      time(s"[$i] +repartition")(sigRep.queryExecution.toRdd.foreach(_ => ()))
      time(s"[$i] full pairs")(Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .queryExecution.toRdd.foreach(_ => ()))
    }
    println("n_docs=" + docs.count())
    spark.stop()
  }
}
