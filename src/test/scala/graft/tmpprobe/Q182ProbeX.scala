package graft.tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Ckpt._
object Q182ProbeX {
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
    val d = "/tmp/sfx10"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")).ckptLazy
    val pairs = time("lsh pairs")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .select("doc_a","doc_b").localCheckpoint(true))
    println("n_pairs=" + pairs.count())
    val attached = time("attach texts")(pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .localCheckpoint(true))
    println("attached partitions=" + attached.rdd.getNumPartitions)
    time("levenshtein 256")(attached
      .withColumn("dist", levenshtein(col("ta"), col("tb"), 256))
      .where(col("dist") >= 0).queryExecution.toRdd.foreach(_ => ()))
    println("avg len = " + attached.select(avg(length(col("ta")))).head())
    println("max len = " + attached.select(max(length(col("ta")))).head())
    spark.stop()
  }
}
