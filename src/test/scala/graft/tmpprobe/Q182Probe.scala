package graft.tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Ckpt._
object Q182Probe {
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
    // warm-up full query
    graft.SparkEntry.queries("q182_edit_verified_pairs")(spark, d)
      .queryExecution.toRdd.foreach(_ => ())
    time("full q182")(graft.SparkEntry.queries("q182_edit_verified_pairs")(spark, d)
      .queryExecution.toRdd.foreach(_ => ()))
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text")).ckptLazy
    val pairs = time("lsh pairs")( {
      val p = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
        .select("doc_a","doc_b").localCheckpoint(true)
      p })
    println("n_pairs=" + pairs.count())
    val attached = time("attach texts")( {
      val a = pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
        .localCheckpoint(true); a })
    time("levenshtein 256")(attached
      .withColumn("dist", levenshtein(col("ta"), col("tb"), 256))
      .where(col("dist") >= 0).queryExecution.toRdd.foreach(_ => ()))
    // how selective would a length pre-filter be?
    val lens = attached.select(length(col("ta")).as("la"), length(col("tb")).as("lb"))
      .withColumn("keepable", abs(col("la")-col("lb")) <= least(lit(256), greatest(col("la"),col("lb"))/5))
      .groupBy("keepable").count().collect()
    lens.foreach(r => println(s"len-filter keepable=${r.get(0)} count=${r.getLong(1)}"))
    val stats = attached.select(avg(length(col("ta")))).head(); println("avg len ta = " + stats)
    spark.stop()
  }
}
