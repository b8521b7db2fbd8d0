package graft.tmpprobe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"; val dst = "/tmp/sfx10"; val k = 10
    // documents: doc_id offset by copy * 1e6-aligned stride; text salted
    // per copy (so dedup/LSH work scales instead of collapsing to one
    // mega-cluster of identical copies)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    val docsX = (0 until k).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * maxDoc))
        .withColumn("text", when(lit(c) === 0, col("text"))
          .otherwise(concat(col("text"), lit(s" copytag$c"))))
    }.reduce(_ unionByName _)
    docsX.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    // embeddings: contiguous vec_ids 0..k*n-1; vectors perturbed per copy
    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    val nEmb = embs.count()
    val embsX = (0 until k).map { c =>
      embs.withColumn("vec_id", col("vec_id") + lit(c * nEmb))
        .withColumn("embedding", expr(s"transform(embedding, (v, i) -> v + float($c) * 0.001 * float(i % 7))"))
    }.reduce(_ unionByName _)
    embsX.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    // events: offset user/event ids per copy
    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.printSchema()
    val maxU = ev.agg(max("user_id")).head().getLong(0) + 1
    val maxE = ev.agg(max("event_id")).head().getLong(0) + 1
    val evX = (0 until k).map { c =>
      ev.withColumn("user_id", col("user_id") + lit(c * maxU))
        .withColumn("event_id", col("event_id") + lit(c * maxE))
    }.reduce(_ unionByName _)
    evX.repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")
    // remaining tables: copy through unchanged (star-schema dims)
    for (t <- Seq("region","nation","customer","supplier","part","orders","lineitem")) {
      try spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$dst/$t.parquet")
      catch { case e: Exception => println(s"skip $t: ${e.getMessage}") }
    }
    println("done: docs=" + spark.read.parquet(s"$dst/documents.parquet").count() +
      " embs=" + spark.read.parquet(s"$dst/embeddings.parquet").count() +
      " events=" + spark.read.parquet(s"$dst/events.parquet").count())
    spark.stop()
  }
}
