package graft.tmpprobe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{NswGraph, Similarity}
import graft.Ckpt._
object NswProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    println("n_embeddings=" + embs.count())
    val k=8; val seeds=8; val rounds=3
    val qv = embs.select(col("vec_id").as("vid"), Similarity.quantized(col("embedding")).as("q")).ckptLazy
    val n = qv.count()
    def scored(cand: DataFrame) = cand
      .join(broadcast(qv.select(col("vid").as("a"), col("q").as("qa"))), "a")
      .join(broadcast(qv.select(col("vid").as("b"), col("q").as("qb"))), "b")
      .select(col("a"), col("b"), NswGraph.d2(col("qa"), col("qb")).as("d2"))
    val w = Window.partitionBy("a").orderBy(col("d2"), col("b"))
    def topK(sc: DataFrame) = sc.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
    val init = qv.select(col("vid").as("a"), explode(expr(s"sequence(1, $seeds)")).as("j"))
      .select(col("a"), expr(s"pmod(a + 1 + pmod(cast(conv(substr(md5(cast(concat(a, '_', j) as binary)), 1, 15), 16, 10) as bigint), ${n - 1}L), ${n}L)").as("b"))
      .distinct().ckptLazy
    var g = topK(scored(init)).ckptEager
    var seen = Vector[DataFrame](init)
    for (r <- 1 to rounds) {
      val t0 = System.nanoTime()
      val und = g.select(explode(array(struct(col("a"), col("b")), struct(col("b").as("a"), col("a").as("b")))).as("e")).select(col("e.a").as("a"), col("e.b").as("b")).ckptLazy
      val cand = und.select(col("a"), col("b").as("m")).join(und.select(col("a").as("m"), col("b")), "m").select(col("a"), col("b")).where(col("b") =!= col("a")).unionByName(und.select("a", "b")).distinct().ckptLazy
      val nc = cand.count()
      val t1 = System.nanoTime()
      val oldFresh = cand.join(g.select("a","b"), Seq("a","b"), "left_anti").count()
      val t2 = System.nanoTime()
      val np = cand.join(seen.reduce(_ unionByName _), Seq("a","b"), "left_anti").ckptLazy
      val nf = np.count()
      val t3 = System.nanoTime()
      g = topK(scored(np).unionByName(g.select("a","b","d2"))).ckptEager
      val t4 = System.nanoTime()
      println(f"round $r: cand=$nc oldFresh=$oldFresh newFresh=$nf candSec=${(t1-t0)/1e9}%.2f antiOldSec=${(t2-t1)/1e9}%.2f antiNewSec=${(t3-t2)/1e9}%.2f scoreTopkSec=${(t4-t3)/1e9}%.2f")
      seen :+= np
    }
    spark.stop()
  }
}
