package graft.tmpprobe
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{NswGraph, Similarity}
import graft.Ckpt._
object NswSpread {
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
    val embs = spark.read.parquet(s"$d/embeddings.parquet")
    // warm-up
    NswGraph.nswBuild(embs, "vec_id", "embedding", k = 8, rounds = 3, seeds = 8)
      .queryExecution.toRdd.foreach(_ => ())
    for (i <- 1 to 2)
      time(s"[$i] nswBuild current")(
        NswGraph.nswBuild(embs, "vec_id", "embedding", k = 8, rounds = 3, seeds = 8)
          .queryExecution.toRdd.foreach(_ => ()))
    // spread variant inline
    val qv = embs.select(col("vec_id").as("vid"), Similarity.quantized(col("embedding")).as("q")).ckptLazy
    val n = qv.count()
    val par = spark.sparkContext.defaultParallelism
    def scored(cand: DataFrame) = cand
      .repartition(par, col("a"), col("b"))
      .join(broadcast(qv.select(col("vid").as("a"), col("q").as("qa"))), "a")
      .join(broadcast(qv.select(col("vid").as("b"), col("q").as("qb"))), "b")
      .select(col("a"), col("b"), NswGraph.d2(col("qa"), col("qb")).as("d2"))
    val k = 8
    val w = Window.partitionBy("a").orderBy(col("d2"), col("b"))
    def topK(sc: DataFrame) = sc.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
    def build(): Unit = {
      val init = qv.select(col("vid").as("a"), explode(expr("sequence(1, 8)")).as("j"))
        .select(col("a"), expr(s"pmod(a + 1 + pmod(cast(conv(substr(md5(cast(concat(a, '_', j) as binary)), 1, 15), 16, 10) as bigint), ${n - 1}L), ${n}L)").as("b"))
        .distinct()
      var g = topK(scored(init)).ckptEager
      for (_ <- 1 to 3) {
        val und = g.select(explode(array(struct(col("a"), col("b")), struct(col("b").as("a"), col("a").as("b")))).as("e")).select(col("e.a").as("a"), col("e.b").as("b")).ckptLazy
        val cand = und.select(col("a"), col("b").as("m")).join(und.select(col("a").as("m"), col("b")), "m").select(col("a"), col("b")).where(col("b") =!= col("a")).unionByName(und.select("a", "b")).distinct()
        val fresh = scored(cand.join(g.select("a", "b"), Seq("a", "b"), "left_anti"))
        g = topK(fresh.unionByName(g.select("a", "b", "d2"))).ckptEager
      }
      g.queryExecution.toRdd.foreach(_ => ())
    }
    build() // warm
    for (i <- 1 to 2) time(s"[$i] nswBuild spread")(build())
    spark.stop()
  }
}
