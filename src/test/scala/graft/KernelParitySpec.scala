package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ShingleKernel, TextFunctions}
import graft.operators.Similarity

/**
 * Bit-parity locks between the fused JVM kernels and the composable
 * column forms they replaced for speed. The oracle SQL was written
 * against the COLUMN forms' semantics, so any kernel drift would
 * silently break cross-engine hash matching — these tests pin every
 * replaced path to its original expression on adversarial inputs
 * (whitespace runs, leading/trailing space, unicode, dupes, shorts).
 */
class KernelParitySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("kernel-parity-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",                       // exactly n tokens
    "a b",                         // below n
    "",                            // empty
    "  leading and  double  spaces trailing ",
    "dup dup dup dup dup dup",     // duplicate shingles
    "unicode éè tokens 中文 here ok",
    "tabs\tand\nnewlines count as whitespace too yes",
    "vertical\u000Btab and\fform-feed are whitespace in BOTH engines' class",
    (1 to 200).map(i => s"tok$i").mkString(" ")) // long doc

  test("simhash60 distinct-token weighting equals the per-instance vote loop") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // naive reference: one md5 vote per token INSTANCE (the pre-r3 form)
    def naive(tokens: Seq[String]): Long = {
      val acc = new Array[Int](60)
      tokens.foreach { t =>
        val h = graft.functions.PortableHash.md5LongOf(t, 15)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 60) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    val tokensGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("dup", "dup", "the", "a", "")))
    val prop = Prop.forAll(tokensGen) { ts =>
      graft.functions.TextFunctions.simhash60(ts) == naive(ts)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("md5ShingleSet matches the column form it replaced") {
    import spark.implicits._
    val df = texts.toDF("text")
    val columnForm = df.select(
      array_sort(array_distinct(transform(
        TextFunctions.shingleSet(col("text"), 3),
        s => conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")
      ))).as("hset"))
      .collect().map(_.getSeq[Long](0))
    val kernel = texts.map(t => ShingleKernel.md5ShingleSet(t, 3).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"md5 mismatch on input $i: '${texts(i)}'")
    }
  }

  test("xx64ShingleSet matches xxhash64 over the shingle strings") {
    import spark.implicits._
    val df = texts.toDF("text")
    val columnForm = df.select(
      array_sort(array_distinct(transform(
        TextFunctions.shingleSet(col("text"), 3), s => xxhash64(s)))).as("set"))
      .collect().map(_.getSeq[Long](0))
    val kernel = texts.map(t => ShingleKernel.xx64ShingleSet(t, 3).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"xx64 mismatch on input $i: '${texts(i)}'")
    }
  }

  test("shingleStrings matches the shingleSet column form (strings, order included)") {
    import spark.implicits._
    val df = texts.toDF("text")
    val columnForm = df.select(TextFunctions.shingleSet(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    val kernel = texts.map(t => ShingleKernel.shingleStrings(t, 3).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"shingle-string mismatch on input $i: '${texts(i)}'")
    }
  }

  test("repetitionCounts matches the size/array_distinct column forms") {
    import spark.implicits._
    val df = texts.toDF("text")
    val toks = TextFunctions.tokens(col("text"))
    val bi = TextFunctions.shingles(col("text"), 2)
    val columnForm = df.select(
      size(toks), size(array_distinct(toks)),
      greatest(size(bi), lit(0)), greatest(size(array_distinct(bi)), lit(0)))
      .collect().map(r => Seq(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val kernel = texts.map(t => ShingleKernel.repetitionCounts(t).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"repetition-count mismatch on input $i: '${texts(i)}'")
    }
  }

  test("repeatedNgramFlags matches the column-form distinct comparison") {
    import spark.implicits._
    val ns = Array(2, 4, 8, 16)
    // crafted cases: a repeated 4-gram that is NOT an 8-gram repeat;
    // a doc repeating a full 16-gram; the shared fixture corpus
    val crafted = Seq(
      "p q r s x p q r s y",                          // rep4, not rep8
      (("a b c d e f g h i j k l m n o p " * 2) + "z").trim, // rep16
      "all tokens unique here one two three")          // none
    val all = texts ++ crafted
    val df = all.toDF("text")
    val columnForm = df.select(array(ns.map { n =>
      val sh = TextFunctions.shingles(col("text"), n)
      when(size(sh) > size(array_distinct(sh)), 1).otherwise(0)
    }: _*)).collect().map(_.getSeq[Int](0))
    val kernel = all.map(t => ShingleKernel.repeatedNgramFlags(t, ns).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"repeated-ngram mismatch on input $i: '${all(i)}'")
    }
    assert(kernel(texts.length) == Seq(1, 1, 0, 0))
    assert(kernel(texts.length + 1) == Seq(1, 1, 1, 1))
    assert(kernel(texts.length + 2) == Seq(0, 0, 0, 0))
  }

  test("lshBucketsOf matches the quantized+lshBucket column form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val vecs = Seq.fill(20)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f).toSeq)
    val df = vecs.toDF("vec")
    val tables = 6
    val nBits = 4
    val columnForm = df.select(
      array((0 until tables).map(t =>
        Similarity.lshBucket(Similarity.quantized(col("vec")), t, nBits, dim)): _*)
        .as("buckets"))
      .collect().map(_.getSeq[Long](0))
    val kernel = vecs.map(v => Similarity.lshBucketsOf(v.map(_.toFloat).toArray, tables, nBits).toSeq)
    columnForm.zip(kernel).zipWithIndex.foreach { case ((c, k), i) =>
      assert(c == k, s"bucket mismatch on vector $i")
    }
  }

  test("r15 bucketCounts matches the explode+md5+groupBy column form") {
    import spark.implicits._
    // the exact expression the DSIR/quality-classifier passes used
    // before the fusion (and the oracle still spells): one row per
    // token of split(text, wsClass), md5-prefix-15 % nBuckets, counted
    for ((nB, clip, hex) <- Seq((8, 31L, 15), (128, 0L, 15), (64, 0L, 8))) {
      val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      val columnForm = df
        .select(col("id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .select(col("id"), expr(
          s"cast(conv(substr(md5(cast(token as binary)), 1, $hex), 16, 10) as bigint) % $nB")
          .as("b"))
        .groupBy("id", "b").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(2)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val k = graft.functions.TokenBucketKernel.bucketCounts(t, nB, clip, hex)
        (0 until nB).foreach { b =>
          val want = columnForm.getOrElse((i, b), 0L)
          val wantClipped = if (clip > 0) math.min(want, clip) else want
          assert(k(b) == wantClipped,
            s"bucketCounts($nB, clip=$clip, hex=$hex) diverged on text $i bucket $b: " +
              s"kernel ${k(b)} vs column $wantClipped")
        }
      }
    }
  }

  test("r15 bucketSums aggregate == per-bucket conditional sums") {
    import spark.implicits._
    val rows = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i % 3 == 0)
    }
    val df = rows.toDF("id", "text", "flag")
      .select(col("id"), col("flag"),
        udf((t: String) => graft.functions.TokenBucketKernel.bucketCounts(t, 16, 0L))
          .apply(col("text")).as("cs"))
    val got = df.agg(graft.plans.VecAggs.bucketSums(spark, "cs", "flag"))
      .head().getSeq[Long](0)
    assert(got.length == 32)
    val ref = rows.map { case (_, t, f) =>
      (graft.functions.TokenBucketKernel.bucketCounts(t, 16, 0L), f)
    }
    (0 until 16).foreach { b =>
      assert(got(b) == ref.map(_._1(b)).sum, s"total sum diverged at bucket $b")
      assert(got(16 + b) == ref.collect { case (c, true) => c(b) }.sum,
        s"flagged sum diverged at bucket $b")
    }
  }
}
