package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BpeTrainer

/**
 * BPE multi-merge trainer: hand-computed merges on a closed corpus, the
 * greedy-replace run semantics the sentinel encoding exists for, the
 * early-exit duality, and round-1 parity with q85's pair count.
 */
class BpeTrainerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("bpe-trainer-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def wordsDf(ws: (String, Int)*) = {
    import spark.implicits._
    ws.flatMap { case (w, n) => Seq.fill(n)(w) }.toDF("word")
  }

  test("hand-computed merge sequence on the classic low/lower corpus") {
    // vocab: low x5, lower x2, newest x6, widest x3  (Sennrich's example,
    // counts chosen to make every round's winner unique)
    val vocab = BpeTrainer.vocabulary(wordsDf(
      "low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3))
    val merges = BpeTrainer.train(vocab, merges = 4, minCount = 0L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // round 1: "es" 9 (newest 6 + widest 3); tie "st" 9 broken by pair asc
    assert(merges(0) == ((1, "e s", 9L)))
    // round 2: after es-merge, "es t" counts 9 and beats everything
    assert(merges(1) == ((2, "es t", 9L)))
    // round 3: "l o" in low(5)+lower(2) = 7
    assert(merges(2) == ((3, "l o", 7L)))
    // round 4: "lo w" = 7
    assert(merges(3) == ((4, "lo w", 7L)))
  }

  test("greedy non-overlapping runs: aaaa merges twice, aaa once") {
    val vocab = BpeTrainer.vocabulary(wordsDf("aaaa" -> 1, "aaa" -> 1))
    val (merges, enc) = BpeTrainer.trainWithVocab(vocab, merges = 1, minCount = 0L)
    val m = merges.collect()
    // counting sees overlaps: aaaa has 3 adjacent (a,a), aaa has 2
    assert(m.head.getString(1) == "a a" && m.head.getLong(2) == 5L)
    // application is greedy non-overlapping: aaaa -> [aa, aa], aaa -> [aa, a]
    val encs = enc.select("enc").collect().map(_.getString(0)).toSet
    val S = BpeTrainer.S; val E = BpeTrainer.E
    assert(encs == Set(s"${S}aa$E${S}aa$E", s"${S}aa$E${S}a$E"))
  }

  test("minCount early exit fires; minCount=0 runs fixed-K") {
    // "ab" x3: round 1 merges (a,b) n=3; afterwards every word is one
    // symbol -> no pairs -> the loop must stop regardless of minCount
    val vocab = BpeTrainer.vocabulary(wordsDf("ab" -> 3, "cd" -> 1))
    val stopped = BpeTrainer.train(vocab, merges = 10, minCount = 2L).collect()
    // (c,d) has n=1 < minCount -> early exit after the single ab merge
    assert(stopped.map(_.getString(1)).toSeq == Seq("a b"))
    val fixed = BpeTrainer.train(vocab, merges = 10, minCount = 0L).collect()
    // fixed mode still merges (c,d), then runs dry and stops at 2 rounds
    assert(fixed.map(_.getString(1)).toSeq == Seq("a b", "c d"))
  }

  test("round-1 pair counts match q85's substring convention") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val q85Style = words.where(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(word)-1), i -> substring(word, i, 2))")).as("p2"))
      .groupBy("p2").agg(sum("freq").as("n"))
      .withColumn("pair", expr("concat(substring(p2,1,1), ' ', substring(p2,2,1))"))
      .select("pair", "n")
    val trainer = BpeTrainer.pairCounts(
      BpeTrainer.encode(BpeTrainer.vocabulary(words)))
    assert(trainer.except(q85Style).isEmpty && q85Style.except(trainer).isEmpty)
  }

  test("applyMerges reproduces the trainer's own final encoding (train == apply)") {
    // the apply path must segment exactly as training did — replaying
    // the merge list over the raw words has to land on the same encoded
    // vocabulary trainWithVocab materialized round by round
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val vocab = BpeTrainer.vocabulary(words)
    val (mergeDf, encFinal) = BpeTrainer.trainWithVocab(vocab, merges = 6, minCount = 0L)
    val merges = mergeDf.orderBy("merge_rank").collect().map(_.getString(1)).toSeq
    val applied = BpeTrainer.applyMerges(vocab, "word", merges).select("enc", "freq")
    assert(applied.except(encFinal).isEmpty && encFinal.except(applied).isEmpty)
    // symbolCount agrees with the split-based symbol list on every word
    val counted = BpeTrainer.applyMerges(vocab, "word", merges)
      .select(BpeTrainer.symbolCount(col("enc")).as("n"),
        size(split(expr("substring(enc, 2, length(enc) - 2)"),
          BpeTrainer.E + BpeTrainer.S)).cast("long").as("m"))
      .where(col("n") =!= col("m")).count()
    assert(counted == 0L, "symbolCount diverged from the split-based count")
  }

  test("byte-level: encodeByteHex symbols, hand-computed first merge, train == apply") {
    import spark.implicits._
    // "ab" -> hex symbols 61, 62
    val enc = Seq("ab").toDF("word")
      .select(BpeTrainer.encodeByteHex(col("word")).as("enc"))
      .collect()(0).getString(0)
    assert(enc == BpeTrainer.S + "61" + BpeTrainer.E + BpeTrainer.S + "62" + BpeTrainer.E)
    // corpus: "the" x5, "then" x2 -> round 1: 't h' and 'h e' both
    // count 7, tie broken pair-ascending -> "68 65" ('h e'); round 2
    // merges "74 6865" = 't he' (7)
    val vocab = BpeTrainer.vocabulary(wordsDf("the" -> 5, "then" -> 2))
    val (mergeDf, encFinal) = BpeTrainer.trainEncoded(
      vocab.select(BpeTrainer.encodeByteHex(col("word")).as("enc"), col("freq")),
      merges = 2, minCount = 0L)
    val merges = mergeDf.orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(merges == Seq((1, "68 65", 7L), (2, "74 6865", 7L)), s"got $merges")
    // apply path with the byte encoder reproduces training's encoding
    val applied = BpeTrainer.applyMerges(vocab, "word", merges.map(_._2),
        BpeTrainer.encodeByteHex).select("enc", "freq")
    assert(applied.except(encFinal).isEmpty && encFinal.except(applied).isEmpty)
    // "the" is fully merged (1 symbol), "then" is [the][n] (2 symbols)
    val counts = BpeTrainer.applyMerges(vocab, "word", merges.map(_._2),
        BpeTrainer.encodeByteHex)
      .select(col("word"), BpeTrainer.symbolCount(col("enc")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(counts == Map("the" -> 1L, "then" -> 2L), s"got $counts")
  }

  test("vocabularyFromCounts equals vocabulary on the same corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
    val direct = BpeTrainer.vocabulary(words)
    val viaCounts = BpeTrainer.vocabularyFromCounts(
      words.groupBy("word").agg(count(lit(1)).as("cnt")), "word", "cnt")
    assert(direct.except(viaCounts).isEmpty && viaCounts.except(direct).isEmpty)
  }
}
