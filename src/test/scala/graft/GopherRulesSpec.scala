package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** q107's rule bundle on crafted fixtures: the corpus fixture only
  * exercises the word-count window (its text is clean single-line
  * prose), so each remaining rule gets a document built to fail it —
  * proving every predicate actually bites. */
class GopherRulesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("gopher-rules-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rulesFor(text: String): Map[String, Boolean] = {
    import spark.implicits._
    val cols = TextFunctions.gopherRules(col("text"))
    val row = Seq(text).toDF("text")
      .select(cols.map { case (n, c) => c.as(n) }: _*).head()
    cols.map(_._1).zipWithIndex.map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  private val fiftyGoodWords = (1 to 50).map(i => s"word$i").mkString(" ")

  test("a clean 50-word document passes every rule") {
    val r = rulesFor(fiftyGoodWords)
    assert(r.values.forall(identity), r.toString)
  }

  test("each rule fails on a document built to violate it") {
    // word count below 50
    assert(!rulesFor("too short")("r_word_count"))
    // mean word length > 10
    assert(!rulesFor((1 to 50).map(_ => "a" * 16).mkString(" "))("r_mean_word_len"))
    // mean word length < 3
    assert(!rulesFor((1 to 50).map(_ => "a").mkString(" "))("r_mean_word_len"))
    // symbol-to-word ratio: 10 hashes in 50 words > 10%
    assert(!rulesFor(fiftyGoodWords + " " + "#### #### ##")("r_symbol_ratio"))
    // every line a bullet -> fraction 1 > 0.9
    assert(!rulesFor((1 to 5).map(i => s"- item $i " + fiftyGoodWords).mkString("\n"))("r_bullet"))
    // half the lines end in ellipsis -> fraction 0.5 > 0.3
    assert(!rulesFor(Seq(fiftyGoodWords + " so...", fiftyGoodWords).mkString("\n"))("r_ellipsis_lines"))
    // digit-only words: alpha fraction 0 < 0.8
    assert(!rulesFor((1 to 50).map(_ => "12345").mkString(" "))("r_alpha_words"))
  }

  test("composite keep is the conjunction") {
    import spark.implicits._
    val keep = Seq(fiftyGoodWords, "too short").toDF("text")
      .select(TextFunctions.gopherKeep(col("text")).as("k"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keep == Seq(true, false))
  }
}
