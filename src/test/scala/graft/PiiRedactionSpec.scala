package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions

/** q106's PII family: the within-doc span-count invariant (every
  * detected span is redacted exactly once, none survive) plus an
  * adversarial unit fixture covering shape adjacency. */
class PiiRedactionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pii-redaction-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("redactPii: adversarial fixture redacts all four shapes exactly") {
    import spark.implicits._
    val in = "write a@b.co or 10.1.2.3 then call 555-123-4567 ssn 123-45-6789 done"
    val got = Seq(in).toDF("text")
      .select(TextFunctions.redactPii(col("text")).as("r"))
      .head().getString(0)
    assert(got == "write <EMAIL> or <IP> then call <PHONE> ssn <ID> done", got)
    // shapes are non-overlapping: phone (3-3-4) never matches an id
    // (3-2-4) and vice versa; an IP never matches either
    val tricky = Seq("555-123-4567 123-45-6789 1.22.333.4").toDF("text")
      .select(TextFunctions.redactPii(col("text")).as("r"))
      .head().getString(0)
    assert(tricky == "<PHONE> <ID> <IP>", tricky)
  }

  test("q106 span-count invariant: redacted tags == detected counts, zero residuals") {
    val out = SparkEntry.queries("q106_pii_redaction")(spark, "/root/testdata/sf0.001")
      .localCheckpoint(false)
    // the augmentation must actually plant spans (a vacuous all-zero
    // corpus would prove nothing)
    val planted = out.agg(sum("n_pii")).head().getLong(0)
    assert(planted > 0, "augmented fixture must contain PII spans")
    val tagNames = Map("email" -> "<EMAIL>", "ipv4" -> "<IP>",
      "phone" -> "<PHONE>", "idnum" -> "<ID>")
    for ((name, rx, tag) <- TextFunctions.piiPatterns) {
      assert(tagNames(name) == tag)
      // every detected span became exactly one tag...
      val mismatch = out.where(
        regexp_count(col("redacted_text"), lit(tag)) =!= col(s"n_$name")).count()
      assert(mismatch == 0, s"$name: tag count != detected count on $mismatch docs")
      // ...and no matchable span survives redaction
      val residual = out.where(regexp_count(col("redacted_text"), lit(rx)) > 0).count()
      assert(residual == 0, s"$name: $residual docs still match after redaction")
    }
  }
}
