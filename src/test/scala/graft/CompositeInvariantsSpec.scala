package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/**
 * Semantic invariants of the r8 composite/report queries on live
 * testdata — properties the DuckDB hash-match can't express (it proves
 * Spark == DuckDB, not that both are sane). Each invariant is a
 * domain law: a violation means the operator's MEANING regressed even
 * if both engines regressed together.
 */
class CompositeInvariantsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("composite-invariants")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rows(q: String) = Queries.queries(q)(spark, sf).collect()

  test("q97: the curation funnel only ever shrinks, stage by stage") {
    val st = rows("q97_curation_impact")
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(st.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    st.sliding(2).foreach { case Array((_, d1, t1), (s2, d2, t2)) =>
      assert(d2 <= d1 && t2 <= t1, s"stage $s2 grew: docs $d1->$d2 toks $t1->$t2")
    }
    assert(st.last._2 > 0, "quality stage emptied the corpus — thresholds broken")
  }

  test("q91: cohorts fully retain themselves at offset zero") {
    val rs = rows("q91_retention_cohorts")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rs.nonEmpty)
    rs.filter(_._2 == 0L).foreach { case (c, _, users, cohort, ret) =>
      assert(users == cohort && ret == 1.0, s"cohort $c offset-0 retention $ret")
    }
    rs.foreach { case (c, off, users, cohort, ret) =>
      assert(users <= cohort && ret > 0.0 && ret <= 1.0,
        s"cohort $c offset $off: $users/$cohort ret $ret")
    }
  }

  test("q92: kappa is chance-corrected — bounded by raw accuracy, within [-1, 1]") {
    val r = rows("q92_label_agreement").head
    val (acc, pe, kappa) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(acc >= 0.0 && acc <= 1.0 && pe > 0.0 && pe < 1.0)
    assert(kappa <= acc + 1e-9, s"kappa $kappa exceeds accuracy $acc")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q98: the token frequency curve decays (negative Zipf slope)") {
    val r = rows("q98_zipf_slope").head
    // the synthetic sf0.001 vocabulary is smaller than the top-100 cap —
    // the fit just uses every point there is
    assert(r.getLong(0) >= 10L && r.getLong(0) <= 100L)
    assert(r.getDouble(1) < 0.0, s"Zipf slope ${r.getDouble(1)} is not negative")
  }

  test("q102: centroid cosines are valid similarities in [-1, 1]") {
    val cs = rows("q102_centroid_similarity").map(_.getDouble(2))
    assert(cs.nonEmpty)
    cs.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine $c out of range"))
  }

  test("q103: backtest accuracy is a valid proportion per type") {
    val rs = rows("q103_markov_backtest")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rs.nonEmpty)
    rs.foreach { case (t, n, c, a) =>
      assert(c <= n && a >= 0.0 && a <= 1.0, s"$t: $c/$n acc $a")
    }
  }

  test("q100: card totals reconcile with the raw corpus") {
    val card = rows("q100_dataset_card")
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    val docs = Queries.t(spark, sf, "documents")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(card.map(_._1).toSet == byLang.keySet, "card is missing a language")
    card.foreach { case (lang, n, dupFrac) =>
      assert(n == byLang(lang), s"$lang card count $n != corpus ${byLang(lang)}")
      assert(dupFrac >= 0.0 && dupFrac <= 1.0)
    }
  }
}
