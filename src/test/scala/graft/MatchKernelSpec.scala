package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MatchKernel

/**
 * MatchKernel is validated against an independent, definition-level
 * implementation of the z-normalized Euclidean distance (explicitly
 * z-normalize each window, then take the plain L2 distance) rather than
 * the optimized Pearson-correlation form used in the kernel.
 */
class MatchKernelSpec extends AnyFunSuite {

  private def znorm(xs: Array[Double]): Array[Double] = {
    val m = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
    if (sd == 0.0) Array.fill(xs.length)(0.0) else xs.map(x => (x - m) / sd)
  }

  private def naiveProfile(q: Array[Double], t: Array[Double]): Array[Double] = {
    val zq = znorm(q)
    (0 to t.length - q.length).map { s =>
      val w = t.slice(s, s + q.length)
      val zw = znorm(w)
      math.sqrt(zq.zip(zw).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.toArray
  }

  test("distanceProfile agrees with definition-level z-norm Euclidean") {
    val rnd = new scala.util.Random(7)
    val t = Array.fill(200)(rnd.nextDouble() * 100 - 50)
    val q = Array.fill(13)(rnd.nextDouble() * 100 - 50)
    val got = MatchKernel.distanceProfile(q, t)
    val want = naiveProfile(q, t)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-8, s"$g vs $w") }
  }

  test("identical subsequence has distance ~0 and is matched first") {
    val t = Array.tabulate(100)(i => math.sin(i / 5.0) * 10)
    val q = t.slice(40, 55)
    val ms = MatchKernel.matches(q, t, maxDistance = 1e-6)
    assert(ms.nonEmpty)
    assert(ms.head._2 == 40)
    assert(ms.head._1 < 1e-9)
  }

  test("z-normalization makes matching scale/offset invariant") {
    val t = Array.tabulate(100)(i => math.sin(i / 5.0) * 10)
    val q = t.slice(40, 55).map(x => x * 3.0 + 17.0) // affine transform
    val ms = MatchKernel.matches(q, t, maxDistance = 1e-6)
    assert(ms.exists(_._2 == 40))
  }

  test("exclusion zone ceil(m/4) suppresses overlapping matches") {
    // periodic series: pattern of length 8 recurs every 20 points
    val t = Array.tabulate(100)(i => math.sin(i * 2 * math.Pi / 20))
    val q = t.slice(0, 8)
    val ms = MatchKernel.matches(q, t, maxDistance = 0.5)
    val idxs = ms.map(_._2).sorted
    // no two accepted matches closer than ceil(8/4)=2... they must differ by > 2
    idxs.sliding(2).foreach {
      case Seq(a, b) => assert(b - a > 2, s"overlapping matches at $a,$b")
      case _ =>
    }
    assert(ms.size >= 4) // ~5 periods present
  }

  test("constant-window conventions: const/const -> 0, one-sided const -> sqrt(m)") {
    val cq = Array.fill(5)(3.0)
    val t = Array(1.0, 1, 1, 1, 1, 1, 9, 1, 1, 1, 1)
    val d = MatchKernel.distanceProfile(cq, t)
    assert(d(0) == 0.0)                       // both constant
    assert(math.abs(d(4) - math.sqrt(5.0)) < 1e-12) // window [1,1,9,1,1] non-const vs const q
    val q2 = Array(1.0, 2, 3, 4, 5)
    val t2 = Array.fill(10)(7.0)
    assert(MatchKernel.distanceProfile(q2, t2).forall(x => math.abs(x - math.sqrt(5.0)) < 1e-12))
  }

  test("subThresholdCount counts every offset without suppression") {
    val t = Array.tabulate(60)(i => math.sin(i * 2 * math.Pi / 10))
    val q = t.slice(0, 10)
    val all = MatchKernel.subThresholdCount(q, t, 0.5)
    val suppressed = MatchKernel.matchCount(q, t, 0.5)
    assert(all >= suppressed)
    assert(suppressed >= 1)
  }

  test("degenerate shapes") {
    assert(MatchKernel.distanceProfile(Array.emptyDoubleArray, Array(1.0, 2)).isEmpty)
    assert(MatchKernel.distanceProfile(Array(1.0, 2, 3), Array(1.0, 2)).isEmpty)
    assert(MatchKernel.matchCount(Array(1.0, 2, 3), Array(1.0, 2), 10.0) == 0)
  }

  test("FFT sliding dots match the naive dots exactly enough (MASS path)") {
    val rnd = new scala.util.Random(11)
    // large enough to cross the kernel's FFT switch-over (nWin*m > 2e6)
    val q = Array.fill(1500)(rnd.nextDouble() * 10 - 5)
    val t = Array.fill(4000)(rnd.nextDouble() * 10 - 5)
    val fft = graft.functions.FFT.slidingDots(q, t)
    assert(fft.length == t.length - q.length + 1)
    var s = 0
    while (s < fft.length) {
      var dot = 0.0
      var k = 0
      while (k < q.length) { dot += q(k) * t(s + k); k += 1 }
      assert(math.abs(fft(s) - dot) <= 1e-6 * math.max(1.0, math.abs(dot)),
        s"dot mismatch at offset $s: fft=${fft(s)} naive=$dot")
      s += 1
    }
    // and the full profile through the kernel's auto-switch agrees with
    // the definition-level profile to within FFT rounding
    val big = MatchKernel.distanceProfile(q, t)
    val ref = naiveProfile(q, t)
    big.zip(ref).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) <= 1e-6, s"profile mismatch at $i: $a vs $b")
    }
  }

  test("vendored reference golden: MatchKernel reproduces every stumpy.match count " +
      "the reference's false_positive_filter computed") {
    // src/test/resources/fp_match_golden.csv is generated by
    // scripts/e2e_compare/gen_fp_golden.py: the REFERENCE'S OWN
    // false_positive_filter (false_positive_filtering.py) run over
    // reference-shaped fixture data, with stumpy.match provided by a
    // numpy shim written strictly from stumpy's public documentation.
    // Every call the reference made is captured verbatim (exact pattern,
    // exact all-traces-concatenated series, max_distance, resulting
    // count + keep decision). The two implementations share no code or
    // algorithmic form (numpy direct z-norm L2 there, Pearson-form MASS
    // here), so count equality is a genuine cross-implementation check —
    // the closest possible stand-in for stumpy itself, which has no
    // offline install path in this environment.
    val in = getClass.getResourceAsStream("/fp_match_golden.csv")
    assert(in != null, "fp_match_golden.csv missing from test resources")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val rows = lines.tail.map { l =>
      val f = l.split(",", -1)
      assert(f.length == 6, s"unexpected csv row: $l")
      (f(0), f(1).toDouble, f(2).toInt, f(3) == "1",
        f(4).split(";").map(_.toDouble), f(5).split(";").map(_.toDouble))
    }
    assert(rows.length >= 50)
    rows.foreach { case (id, maxd, n, _, pattern, series) =>
      val got = MatchKernel.matchCount(pattern, series, maxd)
      assert(got == n, s"$id: kernel=$got reference=$n (maxd=$maxd)")
    }
    // the reference's keep rule (count <= 5, else first-argmin fallback)
    // reconstructed from the kernel's counts reproduces its keep flags
    rows.groupBy { case (id, maxd, _, _, _, _) => (id.takeWhile(_ != ':'), maxd) }
      .foreach { case (_, group) =>
        val counts = group.map { case (_, maxd, _, _, p, s) =>
          MatchKernel.matchCount(p, s, maxd)
        }
        val anyPass = counts.exists(_ <= 5)
        val keepIdx = counts.zipWithIndex.minBy { case (c, i) => (c, i) }._2
        group.zipWithIndex.foreach { case ((id, _, _, kept, _, _), i) =>
          val expect = if (anyPass) counts(i) <= 5 else i == keepIdx
          assert(kept == expect, s"keep-rule mismatch at $id")
        }
      }
  }

  test("multi-trace golden: per-trace counts equal the reference's concatenated " +
      "counts away from trace boundaries; divergence is exactly the boundary phantom") {
    // The FP filter matches per (feature, trace) and SUMS counts; the
    // reference concatenates all traces into one series (script_1.py:66).
    // This golden bounds that documented divergence: identical whenever no
    // match or exclusion zone touches a boundary, and exactly +1 per
    // pattern straddling a boundary (a phantom no real trace contains).
    val rnd = new scala.util.Random(3)
    val m = 16
    val q = Array.tabulate(m)(i => math.sin(i * 0.7) * 5)
    def noise(n: Int) = Array.fill(n)(rnd.nextGaussian() * 0.1 + 50)
    def plant(t: Array[Double], at: Int, scale: Double, off: Double): Unit =
      (0 until m).foreach(i => t(at + i) = q(i) * scale + off)
    val maxD = 1.0

    // three z-norm matches (affine copies), all >= m + excl from boundaries
    val t1 = noise(300); plant(t1, 50, 2.0, 10.0); plant(t1, 150, 0.5, -3.0)
    val t2 = noise(300); plant(t2, 80, 1.5, 0.0)
    val perTrace = MatchKernel.matchCount(q, t1, maxD) + MatchKernel.matchCount(q, t2, maxD)
    val concatenated = MatchKernel.matchCount(q, t1 ++ t2, maxD)
    assert(perTrace == 3)
    assert(concatenated == perTrace,
      s"interior matches must agree: per-trace $perTrace vs concatenated $concatenated")

    // a pattern STRADDLING the boundary: the concatenation sees a phantom
    // subsequence that neither trace contains
    val joined = noise(300) ++ noise(300)
    plant(joined, 300 - m / 2, 1.0, 0.0)
    val concatB = MatchKernel.matchCount(q, joined, maxD)
    val perB = MatchKernel.matchCount(q, joined.slice(0, 300), maxD) +
      MatchKernel.matchCount(q, joined.slice(300, 600), maxD)
    assert(perB == 0 && concatB == 1,
      s"straddling pattern: per-trace $perB (no full window) vs concatenated $concatB (phantom)")
  }
}
