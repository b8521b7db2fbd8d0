package graft.functions

/**
 * Pure (no-Spark) kernels for the EXstream explanation algorithm
 * ("Explaining Anomalies in Event Stream Monitoring", Zhang/Diao/Meliou,
 * EDBT 2017). Behavioral reference:
 * `/root/reference/exstream/entropy_based_single_reward_feature.py` and
 * `/root/reference/script_1.py` — semantics re-derived, not translated;
 * every deliberate quirk of the reference is reproduced and documented.
 *
 * All functions here are order-deterministic and side-effect free so the
 * distributed layer (`graft.operators`) can call them inside per-group
 * aggregations, and so they can be golden-tested in isolation.
 */
object EntropyCore {

  private val Ln2 = math.log(2.0)
  @inline private def log2(x: Double): Double = math.log(x) / Ln2

  /**
   * Class entropy of a labeled window pair (reference
   * `entropy_based_single_reward_feature.py:10-39`). NB log base 2.
   *
   * @param nAno number of anomaly-class observations (type_data = 1)
   * @param nRef number of reference-class observations (type_data = 0)
   */
  def classEntropy(nAno: Long, nRef: Long): Double = {
    require(nAno > 0 && nRef > 0,
      s"One of the time series is empty. Len of TSA is $nAno and len of TSR is $nRef.")
    val pA = nAno.toDouble / (nAno + nRef)
    val pR = nRef.toDouble / (nAno + nRef)
    pA * log2(1.0 / pA) + pR * log2(1.0 / pR)
  }

  /**
   * Worst-case ("pessimistic") rewrite of class labels within runs of tied
   * values — the paper's regularized segmentation entropy realized by
   * construction. Reference `entropy_based_single_reward_feature.py:42-154`
   * (notebook-intent duplicate detection, `testing.ipynb` cell 8: a value
   * counts as duplicated iff it occurs in BOTH classes; the committed
   * script's detection at `entropy_...py:63-65` operates on a single-column
   * Series and therefore never fires — we implement the intent, see
   * SURVEY.md §4a).
   *
   * Faithfully reproduced quirks:
   *  - equal-count runs use `abs(first - i%2 - 1)`
   *    (`entropy_...py:134`); since the (value, class) sort places class 0
   *    first whenever both classes are present, this emits the label
   *    sequence 1,2,1,2,… — label "2" included. Segmentation entropy only
   *    compares adjacent labels for equality, so the out-of-domain label is
   *    harmless but changes run-boundary merging; we keep it bit-faithful.
   *  - unequal-count runs: majority label everywhere, minority interleaved
   *    at stride 2 starting at offset 0 iff minority-label != first-label
   *    (`entropy_...py:103-125`).
   *  - runs whose values occur in only one class are left untouched.
   *
   * @param values sorted ascending; ties must already be ordered class-0
   *               first (i.e. input sorted by (value, class))
   * @param classes class labels aligned with `values`
   * @return rewritten copy of `classes`
   */
  def worstCaseRewrite(values: Array[Double], classes: Array[Int]): Array[Int] = {
    val n = values.length
    require(classes.length == n, s"values/classes length mismatch: $n vs ${classes.length}")
    val out = classes.clone()
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && values(j) == values(i)) j += 1
      // run = [i, j)
      var nRef = 0
      var nAno = 0
      var k = i
      while (k < j) {
        if (classes(k) == 0) nRef += 1 else nAno += 1
        k += 1
      }
      if (nRef > 0 && nAno > 0) { // value duplicated across classes
        val first = classes(i)
        if (nRef != nAno) {
          val biggest = if (nRef < nAno) 1 else 0
          val smallest = 1 - biggest
          val nbSmallest = math.min(nRef, nAno)
          k = i
          while (k < j) { out(k) = biggest; k += 1 }
          val start = if (smallest != first) 0 else 1
          var p = start
          while (p < nbSmallest * 2) { out(i + p) = smallest; p += 2 }
        } else {
          var idx = 0
          val total = nRef + nAno
          while (idx < total) {
            out(i + idx) = math.abs(first - idx % 2 - 1) // quirk: yields 1,2,1,2 when first==0
            idx += 1
          }
        }
      }
      i = j
    }
    out
  }

  /**
   * Segmentation entropy of a class-label sequence (reference
   * `entropy_based_single_reward_feature.py:157-200`).
   *
   * Faithful quirks: natural log (`np.log`, `:187`), and the FINAL segment
   * is never flushed — entropy terms are only added when a new segment
   * opens, so a perfectly separated 2-segment sequence contributes exactly
   * one term.
   */
  def segmentationEntropy(classSeq: Array[Int]): Double = {
    if (classSeq.isEmpty) return 0.0
    val n = classSeq.length
    var past = classSeq(0)
    var segLen = 0
    var ent = 0.0
    var i = 0
    while (i < n) {
      val v = classSeq(i)
      if (v != past) {
        val pi = segLen.toDouble / n
        ent += pi * math.log(1.0 / pi)
        segLen = 1
      } else {
        segLen += 1
      }
      past = v
      i += 1
    }
    ent
  }

  /**
   * Single-feature reward D(f) = H_class / H_segmentation for one
   * (window, feature) group (reference `entropy_...py:203-243`).
   * Input pairs need NOT be pre-sorted; sorting by (value, class) is done
   * here, mirroring `all_data.sort_values(by=[feature, "type_data"])`
   * (`entropy_...py:224`).
   *
   * NB mixed log bases (class: log2, segmentation: ln) are reference
   * behavior (SURVEY §4a quirk 1). Division by a zero segmentation entropy
   * yields +Infinity exactly as NumPy float64 division does.
   */
  def segmentationEntropyOfPairs(values: Array[Double], classes: Array[Int],
                                 applyWorstCase: Boolean = true): Double = {
    val n = values.length
    // IEEE semantics: -0.0 == 0.0, so class must break the tie — Scala's
    // total ordering would instead sort -0.0 < 0.0 and split the run.
    val canon = values.map(v => if (v == 0.0) 0.0 else v)
    val idx = Array.range(0, n).sortBy(i => (canon(i), classes(i)))
    val sv = idx.map(canon)
    val sc = idx.map(classes)
    val rewritten = if (applyWorstCase) worstCaseRewrite(sv, sc) else sc
    segmentationEntropy(rewritten)
  }

  def reward(classEnt: Double, values: Array[Double], classes: Array[Int],
             applyWorstCase: Boolean = true): Double =
    classEnt / segmentationEntropyOfPairs(values, classes, applyWorstCase)

  /**
   * Maximum leap between consecutive rewards of a descending ranking
   * (reference `entropy_...py:249-275`).
   */
  def maximumLeap(rewardsDesc: Seq[Double]): Double = {
    require(rewardsDesc.size >= 2, "maximum_leap needs at least two rewards")
    var maxLeap = Double.NegativeInfinity
    var i = 1
    while (i < rewardsDesc.size) {
      val leap = rewardsDesc(i - 1) - rewardsDesc(i)
      if (leap > maxLeap) maxLeap = leap
      i += 1
    }
    maxLeap
  }

  /**
   * Reward-leap cutoff (reference `entropy_...py:278-314` +
   * `script_1.py:16-28`): walk the descending ranking and stop at the FIRST
   * consecutive leap equal (exact float equality) to the maximum leap; the
   * check is skipped whenever the previously kept reward is exactly 0.0
   * (`last_distance != 0` guard — which also unconditionally keeps the
   * first feature). A ranking of size <= 1 is returned unfiltered
   * (`script_1.py:22-26`); an empty ranking returns empty rather than the
   * reference's `None` (SURVEY §4a quirk 8).
   *
   * @param ranked (feature, reward) sorted by reward descending, ties in
   *               original insertion (column) order — mirroring Python's
   *               stable `sorted(..., reverse=True)`.
   */
  def rewardLeapFilter(ranked: Seq[(String, Double)]): Seq[String] = {
    if (ranked.isEmpty) return Seq.empty
    if (ranked.size == 1) return ranked.map(_._1)
    val threshold = maximumLeap(ranked.map(_._2))
    val keep = Seq.newBuilder[String]
    var last = 0.0
    var broke = false
    val it = ranked.iterator
    while (it.hasNext && !broke) {
      val (feature, d) = it.next()
      if (last != 0.0 && (last - d) == threshold) {
        broke = true
      } else {
        last = d
        keep += feature
      }
    }
    keep.result()
  }

  /**
   * Sort a (feature, reward) map into the reference's ranking order:
   * reward descending, ties preserving insertion order (Python dicts are
   * insertion-ordered and `sorted` is stable — `entropy_...py:239-241`).
   *
   * @param insertionOrder the original feature/column order
   */
  def rankRewards(rewards: Map[String, Double], insertionOrder: Seq[String]): Seq[(String, Double)] = {
    val pos = insertionOrder.zipWithIndex.toMap
    rewards.toSeq
      .sortBy { case (f, r) => (-r, pos.getOrElse(f, Int.MaxValue)) }
  }

  /**
   * Instability entropy over a multiset of explanations (reference
   * `script_1.py:187-205`): flatten, then -sum p*log2(p) over distinct
   * elements. Empty input yields 0.0.
   */
  def instabilityEntropy[T](explanations: Seq[Seq[T]]): Double = {
    val flat = explanations.flatten
    if (flat.isEmpty) return 0.0
    val n = flat.size.toDouble
    flat.groupBy(identity).values.foldLeft(0.0) { (acc, g) =>
      val p = g.size / n
      acc + (-p * log2(p))
    }
  }
}
