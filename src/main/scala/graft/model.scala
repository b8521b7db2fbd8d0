package graft

/**
 * Data model of the engine (SURVEY.md §1). Four logical tables flow through
 * the pipeline; the central one is the long-format windowed observation
 * table — the Spark-native replacement for the reference's wide
 * composite-string-indexed pandas frames
 * (`/root/reference/utils/get_data.py:56-106`).
 */

/** One labeled anomaly span (`labels.csv` row; see FIXTURES.md A2).
  * Ref window is half-open `[ref_start, ref_end)`; ano window is closed
  * `[ano_start, ano_end]` (`get_data.py:86-95` — asymmetry is deliberate). */
case class LabelSpan(
    label_row: Long,
    trace_id: String,
    ano_id: Long,
    ref_start: Long,
    ref_end: Long,
    ano_start: Long,
    ano_end: Long,
    ano_type: String)

/** One observation of one feature inside a labeled window (long format).
  * `window_key = s"${ano_type}_${trace_id}_${label_row}"`
  * (`get_data.py:99-100`); `type_data`: 0 = reference, 1 = anomaly. */
case class Observation(
    window_key: String,
    trace_id: String,
    ano_id: Long,
    ano_type: String,
    timestamp: Long,
    type_data: Int,
    feature: String,
    value: Double)

/** Final explanation row (`script_1.py:148-184`): `explanation` holds the
  * integer column positions of the selected features. */
case class Explanation(
    trace_id: String,
    ano_id: Long,
    explanation: Seq[Int],
    exp_size: Int,
    exp_instability: Double)

/**
 * Pipeline configuration mirroring `script_1.py:257-261` plus the
 * quirk-mode switches documented in SURVEY.md §4a.
 *
 * @param cluster enable correlation-cluster feature dedup (step 1)
 * @param correlationThreshold |corr| above which two features are clustered
 * @param falsePositiveFiltering enable subsequence-match FP filter (step 2)
 * @param maxDistance z-normalized distance threshold for a "match"
 *                    (`script_1.py:261`; notebook uses 28.0/30.0)
 * @param matchCountKeep keep a feature iff its pattern matches the
 *                       reference series at most this many times
 *                       (`false_positive_filtering.py:42`; notebook: 1)
 * @param applyWorstCase apply the worst-case tied-run label rewrite before
 *                       segmentation entropy. `true` = notebook intent
 *                       (`testing.ipynb` cell 8); `false` = the committed
 *                       script, whose duplicate detection never fires
 *                       (`entropy_...py:63-65` operates on a Series)
 * @param patternFromRefWindow `true` reproduces `script_1.py:65-66`, which
 *                       passes the anomaly's REFERENCE window as the match
 *                       pattern; `false` uses the anomaly window (the
 *                       documented intent of `false_positive_filtering.py`)
 * @param instabilityRounds number of 80% resample re-runs (`script_1.py:227`)
 * @param sampleFraction resample fraction (`script_1.py:228-229`)
 * @param seed seed for the resamples — the reference is unseeded
 *             (SURVEY §4a quirk 7); we are deterministic by default
 */
case class ExstreamConfig(
    cluster: Boolean = false,
    correlationThreshold: Double = 0.6,
    falsePositiveFiltering: Boolean = false,
    maxDistance: Double = 40.0,
    matchCountKeep: Int = 5,
    applyWorstCase: Boolean = true,
    patternFromRefWindow: Boolean = true,
    instabilityRounds: Int = 5,
    sampleFraction: Double = 0.8,
    seed: Long = 42L)
