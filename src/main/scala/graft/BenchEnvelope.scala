package graft

/**
 * Committed per-SF clean-min envelope (BENCH_ENVELOPE.json): for each
 * scale-factor directory name, each query's known-clean minimum seconds,
 * recorded from an uncontended sweep (scripts/make_envelope.py keeps the
 * per-query MIN across regenerations so a noisy regeneration can never
 * ratchet the envelope up).
 *
 * Two consumers: [[Bench]] re-runs sweep outliers (> 2x envelope) and
 * reports them under "noisy" so a contended host can't silently pollute
 * the round's official record, and BenchEnvelopeSpec fails the build
 * when a query's clean min exceeds 3x its envelope — a RUNTIME
 * regression gate complementing PlanGuardSpec's plan-shape gate.
 *
 * The file is authored by our own script, so a full JSON parser is not
 * needed: the accepted shape is exactly {"sf...": {"query": seconds}}.
 */
object BenchEnvelope {
  private val section = """"(sf[^"]+)"\s*:\s*\{([^}]*)\}""".r
  private val entry = """"([^"]+)"\s*:\s*([-+0-9.eE]+)""".r

  def parse(txt: String): Map[String, Map[String, Double]] =
    section.findAllMatchIn(txt).map { m =>
      m.group(1) -> entry.findAllMatchIn(m.group(2))
        .map(e => e.group(1) -> e.group(2).toDouble).toMap
    }.toMap

  def load(path: String = "BENCH_ENVELOPE.json"): Map[String, Map[String, Double]] =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))))
}
