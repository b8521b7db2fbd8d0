package graft

import org.apache.spark.sql.Dataset

/**
 * Checkpoint boundary with a test-only bypass (r13 verdict #1 / ADVICE):
 * every multi-consumer intermediate rides `localCheckpoint` (the r5
 * rule — blocks stay out of the catalog cache, ContextCleaner frees
 * them), but a checkpoint TRUNCATES the downstream logical/physical
 * plan at a LogicalRDD, so plan-shape guards (PlanGuardSpec's
 * no-Zipfian-window / TakeOrdered assertions) can only see the segment
 * after the LAST checkpoint — the r13 q209 guard failed exactly
 * because the TakeOrdered it asserted lives upstream of a lazy
 * checkpoint, and the window assertions were partially vacuous for the
 * same reason.
 *
 * All production call sites go through `ckptLazy` / `ckptEager`
 * (behaviour identical to `localCheckpoint(eager = false/true)` when
 * `enabled`, the default). PlanGuardSpec flips `enabled = false` around
 * selected non-iterative queries to compile the WHOLE tree into ONE
 * executed plan, so upstream windows/sorts/joins are actually audited,
 * then restores the flag. Results are unaffected either way: every
 * checkpointed frame is deterministic (md5-seeded RNG, canonical
 * orders), so removing the boundary changes only plan shape and reuse.
 */
object Ckpt {
  // DynamicVariable, not a JVM-global flag (r14 ADVICE): the bypass
  // scopes to the calling thread, so a concurrent suite execution (or a
  // parallel-test sbt setting) cannot strip checkpoint boundaries from
  // unrelated queries mid-flight and unbound an iterative trainer's
  // lineage. Plan construction happens on the caller's thread, so the
  // thread-local view is exactly the guard's view.
  private val bypass = new scala.util.DynamicVariable[Boolean](false)

  /** Checkpoint boundaries active on THIS thread (true outside
    * [[withoutCheckpoints]]). */
  def enabled: Boolean = !bypass.value

  /** Run `body` with checkpoint boundaries disabled (test-only),
    * scoped to the calling thread. */
  def withoutCheckpoints[A](body: => A): A = bypass.withValue(true)(body)

  implicit class CkptOps[T](private val ds: Dataset[T]) extends AnyVal {
    /** `localCheckpoint(eager = false)` unless bypassed. */
    def ckptLazy: Dataset[T] = if (enabled) ds.localCheckpoint(false) else ds
    /** `localCheckpoint(eager = true)` unless bypassed. NB iterative
     * driver loops depend on the eager materialization for per-round
     * delta reads — bypass only around non-iterative plans. */
    def ckptEager: Dataset[T] = if (enabled) ds.localCheckpoint(true) else ds
  }
}
