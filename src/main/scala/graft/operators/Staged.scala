package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.storage.StorageLevel

/** Scoped staging for keyed-operator inputs — `persist()` that releases
  * ITSELF after the caller's terminal action, instead of relying on the
  * session calling `clearCache()` between queries (ADVICE r11: a
  * long-lived session embedding these queries must not accumulate
  * cached corpus-sized frames).
  *
  * The keyed rank/sum operators ([[GroupRank]], [[AssignIds]]) replay
  * their input lineage once per pass (boundary sketch, counts, rank —
  * their scaladoc'd cost model); when that lineage is expensive
  * (tokenization, dedup joins) the caller stages the NARROW rank input
  * with a spill-safe cache. Note the operators' construction itself
  * runs eager passes (the sketch collect), so the cache is typically
  * MATERIALIZED before any caller-visible action — which is why every
  * exit path below must release it:
  *
  *  - terminal action (success or failure) on the returned query →
  *    the [[releaseAfter]] listener unpersists and unregisters;
  *  - exception during query CONSTRUCTION (e.g. a NaN primary raising
  *    inside the eager sketch) → [[scoped]]'s catch unpersists before
  *    rethrowing;
  *  - query built but never executed (plan-inspection sessions) → the
  *    listener releases after [[AbandonAfterEvents]] other query
  *    executions complete on the session without the result ever
  *    running — an activity TTL, so an abandoned plan's cache cannot
  *    outlive a working session. Releasing is always safe: the keyed
  *    paths are recompute-deterministic by construction, so a released
  *    stage costs a lineage replay, never a wrong rank.
  *
  * Re-running an action on the same result after the first one replays
  * lineage unstaged — a documented perf trade, never a correctness one.
  */
object Staged {

  /** Query executions on the session after which an unconsumed stage is
    * considered abandoned and released. Generous: a real caller's
    * terminal action is almost always the next execution. */
  private[graft] val AbandonAfterEvents = 64

  /** Spill-safe persist — staging must never OOM what it accelerates. */
  def stage(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Stage `narrow`, build the consuming query from the staged frame,
    * and arm auto-release. If `build` throws (the keyed operators run
    * eager passes during construction — a contract violation raises
    * right here), the stage is released before the exception
    * propagates. This is the call-site shape; use it over bare
    * [[stage]] + [[releaseAfter]]. */
  def scoped(narrow: DataFrame)(build: DataFrame => DataFrame): DataFrame = {
    val staged = stage(narrow)
    val out =
      try build(staged)
      catch {
        case t: Throwable =>
          staged.unpersist(blocking = false)
          throw t
      }
    releaseAfter(out, staged)
  }

  /** Arm auto-release: unpersist every `staged` frame (and drop the
    * listener) after the first completed action whose analyzed plan
    * contains `result`'s — or, failing that, after
    * [[AbandonAfterEvents]] unrelated query executions (the abandoned-
    * plan TTL). Returns `result` unchanged. */
  def releaseAfter(result: DataFrame, staged: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed.canonicalized
    val frames = staged.toList
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val released = new java.util.concurrent.atomic.AtomicBoolean
      private val unrelated = new java.util.concurrent.atomic.AtomicInteger
      private def release(): Unit =
        if (released.compareAndSet(false, true)) {
          frames.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      private def onEvent(qe: QueryExecution): Unit =
        if (qe.analyzed.exists(_.canonicalized == target)) release()
        else if (unrelated.incrementAndGet() >= AbandonAfterEvents) release()
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = onEvent(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = onEvent(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
