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
  * with a spill-safe cache. The cache is dead weight the moment the
  * query's one terminal action (Verify's parquet write, Bench's count,
  * a user's collect) completes — but the staging site returns a LAZY
  * frame and cannot run a try/finally around an action it never sees.
  * [[releaseAfter]] closes that gap with a [[QueryExecutionListener]]:
  * when any action whose analyzed plan CONTAINS the returned query's
  * plan completes (success or failure), the staged frames are
  * unpersisted and the listener unregisters itself.
  *
  * Interior eager passes (the keyed operators' sketch collect / counts
  * scan-left) run on plans that do not contain the RESULT plan, so they
  * consume the cache without releasing it. Re-running an action on the
  * same result after the first one replays lineage unstaged — a
  * documented perf trade, never a correctness one: the keyed paths are
  * recompute-safe by construction (value-deterministic placement).
  */
object Staged {

  /** Spill-safe persist — staging must never OOM what it accelerates. */
  def stage(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Arm auto-release: after the first completed action (success OR
    * failure) whose analyzed plan contains `result`'s, unpersist every
    * `staged` frame and drop the listener. Returns `result` unchanged.
    * If no action ever runs, the unmaterialized cache entries cost
    * nothing and the listener is one small object on the session. */
  def releaseAfter(result: DataFrame, staged: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed.canonicalized
    val frames = staged.toList
    val listener: QueryExecutionListener = new QueryExecutionListener {
      private val released = new java.util.concurrent.atomic.AtomicBoolean
      private def maybeRelease(qe: QueryExecution): Unit =
        if (qe.analyzed.exists(_.canonicalized == target) &&
            released.compareAndSet(false, true)) {
          frames.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result
  }
}
