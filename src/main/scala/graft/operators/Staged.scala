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

  /** Hard cap on concurrently ARMED scopes, PER SparkSession. An idle
    * session that builds scoped queries without ever executing one
    * never fires the event TTL (listeners only tick on query
    * executions — ADVICE r12), so arming the (cap+1)-th scope
    * force-releases the OLDEST armed one OF THE SAME SESSION.
    * Releasing early is always safe (recompute-deterministic inputs;
    * the cost is a lineage replay, never a wrong rank), but the cap is
    * scoped per session (ADVICE r13): the queue is process-wide, and
    * evicting by global age alone let one session's construction churn
    * drop ANOTHER live session's hot cache mid-query. Listener
    * registration is per-session too, so per-event fan-out stays
    * O(MaxArmed) per session; scopes whose SparkContext has stopped
    * are swept on every arm, so a dead session's frames/listeners
    * cannot stay strongly referenced behind other sessions' slots. */
  private[graft] val MaxArmed = 8

  /** Process-wide BACKSTOP over the per-session cap (r14 review): a
    * server minting `newSession()` per tenant and abandoning
    * build-only scopes would otherwise pin sessions × [[MaxArmed]]
    * caches forever — the stopped-context sweep never fires while the
    * shared context lives, and the event TTL never ticks on idle
    * sessions. Past this total the GLOBALLY oldest scope is evicted
    * even across sessions: bounded-with-rare-cross-tenant-eviction
    * beats unbounded, and a release is always recompute-safe. The
    * queue scan on every arm is O(this bound) too. */
  private[graft] val MaxArmedTotal = 64

  private val armed =
    new java.util.concurrent.ConcurrentLinkedQueue[ReleaseListener]

  /** One armed scope: releases its frames (idempotently) on the first
    * completed action matching `targetHash`, after
    * [[AbandonAfterEvents]] unrelated executions, or when evicted by
    * the [[MaxArmed]] cap. */
  private final class ReleaseListener(
      val session: org.apache.spark.sql.SparkSession,
      frames: List[DataFrame], targetHash: Int)
      extends QueryExecutionListener {
    private def spark = session
    private val released = new java.util.concurrent.atomic.AtomicBoolean
    private val unrelated = new java.util.concurrent.atomic.AtomicInteger
    def release(): Unit =
      if (released.compareAndSet(false, true)) {
        // leave the cap queue too — a released scope must not occupy
        // an eviction slot, or 8 completed scopes would evict the one
        // still-live scope long before its 64-event TTL
        armed.remove(this)
        frames.foreach(_.unpersist(blocking = false))
        spark.listenerManager.unregister(this)
      }
    private def onEvent(qe: QueryExecution): Unit =
      if (qe.analyzed.exists(_.semanticHash() == targetHash)) release()
      else if (unrelated.incrementAndGet() >= AbandonAfterEvents) release()
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = onEvent(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = onEvent(qe)
  }

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

  /** Two-frame [[scoped]] (ADVICE r15): stage `first`, derive and stage
    * a SECOND frame from the staged first (the dependent-stage shape —
    * e.g. a margin frame computed over a staged scored frame, each with
    * multiple downstream consumers), then build the consuming query
    * from both. Any throw during derivation or construction unpersists
    * everything already staged before propagating, exactly like
    * [[scoped]]; on success both frames ride one [[releaseAfter]]
    * listener. Use this over bare [[stage]] + [[releaseAfter]] whenever
    * two dependent frames need staging. */
  def scoped2(first: DataFrame)(derive: DataFrame => DataFrame)(
      build: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val a = stage(first)
    val b =
      try stage(derive(a))
      catch {
        case t: Throwable =>
          a.unpersist(blocking = false)
          throw t
      }
    val out =
      try build(a, b)
      catch {
        case t: Throwable =>
          a.unpersist(blocking = false)
          b.unpersist(blocking = false)
          throw t
      }
    releaseAfter(out, a, b)
  }

  /** Arm auto-release: unpersist every `staged` frame (and drop the
    * listener) after the first completed action whose analyzed plan
    * contains `result`'s (matched by semanticHash — O(1) retained
    * state per scope) — or, failing that, after [[AbandonAfterEvents]]
    * unrelated query executions (the abandoned-plan TTL), or when the
    * [[MaxArmed]] evict-oldest cap fires on a later arm. Returns
    * `result` unchanged. */
  def releaseAfter(result: DataFrame, staged: DataFrame*): DataFrame = {
    val spark = result.sparkSession
    // retained state per armed scope is O(1): one Int (the analyzed
    // plan's semanticHash — hashCode of the canonicalized form), never
    // the canonicalized plan tree itself (ADVICE/VERDICT r12: holding
    // whole plans made per-event matching O(scopes × plan size) and
    // pinned plan memory until release). A hash COLLISION merely
    // releases early on an unrelated query — always safe, the staged
    // frames are recompute-deterministic.
    val targetHash = result.queryExecution.analyzed.semanticHash()
    val listener = new ReleaseListener(spark, staged.toList, targetHash)
    spark.listenerManager.register(listener)
    armed.add(listener)
    // evict-oldest keeps armed listeners (and their caches) bounded
    // even on a session that never executes anything; released scopes
    // remove themselves from the queue, so only LIVE scopes occupy cap
    // slots. The cap counts THIS session's scopes only (ADVICE r13:
    // evicting by global age let one session's construction churn
    // unpersist another live session's hot cache mid-query); scopes of
    // a STOPPED SparkContext are swept in the same pass — their frames
    // are already dead, only the strong references linger. Eviction is
    // best-effort cleanup — a failing release must not break this
    // caller's construction.
    def releaseQuietly(l: ReleaseListener): Unit =
      try l.release()
      catch { case scala.util.control.NonFatal(_) => () }
    var mine = 0
    var total = 0
    val sweep = armed.iterator()
    while (sweep.hasNext) {
      val l = sweep.next()
      if (l.session.sparkContext.isStopped) releaseQuietly(l)
      else {
        total += 1
        if (l.session eq spark) mine += 1
      }
    }
    if (mine > MaxArmed) {
      val evict = armed.iterator()
      while (mine > MaxArmed && evict.hasNext) {
        val l = evict.next()
        if (l.session eq spark) { releaseQuietly(l); mine -= 1; total -= 1 }
      }
    }
    // the process-wide backstop: many idle sibling sessions must not
    // pin unbounded cache in aggregate, so past MaxArmedTotal the
    // globally oldest scope goes, whoever owns it
    if (total > MaxArmedTotal) {
      val evict = armed.iterator()
      while (total > MaxArmedTotal && evict.hasNext) {
        val l = evict.next()
        releaseQuietly(l); total -= 1
      }
    }
    result
  }
}
