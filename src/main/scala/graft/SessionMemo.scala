package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of MATERIALIZED (persisted + counted) frames
  * shared across queries in one Verify/Bench/test run. Two reasons it
  * exists:
  *  - sharing: several query pairs consume the same expensive
  *    intermediate (the exact-Jaccard pair set, the df-capped shingle
  *    index, the repeated-span index, the RFM user frame); without the
  *    memo each consumer rebuilds it from scratch in the same run.
  *  - cache ownership: every frame pinned here is threshold-bounded or
  *    dimension-sized (never corpus-sized), there is ONE copy per
  *    (session, dir, key), and there is an explicit release point:
  *    [[clear]] is called by `SparkSpec.afterAll` and at the end of
  *    `Bench.main` / `Verify.main`.
  * Concurrency: a lost first-access race builds twice; the loser's
  * persisted frame is unpersisted immediately, so exactly one copy
  * stays pinned either way. A [[clear]] racing an in-flight build is
  * also safe: registration is epoch-guarded, so a build that started
  * before the clear hands back its (correct) frame UNCACHED and
  * unregistered instead of re-pinning it past the release point. */
object SessionMemo {

  private val memo =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), DataFrame]()
  // driver-side (non-Spark) values that pair with memoized frames, e.g.
  // the PQ codebook arrays that produced the memoized code column
  private val values =
    scala.collection.concurrent.TrieMap[(SparkSession, String, String), Any]()
  // epoch fences registration against clear(): bumped under `lock` by
  // every clear, read under `lock` before a build starts
  private val lock = new Object
  private var epoch = 0L

  /** Build-time audit log: every memo/value build that actually RAN
    * appends (key, seconds). Bench drains it after each query to (a)
    * emit the build as its own `memo:<key>` line and (b) subtract it
    * from the triggering query's wall time — without this, shared-index
    * build costs land on whichever family member runs FIRST in each
    * (shuffled) pass, making per-query numbers redistribute with pass
    * order and cross-round trajectories unreadable (round-11 llm_e2).
    * Table-frame reads (`table:` keys, footer-only) are excluded as
    * noise. Bounded: a handful of entries per pass; harmless if never
    * drained (Verify/tests). */
  private val buildLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  private[graft] def drainBuildLog(): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    var e = buildLog.poll()
    while (e != null) { out += e; e = buildLog.poll() }
    out.toSeq
  }

  /** Access audit log: every FRAME access ([[memoized]]/[[materialized]],
    * hit or build; `table:` keys excluded as noise) appends its key.
    * Verify's liveness-based clearing is driven by the checked-in
    * [[MemoLiveness]] manifest of exactly these accesses; VerifySpec
    * regenerates the manifest from this log at sf0.001 and fails loudly
    * if the checked-in copy is stale. Bounded: a handful of entries per
    * query; harmless if never drained. */
  private val accessLog =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[graft] def drainFrameAccessLog(): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var e = accessLog.poll()
    while (e != null) { out += e; e = accessLog.poll() }
    out.toSeq
  }

  // Per-thread nesting stack: a build that pulls ANOTHER memo (span
  // index atop the shingle index) must log only its SELF time, or the
  // drain-side subtraction double-counts the inner build. Time moved
  // to a child's own line is removed from the parent; unlogged
  // (`table:`) children stay inside the parent's time.
  private val nesting = new ThreadLocal[java.util.ArrayDeque[java.lang.Double]] {
    override def initialValue() = new java.util.ArrayDeque[java.lang.Double]()
  }

  private def logged[A](key: String)(build: => A): A = {
    val stack = nesting.get()
    stack.push(0.0)
    val t0 = System.nanoTime()
    try build
    finally {
      val total = (System.nanoTime() - t0) / 1e9
      val childLogged = stack.pop().doubleValue()
      if (!key.startsWith("table:")) {
        buildLog.add((key, math.max(total - childLogged, 0.0)))
        if (!stack.isEmpty) stack.push(stack.pop().doubleValue() + total)
      } else if (!stack.isEmpty && childLogged > 0)
        stack.push(stack.pop().doubleValue() + childLogged)
    }
  }

  /** The memoized frame for (s, dir, key), building (and thereby
    * persisting) it on first access. `build` must return an
    * already-materialized frame — persist + an action — so the loser of
    * a first-access race can be unpersisted safely. */
  def memoized(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame = {
    if (!key.startsWith("table:")) accessLog.add(key)
    val k = (s, dir, key)
    memo.get(k).getOrElse {
      val e0 = lock.synchronized(epoch)
      val built = logged(key)(build) // outside the lock: builds stay concurrent
      lock.synchronized {
        if (epoch != e0) { built.unpersist(); built } // clear() won: don't re-pin
        else memo.putIfAbsent(k, built) match {
          case Some(winner) => built.unpersist(); winner
          case None => built
        }
      }
    }
  }

  /** [[memoized]] with the materialization contract handled here: the
    * built frame is persisted and counted before registration, so call
    * sites cannot forget either half. Use [[memoized]] directly only
    * when the build needs custom persist/release logic. */
  def materialized(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    memoized(s, dir, key) {
      val built = build.persist()
      // a failed materialization must not leave the frame pinned: it is
      // never registered, so clear() could not release it later
      try built.count()
      catch { case t: Throwable => built.unpersist(); throw t }
      built
    }

  /** A plain driver-side value memoized per (session, dir, key) — for
    * expensive non-DataFrame artifacts (codebooks, fitted constants)
    * that must stay consistent with a memoized frame derived from them.
    * Values pin no cluster resources, so no epoch guard is needed: a
    * build racing [[clear]] leaves at most a stale entry that the next
    * clear removes, and a lost first-access race just discards the
    * loser's value. */
  def value[T](s: SparkSession, dir: String, key: String)(build: => T): T =
    values.getOrElseUpdate((s, dir, key), logged(key)(build)).asInstanceOf[T]

  /** Unpersist and drop every memoized frame belonging to `s`. Builds
    * in flight when this runs will NOT register afterwards (epoch
    * guard) — nothing stays pinned past this call. */
  def clear(s: SparkSession): Unit = lock.synchronized {
    epoch += 1
    memo.keys.filter(_._1 eq s).foreach { k =>
      memo.remove(k).foreach(_.unpersist())
    }
    values.keys.filter(_._1 eq s).foreach(values.remove)
  }

  /** Unpersist and drop the memoized FRAMES of `s` whose key is in
    * `keys` (any dir), leaving driver-side [[value]]s untouched — values
    * pin no cluster storage, and the generated-oracle path needs the
    * fitted constants (centroids, codebooks) to stay warm for the whole
    * run. This is Verify's liveness release: each frame is dropped right
    * after its LAST consumer in registry order ([[MemoLiveness]]), so
    * pinned storage never accumulates across families (the round-13
    * 32x OOM) while every shared frame still builds exactly once. */
  def clearFrames(s: SparkSession, keys: Set[String]): Unit = lock.synchronized {
    if (keys.nonEmpty) {
      epoch += 1
      memo.keys.filter(k => (k._1 eq s) && keys.contains(k._3)).foreach { k =>
        memo.remove(k).foreach(_.unpersist())
      }
    }
  }
}
