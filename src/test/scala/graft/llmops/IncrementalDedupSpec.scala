package graft.llmops

import graft.{Registry, SessionMemo, SparkSpec}

/** Pins the operational contract of `llm_e2_incremental_dedup`: the
  * standing base index (stop set, shingle store, signatures) is built
  * exactly once per (session, dir) and a fresh delta probe REUSES it —
  * the whole point of the incremental shape — and the confirmed pairs
  * agree with the batch exact-Jaccard query where the two are comparable
  * (sf0.001 has no shingle near the df cap, so base-split capping and
  * corpus capping coincide). */
class IncrementalDedupSpec extends SparkSpec {

  private val incrKeys =
    Set("incr_base_stop", "incr_base_shingles", "incr_base_sig")

  test("delta probe reuses the memoized base index (no base rebuild)") {
    SessionMemo.clear(spark)
    SessionMemo.drainBuildLog()
    val q = Registry.byName("llm_e2_incremental_dedup")
    q.run(spark, sfDir).count()
    val firstBuilds = SessionMemo.drainBuildLog().map(_._1).toSet
    incrKeys.foreach(k => assert(firstBuilds.contains(k), s"first run must build $k"))
    // drop ONLY the result frame: the next run re-executes the delta
    // probe against the standing index, which must not rebuild
    SessionMemo.clearFrames(spark, Set("incr_dedup"))
    q.run(spark, sfDir).count()
    val secondBuilds = SessionMemo.drainBuildLog().map(_._1).toSet
    assert(secondBuilds.contains("incr_dedup"), "result frame was re-probed")
    incrKeys.foreach(k =>
      assert(!secondBuilds.contains(k), s"re-probe must NOT rebuild base frame $k"))
  }

  test("confirmed pairs split correctly and agree with the batch exact-Jaccard query") {
    val rows = Registry.byName("llm_e2_incremental_dedup").run(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf0.001 must surface at least one delta-vs-base near-dup")
    val exact = Registry.byName("llm_e2_ngram_jaccard_pairs").run(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("da"), r.getAs[Long]("db")) ->
        (r.getAs[Long]("shared"), r.getAs[Double]("jaccard")))
      .toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("delta_id"); val b = r.getAs[Long]("base_id")
      assert(d % LlmOps.incomingMod == LlmOps.incomingRem,
        s"delta_id $d must be in the incoming split")
      assert(b % LlmOps.incomingMod != LlmOps.incomingRem,
        s"base_id $b must be in the base split")
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      val key = (math.min(d, b), math.max(d, b))
      val (sh, ex) = exact.getOrElse(key,
        fail(s"pair $key missing from the batch exact-Jaccard set"))
      assert(sh == r.getAs[Long]("shared"), s"shared count drifted for $key")
      assert(ex == j, s"exact jaccard drifted for $key")
    }
  }
}
