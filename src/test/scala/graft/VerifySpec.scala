package graft

/** Pins for Verify's memo-liveness release discipline (round-14
  * mandates #2/#3 and both round-13 driver advisories on Verify).
  *
  * 1. The checked-in [[MemoLiveness]] manifest must match the LIVE
  *    frame-access map of the registry — a stale manifest can only cost
  *    (delayed release or a rebuild), never correctness, but this test
  *    keeps even that from landing silently, and prints the fresh
  *    literal to paste on mismatch.
  * 2. Under Verify's release discipline (drop each frame right after
  *    its manifest-declared last consumer), every non-`table:` memo key
  *    builds EXACTLY ONCE over the full registry sweep — the property
  *    that keeps Verify at baseline cost (an indiscriminate per-query
  *    clear measured 3.2x the sf0.01 wall in round 13, and the round-13
  *    prefix-boundary scheme silently rebuilt shared PQ constants 3x).
  */
class VerifySpec extends SparkSpec {

  test("MemoLiveness manifest matches live access map; every memo builds exactly once under liveness release") {
    SessionMemo.clear(spark)
    SessionMemo.drainFrameAccessLog()
    SessionMemo.drainBuildLog()
    // one full registry sweep, replaying Verify's exact release rule;
    // run() is plan construction, which is where every driver-side memo
    // access happens (builds materialize eagerly inside the memo)
    val actual = Registry.all.map { q =>
      q.run(spark, sfDir)
      val keys = SessionMemo.drainFrameAccessLog().distinct
      SessionMemo.clearFrames(spark, MemoLiveness.releasableAfter(q.name))
      (q.name, keys)
    }.filter(_._2.nonEmpty)
    // the generated-oracle pass runs after the sweep in Verify; any
    // frame it touched would need to stay live to the end of the run
    SparkEntry.oracleSqlFor(spark, sfDir)
    val oracleFrames = SessionMemo.drainFrameAccessLog().distinct

    def literal(rows: Seq[(String, Seq[String])]): String =
      rows.map { case (n, ks) =>
        s"""    ("$n", Seq(${ks.map("\"" + _ + "\"").mkString(", ")})),"""
      }.mkString("\n")
    withClue("MemoLiveness.frameAccess is stale — replace with:\n" +
        literal(actual) + "\n") {
      actual shouldBe MemoLiveness.frameAccess
    }
    withClue("MemoLiveness.oracleGenFrames is stale — replace with: " +
        oracleFrames.mkString(", ") + "\n") {
      oracleFrames shouldBe MemoLiveness.oracleGenFrames
    }

    // build-once: with release only ever AFTER a frame's last consumer,
    // no key (frame or value) may have been rebuilt during the sweep
    val builds = SessionMemo.drainBuildLog().map(_._1)
    val rebuilt = builds.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    withClue(s"memo keys built more than once during a liveness-released " +
        s"registry sweep: ${rebuilt.mkString(", ")} — a release fired before " +
        "a key's true last consumer (manifest or release-rule bug)\n") {
      rebuilt shouldBe empty
    }
    SessionMemo.clear(spark)
  }
}

/** Pin for the determinism contract the generated-oracle path and the
  * fresh-session partition-invariance audit both lean on (round-14
  * mandate #2): every data-dependent oracle (the SQL that embeds fitted
  * constants — k-means centroids, PQ codebooks) must regenerate
  * BYTE-IDENTICALLY after a full [[SessionMemo.clear]], i.e. the fitted
  * constants are deterministic per (session, dir), not merely cached. */
class MemoDeterminismSpec extends SparkSpec {

  test("generated oracle SQL is identical warm vs after a full memo clear") {
    val gen = Registry.all.filter(_.oracleGen.isDefined)
    gen should not be empty
    val warm = gen.map(q => q.name -> q.oracleGen.get(spark, sfDir)).toMap
    SessionMemo.clear(spark)
    val cold = gen.map(q => q.name -> q.oracleGen.get(spark, sfDir)).toMap
    gen.foreach { q =>
      withClue(s"${q.name}: regenerated oracle SQL diverged after clear — " +
          "a fitted constant is not deterministic per (session, dir)\n") {
        cold(q.name) shouldBe warm(q.name)
      }
    }
    SessionMemo.clear(spark)
  }
}
