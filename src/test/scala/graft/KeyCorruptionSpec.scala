package graft

import org.apache.spark.sql.functions._

/** KEY CORRUPTION — the harsher sibling of the duplicate-key axis
  * (DupKeySpec) and the measured half of its documented boundary: a key
  * REUSED WITH A DIFFERENT PAYLOAD (two writers assigned the same id
  * range, a backfill that recomputed a column, an upstream id-generator
  * reset). The tenth axis's contract says per-op semantics under
  * corruption are "deterministic, not meaningful" — this spec MEASURES
  * the deterministic part (round-15 pilot of the candidate eleventh
  * axis):
  *
  *  - every registry query still executes (no-throw sweep);
  *  - `q_constraint_audit` still detects every corrupted key class
  *    (uniqueness counts distinct KEYS, so payload-diff reuse is
  *    exactly as visible as exact duplication);
  *  - the queries most exposed to an arbitrary pick-one-of-the-copies
  *    (entity sinks, key-joined lookups, tie-broken windows and as-of
  *    matches) produce IDENTICAL output across independent runs — and
  *    for the blob sink, across independently-built corpora (the write
  *    path collapses corrupt copies via min(text), a deterministic
  *    winner, where dropDuplicates would be partition-dependent).
  *
  * No cross-engine gate for this fixture BY DESIGN: the oracle mirrors
  * assume the duplicate-row contract (byte-identical copies), so
  * divergence under corruption is expected and meaningless — detection
  * plus engine-side determinism IS the declared behavior.
  */
class KeyCorruptionSpec extends SparkSpec {

  /** Keys reused with different payloads, appended at the end (the
    * second writer's output). Residues disjoint from DupKeySpec's. */
  private def buildCorruptDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_keycorrupt").toString
    T.tableNames.foreach { t =>
      val base = T(spark, sfDir, t)
      val out = t match {
        case "documents" =>
          base.unionAll(base.filter(col("doc_id") % 23 === 11)
            .withColumn("text", concat(col("text"), lit(" zz corrupted variant payload"))))
        case "embeddings" =>
          base.unionAll(base.filter(col("vec_id") % 29 === 13)
            .withColumn("embedding", reverse(col("embedding"))))
        case "events" =>
          base.unionAll(base.filter(col("event_id") % 31 === 17)
            .withColumn("value", col("value") + 1000.0)
            .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")))
        case "orders" =>
          base.unionAll(base.filter(col("o_orderkey") % 37 === 19)
            .withColumn("o_totalprice", col("o_totalprice") + 1))
        case _ => base
      }
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    SessionMemo.clear(spark)
    dir
  }

  private lazy val corruptDir: String = buildCorruptDir()

  private def run(name: String, dir: String) = Registry.byName(name).run(spark, dir)

  test("all registry queries execute on the key-corrupted corpus") {
    val failures = Registry.all.flatMap { q =>
      try {
        q.run(spark, corruptDir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable => Some(s"${q.name}: ${e.getMessage.linesIterator.next()}")
      }
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
  }

  test("q_constraint_audit detects payload-diff key reuse exactly like exact duplication") {
    val audit = run("q_constraint_audit", corruptDir)
      .select("constraint_name", "n_violations", "pass")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // planted reuse counts at sf0.001 (residues above)
    Map(
      "documents.doc_id UNIQUE" -> 22L,
      "embeddings.vec_id UNIQUE" -> 17L,
      "events.event_id UNIQUE" -> 32L,
      "orders.o_orderkey UNIQUE" -> 41L).foreach { case (rule, n) =>
      withClue(rule) { audit(rule) shouldBe ((n, false)) }
    }
  }

  test("pick-sensitive queries are run-to-run deterministic under key corruption") {
    val names = Seq(
      "llm_e3_knn_classify",          // key-joined label lookup + top-k ties
      "llm_e2_ngram_jaccard_pairs",   // per-doc shingle SET becomes a union
      "parity_a6_flagged_report",     // posexplode ordinals per copy
      "parity_p2p6_null_tag_semantics",
      "e5_asof_nearest_click",        // tie-broken match over reused event_ids
      "e5_forward_fill")              // window ordered by (ts, event_id) ties
    val failures = names.flatMap { n =>
      def once(): Seq[String] = {
        SessionMemo.clear(spark)
        run(n, corruptDir).collect().map(_.toString).sorted.toSeq
      }
      val (a, b) = (once(), once())
      if (a == b) None else Some(s"$n: ${a.size} vs ${b.size} rows, first diff " +
        a.zip(b).find { case (x, y) => x != y }.map(_.toString).getOrElse("size"))
    }
    withClue(failures.mkString("\n")) { failures shouldBe empty }
    SessionMemo.clear(spark)
  }

  test("blob sink collapses corrupt copies to a deterministic winner across corpora") {
    // two independently-built corpora with the same (corrupted) logical
    // content must materialize byte-identical blob stores: min(text)
    // picks the same winner regardless of partitioning or build order
    val dirA = corruptDir
    val dirB = buildCorruptDir()
    def ingest(d: String) = run("mm_binary_ingest", d)
      .select("media_id", "n_bytes", "content_md5")
      .collect().map(_.toString).sorted.toSeq
    val (a, b) = (ingest(dirA), ingest(dirB))
    withClue("blob store content diverged between identical corpora") { a shouldBe b }
    // and the corrupted ids resolve to exactly one object each
    a.size shouldBe T(spark, sfDir, "documents").count().toInt
  }
}
