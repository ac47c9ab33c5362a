package graft.parity

import graft.{Registry, SparkSpec}

/** Dashboard facade == the registered oracle-checked queries, and the
  * cached view actually serves the selector filters. */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dash = new Dashboard(spark, sfDir)

  test("issue distribution matches the registered A1 query (All + filtered)") {
    dash.issueDistribution().as[(String, Long)].collect().toSeq shouldBe
      Registry.byName("parity_a1_issue_distribution").run(spark, sfDir)
        .as[(String, Long)].collect().toSeq
    dash.issueDistribution("en").as[(String, Long)].collect().toSeq shouldBe
      Registry.byName("parity_a1_issue_distribution_en").run(spark, sfDir)
        .as[(String, Long)].collect().toSeq
  }

  test("record distribution and languages match their registered queries") {
    dash.recordDistribution().as[(Long, Long)].collect().toSeq shouldBe
      Registry.byName("parity_a2a3_tag_histogram").run(spark, sfDir)
        .as[(Long, Long)].collect().toSeq
    dash.languages().as[String].collect().toSeq shouldBe
      Registry.byName("parity_a4_language_list").run(spark, sfDir)
        .as[String].collect().toSeq
  }

  test("refresh survives and still answers") {
    dash.refresh()
    dash.issueDistribution().count() should be > 0L
  }
}
