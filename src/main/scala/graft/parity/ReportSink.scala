package graft.parity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S6: the flagged-entry report sink (reference call-debias.py:54-136
  * renders a landscape-A4 PDF table per input file, only when the file
  * has >= 1 flagged entry). PDF rendering is presentation, not query
  * semantics (SURVEY.md §2.1) and no PDF library ships in this
  * environment, so the sink renders the same table as fixed-width text —
  * same columns (Record #, Literal, tag detail), same first-row-only
  * blanking of the group keys (call-debias.py:106-108), same
  * one-file-per-source gating — via a distributed partitioned write, not
  * a driver loop.
  *
  * Scale: repartition by source puts each report in exactly one task;
  * rendering is a per-row projection; no data returns to the driver.
  */
object ReportSink {

  private def pad(c: org.apache.spark.sql.Column, w: Int) =
    rpad(coalesce(c.cast("string"), lit("")), w, " ")

  /** Render flagged docs (the A6 shape) as per-source text reports under
    * `outDir/source=<source>/`. Returns the line count written. */
  def writeFlaggedReports(annotated: DataFrame, outDir: String): Long = {
    val flagged = annotated.filter(size(col("tags")) > 0)
    val rows = flagged
      .select(col("source"), col("doc_id"),
        Parity.recordNum(col("text")).as("record_num"),
        Parity.literalText(col("text"), "text").as("literal_text"),
        posexplode(col("tags")))
      .select(col("source"), col("doc_id"), col("record_num"), col("literal_text"),
        col("pos").as("tag_pos"),
        col("col.literal").as("tag_literal"),
        col("col.issue").as("tag_issue"),
        col("col.source").as("tag_source"))
    // first-row-only blanking: tag rows after the first show blank keys
    val first = col("tag_pos") === 0
    val line = concat(
      pad(when(first, col("record_num")).otherwise(lit("")), 10),
      pad(when(first, col("literal_text")).otherwise(lit("")), 48),
      pad(col("tag_literal"), 16),
      pad(col("tag_issue"), 16),
      col("tag_source"))
    val header = "Record #  " + "Literal".padTo(48, ' ') +
      "Tag".padTo(16, ' ') + "Issue".padTo(16, ' ') + "Source"
    val body = rows.select(col("source"), col("doc_id"), col("tag_pos"),
      lit(1).as("ord"), line.as("line"))
    val headers = body.select(col("source")).distinct()
      .select(col("source"), lit(-1L).as("doc_id"), lit(-1).as("tag_pos"),
        lit(0).as("ord"), lit(header).as("line"))
    val n = body.count()
    headers.unionByName(body)
      .repartition(col("source"))
      .sortWithinPartitions("source", "ord", "doc_id", "tag_pos")
      .select(col("source"), col("line"))
      .write.mode("overwrite").partitionBy("source").text(outDir)
    n
  }
}
