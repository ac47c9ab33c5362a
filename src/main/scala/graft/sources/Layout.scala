package graft.sources

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators (S-family, SURVEY §2.1 continued): Hive-style
  * partitioned writes and partition-pruned reads — the layout decision
  * that matters most at 100 TB. A `lang=<v>/` directory tree turns every
  * per-language query into a scan of 1/|lang| of the corpus: the filter
  * is resolved against the FILE INDEX (PartitionFilters), so the pruned
  * partitions' files are never opened, never listed into tasks, never
  * decoded. Contrast with `PushedFilters`, which still reads footers and
  * row-groups of every file.
  *
  * The reference's input tree is exactly this layout (one directory per
  * language, `/root/reference/call-debias.py:184-186`); here it becomes a
  * first-class columnar layout instead of a Python `os.walk`.
  */
object Layout {

  /** One partitioned copy of `documents` per (process, sfDir), written
    * lazily and only once — the layout cost is paid at write time and
    * amortized over every subsequent pruned query, which is the whole
    * point of partitioning. Keyed like the bucketed tables: pid-scoped
    * tmpdir so concurrent harnesses never collide. */
  private val written = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def partitionedDocs(s: SparkSession, dir: String): String =
    written.computeIfAbsent(dir, { _ =>
      val pid = ProcessHandle.current().pid()
      val path = s"${sys.props("java.io.tmpdir")}/graft_layout_p$pid/${dir.hashCode.toHexString}/docs_by_lang"
      T(s, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(path)
      path
    })

  /** Per-language quality aggregate over the PRUNED partition only. The
    * scan's PartitionFilters (asserted in LayoutSpec) restrict the file
    * index to `lang=de/` before any task launches: at 100 TB with 50
    * languages this reads 2% of the bytes a full scan would.
    *
    * `lang` is a partition column on the Spark side (directory-derived)
    * and a data column in the oracle's parquet — same values, and the
    * aggregate keys on it identically. */
  private val prunedScan = GraftQuery(
    "q_partition_pruned_scan",
    "Hive-partitioned write + partition-pruned per-language scan (S1 §2.1)",
    Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents WHERE lang = 'de' GROUP BY lang"""),
    (s, dir) => {
      val path = partitionedDocs(s, dir)
      s.read.parquet(path)
        .filter(col("lang") === "de")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ", -1))).as("n_tokens"))
    })

  /** Dynamic-partition-pruning shape: the language filter lives on a DIM
    * table (a tiny language→family mapping) and reaches the partitioned
    * fact scan through the join — Spark plans a DPP subquery that
    * evaluates the dim filter first and prunes fact partitions at
    * runtime. This is the star-schema version of static pruning: the
    * fact query never names the partition values, yet still reads only
    * the matching directories. */
  private val dppScan = GraftQuery(
    "q_dynamic_partition_pruning",
    "dim-filter prunes partitioned fact scan through the join (DPP, §2.1/§2.3)",
    Some("""
      WITH langdim AS (
        SELECT * FROM (VALUES ('en', 'germanic'), ('de', 'germanic'),
                              ('fr', 'romance'), ('es', 'romance'),
                              ('zh', 'sinitic')) AS t(lang, family))
      SELECT d.lang, COUNT(*) AS n_docs
      FROM documents d JOIN langdim l ON d.lang = l.lang
      WHERE l.family = 'romance'
      GROUP BY d.lang ORDER BY d.lang"""),
    (s, dir) => {
      import s.implicits._
      val path = partitionedDocs(s, dir)
      // the dim must be FILE-backed: an inline VALUES relation is
      // constant-folded before the DPP rule looks for a selective dim
      // filter, and no pruning subquery would be planted
      val dimPath = written.computeIfAbsent(s"$dir#langdim", { _ =>
        val p = s"${sys.props("java.io.tmpdir")}/graft_layout_p${ProcessHandle.current().pid()}/${dir.hashCode.toHexString}/langdim"
        Seq(("en", "germanic"), ("de", "germanic"), ("fr", "romance"),
          ("es", "romance"), ("zh", "sinitic")).toDF("lang", "family")
          .write.mode("overwrite").parquet(p)
        p
      })
      s.read.parquet(path).as("d")
        .join(s.read.parquet(dimPath).filter(col("family") === "romance").as("l"), "lang")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    })

  def queries: Seq[GraftQuery] = Seq(prunedScan, dppScan)
}
