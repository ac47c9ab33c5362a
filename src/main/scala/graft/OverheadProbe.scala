package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query fixed-overhead decomposition probe (optimization guide §1:
  * measure first). For each selected registry query it splits one warm
  * bench-shaped execution into
  *   construct  — `q.run(...)` DataFrame construction (analysis)
  *   plan       — `queryExecution.executedPlan` (optimize + physical plan)
  *   exec1/2/3  — repeated noop-sink executions (exec1 carries codegen)
  * and, for the LAST execution, listener-counted jobs / stages / tasks
  * plus the summed task run time — so driver-side scheduling latency
  * (wall − task-time/cores) is separable from real cluster work.
  * Diagnostic only: never run by the driver, writes nothing. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", T.warehouseDir)
    // extra conf overrides for A/B experiments: PROBE_CONF="k=v;k=v"
    val b = sys.env.get("PROBE_CONF").map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty[String])
      .foldLeft(b0) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    T.quietBoundedWindowWarnings()
    T.tableNames.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").write.format("noop").mode("overwrite").save()
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskNanos = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) { taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L); () }
      }
    })
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val names = args.toSeq
    val qs = Registry.all.filter(q => names.isEmpty || names.exists(q.name.contains))
    println(f"${"query"}%-32s constr  plan   exec1  exec2  exec3  jobs stgs tasks taskSec")
    qs.foreach { q =>
      SessionMemo.clear(spark)
      try {
        val (df, tC) = t(q.run(spark, sfDir))
        val (_, tP) = t(df.queryExecution.executedPlan)
        val (_, e1) = t(df.write.format("noop").mode("overwrite").save())
        val (_, e2) = t(q.run(spark, sfDir).write.format("noop").mode("overwrite").save())
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
        val (_, e3) = t(q.run(spark, sfDir).write.format("noop").mode("overwrite").save())
        Thread.sleep(150) // let straggler listener events drain
        println(f"${q.name}%-32s $tC%6.3f $tP%6.3f $e1%6.3f $e2%6.3f $e3%6.3f ${jobs.get}%4d ${stages.get}%4d ${tasks.get}%5d ${taskNanos.get / 1e9}%7.2f")
      } catch { case e: Throwable => println(s"${q.name}  FAILED ${e.getMessage.take(120)}") }
    }
    spark.stop()
  }
}
