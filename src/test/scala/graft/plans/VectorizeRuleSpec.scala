package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The auto-vectorization rule must (1) fire on exactly the canonical
  * HOF dot-product shape — element nullability included, since round 9
  * made DotProduct's null-slot semantics HOF-identical — (2) preserve
  * results bit-for-bit including the unequal-length and null-slot NULL
  * cases, and (3) leave near-miss shapes (other seeds, other folds)
  * alone. */
class VectorizeRuleSpec extends SparkSpec {
  import spark.implicits._

  // suite-level caches are unpersisted in afterAll (the session is shared
  // JVM-wide; without this both embeddings copies stay pinned for the
  // whole sbt test run) — only the ones a test actually initialized
  private val pinned = scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()

  // coalesce against a literal makes the element type non-nullable
  // (containsNull = false) — the shape the rule is allowed to rewrite
  private lazy val vecs = {
    GraftOptimizations.install(spark)
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => coalesce(x.cast("double"), lit(0.0))).as("v"))
      .cache()
    pinned += df
    df
  }

  private val hofDot =
    "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

  // the natural query shape: the HOF over the raw float embeddings, no
  // double cast anywhere (coalesce keeps containsNull = false, type float)
  private lazy val vecsF = {
    GraftOptimizations.install(spark)
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => coalesce(x, lit(0.0f))).as("v"))
      .cache()
    pinned += df
    df
  }

  override protected def afterAll(): Unit = {
    pinned.foreach(_.unpersist())
    super.afterAll()
  }

  test("rule rewrites the HOF fold to the codegen'd vec_dot expression") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(100)
      .select(expr(hofDot).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    optimized should include("vec_dot")
    optimized should not include "aggregate("
  }

  test("rewritten plan returns bit-identical results to the interpreted fold") {
    GraftOptimizations.install(spark)
    // deterministic pair set (NOT limit(): which rows survive a limit on
    // a crossJoin varies with task scheduling, and this test collects
    // the frame twice — a flaky key mismatch under load)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 33) // 528 pairs
    val viaRule = pairs.select($"a.vec_id", $"b.vec_id", expr(hofDot).as("dot"))
      .as[(Long, Long, Double)].collect().toMap2
    // reference: the expression applied directly, bypassing the rewrite
    val direct = pairs.select($"a.vec_id", $"b.vec_id",
        graft.functions.VectorFunctions.dot($"a.v", $"b.v").as("dot"))
      .as[(Long, Long, Double)].collect().toMap2
    viaRule shouldBe direct
  }

  test("unequal-length arrays yield NULL from the rewritten plan, matching the HOF") {
    GraftOptimizations.install(spark)
    // arrays must come from the parquet-backed frame: literal input gets
    // constant-folded to a LocalRelation before the plan-string assertion
    // could ever see the rewrite (slice() preserves containsNull=false)
    val df = vecs.limit(5)
      .select(slice($"v", 1, 3).as("a"), slice($"v", 1, 2).as("b"))
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)").as("dot"))
    df.queryExecution.optimizedPlan.toString should include("vec_dot")
    // ...and reproduces zip_with's null-padding semantics: NULL, not a
    // min-length dot product
    val rows = df.collect()
    rows should not be empty
    all(rows.map(_.isNullAt(0))) shouldBe true
  }

  test("float-array HOF (no double cast) rewrites and stays bit-identical") {
    GraftOptimizations.install(spark)
    // deterministic pair set — this test collects `pairs` twice (via the
    // rule and raw), so a limit() would flakily select different subsets
    val pairs = vecsF.as("a").crossJoin(vecsF.as("b"))
      .filter($"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 21) // 210 pairs
    val df = pairs.select($"a.vec_id", $"b.vec_id", expr(hofDot).as("dot"))
    // the analyzer's merge shape over float is acc + cast(v as double);
    // the widened match must still fire
    df.queryExecution.optimizedPlan.toString should include("vec_dot")
    val viaRule = df.as[(Long, Long, Double)].collect().toMap2
    viaRule should not be empty
    // reference: the HOF's own semantics replayed driver-side — FLOAT
    // multiply (zip_with binds float), THEN widen to double for the fold.
    // A double multiply of widened floats is exact and would differ.
    val raw = pairs.select($"a.vec_id", $"b.vec_id", $"a.v", $"b.v")
      .as[(Long, Long, Array[Float], Array[Float])].collect()
    raw.foreach { case (i, j, va, vb) =>
      var s = 0.0
      var k = 0
      val n = math.min(va.length, vb.length)
      while (k < n) { s += (va(k) * vb(k)).toDouble; k += 1 }
      withClue(s"pair ($i,$j): ") {
        java.lang.Double.doubleToLongBits(viaRule((i, j))) shouldBe
          java.lang.Double.doubleToLongBits(s)
      }
    }
  }

  test("nullable-element arrays (the raw parquet shape) rewrite and stay bit-identical") {
    GraftOptimizations.install(spark)
    // no coalesce: parquet arrays carry containsNull = true — the shape
    // real queries read. Since round 9 DotProduct propagates null slots
    // exactly like the HOF's poisoned fold, so the rule may (and must,
    // for perf) fire here too.
    val nvecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    nvecs.schema("v").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull shouldBe true
    val pairs = nvecs.as("a").crossJoin(nvecs.as("b"))
      .filter($"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 21) // 210 pairs
    val df = pairs.select($"a.vec_id", $"b.vec_id", expr(hofDot).as("dot"))
    df.queryExecution.optimizedPlan.toString should include("vec_dot")
    val viaRule = df.as[(Long, Long, Double)].collect().toMap2
    val direct = pairs.select($"a.vec_id", $"b.vec_id",
        graft.functions.VectorFunctions.dot($"a.v", $"b.v").as("dot"))
      .as[(Long, Long, Double)].collect().toMap2
    viaRule shouldBe direct

    // planted null slot: append a null element to BOTH sides (lengths
    // stay equal) — the HOF's fold is poisoned to NULL and the rewritten
    // plan must agree, row for row
    val poisoned = nvecs.limit(5)
      .select(concat($"v", array(lit(null).cast("double"))).as("a"),
        concat($"v", array(lit(null).cast("double"))).as("b"))
      .select(expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)").as("dot"))
    poisoned.queryExecution.optimizedPlan.toString should include("vec_dot")
    val rows = poisoned.collect()
    rows should not be empty
    all(rows.map(_.isNullAt(0))) shouldBe true
  }

  test("near-miss shapes are left to the interpreted HOF path") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(10)
      // different seed (1.0) — must NOT rewrite
      .select(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 1.0D, (acc, v) -> acc + v)").as("s"))
    df.queryExecution.optimizedPlan.toString should not include "vec_dot"
    // different merge op (max) — must NOT rewrite
    val df2 = vecs.as("a").crossJoin(vecs.as("b")).limit(10)
      .select(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, v) -> greatest(acc, v))").as("s"))
    df2.queryExecution.optimizedPlan.toString should not include "vec_dot"
    // -0.0 seed — numerically == 0.0 but bit-distinct (empty arrays fold
    // to the seed, so a rewrite would flip the sign bit) — must NOT rewrite
    val df3 = vecs.as("a").crossJoin(vecs.as("b")).limit(10)
      .select(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), -0.0D, (acc, v) -> acc + v)").as("s"))
    df3.queryExecution.optimizedPlan.toString should not include "vec_dot"
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
