package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the custom expressions, two deployment seams:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the standard extension-jar path) — [[GraftExtensions]]
  *    injects the functions before the session exists.
  *  - [[GraftFunctions.register]] on a live session (REPL / notebook /
  *    test), writing into its FunctionRegistry directly.
  *
  * After either, `vec_dot`, `lsh_buckets_8x4`, `simhash64` and
  * `rolling_hashes16` are callable from SQL text, not just the Column
  * API.
  */
object GraftFunctions {

  /** A wrong argument count must fail analysis with a named, counted
    * message — a bare partial function MatchError surfaces as Spark
    * INTERNAL_ERROR. */
  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args =>
      if (args.size == n) f(args)
      else throw new IllegalArgumentException(
        s"$name requires $n argument(s), got ${args.size}")

  /** (name, description, builder). LSH/rolling variants are registered
    * with fixed geometry — SQL has no way to pass a Double[][] literal,
    * so each deployed configuration registers under its own name. */
  private[functions] def entries: Seq[(String, String, Seq[Expression] => Expression)] = {
    // ONE plane-generation recipe, shared with the oracle-paired LSH
    // plans — a second inline Random(42+t) here could silently drift
    // from the geometry llm_e3_ann_lsh_topk ships in its plan/oracle
    val lshPlanes = (0 until 8)
      .flatMap(t => graft.llmops.LlmOps.hyperplanes(64, t, 4)).toArray
    Seq(
      ("vec_dot", "dot product of two array<double> vectors",
        arity("vec_dot", 2) { case Seq(a, b) => DotProduct(a, b) }),
      ("lsh_buckets_8x4", "8-table 4-bit hyperplane LSH bucket ids (seed 42)",
        arity("lsh_buckets_8x4", 1) { case Seq(v) => LshBuckets(v, lshPlanes, 8, 4) }),
      ("simhash64", "64-bit SimHash of an array<string> token column",
        arity("simhash64", 1) { case Seq(t) => SimHash64(t) }),
      ("rolling_hashes16", "polynomial rolling hashes of 16-char windows (B=257, M=1e9+7)",
        arity("rolling_hashes16", 1) { case Seq(t) => RollingHashes(t, 16, 257L, 1000000007L) }),
      ("word_ngrams", "generator: all n-token windows of array<string> as (pos, ngram) rows",
        arity("word_ngrams", 2) {
          case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(i: Int,
              org.apache.spark.sql.types.IntegerType)) => WordNgrams(t, i)
          case _ => throw new IllegalArgumentException(
            "word_ngrams: second argument must be an INT literal")
        }))
  }

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = entries.foreach { case (name, desc, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, desc),
      builder)
  }
}

/** For spark.sql.extensions: injects the graft functions and optimizer
  * rules at session build. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.entries.foreach { case (name, desc, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, desc), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.VectorizeDotProduct)
  }
}
