package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook exposing graft's native expressions to
  * SQL (`spark.sql("SELECT graft_poly_hash(text) ...")`) — register via
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  * or `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * SQL surface:
  *   graft_poly_hash(str)                    → bigint
  *   graft_dot(array<double>, array<double>) → double
  *   graft_shingle_hashes(array<string>, w)  → array<bigint>  (mod P)
  *   graft_simhash(array<bigint>, bits)      → bigint
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator plan: GroupedTopK logical node → bounded-heap exec
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_poly_hash"),
      info("graft_poly_hash", "_FUNC_(str) - polynomial rolling hash mod 1e9+7"),
      (args: Seq[Expression]) => PolyHashExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "_FUNC_(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProductExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "_FUNC_(tokens, w) - distinct hashes of w-word shingles"),
      (args: Seq[Expression]) =>
        ShingleHashesExpr(args(0), intArg(args(1), "w"), PolyHashExpr.P)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "_FUNC_(hashes, bits) - simhash of token hashes"),
      (args: Seq[Expression]) =>
        SimHashExpr(args(0), intArg(args(1), "bits"))))
  }
}
