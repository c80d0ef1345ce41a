package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSim, Mix64}

/** SparkSessionExtensions entry point — registers graft's native
  * expressions as SQL functions so `spark.sql("... cosine_sim(a, b)")`
  * works anywhere (including pure-SQL deployments):
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * One OPT-IN optimizer rule is injected (`plans.FuseCosine`,
  * `spark.graft.fuseCosine.enabled`): it rewrites the canonical HOF
  * cosine tree to the fused `CosineSim`. Everything else maps onto
  * Catalyst's existing operators (SURVEY §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.FuseCosine)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        arity("cosine_sim", args, 2)
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("mix64"),
      new ExpressionInfo(classOf[Mix64].getName, "mix64"),
      (args: Seq[Expression]) => {
        arity("mix64", args, 2)
        // SQL integer literals parse as Int (`7`), not Long (`7L`) —
        // widen every integral literal so the natural spelling works
        args(1) match {
          case Literal(c: Long, _)  => Mix64(args(0), c)
          case Literal(c: Int, _)   => Mix64(args(0), c.toLong)
          case Literal(c: Short, _) => Mix64(args(0), c.toLong)
          case Literal(c: Byte, _)  => Mix64(args(0), c.toLong)
          case other => throw new IllegalArgumentException(
            s"mix64 second argument must be an integer literal, got $other")
        }
      }))
  }
}
