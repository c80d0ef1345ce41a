package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSim, GramHashSet, MinHashSig, Mix64, NfcNormalize, SimHashFp, WinnowMinima}

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

  /** Static int parameter of a kernel (band width, gram size): must be
    * an integer LITERAL in SQL — these are constructor parameters that
    * shape the expression, not runtime columns. */
  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(c: Int, _)   => c
    case Literal(c: Long, _)  => c.toInt
    case Literal(c: Short, _) => c.toInt
    case Literal(c: Byte, _)  => c.toInt
    case other => throw new IllegalArgumentException(
      s"$name parameter must be an integer literal, got $other")
  }

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
    // the one-pass text kernels: callable from pure SQL with the same
    // defaults as the Column helpers in `TextExprs`
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(t)    => MinHashSig(t, 64)
        case Seq(t, p) => MinHashSig(t, intLit("minhash_sig perms", p))
        case _ => throw new IllegalArgumentException(
          s"minhash_sig expects 1-2 arguments, got ${args.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("gram_hash_set"),
      new ExpressionInfo(classOf[GramHashSet].getName, "gram_hash_set"),
      (args: Seq[Expression]) => args match {
        case Seq(t)    => GramHashSet(t, 3)
        case Seq(t, n) => GramHashSet(t, intLit("gram_hash_set n", n))
        case _ => throw new IllegalArgumentException(
          s"gram_hash_set expects 1-2 arguments, got ${args.length}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
      (args: Seq[Expression]) => {
        arity("simhash_fp", args, 1)
        SimHashFp(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        arity("nfc_normalize", args, 1)
        NfcNormalize(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName,
        "jaro_winkler"),
      (args: Seq[Expression]) => {
        arity("jaro_winkler", args, 2)
        graft.functions.JaroWinkler(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_minima"),
      new ExpressionInfo(classOf[WinnowMinima].getName, "winnow_minima"),
      (args: Seq[Expression]) => args match {
        case Seq(t)       => WinnowMinima(t, 8, 8)
        case Seq(t, k)    => WinnowMinima(t, intLit("winnow_minima k", k), 8)
        case Seq(t, k, w) => WinnowMinima(t, intLit("winnow_minima k", k),
          intLit("winnow_minima w", w))
        case _ => throw new IllegalArgumentException(
          s"winnow_minima expects 1-3 arguments, got ${args.length}")
      }))
  }
}
