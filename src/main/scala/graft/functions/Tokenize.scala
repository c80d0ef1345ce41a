package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer — reference U1 (`SplitFunction.java:17-35` +
  * `KeywordUtil.java:18-37`): an IK Chinese analyzer UDTF used via
  * `LATERAL TABLE(SplitFunction(item))`; on analyzer error it emits the
  * input string unchanged (one-token passthrough).
  *
  * Spark-first re-expression: whitespace tokenization with the
  * codegen'd built-ins `split` + `filter` (no UDF in the hot path —
  * a Scala UDF would break whole-stage codegen). The IK analyzer is
  * not on the classpath (offline build), so the documented fallback is
  * lowercase whitespace splitting; `tokenizeUdf` keeps U1's
  * error-passthrough contract for callers that need the UDTF shape.
  */
object Tokenize {

  /** Array of lowercase tokens; empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** U1-contract UDF: tokenizes, and on any error emits the input
    * unchanged as a single token (`SplitFunction.java:28-33`). */
  val tokenizeUdf = udf { (s: String) =>
    if (s == null) Seq.empty[String]
    else
      try s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      catch { case _: Throwable => Seq(s) }
  }
}
