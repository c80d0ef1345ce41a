package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer — reference U1 (`SplitFunction.java:17-35` +
  * `KeywordUtil.java:18-37`): an IK Chinese analyzer UDTF used via
  * `LATERAL TABLE(SplitFunction(item))`; on analyzer error it emits the
  * input string unchanged (one-token passthrough).
  *
  * Spark-first re-expression with the codegen'd built-ins `split` +
  * `filter`/`transform` (no UDF in the hot path — a Scala UDF would
  * break whole-stage codegen). The IK analyzer is not on the classpath
  * (offline build), so CJK text uses the public-knowledge fallback:
  * Lucene-CJKAnalyzer-style overlapping character bigrams over each Han
  * run (a lone Han character stays a single token), non-Han segments
  * lowercase-whitespace-split. Pure-ASCII text takes the plain
  * whitespace path unchanged, gated by one document-level regex probe.
  * `tokenizeUdf` keeps U1's error-passthrough contract for callers that
  * need the UDTF shape. Both forms segment Han runs by CODE POINT
  * (Spark's `length`/`substr` are code-point-based; the Scala twin
  * iterates `codePoints`), so surrogate-pair (ext-B) Han bigrams agree
  * between the column form, the typed twin, and the native kernels
  * built on it — no bigram ever splits a surrogate pair.
  */
object Tokenize {

  /** Array of lowercase tokens; empty strings removed; Han runs
    * bigram-segmented. */
  def tokens(text: Column): Column =
    when(text.rlike("\\p{IsHan}"), cjkTokens(text)).otherwise(wsTokens(text))

  /** [[tokens]] with the array elements marked NULLABLE — the form
    * every `explode_outer` consumer must use (r11). The generator
    * output of an outer explode inherits the element type's
    * containsNull=false, so the padded null row of a zero-token doc is
    * read by downstream null-unaware codegen as an EMPTY value: the
    * classifier's md5(w) evaluated md5('') instead of NULL and a
    * zero-token doc scored as one ''-token (caught by LlmOpsSpec).
    * The per-element `when` wrapper is an identity on real tokens
    * (length(t) >= 0 always holds for a non-null t, and it is not
    * foldable, so the nullability survives the optimizer); its only
    * effect is containsNull=true, which restores null propagation for
    * the padded row. */
  def tokensNullable(text: Column): Column =
    transform(tokens(text), t => when(length(t) >= 0, t))

  /** Plain lowercase whitespace tokens — the `\S+` runs. Exposed for
    * callers whose metric is defined as whitespace token count
    * (`TextAnalysis.tokenCounts.ws_tokens`) regardless of CJK
    * segmentation. */
  private[graft] def wsTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= lit(""))

  /** CJK path: space out Han runs, whitespace-split, then expand each
    * multi-char Han run into its overlapping bigrams. */
  private[graft] def cjkTokens(text: Column): Column = {
    val spaced = regexp_replace(lower(text), "(\\p{IsHan}+)", " $1 ")
    val rough = filter(split(spaced, "\\s+"), t => t =!= lit(""))
    flatten(transform(rough, t =>
      when(length(t) >= 2 && t.rlike("^\\p{IsHan}+$"),
        transform(sequence(lit(1), length(t) - 1), i => t.substr(i, lit(2))))
        .otherwise(array(t))))
  }

  /** Scala-side twin of `tokens` (same lowercase/Han-bigram rules) for
    * typed `mapPartitions` paths that tokenize in plain JVM code. */
  private[graft] def tokensScala(s: String): Seq[String] =
    if (s == null) Seq.empty[String]
    else {
      // UTF8String.toLowerCase == Spark's lower(): locale-independent,
      // unlike String.toLowerCase (Turkish-I would diverge from the
      // column twin and break probe/batch agreement)
      val lowered = org.apache.spark.unsafe.types.UTF8String
        .fromString(s).toLowerCase.toString
      val spaced = lowered.replaceAll("(\\p{IsHan}+)", " $1 ")
      spaced.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { t =>
        // code-point bigrams, matching the column form's code-point
        // length()/substr() — String.sliding(2) would split the
        // surrogate pairs of ext-B Han into garbage half-tokens
        val cps = t.codePoints.toArray
        if (cps.length >= 2 && t.matches("\\p{IsHan}+"))
          (0 until cps.length - 1).map(i => new String(cps, i, 2))
        else Seq(t)
      }
    }

  /** U1-contract UDF: tokenizes (same semantics as `tokens`), and on
    * any error emits the input unchanged as a single token
    * (`SplitFunction.java:28-33`). */
  val tokenizeUdf = udf { (s: String) =>
    try tokensScala(s)
    catch { case _: Throwable => Seq(s) }
  }
}
