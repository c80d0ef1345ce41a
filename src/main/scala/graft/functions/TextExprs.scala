package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel: all window minima of the rolling k-gram
  * hash sequence of one document, in ONE imperative pass per row.
  * Positions and lengths are in code points (Spark `substring`/`length`
  * semantics), so supplementary-plane text matches the relational twin.
  *
  * Semantics are bit-identical to the relational form
  * (`TextAnalysis.winnowFingerprintsRelational`: posexplode positions →
  * md5-prefix hash → sliding rows-window min): h(pos) = first 4 bytes
  * of md5(lower(text).substring(pos, k)) as an unsigned big-endian
  * long, wmin(pos) = min h(pos..pos+w-1) clamped at the end, one
  * position when the text is shorter than k — asserted by
  * `LlmOpsSpec`'s parity test and the unchanged DuckDB oracle.
  *
  * Why an Expression: the relational form explodes one row per
  * CHARACTER (≈1k rows/doc) through a sort + sliding window — the
  * heaviest query in the bench. This loop touches each row once;
  * `CodegenFallback` is fine because the surrounding projection is
  * trivial and the cost is the md5 calls either way. */
case class WinnowMinima(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, s"winnow k/w must be positive, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_minima"

  // MessageDigest is stateful and expression instances can be shared
  // across local-mode threads — one digest per thread
  @transient private lazy val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val digest = md.get()
    // UTF8String.toLowerCase matches Spark's lower(), not the JVM
    // default-locale toLowerCase
    val t = input.asInstanceOf[UTF8String].toLowerCase.toString
    // Spark's length()/substring() count CODE POINTS, not UTF-16 code
    // units — supplementary-plane text (emoji, CJK ext-B) must index
    // grams by code points to keep the relational twin's positions and
    // never split a surrogate pair mid-gram. The all-BMP case (the
    // overwhelmingly common one) keeps the original tight
    // char-indexed loop; only strings that actually contain a
    // surrogate take the int-array path.
    var hasSurrogate = false
    var s = 0
    while (s < t.length && !hasSurrogate) {
      if (Character.isHighSurrogate(t.charAt(s))) hasSurrogate = true
      s += 1
    }
    val n: Int = {
      val len = if (!hasSurrogate) t.length
      else t.codePointCount(0, t.length)
      math.max(len - (k - 1), 1)
    }
    val h = new Array[Long](n)
    if (!hasSurrogate) {
      var i = 0
      while (i < n) {
        val g = t.substring(i, math.min(i + k, t.length))
        val d = digest.digest(g.getBytes(StandardCharsets.UTF_8))
        h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        i += 1
      }
    } else {
      val cps = t.codePoints().toArray
      var i = 0
      while (i < n) {
        val g = new String(cps, i, math.min(k, cps.length - i))
        val d = digest.digest(g.getBytes(StandardCharsets.UTF_8))
        h(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        i += 1
      }
    }
    val out = new Array[Long](n)
    var p = 0
    while (p < n) {
      var m = Long.MaxValue
      var j = p
      val end = math.min(p + w, n)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      out(p) = m
      p += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinima =
    copy(child = newChild)
}

/** Native one-pass MinHash signature of one document — bit-identical
  * to the relational pipeline `DedupOps.signaturesFromShingles(
  * shingleRows(docs))` (parity spec; the twin oracle is unchanged):
  * tokenize via `Tokenize.tokensScala` (the proven JVM twin of the
  * column tokenizer, CJK rules included) → word 3-gram shingles as a
  * bag with the whole-text fallback under 3 tokens → `xxhash64`
  * (Spark's XXH64, seed 42) per shingle → per-permutation minimum of
  * `mix64(h, golden·(2p+1))`.
  *
  * Why an Expression: the relational form explodes one row per TOKEN
  * through a window sort and re-aggregates through a doc_id shuffle —
  * two exchanges of gram-scale data for every signature build. This
  * loop touches each document once, narrow, and at production scale
  * runs shuffle-free on the scan's own partitioning. */
case class MinHashSig(child: Expression, perms: Int)
  extends UnaryExpression with CodegenFallback {

  require(perms >= 1, s"perms must be positive, got $perms")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val tokens = graft.functions.Tokenize
      .tokensScala(input.asInstanceOf[UTF8String].toString)
    val out = Array.fill(perms)(Long.MaxValue)
    def add(shingle: String): Unit = {
      val h = XXH64.hashUTF8String(UTF8String.fromString(shingle), 42L)
      var p = 0
      while (p < perms) {
        val m = Mix64Impl.fmix(h, Mix64Impl.golden * (2L * p + 1L))
        if (m < out(p)) out(p) = m
        p += 1
      }
    }
    if (tokens.length >= 3) {
      var i = 0
      while (i + 2 < tokens.length) {
        add(tokens(i) + " " + tokens(i + 1) + " " + tokens(i + 2))
        i += 1
      }
    } else add(tokens.mkString(" "))
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native distinct gram-hash set of one document, sorted ascending —
  * the set-equal twin of `collect_set(xxhash64(shingle))` over
  * `DedupOps.shingleRows` (whole-text fallback under `n` tokens
  * included; collect_set order is engine-nondeterministic, this array
  * is sorted, and every consumer — `array_intersect` Jaccard — is
  * order-insensitive). Same tokenizer/gram rules as `MinHashSig`; one
  * narrow pass, no explode, no shuffle. */
case class GramHashSet(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"gram size must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash_set"

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val tokens = graft.functions.Tokenize
      .tokensScala(input.asInstanceOf[UTF8String].toString)
    // primitive buffer + sort + in-place dedup: this runs once per
    // corpus document, and a boxed TreeSet would allocate a node per
    // gram for the same sorted-distinct result
    val nGrams = if (tokens.length >= n) tokens.length - n + 1 else 1
    val buf = new Array[Long](nGrams)
    def hash(gram: String): Long =
      XXH64.hashUTF8String(UTF8String.fromString(gram), 42L)
    if (tokens.length >= n) {
      var i = 0
      while (i + n - 1 < tokens.length) {
        buf(i) = hash(tokens.slice(i, i + n).mkString(" "))
        i += 1
      }
    } else buf(0) = hash(tokens.mkString(" "))
    java.util.Arrays.sort(buf)
    var w = 0
    var i = 0
    while (i < nGrams) {
      if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
      i += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(buf, w))
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashSet =
    copy(child = newChild)
}

/** Native one-pass SimHash fingerprint — bit-identical to the
  * relational `DedupOps.simhashTable` default (xxhash64 family,
  * 64 bits; parity spec): per token-BAG occurrence, ±1 per bit of
  * xxhash64(token); fingerprint bit j set when sum(j) > 0. A
  * zero-token document contributes one null-token row in the
  * relational form, whose hash is xxhash64(NULL) = the seed (42) —
  * reproduced here exactly. One narrow pass; the relational form
  * explodes a row per token and shuffles on doc_id. */
case class SimHashFp(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val tokens = graft.functions.Tokenize
      .tokensScala(input.asInstanceOf[UTF8String].toString)
    val sums = new Array[Int](64)
    def add(h: Long): Unit = {
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
    }
    if (tokens.isEmpty) add(42L) // xxhash64(NULL) = seed: the
    // explode_outer null-token row of the relational form
    else tokens.foreach(t =>
      add(XXH64.hashUTF8String(UTF8String.fromString(t), 42L)))
    var fp = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native, CODEGEN'd expression —
  * Spark ships no normalizer builtin, and mojibake-adjacent corpora
  * (decomposed accents from mixed OS pipelines, compatibility
  * singletons like U+2126 OHM SIGN) otherwise defeat exact dedup and
  * token statistics: "café" and "café" hash apart while reading
  * identically.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan
  * (almost all real text is already NFC — ASCII short-circuits), so
  * the common row costs one scan and ZERO allocation; only rows with
  * combining marks pay the normalize. `doGenCode` emits a direct
  * static call, keeping the surrounding projection in whole-stage
  * codegen (no fallback row boxing). Oracle twin: DuckDB's
  * `nfc_normalize` (utf8proc) — both implement UAX#15 NFC, asserted
  * equal on the fixture's decomposed/compatibility injections. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Jaro-Winkler similarity as a native, CODEGEN'd expression — Spark
  * ships levenshtein but no Jaro-Winkler, and entity-resolution
  * blocking wants both (JW favors shared prefixes, the
  * person/product-name case; edit distance favors global agreement).
  *
  * Semantics pinned to DuckDB's `jaro_winkler_similarity` (vendored
  * rapidfuzz), verified bit-exact over 3k random pairs before this
  * shipped: match window `max(l1,l2)/2 - 1` (floor, min 0),
  * transpositions = mismatched matched positions halved by INTEGER
  * division (the convention that differs across libraries — jellyfish
  * halves as a float), jaro = (m/l1 + m/l2 + (m-t)/m)/3, Winkler
  * boost `j + l·0.1·(1-j)` for common prefix l ≤ 4 only when
  * j > 0.7. Operates on UTF-16 code units; the oracled fixture is
  * ASCII, where units = code points = DuckDB's bytes. `doGenCode`
  * emits a static call so the surrounding projection stays in
  * whole-stage codegen. */
case class JaroWinkler(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.jw(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.JaroWinkler.jw($l.toString(), $r.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def jw(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 && l2 == 0) return 1.0
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // INTEGER halving — the DuckDB/rapidfuzz convention; formula term
    // order mirrored so the doubles match bit-for-bit
    val tt = (t / 2).toDouble
    val jaro = (m / l1 + m / l2 + (m - tt) / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (l < pmax && s1.charAt(l) == s2.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

object TextExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column form of the winnow-minima kernel. */
  def winnow_minima(text: Column, k: Int = 8, w: Int = 8): Column =
    Bridge.column(WinnowMinima(Bridge.expression(text), k, w))

  /** Column form of the one-pass MinHash signature. */
  def minhash_sig(text: Column, perms: Int = 64): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), perms))

  /** Column form of the sorted distinct gram-hash set. */
  def gram_hash_set(text: Column, n: Int = 3): Column =
    Bridge.column(GramHashSet(Bridge.expression(text), n))

  /** Column form of the one-pass SimHash fingerprint. */
  def simhash_fp(text: Column): Column =
    Bridge.column(SimHashFp(Bridge.expression(text)))

  /** Column form of Unicode NFC normalization. */
  def nfc_normalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  /** Column form of Jaro-Winkler similarity. */
  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
