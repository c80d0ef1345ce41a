package graft.operators.llm

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A real byte-pair-encoding tokenizer (Sennrich et al. 2016), not the
  * BPE-ish regex approximation in `TextAnalysis.tokenCounts`: merges
  * are LEARNED from the corpus word-frequency table and applied
  * GPT-2-style (lowest-rank adjacent pair first) at encode time.
  *
  * Scale posture — the standard production split:
  *  - TRAIN touches the corpus once (word hash-aggregate), then runs
  *    the merge loop on the driver over the top-`vocabWords` word
  *    frequency table only. Driver state is O(vocabWords) short
  *    strings — deliberately bounded, exactly how sentencepiece/HF
  *    train on a frequency table rather than raw text. At 100 TB the
  *    word-count aggregate is the only distributed stage and it is a
  *    map-side-combining hash aggregate on a Zipf distribution.
  *  - ENCODE broadcasts the merge ranks (~200 entries) and streams
  *    every document through one `mapPartitions` with a per-partition
  *    word→tokens memo: Zipf word re-use makes the memo hit rate high
  *    enough that the merge loop runs roughly once per DISTINCT word
  *    per partition, not once per occurrence.
  *
  * Everything is deterministic: top-K selection orders by
  * (count DESC, word ASC), merge ties break on the lexicographically
  * smallest pair, and encode replays ranks — asserted bit-for-bit
  * against an INDEPENDENT pure-Python implementation
  * (`tools/gen_bpe_fixture.py`) via the committed fixture oracle.
  */
object Bpe {

  final val EndOfWord = "</w>"

  /** One learned merge: the adjacent symbol pair and its rank. */
  final case class Merge(a: String, b: String, rank: Int)

  private def splitWords(text: String): Array[String] =
    if (text == null) Array.empty
    else org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .toLowerCase.toString.split("\\s+").filter(_.nonEmpty)

  /** Corpus word-frequency table (the training input). */
  def wordCounts(documents: DataFrame): DataFrame =
    documents.select(explode(graft.functions.Tokenize
        .wsTokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges from the `vocabWords` most frequent
    * words. Classic Sennrich training: words as char sequences +
    * `</w>`, repeatedly merge the most frequent adjacent pair
    * (frequency-weighted), stop early when no pair repeats. */
  def train(documents: DataFrame, numMerges: Int = 200,
            vocabWords: Int = 2000): Seq[Merge] = {
    val top = wordCounts(documents)
      .orderBy(col("freq").desc, col("word"))
      .limit(vocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] = top.map { case (w, f) =>
      ((w.map(_.toString) :+ EndOfWord).toArray, f)
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        // max count, ties to the lexicographically smallest pair —
        // the total order the Python twin replays
        val ((a, b), best) = pairCounts.minBy { case ((x, y), c) =>
          (-c, x, y)
        }
        if (best < 2) continue = false // a pair seen once teaches nothing
        else {
          merges += Merge(a, b, rank)
          words = words.map { case (syms, f) => (mergePair(syms, a, b), f) }
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  /** Non-overlapping left-to-right replacement of (a,b) with a+b. */
  private def mergePair(syms: Array[String], a: String,
                        b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** GPT-2-style encode of one word: repeatedly merge the
    * lowest-ranked adjacent pair until none has a rank. */
  private[graft] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = (word.map(_.toString) :+ EndOfWord).toArray
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = mergePair(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Encode every document with the learned merges. Emits the total
    * BPE token count plus the md5 of the space-joined token sequence —
    * a full-sequence equality witness the fixture oracle compares
    * bit-for-bit. */
  def encode(documents: DataFrame, merges: Seq[Merge]): DataFrame =
    encodeProject(documents, merges).orderBy("doc_id")

  /** Sort-free encode — stateless, so the SAME mapPartitions runs
    * under a streaming plan against a batch-trained merges table (the
    * production split: train offline, encode the ingest stream;
    * parity pinned in `StreamingParitySpec`). */
  private[graft] def encodeProject(documents: DataFrame,
                                   merges: Seq[Merge]): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.a, m.b) -> m.rank).toMap
    val bcast = spark.sparkContext.broadcast(ranks)
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = bcast.value
        val memo = mutable.HashMap.empty[String, Array[String]]
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, text) =>
          val toks = splitWords(text).iterator.flatMap { w =>
            memo.getOrElseUpdate(w, encodeWord(w, rk))
          }.toArray
          md.reset()
          val hex = md.digest(toks.mkString(" ")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            .map("%02x".format(_)).mkString
          (docId, toks.length, hex)
        }
      }
      .toDF("doc_id", "bpe_token_ct", "tokens_md5")
  }

  /** The driver-contract composition: train on the directory's corpus,
    * encode the same corpus. */
  def tokenize(documents: DataFrame, numMerges: Int = 200,
               vocabWords: Int = 2000): DataFrame =
    encode(documents, train(documents, numMerges, vocabWords))
}
