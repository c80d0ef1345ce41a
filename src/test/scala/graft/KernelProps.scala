package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.llm.Components
import graft.operators.state.Dedup
import graft.operators.skew.Salting
import graft.sinks.Sinks

/** Property-based laws of the dedup/upsert/salting kernels against a
  * plain-Scala model (generated inputs, ScalaCheck). */
object KernelProps extends Properties("kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 50L),
      Gen.choose(0L, 1000L)))

  property("firstWins == model groupBy-min under a total order") =
    forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "ord", "payload")
        val got = Dedup.firstWins(df, Seq("k"),
            Seq(col("ord"), col("payload")))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = rows.groupBy(_._1).values.map(_.minBy(t => (t._2, t._3))).toSet
        got == want
      }
    }

  property("lastWins == firstWins with reversed order") =
    forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "ord", "payload")
        val lw = Dedup.lastWins(df, Seq("k"),
            Seq(col("ord").desc, col("payload").desc))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val want = rows.groupBy(_._1).values.map(_.maxBy(t => (t._2, t._3))).toSet
        lw == want
      }
    }

  property("saltedJoin is bag-equal to the plain join") =
    forAll(rowsGen, rowsGen) { (l, r) =>
      (l.isEmpty || r.isEmpty) || {
        val lf = l.toDF("k", "ord", "payload")
        val rf = r.map(t => (t._1, t._2)).toDF("k", "v")
        val plain = lf.join(rf, "k").collect()
          .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        val salted = Salting.saltedJoin(lf, rf, "k", 4)
          .select("k", "ord", "payload", "v").collect()
          .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
        plain == salted
      }
    }

  private val textGen: Gen[List[String]] =
    Gen.listOfN(8, Gen.listOf(Gen.oneOf(
      Gen.oneOf(" ", "\t", "\n"),
      Gen.alphaNumStr.map(_.take(5)),
      Gen.oneOf("!", "?", "日本", "a1b", "...")))
      .map(_.mkString))

  property("regexp_count token counts == materialized-array counts") =
    forAll(textGen) { texts =>
      texts.isEmpty || {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = df.select(col("doc_id"),
            regexp_count(col("text"), lit("\\S+")).cast("long").as("ws"),
            regexp_count(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("bpe"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // ws_tokens is DEFINED as whitespace token count (the \S+ runs);
        // Tokenize.tokens additionally bigram-splits Han runs, so the
        // equivalent materialized form is wsTokens, not tokens
        val want = df.select(col("doc_id"),
            size(graft.functions.Tokenize.wsTokens(col("text"))).cast("long").as("ws"),
            size(regexp_extract_all(lower(col("text")),
              lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("bpe"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        got == want
      }
    }

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(18, Gen.zip(Gen.choose(0L, 40L), Gen.choose(0L, 40L)))

  property("connectedComponents == driver-side union-find on random graphs") =
    forAll(edgesGen) { es =>
      val edges = es.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val got = Components.connectedComponents(edges.toDF("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
        def find(x: Long): Long = {
          var r = x; while (parent(r) != r) r = parent(r); r
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val minOf = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
        got == nodes.map(n => n -> minOf(find(n))).toMap
      }
    }

  property("splitAssign never splits a component, on random graphs") =
    forAll(edgesGen) { es =>
      val edges = es.filter { case (a, b) => a != b }
      edges.isEmpty || {
        val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
        val docs = nodes.map(n => (n, s"doc $n text")).toDF("doc_id", "text")
        val out = graft.operators.llm.Sampling
          .splitAssign(docs, edges.toDF("doc_a", "doc_b"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        // exactly one row per node, one split per component, and the
        // split is a pure function of the component id
        out.length == nodes.length &&
          out.groupBy(_._2).values.forall(_.map(_._3).distinct.length == 1)
      }
    }

  property("upsert sequential batches == last-wins over the union") =
    forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val (b1, b2) = rows.splitAt(rows.length / 2)
        val d1 = b1.toDF("k", "ver", "payload")
        val d2 = b2.toDF("k", "ver", "payload")
        val stepwise = Sinks.upsert(d2,
            Some(Sinks.upsert(d1, None, "k", "ver")), "k", "ver")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // model: per key, keep max ver (ties: batch2's survivor may differ
        // from a global tie-break — compare version only)
        val want = rows.groupBy(_._1).view
          .mapValues(_.map(_._2).max).toMap
        stepwise == want
      }
    }

  // Unicode corpus mixing ASCII, BMP CJK, and supplementary-plane
  // characters (emoji, CJK ext-B) — the surrogate-pair cases where
  // UTF-16 code-unit indexing would diverge from Spark's code-point
  // substring semantics.
  private val uniTextGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      1 -> Gen.const(" "),
      2 -> Gen.oneOf("\u4e00", "\u597d", "\u00e9"),
      2 -> Gen.oneOf("\ud83d\ude00", "\ud83c\udf55", "\ud840\udc00")))
      .map(_.mkString)

  property("native dedup kernels == relational pipelines on arbitrary unicode") =
    forAll(Gen.listOfN(6, uniTextGen)) { texts =>
      import graft.operators.llm.DedupOps
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def sigMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val sigOk =
        sigMap(DedupOps.signaturesNative(docs)) == sigMap(DedupOps.signatures(docs))
      val natG = DedupOps.gramSetsNative(docs).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val relG = DedupOps.shingleRows(docs)
        .groupBy(col("doc_id"))
        .agg(collect_set(xxhash64(col("shingle"))).as("grams"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      def fpMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fpOk =
        fpMap(DedupOps.simhashTableNative(docs)) == fpMap(DedupOps.simhashTable(docs))
      sigOk && natG == relG && fpOk
    }

  // small line pool so cross-document repeats arise naturally
  private val lineDocsGen: Gen[List[String]] =
    Gen.listOfN(6, Gen.nonEmptyListOf(Gen.oneOf(
      "alpha beta", "copy footer", "gamma", "delta x", "epsilon", "zeta q"))
      .map(_.take(5).mkString("\n")))

  property("lineDedup == scala model (corpus counts, order, emptied docs)") =
    forAll(lineDocsGen) { docs =>
      import graft.operators.llm.TextAnalysis
      docs.isEmpty || {
        val df = docs.zipWithIndex
          .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        val counts = docs.flatMap(_.split("\n", -1))
          .groupBy(identity).view.mapValues(_.size).toMap
        val want = docs.zipWithIndex.map { case (t, i) =>
          val ls = t.split("\n", -1).toSeq
          val kept = ls.filter(l => counts(l) < 2)
          (i.toLong, kept.mkString("\n"),
            ls.size.toLong, (ls.size - kept.size).toLong)
        }.toSet
        val got = TextAnalysis.lineDedup(df, 2).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
          .toSet
        got == want
      }
    }

  property("native winnow == relational twin on arbitrary unicode") =
    forAll(Gen.listOfN(8, uniTextGen)) { texts =>
      import graft.operators.llm.TextAnalysis
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3))).toSet
      rows(TextAnalysis.winnowFingerprints(docs)) ==
        rows(TextAnalysis.winnowFingerprintsRelational(docs))
    }
}
