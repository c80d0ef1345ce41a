package graft

import graft.operators.ml.NaiveBayes

/** Naive Bayes semantics: hand-computed smoothed log-probs and
  * clean-separation prediction. */
class MlSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = Seq(
    (1L, "x x y", "A"),
    (2L, "z z y", "B")
  ).toDF("doc_id", "text", "lang")

  test("nb model: add-one micro-log-probs match hand arithmetic") {
    val m = NaiveBayes.trainLangModel(docs)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // V = 3, tok_A = 3: logp(x|A) = ln((2+1)/(3+3)) = ln(0.5)
    assert(m(("A", "x")) == ((2L, math.rint(math.log(0.5) * 1e6).toLong)))
    // logp(y|A) = ln(2/6)
    assert(m(("A", "y")) == ((1L, math.rint(math.log(2.0 / 6) * 1e6).toLong)))
    assert(m.keySet == Set(("A", "x"), ("A", "y"), ("B", "z"), ("B", "y")),
      "unseen (class, token) pairs are NOT model rows — they fall to " +
        "the class default at scoring time")
  }

  test("nb predict: clean separation recovers classes; scores exact") {
    val p = NaiveBayes.predictLang(docs)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(p(1L)._1 == "A" && p(2L)._1 == "B")
    // score(doc1, A) = prior ln(1/2) + 2·logp(x|A) + logp(y|A), all
    // rounded to micros BEFORE summation (the order-free contract)
    def mic(v: Double) = math.rint(v * 1e6).toLong
    val expected = mic(math.log(0.5)) + 2 * mic(math.log(0.5)) +
      mic(math.log(2.0 / 6))
    assert(p(1L)._2 == expected, s"got ${p(1L)._2}, want $expected")
  }

  test("item cf: cosine on planted baskets; minCo and basket cap prune") {
    import graft.operators.ml.ItemCf
    import org.apache.spark.sql.functions._
    // cust 1,2 buy {A,B}; cust 3 buys {A,C}; cust 4 is a mega-basket
    // over the cap and must not contribute to any count
    val mega = (1000L until 1030L).map(p => (4L, 4L, p))
    val rows = Seq(
      (1L, 1L, 100L), (1L, 1L, 101L),  // order 1: A,B (dup line below)
      (1L, 1L, 100L),                  // duplicate line: distinct() folds
      (2L, 2L, 100L), (2L, 2L, 101L),
      (3L, 3L, 100L), (3L, 3L, 102L)
    ) ++ mega
    val li = rows.map { case (o, _, p) => (o, p) }.toDF("l_orderkey", "l_partkey")
    val ord = rows.map { case (o, c, _) => (o, c) }.distinct
      .toDF("o_orderkey", "o_custkey")
    val out = ItemCf.itemCosine(li, ord, topN = 10, minCo = 2,
        maxBasket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // co(A,B)=2 ≥ minCo; co(A,C)=1 pruned; cust 4's 30 parts capped out
    // ct: A=3, B=2 → cos = 2/√6 = 816497 micros
    assert(out.keySet == Set((100L, 101L), (101L, 100L)), out.keySet)
    assert(out((100L, 101L)) == ((2L, 3L, 2L, 816497L, 1L)))
    assert(out((101L, 100L)) == ((2L, 2L, 3L, 816497L, 1L)))
    // with minCo=1 the A-C edge appears: 1/√3 = 577350 micros
    val loose = ItemCf.itemCosine(li, ord, topN = 10, minCo = 1,
        maxBasket = 16)
      .filter(col("part_a") === 100L)
      .collect().map(r => (r.getLong(1), r.getLong(5), r.getLong(6)))
    assert(loose.toSet == Set((101L, 816497L, 1L), (102L, 577350L, 2L)),
      loose.toSeq.toString)

    // association rules on the same universe: n=3 capped customers;
    // supp(A,B)=2/3, conf(A→B)=2/3, conf(B→A)=1, lift=2·3/(3·2)=1
    val rules = ItemCf.assocRules(li, ord, minCo = 2, maxBasket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(rules.keySet == Set((100L, 101L), (101L, 100L)))
    assert(rules((100L, 101L)) == ((666667L, 666667L, 1000000L)),
      rules((100L, 101L)).toString)
    assert(rules((101L, 100L)) == ((666667L, 1000000L, 1000000L)),
      rules((101L, 100L)).toString)
  }

  test("eval confusion: matrix matches an independent recount; clean " +
      "separation is diagonal with unit micro P/R/F1") {
    import graft.operators.ml.Evaluation
    val corpus = Seq(
      (1L, "x x y", "A"), (2L, "x y y", "A"),
      (3L, "z z w", "B"), (4L, "z w w", "B")
    ).toDF("doc_id", "text", "lang")
    val out = Evaluation.nbConfusion(corpus)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // independent recount from the argmax itself
    val pred = NaiveBayes.predictLang(corpus)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    val truth = Map(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B")
    for (c <- Seq("A", "B")) {
      val tp = truth.count { case (d, t) => t == c && pred(d) == c }
      val fn = truth.count { case (d, t) => t == c && pred(d) != c }
      val fp = truth.count { case (d, t) => t != c && pred(d) == c }
      assert(out(c)._1 == tp && out(c)._2 == fp && out(c)._3 == fn,
        s"$c: ${out(c)}")
    }
    // the corpus separates cleanly, so the matrix is diagonal
    assert(out("A") == ((2L, 0L, 0L, 2L, 1000000L, 1000000L, 1000000L)))
    assert(out("B") == ((2L, 0L, 0L, 2L, 1000000L, 1000000L, 1000000L)))
  }

  test("eval auc: U2 matches brute-force pair counting; separation " +
      "gives exactly 1e6 micros") {
    import graft.operators.ml.Evaluation
    val corpus = Seq(
      (1L, "x x y", "en"), (2L, "x y y", "en"),
      (3L, "z z w", "de"), (4L, "z w w", "fr")
    ).toDF("doc_id", "text", "lang")
    val row = Evaluation.nbAuc(corpus, posClass = "en").head()
    val (p, n, u2, auc) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    assert(p == 2 && n == 2)
    // brute-force: every (pos, neg) score pair, 2 credits per win,
    // 1 per tie — recomputed from the scoring frame itself
    val sc = NaiveBayes.scoreClass(corpus, "en")
      .as[(Long, Long)].collect().toMap
    val truth = Map(1L -> true, 2L -> true, 3L -> false, 4L -> false)
    val expU2 = (for {
      (dp, tp) <- truth if tp; (dn, tn) <- truth if !tn
    } yield {
      if (sc(dp) > sc(dn)) 2L else if (sc(dp) == sc(dn)) 1L else 0L
    }).sum
    assert(u2 == expU2, s"u2=$u2 brute=$expU2")
    // the en-docs share tokens only with each other -> full separation
    assert(auc == 1000000L, s"auc_micro=$auc")
  }

  test("cf hit-rate: planted temporal split — unseen neighbor of the " +
      "train basket hits the test basket; no-rec and no-test users " +
      "handled") {
    import graft.operators.ml.ItemCf
    // train (pre-pivot): c1 {A,B}, c2 {A,B} -> sim(A,B) co=2;
    // c3 {A} -> its one unseen neighbor is B
    // test (post-pivot): c3 buys B (hit), c1 buys C (but c1 has no
    // unseen neighbors -> 0 recs), c2 has no test activity -> excluded
    val orders = Seq(
      (10L, 1L, "1999-01-01"), (11L, 2L, "1999-01-02"),
      (12L, 3L, "1999-01-03"),
      (20L, 3L, "2000-01-01"), (21L, 1L, "2000-01-02")
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (10L, 100L), (10L, 101L), (11L, 100L), (11L, 101L), (12L, 100L),
      (20L, 101L), (21L, 102L)
    ).toDF("l_orderkey", "l_partkey")
    val row = ItemCf.evalHitRate(li, orders).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == ((2L, 1L, 1L, 1000000L)), row.toString)
  }
}
