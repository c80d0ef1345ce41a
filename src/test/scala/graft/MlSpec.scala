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
}
