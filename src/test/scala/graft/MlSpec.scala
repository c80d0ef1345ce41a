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
}
