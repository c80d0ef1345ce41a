package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.llm.FuzzyJoin

/** Measures the fuzzy join's lossless-blocking claim at a vocabulary
  * two orders of magnitude past the fixture: a synthetic ~5k-name
  * vocabulary (composed tokens + planted edit-distance-1 variants),
  * blocked candidates + verify vs the O(n²) levenshtein cross join.
  * Results are required IDENTICAL — blocking must lose nothing —
  * while the candidate count shows what the bigram join avoided.
  *
  * usage: runMain graft.tools.FuzzySoak [names]
  */
object FuzzySoak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = graft.core.Sessions.local("32")
    import spark.implicits._
    val adj = Seq("small", "large", "red", "blue", "hot", "cold", "dim",
      "pale", "dark", "light")
    val noun = Seq("widget", "gadget", "bolt", "gear", "gizmo", "ring",
      "valve", "crank", "lever", "spring")
    val names = (0 until n).map { i =>
      val base = s"${adj(i % 10)} ${noun((i / 10) % 10)} v${i / 100}"
      // every 7th name is a planted distance-1 variant of its base
      if (i % 7 == 3) base.dropRight(1) + "x" else base
    }.distinct
    val vals = names.toDF("v")
    println(s"[soak] vocabulary=${names.size} distinct names")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val blocked = FuzzyJoin.nearMatchPairs(vals, "v", maxDist = 2).cache()
    val nBlocked = time("blocked + verify")(blocked.count())
    val brute = {
      val d = vals.select(col("v").as("name")).distinct()
      d.as("a").join(d.as("b"), col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 2)
        .select(col("name_a"), col("name_b"),
          col("dist").cast("int").as("dist")).cache()
    }
    val nBrute = time("O(n^2) levenshtein")(brute.count())
    require(blocked.exceptAll(brute).isEmpty &&
      brute.exceptAll(blocked).isEmpty,
      s"blocking lost pairs: blocked=$nBlocked brute=$nBrute")
    println(s"[soak] DONE pairs=$nBrute — blocking is lossless at " +
      s"${names.size} names (${names.size.toLong * (names.size - 1) / 2} " +
      "possible pairs)")
    spark.stop()
  }
}
