package graft
object Bench {
  /** Release ALL executor-side state a query may have left behind —
    * cached tables plus persisted/localCheckpointed RDD blocks. Without
    * this, one query's leaked cache distorts every later timing (and
    * min-of-two lets run 2 reuse run 1's blocks): round-1 numbers were
    * off 3–9× from clean-session runs because of exactly this. */
  private def clearState(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Sessions.local(cpus)
    // Warm up JIT/codegen/classloading on a tiny slice so the first
    // timed query isn't charged ~5 s of one-time session cost. entry()
    // reads its own fixed sf dir, which may not exist on this box — a
    // missing warm-up must not abort the bench itself.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up skipped: ${e.getMessage}") }
    clearState(spark)
    // "noop" sink materializes every column (a bare count() would let
    // Catalyst prune the plan down to a metadata-only scan).
    // Min of two timed runs per query: single-shot timings on this box
    // swing ±40% (JIT, page cache, CPU contention); the min is the
    // steady-state throughput the plan actually delivers. EVERY run
    // starts from cleared Spark state (no cached tables, no persisted
    // blocks), so the min reflects the plan, not a leaked cache; only
    // JIT warm-up and the OS page cache carry across runs — that policy
    // is recorded in the emitted JSON.
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .map(v => v.trim.toIntOption.filter(_ >= 1).getOrElse(
        sys.error(s"SPARK_GRAFT_BENCH_RUNS must be a positive int, got '$v'")))
      .getOrElse(2)
    // SPARK_GRAFT_BENCH_ONLY=name1,name2 (or prefixes) scopes a probe
    // run to a query subset under the SAME measurement policy as the
    // full artifact — the one timing loop, not a hand-rolled copy.
    // Scoped runs warm each selected query once first (the full bench
    // amortizes JIT warm-up across 100 queries; a short list would
    // otherwise charge it to the first timings).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case None => SparkEntry.queries.toSeq
      case Some(pats) =>
        val sel = SparkEntry.queries.toSeq.filter { case (name, _) =>
          pats.exists(name.startsWith) }
        require(sel.nonEmpty, s"SPARK_GRAFT_BENCH_ONLY matched no query: $only")
        sel.foreach { case (name, fn) =>
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
          catch { case e: Throwable =>
            System.err.println(s"[bench] warm $name failed: ${e.getMessage}") }
          clearState(spark)
        }
        sel
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        clearState(spark)
        // -1 sentinel: a failed query must not masquerade as a fast one
        if (ok) dt else -1.0
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (sentinel -1) are excluded from the total — summing
    // them in would make a round WITH failures report a better total
    val ok = results.map(_._2).filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val failed = results.count(_._2 < 0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"policy":"min_of_${runs}_runs_each_from_cleared_spark_state_jit_and_page_cache_warm","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // The stdout line can be truncated by log-capture harnesses (round
    // 2 lost 40 of 96 per-query numbers that way) — always persist the
    // complete JSON to a file too, so the round's numbers survive.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    spark.stop()
  }
}
