package graft
object Bench {
  /** Per-query values from a previous bench artifact (the committed
    * `BENCH_FULL.json` in the repo checkout) — the reference the
    * self-validation pass compares against. The artifact is one flat
    * JSON object whose `"queries"` member holds only `"name":number`
    * pairs (no nesting), so a scoped regex parse is exact. Absent or
    * unparseable file → empty map → no reprobing (first run ever). */
  private def priorQueries(path: String): Map[String, Double] =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val start = text.indexOf("\"queries\":{")
      if (start < 0) Map.empty
      else {
        val body = text.substring(start + "\"queries\":{".length,
          text.indexOf('}', start))
        """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter(_._2 >= 0) // -1 failure sentinels are not baselines
          .toMap
      }
    } catch { case _: Throwable => Map.empty }

  private def parsePairs(body: String): Map[String, Double] =
    """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter(_._2 >= 0)
      .toMap

  /** Floors file: per-query historical minima keyed by SF dir —
    * `{"comment":…,"sfs":{"<sfDir>":{"q":min,…},…}}`. Keyed so that
    * alternating SFs can't destroy each other's floor history (a
    * single-SF file was overwritten wholesale whenever the bench ran
    * at a different SF, re-introducing the anchor-reset drift floors
    * exist to prevent). The legacy single-SF format
    * (`{"sf":…,"queries":{…}}`) is still read and migrated into the
    * map on the next write. */
  private def readFloorsFile(path: String): Map[String, Map[String, Double]] =
    try {
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val sfsAt = text.indexOf("\"sfs\":{")
      if (sfsAt >= 0) {
        """"([^"]+)":\{([^}]*)\}""".r
          .findAllMatchIn(text.substring(sfsAt + "\"sfs\":{".length))
          .map(m => m.group(1) -> parsePairs(m.group(2)))
          .toMap
      } else {
        val sf = """"sf":"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1))
        val start = text.indexOf("\"queries\":{")
        if (sf.isEmpty || start < 0) Map.empty
        else Map(sf.get -> parsePairs(text.substring(
          start + "\"queries\":{".length, text.indexOf('}', start))))
      }
    } catch { case _: Throwable => Map.empty }

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
    def timeQuery(name: String,
                  fn: (org.apache.spark.sql.SparkSession, String) =>
                    org.apache.spark.sql.DataFrame): Double = {
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
      if (times.exists(_ < 0)) -1.0 else times.min
    }
    val firstPass = selected.map { case (name, fn) => name -> timeQuery(name, fn) }
    // Self-validation against box noise: three rounds running, timings
    // taken while the box was contended inflated a handful of queries
    // 2.5-17.6x over their steady-state value, and a human had to
    // re-probe them by hand to adjudicate the artifact. Automate that
    // exact procedure: any query whose min exceeds its value in the
    // PREVIOUS committed artifact by >2x (and by >0.3 s absolute — a
    // 0.05 s query doubling is scheduler jitter, not contention) is
    // re-timed in the same process from cleared state after the load
    // that inflated it has moved on, and the min of all observed runs
    // is kept. The reprobed set + both values are recorded in the JSON
    // so a regression can never silently hide behind the reprobe: a
    // REAL slowdown reproduces in the reprobe and still surfaces.
    // Scoped probe runs write BENCH_PROBE.json by default: a probe
    // overwriting the committed full artifact has twice now destroyed
    // the reprobe baselines of every other query (and once got a
    // 2-query artifact committed as if it were the round's bench).
    val defaultOut =
      if (only.isDefined) "BENCH_PROBE.json" else "BENCH_FULL.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    val baselinePath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE", "BENCH_FULL.json")
    // The reprobe baseline is the per-query MIN of the last committed
    // artifact AND the historical floor file. Baselining on the prior
    // artifact alone let sub-2x drift compound invisibly across
    // refreshes (each refresh resets the anchor: 1.7x into one window
    // then 1.4x into the next — 2.4x total, never reprobed); the
    // floor file is the per-query min over every run at this SF, so
    // the trigger always measures against steady state. Floors are
    // SF-keyed — a floor measured at another SF is no baseline at all.
    val floorsPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FLOORS", "BENCH_FLOORS.json")
    val allFloors = readFloorsFile(floorsPath)
    val floors = allFloors.getOrElse(sfDir, Map.empty[String, Double])
    val prior = (priorQueries(baselinePath).toSeq ++ floors.toSeq)
      .groupMapReduce(_._1)(_._2)(math.min)
    val byName = selected.toMap
    val reprobes = firstPass.flatMap { case (name, v) =>
      prior.get(name) match {
        case Some(p) if v > 2 * p && v - p > 0.3 =>
          System.err.println(
            f"[bench] $name%s: $v%.2f s vs prior $p%.2f s (>2x) — reprobing")
          val again = timeQuery(name, byName(name))
          if (again >= 0) Some(name -> (p, v, math.min(v, again))) else None
        case _ => None
      }
    }.toMap
    val results = firstPass.map { case (name, v) =>
      name -> reprobes.get(name).map(_._3).getOrElse(v) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val reprobedJson = reprobes.toSeq.sortBy(_._1).map {
      case (k, (p, first, fin)) =>
        s"\"" + k + s"\":{\"prior\":$p,\"first\":$first,\"final\":$fin}"
    }.mkString("{", ",", "}")
    // failed queries (sentinel -1) are excluded from the total — summing
    // them in would make a round WITH failures report a better total
    val ok = results.map(_._2).filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val failed = results.count(_._2 < 0)
    // sub-query phase walls (per-phase min across all runs this
    // process made) — the smalldelta seed/delta decomposition rides
    // here so the O(delta) commit cost is visible round-over-round
    val walls = graft.core.Walls.snapshot.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"policy":"min_of_${runs}_runs_each_from_cleared_spark_state_jit_and_page_cache_warm_reprobe_over_2x_min_of_prior_and_floors","reprobed":$reprobedJson,"queries":$qs,"walls":$walls,"sf":"$sfDir"}"""
    println(json)
    // The stdout line can be truncated by log-capture harnesses (round
    // 2 lost 40 of 96 per-query numbers that way) — always persist the
    // complete JSON to a file too, so the round's numbers survive.
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // roll this run's minima into the floor file (this SF's section
    // only): the next run's reprobe trigger anchors on the historical
    // per-query min, so drift can't compound by re-anchoring on a
    // drifted run. Roll-in is OUTLIER-GUARDED: floors are monotone
    // decreasing and permanent, so one anomalously fast sample (a
    // truncated table, a query that short-circuited) must not poison
    // the anchor forever — a new min below 1/3 of the current floor
    // (and by >0.3 s absolute) is clamped to current/3. A genuine 3x+
    // speedup still converges: each subsequent real run walks the
    // floor down another 3x until it matches.
    val guarded = results.filter(_._2 >= 0).map { case (k, v) =>
      floors.get(k) match {
        case Some(c) if v < c / 3 && c - v > 0.3 =>
          System.err.println(
            f"[bench] $k%s floor roll-in clamped: $v%.2f s < 1/3 of " +
              f"current floor $c%.2f s — recording ${c / 3}%.2f s " +
              "(single-sample outlier guard)")
          k -> c / 3
        case Some(c) => k -> math.min(c, v)
        case None => k -> v
      }
    }
    val newFloors = (floors.toSeq ++ guarded).groupMapReduce(_._1)(_._2)(math.min)
    val outSfs = allFloors + (sfDir -> newFloors)
    val floorsJson = s"""{"comment":"per-query historical min keyed by SF dir — the bench reprobe baseline; maintained by Bench itself (outlier-clamped roll-in)","sfs":${
      outSfs.toSeq.sortBy(_._1).map { case (sf, qs) =>
        s"\"" + sf + "\":" + qs.toSeq.sortBy(_._1)
          .map { case (k, v) => s"\"" + k + "\":" + v }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")}}"""
    try java.nio.file.Files.write(java.nio.file.Paths.get(floorsPath),
      (floorsJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(
        s"[bench] could not write $floorsPath: ${e.getMessage}") }
    spark.stop()
  }
}
