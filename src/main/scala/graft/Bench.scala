package graft

object Bench {

  /** Median of an unsorted timing vector (lower-middle for even n —
    * deterministic and pessimism-free for n=2).
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  private def fmt(v: Double) =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)

  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Per-query median-of-N benchmark. One timing per query is
    * meaningless on a shared box with ~2x noise (the r2 lesson: three
    * apparent regressions were undecidable against noise); N >= 3
    * iterations with per-query medians separate plan changes from box
    * jitter. Failures are printed (stderr) and reported as -1 — a
    * broken query must never look like a fast one.
    *
    * The record is self-defending (the r5 lesson — four rounds of
    * `parsed: null` because the driver's tail window truncated one
    * ~6 KB JSON line, and a contended box recorded 44.6 s for a 2.6 s
    * query with nothing in the artifact revealing either):
    *  - the FULL record — per-query medians, spreads, and every raw
    *    per-pass timing, plus system load average before/after — is
    *    written to BENCH_FULL.json, which no capture window can cut;
    *  - stdout gets ONE compact line (< 1 KB: total, iters, loads,
    *    worst-5 medians, pointer to the full file) printed last, so
    *    the driver's tail always parses it;
    *  - load_before/load_after expose contention: on a 32-CPU box a
    *    load far above the bench's own parallelism means the pass was
    *    contended and its absolute numbers are suspect;
    *  - "contaminated":true is stamped into BOTH records when the
    *    pre-run load average exceeds SPARK_GRAFT_BENCH_MAX_LOAD
    *    (default 3.0) — the r7 lesson: the official round record was
    *    captured at load 5.76 and 19 queries showed spread > median,
    *    with nothing machine-readable marking the record as noise. A
    *    contaminated record still runs (the data is better than
    *    nothing) but self-identifies so no reader mistakes it for a
    *    clean baseline.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // per-cpus default filename: the driver's low-cpu scaling sweep
    // previously clobbered the main run's full record (r19: the 32-cpu
    // per-query record survived only in builder-side captures)
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      s"BENCH_FULL_c$cpus.json")
    val loadBefore = loadAvg()
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "3.0").toDouble
    val contaminated = loadBefore > maxLoad
    if (contaminated)
      System.err.println(s"BENCH WARNING: pre-run load average " +
        s"$loadBefore exceeds $maxLoad — the box is contended; this " +
        s"record will be stamped \"contaminated\":true")
    val spark = GraftSession.local(cpus)
    // warm the session (JIT, codegen cache, file index) outside timing
    spark.range(1000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_BENCH_ONLY=q281,q282 limits the run to queries with
    // those name prefixes — the scale-slope probe's harness (same
    // timing discipline as the full suite, subset of queries)
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(list) =>
        val wanted = list.split(",").map(_.trim).filter(_.nonEmpty)
        allNames.filter(n => wanted.exists(n.startsWith))
      case None => allNames
    }
    // iterate suite-major (all queries per pass, not all passes per
    // query): consecutive same-query runs would share a warm page
    // cache / JIT profile that the driver's single-pass run never has
    val timings = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (pass <- 1 to iters; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"BENCH FAILURE pass=$pass query=$name: " +
              s"${e.getClass.getName}: ${e.getMessage}")
            false
        } finally spark.catalog.clearCache() // operator caches are per-call
      val sec = (System.nanoTime() - t0) / 1e9
      timings(name) = timings(name) :+ (if (ok) sec else -1.0)
    }
    val loadAfter = loadAvg()
    val medians = names.map { n =>
      val ts = timings(n)
      n -> (if (ts.contains(-1.0)) -1.0 else median(ts))
    }
    val total = medians.map(_._2).filter(_ >= 0).sum
    // ---- full record: everything, to a file no tail window can cut
    val qs = medians.map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", "}")
    // spread = max - min across passes: the noise bound a reader needs
    // to judge whether a cross-round delta is signal
    val spreads = names.map { n =>
      val ts = timings(n).filter(_ >= 0)
      s"\"$n\":${if (ts.isEmpty) -1.0 else fmt(ts.max - ts.min)}"
    }.mkString("{", ",", "}")
    val passes = names.map { n =>
      s"\"$n\":[${timings(n).map(fmt).mkString(",")}]"
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","iters":$iters,"cpus":$cpus,"load_before":${fmt(loadBefore)},"load_after":${fmt(loadAfter)},"contaminated":$contaminated,"queries":$qs,"spread":$spreads,"passes":$passes}"""
    try {
      val w = new java.io.PrintWriter(fullPath, "UTF-8")
      try w.println(full) finally w.close()
    } catch {
      case e: Throwable =>
        System.err.println(s"BENCH: could not write $fullPath: ${e.getMessage}")
    }
    // ---- stdout: one compact line (< 1 KB) that always survives the
    // driver's tail capture: total + the 5 slowest medians only
    val worst = medians.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"$k\":${fmt(v)}" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","iters":$iters,"cpus":$cpus,"load_before":${fmt(loadBefore)},"load_after":${fmt(loadAfter)},"contaminated":$contaminated,"queries":$worst,"n_queries":${names.size},"full":"$fullPath"}"""
    // Shut down BEFORE printing the result line, so the JSON is the
    // last thing on the output and no late shutdown noise can push it
    // out of a tail window (the r3 lesson: a StateStore maintenance
    // thread raced spark.stop(), dumped an RpcEnvStoppedException
    // stack trace after the JSON line, and the driver parsed nothing).
    // Stopping the maintenance pool first removes the race at the
    // source; printing last removes the ordering dependence entirely.
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Throwable => () }
    spark.stop()
    println(json)
    System.out.flush()
  }
}
