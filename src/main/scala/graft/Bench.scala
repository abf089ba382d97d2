package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line on stdout with per-query seconds.
  * One warm-up pass over the whole suite (Catalyst analysis caches,
  * codegen compilation, JIT) so one-time costs don't land on
  * whichever query runs first, then timed runs per query: `queries`
  * reports the per-query ROBUST (trimmed) median and `runs` the full
  * per-run times, so a run-to-run swing is a measurable spread
  * instead of a narrative — a single-run bench cannot arbitrate
  * "regression" vs "variance" (the r4 q63/q40 lesson).
  *
  * Isolation robustness (the r6 lesson — the artifact of record was
  * captured on a contended box and two medians recorded 6–60× their
  * idle-box values from 2-of-3 contaminated runs): a plain N=3
  * median has a 2-outlier breakdown point, so runs are now ADAPTIVE.
  * Each query starts with SPARK_GRAFT_BENCH_RUNS (default 3) runs;
  * while the observed spread is unstable (max > 1.5× min AND the
  * absolute gap exceeds 0.3 s — the floor keeps micro-queries from
  * re-running on scheduler noise) it takes extra runs up to
  * SPARK_GRAFT_BENCH_MAX_RUNS (default 7). The reported value is the
  * TRIMMED median: with >= 7 samples the top/bottom 2 are dropped,
  * with >= 5 the top/bottom 1, then the median of the rest — so a
  * transient contention burst must poison MOST of up to 7
  * spread-triggered runs, not 2 of 3, before it can own the median.
  * The host's /proc/loadavg is recorded at start and end so a
  * contended capture is diagnosable from the artifact itself.
  *
  * Sustained-contention defense (the r7 lesson — a multi-minute
  * contention window covered ALL of five queries' consecutive runs;
  * the runs looked stable, so the trimmed median faithfully reported
  * the contaminated value, 13–55× the same-code clean figures):
  * 1. INTERLEAVING. Runs are no longer consecutive per query: the
  *    suite executes as nRuns round-robin PASSES over all queries,
  *    so one query's samples land minutes apart. A contention window
  *    that spans a few minutes now poisons one sample of many
  *    queries — which the per-query trimmed median already absorbs —
  *    instead of every sample of a few queries.
  * 2. PRIOR CROSS-CHECK. The previous artifact (the bench_out.json
  *    committed at the last round, read before this run overwrites
  *    it; override via SPARK_GRAFT_BENCH_PRIOR) supplies a per-query
  *    reference median. After the base passes, any query whose
  *    median exceeds 3× its prior (and by > 0.3 s absolute) is
  *    treated like an unstable one: the escalation budget is spent
  *    on extra interleaved passes over the divergent set FIRST, so a
  *    contaminated early window gets clean late samples to outvote
  *    it. Divergences still standing at the end are listed in the
  *    artifact (`prior_divergent`) so the reader sees them without
  *    diffing artifacts by hand. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val maxRuns = math.max(nRuns,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "7").toInt)
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "" }
    val loadStart = loadavg
    // Prior artifact medians, read BEFORE this run overwrites the
    // default output path. Parsed with the Jackson shipped in Spark;
    // any failure (missing file, schema drift) degrades to "no
    // prior" — the cross-check is an extra defense, never a gate.
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json"))
    val prior: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(priorPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        // medians are only comparable at the same scale factor: a
        // prior captured at another sf would mass-flag (or mass-mask)
        // divergence, so a mismatch degrades to "no prior"
        if (root.get("sf") == null || root.get("sf").asText() != sfDir)
          Map.empty
        else {
          val qs = root.get("queries")
          val it = qs.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next(); b += e.getKey -> e.getValue.asDouble()
          }
          b.result()
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // interleaving side effect, measured: with the suite's ~258
      // queries per pass, the default 100-entry codegen cache evicts
      // every compiled class between one query's samples, so every
      // interleaved sample re-compiles and re-JITs what a
      // consecutive-runs bench measured hot — a systematic ~1.5–2×
      // on sub-second queries (the first interleaved capture read
      // 2.5× on q219-class queries with zero plan change). Size the
      // cache to the suite so interleaved samples measure the same
      // warm code consecutive samples did.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    def timeOnce(
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      // isolate runs from each other: eager operators persist small
      // derived results and the CacheManager matches them by
      // canonical plan, so without this a timed run can silently
      // reuse (or GC-fight with) another invocation's blocks —
      // attribution noise, not signal
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // the measurement statistics live in BenchStats (spec-pinned:
    // BenchStatsSpec) — trimmed median, rel+abs instability, and the
    // one-sided prior cross-check that challenges STABLE-slow
    // readings (every sample inside one contention window)
    import BenchStats.{unstable, robustMedian}
    def divergent(name: String, ts: Seq[Double]): Boolean =
      BenchStats.divergent(ts, prior.get(name))
    // Base samples: nRuns round-robin PASSES over the whole suite
    // (not nRuns consecutive runs per query) — see the interleaving
    // note in the header. Insertion order of `acc` stays the sorted
    // query order for the output.
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      queries.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    for (_ <- 1 to nRuns; (name, fn) <- queries)
      acc(name) = acc(name) :+ timeOnce(fn)
    // global escalation budget: ~2 extra runs per query on average
    // (an idle box consumes well under this; a PERSISTENTLY
    // contended box would otherwise escalate everywhere and blow the
    // suite wall to maxRuns/nRuns x — bound it so the artifact still
    // lands, with the contamination visible in `runs` + loadavg).
    // Escalation is itself interleaved: each iteration is one pass
    // over every query that still needs samples, divergent-vs-prior
    // first, so the budget buys time-separated samples where history
    // says the current median is least trustworthy.
    var extraBudget = 2 * queries.size
    var escalating = true
    while (escalating && extraBudget > 0) {
      val needy = queries.filter { case (name, _) =>
        acc(name).length < maxRuns &&
          (divergent(name, acc(name)) || unstable(acc(name)))
      }
      val ordered = needy.sortBy { case (name, _) =>
        if (divergent(name, acc(name))) 0 else 1
      }
      escalating = ordered.nonEmpty
      for ((name, fn) <- ordered if extraBudget > 0) {
        acc(name) = acc(name) :+ timeOnce(fn)
        extraBudget -= 1
      }
    }
    val perRun: Seq[(String, Seq[Double])] =
      acc.toSeq.map { case (n, ts) => n -> (ts: Seq[Double]) }
    val results =
      perRun.map { case (name, ts) => name -> robustMedian(ts) }
    // divergences still standing after escalation, named in the
    // artifact so a reader need not diff against the prior by hand
    val stillDivergent =
      perRun.collect { case (n, ts) if divergent(n, ts) => n }
    // Bucketed-join evidence (SCALING.md): the same big-big join shape
    // as q11, shuffled vs co-bucketed. Table writes are one-time layout
    // cost and untimed; the bucketed timing only counts if the executed
    // plan is genuinely exchange-free below the join (else -1). These
    // x_ entries ride in the queries map for side-by-side comparison
    // but stay out of `total` (they duplicate q11's work).
    val bucketEntries: Seq[(String, Double)] = {
      val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        import org.apache.spark.sql.functions._
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        val o = spark.read.parquet(s"$sfDir/orders.parquet")
        def shape(j: org.apache.spark.sql.DataFrame) =
          j.groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        val shuffled = shape(li.join(o, col("l_orderkey") === col("o_orderkey")))
        shuffled.count() // warm
        val t0 = System.nanoTime(); shuffled.count()
        val tShuffled = (System.nanoTime() - t0) / 1e9
        // one file per bucket (repartition on the bucket key before the
        // write): multi-file buckets force a sort below the join and
        // read with bucket-count tasks regardless of file count
        li.repartition(col("l_orderkey"))
          .write.mode("overwrite").bucketBy(32, "l_orderkey")
          .sortBy("l_orderkey").saveAsTable("bench_li_bucketed")
        o.repartition(col("o_orderkey"))
          .write.mode("overwrite").bucketBy(32, "o_orderkey")
          .sortBy("o_orderkey").saveAsTable("bench_o_bucketed")
        val bucketed = shape(spark.table("bench_li_bucketed")
          .join(spark.table("bench_o_bucketed"),
            col("l_orderkey") === col("o_orderkey")))
        bucketed.count() // warm
        val plan = bucketed.queryExecution.executedPlan.toString
        val exchangesBelowJoin = plan.linesIterator
          .dropWhile(!_.contains("SortMergeJoin"))
          .count(_.contains("Exchange hashpartitioning"))
        val t1 = System.nanoTime(); bucketed.count()
        val tBucketed = (System.nanoTime() - t1) / 1e9
        Seq("x_join_shuffled" -> tShuffled,
          "x_join_bucketed" -> (if (exchangesBelowJoin == 0) tBucketed else -1.0))
      } catch { case _: Throwable => Seq.empty }
      finally {
        try {
          spark.sql("DROP TABLE IF EXISTS bench_li_bucketed")
          spark.sql("DROP TABLE IF EXISTS bench_o_bucketed")
        } catch { case _: Throwable => () }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      }
    }
    // 4-decimal seconds keep the one-line stdout contract compact
    // (sub-0.1ms is scheduler noise anyway); the same JSON also goes
    // to a file so no harness line-length limit can lose the head of
    // the per-query map
    def fmt(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = (results ++ bucketEntries)
      .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // full per-run times ride along so the median is auditable and
    // "machine variance" is a quotable spread, not a claim
    val runsJson = perRun
      .map { case (k, ts) =>
        s"\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
      }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val divJson = stillDivergent
      .map(n => s"\"" + n + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs_per_query":$nRuns,"max_runs":$maxRuns,"stat":"trimmed_median_interleaved","prior_divergent":$divJson,"runs":$runsJson,"loadavg_start":"$loadStart","loadavg_end":"$loadavg","sf":"$sfDir"}"""
    println(line)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { // the stdout line is the contract; the file is best-effort
      case scala.util.control.NonFatal(_) => ()
    }
    spark.stop()
  }
}
