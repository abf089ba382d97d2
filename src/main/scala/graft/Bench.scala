package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: JSON artifact lines on stdout with per-query
  * seconds. The suite executes as interleaved round-robin PASSES over
  * all queries; pass 1 IS the warmup (Catalyst analysis caches,
  * codegen compilation, JIT) — its samples are quarantined and quoted
  * only when budget shedding leaves a query with nothing else (see
  * [[BenchStats.effective]]) — and later passes are the measured
  * samples: `queries` reports the per-query ROBUST (trimmed) median
  * and `runs` the full measured per-run times, so a run-to-run swing
  * is a measurable spread instead of a narrative — a single-run bench
  * cannot arbitrate "regression" vs "variance" (the r4 q63/q40
  * lesson).
  *
  * Isolation robustness (the r6 lesson — the artifact of record was
  * captured on a contended box and two medians recorded 6–60× their
  * idle-box values from 2-of-3 contaminated runs): a plain N=3
  * median has a 2-outlier breakdown point, so runs are ADAPTIVE.
  * Each query starts with the base measured passes; while the
  * observed spread is unstable (max > 1.5× min AND the absolute gap
  * exceeds 0.3 s — the floor keeps micro-queries from re-running on
  * scheduler noise) it takes extra runs up to
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
  * 1. INTERLEAVING. Runs are round-robin passes over all queries, so
  *    one query's samples land minutes apart. A contention window
  *    that spans a few minutes poisons one sample of many queries —
  *    which the per-query trimmed median already absorbs — instead
  *    of every sample of a few queries.
  * 2. PRIOR CROSS-CHECK. The previous artifact (the bench_out.json
  *    committed at the last round, read before this run overwrites
  *    it; override via SPARK_GRAFT_BENCH_PRIOR; a `"partial":true`
  *    prior — a shed or killed capture — is ignored) supplies a
  *    per-query reference median. After the base passes, any query
  *    whose median exceeds 3× its prior (and by > 0.3 s absolute) is
  *    treated like an unstable one: the escalation budget is spent
  *    on extra interleaved passes over the divergent set FIRST, so a
  *    contaminated early window gets clean late samples to outvote
  *    it. Divergences still standing at the end are listed in the
  *    artifact (`prior_divergent`).
  *
  * Timeout-proofing (the r8 lesson — the driver's capture was killed
  * at its wall budget after ~25 min of SUCCESSFUL measurement, and
  * the artifact held nothing because the one JSON line printed only
  * at the end):
  * 1. A COMPLETE artifact line (full-suite medians over
  *    samples-so-far, `"partial":true`) prints and writes after
  *    EVERY pass and every 64 queries within a pass — a kill at any
  *    point leaves the latest full-suite line in the captured tail.
  *    Only queries with at least one sample appear mid-pass-1;
  *    `queries_measured` counts them.
  * 2. A WALL BUDGET (`SPARK_GRAFT_BENCH_WALL_SECS`, default 1380 s,
  *    measured from main() entry) is honored by DEGRADING, never
  *    overrunning. Budget priority (first kept, first shed from the
  *    tail): warmup + first measured pass (always attempted, aborted
  *    per-query when the clock actually runs out), the bucket-join
  *    diagnostic, later measured passes (projection-gated on the
  *    measured per-query minima +10% margin), escalation. A query a
  *    shed leaves short falls back through [[BenchStats.effective]]
  *    (measured samples if any, else the warmup sample), so even a
  *    catastrophically slow box yields a full-suite artifact with
  *    the shedding named in `shed`. */
object Bench {
  def main(args: Array[String]): Unit = {
    val t0Wall = System.nanoTime()
    def wallS: Double = (System.nanoTime() - t0Wall) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // total interleaved passes INCLUDING the pass-1 warmup (so the
    // default 3 = 1 warmup + 2 measured — the r8 suite's separate
    // warmup pass cost a third of the wall for samples it threw away)
    val nPasses = math.max(2,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val maxRuns = math.max(nPasses - 1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "7").toInt)
    val wallBudget =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_WALL_SECS", "1380").toDouble
    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "" }
    val loadStart = loadavg
    // Prior artifact medians, read BEFORE this run overwrites the
    // default output path. Parsed with the Jackson shipped in Spark;
    // any failure (missing file, schema drift, a partial/shed prior)
    // degrades to "no prior" — the cross-check is an extra defense,
    // never a gate.
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json"))
    val prior: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(priorPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
        // medians are only comparable at the same scale factor (a
        // prior captured at another sf would mass-flag or mass-mask
        // divergence) and only from a COMPLETE capture — a partial
        // line's medians may be warmup samples
        if (root.get("sf") == null || root.get("sf").asText() != sfDir ||
            (root.get("partial") != null && root.get("partial").asBoolean()))
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
      // interleaving side effect, measured: with the suite's ~266
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
    // BenchStatsSpec) — trimmed median, rel+abs instability, the
    // one-sided prior cross-check that challenges STABLE-slow
    // readings, and the warmup-fallback sample selection
    import BenchStats.{unstable, robustMedian, effective}
    // pass-1 warmup samples (quarantined) and measured samples
    val warm = scala.collection.mutable.LinkedHashMap[String, Double]()
    val acc = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      queries.map { case (name, _) => name -> Vector.empty[Double] }: _*)
    def samplesOf(name: String): Seq[Double] =
      effective(warm.get(name), acc(name))
    def divergent(name: String): Boolean = {
      val ts = samplesOf(name)
      ts.nonEmpty && BenchStats.divergent(ts, prior.get(name))
    }
    // best estimate of a query's clean cost = min sample seen (load
    // only ever adds); the warmup sample counts — it is all the
    // projection has before pass 2
    def minTime(name: String): Double = {
      val ts = samplesOf(name)
      if (ts.isEmpty) 0.0 else ts.min
    }
    var bucketEntries: Seq[(String, Double)] = Seq.empty
    val shed = scala.collection.mutable.ArrayBuffer[String]()
    // ---- artifact emission: a COMPLETE line from samples-so-far ----
    def fmt(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    def emit(partial: Boolean): Unit = {
      val seen = queries.map(_._1).filter(n => samplesOf(n).nonEmpty)
      val results = seen.map(n => n -> robustMedian(samplesOf(n)))
      val stillDivergent = seen.filter(divergent)
      val qs = (results ++ bucketEntries)
        .map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      // measured per-run times ride along so the median is auditable
      // and "machine variance" is a quotable spread, not a claim; the
      // quarantined warmup samples land in their own map
      val runsJson = seen
        .map(k => s"\"" + k + "\":" + acc(k).map(fmt).mkString("[", ",", "]"))
        .mkString("{", ",", "}")
      val warmJson = seen.flatMap(k => warm.get(k).map(v =>
          s"\"" + k + "\":" + fmt(v)))
        .mkString("{", ",", "}")
      val total = results.map(_._2).sum
      val divJson = stillDivergent
        .map(n => s"\"" + n + "\"").mkString("[", ",", "]")
      val shedJson = shed.map(s => s"\"" + s + "\"").mkString("[", ",", "]")
      val line =
        s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"runs_per_query":${nPasses - 1},"max_runs":$maxRuns,"stat":"trimmed_median_interleaved","partial":$partial,"queries_measured":${seen.size},"wall_s":${fmt(wallS)},"wall_budget_s":${fmt(wallBudget)},"shed":$shedJson,"prior_divergent":$divJson,"runs":$runsJson,"warmup":$warmJson,"loadavg_start":"$loadStart","loadavg_end":"$loadavg","sf":"$sfDir"}"""
      println(line)
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { // the stdout line is the contract; the file is best-effort
        case scala.util.control.NonFatal(_) => ()
      }
    }
    // ---- base passes (pass 1 = warmup), budget-aware ----
    // Budget priority: the warmup and the FIRST measured pass always
    // attempt (a measured sample beats any projection — warmup times
    // overestimate a measured pass by ~1.5×, so a whole-pass shed
    // decided on them would trade real samples for a guess), aborting
    // per-query when the clock actually runs out; the bucket
    // diagnostic next (unique evidence); then later measured passes,
    // projection-gated on the now-accurate measured minima (+10% load
    // margin) and per-query aborted; escalation last (it only buys
    // redundancy). A query skipped by an abort keeps its earlier
    // samples and falls back through [[BenchStats.effective]].
    var aborted = false
    def runPass(p: Int): Unit = {
      var i = 0
      for ((name, fn) <- queries if !aborted) {
        if (p > 1 && wallS + 1.1 * minTime(name) > wallBudget) {
          aborted = true
          shed += s"pass_${p}_tail_from_$name"
        } else {
          val t = timeOnce(fn)
          if (p == 1) warm(name) = t else acc(name) = acc(name) :+ t
          i += 1
          if (i % 64 == 0) emit(partial = true)
        }
      }
      emit(partial = true)
    }
    runPass(1)
    runPass(2)
    // ---- bucketed-join evidence (SCALING.md): the same big-big join
    // shape as q11, shuffled vs co-bucketed. Table writes are one-time
    // layout cost and untimed; the bucketed timing only counts if the
    // executed plan is genuinely exchange-free below the join (else
    // -1). These x_ entries ride in the queries map for side-by-side
    // comparison but stay out of `total` (they duplicate q11's work).
    // Unique evidence, so it outranks escalation (which only buys
    // redundancy) in the budget order — but it still sheds before the
    // artifact risks the clock (~90 s observed cost incl. writes). ----
    if (aborted || wallS + 90 > wallBudget) {
      shed += "bucket_diag"
    } else {
      val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      bucketEntries = try {
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
      emit(partial = true)
    }
    // ---- later measured passes, projection-gated on measured minima ----
    for (p <- 3 to nPasses if !aborted) {
      val projected = 1.1 * queries.map { case (n, _) => minTime(n) }.sum
      if (wallS + projected > wallBudget) shed += s"pass_$p"
      else runPass(p)
    }
    // ---- escalation: global budget of ~2 extra runs per query on
    // average (an idle box consumes well under this; a PERSISTENTLY
    // contended box would otherwise escalate everywhere and blow the
    // suite wall to maxRuns x — bound it so the artifact still lands,
    // with the contamination visible in `runs` + loadavg). Escalation
    // is itself interleaved: each iteration is one pass over every
    // query that still needs samples, divergent-vs-prior first, so
    // the budget buys time-separated samples where history says the
    // current median is least trustworthy. The wall budget cuts it
    // off per-sample — redundancy is the first thing to shed. ----
    var extraBudget = if (aborted) 0 else 2 * queries.size
    var escalating = extraBudget > 0
    var wallStop = false
    while (escalating && extraBudget > 0 && !wallStop) {
      val needy = queries.filter { case (name, _) =>
        acc(name).nonEmpty && acc(name).length < maxRuns &&
          (divergent(name) || unstable(acc(name)))
      }
      val ordered = needy.sortBy { case (name, _) =>
        if (divergent(name)) 0 else 1
      }
      escalating = ordered.nonEmpty
      for ((name, fn) <- ordered if extraBudget > 0 && !wallStop) {
        if (wallS + 1.1 * minTime(name) > wallBudget) {
          wallStop = true
          shed += "escalation_tail"
        } else {
          acc(name) = acc(name) :+ timeOnce(fn)
          extraBudget -= 1
        }
      }
      emit(partial = true)
    }
    emit(partial = false)
    spark.stop()
  }
}
