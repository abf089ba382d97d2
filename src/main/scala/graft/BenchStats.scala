package graft

/** The Bench measurement statistics, factored out of the harness so
  * the defense itself is spec-pinned: a measurement discipline that
  * exists to adjudicate "regression vs contamination" should not be
  * the one untested code path in the repo.
  *
  * Semantics (shared with Bench's header doc):
  *   - `median`: standard even/odd sample median.
  *   - `robustMedian`: symmetric trimmed median — with >= 7 samples
  *     the top/bottom 2 drop, with >= 5 the top/bottom 1 — so up to
  *     2 contaminated runs of 7 (or 1 of 5) cannot move the
  *     reported value at all.
  *   - `unstable`: a spread is escalation-worthy only when it is
  *     both RELATIVELY wide (max > 1.5× min) and ABSOLUTELY material
  *     (max − min > 0.3 s); either alone is scheduler noise.
  *   - `divergent`: the prior-artifact cross-check — the current
  *     robust median must exceed 3× the committed prior AND sit
  *     > 0.3 s above it. One-sided by design: running FASTER than
  *     the prior is progress, never a reason to burn re-runs.
  */
object BenchStats {

  def median(ts: Seq[Double]): Double = {
    val s = ts.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def robustMedian(ts: Seq[Double]): Double = {
    val s = ts.sorted
    val trim = if (s.length >= 7) 2 else if (s.length >= 5) 1 else 0
    median(s.slice(trim, s.length - trim))
  }

  def unstable(ts: Seq[Double]): Boolean = {
    val mn = ts.min; val mx = ts.max
    mx > 1.5 * mn && mx - mn > 0.3
  }

  def divergent(ts: Seq[Double], prior: Option[Double]): Boolean =
    prior.exists { p =>
      val m = robustMedian(ts)
      p > 0 && m > 3 * p && m - p > 0.3
    }

  /** Sample selection under budget shedding: measured samples win;
    * the quarantined pass-1 warmup sample is quoted only when it is
    * all a query has (a shed run still reports a full-suite line
    * instead of dropping the query — the r8 rc=124 lesson). */
  def effective(warm: Option[Double], measured: Seq[Double]): Seq[Double] =
    if (measured.nonEmpty) measured else warm.toSeq
}
