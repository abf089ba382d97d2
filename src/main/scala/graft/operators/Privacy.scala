package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-conscious release of aggregate statistics — the gate a
  * training-data pipeline needs before corpus statistics leave the
  * trust boundary (per-source counts, per-language histograms,
  * contributor tallies): plain GROUP BY counts leak membership of
  * small groups. Two standard mechanisms compose here:
  * k-anonymity suppression (groups under k rows are withheld
  * entirely) and deterministic Laplace-SHAPED noise on the released
  * counts.
  *
  * What this is NOT: a formal (ε,δ)-DP mechanism. The noise is a
  * deterministic public function of (group key, salt) — anyone who
  * knows the construction AND the salt can subtract the noise
  * exactly; and k-suppression thresholds on the TRUE count, so a
  * group's presence/absence in the release itself carries exact
  * information about whether n ≥ k (a formally private release
  * would use a noisy threshold). The salt is therefore a SECRET —
  * treat it like a seed or a key, never publish or default it —
  * and the guarantee is "Laplace-magnitude perturbation keyed by a
  * secret", which is the reproducible-release posture most corpus
  * dashboards actually need, not a provable ε bound.
  *
  * Why deterministic at all: a RETRIED release (stage retry, job
  * re-run) must publish the IDENTICAL numbers — re-randomizing on
  * retry breaks reproducibility (and, in a true DP deployment,
  * burns privacy budget). The noise here is the inverse-CDF Laplace
  * transform of the repo's cross-engine deterministic uniform,
  * md5(group-key ":" salt) — same group, same salt, same noise, on
  * any engine, partitioning, or retry. Rotating the (secret) salt
  * per release period is the operational knob.
  *
  * Scale shape: one partial-agg count per group, one scalar
  * expression per group row. Nothing driver-side, nothing joined.
  *
  * Reference analog: none (SURVEY §2.2 — aggregation exists, but no
  * release policy of any kind); this is north-star pipeline surface.
  */
object Privacy {

  /** Noisy counts over `dims` with k-suppression first; see the
    * object doc for the exact (non-ε-DP) guarantee.
    *
    * Per group: u = (md5(key ":" salt) >>> 11 + 0.5) / 2^53 ∈ (0,1),
    * v = u − 0.5, noise = −(1/ε)·sign(v)·ln(1 − 2|v|) — a
    * Laplace(1/ε)-shaped deviate; released = max(n + noise, 0),
    * emitted at 6 decimals (the repo's ln-parity face; see q94).
    * Suppressed groups (n < k) do not appear at all; note the
    * thresholding itself reveals n ≥ k vs n < k (object doc).
    *
    * `salt` has NO default on purpose: it keys the noise, so it must
    * be caller-owned and kept secret like a seed — a well-known
    * default would make the noise publicly invertible.
    *
    * Output: dims* + (n BIGINT — the true count, for in-trust use;
    * release BOUNDED-noise double — the publishable number). Callers
    * publishing externally select only (dims, release). */
  def dpCounts(
      df: DataFrame,
      dims: Seq[String],
      epsilon: Double,
      k: Long,
      salt: String): DataFrame = {
    require(dims.nonEmpty, "at least one dimension column required")
    require(epsilon > 0.0, s"epsilon must be > 0, got $epsilon")
    require(k >= 1L, s"k must be >= 1, got $k")
    require(salt.nonEmpty,
      "salt must be non-empty — it keys the noise and must be kept " +
        "secret by the caller (see Privacy object doc)")
    val eps = epsilon
    val saltLocal = salt
    val noise = udf((key: String) => {
      val m = Kernels.md5Lower64(key + ":" + saltLocal) >>> 11
      val u = (m.toDouble + 0.5) / 9007199254740992.0
      val v = u - 0.5
      val s = if (v >= 0) 1.0 else -1.0
      -(1.0 / eps) * s * math.log(1.0 - 2.0 * math.abs(v))
    })
    val key = concat_ws("|", dims.map(d => col(d).cast("string")): _*)
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= k)
      .withColumn("release",
        round(greatest(col("n").cast("double") + noise(key), lit(0.0)),
          6))
  }

  /** Luhn checksum validity of a digit string — the discriminator
    * that separates a real payment-card number from an arbitrary
    * digit run (a bare `[0-9]{13,19}` regex overfires on order ids,
    * timestamps, phone numbers; virtually all card schemes carry
    * the ISO/IEC 7812 Luhn check digit). Pure declarative Catalyst:
    * one `transform` over the reversed digits with the
    * double-every-second rule and a sequential fold — no UDF, and
    * the oracle replays the identical fold. Returns false for
    * empty/non-digit input only insofar as CAST noise would —
    * callers pass regex-extracted digit runs. */
  def luhnValid(s: Column): Column = {
    val rev = reverse(s)
    val total = aggregate(
      transform(sequence(lit(1), length(s)), i => {
        val d = rev.substr(i, lit(1)).cast("int")
        when(i % 2 === 1, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      }),
      lit(0), (acc, x) => acc + x)
    total % 10 === 0
  }

  /** Payment-card exposure audit per key — the governance screen a
    * training corpus needs BEFORE the text ships ([[graft.functions
    * .TextFunctions]]' scrubbers handle emails/URLs/IPs; card
    * numbers are the class where a regex alone overfires, so the
    * count that matters is the LUHN-VALID one): per key, document
    * and candidate counts, how many candidates pass the Luhn check,
    * and the valid share. Everything is exact integers from one
    * partial-aggregated pass (the per-doc extract + fold is
    * map-side); the share is one IEEE division at the 6-decimal
    * face, null when there are no candidates.
    *
    * Output per key: (keys*, n_docs, n_docs_flagged, n_candidates,
    * n_luhn_valid, valid_share). */
  def ccAudit(
      df: DataFrame,
      keyCols: Seq[String],
      textCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    Seq("n_docs", "n_docs_flagged", "n_candidates", "n_luhn_valid",
      "valid_share").foreach { r =>
      require(!keyCols.contains(r),
        s"key column name $r is reserved by ccAudit")
    }
    val cands = expr(
      s"regexp_extract_all($textCol, '[0-9]{13,19}', 0)")
    val perDoc = df.select(
      keyCols.map(col) ++ Seq(
        coalesce(size(cands), lit(0)).as("_nc"),
        coalesce(size(filter(cands, c => luhnValid(c))), lit(0))
          .as("_nv")): _*)
    perDoc.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_nc") > 0, 1L).otherwise(0L))
          .as("n_docs_flagged"),
        sum(col("_nc").cast("long")).as("n_candidates"),
        sum(col("_nv").cast("long")).as("n_luhn_valid"))
      .withColumn("valid_share",
        when(col("n_candidates") > 0L,
          round(col("n_luhn_valid").cast("double") /
            col("n_candidates").cast("double"), 6)))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * et al. 2007) — the pre-release check on any record-level export:
    * every combination of the quasi-identifier columns must be shared
    * by at least k rows (or an attacker joins the export against a
    * public register and re-identifies), and each such group should
    * carry at least l distinct sensitive values (or membership alone
    * leaks the attribute even at k-anonymous sizes). This audits; it
    * does not suppress — the remediation (generalize a quasi column,
    * drop the group) is a policy decision the caller makes on the
    * report.
    *
    * Shape: ONE partial-aggregable groupBy over the quasi columns
    * (count + exact distinct-count of the sensitive attribute) —
    * group-cardinality-sized output, order-free exact integers, no
    * fold discipline needed. NULL quasi values form their own audit
    * group deliberately (a NULL pattern is itself re-identifying).
    *
    * Output: (quasi..., n, l_diversity, at_risk = n < k). */
  def kAnonymityAudit(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.size <= 16,
      s"quasiCols must number 1..16, got ${quasiCols.size}")
    require(k >= 2L, s"k must be >= 2 (k=1 audits nothing), got $k")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column '$sensitiveCol' cannot also be a " +
        "quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("at_risk", col("n") < k)
  }
}
