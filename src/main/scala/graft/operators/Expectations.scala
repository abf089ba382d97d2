package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract validation — the "expectations suite" a
  * pipeline runs on every ingest batch before letting it touch the
  * corpus: not-null, range, regex, accepted-set, and key-uniqueness
  * rules, evaluated together and reported as one (rule, violations,
  * total, pass) frame the orchestrator can gate on. The audit REPORTS;
  * it never mutates — quarantining the violating rows stays an
  * explicit caller-side `filter` so the contract and the remediation
  * can't silently disagree.
  *
  * Scale shape: every row-scoped rule (any boolean `Column`
  * predicate) folds into ONE conditional-aggregation pass over the
  * frame — a single scan, partial-aggregated to one row per
  * partition, regardless of how many rules ride along. The one-row
  * result then unpivots to rule rows (explode over an inline array —
  * output-sized, trivial). Each uniqueness rule is its own key-keyed
  * aggregate (duplicates cannot be seen row-locally); its shuffle is
  * the same bill as the dedup the pipeline would run anyway, and
  * map-side combine collapses each partition to one row per key.
  *
  * Null semantics follow SQL three-valued logic with the audit
  * posture: a rule whose predicate evaluates NULL on a row (e.g. a
  * range check over a NULL value) counts that row as a VIOLATION —
  * "unknown" never passes a contract. Spell "null is fine" into the
  * predicate (`c.isNull || pred`) when that's the intent.
  *
  * Reference analog: sum-by-key
  * (`Imagine_MapReduce/MapReduceUtil.cpp:114-135`) —
  * every counter here is a conditional sum; the contract surface on
  * top is what the reference leaves to its caller. */
object Expectations {

  /** One uniqueness rule: `cols` should be a candidate key. A key
    * occurring c > 1 times contributes c − 1 violations (the rows
    * beyond the first occurrence). */
  final case class UniqueKey(rule: String, cols: Seq[String])

  /** Run the suite: `checks` are (rule-name, row predicate) pairs —
    * violation when the predicate is false OR null; `uniques` are
    * candidate-key rules. Output, one row per rule, ordered by rule
    * name: (rule, kind 'row'|'unique', violations, total, pass). */
  def audit(
      df: DataFrame,
      checks: Seq[(String, Column)],
      uniques: Seq[UniqueKey] = Nil): DataFrame = {
    require(checks.nonEmpty || uniques.nonEmpty,
      "expectations audit needs at least one rule")
    val names = checks.map(_._1) ++ uniques.map(_.rule)
    require(names.distinct.size == names.size,
      s"duplicate rule names: ${names.diff(names.distinct).mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._

    val rowPart: Option[DataFrame] = if (checks.isEmpty) None else Some {
      val aggs = checks.map { case (name, pred) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
          .as(s"_v_$name")
      } :+ count(lit(1)).as("_total")
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single agg row into (rule, violations, total):
      // inline array of structs — output-sized, no second scan
      val entries = checks.map { case (name, _) =>
        struct(lit(name).as("rule"),
          coalesce(col(s"_v_$name"), lit(0L)).as("violations"))
      }
      one.select(explode(array(entries: _*)).as("_e"), col("_total"))
        .select(col("_e.rule").as("rule"), lit("row").as("kind"),
          col("_e.violations").as("violations"),
          col("_total").as("total"))
    }

    val total = df.agg(count(lit(1)).as("_total"))
    val uniqueParts: Seq[DataFrame] = uniques.map { u =>
      df.groupBy(u.cols.map(col): _*)
        .agg(count(lit(1)).as("_c"))
        .filter(col("_c") > 1)
        .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("violations"))
        .crossJoin(broadcast(total))
        .select(lit(u.rule).as("rule"), lit("unique").as("kind"),
          col("violations"), col("_total").as("total"))
    }

    (rowPart.toSeq ++ uniqueParts)
      .reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
      .orderBy("rule")
  }
}
