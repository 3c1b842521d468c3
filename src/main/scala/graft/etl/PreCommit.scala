package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-commit validation — Hudi's `hoodie.precommit.validators`
  * surface (the reference inherits it through its writer options;
  * README.md:127-137 claims the pipeline "validates" batches, and
  * pipeline_architecture.py:150-199 only ever records counts after the
  * fact). Rules are evaluated against the deduplicated incoming batch
  * INSIDE the table lock, before a single data file is written: a
  * violation aborts the commit with the per-rule counts, leaving
  * manifest, index, and data directories byte-identical — the batch
  * can be fixed and retried with no cleanup.
  *
  * Cost: ONE conditional aggregation over the batch evaluates every
  * rule (the [[graft.ops.DataQuality.ruleViolations]] shape — no
  * per-rule re-scan), O(batch) at any table size. A predicate that
  * evaluates to NULL counts as a violation: an unexpectedly-null
  * column must fail the gate, not slip past it.
  */
object PreCommit {

  /** `violation` flags a BAD row (true = reject). */
  final case class Rule(name: String, violation: Column)

  final class ValidationException(val counts: Map[String, Long])
      extends RuntimeException(
        "pre-commit validation failed, batch rejected: " +
          counts.toSeq.sortBy(_._1)
            .map { case (r, n) => s"$r=$n" }.mkString(", "))

  /** Throws [[ValidationException]] when any rule flags at least one
    * row; no-op for an empty rule set (the hot path stays zero-cost).
    */
  def validate(batch: DataFrame, rules: Seq[Rule]): Unit = {
    if (rules.isEmpty) return
    val aggs = rules.map(r =>
      sum(coalesce(r.violation.cast("long"), lit(1L))).as(r.name))
    val row = batch.agg(aggs.head, aggs.tail: _*).head()
    val counts = rules.zipWithIndex
      .map { case (r, i) => r.name -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
      .filter(_._2 > 0).toMap
    if (counts.nonEmpty) throw new ValidationException(counts)
  }
}
