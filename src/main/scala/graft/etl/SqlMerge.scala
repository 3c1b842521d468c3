package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.{col, expr, lit, not, when}

/** SQL `MERGE INTO` front door for graft-managed catalog tables — the
  * statement the reference's users write against Hudi's Spark SQL
  * surface (`MERGE INTO target USING source ON ... WHEN MATCHED THEN
  * UPDATE SET * WHEN NOT MATCHED THEN INSERT *`), re-expressed without
  * a DSv2 row-level-operation implementation: the statement is parsed
  * by SPARK'S OWN parser (so syntax, aliasing, and subquery sources are
  * exactly Spark SQL), the parsed [[MergeIntoTable]] is validated
  * against the canonical upsert shape, and execution is the same keyed
  * precombine upsert every other write path uses — which is precisely
  * what Hudi's MERGE INTO does when the table carries a precombine
  * field (latest-wins on the precombine, batch pre-deduped per key,
  * rather than ANSI MERGE's multiple-source-rows error).
  *
  * Supported shapes (everything else fails loudly, naming what it saw):
  *   - `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *     → keyed upsert
  *   - `WHEN MATCHED THEN DELETE` (no other clauses) → keyed delete
  *     (left-anti against the source's keys)
  *
  * The ON condition must be the key-equality conjunction over exactly
  * the table's `graft.table.primaryKey` columns. The table keeps its
  * declared schema (SQL MERGE never widens it; schema evolution is the
  * API path's job), and the rewrite goes through `INSERT OVERWRITE` so
  * table metadata (TBLPROPERTIES) survives.
  */
object SqlMerge {

  /** Execute a graft-supported DML statement: MERGE INTO, UPDATE, or
    * DELETE FROM, each parsed by Spark's parser and executed as the
    * engine's own keyed/filtered rewrite.
    */
  def exec(spark: SparkSession, sqlText: String): Unit =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable => mergeParsed(spark, m)
      case u: UpdateTable => updateParsed(spark, u)
      case d: DeleteFromTable => deleteParsed(spark, d)
      case other => throw new IllegalArgumentException(
        s"unsupported DML: ${other.getClass.getSimpleName}")
    }

  /** `DELETE FROM t WHERE pred` — a filtered rewrite: survivors are
    * the rows the predicate does NOT select (three-valued: a NULL
    * predicate row is not deleted, exactly SQL's DELETE semantics).
    */
  private def deleteParsed(spark: SparkSession, d: DeleteFromTable): Unit = {
    val target = tableName(d.table)
    // DeleteFromTable's condition is non-optional (a bare DELETE
    // parses as WHERE true)
    val cond = render(d.condition)
    val t = spark.table(target).alias(frameAlias(d.table, target))
    writeBack(spark, target, t.filter(not(cond) || cond.isNull))
  }

  /** The name the statement's expressions qualify columns by: the
    * user's alias when the target was written `DELETE FROM t x ...` /
    * `UPDATE t AS u ...` (otherwise `x.v` would fail analysis with an
    * unresolved-column error even though the statement parsed), the
    * table's simple name when not aliased.
    */
  private def frameAlias(plan: LogicalPlan, target: String): String =
    plan.collectFirst { case a: SubqueryAlias => a.alias }
      .getOrElse(target.split('.').last)

  /** `UPDATE t SET c = e, ... WHERE pred` — a projected rewrite: each
    * assigned column becomes `CASE WHEN pred THEN e ELSE c END`,
    * unassigned columns pass through.
    */
  private def updateParsed(spark: SparkSession, u: UpdateTable): Unit = {
    val target = tableName(u.table)
    val cond = u.condition.map(render).getOrElse(lit(true))
    val t = spark.table(target).alias(frameAlias(u.table, target))
    // resolve each assignment target against the table's columns
    // CASE-INSENSITIVELY (Spark SQL's default resolution) and reject
    // unknown columns loudly — a silently dropped `SET typo = ...`
    // would make the whole statement a no-op
    val byLower = t.columns.map(c => c.toLowerCase -> c).toMap
    val assigned = u.assignments.map { a =>
      val written = a.key match {
        case attr: UnresolvedAttribute => attr.nameParts.last
        case other => throw new IllegalArgumentException(
          s"unsupported assignment target: ${other.sql}")
      }
      val resolved = byLower.getOrElse(written.toLowerCase,
        throw new IllegalArgumentException(
          s"UPDATE $target: no such column '$written' " +
            s"(columns: ${t.columns.mkString(", ")})"))
      resolved -> render(a.value)
    }.toMap
    val projected = t.select(t.columns.toSeq.map { c =>
      assigned.get(c) match {
        case Some(v) => when(cond, v).otherwise(col(c)).as(c)
        case None => col(c)
      }
    }: _*)
    writeBack(spark, target, projected)
  }

  /** Parsed-but-unresolved expression → Column, by round-tripping the
    * generated SQL through `expr` — the expression resolves against
    * the target table aliased under its own simple name, so both bare
    * and table-qualified column references work.
    */
  private def render(e: Expression): org.apache.spark.sql.Column = expr(e.sql)

  def merge(spark: SparkSession, sqlText: String): Unit =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case m: MergeIntoTable => mergeParsed(spark, m)
      case other =>
        throw new IllegalArgumentException(
          s"not a MERGE statement: ${other.getClass.getSimpleName}")
    }

  private def mergeParsed(spark: SparkSession, m: MergeIntoTable): Unit = {
    val target = tableName(m.targetTable)
        val (keys, precombine, tieBreak) = Catalog.upsertConfigFull(spark, target)
        val condKeys = keyEqualities(m.mergeCondition)
        require(condKeys.map(_._1).toSet == keys.toSet &&
          condKeys.forall { case (a, b) => a == b },
          s"ON must equate exactly the primary key columns ${keys.mkString(",")}; " +
            s"got ${condKeys.map { case (a, b) => s"$a=$b" }.mkString(" AND ")}")
        val source = graftbridgeOfRows(spark, m.sourceTable)
        val existing = spark.table(target)
        val cols = existing.columns.toSeq
        (m.matchedActions, m.notMatchedActions) match {
          case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
            writeBack(spark, target,
              HudiLike.upsert(existing, source.select(cols.map(col): _*),
                keys, precombine, tieBreak).select(cols.map(col): _*))
          case (Seq(DeleteAction(None)), Seq()) =>
            writeBack(spark, target,
              existing.join(source.select(keys.map(col): _*).distinct(),
                keys, "left_anti"))
          case (matched, notMatched) =>
            throw new IllegalArgumentException(
              "unsupported MERGE shape: expected UPDATE SET * + INSERT * " +
                s"or bare DELETE; got matched=$matched notMatched=$notMatched")
        }
  }

  /** The merged state replaces the table contents in place:
    * localCheckpoint decouples the plan from the files INSERT OVERWRITE
    * is about to replace (the same discipline as `HudiLike.upsertInto`).
    */
  private def writeBack(spark: SparkSession, target: String,
      merged: org.apache.spark.sql.DataFrame): Unit = {
    merged.localCheckpoint()
      .write.mode("overwrite").insertInto(target)
    spark.catalog.refreshTable(target)
  }

  private def graftbridgeOfRows(spark: SparkSession, plan: LogicalPlan) =
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Unqualified table name from the parsed target (possibly aliased). */
  private def tableName(plan: LogicalPlan): String =
    plan.collectFirst { case r: UnresolvedRelation =>
      r.multipartIdentifier.mkString(".")
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot resolve MERGE target from ${plan.getClass.getSimpleName}"))

  /** `(targetCol, sourceCol)` pairs from an equality conjunction; any
    * non-equality predicate is a loud failure (a theta-merge is not an
    * upsert).
    */
  private def keyEqualities(e: Expression): Seq[(String, String)] = e match {
    case And(l, r) => keyEqualities(l) ++ keyEqualities(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
      Seq((a.nameParts.last, b.nameParts.last))
    case other => throw new IllegalArgumentException(
      s"MERGE ON must be a key-equality conjunction, got: ${other.sql}")
  }
}
