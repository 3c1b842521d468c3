package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
import org.apache.spark.sql.catalyst.plans.logical.{CreateTableAsSelect, TableSpec, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.Transform

/** SQL DDL front door: `CREATE TABLE ... TBLPROPERTIES(
  * 'graft.table.layout' = ...) AS SELECT ...` parsed by Spark's own
  * parser and routed to the engine's layout creation — the statement a
  * Hudi user writes to stand up a managed table purely in SQL. The
  * TBLPROPERTIES carry the key config (primaryKey / preCombineField /
  * tieBreak) and layout knobs (numBuckets / numFiles); `PARTITIONED
  * BY` names the partitioned layout's partition columns; `LOCATION`
  * (or 'graft.table.path') says where the layout lives. The created
  * table is immediately DML-able through [[SqlMerge]] and readable
  * through [[Catalog.readTable]] / [[SqlRead]]. A CTAS without a graft
  * layout property falls through to Spark's own CTAS untouched.
  */
object SqlDdl {

  def exec(spark: SparkSession, sqlText: String): Unit =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case c: CreateTableAsSelect => createParsed(spark, c, sqlText)
      case other => throw new IllegalArgumentException(
        s"unsupported DDL: ${other.getClass.getSimpleName}")
    }

  private def createParsed(spark: SparkSession, c: CreateTableAsSelect,
      sqlText: String): Unit = {
    val props = c.tableSpec match {
      case u: UnresolvedTableSpec => u.properties
      case t: TableSpec => t.properties
      case other => throw new IllegalArgumentException(
        s"unsupported table spec: ${other.getClass.getSimpleName}")
    }
    props.get("graft.table.layout") match {
      case None =>
        // not a graft-managed table — Spark's own CTAS handles it
        spark.sql(sqlText)
        ()
      case Some(kind) =>
        val name = c.name match {
          case UnresolvedIdentifier(parts, _) => parts.mkString(".")
          case other => throw new IllegalArgumentException(
            s"cannot resolve CTAS target from ${other.getClass.getSimpleName}")
        }
        val location = c.tableSpec match {
          case u: UnresolvedTableSpec => u.location
          case t: TableSpec => t.location
          case _ => None
        }
        val path = location.orElse(props.get("graft.table.path")).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE $name: a graft layout needs LOCATION or " +
              "'graft.table.path'"))
        val keys = props.getOrElse("graft.table.primaryKey",
          throw new IllegalArgumentException(
            s"CREATE TABLE $name: 'graft.table.primaryKey' is required"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val precombine = props.getOrElse("graft.table.preCombineField",
          throw new IllegalArgumentException(
            s"CREATE TABLE $name: 'graft.table.preCombineField' is required"))
        val tieBreak = props.get("graft.table.tieBreak")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val df = org.apache.spark.sql.graftbridge.Bridge.ofRows(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          c.query)
        kind match {
          case "bucket" =>
            BucketTable.create(df, path, keys, precombine, tieBreak,
              numBuckets = props.get("graft.table.numBuckets")
                .map(_.toInt).getOrElse(16))
            Catalog.registerLayoutTable(spark, name, "bucket", path)
          case "bloom" =>
            BloomTable.create(df, path, keys, precombine, tieBreak,
              numFiles = props.get("graft.table.numFiles")
                .map(_.toInt).getOrElse(8))
            Catalog.registerLayoutTable(spark, name, "bloom", path)
          case "partitioned" =>
            val partitionCols = c.partitioning.map(identityCol(name, _))
            require(partitionCols.nonEmpty,
              s"CREATE TABLE $name: the partitioned layout needs " +
                "PARTITIONED BY (...)")
            PartitionedTable.create(df, path, keys, precombine, tieBreak,
              partitionCols = partitionCols)
            Catalog.registerLayoutTable(spark, name, "partitioned", path)
          case "timeline" =>
            Timeline.upsertInto(spark, path, df, keys, precombine, tieBreak)
            Catalog.registerTimelineTable(spark, name, path, keys,
              precombine, tieBreak)
            ()
          case other => throw new IllegalArgumentException(
            s"unknown layout kind '$other' on $name " +
              "(expected bucket | bloom | partitioned | timeline)")
        }
    }
  }

  /** Only identity partition transforms make sense here — the layouts
    * partition by column value, not by bucket/temporal transforms.
    */
  private def identityCol(table: String, t: Transform): String = t match {
    case t if t.name == "identity" && t.references.length == 1 =>
      t.references.head.fieldNames.mkString(".")
    case other => throw new IllegalArgumentException(
      s"CREATE TABLE $table: unsupported partition transform " +
        s"'$other' (only plain column names)")
  }
}
