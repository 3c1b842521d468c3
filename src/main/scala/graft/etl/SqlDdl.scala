package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, CreateTableAsSelect, DropColumns, LogicalPlan, RenameColumn, RenameTable, TableSpec, UnresolvedTableSpec}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType

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

  /** Navigate the declared schema along a nested column path (struct
    * fields by case-insensitive name, `element` descending an
    * array<struct>, `value` descending a map<_, struct>), returning
    * the canonical-case parent path, the parent STRUCT the leaf lives
    * in, and the leaf name. Loud on every wrong shape — bare arrays
    * without `.element.`, bare maps without `.value.`, map KEYS
    * (join-identity semantics; never evolved), non-struct descent —
    * so the four ALTER verbs share one error surface.
    */
  private def parentAndLeaf(table: String, verb: String, sch: StructType,
      path: Seq[String]): (Seq[String], StructType, String) = {
    var canonical = Vector.empty[String]
    var cur: org.apache.spark.sql.types.DataType = sch
    path.dropRight(1).foreach { comp =>
      cur match {
        case at: org.apache.spark.sql.types.ArrayType
            if comp.equalsIgnoreCase("element") =>
          canonical :+= "element"; cur = at.elementType
        case _: org.apache.spark.sql.types.ArrayType =>
          throw new IllegalArgumentException(
            s"$verb $table: '$comp' in '${path.mkString(".")}' is under " +
              "an ARRAY — address element fields through '.element.'")
        case mt: org.apache.spark.sql.types.MapType
            if comp.equalsIgnoreCase("value") =>
          canonical :+= "value"; cur = mt.valueType
        case _: org.apache.spark.sql.types.MapType
            if comp.equalsIgnoreCase("key") =>
          throw new IllegalArgumentException(
            s"$verb $table: map KEYS in '${path.mkString(".")}' never " +
              "evolve (they are lookup identity) — only '.value.' " +
              "fields do")
        case _: org.apache.spark.sql.types.MapType =>
          throw new IllegalArgumentException(
            s"$verb $table: '$comp' in '${path.mkString(".")}' is under " +
              "a MAP — address value fields through '.value.'")
        case st: StructType =>
          val f = st.fields.find(_.name.equalsIgnoreCase(comp)).getOrElse(
            throw new IllegalArgumentException(
              s"$verb $table: no such field '$comp' in " +
                s"'${path.mkString(".")}' (fields: " +
                s"${st.fieldNames.mkString(", ")})"))
          canonical :+= f.name; cur = f.dataType
        case other =>
          throw new IllegalArgumentException(
            s"$verb $table: '$comp' in '${path.mkString(".")}' descends " +
              s"${other.sql} — only STRUCT fields, ARRAY elements " +
              "(via '.element.') and MAP values (via '.value.') evolve " +
              "metadata-only")
      }
    }
    cur match {
      case st: StructType => (canonical, st, path.last)
      case _: org.apache.spark.sql.types.ArrayType =>
        throw new IllegalArgumentException(
          s"$verb $table: '${path.dropRight(1).mkString(".")}' is an " +
            "ARRAY — address its element fields through '.element.'")
      case _: org.apache.spark.sql.types.MapType =>
        throw new IllegalArgumentException(
          s"$verb $table: '${path.dropRight(1).mkString(".")}' is a " +
            "MAP — address its value fields through '.value.'")
      case other => throw new IllegalArgumentException(
        s"$verb $table: '${path.dropRight(1).mkString(".")}' is " +
          s"${other.sql}, not a STRUCT")
    }
  }

  /** Rebuild the declared schema with the STRUCT at `parentPath`
    * (canonical components from [[parentAndLeaf]]) transformed.
    */
  private def rebuildAt(sch: StructType, parentPath: Seq[String])(
      f: StructType => StructType): StructType = {
    def go(t: org.apache.spark.sql.types.DataType,
        rest: Seq[String]): org.apache.spark.sql.types.DataType =
      (t, rest) match {
        case (st: StructType, Seq()) => f(st)
        case (at: org.apache.spark.sql.types.ArrayType, comps)
            if comps.head == "element" =>
          at.copy(elementType = go(at.elementType, comps.tail))
        case (mt: org.apache.spark.sql.types.MapType, comps)
            if comps.head == "value" =>
          mt.copy(valueType = go(mt.valueType, comps.tail))
        case (st: StructType, comps) =>
          StructType(st.fields.map(fl =>
            if (fl.name.equalsIgnoreCase(comps.head))
              fl.copy(dataType = go(fl.dataType, comps.tail))
            else fl).toIndexedSeq)
        case (other, _) => throw new IllegalStateException(
          s"rebuildAt: cannot descend ${other.sql} at $rest")
      }
    go(sch, parentPath).asInstanceOf[StructType]
  }

  /** The dotted schema-on-read state key for a nested field. */
  private def dottedKey(parentPath: Seq[String], leaf: String): String =
    (parentPath.map(_.toLowerCase) :+ leaf.toLowerCase).mkString(".")

  def exec(spark: SparkSession, sqlText: String): Unit =
    spark.sessionState.sqlParser.parsePlan(sqlText) match {
      case c: CreateTableAsSelect => createParsed(spark, c, sqlText)
      case a: AddColumns => addColumnsParsed(spark, a, sqlText)
      case d: DropColumns => dropColumnsParsed(spark, d)
      case r: RenameColumn => renameColumnParsed(spark, r)
      case _: RenameTable =>
        // table rename is already metadata-only in the session catalog
        // and carries TBLPROPERTIES (so the layout binding, key config,
        // schema-on-read mapping, validators, and index registry all
        // move with the entry); the external LOCATION stub is untouched
        spark.sql(sqlText)
        ()
      case ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns =>
        alterColumnsParsed(spark, ac)
      case other => throw new IllegalArgumentException(
        s"unsupported DDL: ${other.getClass.getSimpleName}")
    }

  /** `ALTER TABLE t ADD COLUMNS (...)` — Hudi's metadata-only schema
    * evolution (`hoodie.schema.on.read.enable`, reference py:54):
    * Spark's own ALTER widens the DECLARED catalog schema and no data
    * file is touched — at 100 TB the statement costs one catalog
    * write. Reads reconcile through [[Catalog.alignToDeclared]] (the
    * added column is a typed NULL until a write materializes it), and
    * every DML route accepts the column immediately: INSERT null-fills
    * it, UPDATE/MERGE assign it on the targeted rewrite region only.
    *
    * `DEFAULT <constant>` is accepted on layout-bound tables and is
    * metadata-only too: the constant's SQL is stored as
    * `graft.schema.default.<col>` and reads serve
    * `coalesce(c, default)` ([[Catalog.alignToDeclared]]) — the column
    * behaves as `NOT NULL DEFAULT`: pre-ADD rows AND null values both
    * read as the default, exactly like the typed-NULL widening but
    * with a constant. Non-constant defaults are rejected loudly (a
    * per-read-evaluated expression would give two readers two
    * different tables).
    */
  private def addColumnsParsed(spark: SparkSession, a: AddColumns,
      sqlText: String): Unit = {
    // an explicit `DEFAULT NULL` is equivalent to no default (pre-ADD
    // and absent cells read NULL anyway) — accepted, but no default
    // entry is stored, so it must be distinguished from a constant
    // that merely FAILS to cast (rejected loudly below)
    def isNullDefault(sql: String): Boolean = scala.util.Try(
      spark.range(1).select(org.apache.spark.sql.functions
        .expr(sql).as("v")).head().isNullAt(0)).getOrElse(false)
    a.columnsToAdd.foreach { c =>
      require(c.position.isEmpty,
        s"ALTER TABLE ADD COLUMNS: FIRST/AFTER on '${c.colName}' is not " +
          "supported — added columns append to the schema")
      c.path.foreach { _ =>
        // nested ADD (any struct depth, array<struct> elements via
        // '.element.'): no default (the coalesce read serves top-level
        // columns only), plain nullable
        require(c.default.isEmpty,
          s"ALTER TABLE ADD COLUMNS: DEFAULT on nested field " +
            s"'${c.name.mkString(".")}' is not supported")
        require(c.nullable,
          s"ALTER TABLE ADD COLUMNS: NOT NULL on nested field " +
            s"'${c.name.mkString(".")}' is not supported — pre-ADD rows " +
            "have no value for it")
      }
      // NOT NULL is only honorable when a non-null constant DEFAULT
      // backs it: data files are immutable, so pre-ADD rows can satisfy
      // the constraint only through the coalesce-to-default read — an
      // undefaulted NOT NULL column would serve NULLs while claiming it
      // can't, so reject it instead of silently declaring nullable
      require(c.nullable || c.default.exists(d => !isNullDefault(d.originalSQL)),
        s"ALTER TABLE ADD COLUMNS: '${c.colName}' NOT NULL needs a " +
          "non-null constant DEFAULT — pre-ADD rows in immutable files " +
          "have no value to satisfy the constraint otherwise")
      c.default.foreach { d =>
        require(d.child.foldable,
          s"ALTER TABLE ADD COLUMNS: DEFAULT on '${c.colName}' must be a " +
            s"constant expression (got: ${d.originalSQL}) — a " +
            "non-constant default would evaluate per read")
        // the constant must actually be servable AT THE COLUMN'S TYPE:
        // a mismatched default would otherwise throw on every later
        // read (ANSI cast) or silently serve NULL — probe it now
        val servable = isNullDefault(d.originalSQL) || scala.util.Try(
          !spark.range(1).select(org.apache.spark.sql.functions
            .expr(d.originalSQL).cast(c.dataType).as("v"))
            .head().isNullAt(0)).getOrElse(false)
        require(servable,
          s"ALTER TABLE ADD COLUMNS: DEFAULT ${d.originalSQL} does not " +
            s"cast to ${c.dataType.sql} for column '${c.colName}'")
      }
    }
    // one statement declaring a column twice would pass the
    // vs-existing-schema check and then die INSIDE replaceEntry's
    // drop+create, losing the whole catalog entry — reject up front
    val newLower = a.columnsToAdd.map(_.name.mkString(".").toLowerCase)
    require(newLower.distinct.size == newLower.size,
      s"ALTER TABLE ADD COLUMNS: duplicate column in " +
        s"(${a.columnsToAdd.map(_.name.mkString(".")).mkString(", ")})")
    // a name physically retired by DROP / RENAME may still live in data
    // files — re-declaring it would resurrect the old values on read.
    // Top-level names check against the PLAIN mapping only (a nested
    // rename's bare sub-name must not block an unrelated top-level add);
    // nested names check the dotted entries under their parent.
    val table = alterTarget(a.table)
    val allRenames = Catalog.renamesOf(spark, table)
    val allDropped = Catalog.droppedOf(spark, table)
    val retired = allDropped.filterNot(_.contains('.')) ++
      allRenames.filterNot(_._1.contains('.')).values.map(_.toLowerCase)
    val retiredNested = allDropped.filter(_.contains('.')) ++
      allRenames.collect { case (k, v) if k.contains('.') =>
        k.substring(0, k.lastIndexOf('.') + 1) + v.toLowerCase }
    a.columnsToAdd.find { c =>
      if (c.path.isEmpty) retired(c.colName.toLowerCase)
      else retiredNested(c.name.mkString(".").toLowerCase)
    }.foreach(c => throw new IllegalArgumentException(
      s"ALTER TABLE $table ADD COLUMNS: '${c.name.mkString(".")}' is a " +
        "retired physical column name (dropped or renamed-from) still " +
        "present in data files — adding it would resurrect the old " +
        "values; choose another name"))
    val (nested, top) = a.columnsToAdd.partition(_.path.isDefined)
    val withDefaults = top.filter(_.default.isDefined)
    if (withDefaults.isEmpty && nested.isEmpty) {
      spark.sql(sqlText)
      ()
    } else {
      // defaults and nested fields are served by the layout read's
      // declared-schema reconcile — a plain parquet table has no such
      // layer
      requireLayout(spark, table,
        if (nested.nonEmpty) "ADD COLUMNS (struct field)"
        else "ADD COLUMNS ... DEFAULT")
      val sch = spark.table(table).schema
      top.map(_.colName)
        .find(n => sch.fields.exists(_.name.equalsIgnoreCase(n)))
        .foreach(n => throw new IllegalArgumentException(
          s"ALTER TABLE $table ADD COLUMNS: column '$n' already exists"))
      // NOT NULL is honored SEMANTICALLY when a non-null default backs
      // it (the guard above): the coalesce-to-default read never serves
      // NULL. The catalog field itself stays nullable — Spark's v1
      // session catalog normalizes external-table fields to nullable on
      // the round-trip, so declaring false here would not persist
      val appendedTop = sch.fields.toIndexedSeq ++
        top.map(c => org.apache.spark.sql.types.StructField(
          c.colName, c.dataType, nullable = true))
      // nested adds rebuild their parent struct at ANY depth (declared
      // only — files are untouched; reads serve the new subfield as a
      // typed NULL, inside array elements via the transform() rebuild)
      val appended = nested.foldLeft(StructType(appendedTop)) { (s, c) =>
        val (parentPath, parentSt, leaf) = parentAndLeaf(table,
          "ALTER TABLE ADD COLUMNS", s, c.name)
        require(!parentSt.fields.exists(_.name.equalsIgnoreCase(leaf)),
          s"ALTER TABLE $table ADD COLUMNS: field " +
            s"'${c.name.mkString(".")}' already exists")
        rebuildAt(s, parentPath)(st => StructType(st.fields.toIndexedSeq :+
          org.apache.spark.sql.types.StructField(leaf, c.dataType,
            nullable = true)))
      }
      // an explicit DEFAULT NULL stores NO default entry: it is the
      // nullable column's natural read already
      val defaults = Catalog.defaultsOf(spark, table) ++
        withDefaults.filter(c => !isNullDefault(c.default.get.originalSQL))
          .map(c => c.colName.toLowerCase -> c.default.get.originalSQL)
      writeSchemaState(spark, table, appended, allRenames, allDropped,
        defaults)
    }
  }

  /** `ALTER TABLE t DROP COLUMNS (c, ...)` — metadata-only, like ADD:
    * the declared schema narrows and the column's PHYSICAL name is
    * tombstoned in `graft.schema.dropped`; data files are immutable and
    * never rewritten (at 100 TB the statement is one catalog write).
    * Reads project the physical column away
    * ([[Catalog.alignToDeclared]]); targeted DML rewrites drop it from
    * the file groups they touch as a side effect. Structural columns
    * (key / precombine / tieBreak / partition / indexed /
    * validator-referenced) are rejected loudly — they route rows and
    * gate commits, so dropping them cannot be metadata-only.
    */
  private def dropColumnsParsed(spark: SparkSession, d: DropColumns): Unit = {
    val table = alterTarget(d.table)
    val layout = requireLayout(spark, table, "DROP COLUMNS")
    val sch = spark.table(table).schema
    val (nestedNames, names) = d.columnsToDrop.map(_.name)
      .partition(_.length >= 2)
    val resolved = names.map(_.head).flatMap { n =>
      sch.fields.find(_.name.equalsIgnoreCase(n)) match {
        case some @ Some(_) => some
        case None if d.ifExists => None
        case None => throw new IllegalArgumentException(
          s"DROP COLUMNS $table: no such column '$n' " +
            s"(columns: ${sch.fieldNames.mkString(", ")})")
      }
    }
    val victims = resolved.map(_.name.toLowerCase).toSet
    // nested drops resolve (canonical parent path, parent struct,
    // leaf) at ANY depth; IF EXISTS tolerates a missing LEAF, a
    // missing/mis-shaped path is always loud (the statement is
    // addressing something else entirely). A nested drop whose
    // top-level column is itself a victim is subsumed by it.
    val resolvedNested = nestedNames
      .filterNot(p => victims(p.head.toLowerCase)).flatMap { path =>
        val (parentPath, parentSt, leafName) =
          parentAndLeaf(table, "DROP COLUMNS", sch, path)
        parentSt.fields.find(_.name.equalsIgnoreCase(leafName)) match {
          case Some(sf) => Some((parentPath, parentSt, sf))
          case None if d.ifExists => None
          case None => throw new IllegalArgumentException(
            s"DROP COLUMNS $table: no such field '${path.mkString(".")}' " +
              s"(fields: ${parentSt.fieldNames.mkString(", ")})")
        }
      }
    if (resolved.isEmpty && resolvedNested.isEmpty) return
    val prot = protectedColumns(spark, table, layout)
    resolved.foreach(f => prot.get(f.name.toLowerCase).foreach(reason =>
      throw new IllegalArgumentException(
        s"DROP COLUMNS $table: '${f.name}' is $reason — structural " +
          "columns cannot be dropped metadata-only")))
    resolvedNested.groupBy(_._1).foreach { case (parentPath, subs) =>
      require(subs.size < subs.head._2.fields.length,
        s"DROP COLUMNS $table: dropping every field of " +
          s"'${parentPath.mkString(".")}' would leave an empty struct — " +
          "drop the column itself instead")
    }
    val renames = Catalog.renamesOf(spark, table)
    val physNames = resolved.map(f =>
      renames.getOrElse(f.name.toLowerCase, f.name).toLowerCase)
    // dropping a struct column wholesale retires its dotted state too —
    // the entries are unreachable once the parent is projected away;
    // same for state strictly BENEATH a dropped nested field
    val nestedVictims = resolvedNested
      .map { case (pp, _, sf) => dottedKey(pp, sf.name) }.toSet
    val dottedUnderVictims = (k: String) =>
      k.contains('.') && (victims(k.takeWhile(_ != '.')) ||
        nestedVictims.exists(v => k.startsWith(v + ".")))
    // nested drop: tombstone the leaf's PHYSICAL name under the
    // parent's logical path (alignToDeclared prunes it after the
    // top-level rename pass)
    val nestedTombstones = resolvedNested.map { case (pp, _, sf) =>
      (pp.map(_.toLowerCase) :+
        renames.getOrElse(dottedKey(pp, sf.name), sf.name).toLowerCase)
        .mkString(".")
    }
    val topDropped = StructType(
      sch.fields.filterNot(f => victims(f.name.toLowerCase)).toIndexedSeq)
    val newSchema = resolvedNested.groupBy(_._1)
      .foldLeft(topDropped) { case (s, (parentPath, group)) =>
        val gone = group.map(_._3.name.toLowerCase).toSet
        rebuildAt(s, parentPath)(st => StructType(
          st.fields.filterNot(f => gone(f.name.toLowerCase)).toIndexedSeq))
      }
    writeSchemaState(spark, table, newSchema,
      (renames -- victims -- nestedVictims).filterNot(e => dottedUnderVictims(e._1)),
      Catalog.droppedOf(spark, table).filterNot(dottedUnderVictims) ++
        physNames ++ nestedTombstones,
      Catalog.defaultsOf(spark, table) -- victims)
  }

  /** `ALTER TABLE t RENAME COLUMN a TO b` — metadata-only via a name
    * mapping (Iceberg's name mapping / Hudi's schema-on-read rename):
    * the declared schema renames the field and `graft.schema.renames`
    * records logical `b` → physical `a`. Files are never rewritten and
    * WRITES keep using the physical name forever
    * ([[Catalog.toPhysical]]) so a snapshot never mixes two spellings
    * of one column across files; reads rename physical → logical
    * ([[Catalog.alignToDeclared]]). Structural columns are rejected
    * (they route rows / gate commits under their physical names), as is
    * a new name that collides with a declared column or a retired
    * physical name still present in files.
    */
  private def renameColumnParsed(spark: SparkSession,
      r: RenameColumn): Unit = {
    val table = alterTarget(r.table)
    val layout = requireLayout(spark, table, "RENAME COLUMN")
    val sch = spark.table(table).schema
    if (r.column.name.length >= 2) {
      renameNestedParsed(spark, table, sch, r.column.name, r.newName)
      return
    }
    val oldName = r.column.name.head
    // a struct column carrying nested schema state cannot itself be
    // renamed: its dotted mapping/tombstone keys are addressed by this
    // logical name, and rekeying them atomically with the rename is
    // not worth the matrix — evolve subfields OR rename the parent,
    // not both
    val dottedState = (Catalog.renamesOf(spark, table).keySet ++
      Catalog.droppedOf(spark, table))
      .exists(_.startsWith(oldName.toLowerCase + "."))
    require(!dottedState,
      s"RENAME COLUMN $table: '$oldName' carries nested schema-on-read " +
        "state (subfield renames/drops) — renaming the parent is not " +
        "supported; create a new column and migrate instead")
    val fld = sch.fields.find(_.name.equalsIgnoreCase(oldName)).getOrElse(
      throw new IllegalArgumentException(
        s"RENAME COLUMN $table: no such column '$oldName' " +
          s"(columns: ${sch.fieldNames.mkString(", ")})"))
    protectedColumns(spark, table, layout).get(fld.name.toLowerCase)
      .foreach(reason => throw new IllegalArgumentException(
        s"RENAME COLUMN $table: '${fld.name}' is $reason — structural " +
          "columns cannot be renamed metadata-only"))
    val newName = r.newName
    require(!sch.fields.exists(_.name.equalsIgnoreCase(newName)),
      s"RENAME COLUMN $table: column '$newName' already exists")
    val renames = Catalog.renamesOf(spark, table)
    val phys = renames.getOrElse(fld.name.toLowerCase, fld.name)
    // renaming back to the column's OWN physical name is the collapse
    // case — only OTHER retired physicals collide. Plain entries only:
    // a nested mapping's bare sub-name lives inside its struct and
    // cannot collide with a top-level name.
    val retired = Catalog.droppedOf(spark, table).filterNot(_.contains('.')) ++
      renames.filterNot(_._1.contains('.')).values.map(_.toLowerCase) -
      phys.toLowerCase
    require(!retired(newName.toLowerCase),
      s"RENAME COLUMN $table: '$newName' is a retired physical column " +
        "name (dropped or renamed-from) still present in data files — " +
        "writes under it would collide; choose another name")
    // UNDECLARED physical columns flow through reads (schema-on-read is
    // append-only) — a logical name shadowing one would serve the wrong
    // column's data, and toPhysical would write duplicate columns
    val physicalNow = scala.util.Try(
      Catalog.readPhysical(spark, table).columns.toSeq).getOrElse(Nil)
    require(!physicalNow.exists(c => c.equalsIgnoreCase(newName) &&
        !c.equalsIgnoreCase(phys)),
      s"RENAME COLUMN $table: data files already carry a column " +
        s"'$newName' (undeclared, flowing through schema-on-read) — " +
        "the new name would shadow it; choose another name")
    // renaming BACK to the physical name collapses the mapping
    val newRenames = (renames - fld.name.toLowerCase) ++
      (if (newName.equalsIgnoreCase(phys)) Nil
       else Seq(newName.toLowerCase -> phys))
    val newSchema = StructType(sch.fields.map(f =>
      if (f.name == fld.name) f.copy(name = newName) else f).toIndexedSeq)
    // a default follows its column's LOGICAL name through the rename
    val defaults = Catalog.defaultsOf(spark, table)
    val movedDefaults = defaults.get(fld.name.toLowerCase) match {
      case Some(d) => defaults - fld.name.toLowerCase + (newName.toLowerCase -> d)
      case None => defaults
    }
    writeSchemaState(spark, table, newSchema, newRenames,
      Catalog.droppedOf(spark, table), movedDefaults)
  }

  /** Nested RENAME (one struct level): the same name-mapping trick as
    * the top level, scoped inside the parent — `graft.schema.renames`
    * gains `parent.newlower -> oldPhysicalSub`, writes keep using the
    * physical sub-name forever ([[Catalog.toPhysical]]'s nested pass),
    * reads map it back ([[Catalog.reconcileNested]]). The parent's
    * own name must be stable (renaming a parent with nested state is
    * rejected above), so the dotted keys never dangle.
    */
  private def renameNestedParsed(spark: SparkSession, table: String,
      sch: StructType, path: Seq[String], newName: String): Unit = {
    val (parentPath, st, leafName) =
      parentAndLeaf(table, "RENAME COLUMN", sch, path)
    val sub = st.fields.find(_.name.equalsIgnoreCase(leafName)).getOrElse(
      throw new IllegalArgumentException(
        s"RENAME COLUMN $table: no such field '${path.mkString(".")}' " +
          s"(fields: ${st.fieldNames.mkString(", ")})"))
    require(!st.fields.exists(_.name.equalsIgnoreCase(newName)),
      s"RENAME COLUMN $table: field " +
        s"'${(parentPath :+ newName).mkString(".")}' already exists")
    val renames = Catalog.renamesOf(spark, table)
    val ppLower = parentPath.map(_.toLowerCase).mkString(".")
    val oldKey = dottedKey(parentPath, sub.name)
    // a field carrying dotted state strictly BENEATH it cannot itself
    // be renamed — its descendants' keys are addressed through this
    // logical name (same rule as the top level)
    val deeperState = (renames.keySet ++ Catalog.droppedOf(spark, table))
      .exists(_.startsWith(oldKey + "."))
    require(!deeperState,
      s"RENAME COLUMN $table: '${path.mkString(".")}' carries nested " +
        "schema-on-read state beneath it — renaming an ancestor is not " +
        "supported; create a new column and migrate instead")
    val phys = renames.getOrElse(oldKey, sub.name)
    // other retired sub-physicals DIRECTLY under this parent collide;
    // renaming back to the field's own physical name collapses the
    // mapping
    def directChild(k: String): Option[String] =
      if (k.startsWith(ppLower + ".") &&
          !k.drop(ppLower.length + 1).contains('.'))
        Some(k.drop(ppLower.length + 1))
      else None
    val retired = Catalog.droppedOf(spark, table).flatMap(directChild) ++
      renames.collect { case (k, v) if directChild(k).nonEmpty =>
        v.toLowerCase } - phys.toLowerCase
    require(!retired(newName.toLowerCase),
      s"RENAME COLUMN $table: '${(parentPath :+ newName).mkString(".")}' " +
        "is a retired physical field name (dropped or renamed-from) " +
        "still present in data files — choose another name")
    // undeclared physical subfields flow through reads — a logical name
    // shadowing one would serve the wrong field's data. Navigate the
    // PHYSICAL schema along the same path (intermediates keep their
    // logical names: renaming an ancestor with state is rejected above)
    val physicalSubs = scala.util.Try {
      var cur: org.apache.spark.sql.types.DataType =
        Catalog.readPhysical(spark, table).schema
      parentPath.foreach { comp =>
        cur = cur match {
          case at: org.apache.spark.sql.types.ArrayType
              if comp == "element" => at.elementType
          case s: StructType =>
            s.fields.find(_.name.equalsIgnoreCase(comp)).map(_.dataType)
              .getOrElse(org.apache.spark.sql.types.NullType)
          case _ => org.apache.spark.sql.types.NullType
        }
      }
      cur match {
        case s: StructType => s.fieldNames.toSeq
        case _ => Nil
      }
    }.getOrElse(Nil)
    require(!physicalSubs.exists(c => c.equalsIgnoreCase(newName) &&
        !c.equalsIgnoreCase(phys)),
      s"RENAME COLUMN $table: data files already carry a field " +
        s"'${(parentPath :+ newName).mkString(".")}' (undeclared, " +
        "flowing through schema-on-read) — the new name would shadow it")
    val newRenames = (renames - oldKey) ++
      (if (newName.equalsIgnoreCase(phys)) Nil
       else Seq(s"$ppLower.${newName.toLowerCase}" -> phys))
    val newSchema = rebuildAt(sch, parentPath)(s =>
      StructType(s.fields.map(f =>
        if (f.name == sub.name) f.copy(name = newName) else f).toIndexedSeq))
    writeSchemaState(spark, table, newSchema, newRenames,
      Catalog.droppedOf(spark, table), Catalog.defaultsOf(spark, table))
  }

  /** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` — the type half of
    * Hudi's schema-on-read evolution (`hoodie.schema.on.read.enable`,
    * reference py:54): the DECLARED type widens in the catalog and no
    * data file is touched — at 100 TB the statement is one catalog
    * write. Files keep their written (narrower) types forever; reads
    * reconcile in [[Catalog.alignToDeclared]], which casts a physical
    * column UP to its declared type — the same reconcile point that
    * serves ADDed columns as typed NULLs. New writes land at the wide
    * type (DML post-images are computed on the aligned frame), so a
    * table legitimately carries files at BOTH widths; per-commit scan
    * groups are uniform and the cross-commit unions widen by Spark's
    * own set-operation coercion.
    *
    * Only LOSSLESS widenings are accepted ([[isWidening]]): integral
    * up the byte→short→int→long chain, float→double, sub-int integrals
    * →float, sub-long→double, and decimal precision growth that keeps
    * every old value representable. Narrowing (or any lossy cast) is
    * rejected loudly — old files hold values the new type cannot
    * carry. Structural columns are rejected like DROP/RENAME: layouts
    * hash keys / compare precombines over the WRITTEN values, and
    * mixed-width files would route one logical key to two buckets.
    */
  private def alterColumnsParsed(spark: SparkSession,
      a: org.apache.spark.sql.catalyst.plans.logical.AlterColumns): Unit = {
    val table = alterTarget(a.table)
    val layout = requireLayout(spark, table, "ALTER COLUMN")
    val sch = spark.table(table).schema
    val prot = protectedColumns(spark, table, layout)
    val start = (sch.fields.toIndexedSeq, Catalog.defaultsOf(spark, table))
    val (updated, defaults) = a.specs.foldLeft(start) {
      case ((fields, defs), spec) if spec.column.name.length >= 2 =>
        // nested WIDEN (any struct depth, array<struct> elements via
        // '.element.'): same lossless gate, the declared schema
        // rebuilds with the wider leaf; reads cast up in
        // Catalog.reconcileNested's recursion
        require(spec.newDataType.isDefined && spec.newNullability.isEmpty &&
          spec.newComment.isEmpty && spec.newPosition.isEmpty &&
          spec.newDefaultExpression.isEmpty && !spec.dropDefault,
          s"ALTER COLUMN $table: only TYPE widening is supported on " +
            s"nested field '${spec.column.name.mkString(".")}'")
        val cur = StructType(fields.toIndexedSeq)
        val (parentPath, st, leafName) =
          parentAndLeaf(table, "ALTER COLUMN", cur, spec.column.name)
        val sub = st.fields.find(_.name.equalsIgnoreCase(leafName)).getOrElse(
          throw new IllegalArgumentException(
            s"ALTER COLUMN $table: no such field " +
              s"'${spec.column.name.mkString(".")}' (fields: " +
              s"${st.fieldNames.mkString(", ")})"))
        val to = spec.newDataType.get
        require(isWidening(sub.dataType, to),
          s"ALTER COLUMN $table: ${sub.dataType.sql} -> ${to.sql} on " +
            s"'${spec.column.name.mkString(".")}' is not a lossless " +
            "widening")
        (rebuildAt(cur, parentPath)(s => StructType(s.fields.map(f =>
          if (f.name == sub.name) f.copy(dataType = to) else f)
          .toIndexedSeq)).fields.toIndexedSeq, defs)
      case ((fields, defs), spec) =>
        require(spec.column.name.length == 1,
          s"ALTER COLUMN $table: '${spec.column.name.mkString(".")}' " +
            "nests more than one struct level — only top-level struct " +
            "fields evolve metadata-only")
        val colName = spec.column.name.head
        val idx = fields.indexWhere(_.name.equalsIgnoreCase(colName))
        require(idx >= 0,
          s"ALTER COLUMN $table: no such column '$colName' " +
            s"(columns: ${fields.map(_.name).mkString(", ")})")
        val fld = fields(idx)
        if (spec.dropDefault) {
          // ALTER COLUMN c DROP DEFAULT — metadata-only like the ADD:
          // absent/NULL cells go back to reading NULL
          require(spec.newDataType.isEmpty && spec.newNullability.isEmpty &&
            spec.newComment.isEmpty && spec.newPosition.isEmpty &&
            spec.newDefaultExpression.isEmpty,
            s"ALTER COLUMN $table: DROP DEFAULT cannot combine with " +
              "other column changes")
          (fields, defs - fld.name.toLowerCase)
        } else {
          require(spec.newDataType.isDefined && spec.newNullability.isEmpty &&
            spec.newComment.isEmpty && spec.newPosition.isEmpty &&
            spec.newDefaultExpression.isEmpty,
            s"ALTER COLUMN $table: only TYPE widening and DROP DEFAULT " +
              "are supported (nullability/comment/position/default " +
              "changes are not metadata-only over immutable files)")
          prot.get(fld.name.toLowerCase).foreach(reason =>
            throw new IllegalArgumentException(
              s"ALTER COLUMN $table: '${fld.name}' is $reason — layouts " +
                "route and version rows by the WRITTEN values, so its " +
                "type cannot change metadata-only"))
          val to = spec.newDataType.get
          require(isWidening(fld.dataType, to),
            s"ALTER COLUMN $table: ${fld.dataType.sql} -> ${to.sql} is not " +
              "a lossless widening — data files are immutable and keep " +
              "their written types; only INT->BIGINT-style up-casts, " +
              "FLOAT->DOUBLE, and DECIMAL precision growth are metadata-only")
          (fields.updated(idx, fld.copy(dataType = to)), defs)
        }
    }
    writeSchemaState(spark, table, StructType(updated),
      Catalog.renamesOf(spark, table), Catalog.droppedOf(spark, table),
      defaults)
  }

  /** Lossless type widenings: every value representable in `from` is
    * exactly representable in `to`. Deliberately NARROWER than Spark's
    * `Cast.canUpCast` (which admits long→float/double — lossy past
    * 2^24/2^53): the declared type must be able to serve every value an
    * immutable file already holds, bit-exactly.
    */
  private[etl] def isWidening(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (ByteType | ShortType, FloatType | DoubleType) => true
      case (IntegerType, DoubleType) => true
      case (FloatType, DoubleType) => true
      case (f: DecimalType, t: DecimalType) =>
        t.precision - t.scale >= f.precision - f.scale &&
          t.scale >= f.scale && (t.precision > f.precision || t.scale > f.scale)
      case _ => false
    }
  }

  /** Persist a new declared schema + schema-on-read state as ONE
    * catalog-entry replacement (all other `graft.*` props carried
    * over verbatim). `defaults` is the FINAL defaults map — callers
    * thread it through so DROP retires a dropped column's default and
    * RENAME moves it under the new logical name.
    */
  private def writeSchemaState(spark: SparkSession, table: String,
      schema: StructType, renames: Map[String, String],
      dropped: Set[String], defaults: Map[String, String]): Unit = {
    val base = Catalog.graftProps(spark, table)
      .filterNot { case (k, _) =>
        k == "graft.schema.renames" || k == "graft.schema.dropped" ||
          k.startsWith("graft.schema.default.")
      }
    val mapping =
      (if (renames.isEmpty) Map.empty[String, String]
       else Map("graft.schema.renames" -> renames.toSeq.sorted
         .map { case (l, p) => s"$l:$p" }.mkString(";"))) ++
      (if (dropped.isEmpty) Map.empty[String, String]
       else Map("graft.schema.dropped" -> dropped.toSeq.sorted.mkString(","))) ++
      defaults.map { case (c, d) => s"graft.schema.default.$c" -> d }
    Catalog.replaceEntry(spark, table, schema, base ++ mapping)
  }

  private def alterTarget(plan: LogicalPlan): String =
    plan.collectFirst { case t: UnresolvedTable =>
      t.multipartIdentifier.mkString(".")
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot resolve ALTER TABLE target from ${plan.getClass.getSimpleName}"))

  private def requireLayout(spark: SparkSession, table: String,
      what: String): (String, String) =
    Catalog.layoutOf(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"$what $table: metadata-only schema evolution needs a " +
          "layout-bound table (the schema-on-read reconcile lives in " +
          "the layout read; plain parquet tables have no such layer)"))

  /** Columns DROP/RENAME must refuse, with the reason: they route rows
    * to buckets/files/partitions, version them, serve index lookups, or
    * appear in table-declared validators — all under their PHYSICAL
    * names, so a metadata-only remap would silently break routing.
    */
  private def protectedColumns(spark: SparkSession, table: String,
      layout: (String, String)): Map[String, String] = {
    val (kind, path) = layout
    val (keys, pc, tieBreak) = Catalog.upsertConfigFull(spark, table)
    val structural =
      keys.map(_ -> "a primary-key column") ++
      Seq(pc -> "the precombine column") ++
      tieBreak.map(_ -> "a tieBreak column") ++
      (if (kind == "partitioned")
        PartitionedTable.props(path).partitionCols
          .map(_ -> "a partition column")
       else Nil) ++
      Catalog.secondaryIndexesOf(spark, table)
        .flatMap(_._1.map(_ -> "a secondary-indexed column")) ++
      Catalog.statsIndexOf(spark, table).toSeq.flatMap { statsPath =>
        // both plain stats columns and the columns a functional
        // entry's expression references: the index maintenance
        // evaluates these over physical frames, and a remap would
        // brick every stats-routed SELECT on the next sync
        StatsIndex.entries(statsPath).flatMap { e =>
          scala.util.Try(
            spark.sessionState.sqlParser.parseExpression(e.sqlExpr)
              .collect { case a: UnresolvedAttribute => a.nameParts.last })
            .getOrElse(Seq(e.name))
            .map(_ -> "covered by the column-stats index")
        }
      } ++
      Catalog.graftProps(spark, table).toSeq.collect {
        case (k, v) if k.startsWith("graft.table.validator.") =>
          spark.sessionState.sqlParser.parseExpression(v).collect {
            case a: UnresolvedAttribute => a.nameParts.last ->
              ("referenced by validator '" +
                k.stripPrefix("graft.table.validator.") + "'")
          }
      }.flatten
    structural.map { case (n, r) => n.toLowerCase -> r }.toMap
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
          case "mor" =>
            // the CTAS batch becomes base version 0; later DML appends
            // delta logs through the MOR routes
            MorTable.create(df, path, keys, precombine, tieBreak)
            Catalog.registerLayoutTable(spark, name, "mor", path)
          case other => throw new IllegalArgumentException(
            s"unknown layout kind '$other' on $name " +
              "(expected bucket | bloom | partitioned | timeline | mor)")
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
