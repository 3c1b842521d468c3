package graft.etl

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties}

/** Model-based ScalaCheck over metadata-only schema evolution: an
  * arbitrary interleaving of SQL INSERTs, predicate UPDATEs, and
  * `ALTER TABLE ADD / RENAME / DROP / WIDEN COLUMN` — at the TOP level
  * and one struct level down (the fixed struct column `m`'s subfields
  * evolve through the same four shapes) — against a bucket-backed
  * catalog table must agree with a driver-side model after EVERY step.
  * This pins the interactions the example-based specs cannot
  * enumerate: update-through-rename-through-drop chains, predicates on
  * freshly-added (physically absent) columns taking the scan-all
  * selection fallback, writes landing under stable physical names
  * (sub-names included) while the logical schema keeps shifting, TYPE
  * widenings leaving older files at their written width while newer
  * commits land wide, mixed-shape structs reconciling in declared
  * order, and reads reconciling all of it per ALTER history.
  *
  * Determinism: precombine strictly increases per statement, every
  * batch carries distinct keys, and all values are integral (exact in
  * every numeric width used) — so the model needs no tie-break,
  * rounding, or width reasoning: it tracks plain doubles and the check
  * casts the engine's columns to double.
  */
object SchemaEvolutionProps extends Properties("SchemaEvolution") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    // 6 scenarios per layout in the default suite; SPARK_GRAFT_STRESS
    // widens the sweep for dedicated hunts (same knob as the
    // concurrency stress specs)
    p.withMinSuccessfulTests(
      sys.env.get("SPARK_GRAFT_STRESS").map(_ => 20).getOrElse(6))

  private lazy val spark = SparkSpec.session

  // one evolving-schema operation; column indices are resolved against
  // the LIVE logical column list at apply time (modulo its size), so a
  // generated sequence is always applicable
  private sealed trait Op
  private case class Insert(keys: List[Long]) extends Op
  private case class Update(colIdx: Int, mult: Long, condIdx: Int,
      threshold: Long) extends Op
  private case class AddCol(asInt: Boolean, default: Option[Long]) extends Op
  private case class RenameCol(colIdx: Int) extends Op
  private case class DropCol(colIdx: Int) extends Op
  private case class WidenCol(colIdx: Int, toDouble: Boolean) extends Op
  // one-level struct evolution: the same four shapes applied to the
  // subfields of the fixed struct column `m`
  private case class NestedAdd(asInt: Boolean) extends Op
  private case class NestedRename(subIdx: Int) extends Op
  private case class NestedDrop(subIdx: Int) extends Op
  private case class NestedWiden(subIdx: Int, toDouble: Boolean) extends Op
  // DEPTH-2 struct evolution (the fixed struct `m.d`'s subfields) and
  // array<struct> ELEMENT evolution (the fixed array column `els`) —
  // the same four shapes through recursive paths
  private case class DeepAdd(asInt: Boolean) extends Op
  private case class DeepRename(subIdx: Int) extends Op
  private case class DeepDrop(subIdx: Int) extends Op
  private case class DeepWiden(subIdx: Int, toDouble: Boolean) extends Op
  private case class ArrAdd(asInt: Boolean) extends Op
  private case class ArrRename(subIdx: Int) extends Op
  private case class ArrDrop(subIdx: Int) extends Op
  private case class ArrWiden(subIdx: Int, toDouble: Boolean) extends Op
  // map<string, struct> VALUE evolution (the fixed single-entry map
  // column `mp`, addressed via '.value.' — keys never evolve)
  private case class MapAdd(asInt: Boolean) extends Op
  private case class MapRename(subIdx: Int) extends Op
  private case class MapDrop(subIdx: Int) extends Op
  private case class MapWiden(subIdx: Int, toDouble: Boolean) extends Op

  private val op: Gen[Op] = Gen.frequency(
    4 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 15L)).map(ks => Insert(ks.distinct)),
    4 -> (for {
      c <- Gen.chooseNum(0, 7); m <- Gen.chooseNum(2L, 9L)
      pc <- Gen.chooseNum(0, 8); t <- Gen.chooseNum(0L, 14L)
    } yield Update(c, m, pc, t)),
    2 -> (for {
      asInt <- Gen.oneOf(true, false)
      d <- Gen.option(Gen.chooseNum(1L, 99L))
    } yield AddCol(asInt, d)),
    2 -> Gen.chooseNum(0, 7).map(RenameCol(_)),
    1 -> Gen.chooseNum(0, 7).map(DropCol(_)),
    2 -> (for {
      c <- Gen.chooseNum(0, 7); d <- Gen.oneOf(true, false)
    } yield WidenCol(c, d)),
    1 -> Gen.oneOf(true, false).map(NestedAdd(_)),
    1 -> Gen.chooseNum(0, 7).map(NestedRename(_)),
    1 -> Gen.chooseNum(0, 7).map(NestedDrop(_)),
    1 -> (for {
      c <- Gen.chooseNum(0, 7); d <- Gen.oneOf(true, false)
    } yield NestedWiden(c, d)),
    1 -> Gen.oneOf(true, false).map(DeepAdd(_)),
    1 -> Gen.chooseNum(0, 7).map(DeepRename(_)),
    1 -> Gen.chooseNum(0, 7).map(DeepDrop(_)),
    1 -> (for {
      c <- Gen.chooseNum(0, 7); d <- Gen.oneOf(true, false)
    } yield DeepWiden(c, d)),
    1 -> Gen.oneOf(true, false).map(ArrAdd(_)),
    1 -> Gen.chooseNum(0, 7).map(ArrRename(_)),
    1 -> Gen.chooseNum(0, 7).map(ArrDrop(_)),
    1 -> (for {
      c <- Gen.chooseNum(0, 7); d <- Gen.oneOf(true, false)
    } yield ArrWiden(c, d)),
    1 -> Gen.oneOf(true, false).map(MapAdd(_)),
    1 -> Gen.chooseNum(0, 7).map(MapRename(_)),
    1 -> Gen.chooseNum(0, 7).map(MapDrop(_)),
    1 -> (for {
      c <- Gen.chooseNum(0, 7); d <- Gen.oneOf(true, false)
    } yield MapWiden(c, d)))

  private val scenario: Gen[(List[Long], List[Op])] = for {
    first <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 15L)).map(_.distinct)
    n <- Gen.choose(3, 8)
    ops <- Gen.listOfN(n, op)
  } yield (first, ops)

  private var run = 0

  /** The whole scenario runner, parameterized by LAYOUT: the same
    * random interleaving must hold on the copy-on-write bucket path
    * (targeted generation rewrites) AND the merge-on-read path (every
    * statement an O(batch) delta-log append resolved by the snapshot
    * merge) — the two write disciplines reconcile schema-on-read at
    * different points, and only the property can sweep their
    * interaction space.
    */
  private def scenarioProp(layout: String)(
      first: List[Long], ops: List[Op]): Prop = {
      run += 1
      val table = s"schevo_prop_${layout}_$run"
      val path = java.nio.file.Files
        .createTempDirectory("schevo").toString + "/t"
      var pcTick = 0L
      var fresh = 0
      // model state: live logical value columns (insertion-ordered),
      // their declared SQL type, and per-key (pc, values by logical
      // column; None = NULL). Values are integral, exact in every
      // width, so widening never changes the model.
      var cols = Vector("v")
      var types = Map("v" -> "DOUBLE")
      // the struct column `m`'s live subfields, same bookkeeping; model
      // values live under "m." prefixed names
      var subs = Vector("s0")
      var subTypes = Map("s0" -> "DOUBLE")
      // depth-2: the fixed struct `m.d`'s subfields ("m.d." names);
      // array<struct>: the fixed one-element array `els`'s element
      // fields ("els." names — one element per row keeps the model flat)
      var deeps = Vector("t0")
      var deepTypes = Map("t0" -> "DOUBLE")
      var arrs = Vector("a0")
      var arrTypes = Map("a0" -> "DOUBLE")
      // map<string, struct> value fields ("mp." names — one fixed key
      // 'x' per row keeps the model flat, like the one-element array)
      var maps = Vector("p0")
      var mapTypes = Map("p0" -> "DOUBLE")
      // m's DECLARED field order (scalar subs interleaved with the
      // fixed nested struct 'd') — INSERT literals must follow it, the
      // same discipline a SQL user owes any struct-typed VALUES
      var mOrder = Vector("s0", "d")
      val rows = scala.collection.mutable.Map[Long, (Long, Map[String, Option[Double]])]()

      def seed(v: Long, k: Long, ci: Int): Double =
        (v * 16 + k + ci * 1000).toDouble
      def sqlLit(d: Double, tpe: String): String = tpe match {
        case "INT" => s"${d.toInt}"
        case "BIGINT" => s"${d.toLong}L"
        case _ => s"${d}D"
      }
      def structLit(k: Long): String =
        "named_struct(" + mOrder.map {
          case "d" =>
            "'d', named_struct(" + deeps.zipWithIndex.map { case (c, i) =>
              s"'$c', ${sqlLit(seed(pcTick, k, 200 + i), deepTypes(c))}"
            }.mkString(", ") + ")"
          case c =>
            s"'$c', ${sqlLit(seed(pcTick, k, 100 + subs.indexOf(c)), subTypes(c))}"
        }.mkString(", ") + ")"
      def arrLit(k: Long): String =
        "array(named_struct(" + arrs.zipWithIndex.map { case (c, i) =>
          s"'$c', ${sqlLit(seed(pcTick, k, 300 + i), arrTypes(c))}"
        }.mkString(", ") + "))"
      def mapLit(k: Long): String =
        "map('x', named_struct(" + maps.zipWithIndex.map { case (c, i) =>
          s"'$c', ${sqlLit(seed(pcTick, k, 400 + i), mapTypes(c))}"
        }.mkString(", ") + "))"
      def insert(keys: List[Long]): Unit = {
        pcTick += 1
        val colList = ("k" +: "pc" +: cols :+ "m" :+ "els" :+ "mp")
          .mkString(", ")
        val values = keys.map(k => s"(${k}L, ${pcTick}L, " +
          cols.zipWithIndex.map { case (c, i) =>
            sqlLit(seed(pcTick, k, i), types(c))
          }.mkString(", ") + s", ${structLit(k)}, ${arrLit(k)}, ${mapLit(k)})")
          .mkString(", ")
        SqlMerge.exec(spark, s"INSERT INTO $table ($colList) VALUES $values")
        keys.foreach(k => rows(k) = (pcTick,
          cols.zipWithIndex.map { case (c, i) =>
            c -> Some(seed(pcTick, k, i))
          }.toMap ++ subs.zipWithIndex.map { case (c, i) =>
            s"m.$c" -> Some(seed(pcTick, k, 100 + i))
          }.toMap ++ deeps.zipWithIndex.map { case (c, i) =>
            s"m.d.$c" -> Some(seed(pcTick, k, 200 + i))
          }.toMap ++ arrs.zipWithIndex.map { case (c, i) =>
            s"els.$c" -> Some(seed(pcTick, k, 300 + i))
          }.toMap ++ maps.zipWithIndex.map { case (c, i) =>
            s"mp.$c" -> Some(seed(pcTick, k, 400 + i))
          }.toMap))
      }

      // create through the SQL front door, then evolve
      val firstRows = first.map(k =>
        s"(${k}L, 0L, ${seed(0, k, 0)}D, ${seed(0, k, 100)}D, " +
          s"${seed(0, k, 200)}D, ${seed(0, k, 300)}D, ${seed(0, k, 400)}D)")
        .mkString(", ")
      SqlDdl.exec(spark,
        s"""CREATE TABLE $table TBLPROPERTIES (
           |  'graft.table.layout' = '$layout',
           |  'graft.table.path' = '$path',
           |  'graft.table.primaryKey' = 'k',
           |  'graft.table.preCombineField' = 'pc',
           |  'graft.table.numBuckets' = '4')
           |AS SELECT k, pc, v,
           |  named_struct('s0', s0, 'd', named_struct('t0', t0)) AS m,
           |  array(named_struct('a0', a0)) AS els,
           |  map('x', named_struct('p0', p0)) AS mp
           |FROM VALUES $firstRows AS t(k, pc, v, s0, t0, a0, p0)""".stripMargin)
      first.foreach(k => rows(k) = (0L,
        Map("v" -> Some(seed(0, k, 0)), "m.s0" -> Some(seed(0, k, 100)),
          "m.d.t0" -> Some(seed(0, k, 200)),
          "els.a0" -> Some(seed(0, k, 300)),
          "mp.p0" -> Some(seed(0, k, 400)))))

      def check(after: String): Prop = {
        import org.apache.spark.sql.functions.col
        // cast every value column to double so the model never reasons
        // about widths; the declared-type plumbing itself is pinned by
        // the engine accepting the typed literals/updates above
        import org.apache.spark.sql.functions.element_at
        val flat = cols.map(c => c -> col(c)) ++
          subs.map(c => s"m.$c" -> col(s"m.$c")) ++
          deeps.map(c => s"m.d.$c" -> col(s"m.d.$c")) ++
          arrs.map(c => s"els.$c" -> col("els").getItem(0).getField(c)) ++
          maps.map(c => s"mp.$c" ->
            element_at(col("mp"), "x").getField(c))
        val frame = Catalog.readTable(spark, table).select(
          col("k") +: col("pc") +:
            flat.map { case (n, c) => c.cast("double").as(n) }: _*)
        val got = frame.collect().map { r =>
          val k = r.getLong(r.fieldIndex("k"))
          k -> (r.getLong(r.fieldIndex("pc")),
            flat.map(_._1).map(c => c -> (if (r.isNullAt(r.fieldIndex(c))) None
              else Some(r.getDouble(r.fieldIndex(c))))).toMap)
        }.toMap
        val want = rows.toMap
        Prop(got == want) :| s"after $after:\n  got  $got\n  want $want" :|
          s"cols=$cols types=$types subs=$subs subTypes=$subTypes"
      }

      val steps: Seq[Prop] = ops.map { o =>
        val applied: String = o match {
          case Insert(ks) =>
            insert(ks); s"INSERT(${ks.mkString(",")})"
          case Update(ci, m, pci, t) =>
            val target = cols(ci % cols.size)
            // predicate column: k (always live) or any logical column —
            // including freshly-added ones with no physical presence,
            // which must take the scan-all selection fallback
            val pred = ("k" +: cols)((pci % (cols.size + 1)))
            SqlMerge.exec(spark,
              s"UPDATE $table SET $target = CAST(k * $m AS ${types(target)}) " +
                s"WHERE $pred >= $t")
            rows.mapValuesInPlace { case (k, (pc, vs)) =>
              val hit =
                if (pred == "k") k >= t
                else vs(pred).exists(_ >= t) // NULL comparison: no hit
              (pc, if (hit) vs + (target -> Some((k * m).toDouble)) else vs)
            }
            s"UPDATE $target WHERE $pred>=$t *$m"
          case AddCol(asInt, default) =>
            fresh += 1
            val c = s"c$fresh"
            val tpe = if (asInt) "INT" else "DOUBLE"
            // a constant DEFAULT gives the column NOT-NULL-DEFAULT
            // semantics: every pre-ADD row reads the default
            val defSql = default.map(d =>
              if (asInt) s" DEFAULT $d" else s" DEFAULT $d.0").getOrElse("")
            SqlDdl.exec(spark,
              s"ALTER TABLE $table ADD COLUMNS ($c $tpe$defSql)")
            cols = cols :+ c
            types = types + (c -> tpe)
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs + (c -> default.map(_.toDouble)))
            }
            s"ADD $c $tpe$defSql"
          case RenameCol(ci) =>
            fresh += 1
            val from = cols(ci % cols.size); val to = s"c$fresh"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table RENAME COLUMN $from TO $to")
            cols = cols.updated(cols.indexOf(from), to)
            types = types - from + (to -> types(from))
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - from + (to -> vs(from)))
            }
            s"RENAME $from->$to"
          case DropCol(ci) if cols.size > 1 =>
            val victim = cols(ci % cols.size)
            SqlDdl.exec(spark, s"ALTER TABLE $table DROP COLUMNS ($victim)")
            cols = cols.filterNot(_ == victim)
            types = types - victim
            rows.mapValuesInPlace { case (_, (pc, vs)) => (pc, vs - victim) }
            s"DROP $victim"
          case DropCol(_) => "DROP skipped (last column)"
          case WidenCol(ci, toDouble) =>
            val target = cols(ci % cols.size)
            // INT widens (to BIGINT or DOUBLE); wider types have no
            // lossless widening in this model and skip
            if (types(target) == "INT") {
              val to = if (toDouble) "DOUBLE" else "BIGINT"
              SqlDdl.exec(spark,
                s"ALTER TABLE $table ALTER COLUMN $target TYPE $to")
              types = types + (target -> to)
              s"WIDEN $target INT->$to"
            } else s"WIDEN skipped ($target is ${types(target)})"
          case NestedAdd(asInt) =>
            fresh += 1
            val c = s"s$fresh"
            val tpe = if (asInt) "INT" else "DOUBLE"
            SqlDdl.exec(spark, s"ALTER TABLE $table ADD COLUMNS (m.$c $tpe)")
            subs = subs :+ c
            mOrder = mOrder :+ c
            subTypes = subTypes + (c -> tpe)
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs + (s"m.$c" -> None))
            }
            s"NESTED ADD m.$c $tpe"
          case NestedRename(si) =>
            fresh += 1
            val from = subs(si % subs.size); val to = s"s$fresh"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table RENAME COLUMN m.$from TO $to")
            subs = subs.updated(subs.indexOf(from), to)
            mOrder = mOrder.updated(mOrder.indexOf(from), to)
            subTypes = subTypes - from + (to -> subTypes(from))
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"m.$from" + (s"m.$to" -> vs(s"m.$from")))
            }
            s"NESTED RENAME m.$from->m.$to"
          case NestedDrop(si) if subs.size > 1 =>
            val victim = subs(si % subs.size)
            SqlDdl.exec(spark, s"ALTER TABLE $table DROP COLUMNS (m.$victim)")
            subs = subs.filterNot(_ == victim)
            mOrder = mOrder.filterNot(_ == victim)
            subTypes = subTypes - victim
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"m.$victim")
            }
            s"NESTED DROP m.$victim"
          case NestedDrop(_) => "NESTED DROP skipped (last subfield)"
          case NestedWiden(si, toDouble) =>
            val target = subs(si % subs.size)
            if (subTypes(target) == "INT") {
              val to = if (toDouble) "DOUBLE" else "BIGINT"
              SqlDdl.exec(spark,
                s"ALTER TABLE $table ALTER COLUMN m.$target TYPE $to")
              subTypes = subTypes + (target -> to)
              s"NESTED WIDEN m.$target INT->$to"
            } else s"NESTED WIDEN skipped (m.$target is ${subTypes(target)})"
          case DeepAdd(asInt) =>
            fresh += 1
            val c = s"t$fresh"
            val tpe = if (asInt) "INT" else "DOUBLE"
            SqlDdl.exec(spark, s"ALTER TABLE $table ADD COLUMNS (m.d.$c $tpe)")
            deeps = deeps :+ c
            deepTypes = deepTypes + (c -> tpe)
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs + (s"m.d.$c" -> None))
            }
            s"DEEP ADD m.d.$c $tpe"
          case DeepRename(si) =>
            fresh += 1
            val from = deeps(si % deeps.size); val to = s"t$fresh"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table RENAME COLUMN m.d.$from TO $to")
            deeps = deeps.updated(deeps.indexOf(from), to)
            deepTypes = deepTypes - from + (to -> deepTypes(from))
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"m.d.$from" + (s"m.d.$to" -> vs(s"m.d.$from")))
            }
            s"DEEP RENAME m.d.$from->m.d.$to"
          case DeepDrop(si) if deeps.size > 1 =>
            val victim = deeps(si % deeps.size)
            SqlDdl.exec(spark, s"ALTER TABLE $table DROP COLUMNS (m.d.$victim)")
            deeps = deeps.filterNot(_ == victim)
            deepTypes = deepTypes - victim
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"m.d.$victim")
            }
            s"DEEP DROP m.d.$victim"
          case DeepDrop(_) => "DEEP DROP skipped (last subfield)"
          case DeepWiden(si, toDouble) =>
            val target = deeps(si % deeps.size)
            if (deepTypes(target) == "INT") {
              val to = if (toDouble) "DOUBLE" else "BIGINT"
              SqlDdl.exec(spark,
                s"ALTER TABLE $table ALTER COLUMN m.d.$target TYPE $to")
              deepTypes = deepTypes + (target -> to)
              s"DEEP WIDEN m.d.$target INT->$to"
            } else s"DEEP WIDEN skipped (m.d.$target is ${deepTypes(target)})"
          case ArrAdd(asInt) =>
            fresh += 1
            val c = s"a$fresh"
            val tpe = if (asInt) "INT" else "DOUBLE"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table ADD COLUMNS (els.element.$c $tpe)")
            arrs = arrs :+ c
            arrTypes = arrTypes + (c -> tpe)
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs + (s"els.$c" -> None))
            }
            s"ARR ADD els.element.$c $tpe"
          case ArrRename(si) =>
            fresh += 1
            val from = arrs(si % arrs.size); val to = s"a$fresh"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table RENAME COLUMN els.element.$from TO $to")
            arrs = arrs.updated(arrs.indexOf(from), to)
            arrTypes = arrTypes - from + (to -> arrTypes(from))
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"els.$from" + (s"els.$to" -> vs(s"els.$from")))
            }
            s"ARR RENAME els.element.$from->$to"
          case ArrDrop(si) if arrs.size > 1 =>
            val victim = arrs(si % arrs.size)
            SqlDdl.exec(spark,
              s"ALTER TABLE $table DROP COLUMNS (els.element.$victim)")
            arrs = arrs.filterNot(_ == victim)
            arrTypes = arrTypes - victim
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"els.$victim")
            }
            s"ARR DROP els.element.$victim"
          case ArrDrop(_) => "ARR DROP skipped (last element field)"
          case ArrWiden(si, toDouble) =>
            val target = arrs(si % arrs.size)
            if (arrTypes(target) == "INT") {
              val to = if (toDouble) "DOUBLE" else "BIGINT"
              SqlDdl.exec(spark,
                s"ALTER TABLE $table ALTER COLUMN els.element.$target TYPE $to")
              arrTypes = arrTypes + (target -> to)
              s"ARR WIDEN els.element.$target INT->$to"
            } else s"ARR WIDEN skipped (els.$target is ${arrTypes(target)})"
          case MapAdd(asInt) =>
            fresh += 1
            val c = s"p$fresh"
            val tpe = if (asInt) "INT" else "DOUBLE"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table ADD COLUMNS (mp.value.$c $tpe)")
            maps = maps :+ c
            mapTypes = mapTypes + (c -> tpe)
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs + (s"mp.$c" -> None))
            }
            s"MAP ADD mp.value.$c $tpe"
          case MapRename(si) =>
            fresh += 1
            val from = maps(si % maps.size); val to = s"p$fresh"
            SqlDdl.exec(spark,
              s"ALTER TABLE $table RENAME COLUMN mp.value.$from TO $to")
            maps = maps.updated(maps.indexOf(from), to)
            mapTypes = mapTypes - from + (to -> mapTypes(from))
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"mp.$from" + (s"mp.$to" -> vs(s"mp.$from")))
            }
            s"MAP RENAME mp.value.$from->$to"
          case MapDrop(si) if maps.size > 1 =>
            val victim = maps(si % maps.size)
            SqlDdl.exec(spark,
              s"ALTER TABLE $table DROP COLUMNS (mp.value.$victim)")
            maps = maps.filterNot(_ == victim)
            mapTypes = mapTypes - victim
            rows.mapValuesInPlace { case (_, (pc, vs)) =>
              (pc, vs - s"mp.$victim")
            }
            s"MAP DROP mp.value.$victim"
          case MapDrop(_) => "MAP DROP skipped (last value field)"
          case MapWiden(si, toDouble) =>
            val target = maps(si % maps.size)
            if (mapTypes(target) == "INT") {
              val to = if (toDouble) "DOUBLE" else "BIGINT"
              SqlDdl.exec(spark,
                s"ALTER TABLE $table ALTER COLUMN mp.value.$target TYPE $to")
              mapTypes = mapTypes + (target -> to)
              s"MAP WIDEN mp.value.$target INT->$to"
            } else s"MAP WIDEN skipped (mp.$target is ${mapTypes(target)})"
        }
        check(applied)
      }
      steps.foldLeft(check("CREATE"))(_ && _)
  }

  property("SQL DML+DDL interleaving matches the model (bucket CoW)") =
    Prop.forAllNoShrink(scenario) { case (first, ops) =>
      scenarioProp("bucket")(first, ops)
    }

  property("SQL DML+DDL interleaving matches the model (MOR delta logs)") =
    Prop.forAllNoShrink(scenario) { case (first, ops) =>
      scenarioProp("mor")(first, ops)
    }
}
