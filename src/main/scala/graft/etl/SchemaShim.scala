package graft.etl

import org.apache.spark.sql.{AnalysisException, Column, DataFrame}
import org.apache.spark.sql.functions.{lit, struct, transform, transform_values, when}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructField, StructType}

/** Schema-on-read union for MAP-typed columns.
  *
  * Every layout's read path unions per-commit frames with
  * `unionByName(allowMissingColumns = true)`, which reconciles nested
  * STRUCT fields recursively (missing fields null-fill, widths coerce)
  * — but NOT map value types: two files whose `map<K, struct<...>>`
  * value shapes diverged through DDL evolution are an analysis error,
  * not a merged schema. [[unionByName]] here keeps the plain union as
  * the untouched happy path and, only when it refuses, conforms the
  * diverged map columns on both sides to their merged value shape
  * (field-by-name, null-filled, losslessly widened — the same rules
  * [[Catalog]]'s declared-schema reconcile applies) and retries. Map
  * KEYS never merge: a key-type divergence stays a loud error (keys
  * are lookup identity and never evolve).
  */
object SchemaShim {

  /** `a.unionByName(b, allowMissingColumns = true)`, extended to union
    * map columns whose VALUE shapes differ across the sides.
    */
  def unionByName(a: DataFrame, b: DataFrame): DataFrame =
    try a.unionByName(b, allowMissingColumns = true)
    catch {
      case e: AnalysisException =>
        val diverged = a.schema.fields.flatMap { af =>
          b.schema.fields.find(_.name.equalsIgnoreCase(af.name)).collect {
            case bf if af.dataType != bf.dataType &&
                containsMap(af.dataType) && containsMap(bf.dataType) =>
              (af, bf, mergedType(af.dataType, bf.dataType))
          }
        }
        // every diverged map column must merge, else the original
        // error stands (a genuine shape conflict must stay loud)
        if (diverged.isEmpty || diverged.exists(_._3.isEmpty)) throw e
        val a2 = diverged.foldLeft(a) { case (d, (af, _, Some(m))) =>
          d.withColumn(af.name, conform(d(af.name), af.dataType, m))
        case (d, _) => d
        }
        val b2 = diverged.foldLeft(b) { case (d, (_, bf, Some(m))) =>
          d.withColumn(bf.name, conform(d(bf.name), bf.dataType, m))
        case (d, _) => d
        }
        a2.unionByName(b2, allowMissingColumns = true)
    }

  private def containsMap(t: DataType): Boolean = t match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => containsMap(f.dataType))
    case ar: ArrayType => containsMap(ar.elementType)
    case _ => false
  }

  /** The merged (union) type of two diverged shapes: struct fields by
    * case-insensitive name (left order, right extras appended), map
    * values recursively (keys must match exactly), array elements
    * recursively, atomics through the engine's lossless-widening
    * predicate. None = no sound merge exists.
    */
  private[etl] def mergedType(x: DataType, y: DataType): Option[DataType] =
    (x, y) match {
      case (a, b) if a == b => Some(a)
      case (a: StructType, b: StructType) =>
        val merged = a.fields.map { af =>
          b.fields.find(_.name.equalsIgnoreCase(af.name)) match {
            case Some(bf) => mergedType(af.dataType, bf.dataType)
              .map(t => StructField(af.name, t, nullable = true))
            case None => Some(af.copy(nullable = true))
          }
        }
        val extras = b.fields.filterNot(bf =>
          a.fields.exists(_.name.equalsIgnoreCase(bf.name)))
          .map(_.copy(nullable = true))
        if (merged.exists(_.isEmpty)) None
        else Some(StructType(merged.flatten ++ extras))
      case (a: MapType, b: MapType) if a.keyType == b.keyType =>
        mergedType(a.valueType, b.valueType).map(v =>
          MapType(a.keyType, v, a.valueContainsNull || b.valueContainsNull))
      case (a: ArrayType, b: ArrayType) =>
        mergedType(a.elementType, b.elementType).map(e =>
          ArrayType(e, a.containsNull || b.containsNull))
      case (a, b) if SqlDdl.isWidening(a, b) => Some(b)
      case (a, b) if SqlDdl.isWidening(b, a) => Some(a)
      case _ => None
    }

  /** Rebuild `src` (typed `from`) as the merged type `to`: struct
    * fields by name (missing → typed NULL), map values through
    * `transform_values`, array elements through `transform`, atomics
    * by lossless cast. NULL containers stay NULL.
    */
  private[etl] def conform(src: Column, from: DataType, to: DataType): Column =
    if (from == to) src
    else (from, to) match {
      case (f: StructType, t: StructType) =>
        val rebuilt = struct(t.fields.map { tf =>
          f.fields.find(_.name.equalsIgnoreCase(tf.name)) match {
            case Some(ff) =>
              conform(src.getField(ff.name), ff.dataType, tf.dataType)
                .as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }.toIndexedSeq: _*)
        when(src.isNull, lit(null)).otherwise(rebuilt)
      case (f: MapType, t: MapType) =>
        transform_values(src, (_, v) => conform(v, f.valueType, t.valueType))
      case (f: ArrayType, t: ArrayType) =>
        transform(src, x => conform(x, f.elementType, t.elementType))
      case _ => src.cast(to)
    }
}
