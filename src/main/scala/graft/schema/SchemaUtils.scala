package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class GraftSchemaException(msg: String) extends RuntimeException(msg)

/** Schema validation / evolution helpers (reference
  * `star/schema/SchemaUtils.scala:47-976`, reduced to the operations the
  * engine actually performs: validate on write, compatibility check, and
  * additive auto-merge).
  */
object SchemaUtils {

  /** Reject duplicate names (case-insensitive), NullType columns, and names
    * parquet cannot store (reference `SchemaUtils.scala:99-143` +
    * `TransactionCommit.scala:213-216`). */
  def validateSchema(schema: StructType): Unit = {
    val lower = schema.fieldNames.map(_.toLowerCase)
    if (lower.distinct.length != lower.length) {
      val dups = lower.groupBy(identity).collect { case (n, g) if g.length > 1 => n }
      throw new GraftSchemaException(s"duplicate column names: ${dups.mkString(", ")}")
    }
    schema.fields.foreach { f =>
      if (hasNullType(f.dataType))
        throw new GraftSchemaException(s"column ${f.name} has NullType; not storable")
      val bad = " ,;{}()\n\t=".toSeq.filter(c => f.name.contains(c))
      if (bad.nonEmpty)
        throw new GraftSchemaException(
          s"column name '${f.name}' contains invalid character(s) ${bad.mkString("'", "','", "'")}")
    }
  }

  private def hasNullType(dt: DataType): Boolean = dt match {
    case NullType => true
    case s: StructType => s.fields.exists(f => hasNullType(f.dataType))
    case a: ArrayType => hasNullType(a.elementType)
    case m: MapType => hasNullType(m.keyType) || hasNullType(m.valueType)
    case _ => false
  }

  /** Remove NullType columns from a write schema (reference
    * `SchemaUtils.scala:99-126` "dropNullTypeColumns"): an all-null JSON
    * batch infers NullType, which parquet cannot store — the column is
    * simply absent from this write and null-fills on read. Top-level fields
    * and fields nested in structs are dropped (a struct left empty drops
    * whole); NullType inside array/map element types cannot be pruned
    * field-wise and is an error. Returns None when nothing was pruned. */
  def pruneNullTypes(schema: StructType): Option[StructType] = {
    def prune(st: StructType): StructType = StructType(st.fields.flatMap { f =>
      f.dataType match {
        case NullType => None
        case s: StructType =>
          val inner = prune(s)
          if (inner.isEmpty) None else Some(f.copy(dataType = inner))
        case other if hasNullType(other) =>
          throw new GraftSchemaException(
            s"column ${f.name} has NullType nested in ${other.simpleString}; " +
            "NullType fields can only be dropped from structs")
        case _ => Some(f)
      }
    })
    val pruned = prune(schema)
    if (pruned == schema) None else Some(pruned)
  }

  /** Columns shared by both schemas must have identical types; struct
    * columns recurse so a write carrying a nested subset (or superset, via
    * auto-merge) of the table's struct is accepted (reference read-compat
    * check `SchemaUtils.scala:237-291`). */
  def checkCompatible(table: StructType, data: StructType): Unit = {
    def check(tdt: DataType, ddt: DataType, path: String): Unit = (tdt, ddt) match {
      case (ts: StructType, ds: StructType) =>
        val byLower = ts.fields.map(f => f.name.toLowerCase -> f).toMap
        ds.fields.foreach { f =>
          byLower.get(f.name.toLowerCase).foreach(tf =>
            check(tf.dataType, f.dataType, s"$path${f.name}."))
        }
      case _ if tdt != ddt =>
        throw new GraftSchemaException(
          s"column ${path.stripSuffix(".")}: incoming type ${ddt.simpleString} " +
          s"does not match table type ${tdt.simpleString}")
      case _ => ()
    }
    check(StructType(table.fields), StructType(data.fields), "")
  }

  /** Rewrite the struct at nested `parent` path (empty = the top level)
    * with `op`, recursing through intermediate structs. Supports the
    * reference's nested ADD/CHANGE/DROP COLUMN surface
    * (`commands/alterTableCommands.scala:123-199`,
    * `schema/SchemaUtils.scala:532-656`). */
  def updateStructAt(
      schema: StructType, parent: Seq[String])(
      op: StructType => StructType): StructType =
    if (parent.isEmpty) op(schema)
    else {
      val idx = schema.fields.indexWhere(_.name == parent.head)
      if (idx < 0) throw new GraftSchemaException(s"no such column ${parent.head}")
      schema.fields(idx).dataType match {
        case st: StructType =>
          val updated = schema.fields(idx).copy(
            dataType = updateStructAt(st, parent.tail)(op))
          StructType(schema.fields.updated(idx, updated))
        case other => throw new GraftSchemaException(
          s"${parent.head} is not a struct (${other.simpleString}); " +
          "cannot address nested fields inside it")
      }
    }

  /** Additive merge: table schema plus any new incoming columns appended
    * (in incoming order); struct columns merge recursively so nested fields
    * evolve too (reference `SchemaUtils.scala:767-858` mergeSchemas).
    * Nullability does NOT widen implicitly — a NOT NULL column stays NOT
    * NULL (enforced by Invariants on write); widening requires an explicit
    * ALTER. Merged-in columns and nested fields are always nullable (older
    * files null-fill them on read). */
  def mergeSchemas(table: StructType, data: StructType): StructType = {
    def merge(t: StructType, d: StructType): StructType = {
      val dByLower = d.fields.map(f => f.name.toLowerCase -> f).toMap
      val tLower = t.fieldNames.map(_.toLowerCase).toSet
      val kept = t.fields.map { tf =>
        (tf.dataType, dByLower.get(tf.name.toLowerCase).map(_.dataType)) match {
          case (ts: StructType, Some(ds: StructType)) =>
            tf.copy(dataType = merge(ts, ds))
          case _ => tf
        }
      }
      val added = d.fields.filterNot(f => tLower.contains(f.name.toLowerCase))
        .map(_.copy(nullable = true))
      StructType(kept ++ added)
    }
    merge(table, data)
  }

  /** The `from` type with struct field NAMES renamed positionally to
    * `to`'s (recursively), types kept. Used for by-position INSERT, where
    * incoming struct fields map onto the table's struct by position
    * (`(col1, col2)` tuples land in `(x, y)`); the value layout is
    * unchanged, so the caller applies it with a plain `Column.cast` (a
    * pure rename). Arity-mismatched structs are returned unchanged — the
    * write path reports those as schema errors. */
  def renamePositionally(from: DataType, to: DataType): DataType =
    (from, to) match {
      case (f: StructType, t: StructType) if f.length == t.length =>
        StructType(f.fields.zip(t.fields).map { case (ff, tf) =>
          ff.copy(name = tf.name,
            dataType = renamePositionally(ff.dataType, tf.dataType))
        })
      case (ArrayType(fe, n), ArrayType(te, _)) =>
        ArrayType(renamePositionally(fe, te), n)
      case _ => from
    }

  /** Reshape `c` (typed `from`) to the struct layout of `to`: nested fields
    * present in `from` are carried over (resolved case-insensitively, safe
    * scalar up-casts applied), fields only in `to` null-fill. Top-level
    * non-struct types pass through — callers handle their casts. A null
    * struct stays null rather than becoming a struct of nulls. Struct
    * alignment is always BY NAME — never `Column.cast` between struct
    * types, which matches fields positionally and would remap values. */
  def alignColumn(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f: StructType, t: StructType) if f != t =>
        val byLower = f.fields.map(x => x.name.toLowerCase -> x).toMap
        val rebuilt = struct(t.fields.toSeq.map { tf =>
          byLower.get(tf.name.toLowerCase) match {
            case Some(ff) if !ff.dataType.isInstanceOf[StructType] &&
                !tf.dataType.isInstanceOf[StructType] &&
                ff.dataType != tf.dataType &&
                org.apache.spark.sql.catalyst.expressions.Cast
                  .canUpCast(ff.dataType, tf.dataType) =>
              c.getField(ff.name).cast(tf.dataType).as(tf.name)
            case Some(ff) =>
              alignColumn(c.getField(ff.name), ff.dataType, tf.dataType).as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }: _*)
        when(c.isNull, lit(null).cast(t)).otherwise(rebuilt)
      case _ => c
    }
}
