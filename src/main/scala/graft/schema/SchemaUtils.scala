package graft.schema

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

  /** Columns shared by both schemas must have identical types (reference
    * read-compat check `SchemaUtils.scala:237-291`). */
  def checkCompatible(table: StructType, data: StructType): Unit = {
    val byLower = table.fields.map(f => f.name.toLowerCase -> f).toMap
    data.fields.foreach { f =>
      byLower.get(f.name.toLowerCase).foreach { tf =>
        if (tf.dataType != f.dataType) {
          throw new GraftSchemaException(
            s"column ${f.name}: incoming type ${f.dataType.simpleString} does not " +
            s"match table type ${tf.dataType.simpleString}")
        }
      }
    }
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
    * (in incoming order). Nullability does NOT widen implicitly — a NOT
    * NULL column stays NOT NULL (enforced by Invariants on write); widening
    * requires an explicit ALTER (reference `SchemaUtils.scala:767+`). */
  def mergeSchemas(table: StructType, data: StructType): StructType = {
    val existingLower = table.fieldNames.map(_.toLowerCase).toSet
    val added = data.fields.filterNot(f => existingLower.contains(f.name.toLowerCase))
    StructType(table.fields ++ added)
  }
}
