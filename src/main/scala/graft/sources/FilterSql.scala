package graft.sources

import org.apache.spark.sql.sources._

/** Translate V2 pushed `Filter`s back to a SQL predicate string for the
  * driver-side DML commands (delete-where, replaceWhere). */
object FilterSql {

  def translatable(f: Filter): Boolean =
    try { toSql(f); true } catch { case _: UnsupportedOperationException => false }

  def toSql(f: Filter): String = f match {
    case AlwaysTrue() => "true"
    case AlwaysFalse() => "false"
    case EqualTo(a, v) => s"`$a` = ${litSql(v)}"
    case EqualNullSafe(a, v) => s"`$a` <=> ${litSql(v)}"
    case GreaterThan(a, v) => s"`$a` > ${litSql(v)}"
    case GreaterThanOrEqual(a, v) => s"`$a` >= ${litSql(v)}"
    case LessThan(a, v) => s"`$a` < ${litSql(v)}"
    case LessThanOrEqual(a, v) => s"`$a` <= ${litSql(v)}"
    case In(a, vs) => s"`$a` IN (${vs.map(litSql).mkString(", ")})"
    case IsNull(a) => s"`$a` IS NULL"
    case IsNotNull(a) => s"`$a` IS NOT NULL"
    case And(l, r) => s"(${toSql(l)} AND ${toSql(r)})"
    case Or(l, r) => s"(${toSql(l)} OR ${toSql(r)})"
    case Not(c) => s"(NOT ${toSql(c)})"
    case StringStartsWith(a, v) => s"`$a` LIKE '${escape(v)}%'"
    case StringEndsWith(a, v) => s"`$a` LIKE '%${escape(v)}'"
    case StringContains(a, v) => s"`$a` LIKE '%${escape(v)}%'"
    case other =>
      throw new UnsupportedOperationException(s"filter not translatable: $other")
  }

  private def escape(s: String): String = s.replace("'", "''")

  private def litSql(v: Any): String = v match {
    case null => "NULL"
    case s: String => s"'${escape(s)}'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.time.Instant => s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case other => other.toString
  }
}
