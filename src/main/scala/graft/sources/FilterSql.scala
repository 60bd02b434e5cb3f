package graft.sources

import org.apache.spark.sql.sources._

/** Translate V2 pushed `Filter`s back to a SQL predicate string for the
  * driver-side DML commands (delete-where, replaceWhere).
  *
  * Pitfalls this rendering is careful about:
  *  - String-match filters render as the `startswith`/`endswith`/`contains`
  *    FUNCTIONS, not LIKE: a user value containing `%` or `_` would act as
  *    a wildcard inside a LIKE pattern (deleting MORE rows than asked).
  *  - Timestamp values render as `timestamp_micros(<epoch micros>)` — an
  *    absolute instant. `TIMESTAMP '<Timestamp.toString>'` would print the
  *    JVM-default-timezone wall clock and re-parse in the SESSION timezone,
  *    shifting the predicate whenever the two differ.
  *  - Attribute and string literals escape their quote characters. V1
  *    `Filter` attributes are top-level column names (Spark only pushes
  *    nested fields through the V2 predicate API, which this source does
  *    not advertise), so wrapping the whole name in backticks is correct.
  */
object FilterSql {

  def translatable(f: Filter): Boolean =
    try { toSql(f); true } catch { case _: UnsupportedOperationException => false }

  private def attr(a: String): String = s"`${a.replace("`", "``")}`"

  def toSql(f: Filter): String = f match {
    case AlwaysTrue() => "true"
    case AlwaysFalse() => "false"
    case EqualTo(a, v) => s"${attr(a)} = ${litSql(v)}"
    case EqualNullSafe(a, v) => s"${attr(a)} <=> ${litSql(v)}"
    case GreaterThan(a, v) => s"${attr(a)} > ${litSql(v)}"
    case GreaterThanOrEqual(a, v) => s"${attr(a)} >= ${litSql(v)}"
    case LessThan(a, v) => s"${attr(a)} < ${litSql(v)}"
    case LessThanOrEqual(a, v) => s"${attr(a)} <= ${litSql(v)}"
    case In(a, vs) => s"${attr(a)} IN (${vs.map(litSql).mkString(", ")})"
    case IsNull(a) => s"${attr(a)} IS NULL"
    case IsNotNull(a) => s"${attr(a)} IS NOT NULL"
    case And(l, r) => s"(${toSql(l)} AND ${toSql(r)})"
    case Or(l, r) => s"(${toSql(l)} OR ${toSql(r)})"
    case Not(c) => s"(NOT ${toSql(c)})"
    case StringStartsWith(a, v) => s"startswith(${attr(a)}, '${escape(v)}')"
    case StringEndsWith(a, v) => s"endswith(${attr(a)}, '${escape(v)}')"
    case StringContains(a, v) => s"contains(${attr(a)}, '${escape(v)}')"
    case other =>
      throw new UnsupportedOperationException(s"filter not translatable: $other")
  }

  private def escape(s: String): String = s.replace("'", "''")

  private def litSql(v: Any): String = v match {
    case null => "NULL"
    case s: String => s"'${escape(s)}'"
    case t: java.sql.Timestamp =>
      // floorDiv: plain long division truncates toward zero, so a
      // pre-epoch timestamp with fractional seconds (getTime = -500 ms,
      // getNanos = 500e6) would render one full second late
      s"timestamp_micros(${Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000})"
    case t: java.time.Instant =>
      s"timestamp_micros(${t.getEpochSecond * 1000000L + t.getNano / 1000})"
    case d: java.sql.Date => s"DATE '$d'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case other => other.toString
  }
}
