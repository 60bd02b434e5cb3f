package graft.merge

import org.apache.spark.unsafe.types.UTF8String

/** Per-column merge operator SPI for merge-on-read (reference
  * `merge_operator/MergeOperator.scala:28-72`).
  *
  * Within one bucket, all versions of a primary key are collected in write
  * order; for each column, every version's value where the version's file
  * physically contains the column (`fileExistCols`) is folded by that
  * column's operator. The default keeps the newest value; built-ins add sum
  * and concat, mirroring the reference's `DefaultMergeOp` / `MergeOpInt` /
  * `MergeOpLong` / `MergeOpString`.
  *
  * Operators run on catalyst values (Long, Double, UTF8String, ...) inside
  * the scan's partition reader — distributed, no shuffle, no UDF.
  */
trait GraftMergeOperator extends Serializable {
  def name: String
  /** `values` is non-empty, ordered oldest -> newest; may contain nulls. */
  def merge(values: Seq[Any]): Any
}

object LastMergeOp extends GraftMergeOperator {
  override val name = "last"
  override def merge(values: Seq[Any]): Any = values.last
}

/** Sum over numeric catalyst values (nulls ignored; all-null -> null). */
object SumMergeOp extends GraftMergeOperator {
  override val name = "sum"
  override def merge(values: Seq[Any]): Any = {
    val nonNull = values.filter(_ != null)
    if (nonNull.isEmpty) null
    else nonNull.reduce[Any] {
      case (a: java.lang.Integer, b: java.lang.Integer) => Int.box(a + b)
      case (a: java.lang.Long, b: java.lang.Long) => Long.box(a + b)
      case (a: java.lang.Double, b: java.lang.Double) => Double.box(a + b)
      case (a: java.lang.Float, b: java.lang.Float) => Float.box(a + b)
      case (a: java.lang.Short, b: java.lang.Short) => Short.box((a + b).toShort)
      case (a, b) => sys.error(s"sum merge op: unsupported values $a, $b")
    }
  }
}

/** Comma-concat over string catalyst values, oldest first (nulls skipped). */
object ConcatMergeOp extends GraftMergeOperator {
  override val name = "concat"
  override def merge(values: Seq[Any]): Any = {
    val nonNull = values.collect { case s: UTF8String => s.toString }
    if (nonNull.isEmpty) null else UTF8String.fromString(nonNull.mkString(","))
  }
}

object GraftMergeOperator {
  @volatile private var registry: Map[String, GraftMergeOperator] =
    Map("last" -> LastMergeOp, "sum" -> SumMergeOp, "concat" -> ConcatMergeOp)

  def register(op: GraftMergeOperator): Unit = synchronized {
    registry += (op.name -> op)
  }

  def byName(name: String): GraftMergeOperator =
    registry.getOrElse(name,
      // allow fully-qualified class names for user operators
      Class.forName(name).getDeclaredConstructor().newInstance()
        .asInstanceOf[GraftMergeOperator])

  /** Scan option carrying col->operator assignments: "a:sum,b:concat". */
  val SCAN_OPTION = "mergeOperators"

  /** Table property declaring the table's OWN operators: scans default to
    * them and every compaction path (explicit, auto-trigger, scan-heal)
    * applies them — without it, an engine-initiated compaction of a table
    * whose readers pass query-time operators would silently materialize
    * last-wins values. */
  val TABLE_PROPERTY = "graft.mergeOperators"

  def parseAssignments(s: String): Map[String, String] =
    s.split(",").filter(_.nonEmpty).map { kv =>
      val Array(c, op) = kv.split(":", 2)
      c.trim -> op.trim
    }.toMap

  /** Inverse of [[parseAssignments]] — keep the wire format in one place. */
  def formatAssignments(m: Map[String, String]): String =
    m.map { case (c, op) => s"$c:$op" }.mkString(",")

  /** The operators a table declares via [[TABLE_PROPERTY]], if any —
    * matched case-insensitively (DataFrameWriter lowercases option keys). */
  def declaredOperators(info: graft.meta.TableInfo): Map[String, String] =
    info.configuration.collectFirst {
      case (k, v) if k.equalsIgnoreCase(TABLE_PROPERTY) => parseAssignments(v)
    }.getOrElse(Map.empty)
}
