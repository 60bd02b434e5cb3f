package graft.commands

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) clustering for compaction rewrites.
  *
  * Multi-dimensional data skipping: a table clustered on ONE column prunes
  * filters on that column only; interleaving the bits of several columns'
  * normalized ranks gives every indexed column locality, so each file's
  * [min, max] window stays narrow on ALL of them and `FileStats` skipping
  * fires for filters on any (public technique: Morton 1966; the Delta OSS
  * OPTIMIZE ZORDER BY shape — range-normalize, interleave, range-partition,
  * sort — re-expressed over the public DataFrame API; no reference
  * counterpart, the reference clusters only by hash-bucket).
  *
  * Pure relational: one min/max aggregate to learn each column's range,
  * then a codegen'd bit-interleave expression, `repartitionByRange` on the
  * z-value (the ONE shuffle — sampled range boundaries spread skew), and a
  * within-partition sort that the parquet writer streams out in order.
  * No UDFs, no driver-side data movement.
  */
object ZOrder {
  /** Bits per dimension: 16 bits x up to 4 columns = 64-bit z-values. */
  val BITS = 16
  val MAX_COLS = 4

  private[commands] def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Rewrite `df` clustered on the Morton curve of `cols`, split into
    * `targetFiles` range slices. */
  def cluster(df: DataFrame, cols: Seq[String], targetFiles: Int): DataFrame = {
    require(cols.nonEmpty && cols.size <= MAX_COLS,
      s"zOrderBy takes 1 to $MAX_COLS columns, got ${cols.size}")
    val fields = cols.map { c =>
      val f = df.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(s"zOrderBy column $c not found"))
      require(supported(f.dataType),
        s"zOrderBy column $c has unsupported type ${f.dataType.simpleString}" +
        " (numeric, date, or timestamp required)")
      f
    }
    // backtick-escaped reference: a z-order column literally named `a.b`
    // passed validation above (it is in dataSchema) and must not resolve
    // as a nested-field path here
    def fcol(f: StructField): Column =
      col(s"`${f.name.replace("`", "``")}`")
    def asDouble(f: StructField): Column = f.dataType match {
      case DateType => unix_date(fcol(f)).cast(DoubleType)
      case TimestampType => unix_micros(fcol(f)).cast(DoubleType)
      case TimestampNTZType =>
        unix_micros(fcol(f).cast(TimestampType)).cast(DoubleType)
      case _ => fcol(f).cast(DoubleType)
    }
    // one pass to learn each dimension's range (metadata-scale result)
    val aggs = fields.flatMap(f =>
      Seq(min(asDouble(f)).as(s"mn_${f.name}"), max(asDouble(f)).as(s"mx_${f.name}")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val maxRank = (1L << BITS) - 1
    val norms: Seq[Column] = fields.zipWithIndex.map { case (f, i) =>
      val mn = Option(row.get(2 * i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val mx = Option(row.get(2 * i + 1)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val width = math.max(mx - mn, Double.MinPositiveValue)
      val scaled = ((asDouble(f) - lit(mn)) / lit(width) * lit(maxRank.toDouble))
        .cast(LongType)
      when(asDouble(f).isNull, lit(0L))
        .otherwise(least(lit(maxRank), greatest(lit(0L), scaled)))
    }
    // interleave: bit b of dimension j lands at position b*k + j; the
    // contributions are bit-disjoint, so sum == bitwise OR, and the whole
    // expression stays inside whole-stage codegen
    val k = norms.size
    val z = (0 until BITS).flatMap { b =>
      norms.zipWithIndex.map { case (n, j) =>
        shiftleft(shiftright(n, b).bitwiseAND(lit(1L)), b * k + j)
      }
    }.reduce(_ + _)
    df.withColumn("__graft_z", z)
      .repartitionByRange(math.max(targetFiles, 1), col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }
}
