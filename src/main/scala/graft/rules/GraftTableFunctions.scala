package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** SQL table-valued functions over the commit log:
  *
  * {{{
  *   SELECT * FROM graft_table_changes('/path/to/table', 2)      -- to latest
  *   SELECT * FROM graft_table_changes('/path/to/table', 2, 5)   -- window
  *   SELECT * FROM graft_table_history('/path/to/table')
  *   SELECT * FROM graft_table_detail('/path/to/table')
  *   SELECT * FROM graft_table_partitions('/path/to/table')
  * }}}
  *
  * The Delta `table_changes` UX for the [[graft.tables.ChangeFeed]];
  * arguments must be literals (the plan is built at resolution time).
  */
object GraftTableFunctions {

  type TableFunction =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)

  private def litString(e: Expression, fn: String, pos: Int): String = e match {
    case l: Literal if l.dataType == StringType && l.value != null =>
      l.value.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a string literal, got $other")
  }

  private def litLong(e: Expression, fn: String, pos: Int): Long = e match {
    case l: Literal if (l.dataType == IntegerType ||
        l.dataType == LongType) && l.value != null =>
      l.value.toString.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    castToImpl(df).queryExecution.analyzed

  val tableChanges: TableFunction = (
    FunctionIdentifier("graft_table_changes"),
    new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName,
      "graft_table_changes"),
    (args: Seq[Expression]) => {
      val fn = "graft_table_changes"
      require(args.size == 2 || args.size == 3,
        s"$fn takes (path, startVersion[, endVersion]), got ${args.size} args")
      val spark = SparkSession.active
      val path = litString(args.head, fn, 0)
      val start = litLong(args(1), fn, 1)
      val end = if (args.size == 3) litLong(args(2), fn, 2) else -1L
      analyzed(graft.tables.ChangeFeed.changes(spark, path, start, end))
    })

  val tableHistory: TableFunction = (
    FunctionIdentifier("graft_table_history"),
    new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName,
      "graft_table_history"),
    (args: Seq[Expression]) => {
      val fn = "graft_table_history"
      require(args.size == 1, s"$fn takes (path), got ${args.size} args")
      val spark = SparkSession.active
      analyzed(graft.tables.GraftTable
        .forPath(spark, litString(args.head, fn, 0)).history())
    })

  val tableDetail: TableFunction = (
    FunctionIdentifier("graft_table_detail"),
    new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName,
      "graft_table_detail"),
    (args: Seq[Expression]) => {
      val fn = "graft_table_detail"
      require(args.size == 1, s"$fn takes (path), got ${args.size} args")
      val spark = SparkSession.active
      analyzed(graft.tables.GraftTable
        .forPath(spark, litString(args.head, fn, 0)).detail())
    })

  val tablePartitions: TableFunction = (
    FunctionIdentifier("graft_table_partitions"),
    new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName,
      "graft_table_partitions"),
    (args: Seq[Expression]) => {
      val fn = "graft_table_partitions"
      require(args.size == 1, s"$fn takes (path), got ${args.size} args")
      val spark = SparkSession.active
      analyzed(graft.tables.GraftTable
        .forPath(spark, litString(args.head, fn, 0)).partitions())
    })
}
