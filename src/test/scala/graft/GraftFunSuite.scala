package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. */
trait GraftFunSuite extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftFunSuite.session

  def withTempTable[T](f: String => T): T = {
    val dir = Files.createTempDirectory("graft-test-").toString
    try f(dir)
    finally graft.write.TransactionalWrite.deleteRecursively(
      java.nio.file.Paths.get(dir))
  }

  /** Set session confs for the duration of `f`, restoring prior values. */
  def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val previous = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally previous.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Sorted-row comparison helper. */
  def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  def assertSameRows(
      actual: org.apache.spark.sql.DataFrame,
      expected: org.apache.spark.sql.DataFrame): Unit = {
    assert(rowsOf(actual) == rowsOf(expected))
  }
}

object GraftFunSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.rules.GraftSparkSessionExtension")
    .getOrCreate()
}
