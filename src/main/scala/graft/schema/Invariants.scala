package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.meta.TableInfo

/** Write-time data invariants (reference `star/schema/Invariants.scala:29-99`
  * + `InvariantCheckerExec.scala`):
  *  - NOT NULL from schema nullability;
  *  - arbitrary CHECK expressions persisted in table configuration as
  *    `graft.constraints.<name> = <sql predicate>`.
  *
  * Enforcement rides inside the write plan via `assert_true` filters — a
  * codegen'd per-row check with no extra pass over the data, the Spark-4
  * equivalent of the reference's physical `InvariantCheckerExec` node.
  */
object Invariants {

  val CONSTRAINT_PREFIX = "graft.constraints."

  /** Wrap `df` so any invariant violation fails the write with a clear
    * error. Columns absent from `df` (partial-column upserts) are skipped.
    * Tombstone marker rows (key deletes riding a delta upsert — MERGE
    * DELETE clauses) are exempt: their non-key columns are intentionally
    * null and never surface through the merge reader. The `when` keeps the
    * exemption branch lazy, so the assert never evaluates for them. */
  def enforce(df: DataFrame, tableInfo: TableInfo): DataFrame = {
    // CASE-INSENSITIVE presence (Spark's default resolution): a constraint
    // or schema spelled `X` must still bind to a written column `x`, or
    // the invariant silently never fires
    val present = df.columns.map(_.toLowerCase).toSet
    val markerCol = df.columns.find(graft.meta.Tombstones.isMarkerCol)
    def guarded(check: Column): Column = markerCol match {
      case Some(mc) =>
        when(coalesce(col(s"`$mc`"), lit(false)), lit(true)).otherwise(check)
      case None => check
    }
    val notNullCols = tableInfo.schema.fields
      .filter(f => !f.nullable && present.contains(f.name.toLowerCase))
      .map(f => df.columns.find(_.equalsIgnoreCase(f.name)).getOrElse(f.name))
    val withNotNull = notNullCols.foldLeft(df) { (d, c) =>
      d.filter(guarded(coalesce(
        assert_true(col(s"`$c`").isNotNull,
          lit(s"[graft invariant] column $c: NOT NULL constraint violated")),
        lit(true))))
    }
    val checks = tableInfo.configuration.collect {
      case (k, v) if k.startsWith(CONSTRAINT_PREFIX) =>
        k.stripPrefix(CONSTRAINT_PREFIX) -> v
    }
    checks.foldLeft(withNotNull) { case (d, (name, predicate)) =>
      val cond = expr(predicate)
      // a reference applies if its ROOT column is present: `props.score`
      // references nested field score of column props; a column literally
      // named props.score also passes via the whole-name check
      val refs = graft.commands.RewriteSupport.referencedNames(
        org.apache.spark.sql.graft.SparkShims.expression(cond))
      val applies = refs.forall(r =>
        present.contains(r.toLowerCase) ||
        present.contains(r.split("\\.").head.toLowerCase))
      if (!applies) d
      else d.filter(guarded(coalesce(
        assert_true(coalesce(cond, lit(false)),
          lit(s"[graft invariant] $name: CHECK ($predicate) violated")),
        lit(true))))
    }
  }
}
