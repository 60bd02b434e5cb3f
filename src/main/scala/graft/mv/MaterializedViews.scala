package graft.mv

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

import graft.meta.{MaterialViewInfo, SnapshotManagement}
import graft.sources.GraftRead

/** Materialized views with staleness tracking and automatic query rewrite
  * (reference `commands/CreateMaterialViewCommand.scala`,
  * `UpdateMaterialViewCommand.scala`, `rules/RewriteQueryByMaterialView.scala`).
  *
  * A view is a graft table plus `_graft_mv.json` holding the SQL text and
  * the pinned `(tablePath -> version)` of every graft relation it read.
  * The rewrite rule substitutes a query's plan with a scan of the view when
  * the canonicalized plans match and the view is fresh. (The reference's
  * 1268-line containment matcher also rewrites *subsuming* queries; this
  * port rewrites exact matches — the metadata/staleness machinery is the
  * same, the matcher is intentionally minimal.)
  */
object MaterializedViews {
  implicit private val formats: Formats = DefaultFormats

  /** Session conf listing the registered MV table paths. */
  val CONF_KEY = "spark.graft.materializedViews"

  private def mvMetaPath(viewPath: String) =
    Paths.get(SnapshotManagement.normalize(viewPath), "_graft_mv.json")

  def create(spark: SparkSession, viewPath: String, sqlText: String): Unit = {
    val df = spark.sql(sqlText)
    val relations = graftRelationVersions(df)
    df.write.format("graft").mode("overwrite").save(viewPath)
    val info = MaterialViewInfo(viewPath, sqlText, relations)
    Files.write(mvMetaPath(viewPath),
      Serialization.write(info).getBytes(StandardCharsets.UTF_8))
    register(spark, viewPath)
  }

  /** Recompute iff any relation table advanced (reference
    * `UpdateMaterialViewCommand.scala:30-76`). */
  def refresh(spark: SparkSession, viewPath: String): Boolean = {
    readInfo(viewPath) match {
      case Some(info) if isStale(info) =>
        val df = spark.sql(info.sqlText)
        val relations = graftRelationVersions(df)
        df.write.format("graft").mode("overwrite").save(viewPath)
        Files.write(mvMetaPath(viewPath),
          Serialization.write(info.copy(relationVersions = relations))
            .getBytes(StandardCharsets.UTF_8))
        true
      case _ => false
    }
  }

  def isStale(info: MaterialViewInfo): Boolean =
    info.relationVersions.exists { case (path, v) =>
      SnapshotManagement.snapshotOpt(path).forall(_.version != v)
    }

  def readInfo(viewPath: String): Option[MaterialViewInfo] = {
    val p = mvMetaPath(viewPath)
    if (!Files.exists(p)) None
    else Some(Serialization.read[MaterialViewInfo](
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  def register(spark: SparkSession, viewPath: String): Unit = {
    val cur = spark.conf.getOption(CONF_KEY).filter(_.nonEmpty)
      .map(_.split(",").toSeq).getOrElse(Nil)
    val norm = SnapshotManagement.normalize(viewPath)
    if (!cur.contains(norm)) spark.conf.set(CONF_KEY, (cur :+ norm).mkString(","))
  }

  def graftRelationVersions(df: DataFrame): Map[String, Long] = {
    castToImpl(df).queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftTableV2] =>
        val path = r.table.asInstanceOf[graft.sources.GraftTableV2].path
        path -> SnapshotManagement.snapshot(path).version
    }.toMap
  }
}

/** Resolution rule replacing a query subtree that exactly matches a fresh
  * materialized view's plan with a scan of the view table. */
case class RewriteQueryByMaterialView(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (RewriteQueryByMaterialView.inRewrite.get()) return plan
    val views = spark.conf.getOption(MaterializedViews.CONF_KEY)
      .filter(_.nonEmpty).map(_.split(",").toSeq).getOrElse(Nil)
    if (views.isEmpty || !plan.resolved) return plan
    views.foldLeft(plan) { (p, viewPath) =>
      MaterializedViews.readInfo(viewPath) match {
        case Some(info) if !MaterializedViews.isStale(info) =>
          rewriteWith(p, viewPath, info)
        case _ => p
      }
    }
  }

  /** Replace EVERY subtree whose canonicalized plan equals the view's plan
    * with a scan of the view, aliased to preserve the subtree's attribute
    * ids so enclosing filters/projects/aggregates resolve unchanged. */
  private def rewriteWith(
      plan: LogicalPlan, viewPath: String, info: MaterialViewInfo): LogicalPlan = {
    // re-analyzing the view's SQL must not re-enter this rule
    RewriteQueryByMaterialView.inRewrite.set(true)
    val viewPlan =
      try castToImpl(spark.sql(info.sqlText)).queryExecution.analyzed
      catch { case _: Exception => return plan }
      finally RewriteQueryByMaterialView.inRewrite.set(false)
    val viewCanonical = viewPlan.canonicalized
    plan.transformUp {
      case sub if sub.canonicalized == viewCanonical =>
        val scan = castToImpl(GraftRead.read(spark, viewPath))
          .queryExecution.analyzed
        val out = sub.output
        val scanOut = scan.output
        if (out.length == scanOut.length &&
            out.zip(scanOut).forall { case (a, b) => a.name == b.name }) {
          org.apache.spark.sql.catalyst.plans.logical.Project(
            scanOut.zip(out).map { case (s, o) =>
              org.apache.spark.sql.catalyst.expressions.Alias(s, o.name)(
                exprId = o.exprId, qualifier = o.qualifier)
            }, scan)
        } else sub
    }
  }
}

object RewriteQueryByMaterialView {
  private val inRewrite = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }
}
