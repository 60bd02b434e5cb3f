package graft.sources

import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate

/** Parsing for runtime (dynamic partition pruning) V2 predicates.
  *
  * When a join's build side finishes, Spark converts the completed
  * `InSubqueryExec` into `Predicate("IN", ref +: literals)`
  * (`DataSourceV2Strategy.translateRuntimeFilterV2`) and hands it to any
  * scan implementing `SupportsRuntimeV2Filtering`. The literal values are
  * catalyst INTERNAL representations (`UTF8String` for strings, boxed
  * `Long`/`Int`/`Double`, `Decimal`, days-since-epoch ints for dates) —
  * exactly what partition-value casts and `Murmur3Hash.eval` consume, so no
  * external/internal conversion happens here. (Matched through the public
  * `Literal` interface: the `LiteralValue` case class is `private[sql]`.)
  */
object RuntimeFilters {

  /** Extract (top-level column name, literal values) from an `IN` or `=`
    * runtime predicate on a single non-nested column; `None` for any other
    * shape (callers must treat unparsed predicates as "keep everything" —
    * runtime filtering is an optimization, never a correctness gate). */
  def parse(p: Predicate): Option[(String, Seq[V2Literal[_]])] = {
    val kids = p.children()
    if (kids.length < 2) return None
    (p.name, kids(0)) match {
      case ("IN", ref: NamedReference)
          if ref.fieldNames.length == 1 &&
            kids.tail.forall(_.isInstanceOf[V2Literal[_]]) =>
        Some(ref.fieldNames()(0) ->
          kids.toSeq.tail.map(_.asInstanceOf[V2Literal[_]]))
      case ("=", ref: NamedReference)
          if ref.fieldNames.length == 1 && kids.length == 2 &&
            kids(1).isInstanceOf[V2Literal[_]] =>
        Some(ref.fieldNames()(0) -> Seq(kids(1).asInstanceOf[V2Literal[_]]))
      case _ => None
    }
  }

  /** Merge a new value set into per-column runtime state: repeated `filter`
    * calls AND together, so value sets intersect. */
  def intersect(
      state: Map[String, Set[Any]],
      col: String,
      values: Set[Any]): Map[String, Set[Any]] =
    state.updated(col, state.get(col).map(_.intersect(values)).getOrElse(values))
}
