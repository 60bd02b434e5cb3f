package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column, DelegatingCatalogExtension, Identifier, Table, TableCatalog}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.graft.SparkShims
import org.apache.spark.sql.types.StructType

import graft.meta.{SnapshotManagement, TableInfo}
import graft.sources.GraftTableV2

/** Catalog integration (reference `star/catalog/StarLakeCatalog.scala:51-546`):
  * a `DelegatingCatalogExtension` over the session catalog so that
  *
  * {{{
  *   CREATE TABLE t (id BIGINT, v STRING) USING graft
  *     PARTITIONED BY (c) TBLPROPERTIES ('hashPartitions'='id', ...)
  *   INSERT INTO t ...
  *   SELECT ... FROM t
  *   DROP TABLE t
  * }}}
  *
  * work in SQL. Non-graft tables pass through untouched. Enable with
  * `spark.sql.catalog.spark_catalog=graft.catalog.GraftCatalog`.
  */
class GraftCatalog extends DelegatingCatalogExtension
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  import GraftCatalog.PROP_GRAFT_EXTERNAL

  private def spark: SparkSession = SparkSession.active

  // ---- SQL CALL surface (system.compact / system.zorder / system.vacuum)

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    val inSystem = ident.namespace().map(_.toLowerCase)
      .sameElements(GraftProcedures.NAMESPACE)
    (if (inSystem) GraftProcedures.load(ident.name()) else None).getOrElse(
      throw new RuntimeException(
        s"procedure not found: ${ident.namespace().mkString(".")}.${ident.name()}" +
        s" (graft procedures live in ${GraftProcedures.NAMESPACE.mkString(".")})"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.map(_.toLowerCase).sameElements(GraftProcedures.NAMESPACE))
      GraftProcedures.all
        .map(Identifier.of(GraftProcedures.NAMESPACE, _)).toArray
    else Array.empty

  private def isGraftProvider(properties: util.Map[String, String]): Boolean =
    Option(properties.get(TableCatalog.PROP_PROVIDER))
      .exists(_.equalsIgnoreCase("graft"))

  private def tablePathFor(ident: Identifier, properties: util.Map[String, String]): String = {
    Option(properties.get(TableCatalog.PROP_LOCATION))
      .map(SnapshotManagement.normalize)
      .getOrElse {
        val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        val db = if (ident.namespace().isEmpty) "default" else ident.namespace().mkString("/")
        SnapshotManagement.normalize(s"$warehouse/$db.db/${ident.name()}")
      }
  }

  override def createTable(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (!isGraftProvider(properties)) {
      return super.createTable(ident, columns, partitions, properties)
    }
    val schema = SparkShims.v2ColumnsToStructType(columns)
    val path = tablePathFor(ident, properties)
    val (rangeCols0, hashCols0, bucketNum) =
      parsePartitioning(partitions, properties)
    val rangeCols = normalizeAgainstSchema(rangeCols0, schema, "partition")
    val hashCols = normalizeAgainstSchema(hashCols0, schema, "hashPartitions")
    if (hashCols.nonEmpty) require(bucketNum > 0,
      s"hashPartitions [${hashCols.mkString(", ")}] needs an explicit " +
      "hashBucketNum > 0")

    if (!SnapshotManagement.exists(path)) {
      val info = TableInfo(
        tableId = java.util.UUID.randomUUID().toString,
        schemaJson = schema.json,
        rangeColumns = rangeCols,
        hashColumns = hashCols,
        bucketNum = bucketNum,
        configuration = properties.asScala.toMap
          .filter { case (k, _) => k.startsWith("graft.") },
        shortName = Some(ident.name()))
      SnapshotManagement.withNewTransaction(path) { txn =>
        txn.commit("create", Some(info), Nil, Nil)
      }
    }
    // register in the session catalog too so name resolution works
    val withLoc = new util.HashMap[String, String](properties)
    // A user-supplied LOCATION makes the table external in the lake sense:
    // DROP TABLE must unregister it without destroying the user's data
    // (Spark/Delta external-table semantics). Warehouse-managed graft
    // tables delete their data on drop as usual.
    if (properties.containsKey(TableCatalog.PROP_LOCATION)) {
      withLoc.put(PROP_GRAFT_EXTERNAL, "true")
    }
    withLoc.put(TableCatalog.PROP_LOCATION, path)
    withLoc.put(TableCatalog.PROP_EXTERNAL, "true")
    // Register with range-partition columns LAST (the graft read order, and
    // the order `GraftTableV2.schema()` reports): the session catalog
    // re-infers the schema from the provider at create time and rejects the
    // registration if the declared order differs — `CREATE TABLE (id, data)
    // PARTITIONED BY (id)` must register as (data, id).
    val rangeLower = rangeCols.map(_.toLowerCase).toSet
    val reordered =
      columns.filterNot(c => rangeLower.contains(c.name.toLowerCase)) ++
        rangeCols.flatMap(r => columns.find(_.name.equalsIgnoreCase(r)))
    super.createTable(ident, reordered, partitions, withLoc)
    new GraftTableV2(spark, path)
  }

  private def parsePartitioning(
      partitions: Array[Transform],
      properties: util.Map[String, String]): (Seq[String], Seq[String], Int) = {
    var range = Seq.empty[String]
    var hash = Seq.empty[String]
    var buckets = -1
    partitions.foreach { t =>
      t.name() match {
        case "identity" =>
          range :+= t.references().head.fieldNames().mkString(".")
        case "bucket" =>
          hash = t.references().map(_.fieldNames().mkString(".")).toSeq
          buckets = t.arguments().collectFirst {
            case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
              l.value().toString.toInt
          }.getOrElse(-1)
        case other =>
          throw new UnsupportedOperationException(
            s"graft tables support identity/bucket partitioning, got $other")
      }
    }
    Option(properties.get("hashPartitions")).foreach(h =>
      hash = h.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    Option(properties.get("hashBucketNum")).foreach(n => buckets = n.toInt)
    (range, hash, buckets)
  }

  /** Resolve each declared partition/key column against the schema,
    * case-insensitively, returning the SCHEMA's exact spelling. The layout
    * is immutable once created: an off-case (`'ID'` vs `id`) or typo'd
    * name accepted verbatim here would commit a TableInfo whose key column
    * the case-sensitive write path can never satisfy — a permanently
    * unusable table. Fail at CREATE instead (the DataFrame write path's
    * normalizePartitionCol contract). */
  private def normalizeAgainstSchema(
      cols: Seq[String], schema: StructType, what: String): Seq[String] =
    cols.map { c =>
      schema.fieldNames.find(_.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"$what column $c not found in table schema " +
          s"[${schema.fieldNames.mkString(", ")}]"))
    }

  override def loadTable(ident: Identifier): Table = {
    val t = super.loadTable(ident)
    asGraft(t).getOrElse(t)
  }

  /** SQL time travel: `SELECT ... FROM t VERSION AS OF n`. Also accepts a
    * numeric string; non-graft tables fall through to the delegate (which
    * throws unless the underlying source supports versioning). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = super.loadTable(ident)
    asGraft(t) match {
      case Some(g) => new GraftTableV2(spark, g.path,
        extraOptions = Map("versionAsOf" -> version))
      case None => super.loadTable(ident, version)
    }
  }

  /** SQL time travel: `... TIMESTAMP AS OF '...'` — Spark hands the resolved
    * timestamp as MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = super.loadTable(ident)
    asGraft(t) match {
      case Some(g) => new GraftTableV2(spark, g.path,
        extraOptions = Map("timestampAsOf" -> (timestamp / 1000L).toString))
      case None => super.loadTable(ident, timestamp)
    }
  }

  private def asGraft(t: Table): Option[GraftTableV2] = {
    val props = t.properties()
    if (isGraftProvider(props)) {
      val loc = Option(props.get(TableCatalog.PROP_LOCATION))
      loc.map(l => new GraftTableV2(spark, SnapshotManagement.normalize(l)))
    } else None
  }

  override def alterTable(
      ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val existing = super.loadTable(ident)
    asGraft(existing) match {
      case None => super.alterTable(ident, changes: _*)
      case Some(g) =>
        val path = g.path
        SnapshotManagement.withRewriteTransaction(path) { txn =>
          val snap = txn.snapshotOpt.getOrElse(
            throw new graft.meta.GraftTableNotFoundException(path))
          var info = snap.tableInfo
          var schema = info.schema
          val renames = scala.collection.mutable.LinkedHashMap.empty[String, String]
          // re-adds of tombstoned names, keyed by full field path (nested
          // paths address fields inside structs)
          val readds = scala.collection.mutable.LinkedHashMap
            .empty[Seq[String], org.apache.spark.sql.types.DataType]
          // top-level columns whose nested fields were renamed: files
          // address fields by name, so these need a struct-cast rewrite
          val nestedRenamed = scala.collection.mutable.LinkedHashSet.empty[String]
          def isKeyColumn(n: String): Boolean =
            info.rangeColumns.contains(n) || info.hashColumns.contains(n)
          def dotted(path: Seq[String]): String =
            path.map(_.toLowerCase).mkString(".")
          changes.foreach {
            case a: TableChange.AddColumn =>
              val fieldPath = a.fieldNames().toSeq
              val key = dotted(fieldPath)
              // ANY column (top-level or nested) added to a table that
              // already holds data files must be nullable: existing rows
              // read NULL through the scan's null-fill, which a NOT NULL
              // declaration would contradict (and codegen would then skip
              // null checks and read garbage).
              require(a.isNullable || snap.files.isEmpty,
                s"cannot add NOT NULL column $key to a table with existing " +
                "data files: existing rows backfill to NULL; add it as " +
                "nullable (or to an empty table)")
              if (info.droppedColumns.contains(key)) {
                // the name was dropped metadata-only and old files still
                // physically hold its pre-drop values — rewrite them below
                // so the re-added column reads NULL, not resurrected data
                require(a.isNullable,
                  s"cannot re-add previously dropped column $key as NOT " +
                  "NULL: existing rows backfill to NULL")
                readds += fieldPath -> a.dataType()
                info = info.copy(droppedColumns =
                  info.droppedColumns.filterNot(_ == key))
              }
              schema = graft.schema.SchemaUtils
                .updateStructAt(schema, fieldPath.init) { st =>
                  require(!st.fieldNames.contains(fieldPath.last),
                    s"column $key already exists")
                  st.add(fieldPath.last, a.dataType(), a.isNullable)
                }
            case u: TableChange.UpdateColumnNullability =>
              require(u.fieldNames().length == 1,
                "nested nullability changes are not supported")
              require(u.nullable(), "tightening nullability is not supported")
              schema = StructType(schema.fields.map(f =>
                if (f.name == u.fieldNames().head) f.copy(nullable = true) else f))
            case u: TableChange.UpdateColumnType =>
              // metadata-only widening: Spark 4's parquet readers promote
              // int->long / float->double etc. at scan time — per LEAF
              // column, so nested fields widen the same way. Hash/range
              // columns are layout-bearing (bucket = hash(value) depends on
              // the value's type) — reject; nested fields can never be keys.
              val fieldPath = u.fieldNames().toSeq
              if (fieldPath.length == 1) {
                require(!isKeyColumn(fieldPath.head),
                  s"cannot change type of partition/primary-key column " +
                  fieldPath.head)
              }
              schema = graft.schema.SchemaUtils
                .updateStructAt(schema, fieldPath.init) { st =>
                  val field = st.fields.find(_.name == fieldPath.last).getOrElse(
                    throw new IllegalArgumentException(
                      s"no such column ${dotted(fieldPath)}"))
                  require(org.apache.spark.sql.catalyst.expressions.Cast
                    .canUpCast(field.dataType, u.newDataType()),
                    s"only widening type changes are supported: " +
                    s"${field.dataType.simpleString} -> " +
                    u.newDataType().simpleString)
                  StructType(st.fields.map(f =>
                    if (f.name == fieldPath.last) f.copy(dataType = u.newDataType())
                    else f))
                }
            case d: TableChange.DeleteColumn =>
              // metadata-only: scans simply stop reading the field; a
              // tombstone records that live files still hold its data
              val fieldPath = d.fieldNames().toSeq
              val key = dotted(fieldPath)
              if (fieldPath.length == 1) {
                require(!isKeyColumn(fieldPath.head),
                  s"cannot drop partition/primary-key column ${fieldPath.head}")
                require(schema.fields.length > 1, "cannot drop the last column")
              }
              schema = graft.schema.SchemaUtils
                .updateStructAt(schema, fieldPath.init) { st =>
                  require(st.fieldNames.contains(fieldPath.last),
                    s"no such column $key")
                  require(fieldPath.length == 1 || st.fields.length > 1,
                    s"cannot drop the last field of struct " +
                    s"${dotted(fieldPath.init)}")
                  StructType(st.fields.filterNot(_.name == fieldPath.last))
                }
              if (snap.files.nonEmpty) {
                info = info.copy(droppedColumns =
                  (info.droppedColumns :+ key).distinct)
              }
            case r: TableChange.RenameColumn =>
              // rename needs a transactional data rewrite: files address
              // columns (and nested fields) by NAME — no column-id mapping —
              // so a metadata-only rename would null the data on read
              val fieldPath = r.fieldNames().toSeq
              schema = graft.schema.SchemaUtils
                .updateStructAt(schema, fieldPath.init) { st =>
                  require(st.fieldNames.contains(fieldPath.last),
                    s"no such column ${dotted(fieldPath)}")
                  require(!st.fieldNames.contains(r.newName()),
                    s"column ${r.newName()} already exists")
                  StructType(st.fields.map(f =>
                    if (f.name == fieldPath.last) f.copy(name = r.newName())
                    else f))
                }
              if (fieldPath.length == 1) renames += fieldPath.head -> r.newName()
              else nestedRenamed += fieldPath.head
            case c: TableChange.UpdateColumnComment =>
              require(c.fieldNames().length == 1, "nested columns not supported")
              val name = c.fieldNames().head
              require(schema.fieldNames.contains(name), s"no such column $name")
              schema = StructType(schema.fields.map(f =>
                if (f.name == name) f.withComment(c.newComment()) else f))
            case p: TableChange.UpdateColumnPosition =>
              // metadata-only: files are addressed by column name, so order
              // is purely a schema-presentation concern
              require(p.fieldNames().length == 1, "nested columns not supported")
              val name = p.fieldNames().head
              val field = schema.fields.find(_.name == name).getOrElse(
                throw new IllegalArgumentException(s"no such column $name"))
              val rest = schema.fields.filterNot(_.name == name)
              val reordered = p.position() match {
                case _: org.apache.spark.sql.connector.catalog.TableChange.First =>
                  field +: rest
                case a: org.apache.spark.sql.connector.catalog.TableChange.After =>
                  val idx = rest.indexWhere(_.name == a.column())
                  require(idx >= 0, s"no such column ${a.column()}")
                  (rest.take(idx + 1) :+ field) ++ rest.drop(idx + 1)
                case other => throw new UnsupportedOperationException(
                  s"unsupported position $other")
              }
              schema = StructType(reordered)
            case s: TableChange.SetProperty =>
              info = info.copy(configuration =
                info.configuration + (s.property() -> s.value()))
            case r: TableChange.RemoveProperty =>
              info = info.copy(configuration = info.configuration - r.property())
            case other =>
              throw new UnsupportedOperationException(
                s"ALTER TABLE change not supported on graft tables: $other")
          }
          graft.schema.SchemaUtils.validateSchema(schema)
          val newInfo = info.copy(
            schemaJson = schema.json,
            rangeColumns = info.rangeColumns.map(c => renames.getOrElse(c, c)),
            hashColumns = info.hashColumns.map(c => renames.getOrElse(c, c)))
          if ((renames.nonEmpty || readds.nonEmpty || nestedRenamed.nonEmpty)
              && snap.files.nonEmpty) {
            import org.apache.spark.sql.functions.{col, lit}
            val df0 = graft.commands.GraftTableFiles.read(spark, path, snap, snap.files)
            val renamed = renames.foldLeft(df0) { case (d, (from, to)) =>
              d.withColumnRenamed(from, to)
            }
            // nested renames: cast the top-level struct to its NEW type —
            // struct casts match fields by POSITION, and a rename keeps
            // positions, so the cast is exactly the field-name rewrite
            val newSchemaByName = schema.fields.map(f => f.name -> f.dataType).toMap
            val nested = nestedRenamed.foldLeft(renamed) { (d, top) =>
              d.withColumn(top, col(s"`$top`").cast(newSchemaByName(top)))
            }
            // re-added tombstoned fields materialize as NULL so rewritten
            // files no longer carry the stale pre-drop values
            val df = readds.foldLeft(nested) { case (d, (p, dt)) =>
              if (p.length == 1)
                d.withColumn(p.head, lit(null).cast(dt))
              else
                d.withColumn(p.head, col(s"`${p.head}`")
                  .withField(p.tail.mkString("."), lit(null).cast(dt)))
            }
            val files = graft.write.TransactionalWrite.writeFiles(
              spark, path, newInfo, df, isBase = true)
            txn.commit("alter", Some(newInfo), files, snap.files)
          } else {
            txn.commit("alter", Some(newInfo), Nil, Nil)
          }
        }
        super.alterTable(ident, changes: _*)
        new GraftTableV2(spark, path)
    }
  }

  override def dropTable(ident: Identifier): Boolean = {
    val existing = try Some(super.loadTable(ident)) catch { case _: Exception => None }
    val graftPath = existing.flatMap(asGraft).map(_.path)
    val isExternal = existing.exists(t =>
      Option(t.properties().get(PROP_GRAFT_EXTERNAL)).exists(_.toBoolean))
    val dropped = super.dropTable(ident)
    graftPath.foreach { p =>
      if (isExternal) SnapshotManagement.invalidate(p) // metadata-only drop
      else graft.commands.DropCommands.dropTable(p)
    }
    dropped
  }
}

object GraftCatalog {
  /** Marks a table registered over a user-supplied LOCATION. */
  val PROP_GRAFT_EXTERNAL = "graft.external"
}
