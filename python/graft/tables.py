"""Python binding for graft tables (reference ``python/star/tables.py``).

Thin py4j wrappers over the JVM-side ``graft.tables.PyBridge``; every
operation is the same transactional command the Scala API runs. Use from a
PySpark session whose JVM has the graft jar on its classpath::

    from graft.tables import GraftTable

    t = GraftTable.forPath(spark, "/path/to/table")
    t.upsert(df)
    t.update(condition="id = 3", set={"v": "v * 2"})
    t.delete("v < 0")
    t.compaction()
"""

from pyspark.sql import Column, DataFrame, functions


class GraftTable(object):
    """A graft table addressed by its root path."""

    def __init__(self, spark, jtable):
        self._spark = spark
        self._jtable = jtable
        self._jbridge = spark._sc._jvm.graft.tables.PyBridge

    # ---- constructors ---------------------------------------------------

    @classmethod
    def forPath(cls, sparkSession, path):
        """Load the graft table rooted at ``path``."""
        assert sparkSession is not None
        jtable = sparkSession._sc._jvm.graft.tables.PyBridge.forPath(
            sparkSession._jsparkSession, path)
        return cls(sparkSession, jtable)

    @classmethod
    def forName(cls, sparkSession, tableOrViewName):
        """Load the graft table behind a catalog table or view name."""
        assert sparkSession is not None
        jtable = sparkSession._sc._jvm.graft.tables.PyBridge.forName(
            sparkSession._jsparkSession, tableOrViewName)
        return cls(sparkSession, jtable)

    @classmethod
    def registerMergeOperator(cls, sparkSession, className):
        """Register a JVM GraftMergeOperator class by fully qualified name.

        Registered operators are usable from SQL via the
        ``graft_merge_op_<name>(col)`` marker functions and from
        ``mergeOperators`` scan options.
        """
        assert sparkSession is not None
        sparkSession._sc._jvm.graft.tables.PyBridge.registerMergeOperator(
            className)

    @classmethod
    def isGraftTable(cls, sparkSession, path):
        """Whether ``path`` is the root of a graft table."""
        assert sparkSession is not None
        return sparkSession._sc._jvm.graft.tables.PyBridge.exists(path)

    @classmethod
    def snapshotSql(cls, sparkSession, sqlText):
        """Run ``sqlText`` snapshot-isolated: every graft relation is
        pinned to one consistent snapshot at analysis, so a multi-table
        query cannot observe different versions of its tables even while
        writers commit concurrently."""
        assert sparkSession is not None
        jdf = sparkSession._sc._jvm.graft.tables.PyBridge.snapshotSql(
            sparkSession._jsparkSession, sqlText)
        return DataFrame(jdf, sparkSession)

    # ---- reads ----------------------------------------------------------

    def toDF(self):
        """DataFrame over the table's current snapshot (merge-on-read)."""
        return DataFrame(self._jbridge.toDF(self._jtable), self._spark)

    def alias(self, aliasName):
        """Aliased DataFrame view of the table (reference ``tables.py``)."""
        return self.toDF().alias(aliasName)

    def history(self):
        """DataFrame of the table's commit history."""
        return DataFrame(self._jbridge.history(self._jtable), self._spark)

    def detail(self):
        """One-row table summary (layout, file/byte counts) from the
        manifest — zero data I/O."""
        return DataFrame(self._jbridge.detail(self._jtable), self._spark)

    def partitions(self):
        """Range partitions with per-partition file/byte/row counts from
        the manifest — zero data I/O."""
        return DataFrame(self._jbridge.partitions(self._jtable), self._spark)

    def restore(self, version):
        """Rewind the table to ``version`` (metadata-only commit; lineage
        preserved). Returns the restore commit's version."""
        return self._jbridge.restore(self._jtable, int(version))

    def restoreToTimestamp(self, timestamp):
        """Rewind to the newest version committed at or before
        ``timestamp`` (timestamp string, yyyyMMdd date, or epoch millis)."""
        return self._jbridge.restoreToTimestamp(self._jtable, str(timestamp))

    def changes(self, startVersion, endVersion=-1):
        """Change Data Feed over ``[startVersion, endVersion]``.

        Row-level changes with ``_change_type`` / ``_commit_version`` /
        ``_commit_timestamp`` columns (Delta-CDF column convention);
        ``endVersion=-1`` means the latest version.
        """
        return DataFrame(
            self._jbridge.changes(self._jtable, int(startVersion),
                                  int(endVersion)), self._spark)

    # ---- DML ------------------------------------------------------------

    def upsert(self, source, mode="delta", condition=None):
        """Upsert ``source`` by primary key (``mode``: "delta" or "merge").

        ``condition`` (a range-partition predicate SQL string) scopes a
        merge-mode rewrite to the matching partitions.
        """
        if not isinstance(source, DataFrame):
            raise TypeError(
                "source must be a DataFrame, got %s" % type(source))
        if condition is None:
            self._jbridge.upsert(self._jtable, source._jdf, mode)
        else:
            self._jbridge.upsert(self._jtable, source._jdf, mode, condition)

    def applyChanges(self, source, opColumn, sequenceColumns=None,
                     deleteOps=None):
        """CDC APPLY: ingest a change batch (op column marking deletes,
        optional sequence columns ordering multiple changes per key) as
        one atomic delta commit. Per key the greatest change by the
        sequence survives; ties break deletes-win."""
        if not isinstance(source, DataFrame):
            raise TypeError(
                "source must be a DataFrame, got %s" % type(source))
        seqs = list(sequenceColumns or [])
        dels = list(deleteOps or ["delete", "d"])
        self._jbridge.applyChanges(
            self._jtable, source._jdf, opColumn, seqs, dels)

    def update(self, condition=None, set=None):
        """Update rows matching ``condition`` with the ``set`` rules.

        ``condition`` is a SQL string or Column (None updates every row);
        ``set`` maps column names to SQL strings or Columns.
        """
        if set is None:
            raise ValueError("'set' is required")
        jcond = self._to_jcolumn(
            condition if condition is not None else functions.lit(True))
        jmap = self._spark._sc._jvm.java.util.HashMap()
        for name, value in set.items():
            if not isinstance(name, str):
                raise TypeError(
                    "'set' keys must be column-name strings, got %s"
                    % type(name))
            jmap.put(name, self._to_jcolumn(value, "'set' value"))
        self._jbridge.update(self._jtable, jcond, jmap)

    def delete(self, condition=None):
        """Delete rows matching ``condition`` (None deletes every row)."""
        if condition is None:
            self._jbridge.deleteExpr(self._jtable, "true")
        else:
            self._jbridge.delete(self._jtable, self._to_jcolumn(condition))

    # ---- maintenance ----------------------------------------------------

    def zOrder(self, cols, partitionPredicate=None):
        """Rewrite clustered on the Morton curve of ``cols`` so manifest
        min/max stats prune filters on every listed column (non-PK
        tables)."""
        self._jbridge.zOrder(self._jtable, list(cols),
                             partitionPredicate or "")

    def compaction(self, force=True, partitionPredicate=None,
                   mergeOperatorInfo=None):
        """Merge delta files (and bin-pack small files) into base files.

        ``mergeOperatorInfo`` (dict of column -> operator name) materializes
        operator results into the rewritten files (reference
        ``compaction(mergeOperatorInfo)``).
        """
        if partitionPredicate is not None \
                and not isinstance(partitionPredicate, str):
            raise TypeError("partitionPredicate must be a SQL string, got %s"
                            % type(partitionPredicate))
        if mergeOperatorInfo is None:
            self._jbridge.compaction(
                self._jtable, bool(force), partitionPredicate or "")
        else:
            jmap = self._spark._sc._jvm.java.util.HashMap()
            for k, v in mergeOperatorInfo.items():
                jmap.put(k, v)
            self._jbridge.compaction(
                self._jtable, bool(force), partitionPredicate or "", jmap)

    def rebucket(self, newBucketNum):
        """Change the table's hash-bucket count in one transactional
        rewrite (primary-key tables). Returns the rebucket commit's
        version."""
        return self._jbridge.rebucket(self._jtable, int(newBucketNum))

    def cloneTo(self, destPath, version=None):
        """Zero-copy SHALLOW CLONE of this table into ``destPath``
        (optionally at a past ``version``). The clone references the
        source's data files; its own writes land under ``destPath``, and a
        ``compaction(force=True)`` localizes it fully. Returns the source
        version the clone reflects."""
        if version is None:
            return self._jbridge.cloneTo(self._jtable, destPath)
        return self._jbridge.cloneTo(self._jtable, destPath, int(version))

    def cloneDeep(self, destPath, version=None):
        """DEEP clone: ``cloneTo`` followed by localization — a forced
        compaction rewrites every source reference into files under
        ``destPath`` before returning, so the clone has zero dependency on
        the source's storage. Returns the source version cloned."""
        if version is None:
            return self._jbridge.cloneDeep(self._jtable, destPath)
        return self._jbridge.cloneDeep(self._jtable, destPath, int(version))

    def replicateTo(self, destPath, checkpointDir):
        """Continuous table-to-table replication: tail this table's
        change feed and apply each microbatch into the PK replica at
        ``destPath`` as one atomic commit (exactly-once under restarts).
        Self-heals on source schema evolution: the stream restarts itself
        against the same checkpoint so new columns flow with no operator
        action. Returns the pyspark StreamingQuery; stop it to stop
        replication."""
        from pyspark.sql.streaming import StreamingQuery
        return StreamingQuery(self._jbridge.replicateTo(
            self._jtable, destPath, checkpointDir))

    def replicationStatus(self, destPath):
        """Replication lag of the replica at ``destPath`` fed from this
        table: a dict with ``sourcePath``, ``sourceVersion``,
        ``appliedVersion``, ``pendingVersions`` (change-bearing source
        versions not yet applied — pure rewrites never count) and
        ``inSync``. One sidecar read plus one metadata probe per
        unapplied version; no data files are touched."""
        st = self._jbridge.replicationStatusOf(self._jtable, destPath)
        return {
            "sourcePath": st.sourcePath(),
            "sourceVersion": st.sourceVersion(),
            "appliedVersion": st.appliedVersion(),
            "pendingVersions": st.pendingVersions(),
            "inSync": st.inSync(),
        }

    def generateManifest(self):
        """Export the current snapshot as symlink-format manifests for
        external engines; refuses merge-on-read state (delta stacks, DVs,
        tombstones, merge operators) with a compaction remedy. Returns
        the number of manifest files written."""
        return self._jbridge.generateManifest(self._jtable)

    def cloneToAtTimestamp(self, destPath, timestamp):
        """``cloneTo`` at the newest version committed at or before
        ``timestamp`` (same accepted forms as the ``timestampAsOf`` read
        option: timestamp strings, yyyyMMdd dates, epoch millis)."""
        return self._jbridge.cloneToAtTimestamp(
            self._jtable, destPath, str(timestamp))

    def cleanup(self, retainMillis=5 * 3600 * 1000, dryRun=False):
        """Vacuum unreferenced files older than ``retainMillis``.

        Returns the list of removed (or, with ``dryRun``, removable) paths.
        """
        return list(self._jbridge.cleanup(
            self._jtable, int(retainMillis), bool(dryRun)))

    def dropPartition(self, predicate):
        """Drop the range partitions matching the SQL ``predicate``."""
        if not isinstance(predicate, str):
            raise TypeError(
                "predicate must be a SQL string, got %s" % type(predicate))
        self._jbridge.dropPartition(self._jtable, predicate)

    def dropTable(self):
        """Delete the table's data and metadata."""
        self._jbridge.dropTable(self._jtable)

    # ---- helpers --------------------------------------------------------

    def _to_jcolumn(self, condition, argname="'condition'"):
        if isinstance(condition, Column):
            return condition._jc
        if isinstance(condition, str):
            return functions.expr(condition)._jc
        raise TypeError(
            "%s must be a Column or a SQL string, got %s"
            % (argname, type(condition)))
