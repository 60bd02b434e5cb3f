package graft.llm

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Pipeline-stage stabilization for the multi-pass LLM operators.
  *
  * The banded/bucketed dedup and ANN pipelines each feed an expensive
  * intermediate frame (signatures, fingerprints, unit vectors) into two or
  * three consumers. Re-running the producer per consumer doubles the work;
  * `persist()` avoids that but registers a CacheManager entry whose
  * canonicalized-plan matching taxes EVERY later query's planning in the
  * session (a measured 25x slowdown in a past round). The default is an
  * eager `localCheckpoint`: one materialization, truncated lineage, no
  * cache entry.
  *
  * `localCheckpoint` has a documented cluster caveat: its blocks live only
  * on executors with lineage cut, so under dynamic allocation a lost
  * executor fails the job unrecoverably. `spark.graft.checkpoint.mode`
  * picks the trade-off per deployment:
  *   - `local` (default): eager localCheckpoint — fastest, right for a
  *     static-executor or local[N] session.
  *   - `persist`: MEMORY_AND_DISK persist — recomputable on executor loss
  *     (elastic clusters), at the cost of lineage-sized plans and the
  *     CacheManager planning tax while the pipeline's blocks are live.
  *   - `none`: no stabilization — the producer re-runs per consumer;
  *     correct everywhere, predictable cost, no state left behind.
  *
  * Every stabilized block is tracked; [[releaseAll]] drops them once the
  * pipeline's result has been CONSUMED (releasing a localCheckpoint before
  * consumption would fail downstream jobs — the lineage is gone). The
  * benchmark calls it between runs; long-lived sessions should call it at
  * pipeline boundaries to keep the block manager flat.
  */
object Checkpoints {

  val MODE_KEY = "spark.graft.checkpoint.mode"

  // WEAK references: callers that never invoke releaseAll must not pin
  // blocks forever — once a pipeline's result is unreachable, the JVM GC +
  // Spark's ContextCleaner reclaim its blocks exactly as they reclaim any
  // abandoned checkpoint. releaseAll() just makes reclamation prompt.
  private val tracked =
    new ConcurrentLinkedQueue[java.lang.ref.WeakReference[AnyRef]]()

  def stabilize(df: DataFrame): DataFrame = {
    df.sparkSession.conf.getOption(MODE_KEY).getOrElse("local") match {
      case "none" => df
      case "persist" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        tracked.add(new java.lang.ref.WeakReference[AnyRef](p))
        p
      case _ =>
        val c = df.localCheckpoint()
        // the checkpointed blocks belong to the LogicalRDD's internal RDD;
        // track it directly so release does not depend on RDD GC timing
        castToImpl(c).queryExecution.analyzed.collectFirst {
          case lr: LogicalRDD => lr.rdd
        }.foreach(rdd => tracked.add(new java.lang.ref.WeakReference[AnyRef](rdd)))
        c
    }
  }

  /** Drop every still-reachable block stabilized since the last call. Only
    * call once the pipeline results built on them have been consumed. */
  def releaseAll(): Unit = {
    var ref = tracked.poll()
    while (ref != null) {
      ref.get() match {
        case rdd: org.apache.spark.rdd.RDD[_] => rdd.unpersist(blocking = false)
        case ds: org.apache.spark.sql.Dataset[_] => ds.unpersist(blocking = false)
        case _ => () // already collected — ContextCleaner handled it
      }
      ref = tracked.poll()
    }
  }
}
