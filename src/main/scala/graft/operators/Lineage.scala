package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block hygiene for iterative operators. A `localCheckpoint` pins
  * its materialized blocks in the block manager for the life of the
  * session; a loop that checkpoints every round therefore keeps every
  * DEAD round resident and squeezes later queries' storage — observed
  * as order-dependent slowdowns in full-suite benches (queries that
  * run after checkpoint-heavy iterative ones lose storage memory to
  * rounds nothing will ever read again). Freeing the previous round
  * once the next is materialized caps pinned storage at one round's
  * working set, which is also the honest 100 TB posture: a cluster
  * job that snapshots every iteration of a shrinking edge table and
  * never deletes them would fill the cluster store the same way.
  */
object Lineage {

  /** Unpersist the materialized blocks behind a localCheckpointed
    * frame (no-op for any other plan). ONLY call on frames that are
    * DEAD — nothing will read them again. localCheckpoint TRUNCATES
    * lineage, so a reader racing the release cannot recompute the
    * blocks; it fails. Never call on caller-supplied inputs (which
    * may be shared, e.g. a `materialized` stage several queries
    * reuse), and note the release walks the WHOLE analyzed plan: a
    * frame merely DERIVED from a shared checkpoint would free the
    * shared upstream blocks too — free the root checkpointed frame
    * itself, which is what every current caller passes. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
