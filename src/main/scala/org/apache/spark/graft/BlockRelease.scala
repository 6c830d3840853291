/*
 * Lives in package org.apache.spark to reach the `private[spark]`
 * SparkContext.unpersistRDD — the standard access-shim pattern used by
 * Spark-ecosystem libraries when a needed internal has no public twin.
 */
package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Block-level release for ledgered `localCheckpoint` RDDs.
  *
  * `RDD.unpersist` is the public route, but it does two things the
  * engine's checkpoint ledger (graft.Checkpoints) must not inherit:
  *
  *  1. it logs a scare WARN ("was locally checkpointed … cannot be
  *     recomputed after unpersisting") on EVERY locally-checkpointed
  *     RDD, unconditionally — with ~4 checkpoints per flagship-query
  *     build and 5 bench reps this floods hundreds of WARNs into a log
  *     whose purpose is to surface real anomalies;
  *  2. it sets the RDD's storageLevel to NONE, so a checkpoint released
  *     BEFORE its lazy materialization (a runner calling release() on a
  *     build whose plan never executed some branch) is left in a state
  *     where a later compute cannot cache-and-truncate correctly.
  *
  * This shim calls the same internal `SparkContext.unpersistRDD` that
  * `RDD.unpersist` delegates to — identical block-manager removal,
  * persistentRdds bookkeeping, and listener event — while leaving the
  * RDD's storageLevel mark intact. Consequences, both deliberate:
  *
  *  - a MATERIALIZED checkpoint loses its only copy, exactly as with
  *    `unpersist` (the ledger contract — release only between queries —
  *    is what makes that safe, not the API used);
  *  - an UNMATERIALIZED lazy checkpoint is a pure bookkeeping no-op
  *    (no blocks exist yet) and the frame remains fully usable — the
  *    release-before-materialize case is safe by construction instead
  *    of corrupting the checkpoint's storage target.
  *
  * Liveness checks must use [[isPersisted]] (driver-side registry),
  * not `rdd.getStorageLevel` — the level mark intentionally survives
  * release here.
  */
object BlockRelease {

  /** Remove all of `rddId`'s blocks. `blocking = true` waits for every
    * block-manager removal to complete — the runner-side release path
    * uses this (outside any timed region) so freed memory is actually
    * free before the next build starts, instead of an async backlog
    * competing with it.
    */
  def unpersist(sc: SparkContext, rddId: Int, blocking: Boolean): Unit =
    sc.unpersistRDD(rddId, blocking)

  /** Whether `rddId` is still registered as persisted (its blocks have
    * not been released). Driver-side map lookup, O(1).
    */
  def isPersisted(sc: SparkContext, rddId: Int): Boolean =
    sc.persistentRdds.contains(rddId)
}
