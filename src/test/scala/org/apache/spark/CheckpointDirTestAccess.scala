package org.apache.spark

/** Test-only accessor: `SparkContext.checkpointDir` is `private[spark]`
  * with no public unset, but LineageSpec must clear it after exercising
  * the reliable-checkpoint path — the fixture session is shared across
  * suites, and leaving a checkpoint dir set would silently flip every
  * later iterative-operator test onto the on-disk path. */
object CheckpointDirTestAccess {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
