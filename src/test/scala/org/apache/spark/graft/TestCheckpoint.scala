package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only: clear a SparkContext's checkpoint dir so one suite's
  * reliable-checkpoint scenario doesn't leak into the shared session
  * (there is no public unset API; `checkpointDir` is private[spark]). */
object TestCheckpoint {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
