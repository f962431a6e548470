package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` bridge (the standard extension-library
  * pattern, cf. Delta/Iceberg shims): exposes Dataset.ofRows so graft
  * can materialize a DataFrame from a custom LogicalPlan node. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Replace an eagerly-localCheckpointed DataFrame's inherited size
    * ESTIMATE with the checkpoint's actual materialised block size.
    * `Dataset.localCheckpoint` copies the pre-checkpoint plan's
    * estimated Statistics into `LogicalRDD.originStats`; Catalyst's
    * size-only estimator multiplies child sizes at every join, so in
    * an iterative self-joining loop that inherited estimate compounds
    * exponentially across rounds — by round ~10 the sizeInBytes
    * BigInt has millions of digits and the driver burns minutes in
    * BigInteger multiplication inside stats estimation. The actual
    * block size also gives the optimizer truthful broadcast decisions
    * for subsequent joins over the checkpoint. No-op on frames that
    * are not LogicalRDD-backed. */
  def resetCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        val sc = df.sparkSession.sparkContext
        val actual = sc.getRDDStorageInfo.find(_.id == lr.rdd.id)
          .map(i => BigInt(i.memSize + i.diskSize)).filter(_ > 0)
          // fallback (blocks not yet visible): a modest constant —
          // anything bounded beats the compounding estimate
          .getOrElse(BigInt(8L * 1024 * 1024))
        ofRows(df.sparkSession, new org.apache.spark.sql.execution.LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(
          df.sparkSession.asInstanceOf[classic.SparkSession],
          Some(org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = actual)),
          None))
      case _ => df
    }
}
