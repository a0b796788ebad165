package org.apache.spark.sql.graftbridge

import scala.annotation.tailrec

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the persisted RDD behind a `localCheckpoint()`'d Dataset
  * (its analyzed plan is a `private[sql]` `LogicalRDD` holding the
  * checkpoint RDD). Spark offers no public way to release a local
  * checkpoint before the ContextCleaner GCs it, so iterative loops
  * that checkpoint per round (the CC label loop) would otherwise
  * accumulate one persisted RDD per round for the life of the frames —
  * blocking storage memory that spills other work. The accessor is
  * deliberately narrow: only a LogicalRDD at the top of the plan —
  * allowing column-pruning Projects directly over it (the loop
  * returns `checkpointed.drop("chg")`) — resolves, so callers can
  * only free frames they themselves checkpointed. */
object RddBridge {
  def checkpointedRdd(df: Dataset[_]): Option[RDD[_]] = dig(
    df.queryExecution.analyzed)

  @tailrec private def dig(p: LogicalPlan): Option[RDD[_]] = p match {
    case l: LogicalRDD => Some(l.rdd)
    case pr: Project => dig(pr.child)
    case _ => None
  }
}
