package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed CDC state maintained with `flatMapGroupsWithState` — the
  * custom-state alternative to the sink-side merge: instead of folding
  * changes into an external table per batch, the stream itself carries the
  * current image of every key (the reference's implicit "state" is the
  * MySQL table; here it lives in Spark's state store, checkpointed with
  * the query).
  *
  * State is bounded: a processing-time timeout evicts keys idle longer
  * than `idleTimeout` — at 100 TB keyed state must have an eviction story
  * or the state store becomes the bottleneck. Late/out-of-order events
  * within a key are handled by ignoring any change older than the applied
  * image (`ts` monotonicity per key).
  */
object StatefulApply {

  /** One decoded change for a key (simplified to the balance column). */
  case class KeyChange(id: String, ts: Long, op: String, balance: Option[Double])

  /** Current image of a key. */
  case class KeyImage(id: String, ts: Long, balance: Double)

  /** `idleTimeout = Some(duration)` enables state eviction via
    * ProcessingTimeTimeout — for continuously-running deployments only:
    * with an AvailableNow/Once trigger the timer processing keeps the
    * query alive with empty batches forever, so bounded runs must pass
    * None (observed on Spark 4.1.2). */
  def latestImages(
      changes: Dataset[KeyChange],
      idleTimeout: Option[String] = None): Dataset[KeyImage] = {
    import changes.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    changes
      .groupByKey(_.id)
      .flatMapGroupsWithState[KeyImage, KeyImage](
        OutputMode.Update(), timeoutConf) {
        (id: String, incoming: Iterator[KeyChange], state: GroupState[KeyImage]) => {
          if (state.hasTimedOut) {
            state.remove() // bounded state: evict idle keys
            Iterator.empty
          } else {
            val ordered = incoming.toSeq.sortBy(c => (c.ts, c.op))
            var current = state.getOption
            ordered.foreach { c =>
              // per-key ts monotonicity: stale (replayed/out-of-order older
              // than applied) changes are no-ops — idempotent under replay
              if (current.forall(_.ts <= c.ts)) {
                current = c.op match {
                  case "delete" => None
                  case _        => Some(KeyImage(id, c.ts, c.balance.getOrElse(
                    current.map(_.balance).getOrElse(0.0))))
                }
              }
            }
            current match {
              case Some(img) => state.update(img)
              case None      => if (state.exists) state.remove()
            }
            idleTimeout.foreach(state.setTimeoutDuration)
            current.iterator
          }
        }
      }
  }
}
