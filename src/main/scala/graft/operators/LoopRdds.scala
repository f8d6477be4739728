package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row

/** Registry for the final persisted RDD of iterative driver loops
  * ([[ConnectedComponents]] label rounds, [[BpeTrainer]] merge-chain
  * truncations). These loops lineage-truncate each round via an explicit
  * RDD persist (a Dataset-level persist would not cut the exponentially
  * nesting plan), and `spark.catalog.clearCache()` cannot see RDD-level
  * blocks — so harness code (Q/Verify/Bench contract) releases them here
  * at the same point it clears the SQL cache. Safe to call while a
  * returned DataFrame is still referenced: the RDD recomputes from
  * lineage if re-read. */
object LoopRdds {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[RDD[Row]]()

  def register(rdd: RDD[Row]): Unit = live.add(rdd)

  def freeAll(): Unit = {
    var rdd = live.poll()
    while (rdd != null) {
      rdd.unpersist(blocking = false)
      rdd = live.poll()
    }
  }
}
