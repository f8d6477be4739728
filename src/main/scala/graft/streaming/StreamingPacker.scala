package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online no-split sequence packing over a document stream — the
  * incremental companion of the batch `pack_bins_nosplit` (offline FFD):
  * an inference/fine-tuning queue packs documents into fixed-capacity
  * training sequences AS THEY ARRIVE, without ever seeing the corpus.
  *
  * Per shard key, `flatMapGroupsWithState` holds the open bins (bin id +
  * load); each arriving document (processed in doc_id order within the
  * batch, so replays are deterministic given the same batch boundaries)
  * goes to the first open bin it fits (first-fit; the online setting
  * cannot sort globally, which is exactly the "decreasing" FFD buys
  * offline), else opens a new bin. Assignments emit immediately in
  * Append mode — one row per document.
  *
  * State is O(MaxOpen) per shard, NOT O(stream): when the open set
  * exceeds MaxOpen, the fullest bin (least residual; ties to the oldest
  * id) is closed — closed bins never reopen, so emitted assignments are
  * final and every bin's total load respects capacity forever. First-fit
  * with bounded open bins is the classic bounded-space bin packing
  * setting (Johnson's Next-k/First-k Fit): the competitive-ratio price of
  * O(1) state is what makes 10⁹-shard state stores feasible.
  *
  * Oversize documents (n_tok > capacity) get a singleton bin that closes
  * immediately — the batch operator's convention.
  */
object StreamingPacker {

  final case class Doc(shard: Long, doc_id: Long, n_tok: Long)
  final case class PackState(nextBin: Long, bins: List[(Long, Long)])
  final case class Assignment(shard: Long, doc_id: Long, n_tok: Long, bin_id: Long)

  def pack(docs: Dataset[Doc], capacity: Long, maxOpen: Int): Dataset[Assignment] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(capacity >= 1 && maxOpen >= 1)

    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[PackState, Assignment](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[Doc], state: GroupState[PackState]) =>
          var st = state.getOption.getOrElse(PackState(1L, Nil))
          val out = List.newBuilder[Assignment]
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            val fit = st.bins.indexWhere { case (_, load) =>
              load + d.n_tok <= capacity
            }
            val (inserted, next) =
              if (fit >= 0) {
                val (bid, load) = st.bins(fit)
                out += Assignment(shard, d.doc_id, d.n_tok, bid)
                (st.bins.updated(fit, (bid, load + d.n_tok)), st.nextBin)
              } else {
                out += Assignment(shard, d.doc_id, d.n_tok, st.nextBin)
                (st.bins :+ (st.nextBin, d.n_tok), st.nextBin + 1L)
              }
            // bins at or over capacity close at once (nothing of size
            // >= 1 ever fits them again — oversize singletons included);
            // then bound the open set by closing the fullest bin — least
            // residual, ties to the OLDEST (smallest id): deterministic
            val opened = inserted.filter(_._2 < capacity)
            val bounded =
              if (opened.length <= maxOpen) opened
              else {
                val victim = opened.minBy { case (bid, load) => (-load, bid) }
                opened.filterNot(_ == victim)
              }
            st = PackState(next, bounded)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
