package graft

import graft.functions.FfdPackFunctions.ffdPack
import org.apache.spark.sql.functions._

/** The segment-tree leftmost-fit inside FfdPack must agree with the naive
  * linear first-fit scan on every input — the tree is an index, not a
  * different algorithm. Exercised at a size where the O(n²) SQL fold it
  * replaced was already stalling. */
class FfdPackSpec extends SparkSpec {
  import spark.implicits._

  private def scalarFfd(lens: Seq[(Long, Long)], cap: Long): Map[Long, Long] = {
    val order = lens.sortBy { case (id, n) => (-n, id) }
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    order.map { case (id, n) =>
      val fit = loads.indexWhere(_ + n <= cap)
      val bid = if (fit < 0) { loads += n; loads.length }
      else { loads(fit) += n; fit + 1 }
      id -> bid.toLong
    }.toMap
  }

  test("segment-tree first-fit == linear-scan first-fit on 5000 seeded lengths (incl. oversize and zero)") {
    val rnd = new scala.util.Random(42)
    val lens: Seq[(Long, Long)] = (0 until 5000).map { i =>
      val n = rnd.nextInt(40) match {
        case 0 => 0L                         // degenerate: zero-length
        case 1 => 256L + rnd.nextInt(200)    // oversize
        case _ => 1L + rnd.nextInt(255)
      }
      (i.toLong, n)
    }
    val got = lens.toDF("doc_id", "n_tok")
      .agg(sort_array(collect_list(struct(
        (-col("n_tok")).as("k"), col("doc_id"), col("n_tok")))).as("items"))
      .select(explode(ffdPack(col("items"), 256L)).as("a"))
      .select($"a.doc_id", $"a.bid").as[(Long, Long)].collect().toMap
    val want = scalarFfd(lens, 256L)
    assert(got.size == lens.size)
    assert(got == want)
  }
}
