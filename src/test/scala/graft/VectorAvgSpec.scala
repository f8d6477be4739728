package graft

import graft.functions.VectorAvgAggregator.vectorAvg
import org.apache.spark.sql.functions._

class VectorAvgSpec extends SparkSpec {
  import spark.implicits._

  test("typed vector-avg aggregator == posexplode mean, grouped") {
    val rnd = new scala.util.Random(5)
    val data = (1 to 500).map(i => (i % 4, Seq.fill(8)(rnd.nextDouble())))
      .toDF("g", "v").repartition(7).cache()

    val fast = data.groupBy($"g").agg(vectorAvg(8, $"v").as("mean"))
      .as[(Int, Seq[Double])].collect().toMap
    val ref = data.select($"g", posexplode($"v").as(Seq("d", "x")))
      .groupBy($"g", $"d").agg(avg($"x").as("m"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
    fast.foreach { case (g, mean) =>
      mean.zip(ref(g)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"group $g: $a vs $b")
      }
    }
  }

  test("empty-group zero vector and partial/final aggregation plan") {
    val df = Seq((1, Seq(2.0, 4.0)), (1, Seq(4.0, 8.0))).toDF("g", "v")
    val got = df.groupBy($"g").agg(vectorAvg(2, $"v").as("mean"))
      .as[(Int, Seq[Double])].collect()(0)
    assert(got._2 == Seq(3.0, 6.0))
  }
}
