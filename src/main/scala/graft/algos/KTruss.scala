package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Iterate

/** k-truss (GraphBLAS/@GrB/ktruss.m): iterate C<C> = C*C (plus-and semiring —
  * per surviving edge, count common neighbors = triangle support), keep edges
  * with support >= k-2 (select '>=', ktruss.m:83-88), fixpoint when the edge
  * count stops changing (ktruss.m:79-90).
  *
  * Spark shape: support = the masked wedge-join of TriangleCount.edgeSupport
  * (the <C> mask = left-semi against the surviving edges); each round
  * filters, then recomputes on the shrunken graph. Returns the canonical
  * (lo,hi) edges of the k-truss.
  */
object KTruss {

  def run(spark: SparkSession, edges: DataFrame, k: Int, maxIter: Int = 100,
          numPartitions: Int = 0): DataFrame = {
    require(k >= 3, "k-truss needs k >= 3")
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions").toInt

    // canon is referenced 4x per round (3x in edgeSupport + the semi-join):
    // cut() per round keeps plans leaf-sized (graft.core.Iterate)
    var canon = Iterate.cut(edges.select(
        least(col("src"), col("dst")).as("lo"), greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
      .repartition(parts, col("lo")))
    var nvals = canon.count()
    var iter = 0
    var stable = false

    while (!stable && iter < maxIter && nvals > 0) {
      val support = TriangleCount.edgeSupport(canon)
      // surviving-edge count observed during the cut pass (no extra job)
      val keptPre = canon.join(
          support.filter(col("support") >= k - 2), Seq("lo", "hi"), "left_semi")
        .observe(s"ktruss_$iter", count(lit(1)).as("n"))
      val kept = Iterate.cut(keptPre)
      val newN = keptPre.queryExecution.observedMetrics(s"ktruss_$iter").getLong(0)
      stable = newN == nvals
      Iterate.free(canon)
      canon = kept
      nvals = newN
      iter += 1
    }
    canon
  }
}
