package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0, 0.0, 0.0)),
    (1L, Array(0.9, 0.1, 0.0)),   // closest to 0
    (2L, Array(0.0, 1.0, 0.0)),   // orthogonal
    (3L, Array(-1.0, 0.0, 0.0)),  // opposite
    (4L, Array(0.7, 0.7, 0.0))
  ).toDF("vec_id", "v")

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val q = vecs.where($"vec_id" === 0).select($"v".as("qv"))
    val got = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 0), q, 3)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(got === Seq(1L, 4L, 2L))
  }

  test("cosine function: known values") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(round(VectorFunctions.cosine($"a", $"b"), 6).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.0, 1.0))
  }

  test("IVF assignment puts vectors in nearest cell; probe returns cell-local top-k") {
    val cents = Seq((100L, Array(1.0, 0.0, 0.0)), (200L, Array(0.0, 1.0, 0.0)))
      .toDF("cid", "cv")
    val assigned = Similarity.assignCells(vecs, cents)
    val cells = assigned.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid")).toMap
    assert(cells(0L) === 100L && cells(1L) === 100L && cells(2L) === 200L)
    val top = Similarity.ivfTopK(assigned, 0L, 10).collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(top.head === 1L)            // nearest neighbor found in-cell
    assert(!top.contains(2L))          // orthogonal vector pruned (other cell)
  }
}
