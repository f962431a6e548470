package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the standard ANN recipe:
  *  - [[bruteForceTopK]]: exact cosine top-k — one broadcast of the
  *    query vector, one scan, `TakeOrderedAndProject`. The baseline,
  *    and the right plan when k·queries ≪ corpus.
  *  - [[ivfTopK]]: IVF-style — assign every vector to its nearest
  *    coarse centroid (broadcast of the tiny centroid table), then
  *    score only the probe cell(s). At 100 TB the assignment is a
  *    one-off materialization partitioned by cell id; queries touch
  *    1/nCells of the data.
  *
  * All folds are explicit left folds in double so results are
  * bit-reproducible across engines.
  */
object Similarity {

  /** Codegen'd cosine via the native Catalyst expression (bit-identical
    * to [[graft.functions.VectorFunctions.cosine]], asserted in
    * SimilaritySpec; registered lazily on the input's session). */
  private def fastCosine(df: DataFrame, a: String, b: String): Column = {
    graft.functions.expressions.GraftFunctions.register(df.sparkSession)
    expr(s"cosine_sim($a, $b)")
  }

  /** (vec_id, score) top-k by cosine against the single-row `queryVec`.
    * Pre-filter the query row out of `embeddings` if it shouldn't rank
    * (it would score 1.0). Zero vectors score NaN and sort first under
    * desc order (both Spark and DuckDB treat NaN as largest) — filter
    * them upstream if the corpus may contain empty embeddings. */
  def bruteForceTopK(embeddings: DataFrame, queryVec: DataFrame, k: Int): DataFrame = {
    val joined = embeddings.crossJoin(broadcast(queryVec))
    joined
      .select(col("vec_id"), round(fastCosine(joined, "v", "qv"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Batch k-NN join — the production shape (a whole query SET at
    * once, not one vector): broadcast the query side, score all
    * (query, corpus) pairs with the codegen cosine expression, keep
    * top-k per query via a rank window. One corpus scan regardless of
    * query count; at 100 TB the corpus side stays partitioned and the
    * window shuffles only (query_id, score) pairs.
    * Inputs: corpus (vec_id, v), queries (qid, qv). Output:
    * (qid, vec_id, score, rk) with rk 1..k. */
  def knnJoin(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id"))
    joined
      .select(col("qid"), col("vec_id"),
        round(fastCosine(joined, "v", "qv"), 4).as("score"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
  }

  /** Assign each vector to its nearest centroid by L2; deterministic
    * tie-break on centroid id. Input: (vec_id, v), (cid, cv).
    * Output: (vec_id, v, cid). */
  def assignCells(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    embeddings.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cid"), l2sq(col("v"), col("cv")).as("dist"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("cid"))
  }

  /** IVF probe: top-k by cosine within the query's cell. */
  def ivfTopK(assigned: DataFrame, queryId: Long, k: Int): DataFrame = {
    val qcell = assigned.where(col("vec_id") === queryId)
      .select(col("cid").as("qcid"), col("v").as("qv"))
    val joined = assigned.join(broadcast(qcell), col("cid") === col("qcid"))
      .where(col("vec_id") =!= queryId)
    joined
      .select(col("vec_id"), round(fastCosine(joined, "v", "qv"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }
}
