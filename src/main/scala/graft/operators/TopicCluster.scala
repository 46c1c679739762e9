package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Topic clustering over an embedding column: spherical k-means for
  * corpus curation — domain balancing, cluster-level dedup/filtering
  * (SemDeDup-style), and topical mixture reweighting all start from
  * "assign every document's embedding to one of k centroids".
  *
  * Reuses the IVF machinery end-to-end: [[IvfAnn.train]] is already a
  * deterministic spherical k-means over a bounded driver-side sample (the
  * FAISS recipe — the quantizer is the one part that does not
  * distribute), and assignment is the same codegen argmax-dot kernel
  * inside the scan stage, so clustering a 100 TB corpus is a single map
  * pass over the vectors plus one groupBy on the (tiny-cardinality) cell
  * id.
  */
object TopicCluster {

  /** (vec_id, cluster) for every vector — one scan, no shuffle. */
  def assign(vectors: DataFrame, idCol: String, embCol: String,
             model: IvfAnn.Model): DataFrame =
    vectors.select(col(idCol).as("vec_id"),
      IvfAnn.assignCell(col(embCol), model).cast(LongType).as("cluster"))

  /** Summarize a clustering under an already-trained quantizer: per
    * cluster, the member count and the id range. Taking the model lets a
    * caller that needs the centroids afterwards (e.g. to emit them as
    * SQL-oracle literals) train once and share. */
  def summary(vectors: DataFrame, idCol: String, embCol: String,
              model: IvfAnn.Model): DataFrame =
    assign(vectors, idCol, embCol, model)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_id"), max(col("vec_id")).as("max_id"))

  /** Train on `vectors` and summarize the clustering. `extra`
    * aggregations (e.g. distinct ground-truth labels) can be added by the
    * caller on [[assign]]. */
  def summary(vectors: DataFrame, idCol: String, embCol: String,
              k: Int, iters: Int = 10): DataFrame =
    summary(vectors, idCol, embCol,
      IvfAnn.train(vectors, idCol, embCol, k, iters))
}
