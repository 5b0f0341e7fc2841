package graft.ops

import org.apache.spark.sql.SparkSession

/** Lake persistence for trained index artifacts — k-means centroids
  * ([[Similarity.kmeansCentroids]]) and PQ codebooks
  * ([[Similarity.pqCodebooks]] shape). Training is a driver-side Seq that
  * dies with the JVM; these tables make an index REUSABLE: train once,
  * save, and every later session loads the identical literal set.
  *
  * Components are IEEE doubles and parquet stores them bit-exactly, so a
  * loaded set is `==` the trained set element-for-element — which is what
  * the bit-reproducibility contract of [[Similarity.ivfTopKQuantized]] /
  * [[Similarity.pqTopK]] actually requires: quantized scoring is
  * bit-reproducible GIVEN A FIXED centroid list, and the lake table is
  * how a list is fixed across runs (re-training is only partition-stable
  * to ~1e-9, so `math.round` of a component near a rounding boundary
  * could flip between training runs).
  *
  * Tables are tiny (k×dim doubles) — single-file parquet, read once per
  * session onto the driver, folded into plans as literals like every
  * other centroid set.
  */
object IndexStore {

  /** Write centroids as (centroid_id, components) — overwrite, an index
    * snapshot is replaced atomically or not at all. */
  def saveCentroids(spark: SparkSession, centroids: Seq[Seq[Double]],
                    path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("centroid_id", "components")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load centroids in centroid_id order — the order IS the cell id, so
    * it must match the trained list exactly. */
  def loadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(path)
      .select("centroid_id", "components")
      .orderBy("centroid_id")
      .collect()
      .map(_.getSeq[Double](1).toVector).toVector

  /** Write PQ codebooks as (block, code, components). */
  def savePqCodebooks(spark: SparkSession, books: Seq[Seq[Seq[Double]]],
                      path: String): Unit = {
    import spark.implicits._
    (for {
      (book, b) <- books.zipWithIndex
      (ctr, j) <- book.zipWithIndex
    } yield (b, j, ctr))
      .toDF("block", "code", "components")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks in (block, code) order. */
  def loadPqCodebooks(spark: SparkSession, path: String): Seq[Seq[Seq[Double]]] =
    spark.read.parquet(path)
      .select("block", "code", "components")
      .orderBy("block", "code")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](2).toVector))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.map(_._2).toVector).toVector
}
