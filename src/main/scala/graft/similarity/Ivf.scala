package graft.similarity

import graft.pipeline.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbor search: partition
  * the corpus into `numCells` Voronoi cells around trained centroids;
  * a query probes only its `nProbe` nearest cells and reranks those
  * candidates exactly.
  *
  * Scale shape (the 100 TB path): centroids are a tiny broadcast
  * (numCells x dim doubles); cell assignment is a map-only argmin per
  * row; the candidate join is an equi-join on cell id (shuffle bounded
  * by cell sizes, skew-manageable like any join key); rerank touches
  * only candidates. Lloyd training iterates over element-wise means —
  * the per-iteration shuffle carries (cell, dim, component) narrow
  * rows, never full vectors to one reducer.
  *
  * Determinism: centroid init takes the `numCells` lowest-id corpus
  * vectors (deterministic), and Lloyd updates are element-wise means —
  * floating-point summation order varies across partitionings, but
  * cell BOUNDARY sensitivity to <1ulp centroid wiggle is negligible
  * for the recall bars asserted in the driver gate.
  */
object Ivf {

  /** Train `numCells` centroids with `iters` Lloyd iterations.
    * Returns the centroid matrix, cell id = row index.
    *
    * Training NEVER has to see the full corpus: pass
    * `trainSamplePrefix` (an md5 hex threshold, see
    * [[Sampling.deterministicSample]] — e.g. "28f5" keeps ~16%) to
    * train on a deterministic sample. This is the 100 TB path —
    * k-means centroids converge on ~1e5-1e6 sampled vectors regardless
    * of corpus size, so `iters` full-corpus passes (r2's verdict item
    * #3) become `iters` passes over a bounded, CACHED training frame;
    * only the final cell assignment (inside [[search]]) ever maps over
    * the whole corpus, exactly once. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     numCells: Int, iters: Int,
                     trainSamplePrefix: Option[String] = None): Array[Array[Double]] = {
    val base = trainSamplePrefix match {
      case Some(p) => Sampling.deterministicSample(corpus, col(idCol), p)
      case None => corpus
    }
    // one narrow projection, cached across the seed scan + all Lloyd
    // iterations (the r2 form recomputed the input every iteration)
    val train = base
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("v"))
      .cache()
    try {
      // deterministic init: the numCells lowest-id training vectors
      val seed = train.orderBy(col("__id")).limit(numCells)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
      var centroids = seed
      var it = 0
      while (it < iters) {
        val assigned = train.select(col("v"),
          assignCell(col("v"), centroids).as("cell"))
        // element-wise mean via (cell, dim) narrow rows — no full-vector
        // single-reducer aggregation at any scale
        val means = assigned
          .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
          .collect()
        val next = centroids.map(_.clone())
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        centroids = next
        it += 1
      }
      centroids
    } finally train.unpersist(blocking = false)
  }

  /** Map-only nearest-centroid assignment (closure-captured centroid
    * matrix — same justification as Ann.lshBuckets: the expression form
    * would need numCells x dim literals). Ties break to the lower cell
    * id. Cosine distance on the raw vectors. */
  def assignCell(vecCol: Column, centroids: Array[Array[Double]]): Column = {
    val cellUdf = udf((v: Seq[Double]) => Ivf.nearestCells(v.toArray, centroids, 1).head)
    cellUdf(vecCol.cast("array<double>"))
  }

  /** The `nProbe` nearest cells for a vector, best first. */
  private[similarity] def nearestCells(v: Array[Double], centroids: Array[Array[Double]],
                                       nProbe: Int): Seq[Int] = {
    val scored = centroids.indices.map { c =>
      val cent = centroids(c)
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var d = 0
      val nd = math.min(cent.length, v.length)
      while (d < nd) { dot += v(d) * cent(d); nv += v(d) * v(d); nc += cent(d) * cent(d); d += 1 }
      val denom = math.sqrt(nv) * math.sqrt(nc)
      (if (denom == 0) 0.0 else dot / denom, c)
    }
    scored.sortBy { case (cos, c) => (-cos, c) }.take(nProbe).map(_._2)
  }

  /** Approximate top-k: probe `nProbe` cells per query, exact cosine
    * rerank on the candidates. */
  def search(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Double]], k: Int, nProbe: Int): DataFrame = {
    val probeUdf = udf((v: Seq[Double]) => nearestCells(v.toArray, centroids, nProbe))
    val corpusCells = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"),
      assignCell(col(vecCol), centroids).as("cell"))
    val queryCells = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      explode(probeUdf(col(vecCol).cast("array<double>"))).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    queryCells.join(corpusCells, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Ann.cosine(col("query_vec"), col("neighbor_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }
}
