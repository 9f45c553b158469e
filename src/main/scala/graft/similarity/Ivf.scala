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
      val dim = seed.head.length
      var centroids = seed
      var it = 0
      while (it < iters) {
        val assigned = train.select(col("v"),
          assignCell(col("v"), centroids).as("cell"))
        // element-wise mean via one [count | sums] array per cell
        // (graft.plans.VecSumAgg): map-side partial combine reduces the
        // per-iteration shuffle to numPartitions x numCells fixed-size
        // arrays — the earlier posexplode -> groupBy(cell, dim) form
        // amplified every training vector into `dim` shuffled rows.
        // Float sum order differs from that form (both unspecified);
        // centroid low-bit wiggle is within the boundary-sensitivity
        // margin documented in the object scaladoc.
        val sums = assigned.groupBy("cell")
          .agg(graft.plans.VecSumAgg.column(col("v"), dim).as("cs"))
          .collect()
        val next = centroids.map(_.clone())
        sums.foreach { r =>
          val cs = r.getSeq[Double](1)
          val cnt = cs.head
          if (cnt > 0) next(r.getInt(0)) = Array.tabulate(dim)(d => cs(d + 1) / cnt)
        }
        centroids = next
        it += 1
      }
      centroids
    } finally train.unpersist(blocking = false)
  }

  /** Map-only nearest-centroid assignment — the native codegen'd
    * [[graft.plans.NearestCellExpr]]: fused loop over the raw
    * `ArrayData`, zero per-row allocation or boxing (the previous
    * `Seq[Double]` UDF paid 64 boxed Doubles + a copy per corpus row —
    * the last UDF-where-an-expression-fits path in the repo; the
    * centroid matrix rides as a codegen reference object, not
    * numCells x dim literals). Ties break to the lower cell id. Cosine
    * distance on the raw vectors; selection order spec-identical to
    * [[nearestCells]] (VecProbeExprSpec). */
  def assignCell(vecCol: Column, centroids: Array[Array[Double]]): Column =
    graft.plans.NearestCellExpr.column(vecCol.cast("array<double>"), centroids)

  /** The `nProbe` nearest cells for a vector, best first. Retired from
    * the hot path (see [[assignCell]]) — kept as the executable
    * reference the native kernels are spec-checked against. */
  private[graft] def nearestCells(v: Array[Double], centroids: Array[Array[Double]],
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
    val corpusCells = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"),
      assignCell(col(vecCol), centroids).as("cell"))
    val queryCells = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      explode(graft.plans.NearestCellsExpr.column(
        col(vecCol).cast("array<double>"), centroids, nProbe)).as("cell"))
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
