package graft.pipeline

import graft.core.Kll
import graft.plans.RangeBucketExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-driven balanced range repartitioning (O32).
  *
  * `df.repartitionByRange(P, key)` launches a reservoir-sampling job
  * over the input EVERY time to learn range boundaries — at 100 TB that
  * is an extra full-scan-shaped pass, and the sampled boundaries are
  * nondeterministic run to run. This operator derives the boundaries
  * from a mergeable KLL sketch instead: quantiles the engine typically
  * has ALREADY collected (the flagship carries doc-length/warc_ts KLLs
  * per partition as job metrics), or that one cheap aggregation pass
  * produces. Boundaries are deterministic (KLL compaction here is
  * deterministic by construction), so the same sketch always yields the
  * same partitioning — which also makes checkpoint-resumed writes land
  * rows in the same files.
  *
  * Placement is EXACT, not hash-approximate: bucket i must land in
  * partition i (so `sortWithinPartitions` after this yields a globally
  * sorted dataset, the precondition for sorted Iceberg/parquet file
  * layouts). `repartition(P, expr)` hash-partitions, and P buckets
  * hashed into P partitions collide (~37% of partitions would be empty
  * at large P); instead the bucket id is mapped through a proxy integer
  * chosen so Spark's own hash partitioner (pmod(murmur3(v, 42), P))
  * sends proxy(i) exactly to partition i. The proxy table is computed
  * once on the driver (expected O(P ln P) probes of the 4-byte hash)
  * and travels as a P-entry literal array.
  *
  * Null keys: the bucket expression is null-preserving, so all null
  * keys hash together (murmur3 of null = seed) into one partition and
  * stay out of every value range — callers writing sorted files should
  * filter or impute nulls first, as with any range layout.
  */
object RangePartition {

  /** P-1 ascending split points at the i/P quantiles of the sketch. */
  def boundaries(kll: Kll, numParts: Int): Array[Double] = {
    require(numParts >= 2, s"numParts must be >= 2, got $numParts")
    Array.tabulate(numParts - 1)(i => kll.quantile((i + 1).toDouble / numParts))
  }

  /** proxies(i) = the smallest non-negative int v with
    * pmod(murmur3_int(v, 42), numParts) == i — the value the bucket
    * column emits so HashPartitioning places bucket i in partition i. */
  def proxies(numParts: Int): Array[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val out = new Array[Int](numParts)
    val found = new Array[Boolean](numParts)
    var v = 0
    var remaining = numParts
    while (remaining > 0) {
      // exactly the hash HashPartitioning computes for an int column:
      // Murmur3Hash(child, seed = 42), then non-negative mod
      val h = Murmur3Hash(Seq(Literal(v)), 42).eval(null).asInstanceOf[Int]
      val p = ((h % numParts) + numParts) % numParts
      if (!found(p)) { found(p) = true; out(p) = v; remaining -= 1 }
      v += 1
    }
    out
  }

  /** The range-bucket id of `key` (0..boundaries.length) as a codegen'd
    * column — #{ b in boundaries : b <= key }, ties right, null -> null. */
  def bucketCol(key: Column, bs: Array[Double]): Column =
    RangeBucketExpr(key.cast("double"), bs)

  /** Repartition into `numParts` contiguous balanced ranges of `key`
    * using explicit boundaries (one exchange, no sampling job). */
  def byBoundaries(df: DataFrame, key: Column, bs: Array[Double], numParts: Int): DataFrame = {
    require(bs.length == numParts - 1,
      s"need numParts-1=${numParts - 1} boundaries, got ${bs.length}")
    val px = proxies(numParts)
    val proxy = element_at(typedLit(px.toSeq), bucketCol(key, bs) + 1)
    // explicit numPartitions: AQE must not coalesce a placement this
    // operator guarantees (partition id IS the range id)
    df.repartition(numParts, proxy)
  }

  /** Repartition into `numParts` balanced ranges of `key` with
    * boundaries read off a KLL sketch of the key column. */
  def byKll(df: DataFrame, key: Column, kll: Kll, numParts: Int): DataFrame =
    byBoundaries(df, key, boundaries(kll, numParts), numParts)
}
