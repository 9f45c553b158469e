package graft.pipeline

import graft.core.Kll
import graft.plans.ZOrderKeyExpr
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column Z-order clustering for file-level data skipping (O63).
  *
  * [[RangePartition]] (O32) gives a sorted single-key layout: per-file
  * min/max are tight on THAT key and useless on every other column —
  * each file spans the full range of the second predicate column, so a
  * band query on it reads the whole table. This operator interleaves
  * the KLL-bucketed ranks of several columns into one Morton key
  * ([[ZOrderKeyExpr]]) and clusters files by that key, so each file is
  * an axis-aligned cell in rank space and min/max sidecar stats (the
  * [[SketchIndex]] role) prune band predicates on ANY participating
  * column — the Delta `OPTIMIZE ZORDER BY` / Iceberg z-sort layout,
  * built from sketches the engine already collects.
  *
  * Scale shape: boundaries come from mergeable KLL sketches (one
  * column-pruned stats pass, or reuse of sketches a prior job already
  * built — no repartitionByRange sampling job), the key and cell
  * routing are map-side codegen, and the single exchange places cell
  * ids into files via the same murmur3 proxy trick as
  * [[RangePartition]] (partition id == z-cell id, deterministic run
  * to run, so checkpoint-resumed writes land rows in the same files).
  * Balance caveat, documented rather than hidden: per-dim buckets are
  * quantile-balanced, so the 2^fileBits cells are equal-mass only as
  * far as the dims are independent — correlated dims concentrate mass
  * in diagonal cells (the classic z-order trade-off; AQE-split or
  * higher fileBits absorb it at scale). Pruning correctness never
  * depends on balance: file min/max are exact whatever the layout.
  *
  * Null keys: the bucket expressions are null-preserving, so any null
  * participating key yields a null cell and all such rows co-locate in
  * one hash-of-null partition outside every value range — same caveat
  * as [[RangePartition]]; filter or impute nulls before a sorted
  * layout.
  */
object ZOrder {

  /** 2^bits - 1 ascending split points off the column's KLL — bucket
    * ids then cover exactly [0, 2^bits). */
  def bucketBoundaries(kll: Kll, bits: Int): Array[Double] =
    RangePartition.boundaries(kll, 1 << bits)

  /** The Morton key of `keys` (cast to double by the caller), each
    * rank-bucketed by its own boundary array into `bits` bits. */
  def zkeyCol(keys: Seq[Column], boundaries: Seq[Array[Double]], bits: Int): Column = {
    require(keys.size == boundaries.size,
      s"${keys.size} keys but ${boundaries.size} boundary arrays")
    ZOrderKeyExpr.column(
      keys.zip(boundaries).map { case (k, bs) => RangePartition.bucketCol(k, bs) }, bits)
  }

  /** Cluster `df` into 2^fileBits z-range files: rows are routed by the
    * top `fileBits` bits of the Morton key (partition id == z-cell id,
    * exact placement) and sorted by the full key within each file, so
    * a later writer task emits one tight z-cell per file. Returns the
    * repartitioned frame; the caller writes it. */
  def layout(df: DataFrame, keys: Seq[Column], klls: Seq[Kll],
             bits: Int, fileBits: Int): DataFrame = {
    val d = keys.size
    require(fileBits >= 1 && fileBits <= bits * d,
      s"fileBits must be in [1, bits*dims=${bits * d}], got $fileBits")
    val bs = klls.map(bucketBoundaries(_, bits))
    val z = zkeyCol(keys, bs, bits)
    val numFiles = 1 << fileBits
    val cell = shiftright(z, bits * d - fileBits).cast("int")
    val px = RangePartition.proxies(numFiles)
    val proxy = element_at(typedLit(px.toSeq), cell + 1)
    // explicit numPartitions: AQE must not coalesce a placement where
    // the partition id IS the z-cell id (same contract as O32)
    df.repartition(numFiles, proxy).sortWithinPartitions(z)
  }
}
