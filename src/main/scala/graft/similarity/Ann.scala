package graft.similarity

import graft.core.Hash128
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * The cosine kernel is built from Spark higher-order functions
  * (`zip_with` + `aggregate`) — fully codegen'd Catalyst expressions, no
  * UDF in the hot path. Brute-force top-k broadcasts the (small) query
  * set so the big side streams map-only; the LSH variant buckets by
  * random-hyperplane signs so candidate generation is a bucket join —
  * the 100 TB path where a full cross product is impossible.
  */
object Ann {

  /** Cosine similarity between two array<float/double> columns
    * (computed in double, left-to-right accumulation) — the native
    * fused [[graft.plans.CosineSimExpr]]: one loop per pair, no zipped
    * intermediate array, no array<double> cast materialization. This
    * is the per-PAIR kernel of every rerank/near-dup path, where the
    * composed higher-order form's allocations dominated (the int8
    * lesson, round 4). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimExpr.column(a, b)

  /** The retired higher-order composition, kept verbatim as the spec
    * oracle the native kernel is asserted bit-identical against
    * (VecProbeExprSpec). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(ad, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(bd, lit(0.0), (acc, v) => acc + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force exact top-k neighbors for each query vector under
    * `score` (default: float cosine). Queries are broadcast (must be
    * small); corpus side is map-only until the per-query top-k
    * windowing. The scorer receives (query vector col, corpus vector
    * col); `vecCol` may be a struct carrying precomputed per-vector
    * terms (see Quantize.bruteForceTopKInt8) — the plan shape is the
    * single shared implementation of this pattern. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     score: (Column, Column) => Column = cosine): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", score(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic random-hyperplane components: plane p, dimension d
    * -> uniform in [-1, 1). */
  private[graft] def planeComponent(table: Int, bit: Int, dim: Int): Double = {
    val h = Hash128.hashLong((table.toLong << 40) | (bit.toLong << 20) | dim.toLong, 0xA11CE)
    (h.h1 >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** Sign-LSH bucket ids for a vector: `numTables` independent tables,
    * `numBits` hyperplane sign bits each — the native codegen'd
    * [[graft.plans.LshBucketsExpr]].
    *
    * The plane matrix rides as ONE codegen reference object, never as
    * composed per-element literals (numTables*numBits*dim literal
    * subtrees — 6144 for 16x6x64 — would blow past codegen method
    * limits, which is why the first cut was a closure-captured UDF).
    * The native form keeps the same tight loop but reads the
    * `ArrayData` directly — no Seq[Double] boxing or copy per row.
    * Planes are deterministic, so buckets are unchanged
    * (spec-identical to the retired UDF logic, VecProbeExprSpec). */
  def lshBuckets(vecCol: Column, dim: Int, numTables: Int, numBits: Int): Column = {
    val planes: Array[Array[Double]] = Array.tabulate(numTables * numBits) { tb =>
      Array.tabulate(dim)(d => planeComponent(tb / numBits, tb % numBits, d))
    }
    graft.plans.LshBucketsExpr.column(vecCol.cast("array<double>"), planes,
      numTables, numBits, dim)
  }

  /** LSH-bucketed approximate top-k: candidates = pairs sharing a bucket
    * in any table; exact cosine rerank within candidates. Recall < 1 by
    * construction; measure against [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, numTables: Int = 8, numBits: Int = 10): DataFrame = {
    // bucketize WITHOUT carrying vectors: the bucket join + distinct run
    // over narrow (id, table, bucket) rows; vectors are re-joined once
    // per surviving candidate pair for the exact rerank
    val bucketize = (df: DataFrame, role: String) =>
      df.select(col(idCol).as(s"${role}_id"),
        posexplode(lshBuckets(col(vecCol), dim, numTables, numBits))
          .as(Seq("table_idx", "bucket")))
    val candidates = bucketize(corpus, "neighbor")
      .join(bucketize(queries, "query"), Seq("table_idx", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("neighbor_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cosine", cosine(col("query_vec"), col("neighbor_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, via LSH
    * candidate generation (the scalable path for dedup-by-embedding). */
  def embeddingNearDups(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, threshold: Double,
                        numTables: Int = 8, numBits: Int = 10): DataFrame = {
    // narrow bucket join -> vector re-join + rerank -> distinct pairs.
    // r6: the distinct moved BELOW the threshold filter. A pair that
    // collides in several tables used to be deduplicated by a full
    // shuffle of every candidate occurrence before the rerank; but the
    // expected duplication factor is small (tables are independent, so
    // a colliding pair repeats in ~1 + numTables*p extra tables for
    // per-table collision probability p), while the dedup shuffle paid
    // for EVERY candidate row. Re-ranking duplicates costs a few fused
    // codegen'd cosines; deduplicating the threshold SURVIVORS is a
    // near-dup-sized shuffle instead of a candidate-sized one. The
    // result set is identical: cosine is a pure function of the pair,
    // so distinct over (id_a, id_b, cosine) collapses exactly the
    // duplicate candidates the old pre-rerank distinct did.
    val b = corpus.select(col(idCol).as("id"),
      posexplode(lshBuckets(col(vecCol), dim, numTables, numBits))
        .as(Seq("table_idx", "bucket")))
    val pairs = b.select(col("table_idx"), col("bucket"), col("id").as("id_a"))
      .join(b.select(col("table_idx"), col("bucket"), col("id").as("id_b")),
        Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val va = corpus.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val vb = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    pairs.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .distinct()
  }
}
