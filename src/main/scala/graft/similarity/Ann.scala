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

  /** Codegen-friendly cosine similarity between two array<float/double>
    * columns (computed in double, left-to-right accumulation). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(ad, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(bd, lit(0.0), (acc, v) => acc + v * v)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Brute-force exact top-k cosine neighbors for each query vector.
    * Queries are broadcast (must be small); corpus side is map-only
    * until the per-query top-k windowing. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Deterministic random-hyperplane components: plane p, dimension d
    * -> uniform in [-1, 1). */
  private[similarity] def planeComponent(table: Int, bit: Int, dim: Int): Double = {
    val h = Hash128.hashLong((table.toLong << 40) | (bit.toLong << 20) | dim.toLong, 0xA11CE)
    (h.h1 >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** Sign-LSH bucket ids for a vector: `numTables` independent tables,
    * `numBits` hyperplane sign bits each. */
  def lshBuckets(vecCol: Column, dim: Int, numTables: Int, numBits: Int): Column = {
    // per table: bucket = sum_b (sign(dot(v, plane_tb)) << b), built from
    // codegen'd higher-order fns over a precomputed plane literal matrix
    val tables = (0 until numTables).map { t =>
      val bits = (0 until numBits).map { b =>
        val plane = array((0 until dim).map(d => lit(planeComponent(t, b, d))): _*)
        val dot = aggregate(zip_with(vecCol.cast("array<double>"), plane, (x, y) => x * y),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      bits.reduce(_ + _).as(s"bucket_$t")
    }
    array(tables: _*)
  }

  /** LSH-bucketed approximate top-k: candidates = pairs sharing a bucket
    * in any table; exact cosine rerank within candidates. Recall < 1 by
    * construction; measure against [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, numTables: Int = 8, numBits: Int = 10): DataFrame = {
    val bucketize = (df: DataFrame, role: String) =>
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_vec"))
        .withColumn("buckets", lshBuckets(col(s"${role}_vec"), dim, numTables, numBits))
        .select(col(s"${role}_id"), col(s"${role}_vec"),
          posexplode(col("buckets")).as(Seq("table_idx", "bucket")))
    val c = bucketize(corpus, "neighbor")
    val q = bucketize(queries, "query")
    val candidates = c.join(q, Seq("table_idx", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("query_vec"), col("neighbor_id"), col("neighbor_vec"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
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
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("buckets", lshBuckets(col("vec"), dim, numTables, numBits))
      .select(col("id"), col("vec"), posexplode(col("buckets")).as(Seq("table_idx", "bucket")))
    val left = b.select(col("table_idx"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val right = b.select(col("table_idx"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    left.join(right, Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b"))
      .distinct()
      .withColumn("cosine", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
