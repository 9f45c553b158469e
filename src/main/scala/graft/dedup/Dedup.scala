package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant here is a shuffle-bounded candidate
  * generation (hash keys / LSH buckets / band joins) followed by an
  * exact or estimated verification over candidate pairs only — never an
  * O(n^2) cross join. At 10^12 documents the bucket-join keys (band
  * hashes, simhash chunks) are the shuffle keys, so skew salting and
  * AQE apply to them like to any other join.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy. Output: one row per distinct
    * content with the keeper (minimum id) and the duplicate count. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** MinHash+LSH near-dup candidate pairs with estimated Jaccard.
    *
    * shingle(n) -> minhash signature (numHashes) -> band hashes
    * (numBands, rows = numHashes/numBands) -> bucket self-join per band
    * -> distinct pairs -> signature-estimated Jaccard >= threshold.
    */
  def minhashPairs(spark: SparkSession, df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 64, numBands: Int = 16, shingleN: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rows = numHashes / numBands
    val sigUdf = udf((text: String) => TextFunctions.minhash(text, numHashes, shingleN))
    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until numBands).map { b =>
        var h = 1125899906842597L
        (0 until rows).foreach(r => h = h * 31 + sig(b * rows + r))
        h
      })
    val jacUdf = udf((a: Seq[Long], b: Seq[Long]) =>
      TextFunctions.minhashJaccard(a.toArray, b.toArray))

    val sigs = df.select(col(idCol).as("id"), sigUdf(col(textCol)).as("sig"))

    // band join + distinct over NARROW (band, id) rows only — the
    // 64-long signatures never ride the candidate shuffle (they would
    // multiply its bytes ~8x); they are re-joined once per surviving
    // candidate pair for the Jaccard estimate, the same
    // bucketize-without-payload shape as Ann.lshTopK
    val bands = sigs.select(col("id"),
      posexplode(bandUdf(col("sig"))).as(Seq("band_idx", "band_hash")))
    val pairs = bands.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
      .join(bands.select(col("band_idx"), col("band_hash"), col("id").as("id_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", jacUdf(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, Hamming-LSH blocking on
    * four 16-bit chunks (any pair with Hamming distance <= 3*16 shares
    * at least one chunk when distance <= maxHamming <= 16-ish in
    * practice; pigeonhole guarantees recall for distance < 4). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val shUdf = udf((text: String) => TextFunctions.simhash(text))
    val sh = df.select(col(idCol).as("id"), shUdf(col(textCol)).as("simhash"))
    val chunked = sh.withColumn("chunk_idx", explode(array((0 until 4).map(lit): _*)))
      .withColumn("chunk_val",
        expr("shiftrightunsigned(simhash, chunk_idx * 16)").bitwiseAND(lit(0xffffL)))
    val left = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val right = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    left.join(right, Seq("chunk_idx", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact word-n-gram Jaccard for candidate pairs (verification stage
    * after any LSH). `pairs` must carry id_a/id_b. */
  def ngramJaccardVerify(pairs: DataFrame, docs: DataFrame, textCol: String,
                         idCol: String, n: Int = 3): DataFrame = {
    val jUdf = udf((a: String, b: String) => TextFunctions.ngramJaccard(a, b, n))
    val da = docs.select(col(idCol).as("id_a"), col(textCol).as("text_a"))
    val db = docs.select(col(idCol).as("id_b"), col(textCol).as("text_b"))
    pairs.join(da, "id_a").join(db, "id_b")
      .withColumn("jaccard", jUdf(col("text_a"), col("text_b")))
      .drop("text_a", "text_b")
  }
}
