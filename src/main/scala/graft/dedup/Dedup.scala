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

  /** Winnowing (MOSS) near-dup candidate pairs: docs sharing at least
    * `minShared` winnowed fingerprints (TextFunctions.winnowFingerprints
    * — window-min md5 over character k-grams of normalized text).
    *
    * Complements MinHash/SimHash: those bucket on GLOBAL similarity
    * (Jaccard / cosine of the whole doc); winnowing guarantees a shared
    * fingerprint for any LOCAL substring match of length >= w + k - 1,
    * so it catches partial-copy pairs (quoted passage, shared
    * boilerplate block) whose global similarity is far below any LSH
    * threshold.
    *
    * Scale shape: fingerprints explode to narrow (fp, id) rows, a
    * map-side-combined count drops ubiquitous fingerprints (a
    * fingerprint present in b docs emits b^2 candidate pairs — the
    * stop-gram analogue every MOSS-style index applies; `maxBucket`
    * caps b), then a self-join per fingerprint and a pair-count
    * groupBy. Same bucketize-without-payload shape as minhashPairs:
    * candidates are bounded by per-fingerprint bucket DENSITY, never
    * O(n^2); hot fingerprints are plain equi-join keys, so AQE skew
    * split applies. */
  def winnowPairs(df: DataFrame, textCol: String, idCol: String,
                  k: Int = 16, w: Int = 8, minShared: Int = 2,
                  maxBucket: Int = 50): DataFrame = {
    val fpUdf = udf((text: String) => TextFunctions.winnowFingerprints(text, k, w))
    val fps = df.select(col(idCol).as("id"), explode(fpUdf(col(textCol))).as("fp"))
    val counts = fps.groupBy("fp").agg(count(lit(1)).as("bucket_n"))
    val kept = fps.join(counts, "fp")
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .select(col("fp"), col("id"))
    kept.select(col("fp"), col("id").as("id_a"))
      .join(kept.select(col("fp"), col("id").as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared")) // fingerprints are distinct per doc
      .filter(col("n_shared") >= minShared)
  }

  /** Connected components over a near-dup pair graph: the transitive
    * closure every real dedup pipeline needs (pairwise candidates say
    * A~B and B~C; the corpus decision — one keeper per CLUSTER — needs
    * the component {A,B,C}).
    *
    * Algorithm: hash-min label propagation. Every node starts with its
    * own id as label; each round propagates the minimum label across
    * edges until a fixpoint. Per round: one shuffle on the edge
    * endpoints plus a min-combine groupBy — min is associative, so
    * map-side partial aggregation absorbs high-degree (hub) nodes and
    * the round cost is O(|E|) shuffled bytes with no skew blowup.
    * Rounds needed = graph diameter, which for near-dup clusters is
    * small by construction (clusters are near-cliques from band/bucket
    * cogeneration). A pointer-doubling shortcut round (label := label
    * of label, the path-compression half of Kiveris et al., "Connected
    * Components in MapReduce and Beyond") was tried and REVERTED: at
    * gate scale the extra self-join per round cost 4x wall (16 -> 63 s,
    * then OOM with the intermediate cached) because each round gains a
    * second shuffle + an AQE-planned self-join, while the round count
    * it saves is small for shallow dedup graphs. For general deep
    * graphs the O(log d) variant is the right choice at cluster scale;
    * this engine targets dedup graphs and keeps the one-join round.
    * Lineage is truncated with an eager localCheckpoint every 5 rounds
    * so plan size stays O(1) across iterations.
    *
    * Convergence detection: labels only ever decrease (min-propagation
    * is monotone), so the label sum is a strictly decreasing fixpoint
    * witness — computed as decimal(38,0) so it cannot overflow for any
    * id range.
    *
    * @param nodes single-column frame of node ids (long)
    * @param edges frame with id_a/id_b columns (long); direction ignored
    * @return (id, component_id) where component_id = min id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    var labels = nodes.select(col("id"), col("id").as("label")).cache()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("label"))
      var next = labels.union(prop).groupBy("id").agg(min("label").as("label"))
      next = if ((it + 1) % 5 == 0) next.localCheckpoint(true) else next.cache()
      // monotonicity makes a 2-round sum compare sound (equal sums
      // across the span mean NO round in it changed anything), so the
      // fixpoint probe runs every other round — half the action count
      // for at most one redundant propagation round
      if (it % 2 == 1 || it == maxIter - 1) {
        val s = labelSum(next)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
      }
      labels.unpersist()
      labels = next
      it += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("label").as("component_id"))
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
