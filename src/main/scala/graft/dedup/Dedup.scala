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
    // r6: signature/band/jaccard kernels are native codegen'd
    // expressions (graft.plans.TextSigExpr) — the Scala kernels in
    // TextFunctions remain the spec reference (byte-identical,
    // TextSigExprSpec); the boxed udf hops they replace paid a
    // Seq[Long] conversion per row on the widest scan of the pipeline
    val bandsOf = (sig: org.apache.spark.sql.Column) =>
      graft.plans.MinhashBandsExpr.column(sig, numBands, rows)
    val jacOf = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.plans.MinhashJaccardExpr.column(a, b)

    val sigs = df.select(col(idCol).as("id"),
      graft.plans.MinhashSigExpr.column(col(textCol), numHashes, shingleN).as("sig"))

    // band join + distinct over NARROW (band, id) rows only — the
    // 64-long signatures never ride the candidate shuffle (they would
    // multiply its bytes ~8x); they are re-joined once per surviving
    // candidate pair for the Jaccard estimate, the same
    // bucketize-without-payload shape as Ann.lshTopK
    val bands = sigs.select(col("id"),
      posexplode(bandsOf(col("sig"))).as(Seq("band_idx", "band_hash")))
    val pairs = bands.select(col("band_idx"), col("band_hash"), col("id").as("id_a"))
      .join(bands.select(col("band_idx"), col("band_hash"), col("id").as("id_b")),
        Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", jacOf(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, Hamming-LSH blocking on
    * four 16-bit chunks (any pair with Hamming distance <= 3*16 shares
    * at least one chunk when distance <= maxHamming <= 16-ish in
    * practice; pigeonhole guarantees recall for distance < 4). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      graft.plans.SimhashExpr.column(col(textCol)).as("simhash"))
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
    val fps = df.select(col(idCol).as("id"),
      explode(graft.plans.WinnowFpExpr.column(col(textCol), k, w)).as("fp"))
    // bucket density via a count window over the SAME fp-partitioned
    // exchange the self-join needs (r6): the former groupBy-counts +
    // re-join recomputed the fingerprint scan in a third branch and
    // added a shuffle; this way both self-join sides are the identical
    // subtree, so the fp exchange is planned once and reused, and the
    // ~p md5 gram hashes per doc — the dominant kernel cost — run once
    // per side instead of once more for the counts. Result identical:
    // count().over(partitionBy(fp)) == groupBy(fp).count re-joined.
    val wfp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val kept = fps.withColumn("bucket_n", count(lit(1)).over(wfp))
      .filter(col("bucket_n") >= 2 && col("bucket_n") <= maxBucket)
      .select(col("fp"), col("id"))
    kept.select(col("fp"), col("id").as("id_a"))
      .join(kept.select(col("fp"), col("id").as("id_b")), "fp")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared")) // fingerprints are distinct per doc
      .filter(col("n_shared") >= minShared)
  }

  /** Partition-local union-find contraction: replace each partition's
    * edge list with the star forest (node -> local min root) that spans
    * exactly the same node set — connectivity-preserving, so any
    * composition of contractions followed by one all-edges pass yields
    * the exact global components. Union-by-min + path compression keeps
    * the root of every set the minimum member, per-edge cost
    * near-constant, and the per-task hash map bounded by the distinct
    * node count of the partition (the same bound a hash aggregation
    * over the edge endpoints would have). */
  private def contractPartition(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new scala.collection.mutable.LongMap[Long]()
    def find(x: Long): Long = {
      var root = x
      var p = parent.getOrElse(root, root)
      while (p != root) { root = p; p = parent.getOrElse(root, root) }
      var cur = x
      while (cur != root) { val next = parent(cur); parent(cur) = root; cur = next }
      root
    }
    it.foreach { case (a, b) =>
      if (a != b) {
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a)
        val rb = find(b)
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
    }
    // one star edge per non-root node: (node, min of its local set).
    // Roots need no row — they reappear as the dst of their members'
    // edges (or, if truly isolated here, carried no connectivity).
    parent.keysIterator.map(k => (k, find(k))).filter(e => e._1 != e._2)
  }

  /** Connected components over a near-dup pair graph: the transitive
    * closure every real dedup pipeline needs (pairwise candidates say
    * A~B and B~C; the corpus decision — one keeper per CLUSTER — needs
    * the component {A,B,C}).
    *
    * Algorithm (r6): iterative partition-local union-find contraction
    * (the filtering step of Kiveris et al., "Connected Components in
    * MapReduce and Beyond", done with a sequential union-find per task
    * instead of star rounds). Each pass runs [[contractPartition]] on
    * every partition — no shuffle for the first pass, which runs on the
    * edges' natural partitioning — then hash-repartitions the shrunken
    * star edges to 1/8 the partitions and contracts again, down to one
    * partition whose local union-find is, by connectivity preservation,
    * the exact global answer. Fixed ladder, zero fixpoint probes.
    *
    * Why this replaces the r1-r5 hash-min label propagation loop: that
    * loop paid (join + min-combine groupBy + cache) per GRAPH-DIAMETER
    * round plus a label-sum action every second round — 13 rounds /
    * ~30 Spark jobs at sf0.1 made dedup_cc_check the slowest query of
    * the whole sweep (56.8 s in the round-6 driver baseline) with the
    * cost dominated by per-round scheduling and AQE planning, not data.
    * This form is 3 narrow passes + 2 small shuffles + 1 broadcast-size
    * label join, one Spark job total. (A pointer-doubling variant of
    * the OLD loop was A/B'd and reverted in r4 — PLAN21; this replaces
    * the loop itself rather than shortening it.)
    *
    * 100 TB shape: pass 1 sees raw candidate-pair partitions (bounded
    * by the upstream bucket join's partitioning) and needs memory for
    * the distinct endpoints of ONE partition — the same per-task bound
    * as any hash aggregation, tunable via partition count like every
    * other operator here. Each pass emits <= one edge per distinct
    * node per partition, so edge volume contracts at least 8x per rung
    * (the fan-in) and in practice collapses to near the component count
    * immediately: near-dup clusters are band-join near-cliques, which a
    * single local union-find flattens to stars. The final single-task
    * pass holds one entry per surviving node of the contracted graph —
    * nodes that still have cross-partition edges after two contractions
    * — not per corpus document. maxIter caps the ladder length for
    * pathological partition counts.
    *
    * @param nodes single-column frame of node ids (long)
    * @param edges frame with id_a/id_b columns (long); direction ignored
    * @return (id, component_id) where component_id = min id reachable
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    var stars = edges
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)]
      .mapPartitions(contractPartition) // narrow: no shuffle for pass 1
    var parts = spark.sessionState.conf.numShufflePartitions
    var rung = 0
    while (parts > 1 && rung < maxIter) {
      parts = math.max(1, parts / 8)
      stars = stars.repartition(parts, col("_1")).mapPartitions(contractPartition)
      rung += 1
    }
    val roots = stars.toDF("id", "component_id")
    // labels: every node maps to its global root; nodes absent from the
    // contracted star forest (isolated or component minima) label
    // themselves. The star forest is component-count-sized by now, so
    // AQE broadcasts it against any corpus-sized node list.
    nodes.select(col("id"))
      .join(roots, Seq("id"), "left")
      .select(col("id"), coalesce(col("component_id"), col("id")).as("component_id"))
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
