package graft

import graft.functions.Graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** r2 verdict item: queries that cache an augmented corpus must release
  * it before returning — a 60-query driver sweep would otherwise
  * accumulate stranded executor memory. Asserts that running every
  * embedding/ANN query leaves no NEW persistent RDD behind (snapshot
  * diff, not global emptiness: other suites legitimately share the
  * local SparkContext and may hold caches of their own).
  */
class CacheHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Graft.ensure(
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())

  private val sfDir = "/root/testdata/sf0.001"

  test("embedding/ANN queries leave no persistent RDDs behind") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val before = spark.sparkContext.getPersistentRDDs.keySet
    for (name <- Seq("dedup_embedding_cosine", "dedup_embedding_recall",
        "ann_lsh_recall", "ann_ivf_recall", "ann_ivf_clustered",
        "ann_int8_recall")) {
      val q = SparkEntry.queries(name)
      // consume like the driver does (full materialization)
      q(spark, sfDir).collect()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name left persistent RDDs $leaked behind")
    }
  }
}
