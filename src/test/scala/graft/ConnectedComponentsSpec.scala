package graft

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O48 — connected components (hash-min label propagation) pinned on
  * hand-built graphs: chains (worst case for round count), multiple
  * components, isolated nodes, edge-direction and partitioning
  * invariance, and cluster-keeper composition. */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def nodesDf(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }
  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("id_a", "id_b")
  }

  private def run(ids: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(nodesDf(ids), edgesDf(es))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components + isolated node") {
    val got = run(Seq(1L, 2L, 3L, 4L, 5L, 9L),
      Seq((1L, 2L), (2L, 3L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }

  test("long chain converges (worst-case diameter)") {
    // 0-1-2-...-19: min label must travel 19 hops
    val ids = (0L to 19L)
    val es = ids.sliding(2).map(w => (w(0), w(1))).toSeq
    val got = run(ids, es)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 20)
  }

  test("edge direction and duplicate edges are irrelevant") {
    val es1 = Seq((1L, 2L), (3L, 2L), (3L, 4L))
    val es2 = Seq((2L, 1L), (2L, 3L), (4L, 3L), (1L, 2L), (4L, 3L))
    val ids = Seq(1L, 2L, 3L, 4L)
    assert(run(ids, es1) === run(ids, es2))
    assert(run(ids, es1).values.toSet === Set(1L))
  }

  test("partitioning invariance") {
    val ids = (0L to 30L)
    val es = (0L until 30L).map(i => (i, i + 1)) // one chain
    val a = Dedup.connectedComponents(nodesDf(ids).repartition(7), edgesDf(es).repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Dedup.connectedComponents(nodesDf(ids).repartition(2), edgesDf(es).repartition(11))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    assert(a.forall(_._2 == 0L))
  }

  test("random graphs match a local exact union-find (r6 contraction ladder)") {
    // deterministic pseudo-random graphs of mixed shape: chains, stars,
    // cliques and singletons — checks the partition-local contraction
    // ladder end-to-end against an in-memory reference
    val rnd = new scala.util.Random(0xC06L)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 100
      val ids = (0L until n.toLong)
      val es = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      // reference: sequential union-find with min roots
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = ids.map(i => i -> find(i)).toMap
      assert(run(ids, es) === want, s"trial $trial")
    }
  }

  test("keeper-per-cluster composition: component id is the min member") {
    // star + triangle sharing no nodes; keeper = min id of each
    val ids = Seq(10L, 11L, 12L, 13L, 20L, 21L, 22L)
    val es = Seq((13L, 10L), (11L, 13L), (12L, 13L), (21L, 20L), (22L, 21L), (20L, 22L))
    val got = run(ids, es)
    assert(got.filter(_._1 < 20L).values.toSet === Set(10L))
    assert(got.filter(_._1 >= 20L).values.toSet === Set(20L))
  }
}
