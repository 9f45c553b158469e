package graft.plans

import breeze.linalg.{eigSym, DenseMatrix}
import graft.core.Fd
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O57 — the native FD aggregate through Spark: float and double
  * inputs, null rows skipped, groupBy fan-out, and the spectral
  * guarantee holding at EVERY partitioning (merge-tree independence is
  * the property, byte stability deliberately is not — see Fd scaladoc). */
class FdAggSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dim = 8

  private def rowsFor(seed: Int, n: Int): Seq[(Long, Seq[Double])] = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextGaussian())))
  }

  private def df(seed: Int, n: Int): DataFrame = {
    import spark.implicits._
    rowsFor(seed, n).toDF("id", "v")
  }

  private def specNorm(diff: Array[Double]): Double = {
    val m = new DenseMatrix[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) m(i, j) = (diff(i * dim + j) + diff(j * dim + i)) / 2
    val ev = eigSym(m).eigenvalues
    math.max(math.abs(breeze.linalg.min(ev)), math.abs(breeze.linalg.max(ev)))
  }

  private def exactGram(rows: Seq[Seq[Double]]): Array[Double] = {
    val g = new Array[Double](dim * dim)
    for (v <- rows; i <- 0 until dim; j <- 0 until dim) g(i * dim + j) += v(i) * v(j)
    g
  }

  test("double input: guarantee holds at several partitionings") {
    val data = rowsFor(31, 300)
    val exact = exactGram(data.map(_._2))
    for (parts <- Seq(1, 3, 8)) {
      val bytes = df(31, 300).repartition(parts)
        .agg(FdAggExpr.column(col("v"), 6, dim)).head.getAs[Array[Byte]](0)
      val fd = Fd.fromBytes(bytes)
      assert(fd.count == 300L, s"parts=$parts")
      val diff = fd.gram.zip(exact).map { case (b, a) => a - b }
      assert(specNorm(diff) <= fd.errBound + 1e-6, s"parts=$parts")
    }
  }

  test("float input path matches the double path within float precision") {
    import spark.implicits._
    val data = rowsFor(37, 120)
    val asFloat = data.map { case (id, v) => (id, v.map(_.toFloat)) }.toDF("id", "v")
    val bytes = asFloat.agg(FdAggExpr.column(col("v"), 6, dim)).head.getAs[Array[Byte]](0)
    val fd = Fd.fromBytes(bytes)
    assert(fd.count == 120L)
    val exact = exactGram(data.map(_._2))
    val diff = fd.gram.zip(exact).map { case (b, a) => a - b }
    assert(specNorm(diff) <= fd.errBound + 1e-3 * (1 + fd.frobSq))
  }

  test("nulls and wrong-dim vectors are skipped, groupBy fans out") {
    import spark.implicits._
    val good = rowsFor(41, 40).map { case (id, v) => (id % 2, v) }
    val bad = Seq((0L, null.asInstanceOf[Seq[Double]]), (1L, Seq(1.0, 2.0)))
    val in = (good ++ bad).toDF("g", "v")
    val out = in.groupBy(col("g")).agg(FdAggExpr.column(col("v"), 4, dim).as("sk"))
      .collect().map(r => r.getLong(0) -> Fd.fromBytes(r.getAs[Array[Byte]](1))).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L).count + out(1L).count == 40L)
  }

  test("exact below capacity through Spark (one partition, few rows)") {
    val data = rowsFor(43, 10)
    val bytes = df(43, 10).coalesce(1)
      .agg(FdAggExpr.column(col("v"), 8, dim)).head.getAs[Array[Byte]](0)
    val fd = Fd.fromBytes(bytes)
    val exact = exactGram(data.map(_._2))
    for (i <- exact.indices)
      assert(math.abs(fd.gram(i) - exact(i)) <= 1e-9 * (1 + math.abs(exact(i))))
  }
}
