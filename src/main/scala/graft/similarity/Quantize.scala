package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard memory/bandwidth lever for similarity search at corpus
  * scale: a 64-dim float32 embedding is 256 bytes, its int8 form is
  * 64 bytes + one float scale. At 10^12 vectors that is the
  * difference between a ~256 TB and a ~65 TB vector store, and the
  * rerank arithmetic moves from float multiply-adds over 4x the bytes
  * to int8 dot products.
  *
  * Scheme: per-vector symmetric — `scale = max(|x_i|) / 127`,
  * `q_i = round(x_i / scale)` clamped to [-127, 127]. Cosine is then
  * approximated by the int dot product of the codes (the per-vector
  * scales cancel in cosine's normalization up to rounding error):
  * for unit-norm 64-dim vectors the cosine error is ~1e-2, far below
  * typical neighbor gaps.
  *
  * Everything is expression-level (`transform`/`aggregate`/`zip_with`,
  * whole-stage codegen) — no UDFs, no collect; quantization is a
  * map-only projection and dot products run wherever the candidate
  * pairs already are.
  */
object Quantize {

  /** Add `<out>_q: array<tinyint>` and `<out>_scale: double` columns
    * quantizing `vecCol`. Zero vectors — and vectors containing NaN,
    * which would otherwise poison `greatest` (Spark orders NaN largest)
    * and silently quantize every component to 127 — get scale 0 and
    * all-zero codes (the detectable degenerate, not plausible garbage). */
  def withInt8(df: DataFrame, vecCol: String, out: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    df.withColumn(s"${out}_scale",
        when(isnan(maxAbs), lit(0.0)).otherwise(maxAbs / 127.0))
      .withColumn(s"${out}_q",
        transform(v, x =>
          when(col(s"${out}_scale") === 0.0, lit(0))
            .otherwise(greatest(lit(-127.0),
              least(lit(127.0), round(x / col(s"${out}_scale")))))
            .cast("byte")))
  }

  /** Integer dot product of two int8 code arrays (the sum fits a long
    * for any realistic dim) — the native codegen'd
    * [[graft.plans.Int8DotExpr]]: fused loop over the two byte arrays,
    * zero per-pair allocation. The previous
    * `aggregate(zip_with(a, b, ...))` form materialized the zipped
    * intermediate array per candidate PAIR — measured 17.0 s on
    * `ann_int8_recall` at sf0.1 (5M pairs), the slowest query in the
    * round-3 sweep; the native form's null semantics are identical
    * (spec-asserted element-for-element in Int8VecExprSpec). */
  def dotInt8(a: Column, b: Column): Column =
    graft.plans.Int8DotExpr.column(a, b)

  /** Squared code norm — native, one pass, no intermediate array. */
  def sqNormInt8(a: Column): Column = graft.plans.Int8SqNormExpr.column(a)

  /** Approximate cosine from int8 codes: dot / (|a| * |b|) over the
    * integer codes — the per-vector scales cancel. Re-derives both
    * norms per call: fine for per-row use; the top-k path precomputes
    * norms per vector instead (see [[bruteForceTopKInt8]]). */
  def cosineInt8(a: Column, b: Column): Column =
    dotInt8(a, b).cast("double") /
      (sqrt(sqNormInt8(a).cast("double")) * sqrt(sqNormInt8(b).cast("double")))

  /** Brute-force top-k neighbors over the int8 codes — delegates to
    * [[Ann.bruteForceTopK]]'s plan shape (broadcast queries, map-only
    * corpus scoring, per-query window top-k) at a quarter of the
    * vector bytes. Each side's code norm is computed ONCE per vector
    * in a pre-join projection and carried in a struct next to the
    * codes: in the |corpus| x |queries| scored join only the dot
    * product is per-pair work (re-deriving the norms per pair would
    * triple it). */
  def bruteForceTopKInt8(corpus: DataFrame, queries: DataFrame, idCol: String,
                         qvecCol: String, k: Int): DataFrame = {
    def withNorm(df: DataFrame): DataFrame = df.select(col(idCol),
      struct(col(qvecCol).as("q"),
        sqrt(sqNormInt8(col(qvecCol)).cast("double")).as("n")).as("__qn"))
    val score = (a: Column, b: Column) =>
      dotInt8(a.getField("q"), b.getField("q")).cast("double") /
        (a.getField("n") * b.getField("n"))
    Ann.bruteForceTopK(withNorm(corpus), withNorm(queries), idCol, "__qn", k, score)
  }
}
