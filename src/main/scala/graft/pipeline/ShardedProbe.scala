package graft.pipeline

import graft.functions.{Graft, SketchAggregators}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The 10^12-scale probe path: the sharded EBF kept as a `(shard, sk)`
  * DataFrame — never collected to the driver — and membership probes
  * expressed as a broadcast join by shard id followed by
  * `ebf_might_contain` on the one matched shard.
  *
  * At web scale the shard table is 10^4-10^5 rows of ~MB sketches:
  * far too big for one driver object, exactly right for a broadcast
  * (or, beyond broadcast limits, a shuffled join on shard id — the
  * same plan shape at any scale). The per-row UDF hits the per-thread
  * SketchCache, so each task deserializes each shard it touches once.
  */
object ShardedProbe {

  /** Build the `(shard, sk)` sketch table over `keyCol`. */
  def buildShardTable(df: DataFrame, keyCol: Column, numShards: Int,
                      m0: Int = 4096, k: Int = 5, l0: Int = 16): DataFrame = {
    Graft.ensure(df.sparkSession)
    val agg = udaf(new SketchAggregators.EbfAgg(m0, k, l0, 1, 8, Graft.SketchSeed))
    df.select(keyCol.as("__key"))
      // null keys are skipped by the aggregator anyway; dropping them
      // here avoids emitting a useless null-shard row
      .filter(col("__key").isNotNull)
      .select(expr(s"graft_shard(__key, $numShards)").as("shard"), col("__key"))
      .groupBy("shard")
      .agg(agg(col("__key")).as("sk"))
  }

  /** Probe `keys(keyCol)` against a shard table; adds boolean `hit`.
    * Keys routing to an absent shard (no rows ever inserted) miss. */
  def probe(keys: DataFrame, keyCol: String, shardTable: DataFrame,
            numShards: Int): DataFrame = {
    Graft.ensure(keys.sparkSession)
    keys
      .withColumn("__shard", expr(s"graft_shard($keyCol, $numShards)"))
      .join(broadcast(shardTable), col("__shard") === shardTable("shard"), "left")
      .withColumn("hit",
        when(col("sk").isNull, lit(false))
          .otherwise(expr(s"ebf_might_contain(sk, $keyCol)")))
      .drop("__shard", "shard", "sk")
  }
}
