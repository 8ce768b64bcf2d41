package graft.kv

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sharding semantics of the reference's [SPEC] labs.
  *
  *  - P3 static key→shard partitioner: first byte of the key mod NShards
  *    (`/root/reference/src/shardkv/client.go:20-27`, NShards = 10 at
  *    `src/shardctrler/common.go:21`).
  *  - C6 shard-controller rebalancing: Join/Leave/Move/Query over configs
  *    with the balance invariant max−min ≤ 1 shards per group and minimal
  *    movement (`src/shardctrler/common.go:4-17`, invariant checked by
  *    `src/shardctrler/test_test.go:36-54`).
  *
  * In Spark the data-plane equivalent of a shard map is just hash
  * partitioning, so the controller is a pure, deterministic state machine
  * (driver-side metadata — exactly what it is in the reference), while
  * the key2shard expression is usable inside queries for shard-local
  * analytics at any scale.
  */
object Sharding {

  val NShards = 10

  /** `int(key[0]) % 10` as a Catalyst column — the first UTF-8 BYTE
    * (Go indexes bytes, so "é" shards by 0xC3, not code point 233);
    * empty key → shard 0, like Go's zero-value byte. */
  def key2shard(key: Column): Column = {
    val firstByte =
      conv(hex(substring(encode(key, "UTF-8"), 1, 1)), 16, 10).cast("int")
    pmod(coalesce(firstByte, lit(0)), lit(NShards)).cast("long")
  }

  /** Distribution of distinct user keys over shards — the shard-placement
    * audit a rebalance would consult. One small shuffle (distinct) + a
    * 10-key aggregation. */
  def shardDistribution(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("key")).distinct()
      .groupBy(key2shard(col("key")).as("shard"))
      .agg(count(lit(1)).as("n_keys"))

  val shardDistributionSql: String =
    s"""SELECT CAST(ascii(substr(key, 1, 1)) % $NShards AS BIGINT) AS shard,
       |  COUNT(*) AS n_keys
       |FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events)
       |GROUP BY 1""".stripMargin

  // ------------------------- C6 controller (pure state machine) ---------

  /** One numbered configuration: shard i → group shards(i); 0 = unowned.
    * Mirrors `src/shardctrler/common.go:25-29`. */
  case class Config(num: Int, shards: Vector[Int], groups: Map[Int, Seq[String]])

  val initialConfig: Config = Config(0, Vector.fill(NShards)(0), Map.empty)

  /** Rebalance with minimal movement: keep every shard where it is unless
    * its group is gone or over target; assign orphans/overflow to the
    * least-loaded groups. Deterministic: ties break on ascending gid. */
  private def rebalance(shards: Vector[Int], gids: Seq[Int]): Vector[Int] = {
    if (gids.isEmpty) return Vector.fill(NShards)(0)
    val sorted = gids.sorted
    val base = NShards / sorted.size
    val extra = NShards % sorted.size
    // Target count per gid: first `extra` gids (ascending) get base+1.
    val target = sorted.zipWithIndex
      .map { case (g, i) => g -> (base + (if (i < extra) 1 else 0)) }.toMap
    val counts = collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    val keep = shards.map { g =>
      if (target.contains(g) && counts(g) < target(g)) { counts(g) += 1; g }
      else 0
    }
    val deficit = collection.mutable.ArrayDeque.from(
      sorted.flatMap(g => Seq.fill(target(g) - counts(g))(g)))
    keep.map(g => if (g == 0) deficit.removeHead() else g)
  }

  /** Join: add replica groups, rebalance (`common.go:37-45`). */
  def join(cfg: Config, newGroups: Map[Int, Seq[String]]): Config = {
    val groups = cfg.groups ++ newGroups
    Config(cfg.num + 1, rebalance(cfg.shards, groups.keys.toSeq), groups)
  }

  /** Leave: remove groups, rebalance their shards away (`common.go:47-53`). */
  def leave(cfg: Config, gids: Seq[Int]): Config = {
    val groups = cfg.groups -- gids
    Config(cfg.num + 1, rebalance(cfg.shards, groups.keys.toSeq), groups)
  }

  /** Move: pin one shard to a group; no rebalance (`common.go:55-62`). */
  def move(cfg: Config, shard: Int, gid: Int): Config =
    Config(cfg.num + 1, cfg.shards.updated(shard, gid), cfg.groups)

  /** Query: fetch config by number, -1/too-big = latest (`common.go:64-73`). */
  def query(history: Seq[Config], num: Int): Config =
    if (num < 0 || num >= history.size) history.last else history(num)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "shard_distribution" -> (shardDistribution _))

  val oracles: Map[String, String] = Map(
    "shard_distribution" -> shardDistributionSql)
}
