package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One Get/Put/Append operation of the reference's [SPEC] KV store.
  * Semantics (reference `src/models/kv.go:40-54`): state per key is one
  * string; `put` overwrites, `append` concatenates, `get` reads; missing
  * key reads as "". `seq` is the total order (the Raft log index the
  * reference would have assigned).
  */
case class KvOp(seq: Long, key: String, op: String, value: String)

object KvReplay {

  /** Derive a deterministic op log from the driver's `events` table
    * (FIXTURES.md §2): event_id = seq, user_id = key; signup→put,
    * click/purchase→append, view/error→get. Value is the event id
    * rendered as a string (the reference dataflow is all-string).
    */
  def opsFromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("seq"),
      col("user_id").cast("string").as("key"),
      when(col("event_type") === "signup", "put")
        .when(col("event_type").isin("click", "purchase"), "append")
        .otherwise("get").as("op"),
      col("event_id").cast("string").as("value"))

  /** Batch replay: final state per key after applying all put/append ops
    * in `seq` order.
    *
    * Scale shape: ONE shuffle (`repartition(key)`) + a per-partition sort
    * on (key, seq) — the classic secondary-sort pattern — then a streaming
    * fold over key runs. Unlike `groupByKey.mapGroups` this never
    * materializes a key's op list; memory per task is O(1) plus the value
    * being built (inherent to append semantics). At 100 TB the sort spills
    * via Spark's external sorter instead of OOMing.
    */
  def replay(ops: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val mutating = ops.filter(col("op") =!= "get")
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("seq"))
      .select(col("key"), col("op"), col("value")).as[(String, String, String)]
    mutating.mapPartitions { it =>
      new Iterator[(String, String)] {
        private var cur: Option[(String, String, String)] =
          if (it.hasNext) Some(it.next()) else None
        def hasNext: Boolean = cur.isDefined
        def next(): (String, String) = {
          val key = cur.get._1
          val sb = new StringBuilder
          while (cur.isDefined && cur.get._1 == key) {
            val (_, op, v) = cur.get
            if (op == "put") { sb.clear(); sb.append(v) } else sb.append(v)
            cur = if (it.hasNext) Some(it.next()) else None
          }
          (key, sb.toString)
        }
      }
    }.toDF("key", "value")
  }

  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s: SparkSession = spark
    replay(opsFromEvents(graft.Tables.events(spark, sfDir)))
  }

  /** DuckDB oracle: last put per key, then appends after it, in seq order.
    * Aggregates skip NULLs, so the CASE projections align exactly with the
    * fold above. */
  val oracleSql: String =
    """WITH ops AS (
      |  SELECT event_id AS seq, CAST(user_id AS VARCHAR) AS key,
      |    CASE WHEN event_type = 'signup' THEN 'put'
      |         WHEN event_type IN ('click','purchase') THEN 'append'
      |         ELSE 'get' END AS op,
      |    CAST(event_id AS VARCHAR) AS val
      |  FROM events),
      |w AS (
      |  SELECT key, seq, op, val,
      |    max(CASE WHEN op = 'put' THEN seq END) OVER (PARTITION BY key) AS last_put
      |  FROM ops WHERE op <> 'get')
      |SELECT key,
      |  coalesce(max(CASE WHEN op = 'put' AND seq = last_put THEN val END), '') ||
      |  coalesce(string_agg(CASE WHEN op = 'append' AND (last_put IS NULL OR seq > last_put) THEN val END, '' ORDER BY seq), '')
      |    AS value
      |FROM w GROUP BY key""".stripMargin
}
