package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — an operator Spark has no native node for
  * (beyond-reference; the reference has no joins at all, SURVEY.md §2.6,
  * but a training/feature pipeline needs PIT joins constantly).
  *
  * Implementation is the scalable union+window shape, NOT a range cross
  * join: tag both sides, union on (key, time), and carry the right
  * side's values forward with `last(ignoreNulls)` over an ordered
  * running frame. ONE shuffle on the key, linear work, no candidate
  * blow-up — survives 100 TB where an inequality-join would not. Right
  * rows sort before left rows at equal timestamps, so `right.time <=
  * left.time` matches DuckDB's ASOF semantics (the oracle).
  */
object AsOf {

  /** Generic as-of join: for each `left` row, the latest `right` row
    * with the same key and rightTime <= leftTime. `rightVals` must be
    * unique per (key, time) for deterministic results — pre-aggregate
    * the right side if it is not. Output: left columns + rightVals
    * (null when no match ⇒ filtered, inner semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame =
    asofJoinImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, forward = false)

  /** Forward (look-ahead) as-of join: for each `left` row, the EARLIEST
    * right row with the same key and rightTime >= leftTime — the
    * "time-to-next-X" direction (pandas merge_asof
    * direction='forward'). Same union+window shape mirrored: right
    * rows sort AFTER left rows at equal timestamps (inclusive match)
    * and the carry is `first(ignoreNulls)` over the FOLLOWING frame.
    * Still one keyed shuffle, no range join. */
  def asofJoinForward(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame =
    asofJoinImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      rightVals, forward = true)

  private def asofJoinImpl(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      rightVals: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // A rightVals name that already exists on the left would silently
    // feed left rows' own values into the ignoreNulls carry (every row
    // "matching itself") — refuse instead of corrupting.
    val collisions = rightVals.toSet.intersect(leftCols.toSet)
    require(collisions.isEmpty,
      s"asofJoin: rightVals collide with left columns: ${collisions.mkString(", ")} — rename before joining")
    // Same refusal for the internal working columns: a caller column
    // named __k/__t/__side/__row/__asof would be silently overwritten by
    // withColumn, corrupting the join instead of failing loudly.
    val reserved = Set("__k", "__t", "__side", "__row", "__asof")
    val reservedHits =
      (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHits.isEmpty,
      s"asofJoin reserves internal column names ${reservedHits.mkString(", ")} — rename before joining")
    // The carried payload is ONE struct per right row, so (a) all
    // rightVals always come from the same matched row — per-column
    // carries could stitch values from different rows when a column is
    // null — and (b) a matched row with null values is still a match
    // (the struct itself is non-null), exactly like a real ASOF join.
    // Side ordering encodes the inclusive boundary: backward wants
    // right rows BEFORE left rows at equal time (right.t <= left.t),
    // forward wants them AFTER (right.t >= left.t).
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__row", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightVals.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(rightSide))
      .withColumn("__row", struct(rightVals.map(col): _*))
    val sel = (leftCols ++ Seq("__k", "__t", "__side", "__row")).map(colName =>
      col(colName))
    val lSel = l.select(sel: _*)
    val rSel = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select(sel: _*)
    val w = {
      val base = Window.partitionBy(col("__k"))
        .orderBy(col("__t"), col("__side"))
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carry =
      if (forward) first(col("__row"), ignoreNulls = true)
      else last(col("__row"), ignoreNulls = true)
    lSel.unionByName(rSel)
      .withColumn("__asof", carry.over(w))
      .filter(col("__side") === lit(leftSide) && col("__asof").isNotNull)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Driver-gated instance: each event joined to the user's most recent
    * order as of the event time. Orders are deduped to one per
    * (custkey, orderdate) — max orderkey — so ties are deterministic in
    * both engines. */
  def eventsAsofOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asofJoin(ev, o, leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightVals = Seq("o_orderkey", "o_orderdate"))
  }

  val eventsAsofOrdersSql: String =
    """SELECT event_id, user_id, ts, o_orderkey, o_orderdate
      |FROM events e ASOF JOIN (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate) o
      |ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts""".stripMargin

  /** Forward gate: each view event joined to the SAME user's next
    * purchase at-or-after it — time-to-next-purchase attribution, with
    * genuine interleaving inside one table (purchases deduped to one
    * per (user, ts), max event_id, for deterministic ties). */
  def eventsAsofNextPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event"))
    asofJoinForward(views, purchases, leftKey = "user_id",
      rightKey = "p_user", leftTime = "ts", rightTime = "p_ts",
      rightVals = Seq("p_event", "p_ts"))
  }

  val eventsAsofNextPurchaseSql: String =
    """SELECT event_id, user_id, ts, p_event, p_ts
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'view') v
      |ASOF JOIN (
      |  SELECT user_id AS p_user, ts AS p_ts, MAX(event_id) AS p_event
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
      |ON v.user_id = p.p_user AND p.p_ts >= v.ts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_orders" -> (eventsAsofOrders _),
    "events_asof_next_purchase" -> (eventsAsofNextPurchase _))

  val oracles: Map[String, String] = Map(
    "events_asof_orders" -> eventsAsofOrdersSql,
    "events_asof_next_purchase" -> eventsAsofNextPurchaseSql)
}
