package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (time-travel) join: for every left row, attach the latest
  * right row with the same key whose timestamp is at or before the
  * left row's — the canonical event-enrichment join (DuckDB `ASOF
  * JOIN`, kdb `aj`, Flink temporal join). Spark has no native as-of
  * operator, so this is re-expressed Spark-first as a union +
  * running-`last` window:
  *
  *   - both sides are tagged and unioned (right rows sort before left
  *     rows at equal timestamps, so "at or before" includes ties),
  *   - one shuffle on the join key orders each key's timeline,
  *   - `last(right_payload, ignoreNulls)` over rows UNBOUNDED
  *     PRECEDING..CURRENT carries the most recent right row forward.
  *
  * Cost is a single hash partition + per-key sort — linear shuffle,
  * no range cross-product, no per-key driver loop — so it survives a
  * 100 TB event log as long as single keys fit a partition's sort
  * spill budget (skewed keys: pre-salt by coarse time bucket).
  */
object AsofJoin {

  /** Left rows enriched with the as-of matching right row's payload
    * (null payload = no right row at or before; filter on it for the
    * inner-join variant). Right-side ties on (key, timestamp) are
    * broken by the first payload column, so it should be unique per
    * right row (an event id). Left-row ties are harmless: a left row
    * contributes nothing to any window frame.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__match", lit(null).cast(
        right.select(payload.map(col): _*).schema.fields
          .foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))))
    val r = right
      .select(keys.map(col) ++ Seq(col(rightTs).as("__ts")) :+
        struct(payload.map(col): _*).as("__match"): _*)
      .withColumn("__side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__match")(payload.head).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof", last(when(col("__side") === 0, col("__match")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__match")
  }

  /** Query binding: every click enriched with the user's most recent
    * purchase at or before it (inner as-of), with the elapsed
    * milliseconds. Oracled by DuckDB's native ASOF JOIN.
    */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    // Tie contract: among right rows tied on (user_id, ts), the
    // running-last window deterministically picks max(event_id) — the
    // ascending (__ts, __side, payload) order puts it last in the
    // frame. DuckDB's native ASOF JOIN leaves that pick unspecified,
    // so the ORACLE side pre-collapses ties to max(event_id) per
    // (user_id, ts), which is exactly the row this plan selects; the
    // Spark side needs no extra aggregate (one shuffle, plan-guarded).
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
    asof(clicks, purchases, Seq("user_id"), "ts", "ts",
        payload = Seq("p_event_id", "ts"))
      .filter(col("__asof").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("__asof.p_event_id").as("purchase_id"),
        (unix_millis(col("ts").cast("timestamp")) - unix_millis(col("__asof.ts").cast("timestamp"))).as("lag_ms"))
      .orderBy(col("event_id"))
  }
}
