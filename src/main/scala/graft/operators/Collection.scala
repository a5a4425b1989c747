package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vec

/** Collection CRUD surface — the batch twins of the reference's
  * upsert / delete / get / scroll / stats APIs (shared by all five
  * backends behind the VECTOR_DB switch, /root/reference/README.md).
  *
  * In a Spark-native store, "mutation" is a merge over immutable
  * snapshots: an update batch latest-wins-merged by key, a delete a
  * filter/anti-join, a point-get a broadcast semi-join. All shapes
  * shuffle at most once on the collection key — at 100 TB the
  * collection would be bucketed by `vec_id` so the window/merge
  * reuses the bucketing and the shuffle disappears entirely.
  */
object Collection {

  /** Deterministic "update batch": every 10th vector gets label+100
    * (a metadata patch), and a small batch of brand-new ids appears
    * above the current max — exercising both the update and insert
    * halves of upsert.
    */
  private def updateBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
    val updates = base.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"), (col("label") + 100).as("label"))
    val inserts = base.filter(col("vec_id") % 250 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"), lit(999).as("label"))
    updates.unionByName(inserts)
  }

  /** Row 10: latest-wins upsert merge. Base rows carry version 1,
    * the batch version 2; `row_number` over (vec_id, version desc)
    * keeps the winner. One shuffle on vec_id; map-side the window is
    * a WindowGroupLimit so only 1 row per key survives per partition.
    */
  def qUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base  = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label")).withColumn("version", lit(1))
    val batch = updateBatch(spark, sfDir).withColumn("version", lit(2))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("version").desc)
    base.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("version"))
      .orderBy(col("vec_id"))
  }

  /** Row 11: delete-by-filter as an anti-join against the matched id
    * set (the reference's delete(filter=...) API). Output is the
    * surviving per-label histogram so the oracle check covers the
    * whole result without materializing vectors.
    */
  def qDeleteFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val coll = Tables.embeddings(spark, sfDir)
    val doomed = coll.filter(col("label") === 3 || (col("vec_id") % 17 === 0))
      .select(col("vec_id").as("del_id"))
    coll.join(doomed, col("vec_id") === col("del_id"), "left_anti")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_remaining"))
      .orderBy(col("label"))
  }

  /** Ids for the point-lookup; literal list, broadcast by Catalyst. */
  val GetIds: Seq[Long] = Seq(0L, 7L, 13L, 42L, 99L, 123L, 256L, 404L, 444L, 499L)

  /** Row 12: get-by-ids point lookup. An `isin` over a literal id
    * list compiles to an IN-set predicate pushed into the parquet
    * scan — at scale with bucketing this is a bucket-pruned read,
    * no shuffle, no join.
    */
  def qGetByIds(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(GetIds: _*))
      .select(col("vec_id"), col("label"), round(vec.norm(col("embedding")), 6).as("norm"))
      .orderBy(col("vec_id"))

  /** Row 13: scroll — deterministic keyset-style page: order by id,
    * skip 100, take 50. (At 100 TB a real scroll would be keyset
    * `WHERE vec_id > last_seen LIMIT n` — same plan shape, no skew;
    * offset here mirrors the reference's scroll cursor semantics.)
    */
  def qScroll(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"))
      .orderBy(col("vec_id"))
      .offset(100)
      .limit(50)

  /** Row 14: collection stats — count / dims / label cardinality /
    * norm aggregate, the reference's collection.stats()/count()
    * endpoint. Single scan, single-row output.
    */
  def qCollectionStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), size(col("embedding")).cast("long").as("dim"),
              vec.norm(col("embedding")).as("nrm"))
      .agg(
        count(lit(1)).as("n_vectors"),
        countDistinct(col("label")).as("n_labels"),
        max(col("dim")).as("dim"),
        round(avg(col("nrm")), 6).as("avg_norm"))
}
