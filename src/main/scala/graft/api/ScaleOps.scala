package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location utilities for 100 TB operation — the levers
  * SURVEY.md §4 calls out (salting for skewed keys, bucketing for
  * shuffle-free joins), packaged so operators and users apply them
  * declaratively. Results are provably identical to the unsalted /
  * unbucketed plans (see ScaleOpsSpec).
  */
object ScaleOps {

  /** Two-stage salted sum/count aggregation: stage 1 aggregates on
    * (key, salt) — spreading a hot key over `buckets` reducers —
    * stage 2 merges the partials. `saltFrom` must be a deterministic
    * per-row column (an id) so plans stay replayable.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String, saltFrom: Column,
                buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))

  /** Salted equi-join for a skewed key: the big side gets a
    * deterministic salt; the small side is replicated across all
    * `buckets` salts; the join key becomes (key, salt), splitting a
    * hot key's rows over `buckets` tasks. Small side grows ×buckets —
    * use for genuinely small/dimension right sides.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFrom: Column,
                 buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by `key` as a catalog table:
    * two tables bucketed the same way join with zero exchange (the
    * scan itself is the partitioning). This is how the vector
    * collection would be laid out at rest so upserts, point-gets and
    * id-joins never shuffle the corpus.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.bucketBy(numBuckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)
}
