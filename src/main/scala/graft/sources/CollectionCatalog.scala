package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collection administration — the create / list / describe / drop
  * surface every reference backend exposes (Chroma
  * create_collection, Qdrant recreate_collection, Milvus
  * create_collection, ES indices API), re-expressed as managed
  * parquet directories under one catalog root.
  *
  * Collections are immutable-snapshot directories: `create` writes
  * the frame (optionally partitioned by a column — the IVF at-rest
  * layout drops in directly), `load` is a plain parquet read with
  * full pushdown/pruning, `drop` removes the directory. On a real
  * deployment the root is an object-store prefix and none of this
  * code changes — the Hadoop FileSystem API resolves s3a/gs/abfs the
  * same way.
  */
final case class CollectionCatalog(spark: SparkSession, root: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dir(name: String): Path = new Path(root, name)

  /** Create (or overwrite) a collection from a DataFrame. */
  def create(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir(name).toString)
  }

  /** Names of all collections under the root. */
  def list(): Seq[String] =
    if (!fs.exists(new Path(root))) Nil
    else fs.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sorted

  def exists(name: String): Boolean = fs.exists(dir(name))

  /** Open a collection as a DataFrame (lazy scan). */
  def load(name: String): DataFrame = spark.read.parquet(dir(name).toString)

  /** One-row profile: row count and schema field names. */
  def describe(name: String): DataFrame = {
    val df = load(name)
    df.agg(count(lit(1)).as("n_rows"))
      .withColumn("collection", lit(name))
      .withColumn("columns", lit(df.columns.mkString(",")))
      .select(col("collection"), col("n_rows"), col("columns"))
  }

  /** Drop a collection (removes the directory). */
  def drop(name: String): Boolean = fs.delete(dir(name), true)
}
