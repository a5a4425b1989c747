package graft

import graft.sources.CollectionSource
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CollectionSourceSpec extends SparkSpec {

  private def reference = Tables.embeddings(spark, sfDir)
    .select("vec_id", "embedding", "label")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Seq[Float]]("embedding"), r.getAs[Long]("label"))).toMap

  test("jsonLines import round-trips the collection with float embeddings") {
    val dir = Files.createTempDirectory("graft-src-json").toString + "/data"
    reference.write.mode("overwrite").json(dir)
    val back = CollectionSource.jsonLines(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    assert(back.schema("embedding").dataType.catalogString == "array<float>")
    assert(asMap(back) == asMap(reference.withColumn("label", col("label").cast("long"))))
  }

  test("delimited import parses sep-joined embeddings") {
    val dir = Files.createTempDirectory("graft-src-csv").toString + "/data"
    reference
      .select(col("vec_id"), concat_ws(";", col("embedding")).as("embedding"), col("label"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val back = CollectionSource.delimited(spark, dir)
    assert(back.schema("embedding").dataType.catalogString == "array<float>")
    assert(back.count() == 500)
    // spot-check one vector survives the text round trip
    val origRow = reference.filter(col("vec_id") === 0).head()
    val orig = origRow.getSeq[Float](origRow.fieldIndex("embedding"))
    val gotRow = back.filter(col("vec_id") === "0").head()
    val got = gotRow.getSeq[Float](gotRow.fieldIndex("embedding"))
    assert(orig.zip(got).forall { case (a, b) => math.abs(a - b) < 1e-4 })
  }

  test("parquet import keeps float embeddings untouched") {
    val df = CollectionSource.parquet(spark, s"$sfDir/embeddings.parquet")
    assert(df.schema("embedding").dataType.catalogString == "array<float>")
    assert(df.count() == 500)
  }

  test("binaryFiles ingests raw payloads with glob pruning at listing time") {
    val dir = Files.createTempDirectory("graft-src-bin")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.jpg"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("c.txt"), Array[Byte](9))
    val all = CollectionSource.binaryFiles(spark, dir.toString)
    assert(all.count() == 3)
    val jpgs = CollectionSource.binaryFiles(spark, dir.toString, Some("*.jpg"))
      .select(col("path"), col("length"), col("content")).collect()
    assert(jpgs.length == 2)
    val byName = jpgs.map(r => r.getAs[String]("path").split('/').last ->
      r.getAs[Array[Byte]]("content")).toMap
    assert(byName("a.jpg").sameElements(Array[Byte](1, 2, 3)))
    assert(byName("b.jpg").sameElements(Array[Byte](4, 5)))
    assert(jpgs.forall(r => r.getAs[Long]("length") ==
      r.getAs[Array[Byte]]("content").length))
  }

  test("orc import round-trips the collection exactly") {
    val dir = Files.createTempDirectory("graft-src-orc").toString + "/data"
    reference.write.mode("overwrite").orc(dir)
    val back = CollectionSource.orc(spark, dir)
    assert(back.schema("embedding").dataType.catalogString == "array<float>")
    assert(asMap(back.withColumn("label", col("label").cast("long"))) ==
      asMap(reference.withColumn("label", col("label").cast("long"))))
  }
}
