package graft

import graft.sources.CollectionCatalog
import java.nio.file.Files

class CollectionCatalogSpec extends SparkSpec {

  test("create / list / load / describe / drop round-trip") {
    val root = Files.createTempDirectory("graft-catalog").toString
    val cat = CollectionCatalog(spark, root)
    assert(cat.list().isEmpty)

    val emb = Tables.embeddings(spark, sfDir)
    cat.create("vectors", emb)
    cat.create("docs", Tables.documents(spark, sfDir))
    assert(cat.list() == Seq("docs", "vectors"))
    assert(cat.exists("vectors") && !cat.exists("nope"))

    val back = cat.load("vectors")
    assert(back.count() == emb.count())
    assert(back.schema.fieldNames.sorted.sameElements(emb.schema.fieldNames.sorted))

    val d = cat.describe("vectors").head()
    assert(d.getAs[Long]("n_rows") == emb.count())
    assert(d.getAs[String]("columns").contains("embedding"))

    assert(cat.drop("docs"))
    assert(cat.list() == Seq("vectors"))
  }

  test("partitioned create prunes at the file-listing level") {
    val root = Files.createTempDirectory("graft-catalog-part").toString
    val cat = CollectionCatalog(spark, root)
    cat.create("by_label", Tables.embeddings(spark, sfDir), partitionBy = Seq("label"))
    val one = cat.load("by_label").filter(org.apache.spark.sql.functions.col("label") === 3)
    // partition filter → only label=3 rows, scanned from one directory
    val expected = Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("label") === 3).count()
    assert(one.count() == expected)
    val plan = one.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"), plan)
  }
}
