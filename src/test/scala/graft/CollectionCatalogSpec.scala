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

    // rename: pure filesystem move, no data rewrite, no clobber
    cat.rename("vectors", "vectors2")
    assert(cat.list() == Seq("vectors2"))
    assert(cat.load("vectors2").count() == emb.count())
    intercept[IllegalArgumentException] { cat.rename("nope", "x") }
    cat.create("other", emb.limit(1))
    intercept[IllegalArgumentException] { cat.rename("vectors2", "other") }
  }

  test("snapshot and restore round-trip a mutated collection") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-catalog-snap").toString
    val cat = CollectionCatalog(spark, root)
    cat.create("col", Tables.embeddings(spark, sfDir))
    val n0 = cat.load("col").count()

    val snap = cat.snapshot("col")
    assert(cat.listSnapshots("col") == Seq(snap))
    assert(cat.list() == Seq("col"), "snapshot storage must not appear as a collection")

    // destructive mutation after the snapshot
    cat.create("col", Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10))
    assert(cat.load("col").count() == 10)

    cat.restore(snap)
    assert(cat.load("col").count() == n0)
    // snapshots survive the restore
    assert(cat.listSnapshots("col") == Seq(snap))
  }

  test("point-in-time pagination: cursor pages over a snapshot are stable under concurrent writes") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-catalog-pit").toString
    val cat = CollectionCatalog(spark, root)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
    cat.create("col", docs)
    val pit = cat.snapshot("col")

    // page 1 from the PIT handle (keyset order: n_chars desc, doc_id)
    def page(df: org.apache.spark.sql.DataFrame,
             after: Option[(Long, Long)], n: Int) = {
      val filtered = after.fold(df) { case (c, id) =>
        df.filter(col("n_chars") < c || (col("n_chars") === c && col("doc_id") > id))
      }
      filtered.orderBy(col("n_chars").desc, col("doc_id")).limit(n)
        .collect().map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
    }
    val want = docs.orderBy(col("n_chars").desc, col("doc_id")).limit(40)
      .collect().map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
    val p1 = page(cat.loadSnapshot(pit), None, 20)
    // a concurrent writer rewrites the live collection between pages
    cat.create("col", docs.filter(col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + 1000000L))
    val p2 = page(cat.loadSnapshot(pit), Some(p1.last), 20)
    assert((p1 ++ p2).sameElements(want),
      "PIT pages must reflect the snapshot, unaffected by concurrent writes")
    // the live collection really did change (the PIT stability is non-vacuous)
    assert(page(cat.load("col"), None, 20).forall(_._1 >= 1000000L))
  }

  test("compaction collapses the small-file tail without changing data") {
    val root = Files.createTempDirectory("graft-catalog-comp").toString
    val cat = CollectionCatalog(spark, root)
    // simulate continuous ingest: many tiny appended files
    val emb = Tables.embeddings(spark, sfDir).repartition(64)
    cat.create("ingested", emb)
    val checksum = cat.load("ingested")
      .agg(org.apache.spark.sql.functions.sum("vec_id")).head().getLong(0)
    val n = cat.load("ingested").count()

    val (before, after) = cat.compact("ingested")
    assert(before >= 64, s"expected the small-file tail, saw $before")
    assert(after < before && after >= 1, s"$before -> $after")
    assert(cat.load("ingested").count() == n)
    assert(cat.load("ingested")
      .agg(org.apache.spark.sql.functions.sum("vec_id")).head().getLong(0) == checksum)
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

  test("alias swap repoints readers atomically across a reindex — zero downtime") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-catalog-alias").toString
    val cat = CollectionCatalog(spark, root)
    val emb = Tables.embeddings(spark, sfDir)
    cat.create("vectors_v1", emb)
    cat.setAlias("vectors", "vectors_v1")
    assert(cat.resolveAlias("vectors").contains("vectors_v1"))
    assert(cat.listAliases() == Seq("vectors" -> "vectors_v1"))

    // clients search through the alias — a kNN against cat.open
    val q = graft.operators.VectorSearch.querySet(spark, sfDir).limit(1)
    def searchViaAlias(): Set[Long] =
      cat.open("vectors").crossJoin(broadcast(q))
        .withColumn("score", graft.functions.vec.cosine(col("q_emb"), col("embedding")))
        .orderBy(col("score").desc, col("vec_id")).limit(5)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    val before = searchViaAlias()
    assert(before.nonEmpty)

    // reindex: rebuild into a NEW collection (here: only even ids so
    // the swap is observable), then one atomic alias swap
    cat.create("vectors_v2", emb.filter(col("vec_id") % 2 === 0))
    cat.setAlias("vectors", "vectors_v2")
    val after = searchViaAlias()
    assert(after.forall(_ % 2 == 0), s"post-swap read saw v1 rows: $after")
    assert(cat.resolveAlias("vectors").contains("vectors_v2"))

    // the old generation is still addressable by real name, then drops
    assert(cat.open("vectors_v1").count() == emb.count())
    cat.drop("vectors_v1")
    assert(searchViaAlias() == after)
    // alias to a missing target refuses; plain names pass through open()
    intercept[IllegalArgumentException] { cat.setAlias("vectors", "nope") }
    assert(cat.open("vectors_v2").count() == emb.filter(col("vec_id") % 2 === 0).count())
    assert(cat.dropAlias("vectors") && cat.listAliases().isEmpty)
  }

  test("reindex: filtered + transformed copy with zero-downtime alias swap") {
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-catalog-reindex").toString
    val cat = CollectionCatalog(spark, root)
    val docs = Tables.documents(spark, sfDir)
    cat.create("docs_v1", docs)
    cat.setAlias("docs", "docs_v1")

    // plain copy: row-for-row identical
    assert(cat.reindex("docs_v1", "copy") == docs.count())
    assert(cat.load("copy").schema == cat.load("docs_v1").schema)

    // filter (wire JSON) + transform (the ES `script` role) through
    // the ALIAS as source, landing as the next generation + swap
    val n = cat.reindex(
      source = "docs", dest = "docs_v2",
      filterJson = Some("""{ "must": [ {"key": "lang", "match": {"value": "en"}} ] }"""),
      transform = _.withColumn("n_tokens", size(split(col("text"), " ")))
        .drop("text"),
      alias = Some("docs"))
    val expected = docs.filter(col("lang") === "en")
    assert(n == expected.count())
    assert(cat.resolveAlias("docs").contains("docs_v2"))
    val served = cat.open("docs")
    assert(served.columns.contains("n_tokens") && !served.columns.contains("text"))
    assert(served.filter(col("lang") =!= "en").count() == 0)
    // transform computed correctly, not just schema-present
    val probe = docs.filter(col("lang") === "en")
      .select(col("doc_id"), size(split(col("text"), " ")).as("want"))
    assert(served.select(col("doc_id"), col("n_tokens"))
      .join(probe, "doc_id")
      .filter(col("n_tokens") =!= col("want")).count() == 0)

    // malformed wire filter fails fast and leaves no destination
    intercept[RuntimeException] {
      cat.reindex("docs_v1", "bad", filterJson = Some("""{"must": [{"key": "lang"}]}"""))
    }
    assert(!cat.exists("bad"))
    intercept[IllegalArgumentException] { cat.reindex("docs_v1", "docs_v1") }
  }
}
