package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |  vec_l2(array(0.0f, 0.0f), array(3.0f, 4.0f)) AS l,
        |  vec_l1(array(0.0f, 0.0f), array(3.0f, 4.0f)) AS m,
        |  vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS d,
        |  simhash64(array(1L, 1L, 2L)) AS s""".stripMargin).head()
    assert(r.getAs[Double]("c") == 1.0)
    assert(r.getAs[Double]("l") == 5.0)
    assert(r.getAs[Double]("m") == 7.0)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Long]("s") == 1L)
  }

  test("SQL functions work against the embeddings table") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql_test")
    val n = spark.sql(
      """SELECT count(*) AS n FROM emb_sql_test
        |WHERE vec_cosine(embedding, embedding) > 0.999999""".stripMargin)
      .head().getAs[Long]("n")
    assert(n == 500)
  }
}
