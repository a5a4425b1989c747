package graft

import graft.functions.{hashes, vec}
import org.apache.spark.sql.functions._

/** Property checks: the generated-Java expression loops must agree
  * with straightforward Scala reference math on randomized inputs
  * (fixed seed), including edge shapes — empty, length-mismatched,
  * zero, and extreme-valued vectors.
  */
class ExpressionPropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(123)
  private def vecOf(n: Int): Array[Float] =
    Array.fill(n)((rnd.nextDouble() * 20 - 10).toFloat)

  test("similarity expressions match reference math on 200 random pairs") {
    import spark.implicits._
    val pairs = Seq.fill(200)((vecOf(64), vecOf(64))) ++
      Seq((Array.empty[Float], Array.empty[Float]),
          (vecOf(3), vecOf(7)),                       // mismatched dims: min-length prefix
          (Array.fill(64)(0.0f), vecOf(64)),          // zero vector
          (Array.fill(64)(1e18f), Array.fill(64)(1e18f)))
    val rows = pairs.toDF("a", "b")
      .select($"a", $"b", vec.dot($"a", $"b").as("d"),
        vec.l2($"a", $"b").as("l"), vec.cosine($"a", $"b").as("c"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Float](0).map(_.toDouble)
      val b = r.getSeq[Float](1).map(_.toDouble)
      val n = math.min(a.length, b.length)
      var dot = 0.0; var l2 = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until n) {
        dot += a(i) * b(i); val d = a(i) - b(i); l2 += d * d
        na += a(i) * a(i); nb += b(i) * b(i)
      }
      def closeOrBothNaN(x: Double, y: Double): Boolean =
        (x.isNaN && y.isNaN) || x == y ||
          math.abs(x - y) <= 1e-12 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
      assert(closeOrBothNaN(r.getAs[Double]("d"), dot))
      assert(closeOrBothNaN(r.getAs[Double]("l"), math.sqrt(l2)))
      assert(closeOrBothNaN(r.getAs[Double]("c"), dot / (math.sqrt(na) * math.sqrt(nb))))
    }
  }

  test("cosine is symmetric and bounded on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("b")))
    val rows = pairs.select(
      vec.cosine(col("a"), col("b")).as("ab"),
      vec.cosine(col("b"), col("a")).as("ba")).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("ab") == r.getAs[Double]("ba"))
      assert(math.abs(r.getAs[Double]("ab")) <= 1.0 + 1e-12)
    }
  }

  test("simhash64 matches a reference implementation on random token hash arrays") {
    import spark.implicits._
    val inputs = Seq.fill(100)(Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong())) :+ Seq.empty[Long]
    val rows = inputs.toDF("hs").select($"hs", hashes.simhash64($"hs").as("s")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      var expect = 0L
      for (j <- 0 until 64) {
        val cnt = hs.count(h => ((h >>> j) & 1L) == 1L)
        if (2 * cnt > hs.length) expect |= 1L << j
      }
      assert(r.getAs[Long]("s") == expect)
    }
  }
}
