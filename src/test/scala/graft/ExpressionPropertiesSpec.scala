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

  test("mat_vec matches reference math and inverts through the transpose on orthogonal matrices") {
    import spark.implicits._
    import graft.functions.matrixops
    // a genuinely orthogonal 16x16 matrix via Gram-Schmidt on a fixed
    // random basis (the OPQ rotation shape)
    val dim = 16
    val rr = new scala.util.Random(7)
    val basis = Array.fill(dim)(Array.fill(dim)(rr.nextGaussian()))
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => basis(i)(k) * basis(j)(k)).sum
        for (k <- 0 until dim) basis(i)(k) -= d * basis(j)(k)
      }
      val n = math.sqrt(basis(i).map(x => x * x).sum)
      for (k <- 0 until dim) basis(i)(k) /= n
    }
    val rot: Seq[Seq[Float]] = basis.map(_.map(_.toFloat).toSeq).toSeq
    val rotT: Seq[Seq[Float]] = rot.transpose
    val vecs = Seq.fill(100)(vecOf(dim)) ++ Seq(
      Array.empty[Float],        // empty input: zero dot per output row
      vecOf(7),                  // short input: truncated dot
      Array.fill(dim)(0.0f))
    val rows = vecs.toDF("v")
      .select($"v", matrixops.matVec($"v", rot).as("rv"),
        matrixops.matVec(matrixops.matVec($"v", rot), rotT).as("rt"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0).map(_.toDouble)
      val rv = r.getSeq[Double](1)
      val rt = r.getSeq[Double](2)
      assert(rv.length == dim && rt.length == dim)
      for (i <- 0 until dim) {
        val expect = (0 until math.min(dim, v.length)).map(j => rot(i)(j).toDouble * v(j)).sum
        assert(math.abs(rv(i) - expect) <= 1e-9,
          s"mat_vec row $i: ${rv(i)} vs $expect")
      }
      // Rᵀ·(R·v) ≈ v (float-matrix round-off only): the property the
      // OPQ reconstruct path relies on
      if (v.length == dim)
        for (i <- 0 until dim)
          assert(math.abs(rt(i) - v(i)) <= 1e-4, s"orthogonal round-trip row $i: ${rt(i)} vs ${v(i)}")
    }
  }

  test("top_k_by_score agrees with the row_number window form, including ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rr = new scala.util.Random(41)
    // scores drawn from a SMALL discrete set so cross-id ties are
    // dense — the tie-break (score desc, id asc) is the contract
    val rows = (0 until 5000).map { i =>
      (i % 37, i.toLong, (rr.nextInt(40).toDouble / 8.0))
    }.toDF("q_id", "vec_id", "score").localCheckpoint()
    val k = 10
    val viaAgg = rows.groupBy($"q_id")
      .agg(graft.functions.aggops.topKByScore($"score", $"vec_id", k).as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).as("rn"), $"col.vec_id", $"col.score")
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val viaWindow = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"q_id", $"rn", $"vec_id", $"score")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "aggregate and window top-k must agree exactly")
  }

  test("top_k_by_score orders NaN as the largest double, matching the window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rr = new scala.util.Random(43)
    // NaN scores happen in the calibration truth scan (cosine of a
    // zero vector); Spark's total order sorts NaN ABOVE every double,
    // so score-desc puts NaN first — the buffer must agree or the two
    // documented-equivalent forms diverge exactly when it matters
    val rows = (0 until 2000).map { i =>
      val s = if (i % 17 == 0) Double.NaN else rr.nextInt(30).toDouble / 6.0
      (i % 23, i.toLong, s)
    }.toDF("q_id", "vec_id", "score").localCheckpoint()
    val k = 5
    val viaAgg = rows.groupBy($"q_id")
      .agg(graft.functions.aggops.topKByScore($"score", $"vec_id", k).as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).as("rn"), $"col.vec_id", $"col.score")
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val viaWindow = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"q_id", $"rn", $"vec_id", $"score")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "NaN scores must rank identically through the aggregate and the window")
  }

  test("top_k_by_score treats -0.0 == 0.0 as Spark's order does: signed-zero ties break by vec_id") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Spark's double order (SQLOrderingUtil.compareDoubles) short-
    // circuits x == y before the bit-level compare, so -0.0 and 0.0
    // TIE and the window form breaks the tie by vec_id across BOTH
    // zero signs; raw Double.compare ranks +0.0 strictly above -0.0
    // and would pick only +0.0 rows at the boundary. k = 25 puts the
    // cut inside the signed-zero pool of every group (per ~87-row
    // group: ~9 NaN + ~9 ones above, ~69 mixed-sign zeros at the cut).
    val rows = (0 until 2000).map { i =>
      val s = (i % 10) match {
        case 0 | 1 | 2 | 3 => 0.0
        case 4 | 5 | 6 | 7 => -0.0
        case 8             => 1.0
        case _             => Double.NaN
      }
      (i % 23, i.toLong, s)
    }.toDF("q_id", "vec_id", "score").localCheckpoint()
    val k = 25
    val viaAgg = rows.groupBy($"q_id")
      .agg(graft.functions.aggops.topKByScore($"score", $"vec_id", k).as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).as("rn"), $"col.vec_id")
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id")
    val viaWindow = rows
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= k)
      .select($"q_id", $"rn", $"vec_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty,
      "signed-zero ties must pick the same vec_ids through the aggregate and the window")
  }
}
