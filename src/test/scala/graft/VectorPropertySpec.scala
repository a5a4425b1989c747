package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.vec

/** Property-based checks of the native vector expressions against
  * straight-line Scala reference math on random inputs — the codegen
  * path (whole-stage Java) and the interpreted `nullSafeEval` path
  * must both agree with the definition to machine precision, for any
  * dimension and value range.
  */
class VectorPropertySpec extends SparkSpec {

  private val genVecPair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(1, 128)
    a <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
    b <- Gen.listOfN(n, Gen.choose(-100.0f, 100.0f))
  } yield (a.toArray, b.toArray)

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def refNorm2(a: Array[Float]): Double = refDot(a, a)

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }

  test("native expressions equal reference math on random vectors (batched plan)") {
    import spark.implicits._
    // evaluate many random pairs through ONE DataFrame so the check
    // exercises the batched codegen path, not per-row sessions
    val pairs = Gen.listOfN(60, genVecPair).sample.get
    val rows = pairs.toDF("a", "b")
      .select(vec.dot($"a", $"b").as("d"), vec.cosine($"a", $"b").as("c"),
        vec.l2($"a", $"b").as("e"), vec.l1($"a", $"b").as("m"))
      .collect()
    pairs.zip(rows).foreach { case ((a, b), r) =>
      val d = refDot(a, b)
      val na = math.sqrt(refNorm2(a)); val nb = math.sqrt(refNorm2(b))
      assert(math.abs(r.getDouble(0) - d) <= math.abs(d) * 1e-12 + 1e-12)
      if (na > 0 && nb > 0)
        assert(math.abs(r.getDouble(1) - d / (na * nb)) < 1e-9)
      val l2 = math.sqrt(a.zip(b).map { case (x, y) =>
        val t = x.toDouble - y.toDouble; t * t }.sum)
      assert(math.abs(r.getDouble(2) - l2) < 1e-9 * (1 + l2))
      val l1 = a.zip(b).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
      assert(math.abs(r.getDouble(3) - l1) < 1e-9 * (1 + l1))
    }
  }

  test("cosine is scale-invariant and bounded (property)") {
    import spark.implicits._
    check(Prop.forAll(genVecPair, Gen.choose(0.1f, 10.0f)) { case ((a, b), k) =>
      val d = refDot(a, b)
      val na = math.sqrt(refNorm2(a)); val nb = math.sqrt(refNorm2(b))
      (na == 0 || nb == 0) || {
        val df = Seq((a, b, a.map(_ * k))).toDF("a", "b", "ka")
        val r = df.select(vec.cosine($"a", $"b").as("c"),
          vec.cosine($"ka", $"b").as("ck")).head()
        math.abs(r.getDouble(0)) <= 1.0 + 1e-9 &&
          math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6
      }
    })
  }

  test("simhash64 is stable and flips bounded bits under small edits") {
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.listOfN(20, Gen.choose(1L, 1000000L)))
    val docs = gen.sample.get.map(_.toArray)
    val df = docs.toDF("h")
      .select(graft.functions.hashes.simhash64(col("h")).as("s"))
    val sigs = df.collect().map(_.getLong(0))
    val again = docs.toDF("h")
      .select(graft.functions.hashes.simhash64(col("h")).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs.sameElements(again), "simhash must be deterministic")
    // identical token multisets in any order hash identically
    val shuffled = docs.map(d => scala.util.Random.shuffle(d.toSeq).toArray)
    val sigShuf = shuffled.toDF("h")
      .select(graft.functions.hashes.simhash64(col("h")).as("s"))
      .collect().map(_.getLong(0))
    assert(sigs.sameElements(sigShuf), "simhash must be order-invariant")
  }

  test("sign_bits xor popcount equals the per-dimension sign disagreement count") {
    import spark.implicits._
    val pairs = Gen.listOfN(60, genVecPair).sample.get
    val rows = pairs.toDF("a", "b")
      .select(bit_count(graft.functions.matrixops.signBits($"a")
        .bitwiseXOR(graft.functions.matrixops.signBits($"b"))).as("h"))
      .collect().map(_.getInt(0))
    pairs.zip(rows).foreach { case ((a, b), h) =>
      val n = math.min(64, math.min(a.length, b.length))
      // dims beyond the shorter vector contribute that vector's 0-bit
      // vs the longer one's sign bit — mirror SignBits' padding rule
      val (long, short) = if (a.length >= b.length) (a, b) else (b, a)
      val ref = (0 until math.min(64, long.length)).count { i =>
        val sLong = long(i) >= 0
        val sShort = if (i < short.length) short(i) >= 0 else false
        sLong != sShort
      }
      assert(h == ref, s"hamming $h != ref $ref (n=$n)")
    }
  }

  test("lsh_band_buckets is bit-identical to the composed vec_dot >= 0 form") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // bandings spanning the chooser's whole clamp range, including
    // the (10, 48) production size whose composed form breached
    // Janino — the native expression must agree with the COMPOSED
    // EXPRESSION PIPELINE (not just local math) on every bucket
    // bandings spanning the chooser's clamp range including r > 31
    // (concentrated-collection sizing packs up to 62 bits in a long)
    for ((r, b) <- Seq((4, 4), (7, 16), (10, 48), (55, 13))) {
      val dim = 32
      val planes: Seq[Seq[Float]] =
        Seq.fill(r * b)(Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      val vecs = Seq.fill(50)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
      val df = vecs.toDF("embedding").localCheckpoint()
      val native = df.select(
        graft.functions.matrixops.lshBandBuckets($"embedding", planes, r).as("bks"))
        .collect().map(_.getSeq[Long](0))
      val bits = planes.map(p =>
        when(vec.dot(typedLit(p), $"embedding") >= 0, 1L).otherwise(0L))
      val composed = df.select(array((0 until b).map { t =>
        (0 until r).map(i => bits(t * r + i) * (1L << i)).reduce(_ + _)
      }: _*).as("bks")).collect().map(_.getSeq[Long](0))
      native.zip(composed).foreach { case (n, c) =>
        assert(n == c, s"banding ($r,$b): native $n != composed $c")
      }
    }
  }
}
