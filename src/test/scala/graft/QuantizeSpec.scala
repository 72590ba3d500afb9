package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ann.{Quantize, Similarity}

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("codes stay in [-127, 127] and the max-|v| element hits ±127") {
    val q = Quantize.quantize(Tables.embeddings(spark, sf))
    val stats = q.select(
      max(aggregate(transform($"qvec", c => abs(c)), lit(0), (a, b) => greatest(a, b))).as("mx"),
      min(aggregate(transform($"qvec", c => abs(c)), lit(127), (a, b) => greatest(a, b))).as("mn"))
      .as[(Int, Int)].head()
    assert(stats._1 == 127) // global max element quantizes to exactly 127
    assert(stats._2 == 127) // EVERY vector's max element hits 127 (symmetric scale)
  }

  test("codegen quantize_codes is bit-identical to the HOF formulation") {
    val embs = Tables.embeddings(spark, sf)
    val sc = Quantize.scaleOf($"embedding")
    val hof = embs.select($"vec_id", sc.as("scale"),
      Quantize.codesOf($"embedding", sc).as("qvec"))
    val gen = Quantize.quantize(embs).select($"vec_id", $"scale", $"qvec")
    assert(gen.exceptAll(hof).isEmpty && hof.exceptAll(gen).isEmpty)
  }

  test("zero vector quantizes to zero codes with scale 1") {
    val d = Seq((1L, Array(0f, 0f, 0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Quantize.quantize(d).select($"scale",
      aggregate($"qvec", lit(0), (a, b) => a + abs(b))).as[(Double, Int)].head()
    assert(got == ((1.0, 0)))
  }

  test("dequantized cosine tracks the exact cosine (int8 error bound)") {
    val embs = Tables.embeddings(spark, sf)
    val q = Quantize.quantize(embs)
    val pairs = q.as("a").join(q.as("b"),
        col("a.vec_id") === col("b.vec_id") - 250)
      .select(
        (Quantize.qdot(col("a.qvec"), col("b.qvec")) * col("a.scale") * col("b.scale"))
          .as("approx"),
        col("a.vec_id").as("ai"), col("b.vec_id").as("bi"))
    val exact = embs.as("x").join(embs.as("y"),
        col("x.vec_id") === col("y.vec_id") - 250)
      .select(Similarity.dot(col("x.embedding"), col("y.embedding")).as("exact"),
        (Similarity.norm(col("x.embedding")) * Similarity.norm(col("y.embedding")))
          .as("nprod"),
        col("x.vec_id").as("ai"))
    val err = pairs.join(exact, "ai")
      .select(max(abs(($"approx" - $"exact") / $"nprod"))).as[Double].head()
    // cosine-scale error for 64-dim int8 is well under 0.05
    assert(err < 0.05, s"max cosine-scale quantization error $err")
  }

  test("codegen dot_i is bit-identical to the zip_with formulation") {
    val q = Quantize.quantize(Tables.embeddings(spark, sf))
    val mismatches = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id") - 480)
      .select(
        graft.functions.VectorFunctions.dot_i(col("a.qvec"), col("b.qvec")).as("fast"),
        aggregate(zip_with(col("a.qvec"), col("b.qvec"),
          (x, y) => (x * y).cast("long")), lit(0L), _ + _).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mismatches == 0)
  }

  test("quantized+refine KNN recalls most of the exact top-k") {
    val embs = Tables.embeddings(spark, sf)
    val exact = Similarity.knnBrute(embs).select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val quant = Quantize.quantKnn(embs).select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 of quantized search: $recall")
  }
}
