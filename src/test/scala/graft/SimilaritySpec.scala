package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("codegen dot product matches the interpreted HOF fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, 0.6)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorFunctions.dot(col("a"), col("b")).as("fast"),
      hof.as("slow")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("dot product is null on unequal lengths, matching the HOF null-pad") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),
      (Seq(1.0), Seq.empty[Double])
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorFunctions.dot(col("a"), col("b")).as("fast"),
      hof.as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), "expression must null out on length mismatch")
      assert(r.isNullAt(1), "HOF reference semantics: null-padded product")
    }
  }

  test("IVF ANN recall@5 >= 0.8 against the brute-force baseline") {
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val brute = topSets(Similarity.knnBruteForce(spark, sf))
    val ivf = topSets(Similarity.annIvf(spark, sf))
    val recalls = brute.map { case (q, trueTop) =>
      ivf.getOrElse(q, Set.empty).intersect(trueTop).size.toDouble / trueTop.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 = $mean")
  }

  test("near-dup join plans broadcast the small side, never nested-loop over pairs") {
    val plan = Similarity.knnBruteForce(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("blocked near-dup plan contains no cartesian product") {
    val plan = Similarity.embeddingNearDup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
