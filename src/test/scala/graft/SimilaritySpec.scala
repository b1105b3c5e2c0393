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

  test("blocked near-dup self-join computes the embedding pipeline once (reused exchange)") {
    val df = Similarity.embeddingNearDup(spark, sf)
    df.collect() // materialize so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedQueryStage") || plan.contains("ReusedExchange"),
      "label self-join must share one exchange: " + plan.take(4000))
  }

  test("trained IVF codebook yields non-degenerate buckets (no bucket > 40% of vectors)") {
    val buckets = Similarity.ivfBucketsForSpec(spark, sf)
    val counts = buckets.groupBy("bucket").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = counts.values.sum.toDouble
    assert(total > 0)
    val maxShare = counts.values.max / total
    assert(counts.size >= 4, s"degenerate codebook: only ${counts.size} buckets used")
    assert(maxShare <= 0.40, s"hot bucket holds ${maxShare * 100}%: $counts")
  }

  test("trained IVF codebook is deterministic across invocations") {
    def snap() = Similarity.ivfBucketsForSpec(spark, sf)
      .orderBy("c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(snap() === snap())
  }

  test("aggregate-argmax bucket assignment equals the window rank-1 spelling") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.expressions.Window
    val emb = core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("v").as("centv"), col("nrm").as("centn"))
    val simToCent = emb.join(broadcast(centroids))
      .withColumn("csim", dot(col("v"), col("centv")) / (col("nrm") * col("centn")))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    val want = simToCent.withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("cent_id").as("bucket"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    val got = simToCent.groupBy("vec_id")
      .agg(max(struct(col("csim"), negate(col("cent_id")).as("negc"), col("cent_id"))).as("m"))
      .select(col("vec_id"), col("m.cent_id").as("bucket"))
      .orderBy("vec_id").collect().map(_.toSeq).toSeq
    assert(got === want)
  }

}
