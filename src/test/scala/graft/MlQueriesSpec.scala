package graft

import graft.operators.MlQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q46 one-scan confusion-matrix-marginal rewrite to the
  * two-aggregate + inner-join spelling it replaced (the DuckDB oracle
  * is the primary gate; this keeps the equivalence argument
  * executable in isolation).
  */
class MlQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("class report equals the byLabel-join-byPred spelling") {
    val sc = core.Tables.embeddings(spark, sf)
      .select(col("label").cast("long").as("label"),
        (col("vec_id") % 10).as("pred"))
    val byLabel = sc.groupBy(col("label").as("class"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("tp"))
    val byPred = sc.groupBy(col("pred").as("class"))
      .agg(count(lit(1)).as("pred_cnt"))
    val want = byLabel.join(byPred, "class")
      .withColumn("precision", round(col("tp") / col("pred_cnt"), 6))
      .withColumn("recall", round(col("tp") / col("support"), 6))
      .withColumn("f1",
        round(when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))), 6))
      .select("class", "support", "tp", "pred_cnt", "precision", "recall", "f1")
      .orderBy("class")
      .collect().map(_.toSeq).toSeq
    val got = MlQueries.classReport(spark, sf).collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("class report scans the corpus once, with no join") {
    val qe = MlQueries.classReport(spark, sf).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(3000))
    val scans = "embeddings\\.parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 embeddings scan, saw $scans\n${plan.take(3000)}")
  }
}
