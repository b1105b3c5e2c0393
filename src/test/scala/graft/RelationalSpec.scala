package graft

import graft.operators.Relational
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins relational-operator rewrites to the reference spellings they
  * replaced (the DuckDB oracle is the primary gate; these keep the
  * equivalence argument executable in isolation).
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  test("argmax latest-event equals the row_number window spelling") {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = core.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .orderBy("user_id")
      .collect().map(_.toSeq).toSeq
    val got = Relational.latestEventPerUser(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(got === want)
  }

  test("latest-event plan aggregates, with no window pass") {
    val plan = Relational.latestEventPerUser(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(3000))
    assert(plan.contains("Aggregate"), plan.take(3000))
  }
}
