package graft

// Temporary measurement harness for the optimization round — NOT part
// of the driver contract; deleted before the round ends.
import graft.core.{GraftSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Scratch {
  private def time(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
    def once(): Unit = df.write.format("noop").mode("overwrite").save()
    once() // warmup
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
    }
    println(f"[scratch] $label%-28s med=${ts.sorted.apply(1)}%.3f min=${ts.min}%.3f")
    spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d).filter(col("doc_id") < 1000L)

    time(spark, "scan only")(docs)
    time(spark, "tokens only")(
      docs.select(col("doc_id"), tokens(col("text")).as("t")))
    time(spark, "shingle arrays")(
      docs.select(col("doc_id"),
        array_distinct(wordShingles(tokens(col("text")), 3)).as("sh")))
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(wordShingles(tokens(col("text")), 3))).as("shingle"))
    time(spark, "shingled exploded")(sh)
    time(spark, "sh counts")(sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
    time(spark, "minhash signatures")(operators.Dedup.minhashSignatures(spark, d))
    time(spark, "q33 full")(operators.Dedup.minhashLshPairs(spark, d))
    time(spark, "q32 full")(operators.Dedup.ngramJaccardPairs(spark, d))
    time(spark, "q32 selfjoin+count")(
      sh.as("a").join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1))))
    time(spark, "q34 full")(operators.Dedup.simhashPairs(spark, d))
    time(spark, "q01 full")(operators.Relational.pricingSummary(spark, d))
    time(spark, "q01 double sums")(
      Tables.lineitem(spark, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          avg(col("l_quantity")), count(lit(1)))
        .orderBy("l_returnflag", "l_linestatus"))
    time(spark, "q05 full")(operators.Relational.revenueByNation(spark, d))
    time(spark, "q16 full")(operators.Relational.aboveAvgOrders(spark, d))

    time(spark, "q35 full")(operators.Similarity.knnBruteForce(spark, d))
    time(spark, "q36 full")(operators.Similarity.embeddingNearDup(spark, d))
    time(spark, "q37 full")(operators.Similarity.annIvf(spark, d))
    spark.stop()
  }
}
