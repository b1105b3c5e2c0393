package graft

import graft.core.GraftSession
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...}. Each query is executed fully
  * through a noop sink (count() would let Catalyst prune the plan to a
  * row-count over the scan, which is not the work being measured).
  *
  * Per query: one untimed warmup (JIT/codegen/scan cache), then REPS
  * timed runs; the reported per-query number is the MEDIAN, with the
  * min alongside in `queries_min`, every rep in `queries_reps`, and
  * the GC wall-clock charged to the timed reps in `queries_gc_ms` — so
  * a one-off rep swing is attributable (GC vs plan) from the artifact
  * alone. The cache is cleared between queries so one query's
  * persisted frames can't tax the next. A failed query lands in
  * `errors` instead of masquerading as a timing.
  */
object Bench {
  private val Reps = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark: SparkSession = GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val headline = SparkEntry.inventory.filter(_.bench)
    val medians = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val reps = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val gcMs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    headline.foreach { q =>
      def once(): Unit =
        q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        once() // warmup, untimed
        spark.sparkContext.setJobDescription(s"bench:${q.name}")
        val gc0 = gcMillis()
        val times = (1 to Reps).map { _ =>
          val t0 = System.nanoTime()
          once()
          (System.nanoTime() - t0) / 1e9
        }
        gcMs(q.name) = (gcMillis() - gc0).toDouble
        spark.sparkContext.setJobDescription(null)
        medians(q.name) = median(times)
        mins(q.name) = times.min
        reps(q.name) = times
      } catch {
        case e: Throwable =>
          errors(q.name) = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[bench] ${q.name} failed: ${errors(q.name)}")
      }
      // a query that persists frames must not bill the next one
      spark.catalog.clearCache()
    }

    def jnum(m: collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    def jarr(m: collection.Map[String, Seq[Double]]): String =
      m.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(v => f"$v%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    def jstr(m: collection.Map[String, String]): String =
      m.map { case (k, v) =>
        "\"" + k + "\":\"" + v.replaceAll("[\\\\\"\\n\\r\\t]", " ").take(120) + "\""
      }.mkString("{", ",", "}")

    val total = medians.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$Reps,""" +
        s""""queries":${jnum(medians)},"queries_min":${jnum(mins)},""" +
        s""""queries_reps":${jarr(reps)},"queries_gc_ms":${jnum(gcMs)},""" +
        s""""errors":${jstr(errors)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
