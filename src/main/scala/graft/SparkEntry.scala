package graft

import graft.core.GQuery
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared query inventory: every operator class from SURVEY.md §2
  * (scan/filter/project, agg, top-k, joins incl. semi/anti, windows,
  * rollup/cube, set ops, the clean_text F1–F7 kernels, metric queries
  * M5–M8) plus the training-data-pipeline extensions (dedup exact /
  * prefix / n-gram-Jaccard / MinHash-LSH / SimHash, embedding
  * similarity search brute-force + IVF, text quality/lang-id/
  * fingerprint, event-time windows & sessionization).
  *
  * Each GQuery carries its DuckDB oracle SQL where the semantics are
  * ANSI-expressible; seeded-hash operators (MinHash/SimHash/IVF) are
  * rows-only checked by the driver and validated against exact
  * counterparts in the ScalaTest specs.
  */
object SparkEntry {

  val inventory: Seq[GQuery] =
    Relational.all ++ TextQueries.all ++ Dedup.all ++ Similarity.all ++
      WindowQueries.all ++ MlQueries.all

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    inventory.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    inventory.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
