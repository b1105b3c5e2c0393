package graft.operators

import graft.core.{GQuery, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>, 64-d).
  *
  * Scale posture:
  *  - brute-force top-k broadcasts the (small) query set and streams
  *    the candidate corpus once — linear in corpus size, the correct
  *    baseline at any scale when the query set is small;
  *  - the IVF variant is the sub-linear path: one pass to assign each
  *    vector to its nearest centroid (broadcast codebook), candidates
  *    are then restricted to the probed buckets — at 100 TB the bucket
  *    assignment becomes the partitioning key so probes touch only
  *    matching partitions;
  *  - near-dup pairs are blocked by `label` (any cheap blocking key)
  *    to avoid the quadratic cross join.
  *
  * Per-pair scoring is one codegen'd dot (DotProductExpr); vector
  * norms are computed once per ROW before any join, never per pair.
  * `dot/(nrm_a*nrm_b)` is arithmetically identical to the cosine the
  * oracle computes, so round(…,4) parity is unaffected.
  */
object Similarity {

  private val K = 5
  private val NQueries = 10

  /** (vec_id, label, v, nrm): doubles + the per-row L2 norm, the shape
    * every similarity join here consumes. */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        toDoubleArray(col("embedding")).as("v"))
      .withColumn("nrm", norm2(col("v")))

  /** Brute-force exact top-k cosine neighbors for a fixed query set. */
  def knnBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(s, d)
    val queries = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cands = emb.filter(col("vec_id") >= NQueries)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    cands.join(broadcast(queries))
      .withColumn("sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "c_id", "sim")
      .orderBy("q_id", "rank")
  }

  val knnBruteForceSql: String =
    s"""SELECT q_id, rank, c_id, sim FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS sim,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) DESC,
       |      c.vec_id) AS rank
       |  FROM embeddings q CROSS JOIN embeddings c
       |  WHERE q.vec_id < $NQueries AND c.vec_id >= $NQueries)
       |WHERE rank <= $K ORDER BY q_id, rank""".stripMargin

  /** Embedding-cosine near-duplicate pairs, blocked by label to keep
    * candidate generation sub-quadratic. `maxVecId` bounds the slice
    * so the exact DuckDB oracle stays constant-cost as sf grows — an
    * oracle-harness knob, not part of the operator's semantics. */
  def embeddingNearDup(s: SparkSession, d: String,
                       maxVecId: Long = 2000L): DataFrame = {
    // hash-partitioned on the blocking key so both self-join sides
    // read ONE reused exchange: without it the planner broadcasts one
    // side and re-runs the scan + array-cast + norm pipeline for it
    // (the embeddings scan decodes the full vector column — measured
    // 0.23 s/scan at sf0.1). Also the scale shape: the blocked table
    // is corpus-sized, label skew is AQE's skew-join's job.
    val emb = withNorm(s, d).filter(col("vec_id") < maxVecId)
      .repartition(col("label"))
    // the similarity threshold lives IN the join condition: evaluated
    // on the JoinedRow view, so rejected candidate pairs never copy
    // their two 64-dim vectors into an output row (the post-join
    // filter spelling materialized every blocked pair first —
    // measured 2× slower). Survivors recompute the same deterministic
    // dot in the projection; output identical.
    val sim = round(dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")), 4)
    emb.as("a")
      .join(emb.as("b"), col("a.label") === col("b.label") &&
        col("a.vec_id") < col("b.vec_id") && sim >= 0.35)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        col("a.label").as("label"), sim.as("sim"))
      .orderBy("a_id", "b_id")
  }

  val embeddingNearDupSql: String =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label AS label,
      |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
      |FROM embeddings a JOIN embeddings b
      |  ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE a.vec_id < 2000 AND b.vec_id < 2000
      |  AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  /** IVF-style approximate NN: codebook = vectors 0..7, assign every
    * vector to its nearest centroid (broadcast join, one pass), then
    * probe the query's 2 nearest buckets only. No oracle — approximate
    * by construction; SimilaritySpec checks recall@K against the
    * brute-force baseline. */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(s, d).select("vec_id", "v", "nrm")
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("v").as("centv"), col("nrm").as("centn"))
    val bc = broadcast(centroids)
    def withCsim(df: DataFrame): DataFrame = df.join(bc)
      .withColumn("csim", dot(col("v"), col("centv")) / (col("nrm") * col("centn")))
    // Home bucket per vector as an AGGREGATE argmax — max(struct(csim,
    // -cent_id, …)) picks exactly the window's (csim DESC, cent_id ASC)
    // rank 1, deterministically (csim + cent_id are unique per vec).
    // The previous row_number-window spelling was recomputed once per
    // consumer (probes' vec_id filter pushed below the window exchange,
    // so nothing was shared: 7 scans / 6 Windows in the executed plan)
    // — and at scale that duplicated a corpus-wide window. One hash
    // aggregate replaces it; the probe ranking runs on the
    // queries-only frame (NQueries × 8 rows), not the corpus.
    val buckets = withCsim(emb)
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), negate(col("cent_id")).as("negc"),
        col("cent_id"), col("v"), col("nrm"))).as("m"))
      .select(col("vec_id").as("c_id"), col("m.cent_id").as("bucket"),
        col("m.v").as("cv"), col("m.nrm").as("cn"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    val probes = withCsim(emb.filter(col("vec_id") < NQueries))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2) // rank 1 = home bucket; 1..2 = probe set
      .select(col("vec_id").as("q_id"), col("cent_id").as("bucket"),
        col("v").as("qv"), col("nrm").as("qn"))
    val wTop = Window.partitionBy("q_id").orderBy(col("sim").desc, col("c_id"))
    buckets.join(broadcast(probes), "bucket")
      .filter(col("c_id") =!= col("q_id") && col("c_id") >= NQueries)
      .withColumn("sim", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 4))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= K)
      .select("q_id", "rank", "c_id", "sim")
      .orderBy("q_id", "rank")
  }

  val all: Seq[GQuery] = Seq(
    GQuery("q35_knn_bruteforce", knnBruteForce, Some(knnBruteForceSql)),
    GQuery("q36_embedding_neardup", (s, d) => embeddingNearDup(s, d), Some(embeddingNearDupSql)),
    GQuery("q37_ann_ivf", annIvf, None))
}
