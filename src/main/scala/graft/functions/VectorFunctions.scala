package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over Array[Float]/Array[Double] columns using
  * codegen'd higher-order functions (`zip_with` + `aggregate`), so
  * similarity search needs no UDF and no UDT. Element folds run in
  * index order, which keeps double arithmetic bit-deterministic across
  * runs and engines.
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> before arithmetic:
    * float accumulation is both lossy and engine-dependent. */
  def toDoubleArray(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two array<double> columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine rounded to `scale` decimals — the form used in oracle-backed
    * queries so a last-ulp difference in another engine's fold order
    * cannot flip a comparison. */
  def cosineRounded(a: Column, b: Column, scale: Int = 4): Column =
    round(cosine(a, b), scale)
}
