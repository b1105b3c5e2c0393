package graft.ml

import graft.functions.TextFunctions
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Pipeline stage wrapping the clean_text kernel (reference
  * src/utils.py:5-10), so cleaning ships inside the saved
  * PipelineModel exactly as clean_text lives inside both the batch and
  * serve paths of the reference (src/preprocess.py:48,
  * src/predict.py:81). Pure column expressions — stays codegen'd, no
  * UDF.
  */
final class CleanTextTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("clean_text"))

  final val inputCol = new Param[String](this, "inputCol", "input text column")
  final val outputCol = new Param[String](this, "outputCol", "cleaned output column")
  setDefault(inputCol -> "text", outputCol -> "clean")

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def getInputCol: String = $(inputCol)
  def getOutputCol: String = $(outputCol)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol),
      TextFunctions.cleanText(col($(inputCol)).cast(StringType)))

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains($(outputCol)),
      s"output column ${$(outputCol)} already exists")
    schema.add(StructField($(outputCol), StringType, nullable = true))
  }

  override def copy(extra: ParamMap): CleanTextTransformer = defaultCopy(extra)
}

object CleanTextTransformer extends DefaultParamsReadable[CleanTextTransformer]
