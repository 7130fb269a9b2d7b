package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tuning-parameter import/export — SURVEY §2.1 S4 (reference
  * Testing.R:223-225 imports a pre-tuned 2×K α/λ matrix from a workbook
  * and feeds it into `modeltrain`). The engine's form: a typed long table
  * (equation, alpha, lambda) with a fixed schema, written/read as parquet,
  * converted to the per-equation vectors the estimators take.
  */
object TuningIO {

  val schema: StructType = StructType(Seq(
    StructField("equation", StringType, nullable = false),
    StructField("alpha", DoubleType, nullable = false),
    StructField("lambda", DoubleType, nullable = false)))

  def write(s: SparkSession, path: String, tuned: Seq[(String, Double, Double)]): Unit =
    s.createDataFrame(
      java.util.Arrays.asList(tuned.map(t => Row(t._1, t._2, t._3)): _*), schema)
      .write.mode("overwrite").parquet(path)

  def read(s: SparkSession, path: String): DataFrame = {
    val df = s.read.schema(schema).parquet(path)
    require(df.schema.fields.map(_.name).toSeq == schema.fields.map(_.name).toSeq,
      "tuning table schema drift")
    df
  }

  /** Per-equation (alphas, lambdas) in the given equation order — the
    * shape `ModelTrain.run`/`EnetVar.fit` take (enetVAR.R:12-22's
    * per-equation vectors).
    */
  def asVectors(s: SparkSession, path: String, equationOrder: Seq[String]): (Seq[Double], Seq[Double]) = {
    val rows = read(s, path).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val missing = equationOrder.filterNot(rows.contains)
    require(missing.isEmpty, s"tuning table missing equations: $missing")
    (equationOrder.map(rows(_)._1), equationOrder.map(rows(_)._2))
  }
}
