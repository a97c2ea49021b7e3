package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Source layer (SURVEY.md §2e).
  *
  * The reference ingests one JSON array file and STRINGIFIES every nested
  * value via json.dumps before building its table
  * (Semantic-OLAP/main.py:5-22 `stringify_nested`). The Spark-native
  * default keeps nested types (struct/array/map survive for real queries);
  * [[stringifyNested]] reproduces the reference's flat all-text view where
  * an operator needs it (`to_json` per nested column — reversible,
  * codegen'd, no data loss).
  */
object JsonSource {

  /** Load a JSON array file (multiLine, like the reference's single-array
    * layout) with schema inference, nested types preserved.
    */
  def loadJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Reference-parity view: every struct/array/map column serialized to a
    * JSON string, scalars cast to string — the `pd.DataFrame(flat_data)`
    * all-text table the 10-operator algebra was specified against.
    */
  def stringifyNested(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case _ => col(f.name).cast("string").as(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Attach the reference's synthetic row id (OLAP_Memory.py:110-111
    * assigns OLAP_ID = range(n)). `monotonically_increasing_id` is
    * partition-dependent, so a deterministic variant orders by a natural
    * key first (SURVEY.md §1: prefer a data-derived key).
    */
  def withOlapId(df: DataFrame, orderBy: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (orderBy.isEmpty)
      df.withColumn("OLAP_ID", monotonically_increasing_id())
    else
      df.withColumn("OLAP_ID",
        row_number().over(Window.orderBy(orderBy.map(col): _*)) - 1)
  }

  /** JSON-lines sink (reference serializes results as
    * `df.to_json(orient='records')`, OLAP_Agent.py:482-483).
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Fault-tolerant JSON-lines ingestion for dirty corpora: PERMISSIVE
    * mode with the raw text of every unparseable line preserved in
    * `_corrupt` — at 100 TB a single malformed record must not kill the
    * job (FAILFAST) or vanish silently (DROPMALFORMED); the pipeline
    * routes `_corrupt IS NOT NULL` rows to quarantine and keeps going.
    * The caller's schema is explicit: inference over a corrupt corpus is
    * both a second full scan and a correctness hazard.
    */
  def loadJsonLenient(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}
