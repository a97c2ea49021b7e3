package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val jsonFile = {
    val dir = Files.createTempDirectory("graft-json")
    val f = dir.resolve("data.json")
    Files.writeString(f,
      """[
        {"question_id": 1, "title": "t1", "tags": ["python", "sql"],
         "meta": {"score": 5}, "score": "10"},
        {"question_id": 2, "title": "t2", "tags": [],
         "meta": {"score": 0}, "score": "x"}
      ]""")
    f.toString
  }

  test("multiLine JSON array loads with nested types preserved") {
    val df = JsonSource.loadJson(spark, jsonFile)
    assert(df.count() == 2)
    assert(df.schema("tags").dataType.typeName == "array")
    assert(df.schema("meta").dataType.typeName == "struct")
  }

  test("stringifyNested reproduces the reference's all-text view") {
    val df = JsonSource.stringifyNested(JsonSource.loadJson(spark, jsonFile))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val r = df.filter(col("question_id") === "1").collect()(0)
    assert(r.getAs[String]("tags") == """["python","sql"]""")
    assert(r.getAs[String]("meta") == """{"score":5}""")
  }

  test("withOlapId assigns a deterministic dense row id") {
    val df = JsonSource.loadJson(spark, jsonFile)
    val withId = JsonSource.withOlapId(df, Seq("question_id"))
      .select("question_id", "OLAP_ID").as[(Long, Long)].collect().toMap
    assert(withId == Map(1L -> 0L, 2L -> 1L))
  }

  test("json sink round-trips") {
    val out = Files.createTempDirectory("graft-json-out").resolve("o").toString
    val df = JsonSource.loadJson(spark, jsonFile)
    JsonSource.writeJson(df.select("question_id", "title"), out)
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("question_id", "title"))
  }
}
