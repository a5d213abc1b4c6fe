package graft

import java.nio.file.Files

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the SURVEY §2 rows declared without an oracle: csv/json
  * sources (no csv/json testdata exists — tiny inline fixtures), map
  * functions (DuckDB JSON→map comparison is fiddly), and the custom
  * shingle Generator (§2.K).
  */
class SourcesAndMapSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("csv source with explicit schema round-trips") {
    val dir = Files.createTempDirectory("csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "1,alice,10.5\n2,bob,20.25\n3,,30.0\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = spark.read.schema(schema).csv(dir)
    assert(df.count() === 3)
    assert(df.where(col("name").isNull).count() === 1)
    assert(df.agg(sum("score")).head().getDouble(0) === 60.75)
  }

  test("json source with explicit schema handles nesting and missing fields") {
    val dir = Files.createTempDirectory("json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      """{"id":1,"tags":["a","b"],"meta":{"k":7}}
        |{"id":2,"tags":[],"meta":{}}
        |{"id":3}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("meta", StructType(Seq(StructField("k", LongType))))))
    val df = spark.read.schema(schema).json(dir)
    assert(df.count() === 3)
    assert(df.select(expr("meta.k")).where(col("k") === 7).count() === 1)
    assert(df.where(col("tags").isNull).count() === 1)
  }

  test("orc sink/source round-trips schema and values") {
    val dir = Files.createTempDirectory("orc").toString + "/t"
    val src = Tables.nation(spark, "/root/testdata/sf0.001")
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("map functions: from_json to map, keys, element access") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("m", from_json(col("props"), MapType(StringType, StringType)))
    val r = ev.select(
      map_keys(col("m")).as("ks"),
      element_at(col("m"), "k").cast("int").as("kv"))
    assert(r.where(size(col("ks")) === 1).count() === ev.count())
    // map access agrees with the JSON-path route used by q_json_extract
    val disagree = ev.withColumn("kv", element_at(col("m"), "k").cast("int"))
      .withColumn("jv", get_json_object(col("props"), "$.k").cast("int"))
      .where(col("kv") =!= col("jv"))
    assert(disagree.count() === 0)
  }

  test("shingles generator matches the HOF shingle recipe") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("a b c d e", "x y", "solo").toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val viaGen = df.select(col("text"), expr("shingles(toks, 3)"))
      .groupBy("text").agg(sort_array(collect_list("shingle")).as("sh"))
    val viaHof = df.select(col("text"), expr(
      "CASE WHEN size(toks) >= 3 THEN sort_array(transform(sequence(1, size(toks) - 2), " +
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))) " +
        "ELSE array() END").as("sh2"))
    val joined = viaHof.join(viaGen, Seq("text"), "left")
      .select(col("text"), coalesce(col("sh"), expr("array()")).as("sh"), col("sh2"))
    assert(joined.where(col("sh") =!= col("sh2")).count() === 0)
    // rows shorter than n produce no shingle rows at all
    assert(viaGen.where(col("text") === "solo").count() === 0)
  }

  test("shingles generator rejects non-array input at analysis time") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("oops").toDF("text")
    val e = intercept[Exception](df.select(expr("shingles(text, 3)")).collect())
    assert(e.getMessage.contains("array<string>") || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
