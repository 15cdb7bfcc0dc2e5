package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Array / map scalar-function surface (SURVEY §2.3 "Scalar funcs …
  * array/map/json"): the higher-order and collection builtins the
  * engine leans on, exercised against the embeddings/documents corpus. */
class ArrayMapFuncsSpec extends SparkSpec {
  import spark.implicits._

  test("transform / filter / aggregate / zip_with over embeddings") {
    val emb = graft.core.Tables.embeddings(spark, sf).limit(5)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val out = emb.select(
      $"vec_id",
      size($"v").as("dim"),
      aggregate($"v", lit(0.0), (a, x) => a + x).as("sum"),
      size(filter($"v", _ > 0.0)).as("pos"),
      aggregate(zip_with($"v", $"v", (a, b) => a * b), lit(0.0), (a, x) => a + x).as("sq"))
      .collect()
    assert(out.forall(_.getInt(1) === 64))
    out.foreach { r => assert(r.getDouble(4) >= 0.0) }
  }

  test("array construction, slice, sort_array, array_contains, explode") {
    val df = Seq((1L, Seq(3, 1, 2))).toDF("id", "xs")
    val r = df.select(
      sort_array($"xs").as("sorted"),
      slice($"xs", 1, 2).as("head2"),
      array_contains($"xs", 2).as("has2"),
      array_distinct(concat($"xs", $"xs")).as("dedup")).head()
    assert(r.getSeq[Int](0) === Seq(1, 2, 3))
    assert(r.getSeq[Int](1) === Seq(3, 1))
    assert(r.getBoolean(2))
    assert(r.getSeq[Int](3).sorted === Seq(1, 2, 3))
    assert(df.select(explode($"xs")).count() === 3L)
  }

  test("map construction, keys/values, element_at, map_concat, explode") {
    val df = Seq(1).toDF("x").select(
      map(lit("a"), lit(1), lit("b"), lit(2)).as("m"))
    val r = df.select(
      map_keys($"m").as("ks"),
      map_values($"m").as("vs"),
      element_at($"m", "b").as("b"),
      map_concat($"m", map(lit("c"), lit(3))).as("m2")).head()
    assert(r.getSeq[String](0).sorted === Seq("a", "b"))
    assert(r.getSeq[Int](1).sorted === Seq(1, 2))
    assert(r.getInt(2) === 2)
    assert(r.getMap[String, Int](3).size === 3)
    assert(df.select(explode($"m")).count() === 2L)
  }

  test("from_json / to_json round trip and schema_of_json") {
    val df = Seq("""{"k": 7, "tags": ["a", "b"]}""").toDF("j")
    val schema = "STRUCT<k: BIGINT, tags: ARRAY<STRING>>"
    val r = df.select(from_json($"j", org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, tags ARRAY<STRING>")).as("s"))
      .select($"s.k", $"s.tags", to_json($"s").as("back")).head()
    assert(r.getLong(0) === 7L)
    assert(r.getSeq[String](1) === Seq("a", "b"))
    assert(r.getString(2).contains("\"k\":7"))
  }

  test("dropDuplicates surface (exactRows)") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    assert(Dedup.exactRows(df, Seq("k")).count() === 2L)
  }
}
