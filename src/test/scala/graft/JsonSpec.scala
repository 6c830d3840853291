package graft

import graft.sources.Json
import graft.sources.Json._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the from-scratch JSON parser: RFC 8259 shapes, escapes,
  * numbers, nesting, and a Jackson cross-pin (Spark's to_json output
  * parsed back field-for-field). Malformations all close to None.
  */
class JsonSpec extends SparkSpec {

  test("scalars, strings, escapes, numbers") {
    assert(Json.parse("null").contains(JNull))
    assert(Json.parse("true").contains(JBool(true)))
    assert(Json.parse(" false ").contains(JBool(false)))
    assert(Json.parse("0").contains(JLong(0L)))
    assert(Json.parse("-42").contains(JLong(-42L)))
    assert(Json.parse("9223372036854775807")
      .contains(JLong(Long.MaxValue)))
    // past Long range: falls to double, not a throw
    assert(Json.parse("9223372036854775808")
      .contains(JDouble(9.223372036854776e18)))
    assert(Json.parse("1.5").contains(JDouble(1.5)))
    assert(Json.parse("-2.5e3").contains(JDouble(-2500.0)))
    assert(Json.parse("1E2").contains(JDouble(100.0)))
    assert(Json.parse("\"\"").contains(JString("")))
    assert(Json.parse("\"a\\nb\\t\\\"c\\\\d\\/e\"")
      .contains(JString("a\nb\t\"c\\d/e")))
    assert(Json.parse("\"\\u00e9\\u4e2d\"").contains(JString("é中")))
    // surrogate pair passes through as two units = the Java string
    assert(Json.parse("\"\\ud83d\\ude00\"").contains(JString("😀")))
  }

  test("objects, arrays, nesting, duplicate keys last-wins") {
    assert(Json.parse("{}").contains(JObject(Vector.empty)))
    assert(Json.parse("[]").contains(JArray(Vector.empty)))
    val v = Json.parse(
      """{"a": [1, {"b": null}, "x"], "c": {"d": true}, "a": 2}""").get
    val o = v.asInstanceOf[JObject]
    assert(o.get("a").contains(JLong(2L))) // last wins
    assert(o.fields.head._2 == JArray(Vector(JLong(1L),
      JObject(Vector("b" -> JNull)), JString("x"))))
    assert(o.get("c").flatMap(_.asInstanceOf[JObject].get("d"))
      .contains(JBool(true)))
    // deep but under the cap
    val deep = "[" * 60 + "]" * 60
    assert(Json.parse(deep).isDefined)
  }

  test("malformation closes to None: truncation, trailing garbage, " +
    "bad escapes, leading zeros, control chars, depth bombs") {
    for (s <- Seq("", "{", "[1,", "{\"a\":}", "{\"a\" 1}", "[1 2]",
      "tru", "nul", "01", "1.", "1e", "+1", "\"ab", "\"a\\x\"",
      "\"a\\u12g4\"", "\"a\nb\"", "{}x", "[] []", "NaN", "Infinity",
      "[" * 100 + "]" * 100, "{\"a\":1,}", "[1,]"))
      assert(Json.parse(s).isEmpty, s"must refuse: $s")
  }

  test("Jackson cross-pin: Spark to_json output parses back " +
    "field-for-field, every scalar type") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = spark.range(0, 50).select(
      $"id",
      ($"id" % 7 === 0).as("flag"),
      ($"id" * 1234567.0 / 8).as("d"),
      concat(lit("p\"x\\y\nz-"), $"id").as("s"),
      array($"id", $"id" * 2).as("xs"))
    val jsons = rows.select(to_json(struct($"id", $"flag", $"d",
      $"s", $"xs")).as("j")).as[String].collect()
    for ((j, i) <- jsons.zipWithIndex) {
      val o = Json.parse(j).getOrElse(fail(s"must parse: $j"))
        .asInstanceOf[JObject]
      assert(o.get("id").contains(JLong(i.toLong)), j)
      assert(o.get("flag").contains(JBool(i % 7 == 0)), j)
      assert(o.get("d").contains(JDouble(i * 1234567.0 / 8)), j)
      assert(o.get("s").contains(JString(s"p\"x\\y\nz-$i")), j)
      assert(o.get("xs").contains(JArray(Vector(JLong(i.toLong),
        JLong(2L * i)))), j)
    }
  }
}
