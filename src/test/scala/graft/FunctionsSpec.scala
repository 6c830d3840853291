package graft

import graft.{functions => gf}
import org.apache.spark.sql.functions._

/** Unit cases for the scalar library, lifted from the reference's
  * observable semantics (SURVEY.md §2.7).
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): Any = {
    val r = Seq(Option(input)).toDF("v").select(c.as("r")).head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("safe_float: sentinels → null, EU comma, garbage → null") {
    assert(one(gf.safe_float($"v"), "none") == null)
    assert(one(gf.safe_float($"v"), "NaN") == null)
    assert(one(gf.safe_float($"v"), "") == null)
    assert(one(gf.safe_float($"v"), null) == null)
    assert(one(gf.safe_float($"v"), "12,5") == 12.5)
    assert(one(gf.safe_float($"v"), " 7.25 ") == 7.25)
    assert(one(gf.safe_float($"v"), "abc") == null)
  }

  test("clean_money: strips $,+ space; restores sign (pdf_to_xlsx.py:94-101)") {
    assert(one(gf.clean_money($"v"), "$1,234.56") == 1234.56)
    assert(one(gf.clean_money($"v"), "+ $99.10") == 99.10)
    assert(one(gf.clean_money($"v"), "- $1,000.00") == -1000.0)
    assert(one(gf.clean_money($"v"), "-$0.99") == -0.99)
  }

  test("spanish_to_date parses dd-mmm-yyyy with es abbrevs (pdf_to_xlsx.py:62)") {
    assert(one(date_format(gf.spanish_to_date($"v"), "yyyy-MM-dd"),
      "17-sep-2025") == "2025-09-17")
    assert(one(date_format(gf.spanish_to_date($"v"), "yyyy-MM-dd"),
      "05-ene-2024") == "2024-01-05")
    assert(one(date_format(gf.spanish_to_date($"v"), "yyyy-MM-dd"),
      "31-dic-2023") == "2023-12-31")
    assert(one(gf.spanish_to_date($"v"), "not a date") == null)
  }

  test("store_name: ML special case, prefix dropping (utils_tools.py:114-130)") {
    assert(one(gf.store_name($"v"), "ML") == "mercadolibre")
    assert(one(gf.store_name($"v"),
      "https://www.amazon.com.mx/dp/B0X") == "amazon")
    assert(one(gf.store_name($"v"),
      "https://articulo.mercadolibre.com.mx/MLM-1") == "mercadolibre")
    assert(one(gf.store_name($"v"), "https://temu.com/x") == "temu")
    // single remaining token → null
    assert(one(gf.store_name($"v"), "https://www.localhost/x") == null)
  }

  test("provider_url ladder order (utils_tools.py:132-182)") {
    // base-only domain: strip path entirely
    assert(one(gf.provider_url($"v"),
      "https://www.temu.com/item.html?g=1") == "https://www.temu.com")
    // keep-path: 'mercado' matches before the mercadolibre special case
    assert(one(gf.provider_url($"v"),
      "https://articulo.mercadolibre.com.mx/MLM-9?var=2")
      == "https://articulo.mercadolibre.com.mx/MLM-9")
    // keep-path 'amazon' shadows the /dp/ branch: /ref stays (it is path)
    assert(one(gf.provider_url($"v"),
      "https://www.amazon.com.mx/X/dp/B01/ref=s?k=v")
      == "https://www.amazon.com.mx/X/dp/B01/ref=s")
    // default: strip query, keep path
    assert(one(gf.provider_url($"v"),
      "https://shop.example.mx/p/1?utm=x") == "https://shop.example.mx/p/1")
  }

  test("domain_store with intended articulo replace (utils_tools.py:184-197)") {
    assert(one(gf.domain_store($"v"), "mercadolibre") == "www.mercadolibre.com.mx")
    assert(one(gf.domain_store($"v"),
      "https://articulo.mercadolibre.com.mx/x") == "www.mercadolibre.com.mx")
    assert(one(gf.domain_store($"v"), "http://Shop.MX/a") == "shop.mx")
    assert(one(gf.domain_store($"v"), "nope") == null)
  }

  test("canonical_url: RFC 3986 §6 normalization + tracking-param policy") {
    val c = gf.canonical_url($"v")
    // scheme/host case, fragment, tracking params, query sort
    assert(one(c, "HTTPS://WWW.Example.COM/Page?b=2&utm_source=m&a=1#frag") ==
      "https://www.example.com/Page?a=1&b=2")
    // default ports drop for their scheme; non-default ports survive
    assert(one(c, "http://h.com:80/x") == "http://h.com/x")
    assert(one(c, "https://h.com:443/x") == "https://h.com/x")
    assert(one(c, "https://h.com:80/x") == "https://h.com:80/x")
    assert(one(c, "http://h.com:8080/x") == "http://h.com:8080/x")
    // trailing-slash policy: empty path → "/", deeper paths untouched
    assert(one(c, "https://h.com") == "https://h.com/")
    assert(one(c, "https://h.com?x=1") == "https://h.com/?x=1")
    assert(one(c, "https://h.com/a/") == "https://h.com/a/")
    // percent-encoding hex uppercases; malformed escapes pass through
    assert(one(c, "https://h.com/a%2fb%xyz?k=%3d") ==
      "https://h.com/a%2Fb%xyz?k=%3D")
    // fbclid/gclid drop; an emptied query drops its '?'
    assert(one(c, "https://h.com/p?fbclid=f1&gclid=g2") == "https://h.com/p")
    // empty params (?&a=1&) never emit empty segments
    assert(one(c, "https://h.com/p?&a=1&") == "https://h.com/p?a=1")
  }

  test("pct_upper uppercases escape hex only") {
    assert(one(gf.pct_upper($"v"), "a%2fb%ffc") == "a%2Fb%FFc")
    assert(one(gf.pct_upper($"v"), "no escapes") == "no escapes")
    assert(one(gf.pct_upper($"v"), "trailing%") == "trailing%")
    assert(one(gf.pct_upper($"v"), "%2f") == "%2F")
  }

  test("derived pricing treats 0 and null as missing (py:217-220)") {
    val df = Seq((null.asInstanceOf[java.lang.Double], 100.0),
      (java.lang.Double.valueOf(0.0), 100.0),
      (java.lang.Double.valueOf(200.0), 100.0)).toDF("venta", "cost")
    val r = df.select(gf.derived_price($"venta", $"cost").as("p"))
      .collect().map(_.getDouble(0))
    assert(r.toSeq == Seq(130.0, 130.0, 200.0))
  }

  test("hash60 is stable and 60-bit") {
    val h = Seq("x").toDF("v").select(gf.hash60($"v")).head.getLong(0)
    assert(h >= 0L && h < (1L << 60))
    val h2 = Seq("x").toDF("v").select(gf.hash60($"v")).head.getLong(0)
    assert(h == h2)
  }

  test("c_round is exact std::round(x·10^s)/10^s — DuckDB's semantics") {
    import graft.expressions.CRound
    // exact half-away-from-zero reference on the BINARY value of y
    def exact(y: Double): Double =
      if (!java.lang.Double.isFinite(y)) y
      else new java.math.BigDecimal(y)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    val rnd = new scala.util.Random(42)
    val cases = Seq(0.49999999999999994, -0.49999999999999994, 0.5, -0.5,
        1.5, 2.5, -2.5, 0.1920515, 0.1234565, 1e308, -1e308, 0.0, -0.0) ++
      (1 to 200000).map(_ =>
        rnd.nextInt(10000000).toDouble / (rnd.nextInt(100000) + 1) / 1e6) ++
      (1 to 50000).map(_ => java.lang.Double.longBitsToDouble(
        (rnd.nextInt(2047).toLong << 52) | (rnd.nextLong() & 0xfffffffffffffL)))
    for (scale <- Seq(0, 2, 4, 6, 9); x <- cases) {
      val p = math.pow(10.0, scale)
      val y = x * p
      val want = if (!java.lang.Double.isFinite(y)) x else exact(y) / p
      val got = CRound.compute(x, scale)
      assert(got == want || (got.isNaN && want.isNaN),
        s"c_round($x, $scale): got $got, want $want")
    }
    // SQL surface + codegen path agree with the direct computation
    Engine.registerSql(spark, sf())
    val viaSql = spark.sql(
      "SELECT c_round(CAST(0.1920515 AS DOUBLE), 6)").head.getDouble(0)
    assert(viaSql == 0.192052)
    val viaCol = Seq(0.1920515).toDF("v")
      .select(gf.c_round($"v", 6)).head.getDouble(0)
    assert(viaCol == 0.192052)
  }
}
