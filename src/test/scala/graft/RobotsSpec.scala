package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

/** RFC 9309 base semantics for the robots.txt gate: group selection,
  * longest-prefix-match, allow-wins-ties, multi-agent blocks, and the
  * ignore rules (comments, unknown directives, empty Disallow).
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(body: String, paths: Seq[String],
                   crawler: String = "graftbot"): Map[String, (Boolean, Option[String])] = {
    val rules = Robots.parseRules(Seq(("h1", body)).toDF("host", "body"))
    val urls = paths.map(p => ("h1", p)).toDF("host", "path")
    Robots.evaluate(urls, rules, crawler).collect()
      .map(r => r.getAs[String]("path") ->
        ((r.getAs[Boolean]("allowed"), Option(r.getAs[String]("matched_rule")))))
      .toMap
  }

  test("longest matching prefix wins; unmatched URLs are allowed") {
    val body = "User-agent: *\nDisallow: /p\nAllow: /p/ok\n"
    val got = eval(body, Seq("/p/no", "/p/ok/1", "/public-not-under-p-rules", "/q"))
    assert(got("/p/no") == ((false, Some("/p"))))
    assert(got("/p/ok/1") == ((true, Some("/p/ok"))))
    // literal prefix match: /public... DOES start with /p → the rule hits
    assert(got("/public-not-under-p-rules") == ((false, Some("/p"))))
    assert(got("/q") == ((true, None)))
  }

  test("equal-length allow and disallow: allow wins") {
    val got = eval("User-agent: *\nDisallow: /a\nAllow: /b\n" +
      "Allow: /same\nDisallow: /same\n", Seq("/same/x"))
    assert(got("/same/x") == ((true, Some("/same"))))
  }

  test("crawler-specific group replaces * — groups never merge") {
    val body = "User-agent: *\nDisallow: /all\n\n" +
      "User-agent: graftbot\nDisallow: /bot\n"
    val got = eval(body, Seq("/all/x", "/bot/x"))
    assert(got("/all/x") == ((true, None)), "the * group must not leak in")
    assert(got("/bot/x") == ((false, Some("/bot"))))
    // and a crawler with no specific group falls back to *
    val other = eval(body, Seq("/all/x", "/bot/x"), crawler = "elsebot")
    assert(other("/all/x") == ((false, Some("/all"))))
    assert(other("/bot/x") == ((true, None)))
  }

  test("consecutive User-agent lines share one rule block") {
    val body = "User-agent: alpha\nUser-agent: graftbot\nDisallow: /x\n"
    assert(eval(body, Seq("/x/1"))("/x/1") == ((false, Some("/x"))))
  }

  test("comments, unknown directives, empty Disallow, and preamble rules are ignored") {
    val body = "Disallow: /orphan-before-any-group\n" +
      "User-agent: * # the catch-all\nCrawl-delay: 5\n" +
      "Disallow:\n# full-line comment\nDisallow: /real\n"
    val got = eval(body, Seq("/orphan-before-any-group/x", "/real/x", "/y"))
    assert(got("/orphan-before-any-group/x")._1, "preamble rule must not bind")
    assert(got("/real/x") == ((false, Some("/real"))))
    assert(got("/y") == ((true, None)))
  }

  test("wildcard rules: * spans, trailing $ anchors, literals escape") {
    val body = "User-agent: *\n" +
      "Disallow: /*.pdf$\n" +       // any pdf, exactly at the end
      "Disallow: /dl/*/raw\n" +     // mid-path span
      "Allow: /dl/ok/raw\n"         // longer literal beats the wildcard
    val got = eval(body, Seq("/docs/a.pdf", "/docs/a.pdfx", "/a.pdf/b",
      "/dl/x/raw", "/dl/ok/raw", "/dl/x/rawer"))
    assert(got("/docs/a.pdf") == ((false, Some("/*.pdf$"))))
    assert(got("/docs/a.pdfx")._1, "$ must anchor the end")
    assert(got("/a.pdf/b")._1, "pdf mid-path must not match the anchored rule")
    assert(got("/dl/x/raw") == ((false, Some("/dl/*/raw"))))
    assert(got("/dl/ok/raw") == ((true, Some("/dl/ok/raw"))))
    // the wildcard rule matches a PREFIX of the path (no implicit anchor)
    assert(got("/dl/x/rawer") == ((false, Some("/dl/*/raw"))))
  }

  test("crawl delays: group-scoped, min-wins, non-numeric dropped") {
    val body = "User-agent: *\nCrawl-delay: 4\nCrawl-delay: 2\n" +
      "Disallow: /x\n\n" +
      "User-agent: graftbot\nCrawl-delay: 0.5\n\n" +
      "User-agent: badbot\nCrawl-delay: soon\n"
    val d = Robots.crawlDelays(Seq(("h1", body)).toDF("host", "body"))
      .collect().map(r => r.getAs[String]("agent") -> r.getAs[Double]("delay_s"))
      .toMap
    assert(d == Map("*" -> 2.0, "graftbot" -> 0.5)) // min wins; 'soon' dropped
  }

  test("Sitemap lines are global: any position, group-independent, comments stripped") {
    val body = "Sitemap: https://a/s1.xml\nUser-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a/s2.xml # mid-group is fine\nsitemap: https://a/s3.xml\n"
    val got = Robots.sitemaps(Seq(("h1", body)).toDF("host", "body"))
      .collect().map(_.getAs[String]("sitemap_url")).toSet
    assert(got == Set("https://a/s1.xml", "https://a/s2.xml", "https://a/s3.xml"))
  }

  test("product-token matching is case-insensitive (RFC 9309 §2.2.1)") {
    // a site that writes `User-agent: GraftBot` must still bind the
    // graftbot-specific group — and vice versa for a mixed-case crawler
    val body = "User-agent: *\nDisallow: /all\n\n" +
      "User-agent: GraftBot\nDisallow: /bot\n"
    val got = eval(body, Seq("/all/x", "/bot/x"))
    assert(got("/all/x") == ((true, None)), "mixed-case UA group must bind")
    assert(got("/bot/x") == ((false, Some("/bot"))))
    val mixed = eval(body, Seq("/bot/x"), crawler = "gRaFtBoT")
    assert(mixed("/bot/x") == ((false, Some("/bot"))))
  }

  test("evaluation plan: size-BOUNDED broadcast — measured rules under " +
    "the bound broadcast; over the bound the join stays unhinted") {
    // rules tables are GBs at millions of hosts (see Robots class doc),
    // so evaluate() broadcasts only on MEASURED evidence: an exact
    // rules count under maxBroadcastRules. Both regimes pinned here.
    val rules = Robots.parseRules(Seq(("h1", "User-agent: *\nDisallow: /p\n"))
      .toDF("host", "body"))
    val urls = (1 to 100).map(i => ("h1", s"/p/$i")).toDF("host", "path")
    // under the bound: the hint appears, backed by the count
    val small = Robots.evaluate(urls, rules, "graftbot").queryExecution
    assert(small.executedPlan.toString.contains("BroadcastHashJoin"),
      s"measured-small rules must broadcast:\n${small.executedPlan}")
    // over the bound (forced to 0): NO hint — the join must stay a
    // keyed equi-join and may never degenerate to a cartesian/BNLJ
    val big = Robots.evaluate(urls, rules, "graftbot",
      maxBroadcastRules = 0L).queryExecution
    assert(!big.logical.toString.contains("Hint"),
      s"over-bound evaluate must not hint:\n${big.logical}")
    val plan = big.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"robots join must stay a keyed equi-join:\n$plan")
    // and both regimes return identical rows — strategy, not semantics
    val a = Robots.evaluate(urls, rules, "graftbot").collect()
      .map(_.toString).sorted
    val b = Robots.evaluate(urls, rules, "graftbot", maxBroadcastRules = 0L)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "join strategy must not change results")
  }
}
