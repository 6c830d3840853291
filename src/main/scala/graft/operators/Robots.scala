package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt politeness evaluation (RFC 9309 base semantics) — the
  * crawl-frontier gate that decides which URLs a compliant crawler may
  * fetch at all, upstream of every byte the corpus ingests.
  *
  * Implemented semantics (the RFC's core, including §2.2.3 wildcards):
  *  - a robots body is a sequence of groups, each opened by a
  *    `User-agent:` line followed by `Allow:`/`Disallow:` rules;
  *  - a crawler obeys the group naming it specifically if one exists,
  *    else the `*` group — groups do NOT merge;
  *  - rules match as path prefixes; `*` spans any characters and a
  *    trailing `$` anchors the end (plain prefixes stay a codegen'd
  *    startsWith; only wildcard rules take the regex path);
  *  - among matching rules the LONGEST rule (most octets) wins; on a
  *    length tie Allow wins; a URL matching no rule is allowed.
  *
  * Everything is set-based: line explosion + a per-host running count
  * assigns rules to groups (window over line number, partitioned by
  * host — bounded by lines-per-robots, never corpus-sized), and
  * evaluation is an equi-join on host + one arg-max per URL. Zero UDFs.
  *
  * Why the join strategy is size-bounded, not forced: a real crawl
  * frontier has millions of hosts, and 10 M hosts × ~15 rules × ~40 B ≈
  * 6 GB of rules — far past any sane broadcast threshold, so an
  * unconditional `broadcast()` would OOM exactly when the operator
  * matters most. But leaving the join entirely to static stats
  * mispredicts the other way: cardinality estimates explode through the
  * parse pipeline and shuffle the whole corpus against a 12-host rules
  * table. [[evaluate]] therefore MEASURES the rules (an exact count of
  * a rules-bounded table) and broadcasts only under a documented bound
  * — evidence-based at every scale, degrading to shuffle-on-host when
  * the rules genuinely are GBs (rules-per-host is bounded by robots.txt
  * size, so the host key carries no skew).
  */
object Robots {

  /** Parse (host, body) robots bodies into (host, agent, rule_type,
    * rule_path) rows. Lines that are not User-agent/Allow/Disallow
    * directives (comments, blanks, unknown fields) are dropped, as the
    * RFC requires. Rules before any User-agent line are dropped too
    * (they belong to no group).
    */
  def parseRules(bodies: DataFrame, host: String = "host",
                 body: String = "body"): DataFrame = {
    val blocked = blockedLines(bodies, host, body)
    // Attach each block's User-agent list by WINDOW, not by self-join:
    // the (host, blk) window reuses the hash(host) exchange the block
    // numbering already paid (hash(host) clusters (host, blk) too), so
    // rules pick up their agents with zero extra shuffles — the former
    // (host, blk) self-join recomputed the parse subtree and added two
    // exchanges for the same rows. collect_list (not _set) preserves
    // the join's multiplicity for pathological duplicate UA lines.
    blocked
      .withColumn("agents",
        collect_list(col("agent")).over(Window.partitionBy("host", "blk")))
      .filter(col("rule_type").isNotNull && col("blk") > 0 &&
        col("rule_path") =!= "") // "Disallow:" with empty path = allow all = no rule
      .select(col("host"), explode(col("agents")).as("agent"),
        col("rule_type"), col("rule_path"))
  }

  /** Per-(host, agent) politeness delay from `Crawl-delay:` lines — the
    * de-facto extension most large sites still publish. Group-scoped
    * like rules; non-numeric values are dropped. One row per
    * (host, agent) (minimum wins if a group repeats the directive).
    */
  def crawlDelays(bodies: DataFrame, host: String = "host",
                  body: String = "body"): DataFrame = {
    val blocked = blockedLines(bodies, host, body)
    // same window-over-(host, blk) agent attachment as [[parseRules]]
    blocked
      .withColumn("agents",
        collect_list(col("agent")).over(Window.partitionBy("host", "blk")))
      .filter(col("blk") > 0 && lower(col("line")).rlike("^crawl-delay:"))
      .select(col("host"), explode(col("agents")).as("agent"),
        trim(regexp_extract(col("line"), "(?i)^crawl-delay:(.*)$", 1))
          .cast("double").as("delay_s"))
      .filter(col("delay_s").isNotNull && col("delay_s") >= 0)
      .groupBy(col("host"), col("agent"))
      .agg(min(col("delay_s")).as("delay_s"))
  }

  /** `Sitemap:` discovery lines — per the sitemaps.org protocol these
    * are GLOBAL (valid anywhere in the file, not scoped to any
    * user-agent group), so they parse independently of blocks.
    */
  def sitemaps(bodies: DataFrame, host: String = "host",
               body: String = "body"): DataFrame =
    bodies.select(col(host).as("host"),
        explode(split(col(body), "\n")).as("line"))
      .withColumn("line", trim(regexp_replace(col("line"), "#.*", "")))
      .filter(lower(col("line")).rlike("^sitemap:"))
      .select(col("host"),
        trim(regexp_extract(col("line"), "(?i)^sitemap:(.*)$", 1))
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")

  /** Explode bodies into directive lines with RFC group structure:
    * consecutive User-agent lines open ONE block whose rules belong to
    * ALL of them. Block id = running count of UA-lines-that-start-a-block
    * (a UA line whose predecessor is not a UA line). The window is
    * per-host over line numbers — bounded by lines-per-robots, never
    * corpus-sized.
    */
  private def blockedLines(bodies: DataFrame, host: String,
                           body: String): DataFrame = {
    val lines = bodies.select(col(host).as("host"),
        posexplode(split(col(body), "\n")).as(Seq("line_no", "line")))
      .withColumn("line", trim(regexp_replace(col("line"), "#.*", "")))
      .withColumn("agent",
        when(lower(col("line")).rlike("^user-agent:"),
          trim(regexp_extract(col("line"), "(?i)^user-agent:(.*)$", 1))))
      .withColumn("rule_type",
        when(lower(col("line")).rlike("^allow:"), lit("allow"))
          .when(lower(col("line")).rlike("^disallow:"), lit("disallow")))
      .withColumn("rule_path",
        when(col("rule_type").isNotNull,
          trim(regexp_extract(col("line"), "(?i)^(?:dis)?allow:(.*)$", 1))))
    val w = Window.partitionBy("host").orderBy("line_no")
    lines
      .withColumn("isUA", col("agent").isNotNull)
      .withColumn("blk", sum((col("isUA") &&
        !coalesce(lag(col("isUA"), 1).over(w), lit(false))).cast("int")).over(w))
  }

  /** Translate a robots rule path into the regex RFC 9309 §2.2.3
    * matching implies: `*` matches any span, a TRAILING `$` anchors the
    * end, every other character is literal. Built as a column expression
    * (escape regex metachars → expand `*` → re-attach the anchor) so
    * matching stays codegen'd; specificity remains the RULE's length
    * ("most octets"), not the pattern's.
    */
  def rulePattern(rule: Column): Column = {
    val anchored = rule.endsWith("$")
    val body = when(anchored, rule.substr(lit(1), length(rule) - 1))
      .otherwise(rule)
    val escaped = regexp_replace(body, "([.^+?(){}\\[\\]|\\\\$])", "\\\\$1")
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Decide each URL against the parsed rules for `crawler`. `urls`
    * needs (host, path) columns; returns urls + `allowed` +
    * `matched_rule` (null when no rule matched). Group selection per
    * RFC: the crawler's own group if the host has one, else `*` —
    * product-token matching is case-insensitive (RFC 9309 §2.2.1), so
    * `User-agent: GraftBot` selects the group for crawler "graftbot";
    * rules match as prefixes with `*`/`$` wildcards (RFC §2.2.3),
    * longest rule (most octets) wins, Allow wins length ties.
    *
    * The URL join's strategy rides a SIZE-BOUNDED broadcast decision
    * (see the class doc): the chosen rules are COUNTED — by an
    * accumulator during the checkpoint's own materialization pass, so
    * the measurement adds no job of its own — and broadcast only when
    * the measured count fits `maxBroadcastRules`. Measured evidence replaces the
    * static estimate precisely because the estimate is what mispredicts
    * here: Catalyst's stats blow up through the parse pipeline's
    * window+join cascade, locking the corpus into a shuffled
    * sort-merge even for a 12-host rules table (and AQE cannot rescue
    * it — the rules subtree feeds the join in-stage with no exchange
    * boundary to measure). At the default bound, 1 M rules × ~50 B ≈
    * 50 MB — a safe executor broadcast; a 10 M-host crawl (~150 M
    * rules, ~6 GB) exceeds the bound and the join stays an unhinted
    * host equi-join that shuffles, which is the correct plan there
    * (rules-per-host is bounded by robots.txt size, so no skew).
    */
  def evaluate(urls: DataFrame, rules: DataFrame, crawler: String,
               maxBroadcastRules: Long = 1L << 20): DataFrame = {
    val token = crawler.toLowerCase(java.util.Locale.ROOT)
    // Materialize the chosen rules ONCE (tracked checkpoint — released
    // by the runner between queries): the parse pipeline runs a single
    // time regardless of join strategy. The blocks are rules-sized
    // (bounded by hosts × lines-per-robots), distributed across
    // executors — never a driver collect. The size measurement rides
    // the SAME pass: a row-counting accumulator updated while the
    // eager checkpoint materializes, so the decision costs zero extra
    // jobs (round 7 paid a second count() job over the cached blocks
    // every execution). Accumulator counts can only OVERSTATE under
    // task retries/speculation, which errs toward NOT broadcasting —
    // the safe direction (a shuffle instead of an executor OOM).
    // "does a crawler-specific group exist for this host?" is a window
    // max over host — it rides the hash(host) clustering the parse
    // pipeline already established instead of the former
    // distinct+left-join pair (two more exchanges for the same answer)
    val hasSpecific = max((lower(col("agent")) === token).cast("int"))
      .over(Window.partitionBy("host")) === 1
    val chosen = rules
      .withColumn("has_specific", hasSpecific)
      .filter(when(col("has_specific"), lower(col("agent")) === token)
        .otherwise(col("agent") === "*"))
      .select(col("host"), col("rule_type"), col("rule_path"))
    val nRules = chosen.sparkSession.sparkContext
      .longAccumulator("graft.robots_rules_measured")
    val chosenM = {
      import graft.Checkpoints.TrackedCheckpointOps
      implicit val enc = org.apache.spark.sql.Encoders.row(chosen.schema)
      chosen.map { r => nRules.add(1L); r }.trackedCheckpoint()
    }
    val rulesSide =
      if (nRules.value <= maxBroadcastRules) broadcast(chosenM) else chosenM
    // longest matching rule wins; allow beats disallow on equal length.
    // Plain prefixes skip the regex path entirely (the overwhelmingly
    // common case stays a startsWith); wildcard rules match via their
    // RFC-translated pattern.
    val isPlain = !col("rule_path").contains("*") && !col("rule_path").endsWith("$")
    val matched = urls.join(rulesSide, Seq("host"), "left")
      .withColumn("hit", col("rule_path").isNotNull &&
        when(isPlain, col("path").startsWith(col("rule_path")))
          .otherwise(regexp_like(col("path"), rulePattern(col("rule_path")))))
    val pri = struct(
      when(col("hit"), length(col("rule_path"))).otherwise(lit(-1)).as("len"),
      when(col("hit") && col("rule_type") === "allow", lit(1))
        .otherwise(lit(0)).as("is_allow"),
      // '' not null for the no-hit arm: struct max must stay total under
      // both engines' comparison semantics
      when(col("hit"), col("rule_path")).otherwise(lit("")).as("rp"))
    matched.groupBy(urls.columns.map(col): _*)
      .agg(max(pri).as("best"))
      .withColumn("allowed",
        col("best.len") < 0 || col("best.is_allow") === 1)
      .withColumn("matched_rule",
        when(col("best.len") >= 0, col("best.rp")))
      .drop("best")
  }
}
