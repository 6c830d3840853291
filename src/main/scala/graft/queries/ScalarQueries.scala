package graft.queries

import graft.Engine
import graft.{functions => gf}
import graft.functions.{c_round => round}
import org.apache.spark.sql.functions._

/** Scalar-function parity coverage (SURVEY.md §2.7, C1–C14).
  *
  * Each query synthesizes a deterministic string corpus from the testdata
  * tables (identically in the DuckDB oracle), applies the engine function,
  * and emits the result — so the oracle checks the exact scalar semantics
  * of the reference, row-set-wide. Where the Spark side round-trips
  * (synthesize → parse), the oracle computes the expected output directly
  * from the source column — a stronger identity check.
  */
object ScalarQueries {

  val defs: Seq[(String, QueryDef)] = Seq(

    // C2 safe_convert_to_float (utils_tools.py:55-64): null sentinels,
    // EU decimal comma, null-on-unparseable.
    "q14_safe_float" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val raw = when(col("l_linenumber") % 5 === 0,
            concat(col("l_partkey").cast("string"), lit(","),
              col("l_suppkey").cast("string")))
          .when(col("l_linenumber") % 5 === 1, lit("none"))
          .when(col("l_linenumber") % 5 === 2, lit(""))
          .when(col("l_linenumber") % 5 === 3, lit("NaN"))
          .otherwise(concat(lit(" "), floor(col("l_quantity")).cast("string"),
            lit("."), col("l_suppkey").cast("string"), lit(" ")))
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          gf.safe_float(raw).as("parsed"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_partkey,
          CASE WHEN raw IS NULL OR lower(trim(raw)) IN ('', 'none', 'nan')
               THEN NULL
               ELSE TRY_CAST(replace(trim(raw), ',', '.') AS DOUBLE) END AS parsed
        FROM (
          SELECT l_orderkey, l_linenumber, l_partkey,
            CASE l_linenumber % 5
              WHEN 0 THEN l_partkey::VARCHAR || ',' || l_suppkey::VARCHAR
              WHEN 1 THEN 'none'
              WHEN 2 THEN ''
              WHEN 3 THEN 'NaN'
              ELSE ' ' || CAST(floor(l_quantity) AS BIGINT)::VARCHAR || '.' || l_suppkey::VARCHAR || ' '
            END AS raw
          FROM lineitem)""")),

    // C1 money-string clean (pdf_to_xlsx.py:67-69, 94-101): strip
    // `+ $ , space`, restore `-` sign.
    "q15_clean_money" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        val base = concat(col("l_partkey").cast("string"), lit("."),
          lpad(col("l_linenumber").cast("string"), 2, "0"))
        val money = when(col("l_linenumber") % 4 === 0, concat(lit("$"), base))
          .when(col("l_linenumber") % 4 === 1, concat(lit("- $"), base))
          .when(col("l_linenumber") % 4 === 2, concat(lit("+ $"), base))
          .otherwise(concat(lit("$"), col("l_partkey").cast("string"),
            lit(","), lpad(col("l_suppkey").cast("string"), 3, "0"),
            lit(".25")))
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          gf.clean_money(money).as("amount"))
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_partkey,
          CASE WHEN strpos(m, '-') > 0 THEN -mag ELSE mag END AS amount
        FROM (
          SELECT *, abs(TRY_CAST(replace(regexp_replace(m, '[+$,\s]', '', 'g'), '-', '') AS DOUBLE)) AS mag
          FROM (
            SELECT l_orderkey, l_linenumber, l_partkey,
              CASE l_linenumber % 4
                WHEN 0 THEN '$' || base
                WHEN 1 THEN '- $' || base
                WHEN 2 THEN '+ $' || base
                ELSE '$' || l_partkey::VARCHAR || ',' || lpad(l_suppkey::VARCHAR, 3, '0') || '.25'
              END AS m
            FROM (SELECT *, l_partkey::VARCHAR || '.' || lpad(l_linenumber::VARCHAR, 2, '0') AS base
                  FROM lineitem)))""")),

    // C5/C6 Spanish-abbrev date round-trip (pdf_to_xlsx.py:62, :108):
    // Spark synthesizes `dd-mmm-yyyy` (es) and parses it back; the oracle
    // computes the expected output directly from o_orderdate — the
    // round-trip must be the identity.
    "q16_spanish_dates" -> QueryDef(
      build = (s, dir) => {
        val o = Engine.table(s, dir, "orders")
        val esStr = concat(
          lpad(dayofmonth(col("o_orderdate")).cast("string"), 2, "0"),
          lit("-"), gf.es_month_abbrev(month(col("o_orderdate"))), lit("-"),
          year(col("o_orderdate")).cast("string"))
        o.select(col("o_orderkey"), esStr.as("es_date"),
          date_format(gf.spanish_to_date(esStr), "yyyy-MM-dd").as("parsed_date"),
          concat(lit("cargos_bbva_"), gf.filename_date(col("o_orderdate")),
            lit(".xlsx")).as("file_name"))
      },
      oracle = Some("""
        SELECT o_orderkey,
          lpad(day(o_orderdate)::VARCHAR, 2, '0') || '-' ||
            CASE month(o_orderdate)
              WHEN 1 THEN 'ene' WHEN 2 THEN 'feb' WHEN 3 THEN 'mar'
              WHEN 4 THEN 'abr' WHEN 5 THEN 'may' WHEN 6 THEN 'jun'
              WHEN 7 THEN 'jul' WHEN 8 THEN 'ago' WHEN 9 THEN 'sep'
              WHEN 10 THEN 'oct' WHEN 11 THEN 'nov' ELSE 'dic'
            END || '-' || year(o_orderdate)::VARCHAR AS es_date,
          strftime(o_orderdate, '%Y-%m-%d') AS parsed_date,
          'cargos_bbva_' || strftime(o_orderdate, '%d%b%Y') || '.xlsx' AS file_name
        FROM orders""")),

    // C7 get_store_name (utils_tools.py:114-130): host → drop
    // {www,es,articulo,super} → first token if ≥2 remain; "ML" special.
    "q17_store_name" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val url = when(col("doc_id") % 6 === 0, lit("ML"))
          .when(col("doc_id") % 6 === 1,
            concat(lit("https://www."), col("source"), lit(".com.mx/item/"),
              col("doc_id").cast("string")))
          .when(col("doc_id") % 6 === 2,
            concat(lit("https://articulo.mercadolibre.com.mx/MLM-"),
              col("doc_id").cast("string")))
          .when(col("doc_id") % 6 === 3,
            concat(lit("https://"), col("source"), lit(".com/"),
              col("doc_id").cast("string")))
          .when(col("doc_id") % 6 === 4,
            concat(lit("https://es."), col("source"), lit(".mx/p/"),
              col("doc_id").cast("string")))
          .otherwise(concat(lit("https://super.walmart.com.mx/cat/"),
            col("doc_id").cast("string")))
        d.select(col("doc_id"), url.as("url"),
          gf.store_name(url).as("store"))
      },
      oracle = Some("""
        SELECT doc_id, url,
          CASE WHEN url = 'ML' THEN 'mercadolibre'
               WHEN host IS NULL THEN NULL
               WHEN len(kept) >= 2 THEN kept[1]
               ELSE NULL END AS store
        FROM (
          SELECT doc_id, url, host,
            list_filter(string_split(host, '.'),
              x -> x NOT IN ('www', 'es', 'articulo', 'super')) AS kept
          FROM (
            SELECT doc_id, url,
              CASE WHEN regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) = ''
                   THEN NULL
                   ELSE lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) END AS host
            FROM (
              SELECT doc_id,
                CASE doc_id % 6
                  WHEN 0 THEN 'ML'
                  WHEN 1 THEN 'https://www.' || source || '.com.mx/item/' || doc_id::VARCHAR
                  WHEN 2 THEN 'https://articulo.mercadolibre.com.mx/MLM-' || doc_id::VARCHAR
                  WHEN 3 THEN 'https://' || source || '.com/' || doc_id::VARCHAR
                  WHEN 4 THEN 'https://es.' || source || '.mx/p/' || doc_id::VARCHAR
                  ELSE 'https://super.walmart.com.mx/cat/' || doc_id::VARCHAR
                END AS url
              FROM documents)))""")),

    // C8 get_provider_store (utils_tools.py:132-182) — the full ladder,
    // including its load-bearing branch order ("amazon" in keep_path
    // shadows the /dp/ special case; base-only before everything).
    "q18_provider_url" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val id = col("doc_id").cast("string")
        val url = when(col("doc_id") % 8 === 0,
            concat(lit("https://www.temu.com/mx/item-"), id, lit(".html?top=1&g=2")))
          .when(col("doc_id") % 8 === 1,
            concat(lit("https://articulo.mercadolibre.com.mx/MLM-"), id,
              lit("-prod?searchVariation=2")))
          .when(col("doc_id") % 8 === 2,
            concat(lit("https://www.amazon.com.mx/SomeProduct/dp/B0"), id,
              lit("/ref=sr_1_1?keywords=x")))
          .when(col("doc_id") % 8 === 3,
            concat(lit("https://www.shein.com/item/"), id, lit("?lang=es")))
          .when(col("doc_id") % 8 === 4,
            concat(lit("https://www.ebay.com/itm/"), id, lit("?hash=abc")))
          .when(col("doc_id") % 8 === 5,
            concat(lit("https://unknownshop"), (col("doc_id") % 10).cast("string"),
              lit(".mx/products/"), id, lit("?utm=1")))
          .when(col("doc_id") % 8 === 6,
            concat(lit("  https://www.liverpool.com.mx/tienda/pdp/"), id, lit("  ")))
          .otherwise(concat(lit("https://mercadolibre.com.mx/p/"), id))
        d.select(col("doc_id"), trim(url).as("url"),
          gf.provider_url(url).as("provider_url"))
      },
      oracle = Some("""
        WITH urls AS (
          SELECT doc_id,
            trim(CASE doc_id % 8
              WHEN 0 THEN 'https://www.temu.com/mx/item-' || doc_id::VARCHAR || '.html?top=1&g=2'
              WHEN 1 THEN 'https://articulo.mercadolibre.com.mx/MLM-' || doc_id::VARCHAR || '-prod?searchVariation=2'
              WHEN 2 THEN 'https://www.amazon.com.mx/SomeProduct/dp/B0' || doc_id::VARCHAR || '/ref=sr_1_1?keywords=x'
              WHEN 3 THEN 'https://www.shein.com/item/' || doc_id::VARCHAR || '?lang=es'
              WHEN 4 THEN 'https://www.ebay.com/itm/' || doc_id::VARCHAR || '?hash=abc'
              WHEN 5 THEN 'https://unknownshop' || (doc_id % 10)::VARCHAR || '.mx/products/' || doc_id::VARCHAR || '?utm=1'
              WHEN 6 THEN '  https://www.liverpool.com.mx/tienda/pdp/' || doc_id::VARCHAR || '  '
              ELSE 'https://mercadolibre.com.mx/p/' || doc_id::VARCHAR
            END) AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, url,
            regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
            lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
            regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path
          FROM urls)
        SELECT doc_id, url,
          CASE
            WHEN url IS NULL OR url = '' THEN NULL
            WHEN host LIKE '%temu.com%' OR host LIKE '%shein.com%'
              OR host LIKE '%walmart.com.mx%' OR host LIKE '%soriana.com%'
              OR host LIKE '%costco.com.mx%' OR host LIKE '%liverpool.com.mx%'
              OR host LIKE '%sears.com.mx%' OR host LIKE '%coppel.com%'
              OR host LIKE '%elektra.com.mx%'
              THEN scheme || '://' || host
            WHEN host LIKE '%ebay.%' OR host LIKE '%mercado%'
              OR host LIKE '%aliexpress%' OR host LIKE '%amazon%'
              OR host LIKE '%bestbuy%' OR host LIKE '%target%'
              OR host LIKE '%lowes%' OR host LIKE '%officedepot%'
              THEN scheme || '://' || host || path
            WHEN host LIKE '%mercadolibre.com.mx%'
              THEN scheme || '://' || regexp_replace(host, '^articulo\.', 'www.')
            WHEN host LIKE '%amazon.%'
              THEN scheme || '://' || host ||
                   (CASE WHEN path LIKE '%/dp/%' OR path LIKE '%/gp/product/%'
                         THEN regexp_replace(path, '/ref.*$', '')
                         ELSE path END)
            ELSE scheme || '://' || host || path
          END AS provider_url
        FROM parts""")),

    // C9 get_domain_store (utils_tools.py:184-197), with the *intended*
    // articulo.→www. replace (the reference discards it — SURVEY §7.3).
    "q19_domain_store" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val id = col("doc_id").cast("string")
        val url = when(col("doc_id") % 4 === 0, lit("mercadolibre"))
          .when(col("doc_id") % 4 === 1,
            concat(lit("https://articulo.mercadolibre.com.mx/MLM-"), id))
          .when(col("doc_id") % 4 === 2,
            concat(lit("http://Shop"), (col("doc_id") % 10).cast("string"),
              lit(".MX/a/"), id))
          .otherwise(lit("not a url"))
        d.select(col("doc_id"), url.as("url"),
          gf.domain_store(url).as("domain"))
      },
      oracle = Some("""
        SELECT doc_id, url,
          CASE WHEN url = 'mercadolibre' THEN 'www.mercadolibre.com.mx'
               WHEN m = '' THEN NULL
               ELSE regexp_replace(m, '^articulo\.mercadolibre', 'www.mercadolibre') END AS domain
        FROM (
          SELECT doc_id, url, lower(regexp_extract(url, 'https?://([^/]+)', 1)) AS m
          FROM (
            SELECT doc_id,
              CASE doc_id % 4
                WHEN 0 THEN 'mercadolibre'
                WHEN 1 THEN 'https://articulo.mercadolibre.com.mx/MLM-' || doc_id::VARCHAR
                WHEN 2 THEN 'http://Shop' || (doc_id % 10)::VARCHAR || '.MX/a/' || doc_id::VARCHAR
                ELSE 'not a url'
              END AS url
            FROM documents))""")),

    // C12 derived pricing with pandas-falsy semantics (0/NaN/None all
    // trigger the default — import_files_to_postgre.py:217-220).
    "q20_derived_pricing" -> QueryDef(
      build = (s, dir) => {
        val p = Engine.table(s, dir, "part")
        // Additive synthesis keeps true decimal precision at 2 — no
        // round-tie divergence between Spark (HALF_UP on shortest decimal
        // repr) and DuckDB (scale-multiply-and-round) is possible when the
        // final round position is beyond the true precision.
        val venta = when(col("p_partkey") % 3 === 0, lit(null).cast("double"))
          .when(col("p_partkey") % 3 === 1, lit(0.0))
          .otherwise(col("p_retailprice") + 100.0)
        val oferta = when(col("p_partkey") % 4 === 0, lit(null).cast("double"))
          .when(col("p_partkey") % 4 === 1, lit(0.0))
          .otherwise(col("p_retailprice") + 50.0)
        val price = gf.derived_price(venta, col("p_retailprice"))
        d2(p, price, oferta)
      },
      oracle = Some("""
        SELECT p_partkey,
               round(price, 6) AS price,
               round(CASE WHEN oferta IS NULL OR oferta = 0
                          THEN price * 0.85 ELSE oferta END, 6) AS offer_price
        FROM (
          SELECT p_partkey,
            CASE WHEN venta IS NULL OR venta = 0
                 THEN p_retailprice * 1.3 ELSE venta END AS price,
            oferta
          FROM (
            SELECT p_partkey, p_retailprice,
              CASE p_partkey % 3 WHEN 0 THEN NULL WHEN 1 THEN 0.0
                ELSE p_retailprice + 100.0 END AS venta,
              CASE p_partkey % 4 WHEN 0 THEN NULL WHEN 1 THEN 0.0
                ELSE p_retailprice + 50.0 END AS oferta
            FROM part))""")),

    // C4/C14 null-sentinel normalization + falsy defaults
    // (import_files_to_postgre.py:132, utils_tools.py:66-71).
    "q21_null_normalization" -> QueryDef(
      build = (s, dir) => {
        val ev = Engine.table(s, dir, "events")
        val raw = when(col("event_id") % 6 === 0, lit("None"))
          .when(col("event_id") % 6 === 1, lit("none"))
          .when(col("event_id") % 6 === 2, lit("NONE"))
          .when(col("event_id") % 6 === 3, lit(""))
          .when(col("event_id") % 6 === 4, lit("nan"))
          .otherwise(col("props"))
        val v = when(col("event_id") % 3 === 0, lit(null).cast("double"))
          .when(col("event_id") % 3 === 1, lit(0.0))
          .otherwise(col("value"))
        ev.select(col("event_id"), gf.normalize_null(raw).as("norm"),
          round(gf.default_if_falsy(v, lit(-1.0)), 4).as("v_or_default"))
      },
      oracle = Some("""
        SELECT event_id,
          CASE WHEN lower(trim(raw)) IN ('', 'none', 'nan') THEN NULL
               ELSE raw END AS norm,
          round(CASE WHEN v IS NULL OR v = 0 THEN -1.0 ELSE v END, 4) AS v_or_default
        FROM (
          SELECT event_id,
            CASE event_id % 6
              WHEN 0 THEN 'None' WHEN 1 THEN 'none' WHEN 2 THEN 'NONE'
              WHEN 3 THEN '' WHEN 4 THEN 'nan' ELSE props END AS raw,
            CASE event_id % 3 WHEN 0 THEN NULL WHEN 1 THEN 0.0
              ELSE value END AS v
          FROM events)""")),

    // C11 pre-sink truncation (database_utils.py:223).
    // Excel-serial date round-trip (§1.2: serial dates in the reference
    // fixtures, e.g. 45369): serial = days since 1899-12-30, and
    // excel_serial_date(serial) reproduces the original date.
    "q60_excel_serial" -> QueryDef(
      build = (s, dir) => {
        val o = Engine.table(s, dir, "orders")
        val serial = datediff(col("o_orderdate"),
          to_date(lit("1899-12-30"))).cast("long")
        o.select(col("o_orderkey"), serial.as("serial"),
          date_format(gf.excel_serial_date(serial), "yyyy-MM-dd")
            .as("roundtrip_date"))
      },
      oracle = Some("""
        SELECT o_orderkey,
               date_diff('day', DATE '1899-12-30', CAST(o_orderdate AS DATE))
                 AS serial,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                 AS roundtrip_date
        FROM orders""")),

    "q22_truncate" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        d.select(col("doc_id"), gf.truncate500(col("text")).as("snippet"),
          length(col("text")).as("n"))
      },
      oracle = Some("""
        SELECT doc_id, substr(text, 1, 500) AS snippet, length(text) AS n
        FROM documents""")),

    // A1 + S10 + C6: scalar max drives a derived output name
    // (pdf_to_xlsx.py:106-115) — the engine's only driver-side collect.
    "q23_dynamic_filename" -> QueryDef(
      build = (s, dir) => {
        val li = Engine.table(s, dir, "lineitem")
        li.agg(max(col("l_shipdate")).as("mx"))
          .select(concat(lit("cargos_bbva_"), gf.filename_date(col("mx")),
            lit(".xlsx")).as("file_name"))
      },
      oracle = Some("""
        SELECT 'cargos_bbva_' || strftime(max(l_shipdate), '%d%b%Y') || '.xlsx' AS file_name
        FROM lineitem""")),

    // A2/A3 catalog-style counts.
    "q24_catalog_counts" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        d.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            round(avg(col("n_chars")), 4).as("avg_chars"))
      },
      oracle = Some("""
        SELECT source, count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               round(avg(n_chars), 4) AS avg_chars
        FROM documents GROUP BY source""")),

    // URL canonicalization + dedup — the crawl-frontier step before any
    // content dedup: the same page arrives as case-varied hosts,
    // tracking-parameter variants (utm_*/fbclid/gclid), shuffled query
    // order, fragment suffixes, explicit default ports, lowercase
    // percent-escapes, and bare-host (empty-path) spellings. The engine
    // surface is functions.canonical_url (RFC 3986 §6 normalization +
    // tracking-param drop + sorted query) — shared with q184's frontier;
    // all codegen'd array lambdas, zero UDFs; at 100 TB this is a
    // map-side projection plus one count shuffle on the canonical key.
    // The oracle replays the identical normalization with DuckDB's list
    // lambdas — both engines canonicalize, neither shortcuts.
    "q182_url_canonicalize" -> QueryDef(
      build = (s, dir) => {
        val d = Engine.table(s, dir, "documents")
        val id = col("doc_id")
        val messy = concat(
          element_at(array(lit("http"), lit("https")), (id % 2 + 1).cast("int")),
          lit("://"),
          element_at(array(lit("WWW.Example.COM"), lit("www.example.com"),
            lit("Www.EXAMPLE.com"), lit("www.EXAMPLE.COM")), (id % 4 + 1).cast("int")),
          // explicit default ports on some variants — canonicalization
          // must drop :80/:443 for their schemes (http on even ids,
          // https on odd, so each port variant hits its own scheme)
          when(id % 8 === 2, lit(":80"))
            .when(id % 8 === 3, lit(":443")).otherwise(lit("")),
          // empty path (bare host) and lowercase percent-escape variants
          when(id % 10 === 4, lit(""))
            .when(id % 10 === 7, concat(lit("/page%2f"), (id % 100).cast("string")))
            .otherwise(concat(lit("/page/"), (id % 100).cast("string"))),
          lit("?"),
          // param order varies; tracking junk varies; id param always present
          element_at(array(
            concat(lit("id="), (id % 50).cast("string"), lit("&ref=home&utm_source=mail")),
            concat(lit("ref=home&utm_campaign=x&id="), (id % 50).cast("string")),
            concat(lit("fbclid=abc"), id.cast("string"), lit("&id="), (id % 50).cast("string"), lit("&ref=home")),
            concat(lit("id="), (id % 50).cast("string"), lit("&gclid=g"), id.cast("string"), lit("&ref=home"))),
            (id % 4 + 1).cast("int")),
          when(id % 5 === 0, lit("#section-2")).otherwise(lit("")))
        d.select(graft.functions.canonical_url(messy).as("canonical_url"),
            col("doc_id"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT doc_id,
                 concat(['http', 'https'][CAST(doc_id % 2 AS INT) + 1], '://',
                   ['WWW.Example.COM', 'www.example.com', 'Www.EXAMPLE.com',
                    'www.EXAMPLE.COM'][CAST(doc_id % 4 AS INT) + 1],
                   CASE WHEN doc_id % 8 = 2 THEN ':80'
                        WHEN doc_id % 8 = 3 THEN ':443' ELSE '' END,
                   CASE WHEN doc_id % 10 = 4 THEN ''
                        WHEN doc_id % 10 = 7 THEN concat('/page%2f', doc_id % 100)
                        ELSE concat('/page/', doc_id % 100) END,
                   '?',
                   [concat('id=', doc_id % 50, '&ref=home&utm_source=mail'),
                    concat('ref=home&utm_campaign=x&id=', doc_id % 50),
                    concat('fbclid=abc', doc_id, '&id=', doc_id % 50, '&ref=home'),
                    concat('id=', doc_id % 50, '&gclid=g', doc_id, '&ref=home')
                   ][CAST(doc_id % 4 AS INT) + 1],
                   CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS messy
          FROM documents),
        c AS (
          SELECT doc_id, regexp_replace(messy, '#.*', '') AS u FROM m),
        parts AS (
          SELECT doc_id,
                 lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)', 1)) AS hostport,
                 regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)', 1) AS pth,
                 list_sort(list_filter(string_split(
                   regexp_extract(u, '\?(.*)$', 1), '&'),
                   p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid)='))) AS keep
          FROM c),
        norm AS (
          SELECT doc_id,
                 concat(scheme, '://',
                   CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                        WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        ELSE hostport END,
                   CASE WHEN pth = '' THEN '/' ELSE pth END,
                   CASE WHEN len(keep) > 0
                        THEN concat('?', array_to_string(keep, '&')) ELSE '' END) AS cu
          FROM parts),
        pct AS (
          SELECT doc_id,
                 -- array_to_string([]) is NULL in DuckDB → coalesce
                 (string_split(cu, '%'))[1] ||
                 coalesce(array_to_string(list_transform((string_split(cu, '%'))[2:],
                   p -> CASE WHEN regexp_matches(p, '^[0-9a-fA-F]{2}')
                             THEN '%' || upper(p[1:2]) || p[3:]
                             ELSE '%' || p END), ''), '') AS canonical_url
          FROM norm)
        SELECT canonical_url,
               count(*) AS n_variants,
               min(doc_id) AS first_doc
        FROM pct
        GROUP BY 1""")),

    // robots.txt politeness gate (RFC 9309 base semantics) — the
    // crawl-frontier decision upstream of every ingested byte: 12
    // synthetic hosts get robots bodies (comments, unknown directives,
    // multi-agent blocks, agent-specific groups on every third host,
    // empty Disallow), each document becomes a candidate URL, and
    // operators.Robots PARSES THE BODY TEXT (line explode → block
    // windows → group join) then evaluates longest-prefix/allow-wins
    // per URL via a broadcast join + struct arg-max. The oracle runs
    // the identical cascade in SQL — both engines parse the same text;
    // neither shortcuts from the body generator's parameters.
    "q183_robots_gate" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Robots
        val docs = Engine.table(s, dir, "documents")
          .select(col("doc_id"), (col("doc_id") % 12).as("host"),
            element_at(array(lit("/private/ok/x"), lit("/private/x"),
              lit("/tmp3/a"), lit("/public/p"), lit("/bot0/z"),
              lit("/bot0/pub/q"), lit("/")),
              (col("doc_id") % 7 + 1).cast("int")).as("path"))
        val h = col("host")
        val body = concat(
          lit("# corpus robots\nUser-agent: * # catch-all\n"),
          lit("Disallow: /private\n"),
          when(h % 2 === 0, lit("Allow: /private/ok\n")).otherwise(lit("")),
          lit("Disallow: /tmp"), (h % 5).cast("string"), lit("\n"),
          lit("Crawl-delay: 5\n\n"),
          when(h % 3 === 0, concat(
            lit("User-agent: helper\nUser-agent: graftbot\n"),
            lit("Disallow: /bot"), (h % 4).cast("string"), lit("\n"),
            lit("Allow: /bot"), (h % 4).cast("string"), lit("/pub\n")))
            .otherwise(lit("")),
          lit("Disallow:\n"))
        val bodies = docs.select(h).distinct().select(h, body.as("body"))
        val rules = Robots.parseRules(bodies)
        Robots.evaluate(docs, rules, "graftbot")
      },
      oracle = Some("""
        WITH docs2 AS (
          SELECT doc_id, doc_id % 12 AS host,
                 ['/private/ok/x', '/private/x', '/tmp3/a', '/public/p',
                  '/bot0/z', '/bot0/pub/q', '/'][CAST(doc_id % 7 AS INT) + 1] AS path
          FROM documents),
        bodies AS (
          SELECT host, concat(
              '# corpus robots', chr(10), 'User-agent: * # catch-all', chr(10),
              'Disallow: /private', chr(10),
              CASE WHEN host % 2 = 0 THEN 'Allow: /private/ok' || chr(10) ELSE '' END,
              'Disallow: /tmp', host % 5, chr(10),
              'Crawl-delay: 5', chr(10), chr(10),
              CASE WHEN host % 3 = 0 THEN
                'User-agent: helper' || chr(10) || 'User-agent: graftbot' || chr(10) ||
                'Disallow: /bot' || (host % 4) || chr(10) ||
                'Allow: /bot' || (host % 4) || '/pub' || chr(10)
              ELSE '' END,
              'Disallow:', chr(10)) AS body
          FROM (SELECT DISTINCT host FROM docs2)),
        lns AS (
          -- constant-bounded series joined on i <= len(l): DuckDB's
          -- generate_series cannot take a lateral column bound
          SELECT b.host, g.i AS line_no,
                 trim(regexp_replace(b.l[g.i], '#.*', '')) AS line
          FROM (SELECT host, string_split(body, chr(10)) AS l FROM bodies) b
          JOIN generate_series(1, 64) AS g(i) ON g.i <= len(b.l)),
        parsed AS (
          SELECT host, line_no,
                 CASE WHEN lower(line) LIKE 'user-agent:%'
                      THEN trim(substr(line, 12)) END AS agent,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN 'allow'
                      WHEN lower(line) LIKE 'disallow:%' THEN 'disallow' END AS rule_type,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
                      WHEN lower(line) LIKE 'disallow:%' THEN trim(substr(line, 10)) END AS rule_path
          FROM lns),
        starts AS (
          SELECT *, CASE WHEN agent IS NOT NULL AND NOT coalesce(
                   lag(agent IS NOT NULL) OVER (PARTITION BY host ORDER BY line_no),
                   FALSE) THEN 1 ELSE 0 END AS is_start
          FROM parsed),
        blocked AS (
          SELECT *, sum(is_start)
                 OVER (PARTITION BY host ORDER BY line_no) AS blk
          FROM starts),
        agents AS (SELECT host, blk, agent FROM blocked WHERE agent IS NOT NULL),
        rules AS (
          SELECT b.host, a.agent, b.rule_type, b.rule_path
          FROM blocked b JOIN agents a USING (host, blk)
          WHERE b.rule_type IS NOT NULL AND b.blk > 0 AND b.rule_path <> ''),
        spec AS (SELECT DISTINCT host FROM rules WHERE agent = 'graftbot'),
        chosen AS (
          SELECT r.host, r.rule_type, r.rule_path
          FROM rules r LEFT JOIN spec s USING (host)
          WHERE CASE WHEN s.host IS NOT NULL THEN r.agent = 'graftbot'
                     ELSE r.agent = '*' END),
        m AS (
          SELECT d.doc_id, d.host, d.path,
                 {'len': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                         THEN length(c.rule_path) ELSE -1 END,
                  'is_allow': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                              AND c.rule_type = 'allow' THEN 1 ELSE 0 END,
                  'rp': CASE WHEN c.rule_path IS NOT NULL
                             AND starts_with(d.path, c.rule_path)
                        THEN c.rule_path ELSE '' END} AS pri
          FROM docs2 d LEFT JOIN chosen c USING (host))
        SELECT doc_id, host, path,
               max(pri).len < 0 OR max(pri).is_allow = 1 AS allowed,
               CASE WHEN max(pri).len >= 0 THEN max(pri).rp END AS matched_rule
        FROM m GROUP BY doc_id, host, path""")),

    // Crawl-frontier composition (the family flagship, q161-style): messy
    // URLs (case-varied hosts, tracking params, shuffled order,
    // fragments) → canonicalize (q182's cascade) → robots politeness
    // gate (q183's parse+evaluate, 12 hosts) → frontier dedup by
    // canonical URL. Output = the fetch list a compliant crawler would
    // actually issue, with variant counts. At 100 TB: canonicalization
    // is map-side, robots rules broadcast, and the only corpus-sized
    // shuffle is the final canonical-key count.
    "q184_crawl_frontier" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Robots
        val id = col("doc_id")
        val hn = (id % 12).as("host")
        val hostStr = concat(lit("h"), (id % 12).cast("string"), lit(".example.com"))
        val hostMessy = when(id % 2 === 0,
          concat(lit("H"), (id % 12).cast("string"), lit(".Example.COM")))
          .otherwise(hostStr)
        val path = element_at(array(lit("/private/ok/x"), lit("/private/x"),
          lit("/tmp3/a"), lit("/public/p"), lit("/bot0/z"),
          lit("/bot0/pub/q"), lit("/")), (id % 7 + 1).cast("int"))
        val qparams = element_at(array(
          concat(lit("id="), (id % 50).cast("string"), lit("&utm_source=m")),
          concat(lit("utm_campaign=x&id="), (id % 50).cast("string")),
          concat(lit("id="), (id % 50).cast("string"), lit("&fbclid=f"), id.cast("string")),
          concat(lit("gclid=g"), id.cast("string"), lit("&id="), (id % 50).cast("string"))),
          (id % 4 + 1).cast("int"))
        val frag = when(id % 5 === 0, lit("#top")).otherwise(lit(""))
        // one shared canonicalization surface with q182 — the engine's
        // functions.canonical_url, applied to the fully-assembled messy
        // URL (scheme case, tracking params, fragment all normalized)
        val canonical = graft.functions.canonical_url(
          concat(lit("https://"), hostMessy, path, lit("?"), qparams, frag))
        // NO fanOut (A/B'd r18: +4% over run noise WITH it — the regex
        // chain is light at ~6 ops/row and the robots join reshuffles
        // right after, so the extra exchange buys nothing)
        val docs = Engine.table(s, dir, "documents")
          .select(id, hn, path.as("path"), canonical.as("canonical_url"))
        val h = col("host")
        val body = concat(
          lit("# corpus robots\nUser-agent: * # catch-all\n"),
          lit("Disallow: /private\n"),
          when(h % 2 === 0, lit("Allow: /private/ok\n")).otherwise(lit("")),
          lit("Disallow: /tmp"), (h % 5).cast("string"), lit("\n"),
          lit("Crawl-delay: 5\n\n"),
          when(h % 3 === 0, concat(
            lit("User-agent: helper\nUser-agent: graftbot\n"),
            lit("Disallow: /bot"), (h % 4).cast("string"), lit("\n"),
            lit("Allow: /bot"), (h % 4).cast("string"), lit("/pub\n")))
            .otherwise(lit("")),
          lit("Disallow:\n"))
        val bodies = docs.select(h).distinct().select(h, body.as("body"))
        Robots.evaluate(docs, Robots.parseRules(bodies), "graftbot")
          .filter(col("allowed"))
          .groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("first_doc"))
      },
      oracle = Some("""
        WITH docs2 AS (
          SELECT doc_id, doc_id % 12 AS host,
                 ['/private/ok/x', '/private/x', '/tmp3/a', '/public/p',
                  '/bot0/z', '/bot0/pub/q', '/'][CAST(doc_id % 7 AS INT) + 1] AS path,
                 concat('https://',
                   lower(CASE WHEN doc_id % 2 = 0
                     THEN concat('H', doc_id % 12, '.Example.COM')
                     ELSE concat('h', doc_id % 12, '.example.com') END),
                   ['/private/ok/x', '/private/x', '/tmp3/a', '/public/p',
                    '/bot0/z', '/bot0/pub/q', '/'][CAST(doc_id % 7 AS INT) + 1],
                   '?',
                   array_to_string(list_sort(list_filter(string_split(
                     [concat('id=', doc_id % 50, '&utm_source=m'),
                      concat('utm_campaign=x&id=', doc_id % 50),
                      concat('id=', doc_id % 50, '&fbclid=f', doc_id),
                      concat('gclid=g', doc_id, '&id=', doc_id % 50)
                     ][CAST(doc_id % 4 AS INT) + 1], '&'),
                     p -> NOT regexp_matches(p, '^(utm_[a-z]+|fbclid|gclid)='))),
                     '&')) AS canonical_url
          FROM documents),
        bodies AS (
          SELECT host, concat(
              '# corpus robots', chr(10), 'User-agent: * # catch-all', chr(10),
              'Disallow: /private', chr(10),
              CASE WHEN host % 2 = 0 THEN 'Allow: /private/ok' || chr(10) ELSE '' END,
              'Disallow: /tmp', host % 5, chr(10),
              'Crawl-delay: 5', chr(10), chr(10),
              CASE WHEN host % 3 = 0 THEN
                'User-agent: helper' || chr(10) || 'User-agent: graftbot' || chr(10) ||
                'Disallow: /bot' || (host % 4) || chr(10) ||
                'Allow: /bot' || (host % 4) || '/pub' || chr(10)
              ELSE '' END,
              'Disallow:', chr(10)) AS body
          FROM (SELECT DISTINCT host FROM docs2)),
        lns AS (
          SELECT b.host, g.i AS line_no,
                 trim(regexp_replace(b.l[g.i], '#.*', '')) AS line
          FROM (SELECT host, string_split(body, chr(10)) AS l FROM bodies) b
          JOIN generate_series(1, 64) AS g(i) ON g.i <= len(b.l)),
        parsed AS (
          SELECT host, line_no,
                 CASE WHEN lower(line) LIKE 'user-agent:%'
                      THEN trim(substr(line, 12)) END AS agent,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN 'allow'
                      WHEN lower(line) LIKE 'disallow:%' THEN 'disallow' END AS rule_type,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
                      WHEN lower(line) LIKE 'disallow:%' THEN trim(substr(line, 10)) END AS rule_path
          FROM lns),
        starts AS (
          SELECT *, CASE WHEN agent IS NOT NULL AND NOT coalesce(
                   lag(agent IS NOT NULL) OVER (PARTITION BY host ORDER BY line_no),
                   FALSE) THEN 1 ELSE 0 END AS is_start
          FROM parsed),
        blocked AS (
          SELECT *, sum(is_start)
                 OVER (PARTITION BY host ORDER BY line_no) AS blk
          FROM starts),
        agents AS (SELECT host, blk, agent FROM blocked WHERE agent IS NOT NULL),
        rules AS (
          SELECT b.host, a.agent, b.rule_type, b.rule_path
          FROM blocked b JOIN agents a USING (host, blk)
          WHERE b.rule_type IS NOT NULL AND b.blk > 0 AND b.rule_path <> ''),
        spec AS (SELECT DISTINCT host FROM rules WHERE agent = 'graftbot'),
        chosen AS (
          SELECT r.host, r.rule_type, r.rule_path
          FROM rules r LEFT JOIN spec s USING (host)
          WHERE CASE WHEN s.host IS NOT NULL THEN r.agent = 'graftbot'
                     ELSE r.agent = '*' END),
        m AS (
          SELECT d.doc_id, d.canonical_url,
                 {'len': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                         THEN length(c.rule_path) ELSE -1 END,
                  'is_allow': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                              AND c.rule_type = 'allow' THEN 1 ELSE 0 END} AS pri
          FROM docs2 d LEFT JOIN chosen c USING (host)),
        verdicts AS (
          SELECT doc_id, canonical_url,
                 max(pri).len < 0 OR max(pri).is_allow = 1 AS allowed
          FROM m GROUP BY doc_id, canonical_url)
        SELECT canonical_url, count(*) AS n_variants, min(doc_id) AS first_doc
        FROM verdicts WHERE allowed GROUP BY canonical_url"""),
      headline = true),

    // Politeness-aware fetch scheduling: Crawl-delay directives (parsed
    // group-scoped like rules, crawler-specific group wins) turn the
    // allowed frontier into per-host fetch slots — slot k fetches at
    // (k-1)·delay seconds. The per-host window is the crawler's REAL
    // structure at scale: politeness serializes each host's fetches, so
    // host-partitioned ranks are exactly as parallel as the problem
    // allows; hosts are the distribution key.
    "q185_fetch_schedule" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Robots
        import org.apache.spark.sql.expressions.Window
        val id = col("doc_id")
        val docs = Engine.table(s, dir, "documents")
          .select((id % 12).as("host"),
            element_at(array(lit("/private/ok/x"), lit("/private/x"),
              lit("/tmp3/a"), lit("/public/p"), lit("/bot0/z"),
              lit("/bot0/pub/q"), lit("/")), (id % 7 + 1).cast("int")).as("path"))
          .distinct()
        val h = col("host")
        val body = concat(
          lit("User-agent: *\n"),
          lit("Disallow: /private\n"),
          when(h % 2 === 0, lit("Allow: /private/ok\n")).otherwise(lit("")),
          lit("Disallow: /tmp"), (h % 5).cast("string"), lit("\n"),
          lit("Crawl-delay: "), (h % 4 + 1).cast("string"), lit("\n\n"),
          when(h % 3 === 0, concat(
            lit("User-agent: graftbot\n"),
            lit("Disallow: /bot"), (h % 4).cast("string"), lit("\n"),
            lit("Crawl-delay: 2\n"))).otherwise(lit("")))
        val bodies = docs.select(h).distinct().select(h, body.as("body"))
        val delays = Robots.crawlDelays(bodies)
        val dspec = delays.filter(col("agent") === "graftbot")
          .select(col("host")).distinct().withColumn("has_specific", lit(true))
        val dchosen = delays.join(broadcast(dspec), Seq("host"), "left")
          .filter(when(coalesce(col("has_specific"), lit(false)),
            col("agent") === "graftbot").otherwise(col("agent") === "*"))
          .select(col("host"), col("delay_s"))
        val allowed = Robots.evaluate(docs, Robots.parseRules(bodies), "graftbot")
          .filter(col("allowed")).select(col("host"), col("path"))
        val slot = row_number()
          .over(Window.partitionBy(col("host")).orderBy(col("path")))
        allowed.join(broadcast(dchosen), Seq("host"), "left")
          .withColumn("slot", slot)
          .select(col("host"), col("path"), col("slot"),
            ((col("slot") - 1) * coalesce(col("delay_s"), lit(1.0)))
              .cast("double").as("fetch_at_s"))
      },
      oracle = Some("""
        WITH hosts AS (
          SELECT DISTINCT doc_id % 12 AS host FROM documents),
        docs2 AS (
          SELECT DISTINCT doc_id % 12 AS host,
                 ['/private/ok/x', '/private/x', '/tmp3/a', '/public/p',
                  '/bot0/z', '/bot0/pub/q', '/'][CAST(doc_id % 7 AS INT) + 1] AS path
          FROM documents),
        bodies AS (
          SELECT host, concat(
              'User-agent: *', chr(10),
              'Disallow: /private', chr(10),
              CASE WHEN host % 2 = 0 THEN 'Allow: /private/ok' || chr(10) ELSE '' END,
              'Disallow: /tmp', host % 5, chr(10),
              'Crawl-delay: ', host % 4 + 1, chr(10), chr(10),
              CASE WHEN host % 3 = 0 THEN
                'User-agent: graftbot' || chr(10) ||
                'Disallow: /bot' || (host % 4) || chr(10) ||
                'Crawl-delay: 2' || chr(10)
              ELSE '' END) AS body
          FROM hosts),
        lns AS (
          SELECT b.host, g.i AS line_no,
                 trim(regexp_replace(b.l[g.i], '#.*', '')) AS line
          FROM (SELECT host, string_split(body, chr(10)) AS l FROM bodies) b
          JOIN generate_series(1, 64) AS g(i) ON g.i <= len(b.l)),
        parsed AS (
          SELECT host, line_no, line,
                 CASE WHEN lower(line) LIKE 'user-agent:%'
                      THEN trim(substr(line, 12)) END AS agent,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN 'allow'
                      WHEN lower(line) LIKE 'disallow:%' THEN 'disallow' END AS rule_type,
                 CASE WHEN lower(line) LIKE 'allow:%' THEN trim(substr(line, 7))
                      WHEN lower(line) LIKE 'disallow:%' THEN trim(substr(line, 10)) END AS rule_path
          FROM lns),
        starts AS (
          SELECT *, CASE WHEN agent IS NOT NULL AND NOT coalesce(
                   lag(agent IS NOT NULL) OVER (PARTITION BY host ORDER BY line_no),
                   FALSE) THEN 1 ELSE 0 END AS is_start
          FROM parsed),
        blocked AS (
          SELECT *, sum(is_start)
                 OVER (PARTITION BY host ORDER BY line_no) AS blk
          FROM starts),
        agents AS (SELECT host, blk, agent FROM blocked WHERE agent IS NOT NULL),
        rules AS (
          SELECT b.host, a.agent, b.rule_type, b.rule_path
          FROM blocked b JOIN agents a USING (host, blk)
          WHERE b.rule_type IS NOT NULL AND b.blk > 0 AND b.rule_path <> ''),
        delays AS (
          SELECT b.host, a.agent,
                 min(CAST(trim(substr(b.line, 13)) AS DOUBLE)) AS delay_s
          FROM blocked b JOIN agents a USING (host, blk)
          WHERE b.blk > 0 AND lower(b.line) LIKE 'crawl-delay:%'
          GROUP BY b.host, a.agent),
        spec AS (SELECT DISTINCT host FROM rules WHERE agent = 'graftbot'),
        chosen AS (
          SELECT r.host, r.rule_type, r.rule_path
          FROM rules r LEFT JOIN spec s USING (host)
          WHERE CASE WHEN s.host IS NOT NULL THEN r.agent = 'graftbot'
                     ELSE r.agent = '*' END),
        dspec AS (SELECT DISTINCT host FROM delays WHERE agent = 'graftbot'),
        dchosen AS (
          SELECT d.host, d.delay_s
          FROM delays d LEFT JOIN dspec s USING (host)
          WHERE CASE WHEN s.host IS NOT NULL THEN d.agent = 'graftbot'
                     ELSE d.agent = '*' END),
        m AS (
          SELECT d.host, d.path,
                 {'len': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                         THEN length(c.rule_path) ELSE -1 END,
                  'is_allow': CASE WHEN c.rule_path IS NOT NULL
                              AND starts_with(d.path, c.rule_path)
                              AND c.rule_type = 'allow' THEN 1 ELSE 0 END} AS pri
          FROM docs2 d LEFT JOIN chosen c USING (host)),
        frontier AS (
          SELECT host, path FROM m GROUP BY host, path
          HAVING max(pri).len < 0 OR max(pri).is_allow = 1),
        sched AS (
          SELECT host, path,
                 row_number() OVER (PARTITION BY host ORDER BY path) AS slot
          FROM frontier)
        SELECT s.host, s.path, CAST(s.slot AS INT) AS slot,
               CAST((s.slot - 1) * coalesce(dc.delay_s, 1.0) AS DOUBLE) AS fetch_at_s
        FROM sched s LEFT JOIN dchosen dc USING (host)""")),

    // Sitemap discovery + incremental recrawl: robots bodies carry the
    // GLOBAL (group-independent) `Sitemap:` line, each host's sitemap
    // XML lists its documents with <loc>/<lastmod>, and the recrawl
    // list is everything modified since the last crawl date. Extraction
    // is regexp_extract_all + index-zip — the XML here is the sitemap
    // protocol's flat shape, so a full parser would be wasted weight;
    // at 100 TB sitemaps are KBs/host and this is scan-task work.
    "q187_sitemap_recrawl" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Robots
        val id = col("doc_id")
        val docs = Engine.table(s, dir, "documents")
          .select(id, (id % 12).as("host"),
            concat(lit("https://h"), (id % 12).cast("string"),
              lit(".example.com/page/"), id.cast("string")).as("loc"),
            date_add(to_date(lit("2026-01-01")), (id % 400).cast("int"))
              .cast("string").as("lastmod"))
        val h = col("host")
        val robots = docs.select(h).distinct().select(h, concat(
          lit("User-agent: *\nDisallow: /private\n"),
          lit("Sitemap: https://h"), h.cast("string"),
          lit(".example.com/sitemap.xml\n")).as("body"))
        val entry = concat(lit("<url><loc>"), col("loc"),
          lit("</loc><lastmod>"), col("lastmod"), lit("</lastmod></url>"))
        val xml = docs
          .select(h, struct(id, entry.as("e")).as("r"))
          .groupBy("host")
          .agg(concat(lit("<?xml version=\"1.0\"?><urlset>"),
            concat_ws("", transform(array_sort(collect_list(col("r"))),
              x => x.getField("e"))), lit("</urlset>")).as("xml"))
        val parsed = xml.select(h,
            arrays_zip(
              regexp_extract_all(col("xml"), lit("<loc>([^<]+)</loc>"), lit(1)),
              regexp_extract_all(col("xml"), lit("<lastmod>([^<]+)</lastmod>"), lit(1)))
              .as("entries"))
          .select(h, explode(col("entries")).as("e"))
          .select(h, col("e.0").as("loc"), col("e.1").as("lastmod"))
        parsed.join(broadcast(Robots.sitemaps(robots)), Seq("host"))
          .filter(col("lastmod") >= "2026-08-01") // changed since last crawl
          .select(col("host"), col("sitemap_url"), col("loc"), col("lastmod"))
      },
      oracle = Some("""
        WITH docs2 AS (
          SELECT doc_id, doc_id % 12 AS host,
                 concat('https://h', doc_id % 12, '.example.com/page/', doc_id) AS loc,
                 CAST(DATE '2026-01-01' + CAST(doc_id % 400 AS INT) AS VARCHAR) AS lastmod
          FROM documents),
        robots AS (
          SELECT host, concat('User-agent: *', chr(10), 'Disallow: /private', chr(10),
                 'Sitemap: https://h', host, '.example.com/sitemap.xml', chr(10)) AS body
          FROM (SELECT DISTINCT host FROM docs2)),
        smline AS (
          SELECT b.host,
                 trim(regexp_extract(trim(regexp_replace(b.l[g.i], '#.*', '')),
                   '(?i)^sitemap:(.*)$', 1)) AS sitemap_url
          FROM (SELECT host, string_split(body, chr(10)) AS l FROM robots) b
          JOIN generate_series(1, 16) AS g(i) ON g.i <= len(b.l)
          WHERE lower(trim(b.l[g.i])) LIKE 'sitemap:%'),
        xmls AS (
          SELECT host, concat('<?xml version="1.0"?><urlset>',
                 string_agg(concat('<url><loc>', loc, '</loc><lastmod>',
                   lastmod, '</lastmod></url>'), '' ORDER BY doc_id),
                 '</urlset>') AS xml
          FROM docs2 GROUP BY host),
        lists AS (
          SELECT host,
                 regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1) AS locs,
                 regexp_extract_all(xml, '<lastmod>([^<]+)</lastmod>', 1) AS mods
          FROM xmls),
        entries AS (
          SELECT l.host, l.locs[g.i] AS loc, l.mods[g.i] AS lastmod
          FROM lists l JOIN generate_series(1, 256) AS g(i) ON g.i <= len(l.locs))
        SELECT e.host, s.sitemap_url, e.loc, e.lastmod
        FROM entries e JOIN smline s USING (host)
        WHERE e.lastmod >= '2026-08-01'"""),
      headline = false),

    // RFC 9309 §2.2.3 wildcard matching pinned CROSS-ENGINE: `*` spans,
    // trailing `$` anchors, other characters are literal (`.` must not
    // leak as regex). The engine translates rules to Java regex
    // (Robots.rulePattern); the oracle performs its own independent
    // translation to RE2 in SQL — agreement proves the matching
    // semantics, not just one engine's spelling of them. Rules stay
    // host-varied so specificity ties and wildcard-vs-literal overlaps
    // all occur in the corpus.
    "q189_robots_wildcards" -> QueryDef(
      build = (s, dir) => {
        import graft.operators.Robots
        val id = col("doc_id")
        val docs = Engine.table(s, dir, "documents")
          .select(id, (id % 6).as("host"),
            element_at(array(lit("/a.tmp"), lit("/a.tmpx"), lit("/media/x/raw"),
              lit("/media/ok/raw"), lit("/media/x/rawdata"), lit("/archive1/x"),
              lit("/clean/page")), (id % 7 + 1).cast("int")).as("path"))
        val h = col("host")
        val body = concat(
          lit("User-agent: *\n"),
          lit("Disallow: /*.tmp$\n"),
          lit("Disallow: /media/*/raw\n"),
          when(h % 2 === 0, lit("Allow: /media/ok/raw\n")).otherwise(lit("")),
          lit("Disallow: /archive"), (h % 3).cast("string"), lit("\n"))
        val bodies = docs.select(h).distinct().select(h, body.as("body"))
        Robots.evaluate(docs, Robots.parseRules(bodies), "graftbot")
      },
      oracle = Some("""
        WITH docs2 AS (
          SELECT doc_id, doc_id % 6 AS host,
                 ['/a.tmp', '/a.tmpx', '/media/x/raw', '/media/ok/raw',
                  '/media/x/rawdata', '/archive1/x', '/clean/page'
                 ][CAST(doc_id % 7 AS INT) + 1] AS path
          FROM documents),
        rules AS (
          SELECT host, rule_type, rule_path FROM (
            SELECT host, 'disallow' AS rule_type, '/*.tmp$' AS rule_path
            FROM (SELECT DISTINCT host FROM docs2)
            UNION ALL
            SELECT host, 'disallow', '/media/*/raw'
            FROM (SELECT DISTINCT host FROM docs2)
            UNION ALL
            SELECT host, 'allow', '/media/ok/raw'
            FROM (SELECT DISTINCT host FROM docs2) WHERE host % 2 = 0
            UNION ALL
            SELECT host, 'disallow', concat('/archive', host % 3)
            FROM (SELECT DISTINCT host FROM docs2))),
        pats AS (
          SELECT host, rule_type, rule_path,
                 NOT (contains(rule_path, '*') OR rule_path LIKE '%$') AS plain,
                 concat('^',
                   replace(regexp_replace(
                     CASE WHEN rule_path LIKE '%$'
                          THEN substr(rule_path, 1, length(rule_path) - 1)
                          ELSE rule_path END,
                     '([.^+?(){}\[\]|\\$])', '\\\1', 'g'), '*', '.*'),
                   CASE WHEN rule_path LIKE '%$' THEN '$' ELSE '' END) AS pat
          FROM rules),
        hits AS (
          SELECT d.doc_id, d.host, d.path, p.rule_type, p.rule_path,
                 p.rule_path IS NOT NULL AND
                 CASE WHEN p.plain THEN starts_with(d.path, p.rule_path)
                      ELSE regexp_matches(d.path, p.pat) END AS hit
          FROM docs2 d LEFT JOIN pats p USING (host)),
        m AS (
          SELECT doc_id, host, path,
                 {'len': CASE WHEN hit THEN length(rule_path) ELSE -1 END,
                  'is_allow': CASE WHEN hit AND rule_type = 'allow'
                              THEN 1 ELSE 0 END,
                  'rp': CASE WHEN hit THEN rule_path ELSE '' END} AS pri
          FROM hits)
        SELECT doc_id, host, path,
               max(pri).len < 0 OR max(pri).is_allow = 1 AS allowed,
               CASE WHEN max(pri).len >= 0 THEN max(pri).rp END AS matched_rule
        FROM m GROUP BY doc_id, host, path"""))
  )

  // q20 helper: keeps the build readable.
  private def d2(p: org.apache.spark.sql.DataFrame,
                 price: org.apache.spark.sql.Column,
                 oferta: org.apache.spark.sql.Column) =
    p.select(col("p_partkey"),
      round(price, 6).as("price"),
      round(gf.derived_offer(oferta, price), 6).as("offer_price"))
}
