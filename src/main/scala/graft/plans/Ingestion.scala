package graft.plans

import graft.{functions => gf}
import graft.operators.Relational
import graft.sources.XlsxSource
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, IntegerType, LongType}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The warehouse star schema produced by [[Ingestion]] — the reference's
  * Postgres schema (`database_utils.py:70-79,103-110,156-168,192-201,
  * 232-238,266-280`) held as DataFrames (parquet-backed managed tables in
  * production; fact/dim split drives broadcast planning).
  */
case class Warehouse(
    paymentType: DataFrame, // id_payment_type, payment_type
    store: DataFrame,       // id_store, store_name, store_url, status
    provider: DataFrame,    // id_provider, id_store, provider_url, is_active
    product: DataFrame,     // id_product, product_name, description, image_url, brand, category
    purchase: DataFrame,    // id_purchase, id_provider, id_payment_type, total, tax, ieps,
                            //   purchase_date, delivery_date, exchange_rate, shipping_cost, discount
    operation: DataFrame,   // id_purchase, id_product, quantity, unit_price, unit_price_usd,
                            //   discount_percentage, pieces_per_unit, final_cost, product_url
    price: DataFrame)       // id_product, price, offer_price, start_date, end_date

/** Pipeline 2 of the reference (`import_files_to_postgre.py`, SURVEY.md
  * §3.2) re-expressed as ONE lazy set-oriented plan per batch of workbook
  * files — where the reference runs ≥5 SQL round-trips per row
  * (`import_files_to_postgre.py:145-227`), this runs a fixed number of
  * joins per BATCH regardless of row count.
  *
  * Stage map (reference → here):
  *  - openpyxl hyperlink walk + pandas double parse → one [[XlsxSource]]
  *    scan per sheet (values + hyperlinks together)
  *  - `deep_clean_data` (`:120-132`) → conform projections (safe_float /
  *    normalize_null / date casts)
  *  - `Picture_URL` positional zip (`:261`) → `_rownum` equi-join (W3)
  *  - `previous_link` carry (`:143-153`) → lag window (W1, one-row
  *    lookback: the reference re-assigns previous_link to the row's own
  *    possibly-empty Liga AFTER use, so a blank inherits only from the
  *    immediately-previous row — see SURVEY.md §7.3)
  *  - get_or_create store/provider (`database_utils.py:57-113`) → dim
  *    anti-join + surrogate assignment (J4); the provider-liveness HEAD
  *    probe (`verify_url`, `utils_tools.py:92-108`) is a side-effecting
  *    call that must NOT live in a query plan — is_active defaults TRUE
  *    here and a separate quarantined enrichment stage may update it
  *  - create_product + operation/purchase match (`database_utils.py:
  *    115-173`) → product dim upsert + exact-duplicate anti-join gate (J5)
  *  - insert_purchase/insert_operations (`:175-245`) → fact appends with
  *    deterministic surrogate ids
  *  - insert_price SCD upsert (`:260-280`) → [[scdMerge]]
  *
  * Surrogate ids are `max(existing) + row_number` over (file, rownum) —
  * deterministic, matching the reference's sequence order. The global
  * window is a single-partition sort of the BATCH (not the warehouse);
  * batches are file-bounded so this stays small. At 100 TB-scale backfills
  * switch the id window to per-file partitions + per-file offsets
  * (count-prefix-sum) — same determinism, no global sort.
  */
object Ingestion {

  /** Seed warehouse: the payment-type catalog the reference assumes
    * pre-exists (`CAT_PAYMENT_TYPE`, `database_utils.py:29-37`; constant
    * lookup key "Tarjeta de Crédito" at `import_files_to_postgre.py:183`).
    */
  def empty(spark: SparkSession): Warehouse = {
    import spark.implicits._
    Warehouse(
      paymentType = Seq((1L, "Tarjeta de Crédito"))
        .toDF("id_payment_type", "payment_type"),
      store = Seq.empty[(Long, String, String, Boolean)]
        .toDF("id_store", "store_name", "store_url", "status"),
      provider = Seq.empty[(Long, Long, String, Boolean)]
        .toDF("id_provider", "id_store", "provider_url", "is_active"),
      product = Seq.empty[(Long, String, String, String, String, String)]
        .toDF("id_product", "product_name", "description", "image_url", "brand", "category"),
      purchase = Seq.empty[(Long, Long, Long, Double, Double, Double, java.sql.Date, String, Double, Double, Double)]
        .toDF("id_purchase", "id_provider", "id_payment_type", "total", "tax", "ieps",
          "purchase_date", "delivery_date", "exchange_rate", "shipping_cost", "discount"),
      operation = Seq.empty[(Long, Long, Int, Double, Double, Double, Int, Double, String)]
        .toDF("id_purchase", "id_product", "quantity", "unit_price", "unit_price_usd",
          "discount_percentage", "pieces_per_unit", "final_cost", "product_url"),
      price = Seq.empty[(Long, Double, Double, java.sql.Date, java.sql.Date)]
        .toDF("id_product", "price", "offer_price", "start_date", "end_date"))
  }

  /** Ingest every .xlsx under `path` into `existing`, returning the new
    * warehouse state. Batch-idempotent: re-running over already-ingested
    * files is a no-op for facts (the J5 gate), matching the reference's
    * transactional replay safety (SURVEY.md §4.2).
    */
  def ingestWorkbooks(spark: SparkSession, path: String,
                      existing: Warehouse): Warehouse = {
    val batchDate = current_date() // CURRENT_DATE of the SCD merge

    // ---- scan (S2/S3): values + hyperlinks in one parse per sheet ----
    val compras0 = XlsxSource.read(spark, path, "Compras")
    val precios0 = XlsxSource.read(spark, path, "Precios", hyperlinkCols = Seq("Preview"))

    // ---- conform (deep_clean_data, `import_files_to_postgre.py:120-132`)
    val compras = conform(compras0,
      numeric = Seq("Cant", "Precio", "% Desc", "C. Unit US", "C. Unit", "Total Cmpr",
        "Envio", "Dólar", "Desct", "Pzs", "Costo Final"),
      dates = Seq("Fch Cmpr"))
    val precios = conform(precios0,
      numeric = Seq("P. Tienda", "C. Unit", "P. Venta", "P. Oferta"),
      dates = Seq.empty)

    // ---- W3 positional zip (`:261`): Precios!Preview hyperlink list
    // aligned to Compras rows by position within the same file. A Preview
    // cell WITHOUT a hyperlink contributes "" (extract_hyperlinks appends
    // "" per row, `import_files_to_postgre.py:59-60`, and deep_clean does
    // NOT null empty strings); only positions past the Precios row count
    // stay null.
    val pics = precios.select(col("_file"), col("_rownum"),
      coalesce(col("_hyperlink_Preview"), lit("")).as("Picture_URL"))
    val withPic = compras.join(pics, Seq("_file", "_rownum"), "left")

    // ---- J1 enrich (`:93-97`): brand/category by Descripción; build side
    // deduped to first match for the reference's iloc[0] semantics
    val brandCat = Relational.firstPerKey(
      precios.select(col("_file"), col("_rownum"), qcol("Descripción"),
        col("Marca"), col("Categoria")),
      keys = Seq(col("_file"), qcol("Descripción")),
      orderBy = Seq(col("_rownum")))
      .drop("_rownum")
    val enriched = withPic.join(broadcast(brandCat), Seq("_file", "Descripción"), "left")

    // ---- W1 forward-fill (`:143-153`), one-row lookback on the RAW value
    val wFile = Window.partitionBy(col("_file")).orderBy(col("_rownum"))
    val liga = col("Liga")
    val rows = enriched.withColumn("str_link",
      when(truthy(liga), liga).otherwise(lag(liga, 1).over(wFile)))

    // ---- store resolution (C7/C9, `database_utils.py:57-83`) ----
    val withStore = rows
      .withColumn("store_name", gf.store_name(col("str_link")))
      .withColumn("store_url", gf.domain_store(col("str_link")))
      .withColumn("provider_url", gf.provider_url(col("str_link")))
    // F4: unresolvable store → row contributes nothing (`:60-65`)
    val resolvable = withStore
      .filter(col("store_name").isNotNull && col("store_name") =!= "none")

    // ---- store dim upsert (J4/M1): first occurrence wins store_url ----
    val newStores = Relational.firstPerKey(
      resolvable.select(col("store_name"), col("store_url"), col("_file"), col("_rownum")),
      keys = Seq(col("store_name")), orderBy = Seq(col("_file"), col("_rownum")))
      .join(existing.store.select("store_name"), Seq("store_name"), "left_anti")
      .withColumn("status", lit(true))
    val store = existing.store.unionByName(
      assignIds(newStores, "id_store", maxId(existing.store, "id_store"),
        Seq(col("_file"), col("_rownum")))
        .select("id_store", "store_name", "store_url", "status"))

    // ---- provider dim upsert (J4/M2): key (id_store, provider_url);
    // is_active would come from the quarantined URL-liveness stage (C10)
    val withIds = resolvable.join(broadcast(store.select("id_store", "store_name")),
      Seq("store_name"))
    val newProviders = Relational.firstPerKey(
      withIds.select(col("id_store"), col("provider_url"), col("_file"), col("_rownum")),
      keys = Seq(col("id_store"), col("provider_url")),
      orderBy = Seq(col("_file"), col("_rownum")))
      .join(existing.provider.select("id_store", "provider_url"),
        Seq("id_store", "provider_url"), "left_anti")
      .withColumn("is_active", lit(true))
    val provider = existing.provider.unionByName(
      assignIds(newProviders, "id_provider", maxId(existing.provider, "id_provider"),
        Seq(col("_file"), col("_rownum")))
        .select("id_provider", "id_store", "provider_url", "is_active"))

    val withProvider = withIds.join(
      broadcast(provider.select("id_provider", "id_store", "provider_url")),
      Seq("id_store", "provider_url"))

    // ---- F2/F3 fact filters (`import_files_to_postgre.py:162-172`);
    // NB dims above intentionally saw canceled rows too — the reference
    // creates store/provider BEFORE these skips
    val facts0 = withProvider
      .filter(!(qcol("Fch Entrga").isNotNull && qcol("Fch Entrga").contains("CANCELED")))
      .filter(qcol("Descripción").isNotNull && trim(qcol("Descripción")) =!= "")

    // ---- J5 dedup gate (`database_utils.py:128-145`): first occurrence
    // per exact (product, quantity, unit_price, purchase_date) in the
    // batch, minus combos already in the warehouse
    val dedupKey = Seq("Descripción", "quantity_k", "unit_price_k", "purchase_date_k")
    val keyed = facts0
      .withColumn("quantity_k", col("Cant").cast(IntegerType))
      .withColumn("unit_price_k", qcol("C. Unit"))
      .withColumn("purchase_date_k", qcol("Fch Cmpr"))
    val existingCombos = existing.operation
      .join(existing.purchase.select("id_purchase", "purchase_date"), Seq("id_purchase"))
      .join(existing.product.select("id_product", "product_name"), Seq("id_product"))
      .select(col("product_name").as("Descripción"),
        col("quantity").as("quantity_k"),
        col("unit_price").as("unit_price_k"),
        col("purchase_date").as("purchase_date_k"))
    val facts = Relational.firstPerKey(keyed, dedupKey.map(col),
        Seq(col("_file"), col("_rownum")))
      .join(existingCombos, dedupKey, "left_anti")

    // ---- product dim upsert (M2): conditional brand/category columns →
    // one nullable schema (`database_utils.py:149-171`)
    val newProducts = Relational.firstPerKey(
      facts.select(qcol("Descripción").as("product_name"),
        col("Picture_URL").as("image_url"),
        when(truthy(col("Marca")) && truthy(col("Categoria")), col("Marca")).as("brand"),
        when(truthy(col("Marca")) && truthy(col("Categoria")), col("Categoria")).as("category"),
        col("_file"), col("_rownum")),
      keys = Seq(col("product_name")), orderBy = Seq(col("_file"), col("_rownum")))
      .join(existing.product.select("product_name"), Seq("product_name"), "left_anti")
      .withColumn("description", lit("")) // create_product is called with descr=""
    val product = existing.product.unionByName(
      assignIds(newProducts, "id_product", maxId(existing.product, "id_product"),
        Seq(col("_file"), col("_rownum")))
        .select("id_product", "product_name", "description", "image_url", "brand", "category"))

    val withProduct = facts.join(
      broadcast(product.select(col("id_product"), col("product_name").as("Descripción"))),
      Seq("Descripción"))

    // ---- purchase fact (M3, `database_utils.py:175-204`) ----
    val idPayment = existing.paymentType
      .filter(col("payment_type") === "Tarjeta de Crédito")
      .select(col("id_payment_type"))
    val purchaseRows = assignIds(withProduct, "id_purchase",
      maxId(existing.purchase, "id_purchase"), Seq(col("_file"), col("_rownum")))
    val purchase = existing.purchase.unionByName(
      purchaseRows
        .crossJoin(broadcast(idPayment)) // constant dim key J3 (`:183`)
        .select(col("id_purchase"),
          col("id_provider"),
          col("id_payment_type").cast(LongType),
          qcol("Total Cmpr").as("total"),
          lit(0.0).as("tax"), lit(0.0).as("ieps"),
          qcol("Fch Cmpr").as("purchase_date"),
          qcol("Fch Entrga").as("delivery_date"),
          qcol("Dólar").as("exchange_rate"),
          coalesce(col("Envio"), lit(0.0)).as("shipping_cost"),
          coalesce(col("Desct"), lit(0.0)).as("discount")))

    // ---- operation fact (M3, `database_utils.py:206-245`) ----
    val operation = existing.operation.unionByName(
      purchaseRows.select(col("id_purchase"), col("id_product"),
        coalesce(col("Cant").cast(IntegerType), lit(0)).as("quantity"),
        coalesce(qcol("C. Unit"), lit(0.0)).as("unit_price"),
        qcol("C. Unit US").as("unit_price_usd"),
        coalesce(qcol("% Desc"), lit(0.0)).as("discount_percentage"),
        coalesce(col("Pzs").cast(IntegerType), lit(1)).as("pieces_per_unit"),
        qcol("Costo Final").as("final_cost"),
        gf.truncate500(coalesce(col("Liga"), lit(""))).as("product_url")))

    // ---- price SCD merge (M4, `database_utils.py:260-280`): J6 semi
    // (price only when the product appears in Precios) + C12 pricing
    val priceRow = Relational.firstPerKey(
      precios.select(col("_file"), col("_rownum"), qcol("Descripción"),
        qcol("P. Venta"), qcol("P. Oferta")),
      keys = Seq(col("_file"), qcol("Descripción")), orderBy = Seq(col("_rownum")))
    val priced = purchaseRows
      .join(priceRow.select(col("_file"), qcol("Descripción"),
        qcol("P. Venta"), qcol("P. Oferta")), Seq("_file", "Descripción"))
      .withColumn("price", gf.derived_price(qcol("P. Venta"), qcol("Costo Final")))
      .withColumn("offer_price", gf.derived_offer(qcol("P. Oferta"), col("price")))
    // last write wins: the reference updates price per surviving row in
    // sequence, so the final state is the LAST row's value per product
    val incomingPrices = Relational.firstPerKey(priced,
      Seq(col("id_product")), Seq(col("_file").desc, col("_rownum").desc))
      .select("id_product", "price", "offer_price")
    val price = scdMerge(existing.price, incomingPrices, batchDate)

    Warehouse(existing.paymentType, store, provider, product, purchase, operation, price)
  }

  /** M4 SCD-style price upsert (`database_utils.py:260-280`): matched
    * products update price/offer_price and move start/end_date to `asOf`
    * when the price changed; unmatched insert with start_date=`asOf`.
    * Delta-capable sinks express this exact shape as `MERGE INTO`.
    */
  def scdMerge(current: DataFrame, updates: DataFrame, asOf: Column): DataFrame = {
    val u = updates.select(col("id_product").as("u_id"),
      col("price").as("u_price"), col("offer_price").as("u_offer"))
    val matched = current.join(broadcast(u), col("id_product") === col("u_id"), "left")
      .select(col("id_product"),
        coalesce(col("u_price"), col("price")).as("price"),
        coalesce(col("u_offer"), col("offer_price")).as("offer_price"),
        when(col("u_id").isNotNull && !(col("price") <=> col("u_price")), asOf)
          .otherwise(col("start_date")).as("start_date"),
        when(col("u_id").isNotNull && !(col("price") <=> col("u_price")), asOf)
          .otherwise(col("end_date")).as("end_date"))
    val inserted = u.join(current.select(col("id_product").as("u_id")), Seq("u_id"), "left_anti")
      .select(col("u_id").as("id_product"), col("u_price").as("price"),
        col("u_offer").as("offer_price"), asOf.as("start_date"),
        lit(null).cast(DateType).as("end_date"))
    matched.unionByName(inserted)
  }

  /** Column ref with backtick quoting — sheet headers carry dots and
    * spaces ("C. Unit", "P. Venta") that bare col() would parse as nested
    * field access.
    */
  private def qcol(name: String): Column = col(s"`$name`")

  /** Pandas truthiness (SURVEY.md §7.3 falsy-vs-null): None and '' are
    * falsy for strings.
    */
  private def truthy(c: Column): Column = c.isNotNull && c =!= ""

  private def conform(df: DataFrame, numeric: Seq[String], dates: Seq[String]): DataFrame =
    graft.operators.Conform.conform(df,
      graft.operators.Conform.Contract(
        required = Seq("Descripción"), numeric = numeric, dates = dates))

  private def maxId(df: DataFrame, idCol: String): Long =
    df.agg(coalesce(max(col(idCol)).cast(LongType), lit(0L))).head().getLong(0)

  // Surrogate-id assignment via the range-partitioned global rank — the
  // one-task Window.orderBy spelling would single-thread an initial bulk
  // load of a large dim (see Relational.dimUpsert's note).
  private def assignIds(df: DataFrame, idCol: String, offset: Long,
                        orderBy: Seq[Column]): DataFrame =
    graft.operators.Relational.withGlobalRank(df, orderBy, "__rank")
      .withColumn(idCol, col("__rank") + offset).drop("__rank")
}
