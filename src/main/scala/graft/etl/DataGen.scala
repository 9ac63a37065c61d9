package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded sample-data generator (reference L1, main.py:237-375).
  * The reference seeds numpy (main.py:241) and draws sequentially; exact
  * values need not match — distributions and invariants must (SURVEY
  * §2.8). We derive every "random" value from a 64-bit hash of
  * (row id, field salt), which is deterministic under ANY partitioning
  * — `rand(seed)` is only deterministic per-partition, so hash-derived
  * randomness is the scale-correct choice (spark.range(n) distributes;
  * no driver-side generation).
  */
object DataGen {

  /** Uniform double in [0, 1) from (id, salt) — full 52-bit mantissa. */
  private def u(id: Column, salt: Int): Column =
    (pmod(xxhash64(id, lit(salt)), lit(1L << 52)).cast("double") / lit((1L << 52).toDouble))

  private def uniformLong(id: Column, salt: Int, lo: Long, hi: Long): Column =
    (pmod(xxhash64(id, lit(salt)), lit(hi - lo + 1)) + lo)

  private def uniformMoney(id: Column, salt: Int, lo: Double, hi: Double): Column =
    round(u(id, salt) * (hi - lo) + lo, 2)

  private def pick(id: Column, salt: Int, xs: Seq[String]): Column =
    element_at(typedLit(xs), (pmod(xxhash64(id, lit(salt)), lit(xs.size)) + 1).cast("int"))

  /** Weighted categorical via threshold buckets on u() (reference uses
    * np.random.choice(p=...), main.py:326). */
  private def weighted(id: Column, salt: Int, xs: Seq[(String, Double)]): Column = {
    val cum = xs.scanLeft(0.0)(_ + _._2).tail
    val r = u(id, salt)
    xs.zip(cum).init.foldRight(lit(xs.last._1): Column) { case (((v, _), c), acc) =>
      when(r < c, v).otherwise(acc)
    }
  }

  private val countries = Seq("US", "United States", "UK", "Britain", "Germany", "France", "Japan", "Canada")
  private val cities = Seq("New York", "London", "Berlin", "Paris", "Tokyo", "Toronto")
  private val segments = Seq(("Regular", 0.6), ("Premium", 0.3), ("VIP", 0.1))
  private val categories = Seq("Electronics", "Clothing", "Beauty", "Home", "Sports")
  private val brands = Seq("BrandA", "BrandB", "BrandC", "BrandD", "BrandE")
  private val statuses = Seq( // main.py:326: p=[0.7, 0.1, 0.1, 0.05, 0.05]
    ("Completed", 0.7), ("Pending", 0.1), ("Shipped", 0.1),
    ("Cancelled", 0.05), ("Returned", 0.05))
  private val shipping = Seq("Standard", "Express", "Overnight")
  private val payments = Seq("Credit Card", "PayPal", "Debit Card", "Bank Transfer")
  private val priorities = Seq(("Low", 0.3), ("Medium", 0.5), ("High", 0.2))

  /** main.py:266-286: n customers; ~2% bad emails (no '@') and a few
    * unmapped-country rows so the transform filters have work to do. */
  def customers(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).toDF("customer_id")
      .withColumn("first_name", concat(lit("Customer"), col("customer_id")))
      .withColumn("last_name", concat(lit("Lastname"), col("customer_id")))
      .withColumn("email",
        when(u(col("customer_id"), 1) < 0.02,
             concat(lit("customer"), col("customer_id"), lit("email.com")))
          .otherwise(concat(lit("customer"), col("customer_id"), lit("@email.com"))))
      .withColumn("phone", concat(lit("+1-"),
        uniformLong(col("customer_id"), 2, 200, 999), lit("-"),
        uniformLong(col("customer_id"), 3, 100, 999), lit("-"),
        uniformLong(col("customer_id"), 4, 1000, 9999)))
      .withColumn("registration_date", date_format(
        date_add(lit("2023-01-01").cast("date"),
          uniformLong(col("customer_id"), 5, 0, 900).cast("int")), "yyyy-MM-dd"))
      .withColumn("country", pick(col("customer_id"), 6, countries))
      .withColumn("city", pick(col("customer_id"), 7, cities))
      .withColumn("customer_segment", weighted(col("customer_id"), 8, segments))

  /** main.py:288-311: products with cost×margin pricing (unit price is
    * cost marked up 1.2-3.0×, so margins are always positive). */
  def products(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).toDF("product_id")
      .withColumn("category", pick(col("product_id"), 1, categories))
      .withColumn("product_name", concat(col("category"), lit(" Product "), col("product_id")))
      .withColumn("subcategory", concat(col("category"), lit(" Sub"),
        uniformLong(col("product_id"), 2, 1, 3)))
      .withColumn("brand", pick(col("product_id"), 3, brands))
      .withColumn("cost_price", uniformMoney(col("product_id"), 4, 10.0, 250.0))
      .withColumn("unit_price", round(col("cost_price") * (u(col("product_id"), 5) * 1.8 + 1.2), 2))
      .withColumn("stock_quantity", uniformLong(col("product_id"), 6, 0, 1000))
      .withColumn("weight_kg", uniformMoney(col("product_id"), 7, 0.1, 20.0))
      .withColumn("supplier_id", uniformLong(col("product_id"), 8, 1, 20))
      .select("product_id", "product_name", "category", "subcategory", "brand",
              "unit_price", "cost_price", "stock_quantity", "weight_kg", "supplier_id")

  /** main.py:313-347: orders over nCustomers with weighted status and
    * arithmetically consistent totals (subtotal + tax + shipping −
    * discount, the invariant transformOrders re-checks). */
  def orders(spark: SparkSession, n: Long, nCustomers: Long): DataFrame =
    spark.range(1, n + 1).toDF("order_id")
      .withColumn("customer_id", uniformLong(col("order_id"), 1, 1, nCustomers))
      .withColumn("order_date", date_format(
        date_add(lit("2024-01-01").cast("date"),
          uniformLong(col("order_id"), 2, 0, 600).cast("int")), "yyyy-MM-dd"))
      .withColumn("order_status", weighted(col("order_id"), 3, statuses))
      .withColumn("shipping_method", pick(col("order_id"), 4, shipping))
      .withColumn("payment_method", pick(col("order_id"), 5, payments))
      .withColumn("subtotal", uniformMoney(col("order_id"), 6, 20.0, 800.0))
      .withColumn("tax_amount", round(col("subtotal") * 0.08, 2))
      .withColumn("shipping_cost", uniformMoney(col("order_id"), 7, 5.0, 25.0))
      .withColumn("discount_amount", uniformMoney(col("order_id"), 8, 0.0, 5.0))
      .withColumn("total_amount", round(
        col("subtotal") + col("tax_amount") + col("shipping_cost") - col("discount_amount"), 2))
      .withColumn("shipping_address",
        concat(lit("Address "), col("order_id"), lit(", City, Country")))
      .withColumn("order_priority", weighted(col("order_id"), 9, priorities))

  /** main.py:349-375: 1-5 items per order with consistent line totals.
    * sequence+explode keeps generation distributed (no driver loop),
    * and the dense item_id comes from the bucketed
    * [[graft.ops.GlobalOrder.globalRowNumber]] (bucket = order_id/1000,
    * monotone along the (order_id, k) order) — identical numbering to
    * `row_number() OVER (ORDER BY order_id, k)` without funnelling the
    * whole item table through one window partition at large n. */
  def orderItems(spark: SparkSession, nOrders: Long, nProducts: Long): DataFrame =
    graft.ops.GlobalOrder.globalRowNumber(
        spark.range(1, nOrders + 1).toDF("order_id")
          .withColumn("k", explode(sequence(lit(1),
            uniformLong(col("order_id"), 1, 1, 5).cast("int")))),
        floor(col("order_id") / lit(1000L)),
        Seq(col("order_id").asc, col("k").asc), out = "item_id")
      .withColumn("product_id", uniformLong(xxhash64(col("order_id"), col("k")), 2, 1, nProducts))
      .withColumn("quantity", uniformLong(xxhash64(col("order_id"), col("k")), 3, 1, 5))
      .withColumn("unit_price", uniformMoney(xxhash64(col("order_id"), col("k")), 4, 5.0, 400.0))
      .withColumn("discount_percent", uniformMoney(xxhash64(col("order_id"), col("k")), 5, 0.0, 15.0))
      .withColumn("line_total", round(
        col("quantity") * col("unit_price") * (lit(1.0) - col("discount_percent") / 100.0), 2))
      .select("item_id", "order_id", "product_id", "quantity", "unit_price",
              "discount_percent", "line_total")

  /** Generate all four CSVs (reference generate_sample_data,
    * main.py:237-264; S3 sinks). */
  def writeSampleData(spark: SparkSession, dir: String,
                      nCustomers: Long = 2000, nProducts: Long = 500,
                      nOrders: Long = 1500): Unit = {
    Sources.writeCsv(customers(spark, nCustomers), s"$dir/sample_customers")
    Sources.writeCsv(products(spark, nProducts), s"$dir/sample_products")
    Sources.writeCsv(orders(spark, nOrders, nCustomers), s"$dir/sample_orders")
    Sources.writeCsv(orderItems(spark, nOrders, nProducts), s"$dir/sample_order_items")
  }

  // ---- Scale-check twins of the driver's documents/events/embeddings ----
  // Distribution-matched to /root/testdata/sf0.1 (measured: 31-word vocab,
  // 10-100 tokens/doc uniform, 20 uniform sources, weighted lang labels;
  // events uniform over 5 types × 30 days; embeddings 64-dim, 10 labels).
  // Used ONLY to measure how operator runtime scales past sf0.1 — never as
  // a correctness input (the oracles always run on the driver's testdata).

  private val docVocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val docLangs = Seq(
    ("en", 0.4), ("zh", 0.15), ("es", 0.15), ("fr", 0.15), ("de", 0.15))

  /** Documents twin: same vocab/length/source/lang shape as the driver's
    * `documents` table, so shingle-sharing (and therefore near-dup bucket
    * sizes) scale the way the real corpus would. ~3% of docs are exact
    * copies of their block's template doc and ~3% are near-copies (two
    * extra tokens), so the dedup/cluster operators have dup structure to
    * find at every scale — text is a pure function of a seed id, so
    * "copy" needs no join, just seed snapping. The token array is a
    * hash-per-position draw — a one-off interpreted HOF is fine here;
    * generation is not a measured path. */
  def documentsLike(spark: SparkSession, n: Long): DataFrame = {
    val r = u(col("doc_id"), 9)
    val template = col("doc_id") - pmod(col("doc_id"), lit(100L))
    spark.range(0, n).toDF("doc_id")
      .withColumn("seed", when(r < 0.06, template).otherwise(col("doc_id")))
      .withColumn("len", uniformLong(col("seed"), 1, 10, 100).cast("int"))
      // per-doc SKEWED draw (u² concentrates mass on low ranks) over a
      // per-doc hash-driven PERMUTATION of the vocab: the driver's docs
      // repeat a few words 3-4× each while differing doc-to-doc. A
      // uniform draw makes every doc distribution-identical (simhash
      // concentrates the corpus into near-cap buckets); a skew over a
      // FIXED family of rotations makes same-rotation pairs grow
      // quadratically with corpus size (no real crawl does that — a page
      // has a bounded number of near-copies). A unique permutation per
      // doc keeps both properties right: docs repeat words internally,
      // chance cross-doc similarity stays negligible at every scale, and
      // only the seed-snapped dup blocks are similar.
      .withColumn("perm", array_sort(transform(typedLit(docVocab),
        w => struct(xxhash64(col("seed"), w).as("h"), w.as("w")))))
      .withColumn("body", array_join(transform(sequence(lit(1), col("len")),
        i => element_at(col("perm"),
          (floor(pow(pmod(xxhash64(col("seed"), i, lit(2)), lit(1L << 30)).cast("double")
                       / lit((1L << 30).toDouble), lit(2.0)) * lit(docVocab.size.toDouble))
             .cast("int") + 1)).getField("w")), " "))
      .withColumn("text", when(r >= 0.03 && r < 0.06,
          concat(col("body"), lit(" "),
            element_at(typedLit(docVocab),
              (pmod(xxhash64(col("doc_id"), lit(7)), lit(docVocab.size)) + 1).cast("int")),
            lit(" "),
            element_at(typedLit(docVocab),
              (pmod(xxhash64(col("doc_id"), lit(8)), lit(docVocab.size)) + 1).cast("int"))))
        .otherwise(col("body")))
      .withColumn("lang", weighted(col("doc_id"), 3, docLangs))
      .withColumn("source", concat(lit("src"), uniformLong(col("doc_id"), 4, 0, 19)))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Events twin: uniform types over a 30-day window; user count scales
    * with volume (the realistic axis — more traffic is more users, and
    * per-user session/as-of state must NOT grow with corpus size). */
  def eventsLike(spark: SparkSession, n: Long, nUsers: Long): DataFrame =
    spark.range(0, n).toDF("event_id")
      .withColumn("ts", timestamp_micros(
        // Instant.parse, not Timestamp.valueOf: the latter parses in the
        // JVM default timezone, shifting the generated slice per host
        // (ADVICE r5) — epoch anchors must be host-TZ independent.
        (lit(java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L)
          + pmod(xxhash64(col("event_id"), lit(1)), lit(30L * 24 * 3600 * 1000000L)))))
      .withColumn("user_id", uniformLong(col("event_id"), 2, 0, nUsers - 1))
      .withColumn("event_type", pick(col("event_id"), 3,
        Seq("click", "view", "purchase", "signup", "error")))
      .withColumn("value", uniformMoney(col("event_id"), 4, 0.0, 200.0))
      .withColumn("props", concat(lit("{\"k\": "),
        uniformLong(col("event_id"), 5, 0, 99), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Embeddings twin: 64-dim float vectors around one of 10 label
    * anchors plus noise — cosine structure (tight within-label, loose
    * across) matches the driver table closely enough for ANN/dedup
    * timing. */
  def embeddingsLike(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n).toDF("vec_id")
      // ~4% exact-duplicate vectors via the same seed-snapping trick as
      // documentsLike, so embedding dedup has real clusters to find
      .withColumn("seed", when(u(col("vec_id"), 9) < 0.04,
        col("vec_id") - pmod(col("vec_id"), lit(100L))).otherwise(col("vec_id")))
      .withColumn("label", pmod(xxhash64(col("seed"), lit(1)), lit(10)).cast("int"))
      .withColumn("embedding", transform(sequence(lit(1), lit(64)),
        i => ((pmod(xxhash64(col("label"), i, lit(2)), lit(1L << 30)).cast("double")
                 / lit((1L << 30).toDouble) - 0.5) * 0.3 +
              (pmod(xxhash64(col("seed"), i, lit(3)), lit(1L << 30)).cast("double")
                 / lit((1L << 30).toDouble) - 0.5) * 0.2).cast("float")))
      .select("vec_id", "embedding", "label")

  /** Write a documents/events/embeddings slice shaped like the driver's
    * testdata at `mult`× the sf0.1 volumes. */
  /** Customer-dimension slice: one row per user id the events slice can
    * reference (the dim grows with the user base, not the event
    * volume), segment + balance hash-derived like everything else.
    * Carries only the columns the measured queries read. */
  def customersLike(spark: SparkSession, nUsers: Long): DataFrame =
    spark.range(0, nUsers).toDF("c_custkey")
      .withColumn("c_name", concat(lit("Customer#"), col("c_custkey")))
      .withColumn("c_nationkey",
        pmod(xxhash64(col("c_custkey"), lit(11)), lit(25L)).cast("int"))
      .withColumn("c_acctbal", uniformMoney(col("c_custkey"), 12, -999.99, 9999.99))
      .withColumn("c_mktsegment", pick(col("c_custkey"), 13,
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")))

  /** Orders-fact slice for the bucketed-join rig: ~10 orders per user,
    * keyed into the same custkey domain as [[customersLike]]. */
  def ordersLike(spark: SparkSession, n: Long, nUsers: Long): DataFrame =
    spark.range(0, n).toDF("o_orderkey")
      .withColumn("o_custkey", uniformLong(col("o_orderkey"), 14, 0, nUsers - 1))
      .withColumn("o_orderstatus", pick(col("o_orderkey"), 15, Seq("O", "F", "P")))
      .withColumn("o_totalprice", uniformMoney(col("o_orderkey"), 16, 1.0, 100000.0))
      // spread over the DRIVER's 1995→2001-11 window (driver schema is
      // TIMESTAMP), not an arbitrary year: the suite's date predicates
      // (q11 o_orderdate > 2001-01-01, q15 l_shipdate <= 2000-01-01)
      // must intersect the generated range the way they intersect the
      // real testdata, or the scale rig measures scan-plus-empty-
      // aggregate for every date-filtered plan (round-12 ADVICE).
      // Date-grouped plans (q01 month truncation) also keep realistic
      // group counts (~83 months).
      .withColumn("o_orderdate", timestamp_micros(
        lit(java.time.Instant.parse("1995-01-01T00:00:00Z").toEpochMilli * 1000L)
          + pmod(xxhash64(col("o_orderkey"), lit(18)), lit(2496L * 24 * 3600 * 1000000L))))
      .withColumn("o_orderpriority", pick(col("o_orderkey"), 17,
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))

  // ---- Relational q-series twins (round-11 verdict item 3) ----
  // Same schemas as the driver's TPC-H-ish tables, so the join-heaviest
  // plans in the suite (q03/q13/q14/q16/q19 and the full x80 catalog)
  // get the same 10×/100× scale evidence the x-series has. Volumes are
  // sf0.01-proportioned per mult (lineitem 60k×, 4 lines/order,
  // 30 lines/part) — what matters for the ratio is that 1× and mult×
  // come from the SAME generator.

  /** Static geography dims — genuinely constant at any scale (TPC-H
    * semantics: 5 regions, 25 nations). Generated, not copied from the
    * driver testdata, so the slice stays self-contained. */
  def regionsLike(spark: SparkSession): DataFrame = {
    val names = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
    spark.range(0, names.length).toDF("k")
      .select(col("k").cast("int").as("r_regionkey"),
        element_at(typedLit(names), col("k").cast("int") + 1).as("r_name"))
  }

  def nationsLike(spark: SparkSession): DataFrame =
    spark.range(0, 25).toDF("k")
      .select(col("k").cast("int").as("n_nationkey"),
        concat(lit("NATION#"), col("k")).as("n_name"),
        pmod(col("k"), lit(5L)).cast("int").as("n_regionkey"))

  def suppliersLike(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n).toDF("s_suppkey")
      .withColumn("s_name", concat(lit("Supplier#"), col("s_suppkey")))
      .withColumn("s_nationkey",
        pmod(xxhash64(col("s_suppkey"), lit(21)), lit(25L)).cast("int"))
      .withColumn("s_acctbal", uniformMoney(col("s_suppkey"), 22, -999.99, 9999.99))

  /** Parts dim: brand cardinality fixed at 25 (brands don't multiply
    * with catalog size), type/size/price hash-drawn like the driver's. */
  def partsLike(spark: SparkSession, n: Long): DataFrame =
    spark.range(0, n).toDF("p_partkey")
      .withColumn("p_name", concat(lit("Part#"), col("p_partkey")))
      .withColumn("p_brand", concat(lit("Brand#"),
        pmod(xxhash64(col("p_partkey"), lit(23)), lit(25L))))
      .withColumn("p_type", pick(col("p_partkey"), 24, Seq(
        "STANDARD BRASS", "STANDARD STEEL", "SMALL COPPER", "SMALL NICKEL",
        "MEDIUM TIN", "MEDIUM BRASS", "LARGE STEEL", "LARGE COPPER",
        "ECONOMY TIN", "ECONOMY NICKEL", "PROMO BRASS", "PROMO STEEL")))
      .withColumn("p_size",
        uniformLong(col("p_partkey"), 25, 1, 50).cast("int"))
      .withColumn("p_retailprice", uniformMoney(col("p_partkey"), 26, 900.0, 2000.0))

  /** Lineitem fact: ~4 lines/order, keys drawn into the same domains as
    * [[ordersLike]]/[[partsLike]]/[[suppliersLike]], ship timestamps
    * spread over the driver's 1995→2001-11 window (see [[ordersLike]] —
    * the suite's l_shipdate <= 2000-01-01 predicate keeps ~5/6 of rows
    * at every scale, as it does on the real testdata). */
  def lineitemLike(spark: SparkSession, n: Long, nOrders: Long,
                   nParts: Long, nSuppliers: Long): DataFrame =
    spark.range(0, n).toDF("k")
      .select(
        uniformLong(col("k"), 31, 0, nOrders - 1).as("l_orderkey"),
        uniformLong(col("k"), 32, 0, nParts - 1).as("l_partkey"),
        uniformLong(col("k"), 33, 0, nSuppliers - 1).as("l_suppkey"),
        (pmod(xxhash64(col("k"), lit(34)), lit(7L)) + 1).cast("int").as("l_linenumber"),
        uniformLong(col("k"), 35, 1, 50).cast("double").as("l_quantity"),
        uniformMoney(col("k"), 36, 1000.0, 100000.0).as("l_extendedprice"),
        uniformMoney(col("k"), 37, 0.0, 0.10).as("l_discount"),
        uniformMoney(col("k"), 38, 0.0, 0.08).as("l_tax"),
        pick(col("k"), 39, Seq("R", "A", "N")).as("l_returnflag"),
        pick(col("k"), 40, Seq("O", "F")).as("l_linestatus"),
        timestamp_micros(
          lit(java.time.Instant.parse("1995-01-01T00:00:00Z").toEpochMilli * 1000L)
            + pmod(xxhash64(col("k"), lit(41)), lit(2496L * 24 * 3600 * 1000000L)))
          .as("l_shipdate"))
      .drop("k")

  def writeScaleSlice(spark: SparkSession, dir: String, mult: Int): Unit = {
    documentsLike(spark, 5000L * mult)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    eventsLike(spark, 100000L * mult, 1500L * mult)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    embeddingsLike(spark, 2000L * mult)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // static-ish dims: grow with the user base so the dim-reading
    // operators (x116 stream enrich, x120 bucketed join) are measurable
    // on the rig instead of named exclusions
    customersLike(spark, 1500L * mult)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    ordersLike(spark, 15000L * mult, 1500L * mult)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // full relational catalog: the q-series (and x77/x80) join these
    regionsLike(spark)
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    nationsLike(spark)
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    suppliersLike(spark, 100L * mult)
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    partsLike(spark, 2000L * mult)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    lineitemLike(spark, 60000L * mult, nOrders = 15000L * mult,
        nParts = 2000L * mult, nSuppliers = 100L * mult)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }
}
