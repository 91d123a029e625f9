package graft.core

import org.apache.spark.sql.types._

/** Explicit schemas for the reference-shaped tables (SURVEY §1).
  *
  * The reference declares these inline as Postgres DDL strings
  * (`initial_price_paid_data.py:67-87`, `pull_new_sales_list.py:73-81`,
  * `rightmove_outcodes.py:36-43`); headerless CSVs get column names
  * positionally from `COLUMN_NAMES` (`initial_price_paid_data.py:17-21`).
  * The engine never infers schemas — applied-on-read, always.
  *
  * Type choices (SURVEY §1.2): CHAR(n) → StringType (the 8-vs-10 postcode
  * discrepancy between the two DAGs disappears); NUMERIC price → DoubleType
  * in flight (the reference itself degrades to float64 via pandas);
  * yyyymmdd BIGINT date encodings → LongType for fidelity, with DateType
  * companions produced by [[graft.functions.DateCodecs]].
  */
object Schemas {

  /** Raw 16-column headerless price-paid CSV, positional order pinned by
    * the reference (`initial_price_paid_data.py:17-21`). All strings at
    * scan time; coercion happens in [[graft.operators.Clean.pricePaid]]
    * exactly where the reference does it (pandas `errors='coerce'`).
    */
  val pricePaidCsv: StructType = StructType(Seq(
    StructField("transaction_unique_identifier", StringType),
    StructField("price", StringType),
    StructField("date_of_transfer", StringType),
    StructField("postcode", StringType),
    StructField("property_type", StringType),
    StructField("old_new", StringType),
    StructField("duration", StringType),
    StructField("paon", StringType),
    StructField("saon", StringType),
    StructField("street", StringType),
    StructField("locality", StringType),
    StructField("town_city", StringType),
    StructField("district", StringType),
    StructField("county", StringType),
    StructField("ppd_category_type", StringType),
    StructField("record_status", StringType)
  ))

  /** `price_paid` at rest (`initial_price_paid_data.py:67-87`). */
  val pricePaid: StructType = StructType(Seq(
    StructField("transaction_unique_identifier", StringType, nullable = false),
    StructField("price", DoubleType),
    StructField("date_of_transfer", LongType), // yyyymmdd
    StructField("transfer_date", DateType),    // engine companion column
    StructField("postcode", StringType),
    StructField("property_type", StringType),
    StructField("old_new", StringType),
    StructField("duration", StringType),
    StructField("paon", StringType),
    StructField("saon", StringType),
    StructField("street", StringType),
    StructField("locality", StringType),
    StructField("town_city", StringType),
    StructField("district", StringType),
    StructField("county", StringType),
    StructField("ppd_category_type", StringType),
    StructField("record_status", StringType)
  ))

  /** `sales_properties` (`pull_new_sales_list.py:73-81`). The SERIAL
    * surrogate key is dropped — the natural key `property_id` suffices
    * (SURVEY §1.2).
    */
  /** MinHash dedup index table (`ext.MinHashDedup.indexFrame` output):
    * hashed shingle set + signature per document.
    */
  val minhashIndex: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false)),
    StructField("sig", ArrayType(LongType, containsNull = false))))

  val salesProperties: StructType = StructType(Seq(
    StructField("property_id", StringType, nullable = false),
    StructField("is_processed", BooleanType),
    StructField("created_date", LongType), // yyyymmdd
    StructField("updated_date", LongType)  // yyyymmdd
  ))

  /** `rightmove_areas` (`rightmove_outcodes.py:36-43`); `area_id` uses
    * NULL/0/-1 sentinels, `last_updated_sale` is a yyyymmdd watermark.
    */
  val rightmoveAreas: StructType = StructType(Seq(
    StructField("outcode", StringType, nullable = false),
    StructField("area_id", LongType),
    StructField("display_name", StringType),
    StructField("last_updated_sale", LongType)
  ))

  /** Typeahead REST payload (`rightmove_outcodes.py:74-79`): the JSON
    * `matches` array element shape, for `from_json`.
    */
  val typeaheadMatch: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("type", StringType),
    StructField("displayName", StringType)
  ))

  val typeaheadPayload: StructType = StructType(Seq(
    StructField("matches", ArrayType(typeaheadMatch))
  ))
}
