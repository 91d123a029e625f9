package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** yyyymmdd-integer date codecs (SURVEY §1.2).
  *
  * The reference stores every date as a yyyymmdd integer — e.g. the
  * `date_of_transfer BIGINT` column (`initial_price_paid_data.py:71`,
  * produced by `pd.to_datetime(...).dt.strftime('%Y%m%d').astype(float)`
  * at `:123-124`) and the `created_date`/`updated_date`/
  * `last_updated_sale` work-queue watermarks (`pull_new_sales_list.py:78-79`,
  * `rightmove_outcodes.py:41`). These helpers are pure Column expressions
  * (codegen'd, no UDFs) so they stay inside whole-stage codegen.
  */
object DateCodecs {

  /** date/timestamp column → yyyymmdd long (e.g. 2017-03-10 → 20170310). */
  def yyyymmdd(c: Column): Column =
    date_format(c, "yyyyMMdd").cast("long")

  /** yyyymmdd long → DateType. Null-safe: null stays null. */
  def fromYyyymmdd(c: Column): Column =
    try_to_date(c.cast("string"), "yyyyMMdd")

  /** Lenient parse of the reference's raw CSV timestamp format
    * `yyyy-MM-dd HH:mm` to DateType; unparsable → null (pandas
    * `errors='coerce'` parity, `initial_price_paid_data.py:123`).
    * `try_to_date` (not `to_date`) so the behavior is coerce-to-null
    * regardless of the session's ANSI setting.
    */
  def lenientDate(c: Column, fmt: String = "yyyy-MM-dd HH:mm"): Column =
    try_to_date(c, fmt)
}
