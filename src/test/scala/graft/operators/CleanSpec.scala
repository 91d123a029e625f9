package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.core.Schemas

/** F1-F3 coercion + P3/P4 filter semantics on a dirty price-paid fixture
  * (FIXTURES.md §B1: malformed date, non-numeric price, null postcode,
  * non-OX postcode, braces in GUID).
  */
class CleanSpec extends SparkSpec {

  private def raw(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.pricePaidCsv)

  private def row(tui: String, price: String, date: String, pc: String): Row =
    Row(tui, price, date, pc, "T", "N", "F", "12", "", "COWLEY ROAD", "",
      "OXFORD", "OXFORD", "OXFORDSHIRE", "A", "A")

  test("braces stripped, date→yyyymmdd long, price→double") {
    val out = Clean.pricePaid(raw(Seq(
      row("{8E5A2B-C3}", "250000", "2017-03-10 00:00", "OX4 1AB"))))
    val r = out.collect().head
    assert(r.getAs[String]("transaction_unique_identifier") == "8E5A2B-C3")
    assert(r.getAs[Long]("date_of_transfer") == 20170310L)
    assert(r.getAs[Double]("price") == 250000.0)
    assert(r.getAs[java.sql.Date]("transfer_date").toString == "2017-03-10")
  }

  test("coerce-to-null then drop: bad date, bad price, null key") {
    val out = Clean.pricePaid(raw(Seq(
      row("{A}", "100", "not-a-date", "OX1 1AA"),     // bad date → dropped
      row("{B}", "abc", "2017-03-10 00:00", "OX1 1AA"), // bad price → dropped
      row(null, "100", "2017-03-10 00:00", "OX1 1AA"),  // null key → dropped
      row("{C}", "100", "2017-03-10 00:00", null),      // null postcode → dropped
      row("{D}", "100", "2017-03-10 00:00", "OX1 1AA")))) // kept
    assert(out.collect().map(_.getAs[String]("transaction_unique_identifier")).toSeq == Seq("D"))
  }

  test("prefix filter is null-safe-false and keeps only OX") {
    val out = Clean.oxfordOnly(Clean.pricePaid(raw(Seq(
      row("{A}", "1", "2017-01-01 00:00", "OX4 1AB"),
      row("{B}", "1", "2017-01-01 00:00", "SW1A 1AA")))))
    assert(out.collect().map(_.getAs[String]("postcode")).toSeq == Seq("OX4 1AB"))
  }
}
