package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeExprSpec extends SparkSpec {
  import spark.implicits._

  private def norm(rows: Seq[String]) =
    rows.toDF("s").select(T.nfcNormalize(col("s"))).as[String].collect()

  test("composes decomposed sequences; canonical-order double composition") {
    val out = norm(Seq(
      "Cafe\u0301",        // e + combining acute -> \u00e9
      "A\u030A",           // A + ring -> \u00c5
      "s\u0323\u0307",      // s + dot-below + dot-above -> U+1E69
      "s\u0307\u0323"))     // NON-canonical order: NFC reorders then composes
    assert(out(0) == "Caf\u00e9")
    assert(out(1) == "\u00c5")
    assert(out(2) == "\u1e69")
    assert(out(3) == "\u1e69") // same canonical result from either input order
  }

  test("already-NFC text is the identity (fast path) and plain ASCII untouched") {
    val in = Seq("plain ascii", "Caf\u00e9 d\u00e9j\u00e0", "")
    assert(norm(in).toSeq == in)
    // direct fast-path pin: the SAME UTF8String instance comes back
    val s = UTF8String.fromString("already composed \u00e9")
    assert(NfcNormalizeExpr.run(s) eq s)
  }

  test("null propagates; interpreted eval matches the codegen path") {
    val withNull = Seq(Some("e\u0301"), None).toDF("s")
      .select(T.nfcNormalize(col("s"))).as[Option[String]].collect()
    assert(withNull.toSeq == Seq(Some("\u00e9"), None))
    // interpreted parity: run() is the single shared kernel
    assert(NfcNormalizeExpr.run(UTF8String.fromString("e\u0301")).toString == "\u00e9")
    assert(NfcNormalizeExpr.run(null) == null)
  }

  test("the expression stays inside whole-stage codegen") {
    // the starred stage id (*(1)) IS the whole-stage-codegen marker in
    // the simple plan string — the projection carrying graft_nfc must
    // sit inside one, not behind a non-codegen fence
    val p = spark.range(3).select(T.nfcNormalize(col("id").cast("string")))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project [graft_nfc"), p)
  }
}
