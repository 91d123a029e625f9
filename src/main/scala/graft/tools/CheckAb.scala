package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Micro A/B for the in-task CHECK enforcement: the SAME bound
  * constraint conjunction evaluated per row interpreted
  * (`Expression.eval`, the pre-r16 hot loop) vs compiled once through
  * `Predicate.create` (whole-expression codegen, the r16 writer
  * path). Driver-local rows, no IO — isolates exactly the per-row
  * constant the native V2 writers pay. Numbers land in BASELINE.md.
  */
object CheckAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000000)
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = true),
      StructField("value", DoubleType, nullable = true)))
    val bound = graft.sources.TxLogV2.bindConstraints(spark,
      schema, Map(
        "id_pos" -> "event_id >= 0",
        "val_range" -> "value IS NULL OR (value > -1e9 AND value < 1e9)"))
    val row = new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(42L), java.lang.Double.valueOf(1.5)))
    def time(tag: String)(f: => Unit): Double = {
      f // warmup
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[checkab] $tag%-12s $s%.3f s for $n rows " +
        f"(${s * 1e9 / n}%.1f ns/row)")
      s
    }
    val interp = time("interpreted") {
      var i = 0
      while (i < n) {
        var j = 0
        while (j < bound.length) {
          if (java.lang.Boolean.FALSE.equals(bound(j)._3.eval(row)))
            sys.error("veto")
          j += 1
        }
        i += 1
      }
    }
    val preds = bound.map { case (_, _, b) =>
      val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(b)
      p.initialize(0); p
    }
    val compiled = time("codegen") {
      var i = 0
      while (i < n) {
        var j = 0
        while (j < preds.length) {
          if (!preds(j).eval(row)) sys.error("veto")
          j += 1
        }
        i += 1
      }
    }
    println(f"[checkab] speedup ${interp / compiled}%.2fx")
    spark.stop()
  }
}
