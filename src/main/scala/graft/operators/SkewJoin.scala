package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 "randomized work
  * selection to spread load" → the engine's general skew tool; AQE's
  * skew-join split handles sort-merge skew automatically, this is the
  * explicit variant for when a handful of hot keys dominate a
  * large-large join and even split partitions overflow).
  *
  * Mechanics: the probe side gets a deterministic salt in [0, n) (hash
  * of a uniquifier column — NOT rand(), so retries/replays see the same
  * assignment); the build side is replicated n× with every salt value;
  * the join key becomes (key, salt). Row multiplicity is preserved
  * exactly; the build side pays n× duplication, so n should be sized to
  * the hot-key factor, not made "safely large".
  */
object SkewJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `key`, salted `n` ways.
    * `uniquifier` is any probe column with high cardinality (an id,
    * an offset) used to spread the salt deterministically.
    */
  def salted(
      probe: DataFrame,
      build: DataFrame,
      key: Seq[String],
      uniquifier: Column,
      n: Int): DataFrame = {
    require(n > 0)
    val salted = probe.withColumn("__salt", pmod(xxhash64(uniquifier), lit(n.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, key :+ "__salt").drop("__salt")
  }
}
