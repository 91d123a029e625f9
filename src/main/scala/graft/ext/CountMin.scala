package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a STORED,
  * MERGEABLE frequency table — the third member of the sketch-rollup
  * family next to HLL distinct counts ([[Sketches]]) and KLL quantiles
  * ([[QuantileSketches]]). Where `freqItems` (q63) answers "which
  * items are heavy" once, driver-side, a CMS table answers "how often
  * did THIS item occur" for any later probe, and two sketches built
  * on different days/partitions merge by cell-wise ADDITION — the
  * decomposition a 100 TB corpus needs: persist one small sketch per
  * (source, week), merge for any coarser rollup, never rescan.
  *
  * Representation: `depth` rows × `width` buckets as a tall DataFrame
  * `keys… × (d, bucket, cnt)` — at most depth·width cells per group
  * regardless of input size. Hashing is `xxhash64(term, seed+d) mod
  * width` — deterministic across engines, partitionings, and merge
  * orders, so every estimate is bit-reproducible.
  *
  * Guarantees (per sketch of total mass N): estimate(x) ≥ count(x)
  * ALWAYS (hash collisions only ever add), and estimate(x) ≤ count(x)
  * + εN with probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  * Merging preserves both (the merged sketch IS the sketch of the
  * concatenated stream).
  *
  * Scale shape: build = one scan + one hash-agg keyed on (keys, d,
  * bucket) — explode factor is `depth` (typically 4–5), map-side
  * partial aggregation collapses it before the shuffle. Probe = an
  * equi-join of the probe set's depth cells against the sketch table,
  * then a min-agg per probe — no rescan of the data the sketch
  * summarizes.
  */
object CountMin {

  /** Per-`keys` CMS over `termCol`: one row per non-empty cell,
    * `keys… , d, bucket, cnt`. Empty cells are implicit zeros (the
    * tall form stays small when groups are sparse).
    */
  def sketch(df: DataFrame, keys: Seq[String], termCol: String,
      depth: Int = 4, width: Int = 2048, seed: Long = 42L): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    val cells = df.select(
      (keys.map(col) :+ col(termCol).as("_t")): _*)
      .select((keys.map(col) :+ explode(sequence(lit(0), lit(depth - 1)))
        .as("d") :+ col("_t")): _*)
      .select((keys.map(col) :+ col("d") :+
        pmod(xxhash64(col("_t"), col("d") + lit(seed)), lit(width.toLong))
          .cast("int").as("bucket")): _*)
    cells.groupBy((keys.map(col) :+ col("d") :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise merge of sketch tables built with IDENTICAL (depth,
    * width, seed) — union + re-aggregate, optionally collapsing key
    * columns first (e.g. drop `week` to roll weekly sketches into an
    * all-time one).
    */
  def merge(sketches: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(sketches.nonEmpty)
    sketches.map(_.select((keys.map(col) :+ col("d") :+ col("bucket") :+
        col("cnt")): _*))
      .reduce(_ unionByName _)
      .groupBy((keys.map(col) :+ col("d") :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-frequency estimates: for each probe row (`keys…, termCol`),
    * `est` = min over the sketch's depth cells. Missing cells are
    * zeros, so a term hashing into any empty cell estimates 0 — the
    * left join + coalesce keeps that exact.
    */
  def estimate(sketchDf: DataFrame, probes: DataFrame, keys: Seq[String],
      termCol: String, depth: Int = 4, width: Int = 2048,
      seed: Long = 42L): DataFrame = {
    val probeCells = probes
      .select((keys.map(col) :+ col(termCol)): _*)
      .distinct()
      .select((keys.map(col) :+ col(termCol) :+
        explode(sequence(lit(0), lit(depth - 1))).as("d")): _*)
      .withColumn("bucket",
        pmod(xxhash64(col(termCol), col("d") + lit(seed)), lit(width.toLong))
          .cast("int"))
    probeCells.join(sketchDf, keys ++ Seq("d", "bucket"), "left")
      .groupBy((keys.map(col) :+ col(termCol)): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
