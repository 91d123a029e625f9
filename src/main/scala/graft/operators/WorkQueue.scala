package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Work-queue selection (SURVEY §2.1 S3/S4, §2.6 O1/O2, §2.9 T3).
  *
  * The reference picks a random batch of eligible rows:
  * `WHERE last_updated_sale IS NULL OR last_updated_sale <= yesterday
  * ORDER BY RANDOM() LIMIT 5` (`pull_new_sales_list.py:93-102`) and
  * `WHERE area_id IS NULL OR area_id = 0 ORDER BY RANDOM() LIMIT 50`
  * (`rightmove_outcodes.py:50-55`).
  *
  * `ORDER BY RANDOM()` is replaced by a deterministic scatter — ordering
  * by `md5(key)` — so tests are oracle-stable while preserving the
  * load-spreading intent (hash order ≈ uniform shuffle of keys). True
  * randomness is available via [[randomBatch]] with a seed.
  *
  * Scale note: `orderBy(...).limit(n)` compiles to TakeOrderedAndProject —
  * a per-partition top-n then a single-reduce merge, no full sort, no
  * full shuffle. At 100 TB prefer `df.sample` before the limit to cut
  * scan cost when eligibility is dense.
  */
object WorkQueue {

  /** Eligibility: watermark null or stale (T3). */
  def staleOrNever(watermarkCol: String, threshold: Long): Column =
    col(watermarkCol).isNull || col(watermarkCol) <= threshold

  /** Eligibility: sentinel null-or-zero (`rightmove_outcodes.py:52`). */
  def nullOrZero(c: String): Column = col(c).isNull || col(c) === 0

  /** Deterministic "random" batch: order by md5 of the key. */
  def hashScatterBatch(df: DataFrame, eligible: Column, key: String, n: Int): DataFrame =
    df.filter(eligible).orderBy(md5(col(key).cast("string")), col(key)).limit(n)

  /** Seeded random batch for production load-spreading. */
  def randomBatch(df: DataFrame, eligible: Column, n: Int, seed: Long = 42L): DataFrame =
    df.filter(eligible).orderBy(rand(seed)).limit(n)
}
