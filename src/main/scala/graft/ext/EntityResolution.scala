package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution for SHORT strings (names, titles, addresses,
  * product labels): blocking-key equi-join + edit-distance verify —
  * the record-linkage shape, vs the shingle/minhash machinery built
  * for documents (token-set similarity degrades on 3-word strings
  * where a single typo is the signal).
  *
  * Scale shape: candidate generation is an equi-join on the blocking
  * key — never all-pairs; the quadratic cost lives INSIDE each block,
  * so the blocking key is the dial (composite keys shrink blocks;
  * [[SkewJoin]]-style salting applies if one block is hot). The
  * verify uses Spark's banded `levenshtein(l, r, threshold)` which
  * abandons a pair once the distance provably exceeds the bound —
  * O(maxDist·len) per pair, not O(len²). Unit-cost edit distance is
  * engine-portable integer arithmetic (the oracle matches exactly).
  */
object EntityResolution {

  /** (id_a, id_b, dist) for same-block pairs with edit distance ≤
    * `maxDist`, each unordered pair once (id_a < id_b). Null texts
    * never pair (their length bucket is null).
    *
    * EXACT length-filter pre-blocking rides inside each block: edit
    * distance is ≥ the length difference, so bucketing lengths at
    * width maxDist+1 and probing only adjacent buckets (one side
    * replicated ×3 on the bucket key) can never lose a qualifying
    * pair — |bucket diff| ≥ 2 implies length diff > maxDist — while
    * cutting the candidate join volume by the block's length spread.
    * Each pair still meets exactly once (its two bucket slots are
    * distinct).
    */
  def blockedEditDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val width = maxDist + 1
    val t = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
      blockKey.as("__blk"),
      expr(s"length($textCol) DIV $width").as("__lb"))
    val a = t.select(col("__id").as("id_a"), col("__t").as("__ta"),
      col("__blk"), col("__lb").as("__slot"))
    val b = t.select(col("__id").as("id_b"), col("__t").as("__tb"),
      col("__blk"),
      explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1))
        .as("__slot"))
    a.join(b, Seq("__blk", "__slot"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("dist") >= 0) // banded form returns -1 past the bound
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
