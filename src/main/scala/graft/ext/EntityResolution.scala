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
    * `maxDist`, each unordered pair once (id_a < id_b).
    *
    * Length-filter note (measured, not guessed): bucketing lengths at
    * width maxDist+1 and equi-joining on (block, adjacent bucket) is
    * the standard exactness-preserving refinement — but it replicates
    * one side ×3, and on corpora whose per-block length spread spans
    * only a couple of buckets (this fixture: 5-word part names) the
    * replication costs more than the pruning saves (bench: 8.0 s →
    * 9.1 s at sf0.1). The banded verify below already rejects
    * length-distant pairs in O(1), so the simple block join wins until
    * the length spread is wide — reintroduce the bucket join only
    * with a measured length histogram in hand.
    */
  def blockedEditDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val t = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
      blockKey.as("__blk"))
    val a = t.select(col("__id").as("id_a"), col("__t").as("__ta"),
      col("__blk"))
    val b = t.select(col("__id").as("id_b"), col("__t").as("__tb"),
      col("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("__ta"), col("__tb"), maxDist))
      .filter(col("dist") >= 0) // banded form returns -1 past the bound
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
