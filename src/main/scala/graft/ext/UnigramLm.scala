package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the OTHER production tokenizer
  * family (Kudo 2018, arXiv:1804.10959; SentencePiece's default, used
  * by T5/ALBERT/XLNet/LLaMA-SP), complementing [[Bpe]]: where BPE
  * greedily grows a vocabulary bottom-up, unigram starts from a large
  * seed of candidate substrings and PRUNES, fitting piece
  * probabilities by EM over all segmentations and segmenting by
  * Viterbi at inference.
  *
  * Distributed shape (the [[Bpe]] contract): ONE corpus-order pass
  * builds the word-frequency table; everything after runs on DISTINCT
  * words weighted by frequency — vocabulary-sized work per EM round
  * regardless of corpus scale. Each round is one scan of the word
  * table (per-word forward-backward, O(len·maxPieceLen) map lookups)
  * feeding one piece-keyed hash aggregate; the collected result is
  * vocab-bounded (the trained-model contract: the model rides back in
  * as one driver-bounded value).
  *
  * Determinism: expected counts and log-likelihoods aggregate as
  * FIXED-POINT micro-unit longs (round(x·1e6)) — long addition
  * commutes, so training is bit-reproducible across partitionings
  * (the ConnectedComponents integer-fixed-point rule; a double sum
  * would leak shuffle order into low bits). EM's monotone-likelihood
  * law therefore holds up to the 1e-6 quantization, which is what the
  * q123 gate allows for.
  *
  * E-step per word (standard forward-backward over the segmentation
  * lattice): alpha(i) = logsumexp over pieces w[j..i) of
  * alpha(j)+logp; beta symmetric; the expected count of piece (j,i)
  * is exp(alpha(j)+logp+beta(i)-alpha(n)). M-step renormalizes.
  * Pruning keeps every single character (closure: any word segments)
  * plus the highest-expected-count multi-char pieces.
  */
object UnigramLm {

  /** One vocabulary entry of a trained model. */
  final case class Piece(piece: String, logp: Double)

  /** Training artifact: final vocabulary + the per-round corpus
    * log-likelihood trace (micro-unit fixed point, monotone up to
    * quantization).
    */
  final case class Trained(pieces: Seq[Piece], loglikTrace: Seq[Double])

  private val MICRO = 1e6

  /** Word-frequency table under [[Bpe.wordFreq]]'s pre-tokenization —
    * shared with BPE so the two tokenizer families train from the
    * same corpus statistics.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    Bpe.wordFreq(docs, textCol)

  /** Candidate seed: every substring of length ≤ `maxPieceLen`
    * weighted by word frequency; all single characters plus the top
    * `seedSize` multi-char candidates by weight. One shuffle
    * (substring hash agg) + a bounded top-k collect.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
      seedSize: Int): Seq[(String, Long)] = {
    val subs = words.select(explode(expr(
      s"""flatten(transform(sequence(1, length(word)),
         |  i -> transform(sequence(i, least(length(word), i + $maxPieceLen - 1)),
         |         j -> substring(word, i, j - i + 1))))""".stripMargin))
        .as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("w"))
    val chars = subs.filter(length(col("piece")) === 1)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("w").desc, col("piece"))
      .limit(seedSize)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    (chars ++ multi).sortBy(_._1).toSeq
  }

  /** Forward-backward expected counts + log-likelihood for one word.
    * Returns (piece → expected occurrences, log P(word)). Characters
    * absent from the model contribute via `unkLogp` (they only arise
    * at inference — training seeds every corpus character).
    */
  private[ext] def expectations(word: String, logp: mutable.Map[String, Double],
      maxPieceLen: Int, unkLogp: Double): (mutable.Map[String, Double], Double) = {
    val n = word.length
    val NEG = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NEG) b else if (b == NEG) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-math.abs(a - b))) }
    def pieceLogp(j: Int, i: Int): Double = {
      val s = word.substring(j, i)
      logp.getOrElse(s, if (i - j == 1) unkLogp else NEG)
    }
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val lp = pieceLogp(j, i)
        if (lp != NEG && alpha(j) != NEG) alpha(i) = lse(alpha(i), alpha(j) + lp)
        j += 1
      }
      i += 1
    }
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var j = math.min(n, i + maxPieceLen)
      while (j > i) {
        val lp = pieceLogp(i, j)
        if (lp != NEG && beta(j) != NEG) beta(i) = lse(beta(i), lp + beta(j))
        j -= 1
      }
      i -= 1
    }
    val z = alpha(n)
    val e = mutable.Map.empty[String, Double]
    if (z != NEG) {
      i = 0
      while (i < n) {
        var j = i + 1
        val jMax = math.min(n, i + maxPieceLen)
        while (j <= jMax) {
          val s = word.substring(i, j)
          val lp = logp.getOrElse(s, if (j - i == 1) unkLogp else NEG)
          if (lp != NEG && alpha(i) != NEG && beta(j) != NEG) {
            val p = math.exp(alpha(i) + lp + beta(j) - z)
            if (p > 0) e.update(s, e.getOrElse(s, 0.0) + p)
          }
          j += 1
        }
        i += 1
      }
    }
    (e, z)
  }

  /** One distributed EM round: scan the word table, emit per-piece
    * expected counts (micro-unit longs, ×freq), hash-aggregate, and
    * renormalize on the driver (vocab-bounded collect). Returns the
    * new model and the corpus log-likelihood of the OLD model.
    */
  private def emRound(words: DataFrame, model: Map[String, Double],
      maxPieceLen: Int): (Map[String, Double], Double) = {
    val spark = words.sparkSession
    import spark.implicits._
    val modelLocal = model // serialized with the task closure (vocab-sized)
    val agg = words.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val m = mutable.Map(modelLocal.toSeq: _*)
        it.flatMap { case (word, freq) =>
          val (e, z) = expectations(word, m, maxPieceLen, -1e9)
          val ll =
            if (z == Double.NegativeInfinity) 0L
            else math.rint(z * freq * MICRO).toLong
          e.iterator.map { case (p, c) =>
            (p, math.rint(c * freq * MICRO).toLong, 0L)
          } ++ Iterator(("", 0L, ll))
        }
      }
      .toDF("piece", "micros", "llMicros")
      .groupBy("piece")
      .agg(sum(col("micros")).as("micros"), sum(col("llMicros")).as("ll"))
      .collect()
    val loglik = agg.map(_.getLong(2)).sum / MICRO
    val counts = agg.collect {
      case r if r.getString(0).nonEmpty && r.getLong(1) > 0 =>
        r.getString(0) -> r.getLong(1)
    }
    // keep every single char alive (floor 1 micro) so coverage survives
    val countMap = counts.toMap
    val floored = model.keysIterator.filter(_.length == 1)
      .map(c => c -> math.max(1L, countMap.getOrElse(c, 1L))).toMap
    val merged = (countMap.filter(_._1.length > 1) ++ floored).toSeq.sortBy(_._1)
    val total = merged.map(_._2).sum.toDouble
    (merged.map { case (p, c) => p -> math.log(c / total) }.toMap, loglik)
  }

  /** Full training loop: seed → `emIters` EM rounds → prune to
    * `vocabSize` (all chars + top multi-char by final expected mass,
    * approximated by probability) → `postPruneIters` more EM rounds.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 2000, emIters: Int = 3,
      postPruneIters: Int = 2): Trained = {
    val words = wordFreq(docs, textCol).persist()
    try {
      val seed = seedVocab(words, maxPieceLen, seedSize)
      val total = seed.map(_._2).sum.toDouble
      var model = seed.map { case (p, w) => p -> math.log(w / total) }.toMap
      val trace = mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to emIters) {
        val (m, ll) = emRound(words, model, maxPieceLen)
        model = m
        trace += ll
      }
      // prune: keep chars + highest-probability multi-char pieces
      val chars = model.filter(_._1.length == 1)
      val keep = model.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, lp) => (-lp, p) }
        .take(math.max(0, vocabSize - chars.size))
      model = (chars ++ keep).toMap
      for (_ <- 1 to postPruneIters) {
        val (m, ll) = emRound(words, model, maxPieceLen)
        model = m
        trace += ll
      }
      // final likelihood under the final model (one more E-pass stat)
      val (_, llFinal) = emRound(words, model, maxPieceLen)
      trace += llFinal
      Trained(model.toSeq.sortBy(_._1).map { case (p, lp) => Piece(p, lp) },
        trace.toSeq)
    } finally { words.unpersist(); () }
  }

  /** Deterministic Viterbi segmentation: max log-prob; exact ties
    * prefer the LONGER piece (fewer, larger pieces — SentencePiece's
    * observable behavior), then lexicographic. Unknown characters
    * segment as themselves at `unkLogp`.
    */
  def viterbi(word: String, logp: Map[String, Double],
      maxPieceLen: Int, unkLogp: Double = -1e9): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val NEG = Double.NegativeInfinity
    val best = Array.fill(n + 1)(NEG); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val s = word.substring(j, i)
        val lp = logp.getOrElse(s, if (i - j == 1) unkLogp else NEG)
        if (lp != NEG && best(j) != NEG) {
          val cand = best(j) + lp
          val accept = cand > best(i) ||
            (cand == best(i) && back(i) >= 0 && {
              val curLen = i - back(i)
              val newLen = i - j
              newLen > curLen ||
                (newLen == curLen && s < word.substring(back(i), i))
            })
          if (accept) { best(i) = cand; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    if (back(n) < 0) return Seq(word) // unsegmentable (cannot happen with char coverage)
    val out = mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) { out += word.substring(back(pos), pos); pos = back(pos) }
    out.reverse.toSeq
  }

  /** Tokenize the distinct-word table: `(word, freq, pieces)`. */
  def tokenizeWords(words: DataFrame, model: Seq[Piece],
      maxPieceLen: Int = 8): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val m = model.map(p => p.piece -> p.logp).toMap
    words.select(col("word"), col("freq")).as[(String, Long)]
      .map { case (w, f) => (w, f, viterbi(w, m, maxPieceLen)) }
      .toDF("word", "freq", "pieces")
  }

  /** q123's invariant frame — violations of the trained-tokenizer
    * contract, empty when healthy:
    *   - `roundtrip`: concat(pieces) != word for some word;
    *   - `unknown_piece`: a produced piece outside the vocabulary;
    *   - `vocab_size`: vocabulary exceeds the requested budget;
    *   - `em_decreased`: a round's corpus log-likelihood fell by more
    *     than the fixed-point tolerance (EM's monotone law).
    */
  def violations(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 2000, emIters: Int = 3,
      postPruneIters: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val trained = train(docs, textCol, vocabSize, maxPieceLen, seedSize,
      emIters, postPruneIters)
    val words = wordFreq(docs, textCol)
    val toks = tokenizeWords(words, trained.pieces, maxPieceLen)
    val vocab = trained.pieces.map(_.piece).toSet
    val roundtrip = toks
      .filter(concat_ws("", col("pieces")) =!= col("word"))
      .select(lit("roundtrip").as("kind"), col("word").as("detail"))
    val unknown = toks.select(col("word"), explode(col("pieces")).as("p"))
      .filter(!col("p").isInCollection(vocab))
      .select(lit("unknown_piece").as("kind"), col("p").as("detail"))
    // prune keeps all single chars even past the budget — the documented
    // closure floor — so the size law is vs max(budget, #chars)
    val nChars = trained.pieces.count(_.piece.length == 1)
    val sizeViol =
      if (trained.pieces.size <= math.max(vocabSize, nChars)) Seq.empty[(String, String)]
      else Seq(("vocab_size", trained.pieces.size.toString))
    // within-phase EM monotonicity (the likelihood may legitimately drop
    // ONCE at the prune boundary — pieces were removed); tolerance covers
    // the 1e-6 fixed-point quantization
    val phases = Seq(trained.loglikTrace.take(emIters),
      trained.loglikTrace.drop(emIters))
    val emViol = phases.flatMap { tr =>
      tr.sliding(2).collect {
        case Seq(a, b) if b < a - 1e-3 => ("em_decreased", s"$a -> $b")
      }
    }
    roundtrip.unionByName(unknown)
      .unionByName((sizeViol ++ emViol).toDF("kind", "detail"))
  }
}
