package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{MinHashDedup, Multimodal, NGramJaccard, SimHash, SimilaritySearch}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Extension query surface: the LLM-data-pipeline operators (builder
  * brief) — text analysis, fingerprint dedup, embedding similarity —
  * each oracle-checked against DuckDB where SQL can express it.
  */
object ExtQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Driver-local scratch dir for queries that exercise a write→read
    * path (txlog, parquet/orc/avro footers). Registered for recursive
    * delete at JVM exit so repeated bench/correctness runs don't leak
    * files on the driver's disk.
    */
  private val scratchPaths =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // ONE shutdown hook draining the queue — per-call hooks would pin a
  // Thread per query execution for the JVM's lifetime
  private lazy val scratchHookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      var p = scratchPaths.poll()
      while (p != null) { rm(p.toFile); p = scratchPaths.poll() }
    }))

  private[graft] def scratchDir(prefix: String): String = {
    scratchHookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    scratchPaths.add(p)
    p.toString
  }

  val queries: Map[String, Q] = Map(
    // ── image-header metadata decode: REAL container-format parsing
    // (PNG IHDR with CRC validation, JPEG SOF marker walk), no native
    // codec. Payloads are header-only fixtures built per doc_id with
    // arithmetic dims, so the oracle pins parser∘encoder = identity
    // over both formats: a byte-offset or endianness slip in EITHER
    // direction breaks the hash. (Fills the q06 slot retired in round 1
    // when the relational surface renumbered.)
    "q06_image_headers" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 640 + 16).toInt
          val h = (id % 480 + 16).toInt
          val (payload, fmt) =
            if (id % 2 == 0)
              (graft.functions.ImageHeaders.pngHeaderBytes(w, h), "image/png")
            else
              (graft.functions.ImageHeaders.jpegHeaderBytes(w, h), "image/jpeg")
          Multimodal.MediaRow(id, payload, fmt, source)
        }
      Multimodal.imageMeta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("format_detected").as("fmt"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
    },

    // ── audio-header metadata decode, the q06 pattern for WAV/RIFF:
    // header-only PCM fixtures with arithmetic (channels, rate, frames)
    // per doc_id; the oracle pins parser∘encoder = identity — chunk
    // walk, little-endian fields, blockAlign frame math all verified.
    "q80_audio_headers" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val ch = (id % 2 + 1).toInt
          val rate = (8000 + (id % 5) * 8000).toInt
          val frames = id % 1000 + 1
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavHeaderBytes(ch, rate, 16, frames),
            "audio/wav", source)
        }
      Multimodal.audioMeta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_frames").as("n_frames"))
    },

    // ── token counting (whitespace + BPE-ish subword proxy).
    "q17_token_stats" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.subwordCount(col("text")).as("n_subwords"),
        round(T.avgTokenLen(col("text")), 6).as("avg_token_len"))
    },

    // ── quality scoring (length/punct/stopword ratios).
    "q18_quality_score" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(T.punctRatio(col("text")), 6).as("punct_ratio"),
        round(T.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        T.qualityScore(col("text")).as("quality"))
    },

    // ── language ID (marker-word voting + CJK codepoint check).
    "q19_lang_id" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.langId(col("text")).as("lang_pred"))
    },

    // ── exact dedup via content fingerprint: canonical doc per fingerprint
    // group (min doc_id), group size. Hash-groupBy — one shuffle on the
    // 128-bit key; at 100 TB this is the standard exact-dedup pass.
    "q20_dedup_fingerprint" -> { (s, dir) =>
      graft.core.Partitioning.forCompute(Tables.documents(s, dir))
        .select(col("doc_id"), T.fingerprintMd5(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_dupes"))
    },

    // ── brute-force cosine top-k: 10 query vectors × all candidates,
    // exact top-5 by cosine, via SimilaritySearch.bruteForceTopK (norms
    // computed once per row, codegen'd dot product — not per-pair HOF
    // cosine). The baseline for ANN; the scale paths are q27 (LSH) and
    // q35 (IVF).
    "q21_cosine_topk" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      SimilaritySearch.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 10), k = 5)
    },

    // ── hard-negative mining (contrastive-training data prep): per
    // query the top-5 by cosine among candidates strictly below the
    // 0.8 near-dup ceiling — closest non-duplicates, the negatives a
    // retrieval trainer actually wants. Exact leg on the gate; the
    // scale path feeds lshTopK/ivfTopK candidates through the same
    // filter+rank.
    "q91_hard_negatives" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      SimilaritySearch.hardNegatives(
        emb, emb.filter(col("vec_id") < 10), k = 5, maxCos = 0.8)
    },

    // ── CCNet-style line-level boilerplate removal: lines recurring
    // across ≥ 2 distinct docs are dropped from every doc, order
    // preserved, blank lines structural. The corpus has no newlines,
    // so the query first MAKES lines both engines can replay — each
    // doc's text split into non-overlapping 4-word windows (341 such
    // lines recur cross-doc at sf0.01, max df 10). The cleaned text
    // itself rides under the hash, so a slip in df counting, blank
    // handling, within-doc-repeat semantics, or reassembly order
    // breaks the gate.
    "q92_line_dedup" -> { (s, dir) =>
      val words = split(col("text"), " ")
      val liney = Tables.documents(s, dir).select(col("doc_id"),
        array_join(
          transform(
            sequence(lit(0), floor((size(words) - 1) / lit(4)).cast("int")),
            i => array_join(slice(words, i * 4 + 1, lit(4)), " ")),
          "\n").as("text"))
      graft.ext.LineDedup.removeDuplicatedLines(
        liney, "doc_id", "text", minDf = 2)
    },

    // ── perceptual image hash (dHash): q81's synthetic PNG rasters
    // through the REAL decode, then the 9×8 luma grid's horizontal
    // gradient-sign bits. Integer-exact throughout, so the oracle
    // replays pixel formula → truncating resize indices → Rec.601
    // luma → bit pack from pure SQL arithmetic; the 64-bit hash rides
    // as two unsigned 32-bit halves (a BIGINT can't carry bit 63 as a
    // sum term portably). Corpus-scale near-dup pairing over these
    // hashes reuses the SimHash pigeonhole chunk join (spec-pinned).
    "q93_image_dhash" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.imageDHash(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"))
    },

    // ── end-to-end image dedup closure: the q93 rasters through REAL
    // decode → dHash → pigeonhole Hamming pairs (≤2) → connected
    // components → canonical label per near-dup cluster. The fixture
    // family makes this semantically sharp: the raster formula's
    // horizontal gradients are doc_id-INDEPENDENT for a fixed (w,h)
    // class, i.e. same-dimension images are brightness-shifted copies
    // — exactly what dHash exists to identify (422 of 500 docs fall
    // into 21 clusters at sf0.01). Identical hashes collapse to a
    // representative BEFORE the Hamming join (exact-dup cliques are
    // the corpus mass; pairs over distinct VALUES, not images —
    // equivalence to the naive pairs∘closure spec-pinned). Oracle
    // replays hash arithmetic, brute-force Hamming on the 32-bit
    // halves (bit_count∘xor — no 64-bit reconstruction, bit 63 won't
    // ride a BIGINT), and a recursive-CTE closure over the FULL pair
    // graph, so the collapse must be invisible in the answer.
    "q96_image_dedup_closure" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.nearDuplicateImageComponents(media, maxDist = 2)
    },

    // ── short-time frame energy + zero-crossing rate (the VAD/
    // silence-trim front end of an ASR pipeline): q82's synthetic WAVs
    // through the REAL decode, then 16-sample frames fold to Σ|s|, Σs²,
    // sign-flip count, and a mean-|s| silence flag — all integer, so
    // the oracle replays decode→frame→fold from the sample formula
    // (per-frame rows, tail remainder dropped, frame-boundary pairs
    // counted in neither frame — each a distinct way to break the hash).
    "q94_audio_frame_energy" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, 16000, samples),
            "audio/wav", source)
        }
      Multimodal.frameEnergy(media, frameSize = 16, silenceMeanAbs = 8192)
        .toDF()
        .select(col("media_id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("sum_abs"), col("sum_squares"),
          col("n_zero_cross").cast("long").as("n_zero_cross"),
          col("is_silence"))
    },

    // ── IVF+ADC composed index (FAISS IVFPQ architecture): coarse
    // cells restrict the scan to ~nProbe/nCells of the corpus, PQ
    // codes make each candidate cost m lookups — the full
    // billion-scale ANN stack. Invariant form (q27/q35/q95 family):
    // rows only if top-5 recall vs the exact leg drops under 0.25
    // (measured 0.48 at sf0.01 / 0.38 at sf0.1 with nProbe=6 at the
    // gate's iters=3 — unlike q95, three Lloyd rounds hold recall
    // here (0.38–0.48 vs 0.42–0.44 at five) at roughly half the
    // training cost, so the gate takes the cheaper knob).
    "q100_ann_ivfadc_recall_floor" -> { (s, dir) =>
      import graft.ext.ProductQuantization
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val model = ProductQuantization.train(emb, dim = 64, iters = 3)
      val approx = ProductQuantization.ivfAdcTopK(emb, q, topK = 5, model)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.25)
        .select(lit("ivfadc").as("method"), round(col("recall"), 6).as("recall"))
    },

    // ── fasttext-style quality classifier (Joulin et al. 2016 — the
    // CCNet/GPT-3-pipeline filter architecture): hashed mean-pooled
    // linear model, distributed full-batch logistic GD. The training
    // label is a relative-frequency rule (rel freq of 'data' ≥ 3%),
    // which mean-pooling puts INSIDE the hypothesis class — so the
    // held-out metric isolates trainer correctness, not label noise.
    // The gate metric is ranking AUC (rank-sum identity over the
    // house two-phase global row number), because ranking IS the
    // production filter contract (CCNet keeps top-X% by score);
    // 0.5-threshold accuracy would measure the optimizer's norm
    // asymptote instead. Invariant form (q35 family): rows only if
    // AUC on the doc_id≡4 (mod 5) held-out fold drops under 0.80
    // (chance 0.5; measured 0.94 at sf0.01, 0.97 at sf0.1).
    "q101_quality_classifier_floor" -> { (s, dir) =>
      import graft.ext.HashedClassifier
      val toks = split(lower(col("text")), "\\s+")
      val labeled = Tables.documents(s, dir).select(
        col("doc_id"), col("text"),
        (size(filter(toks, t => t === "data")) / size(toks) >= 0.03)
          .cast("double").as("y"))
      val train = labeled.filter(pmod(col("doc_id"), lit(5)) < 4)
      val heldOut = labeled.filter(pmod(col("doc_id"), lit(5)) === 4)
      val model = HashedClassifier.fit(train, "text", "y",
        dim = 1 << 15, iters = 15)
      val scored = HashedClassifier.predict(heldOut, "text", model)
      val auc = HashedClassifier.auc(scored, "y", "prob", Seq("doc_id"))
      s.range(1)
        .select(lit("fasttext_lr").as("method"),
          round(lit(auc), 6).as("auc"))
        .filter(lit(auc) < 0.80)
    },

    // ── classic residual IVFADC (Jégou et al. §IV — what FAISS'
    // IVFPQ actually stores): PQ trained on v − c_cell, query tables
    // shifted per probed cell WITH the ‖q−c_cell‖² base term (rank
    // comparability across cells — see scoreProbes). Same invariant
    // form as q100; floor 0.25 (measured 0.44 at sf0.01 / 0.40 at
    // sf0.1 with nProbe=6, pqIters=3 — 3 Lloyd rounds hold the same
    // recall as 5 here at ~60% of the gate's training cost).
    "q103_ann_residual_recall_floor" -> { (s, dir) =>
      import graft.ext.ProductQuantization
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val approx = ProductQuantization.ivfAdcResidualTopK(emb, q, topK = 5,
          pqIters = 3)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.25)
        .select(lit("ivfadc_residual").as("method"),
          round(col("recall"), 6).as("recall"))
    },

    // ── two-stage ANN: IVFADC candidates (q103's path and probe
    // budget exactly) → fetch original vectors for the top-50 → exact
    // cosine re-rank to top-5. The production "rescoring" tier: the
    // compressed scan decides WHO gets exact treatment, not the final
    // order. Invariant form; floor 0.60 vs q103's 0.25 (measured:
    // rerank 0.72 at sf0.01 / 0.76 at sf0.1 vs ADC-ranked 0.44 /
    // 0.40 — same nProbe=6; pqIters=2 holds the identical recall as
    // 3 at ~2/3 the gate's training cost, A/B'd across all three SFs).
    "q114_ann_rerank_recall_floor" -> { (s, dir) =>
      import graft.ext.ProductQuantization
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val approx = ProductQuantization.ivfAdcRerankTopK(emb, q, topK = 5,
          rerankFactor = 10, pqIters = 2)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.60)
        .select(lit("ivfadc_rerank").as("method"),
          round(col("recall"), 6).as("recall"))
    },

    // ── incremental image dedup (the multimodal member of the q50/q54
    // incremental family): the 10% batch (doc_id ≡ 0 mod 10) arrives
    // as raw payloads, the corpus as its stored 8-byte dHash index;
    // pairs with ≥1 batch side via batch×corpus + batch×batch chunk
    // joins — corpus×corpus never enumerated. EXACT oracle: brute
    // Hamming over the formula hashes with the ≥1-batch-side predicate.
    "q99_incremental_image_dedup" -> { (s, dir) =>
      import s.implicits._
      val all = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      val batch = all.filter(r => r.media_id % 10 == 0)
      val corpusIndex = Multimodal.imageDHash(
          all.filter(r => r.media_id % 10 != 0)).toDF()
        .filter(col("dhash").isNotNull)
        .select(col("media_id"), col("dhash"))
      Multimodal.incrementalNearDuplicateImages(batch, corpusIndex, maxDist = 2)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming"))
    },

    // ── schema-generic data profile (exact mode — the oracle gate;
    // approx_count_distinct is the one-scan 100 TB default, q38/q46's
    // documented trade): documents plus a derived genuinely-nullable
    // column, one row per column with row/null/distinct counts.
    "q98_profile" -> { (s, dir) =>
      graft.operators.Profile.profile(
        Tables.documents(s, dir)
          .withColumn("lang_non_en", nullif(col("lang"), lit("en"))),
        exact = true)
    },

    // ── Unicode NFC normalization (native codegen Expression —
    // Spark has no built-in): per doc the text gets decomposed
    // sequences appended (e+◌́, u+◌̈, A+◌̊, and s+◌̣+◌̇ which composes
    // TWICE through canonical ordering), then normalizes. The oracle
    // is DuckDB's independent utf8proc-based nfc_normalize — two
    // unrelated Unicode implementations must produce byte-identical
    // NFC, with code-point lengths before/after on the hash too.
    "q97_nfc_normalize" -> { (s, dir) =>
      val raw = concat(col("text"),
        lit(" Cafe\u0301 blu\u0308 A\u030A ss\u0323\u0307"))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          T.nfcNormalize(col("raw")).as("norm_text"),
          length(col("raw")).cast("long").as("len_before"),
          length(T.nfcNormalize(col("raw"))).cast("long").as("len_after"))
    },

    // ── product-quantization ANN (Jégou et al. 2011; the 32×-
    // compressed scale path FAISS calls ADC): train per-subspace
    // codebooks, encode the corpus to m codes, search via per-query
    // distance tables — candidates never touch the original vectors.
    // Same invariant form as the IVF/LSH gates (q27/q35): the query
    // emits rows ONLY if ADC top-5 recall against the exact brute-
    // force leg drops under the floor, so the oracle is the empty set.
    // Measured recall at sf0.01 rides well above the 0.30 floor.
    "q95_ann_pq_recall_floor" -> { (s, dir) =>
      import graft.ext.ProductQuantization
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val model = ProductQuantization.train(emb, dim = 64)
      val approx = ProductQuantization.adcTopK(
          ProductQuantization.encode(emb, model), q, topK = 5, model)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.30)
        .select(lit("pq").as("method"), round(col("recall"), 6).as("recall"))
    },

    // ── embedding norms + per-label aggregate (Σ in index order, double).
    "q22_embedding_norms" -> { (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), V.norm(col("embedding")).as("nrm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("nrm")), 6).as("avg_norm"))
    },

    // ── multimodal plumbing: opaque binary payload column + typed
    // metadata. Payload here is the utf-8 text bytes standing in for an
    // image/audio blob; decode itself is stubbed in graft.ext.Multimodal.
    "q23_multimodal_meta" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          col("source"))
        .select(
          col("doc_id"),
          length(col("payload")).as("payload_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("source"))
    },

    // ── exact trigram-Jaccard near-dup pairs via prefix-filtered
    // inverted-index join (oracle-checked; finds the planted
    // near-duplicates). Trigrams, not bigrams: the fixture vocabulary is
    // ~30 words, so the bigram inverted index is pathologically dense
    // (every doc pair collides) while trigrams are sparse — same 25
    // result pairs, ~30× less join volume.
    "q24_ngram_jaccard_dups" -> { (s, dir) =>
      NGramJaccard.allPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5)
    },

    // ── MinHash+LSH near-dups (shingle→minhash→band→bucket-join→verify).
    // Same answer set as q24 w.h.p.; rows-only check (xxhash64 has no
    // DuckDB twin) — the spec asserts equality with the exact pipeline.
    "q25_minhash_dups" -> { (s, dir) =>
      MinHashDedup.nearDuplicates(Tables.documents(s, dir), "doc_id", "text",
        threshold = 0.5, n = 3)
    },

    // ── SimHash blocked-vs-brute invariant, driver-checked (was a
    // rows-only pair dump): chunk blocking at maxDist=8 (9 chunks —
    // a DIFFERENT chunking than q44's 13, so both pigeonhole widths are
    // driver-pinned) must equal exhaustive all-pairs Hamming ≤ 8.
    // Symmetric difference must be EMPTY — zero-row oracle. The raw
    // pair surface stays exercised by SimHashSpec and q44.
    "q26_simhash_blocked_vs_brute" -> { (s, dir) =>
      val sigs = SimHash.signatures(Tables.documents(s, dir),
        "doc_id", "text", n = 3).cache()
      val blocked = SimHash.nearPairsFromSignatures(sigs, maxDist = 8)
      val brute = graft.operators.BlockJoin.allPairs(sigs, "id")
        .select(
          least(col("id_a"), col("id_b")).as("doc_a"),
          greatest(col("id_a"), col("id_b")).as("doc_b"),
          expr("bit_count(simhash_a ^ simhash_b)").cast("int").as("hamming"))
        .filter(col("hamming") <= 8)
      blocked.exceptAll(brute).unionAll(brute.exceptAll(blocked))
    },

    // ── ANN LSH recall-floor invariant, driver-checked (was a rows-only
    // top-k dump): overall recall of lshTopK vs exact brute-force top-k
    // must clear a pinned floor. Measured 0.20-0.28 across sf0.001/0.01/
    // 0.1 (tools/RecallCheck; chance ≈ k/N ≈ 1-2%); floor 0.10 = real
    // margin while still 10× chance. Emits violation rows — EMPTY
    // expected, zero-row oracle. Complements q45 (approx can't BEAT
    // exact); this bounds the other side (approx can't collapse).
    "q27_ann_lsh_recall_floor" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      // cached: feeds both the semi-join and the denominator count
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val approx = SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.10)
        .select(lit("lsh").as("method"), round(col("recall"), 6).as("recall"))
    },

    // ── multimodal decode invariant, driver-checked (was rows-only):
    // the mapPartitions batch contract must be deterministic — two
    // extraction runs over DIFFERENT partitionings produce identical
    // feature vectors — and the Spark-side plumbing (payload bytes
    // through toMedia) is oracled against octet_length in SQL.
    // All-true frame. The second run is deliberately repartitioned so
    // its canonical plan differs from the first: with byte-identical
    // plans, exchange/subplan reuse would evaluate the extraction ONCE
    // and compare it with itself, making the invariant vacuous — the
    // distinct partitioning both defeats reuse and strengthens the
    // claim to partition-layout independence.
    "q28_media_features" -> { (s, dir) =>
      def run(docs: org.apache.spark.sql.DataFrame) = Multimodal
        .extractFeatures(Multimodal.toMedia(docs), dim = 8).toDF()
      val docs = Tables.documents(s, dir)
      val a = run(docs)
        .select(col("media_id"), col("n_bytes"), col("features").as("fa"))
      val b = run(docs.repartition(7, col("doc_id")))
        .select(col("media_id"), col("features").as("fb"))
      a.join(b, "media_id")
        .select(col("media_id"), col("n_bytes"),
          (col("fa") === col("fb")).as("deterministic"))
    },

    // ── embedding-cosine near-dup pairs (exact; oracle via unnest
    // double math in DuckDB).
    "q40_embedding_neardup" -> { (s, dir) =>
      SimilaritySearch.cosineNearDuplicates(
        Tables.embeddings(s, dir), threshold = 0.4)
    },

    // ── HLL++ sketch bound on the events stream table, driver-checked
    // (was a rows-only sketch dump; q46 pins the same bound shape on
    // lineitem): per event type, approx distinct users within 5% of
    // exact (rsd 0.02). All-true oracle — and a second table's worth of
    // sketch coverage.
    "q38_approx_distinct" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("au"),
          countDistinct(col("user_id")).as("eu"))
        .select(col("event_type"),
          (abs(col("au") - col("eu")) <= col("eu") * 0.05).as("users_within_5pct"))
    },

    // ── ANN IVF recall-floor invariant, driver-checked (was rows-only;
    // see q27 for the pattern). Measured 0.58 across SFs
    // (tools/RecallCheck) at nProbe/nCells = 1/4 of the corpus scanned;
    // floor 0.30 — EMPTY expected, zero-row oracle.
    "q35_ann_ivf_recall_floor" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      // cached: feeds both the semi-join and the denominator count
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val approx = SimilaritySearch.ivfTopK(emb, q, k = 5, dim = 64)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.30)
        .select(lit("ivf").as("method"), round(col("recall"), 6).as("recall"))
    },

    // ── per-label embedding centroids via the typed Aggregator (partial
    // aggregation, O(dim) state/group) — exploded to scalars for the
    // oracle compare.
    "q33_centroids" -> { (s, dir) =>
      graft.ext.Centroids.perGroup(
          Tables.embeddings(s, dir), "label", "embedding", 64)
        .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"), round(col("v"), 6).as("centroid_val"))
    },

    // ── transitive dedup closure: connected components over the exact
    // near-dup pair graph (oracle = recursive CTE). Routed through the
    // auto-dispatcher: hash-min for shallow dedup graphs, falling over
    // to two-phase star contraction on huge edge sets or slow
    // convergence (long chains).
    "q34_dedup_closure" -> { (s, dir) =>
      val pairs = NGramJaccard.allPairs(Tables.documents(s, dir),
        "doc_id", "text", n = 3, threshold = 0.5)
      graft.ext.ConnectedComponents.auto(pairs, "doc_a", "doc_b")
    },

    // ── SimHash soundness+recall invariant, driver-checked: the
    // chunk-blocked near-pair set must equal exhaustive all-pairs
    // Hamming ≤ maxDist (brute force via the exact triangle block join).
    // Blocked ⊆ brute is guaranteed (the Hamming predicate evaluates in
    // the join); brute ⊆ blocked is what chunk blocking promises. The
    // symmetric difference must be EMPTY — oracled as a zero-row result.
    "q44_simhash_exhaustive" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // one signature pass feeds both the blocked and the brute side
      val sigs = SimHash.signatures(docs, "doc_id", "text", n = 3).cache()
      val blocked = SimHash.nearPairsFromSignatures(sigs, maxDist = 12)
      val brute = graft.operators.BlockJoin.allPairs(sigs, "id")
        .select(
          least(col("id_a"), col("id_b")).as("doc_a"),
          greatest(col("id_a"), col("id_b")).as("doc_b"),
          expr("bit_count(simhash_a ^ simhash_b)").cast("int").as("hamming"))
        .filter(col("hamming") <= 12)
      blocked.exceptAll(brute).unionAll(brute.exceptAll(blocked))
    },

    // ── ANN optimality invariant, driver-checked: an approximate top-k
    // result can never BEAT the exact top-k at the same rank (LSH/IVF
    // re-rank candidates by exact cosine, so any such row is a scoring
    // or ranking bug). Must be EMPTY.
    "q45_ann_upper_bound" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("rank"), col("cos_sim").as("exact_cos"))
      val approx = SimilaritySearch.lshTopK(emb, q, k = 5, dim = 64)
        .withColumn("method", lit("lsh"))
        .unionByName(SimilaritySearch.ivfTopK(emb, q, k = 5, dim = 64)
          .withColumn("method", lit("ivf")))
      approx.join(exact, Seq("query_id", "rank"))
        .filter(col("cos_sim") > col("exact_cos") + lit(1e-9))
        .select(col("method"), col("query_id"), col("cand_id"), col("rank"))
    },

    // ── sketch error bound, driver-checked: HLL++ (rsd 0.02) distinct
    // counts vs exact distinct counts, asserted within 5% per group —
    // the oracle states the bound holds (all-true frame).
    "q46_approx_distinct_bound" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("ap"),
          countDistinct(col("l_partkey")).as("ep"),
          approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("asu"),
          countDistinct(col("l_suppkey")).as("es"))
        .select(col("l_returnflag"),
          (abs(col("ap") - col("ep")) <= col("ep") * 0.05).as("parts_within_5pct"),
          (abs(col("asu") - col("es")) <= col("es") * 0.05).as("supps_within_5pct"))
    },

    // ── winnowing document fingerprints (MOSS): k-gram hash window
    // minima, exploded to the inverted-index form — full hash-match
    // oracle (md5 grams reproduce bit-identically in SQL). k=20/w=10
    // chosen for the fixture's 30-word vocabulary (shorter grams are
    // corpus-degenerate the same way bigram shingles were for q24).
    "q48_winnow_fingerprints" -> { (s, dir) =>
      graft.ext.Winnowing.fingerprints(Tables.documents(s, dir),
        "doc_id", "text", k = 20, w = 10)
        .select(col("id").as("doc_id"), col("fp"))
    },

    // ── shared-passage near-dup pairs via winnowing fingerprints: the
    // position-robust dedup family (detects any shared run ≥ w+k−1 =
    // 29 chars × minShared), complementary to set-similarity (q24/q25)
    // and feature-distance (q26/q44). Finds all 25 planted near-dup
    // pairs plus genuine long-quotation pairs below the Jaccard bar.
    "q49_winnow_shared_pairs" -> { (s, dir) =>
      graft.ext.Winnowing.sharedFingerprintPairs(Tables.documents(s, dir),
        "doc_id", "text", k = 20, w = 10, minShared = 4)
    },

    // ── incremental dedup: one batch (doc_id ≡ 0 mod 10) deduped
    // against a pre-built LSH index of the rest of the corpus — the
    // daily-batch-vs-100TB-corpus shape; only pairs touching the batch
    // are examined. Oracled against the exact-Jaccard SQL restricted to
    // batch-touching pairs (same pinned-banding capture basis as q25).
    "q50_incremental_dedup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val newBatch = docs.filter(col("doc_id") % 10 === 0)
      val oldIndex = MinHashDedup.indexFrame(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      MinHashDedup.incrementalNearDuplicates(
        newBatch, oldIndex, "doc_id", "text", threshold = 0.5)
    },

    // ── deterministic stratified sampling: per-source keep fractions
    // from md5-hash variates — reproducible across runs/engines (oracle
    // recomputes the same md5 arithmetic). Binary-exact fractions so
    // double boundaries match the SQL bit-for-bit.
    "q51_stratified_sample" -> { (s, dir) =>
      graft.ext.Sampling.stratifiedSample(Tables.documents(s, dir),
          "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultFraction = 0.125, salt = "s1")
        .select(col("doc_id"), col("source"))
    },

    // ── token-budget mixture: per-source document selection in
    // deterministic hash order until the token budget fills — the
    // "600B web + 300B code" mixture pass, declaratively.
    "q52_token_budget_mixture" -> { (s, dir) =>
      graft.ext.Sampling.tokenBudgetMixture(Tables.documents(s, dir),
          "source", "doc_id", T.tokenCount(col("text")),
          Map("src0" -> 800L, "src1" -> 600L, "src2" -> 400L), salt = "mix")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).as("n_tokens"))
    },

    // ── temperature-scaled mixture (XLM-R rebalance): budgets are
    // COMPUTED as ⌊total·√n_s / Σ√n⌋ from per-source token totals
    // (α=0.5 — sqrt is correctly-rounded cross-engine, pow is not;
    // the normalizer is an ordered fold both engines replay
    // bit-identically), then the q52 md5-ordered trim applies them.
    // EXACT row-set oracle: DuckDB recomputes budgets and trim.
    "q102_temperature_mixture" -> { (s, dir) =>
      graft.ext.Sampling.temperatureMixture(Tables.documents(s, dir),
          "source", "doc_id", T.tokenCount(col("text")),
          totalTokens = 2000L, salt = "temp")
        .select(col("doc_id"), col("source"),
          T.tokenCount(col("text")).as("n_tokens"))
    },

    // ── train/val/test split assignment by hash ranges: a row's split
    // never changes when the corpus grows (random shuffles can't
    // promise that). Binary-exact weights.
    "q53_split_assign" -> { (s, dir) =>
      graft.ext.Sampling.assignSplit(Tables.documents(s, dir), "doc_id",
          Seq(("train", 0.75), ("val", 0.125), ("test", 0.125)), salt = "split")
        .select(col("doc_id"), col("split"))
    },

    // ── incremental embedding near-dup: new batch (vec_id ≡ 0 mod 10)
    // against the corpus via the rectangular fragment-replicate block
    // join + batch-internal triangle join — corpus×corpus never
    // enumerated. Oracled as q40's exact SQL restricted to
    // batch-touching pairs.
    "q54_incremental_embedding_neardup" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      SimilaritySearch.incrementalCosineNearDuplicates(
        emb.filter(col("vec_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 =!= 0),
        threshold = 0.4)
    },

    // ── PII scrubbing: URL/email/phone redaction + per-doc audit count
    // (regex subset chosen to behave identically in Java regex and
    // RE2, so the oracle matches the redacted TEXT bit-for-bit).
    "q55_redact_pii" -> { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        T.redactPii(col("text")).as("redacted"),
        T.piiCount(col("text")).as("n_pii"))
    },

    // ── benchmark decontamination: corpus docs (doc_id ≢ 0 mod 17)
    // sharing winnowing fingerprints with a simulated eval set
    // (doc_id ≡ 0 mod 17) — the test-set-leakage hygiene pass; eval
    // side broadcast, corpus never pairwise. Full SQL oracle (same
    // md5 winnowing construction on both sides).
    "q56_decontaminate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.ext.Contamination.flagged(
        docs.filter(col("doc_id") % 17 =!= 0),
        docs.filter(col("doc_id") % 17 === 0),
        "doc_id", "text", k = 20, w = 10, minShared = 2)
    },

    // ── Gopher/MassiveText repetition signals: fraction of tokens in
    // the most frequent word bigram + fraction of repeated trigram
    // instances, per document — the templated/looping-text filter.
    // Two-level hash agg keyed on (doc, gram); map-side combine
    // collapses exactly the repeats being measured.
    "q57_repetition_stats" -> { (s, dir) =>
      graft.ext.RepetitionStats.stats(Tables.documents(s, dir), "doc_id", "text")
    },

    // ── TF-IDF keyword extraction: top-3 most characteristic terms per
    // doc under reciprocal-df weighting (IEEE-exact, see TfIdf scaladoc
    // for why not ln). tf agg → df re-agg → term-dictionary equi-join +
    // broadcast scalar N → per-doc window top-k.
    "q58_tfidf_topk" -> { (s, dir) =>
      graft.ext.TfIdf.topTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
    },

    // ── corpus-trained bigram LM likelihood per doc (CCNet-style LM
    // quality filtering, dependency-free): add-0.5 smoothing over the
    // corpus vocabulary, mean transition probability as the score.
    // Train + score in one distributed pass; the "model" (bigram stat
    // table) never collects.
    "q59_bigram_lm_score" -> { (s, dir) =>
      graft.ext.NGramLM.scoreDocs(Tables.documents(s, dir), "doc_id", "text")
    },

    // ── SemDeDup invariant, driver-checked (zero-row oracle): k-means
    // cluster-restricted near-dup pairs must be (a) a SUBSET of the
    // exact triangle-join answer — clustering may lose boundary pairs,
    // never fabricate one — and (b) within the recall floor. Floor 0.7
    // is pinned from measurement (SemDedupProbe: recall 0.909/0.949/
    // 0.858 at sf0.001/0.01/0.1 with nCells=16, nAssign=3, extra=0 at
    // every dial); k-means is md5-seeded so per-SF recall is exactly
    // reproducible, not statistical.
    "q60_semdedup_invariant" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // cached: each side feeds the anti-join AND a count
      val sem = graft.ext.SemDedup.pairs(emb, threshold = 0.4,
          nCells = 16, iters = 2, nAssign = 3)
        .select(col("vec_a"), col("vec_b")).cache()
      val brute = SimilaritySearch.cosineNearDuplicates(emb, threshold = 0.4)
        .select(col("vec_a"), col("vec_b")).cache()
      val bogus = sem.join(brute, Seq("vec_a", "vec_b"), "left_anti")
        .select(lit("pair_not_in_exact").as("violation"),
          col("vec_a"), col("vec_b"))
      val lowRecall = sem.agg(count(lit(1)).as("ns"))
        .crossJoin(brute.agg(count(lit(1)).as("nb")))
        .filter(col("ns") < col("nb") * lit(0.7))
        .select(lit("recall_below_floor").as("violation"),
          lit(null).cast("long").as("vec_a"),
          lit(null).cast("long").as("vec_b"))
      bogus.unionByName(lowRecall)
    },

    // ── C4-style heuristic cleaning signals + composite keep decision:
    // pure per-row projections, scan-stage at any scale (q55's shape).
    // The fixture corpus is unpunctuated word salad, so signals over the
    // RAW text would be constant-false and the oracle vacuous; the query
    // decorates the text deterministically by doc_id (~100 docs per
    // variant at sf0.01) so every dialect-sensitive construct —
    // instr/strpos, negative-index substring, the IN list, the keep
    // conjunction — is exercised in BOTH outcomes on both engines.
    "q61_c4_heuristics" -> { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
              concat(col("text"), lit(" Lorem ipsum dolor sit.")))
            .when(col("doc_id") % 5 === 1, concat(col("text"), lit(" { code }")))
            .when(col("doc_id") % 5 === 2,
              concat(col("text"), lit(" A final sentence.")))
            .when(col("doc_id") % 5 === 3, concat(col("text"), lit("!")))
            .otherwise(col("text")).as("t"))
        .select(
          col("doc_id"),
          T.sentenceCount(col("t")).as("n_sentences"),
          T.hasLoremIpsum(col("t")).as("has_lorem"),
          T.hasCurlyBrace(col("t")).as("has_brace"),
          T.endsWithTerminalPunct(col("t")).as("ends_punct"),
          T.c4Keep(col("t")).as("keep"))
    },

    // ── deterministic sequence packing: md5-shuffle order, bucket-
    // sharded running token offsets, pack = ⌊start/seqLen⌋ — the
    // concat-and-chunk step of training-sequence preparation.
    "q62_sequence_pack" -> { (s, dir) =>
      graft.ext.Packing.packSequences(Tables.documents(s, dir), "doc_id",
          T.tokenCount(col("text")), seqLen = 256, nBuckets = 8, salt = "pack")
        .select(col("doc_id"), col("bucket"), col("n_tokens"),
          col("start_offset"), col("pack_idx"))
    },

    // ── heavy-hitter sketch invariant, driver-checked (zero-row
    // oracle): single-pass Misra-Gries (DataFrame.stat.freqItems)
    // GUARANTEES a superset of every term with frequency > support·N —
    // false positives allowed, false negatives never. The violation
    // query emits exact heavy hitters missing from the sketch: must be
    // empty under any partitioning/merge order, which is why the
    // invariant (not the raw sketch output) is the oracled surface.
    // The sketch is the 100 TB path for corpus-boilerplate discovery
    // (the maxDf stopword dials in NGramJaccard/Winnowing): one pass,
    // mergeable state, ≤ 1/support items on the driver.
    "q63_heavy_hitters_superset" -> { (s, dir) =>
      val support = 0.02
      val tok = graft.core.Partitioning.forCompute(Tables.documents(s, dir))
        .select(explode(split(T.normalized(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      // one eager, driver-bounded job at build time (same contract as
      // q60's k-means collects): the sketch is ≤ 1/support items, so it
      // comes back as a literal array — no cache to leak, no join
      val sketch = tok.stat.freqItems(Seq("term"), support)
        .collect().head.getSeq[String](0)
      val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      counts
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("n"))))
        .filter(col("cnt") > col("n") * lit(support)) // exact heavy hitters
        .filter(!array_contains(                      // ...missing from sketch
          array(sketch.map(lit): _*), col("term")))
        .select(col("term"), col("cnt"))
    },

    // ── z-order (Morton) clustering values: the multi-dimensional
    // data-layout key — bit-interleaved range buckets of (l_partkey,
    // l_suppkey), pure integer arithmetic, oracled bit-for-bit. The
    // layout itself (range partition + sort on zval) is exercised by
    // ZOrderSpec's file-clustering proof.
    "q64_zorder_values" -> { (s, dir) =>
      graft.sources.ZOrder.withZValue(
          Tables.lineitem(s, dir), Seq("l_partkey", "l_suppkey"), bits = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("zval"))
    },

    // ── quantile-sketch error bound, driver-checked: approx_percentile
    // (KLL-style, rank error ≤ 1/accuracy = 1e-4) must land between the
    // exact interpolated p49 and p51 values — rank-space error mapped to
    // a value-space bracket via monotonicity.
    "q47_approx_quantile_bound" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
          expr("percentile(l_extendedprice, 0.49)").as("e49"),
          expr("percentile(l_extendedprice, 0.51)").as("e51"))
        .select(col("l_returnflag"),
          (col("ap50") >= col("e49") && col("ap50") <= col("e51"))
            .as("p50_within_1pct"))
    },

    // ── fixed-size token-window chunking with overlap (context-window
    // preparation): 64-token windows every 48 tokens (16-token overlap).
    // Pure scan-stage generator — tokenize, sequence of starts,
    // posexplode + slice; no shuffle. Oracle pins the window algebra
    // (starts, sizes, text reassembly) bit-for-bit.
    "q65_chunk_overlap" -> { (s, dir) =>
      graft.ext.Chunking.chunkDocs(Tables.documents(s, dir),
        "doc_id", "text", chunkTokens = 64, overlap = 16)
    },

    // ── Bloom-membership no-false-negative invariant, driver-checked
    // (zero-row oracle): the scan-stage might_contain probe GUARANTEES
    // a superset of exact membership — every corpus doc whose
    // fingerprint appears in the eval set (doc_id % 50 == 0, which is
    // itself in the corpus, so matches always exist) must be flagged.
    // Violations = exact matches the sketch missed: must be empty under
    // any partitioning/merge order. False-positive excess is bounded by
    // BloomMembershipSpec's measured-FPR test, not here.
    "q66_bloom_no_false_negative" -> { (s, dir) =>
      // cached: feeds the eval count, the sketch build, the exact
      // join, and the probe (same multi-consumer contract as q60)
      val fps = Tables.documents(s, dir)
        .select(col("doc_id"), T.fingerprintMd5(col("text")).as("fp"))
        .cache()
      val evalSet = fps.filter(col("doc_id") % 50 === 0)
      // eager, driver-bounded scalars/sketch (q63's build-time contract)
      val nEval = evalSet.count()
      val bloom = graft.ext.BloomMembership
        .bloomBytes(evalSet, col("fp"), math.max(nEval, 1L)).get
      val flagged = fps
        .filter(graft.ext.BloomMembership.mightContain(bloom, col("fp")))
      fps.join(evalSet.select(col("fp")).distinct(), Seq("fp"), "left_semi")
        .join(flagged.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("fp"))
    },

    // ── weighted (probability-proportional-to-size) sampling: keep each
    // doc with probability min(1, 100·n_chars/Σn_chars), decided by the
    // md5 variate — the "sample by token volume, not doc count" knob.
    // Exact row-SET oracle: the variate and the IEEE ·,< threshold are
    // bit-identical in DuckDB.
    "q67_weighted_sample" -> { (s, dir) =>
      graft.ext.Sampling.weightedSample(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), expectedRows = 100, salt = "wsamp")
    },

    // ── SCD Type 2 history build: per-user runs of event_type collapsed
    // into [valid_from, valid_to) validity intervals. µs-precision
    // longs, NOT ns: DuckDB's parquet reader truncates TIMESTAMP_NS to
    // µs, so ns bounds can't be oracled — the event_id tiebreak makes
    // ordering deterministic at either precision. One shuffle — the
    // change/version windows, the run aggregate, and the interval-
    // close lead all ride the same user_id hash partitioning.
    "q68_scd2_intervals" -> { (s, dir) =>
      graft.operators.ChangeCapture.scd2(
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("event_type")),
        "user_id", Seq("ts_us", "event_id"), "event_type")
    },

    // ── character-diversity quality signals (charset anomaly family):
    // alphabet size, top-char share, Simpson concentration — the
    // entropy-family signal without transcendentals, emitted as
    // fixed-point ×10⁶ longs (round(double,6) is NOT cross-engine
    // portable at exact .5 boundaries; integer DIV is). Two-level
    // (doc, char) hash agg; shuffle volume is docs × alphabet, not
    // corpus characters.
    "q70_char_diversity" -> { (s, dir) =>
      graft.ext.CharStats.charStats(Tables.documents(s, dir),
        "doc_id", "text")
    },

    // ── fixed-iteration PageRank over the customer↔supplier interaction
    // graph (orders⋈lineitem, both directions; node ids disambiguated
    // by parity). PURE INTEGER fixed-point arithmetic — the oracle
    // unrolls the same three rounds and matches bit-for-bit on any
    // engine/partitioning (no FP summation order, no libm).
    "q71_pagerank" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.PageRank.run(edges, "src", "dst", iters = 3)
    },

    // ── exactly-k-per-stratum sample: 20 docs per source in hash-rank
    // order — fixed-size per-group slices where Bernoulli's size
    // jitter won't do. Exact row-SET oracle (same variate + ordering).
    "q72_sample_k_per_group" -> { (s, dir) =>
      graft.ext.Sampling.sampleKPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "source", "doc_id", k = 20, salt = "topk")
    },

    // ── hopping (sliding) window aggregation, batch twin of the
    // overlapping-window stream: 1-hour windows every 30 minutes —
    // each event lands in exactly two windows. µs-integer window
    // starts so the oracle is exact arithmetic.
    "q73_hopping_window" -> { (s, dir) =>
      graft.streaming.EventStreams
        .hoppingAgg(Tables.events(s, dir), "1 hour", "30 minutes")
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("event_type"), col("n_events"), col("sum_value"))
    },

    // ── quality-canonical near-dup dedup, fully oracled: the corpus
    // minus every near-dup-cluster member that is NOT its cluster's
    // best copy (highest qualityScore, ties to lowest id) — the
    // keep-the-best-copy rule CorpusJobs' qualityCanonical mode uses.
    // Ranking is by the ROUNDED quality — safe because q18 pins the
    // per-doc rounded values equal across engines at all SFs.
    "q79_canonical_by_quality" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val pairs = NGramJaccard.allPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5)
      graft.ext.ConnectedComponents.keepBestByComponents(
          docs, "doc_id", T.qualityScore(col("text")), pairs)
        .select(col("doc_id"))
    },

    // ── entity-resolution linkage: p_brand blocking + banded edit-
    // distance verify (unit costs — engine-portable integers). The
    // record-linkage family for short strings, vs the shingle pipeline
    // for documents.
    "q78_entity_match" -> { (s, dir) =>
      graft.ext.EntityResolution.blockedEditDistancePairs(
        Tables.part(s, dir).select(col("p_partkey"), col("p_name"),
          col("p_brand")),
        "p_partkey", "p_name", col("p_brand"), maxDist = 5)
    },

    // ── the EXACT hot-block escape on the oracle gate: PassJoin-style
    // segment blocking must produce the identical pair set as a plain
    // blocked edit-distance join (the oracle recomputes it naively in
    // SQL) — same contract as q78, different candidate geometry, so a
    // pigeonhole/window/scheme slip anywhere breaks the hash.
    // (quarter-subset of part: TPC-H names draw from a ~90-word
    // vocabulary, so aligned-segment collisions make the FULL table a
    // deliberately adversarial ~17 s case at sf0.1 — the subset keeps
    // the whole kernel on the gate at bench-budget cost; the collision
    // behavior itself is spec-pinned on the random hot-block fixture)
    "q83_entity_match_segment" -> { (s, dir) =>
      graft.ext.EntityResolution.segmentBlockedEditDistancePairs(
        Tables.part(s, dir).select(col("p_partkey"), col("p_name"),
          col("p_brand")).filter(col("p_partkey") % 4 === 0),
        "p_partkey", "p_name", col("p_brand"), maxDist = 3)
    },

    // ── robust per-group outlier flagging (Tukey IQR fence): quartiles
    // via percentile (≡ quantile_cont, q36-proven), fence arithmetic
    // pure IEEE on identical doubles — no rounding step. Broadcast
    // 3-row fence join onto the scan.
    "q76_iqr_outliers" -> { (s, dir) =>
      graft.ext.Outliers.iqrFlag(
          Tables.lineitem(s, dir)
            .select(col("l_returnflag"), col("l_extendedprice")),
          "l_extendedprice", Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("is_outlier"), 1)).as("n_outliers"))
    },

    // ── time-series gap filling: per-user daily buckets from first to
    // last event, empty days as explicit zero rows. All-integer bucket
    // math; per-key spine, no global calendar.
    "q77_resample_gaps" -> { (s, dir) =>
      graft.ext.Resample.fillGaps(
        Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us")),
        "user_id", "ts_us", bucketUs = 86400000000L)
    },

    // ── global gapless row numbering by a total order, done scale-
    // right: range partition + per-partition counts + offset broadcast
    // (NOT the single-task partition-less window). Exact oracle.
    "q75_global_row_number" -> { (s, dir) =>
      graft.ext.Ids.globalRowNumber(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        Seq("source", "doc_id"))
    },

    // ── REAL PNG pixel decode: per doc_id a synthetic RGB raster with
    // arithmetic pixel values is encoded to a standards-compliant PNG
    // (zlib IDAT, per-row filters 0-4) and decoded back through the
    // full chunk-walk → inflate → unfilter pipeline; the oracle
    // recomputes the integer luma sum from the pixel formula, so a slip
    // anywhere — filter math, inflate bounds, channel order, CRC —
    // breaks the hash. (The encode side uses every filter type, so all
    // five unfilter arms are on the verified path.)
    "q81_png_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.PngCodec.encode(img),
            "image/png", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL JPEG pixel decode (the lossy sibling of q81, made
    // hash-gateable): per doc_id a DC-only flat-block JPEG — even ids
    // grayscale, odd ids 4:2:0 YCbCr — is entropy-ENCODED (canonical
    // Huffman, byte stuffing, per-block DC prediction) then decoded
    // back through the full marker walk → Huffman → dequant → IDCT →
    // upsample → YCbCr→RGB pipeline. Flat blocks with DC quantum 8
    // survive quantization exactly (F(0,0)=8·(v−128) is divisible, the
    // IDCT has one term), so the oracle replays the per-MCU value
    // formula plus the JFIF color matrix in SQL and the hash gate
    // applies to a lossy format. A slip in Huffman table construction,
    // EXTEND, prediction, dequant, upsample, or the color matrix —
    // either direction — breaks it.
    "q84_jpeg_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val payload =
            if (id % 2 == 0)
              graft.functions.JpegCodec.encodeFlatGray(w, h,
                (bx, by) => ((id + 7 * bx + 13 * by) % 256).toInt)
            else
              graft.functions.JpegCodec.encodeFlatYcc420(w, h, (mx, _) => (
                ((id + 5 * mx) % 256).toInt,
                ((2 * id + 11 * mx) % 256).toInt,
                ((3 * id + 7 * mx) % 256).toInt))
          Multimodal.MediaRow(id, payload, "image/jpeg", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── PROGRESSIVE JPEG pixel decode (q84's sibling for the majority
    // encoding of large web JPEGs): the same flat-block content as q84
    // even-ids, but entropy-coded through the four-scan successive-
    // approximation script (DC first Al=1 → AC EOB-runs → DC refine →
    // AC refine). Flat blocks survive the approximation losslessly
    // (floor(x/2)·2 + (x&1) = x; DC quantum 8), so the SAME arithmetic
    // oracle applies — a slip in scan dispatch, coefficient
    // accumulation, EOB-run bookkeeping, or the point transform breaks
    // the hash in either direction.
    "q113_jpeg_progressive_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val payload = graft.functions.JpegCodec.encodeFlatGrayProgressive(
            w, h, (bx, by) => ((id + 7 * bx + 13 * by) % 256).toInt)
          Multimodal.MediaRow(id, payload, "image/jpeg", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL video frame extraction (the multimodal set's third leg):
    // per doc_id an MJPEG AVI — real RIFF layout: avih/strh/strf
    // headers, word-aligned movi chunks — carrying id%4+2 flat-block
    // JPEG frames is built, then decoded back through the container
    // walk and per-frame entropy decode into per-frame luma stats. One
    // output row per FRAME, so the frame census, chunk boundaries, and
    // every frame's pixel recovery are all on the hash gate.
    "q85_mjpeg_frame_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nf = (id % 4 + 2).toInt
          val frames = (0 until nf).map { f =>
            graft.functions.JpegCodec.encodeFlatGray(w, h, (bx, by) =>
              ((id + 17 * f + 7 * bx + 13 * by) % 256).toInt)
          }
          Multimodal.MediaRow(id,
            graft.functions.AviCodec.aviBytes(w, h, 33333, frames),
            "video/x-msvideo", source)
        }
      Multimodal.frameStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── REAL WAV sample decode, the q81 pattern for audio: synthetic
    // int16 PCM with arithmetic sample values rides a real RIFF body;
    // sample stats (Σ s², clip count, peak) are integer-exact so the
    // oracle replays the formula bit-for-bit.
    "q82_wav_pcm_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, 16000, samples),
            "audio/wav", source)
        }
      Multimodal.sampleStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── REAL audio resample (the DSP kernel the audio leg was
    // missing): per doc_id int16 PCM at a per-doc source rate (8-24
    // kHz — both up- and down-sampling on the gate, with the identity
    // case at 16 kHz as anchor) is linear-interpolated onto the 16 kHz
    // grid — integer-exact kernel, truncating division on both engines
    // — then folded by the same sampleStats as q82. Two container
    // round-trips and the interpolation arithmetic are all under the
    // hash.
    "q86_pcm_resample" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val srcRate = (8000 + (id % 5) * 4000).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toShort)
          Multimodal.MediaRow(id,
            graft.functions.AudioHeaders.wavBytes(1, srcRate, samples),
            "audio/wav", source)
        }
      Multimodal.sampleStats(Multimodal.resamplePcm(media, 16000)).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── HTML boilerplate removal (the first stage of every web
    // corpus): per doc_id the document text is entity-escaped and
    // embedded in a realistic page — script block CONTAINING markup
    // (so strip order is on the gate), style block, headings, an
    // unknown entity that must pass through — then extracted back.
    // The oracle replays escape→wrap→extract in SQL; a slip in block
    // removal, tag stripping, entity order, or whitespace collapse
    // breaks the text hash on 500 rows.
    "q87_html_extract" -> { (s, dir) =>
      val wrapped = concat(
        lit("<html><head><style>p{margin:0}</style><script>var id="),
        col("doc_id").cast("string"),
        lit(";document.write(\"<b>x</b>\");</script></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1><p>"),
        T.htmlEscape(col("text")),
        lit("</p><div class=\"footer\">&copy; 2026 &amp; co</div></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"), wrapped.as("html"))
        .select(col("doc_id"),
          T.htmlToText(col("html")).as("clean_text"),
          T.markupRatio(col("html")).as("markup_ratio"))
    },

    // ── BPE training inner loop (tokenizer construction): the
    // corpus-wide word-frequency aggregation followed by one exact
    // adjacent-char-pair count round — the statistic every BPE trainer
    // argmaxes over. Top-50 merge candidates ranked deterministically.
    // The rank window is partition-less but bounded by construction:
    // the pair table is ≤ |alphabet|² = 676 rows, driver-safe at any
    // corpus scale (the iterative trainer in ext.Bpe reuses this op
    // per round on the vocab-sized symbol table; adaptive rounds are
    // spec-pinned since SQL can't replay data-dependent merges).
    "q88_bpe_pair_stats" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val pairs = graft.ext.Bpe.pairCounts(
        graft.ext.Bpe.initialSymbols(
          graft.ext.Bpe.wordFreq(
            Tables.documents(s, dir).select(col("text")), "text")))
      pairs
        .select(concat(col("left"), col("right")).as("pair"),
          col("pair_count"))
        .withColumn("rank", row_number().over(
          W.orderBy(col("pair_count").desc, col("pair"))))
        .filter(col("rank") <= 50)
        .select(col("pair"), col("pair_count"), col("rank").cast("long").as("rank"))
    },

    // ── mergeable-sketch rollup (the 100 TB distinct-count design:
    // persist per-(type, week) HLL sketches — KBs per group — and
    // answer coarser rollups by MERGING them, never rescanning raw
    // ids; distinct counts don't decompose, so without this every
    // rollup repays a full scan). Invariant form: rows only if the
    // merged estimate strays more than 10 % from the exact distinct
    // (DataSketches HLL at lgK=12 is ~1.6 % rse; measured ≤ 2 %).
    "q108_sketch_rollup_bound" -> { (s, dir) =>
      import graft.ext.Sketches
      val e = Tables.events(s, dir).withColumn("week",
        expr("(unix_micros(ts) div 86400000000) div 7"))
      val sketches = Sketches.sketchTable(e,
        Seq("event_type", "week"), "user_id")
      val rolled = Sketches.mergeEstimate(sketches, Seq("event_type"))
      val exact = e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct"))
      rolled.join(exact, Seq("event_type"))
        .filter(abs(col("approx_distinct") - col("exact_distinct"))
          > col("exact_distinct") * 0.10)
        .select(col("event_type"),
          col("approx_distinct").cast("long").as("approx_distinct"),
          col("exact_distinct"))
    },

    // ── ordered funnel (the Amplitude/Mixpanel core op): per user,
    // step i anchors at the EARLIEST event of its type strictly after
    // step i−1 (greedy = exact for "did the user convert in order").
    // Single user-keyed shuffle: stacked unbounded-frame window mins,
    // no per-user event list. EXACT oracle: DuckDB replays the same
    // min-after-min recurrence on µs timestamps.
    "q106_funnel" -> { (s, dir) =>
      graft.ext.EventAnalytics.orderedFunnel(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
    },

    // ── DOM-tree extraction (the reference's real BeautifulSoup walk,
    // pull_new_sales_list.py:123-137): per doc a fixture page with
    // id%5+1 listing cards — even cards a propertyCard-link with a
    // relative href, odd cards a nested plain a[href] with an absolute
    // URL + query string, card 4 a link with NO href (skipped, like
    // the reference's `if not href: continue`) — plus three DECOYS
    // carrying /properties/ ids in footer text, an HTML comment, and a
    // script blob. The DOM path must emit exactly the card ids and
    // NONE of the decoys (the whole-page regex path would report all
    // three — divergence spec-pinned); the oracle replays the card
    // arithmetic.
    "q116_dom_extract" -> { (s, dir) =>
      import s.implicits._
      val pages = Tables.documents(s, dir)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = (id % 5 + 1).toInt
          val cards = (0 until n).map { i =>
            val p = id * 1000 + i
            if (i == 4)
              """<div class="l-searchResult"><a class="propertyCard-link">no href</a></div>"""
            else if (i % 2 == 0)
              s"""<div class="card l-searchResult x"><a class="propertyCard-link" href="/properties/$p">View</a><br><span>.</span></div>"""
            else
              s"""<div data-i='$i' class="l-searchResult"><div class="inner"><a href="https://www.rightmove.co.uk/properties/$p?src=1">x</a></div></div>"""
          }.mkString("\n")
          val d = id * 1000
          (id,
            s"""<!DOCTYPE html><html><head><title>p$id</title>
               |<script>var u="/properties/${d + 999}";</script></head>
               |<body>$cards
               |<!-- /properties/${d + 888} -->
               |<footer>see <a href="/properties/${d + 777}">archive</a></footer>
               |</body></html>""".stripMargin)
        }
        .toDF("doc_id", "html")
      graft.operators.ScrapeParse.propertyIdsDom(pages, "doc_id", "html")
    },

    // ── skew-robust funnel: the q106 semantics through the salted-agg
    // physical shape (partial-aggregating per-step minima + salted
    // equi-joins — the power-user defense; a window cannot split a hot
    // user's partition). Must hash-equal q106's oracle exactly: the
    // skew treatment is required to be result-invisible.
    "q115_funnel_skew_robust" -> { (s, dir) =>
      graft.ext.EventAnalytics.orderedFunnelSkewed(Tables.events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .select(col("user_id"), col("step0_us"), col("step1_us"),
          col("step2_us"), col("funnel_depth"))
    },

    // ── windowed funnel (EXACT "converted within T"): every view is
    // an anchor (the earliest can time out while a later one
    // converts — the q106 recurrence is provably wrong here), each
    // anchor's chain is greedy (earliest next step maximizes the
    // remaining budget). T = 6 h. EXACT oracle: DuckDB replays the
    // anchor × greedy-chain joins.
    "q109_windowed_funnel" -> { (s, dir) =>
      graft.ext.EventAnalytics.windowedFunnel(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"),
        windowUs = 6L * 3600 * 1000000)
    },

    // ── funnel conversion latency: per fully-converting user the
    // step-to-step gaps in exact integer µs — the time-to-convert
    // readout that pairs with q106's depth counts. Pure composition
    // over orderedFunnel's step timestamps; EXACT oracle wraps the
    // q106 recurrence.
    "q111_funnel_latency" -> { (s, dir) =>
      graft.ext.EventAnalytics.orderedFunnel(Tables.events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .filter(col("funnel_depth") === 3)
        .select(col("user_id"),
          (col("step1_us") - col("step0_us")).as("gap01_us"),
          (col("step2_us") - col("step1_us")).as("gap12_us"))
    },

    // ── next-event transition matrix (path analysis): lag over each
    // user's time-ordered stream, counted per (from, to) — ≤ |types|²
    // rows. EXACT oracle: identical lag replay with the same
    // (ts, event_id) tie order.
    "q110_event_transitions" -> { (s, dir) =>
      graft.ext.EventAnalytics.eventTransitions(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id")
    },

    // ── retention cohorts: users cohorted by the epoch-week of first
    // signup; distinct active users per (cohort_week, week_offset).
    // Integer epoch-week arithmetic (no date_trunc dialect seams).
    "q107_retention_cohorts" -> { (s, dir) =>
      graft.ext.EventAnalytics.retentionCohorts(Tables.events(s, dir),
        "user_id", "ts", "event_type", anchorType = "signup")
    },

    // ── salted skew join (the explicit hot-key tool for large-large
    // joins where even AQE's split partitions overflow): probe rows
    // get a deterministic xxhash salt, the build side replicates n×,
    // the join key becomes (key, salt). EXACT oracle: result must be
    // row-identical to the plain join (multiplicity preserved) — the
    // events table's event_type is the skewed key.
    "q105_skew_salted_join" -> { (s, dir) =>
      val events = Tables.events(s, dir)
      val typeCounts = events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("type_count"))
      graft.operators.SkewJoin.salted(events, typeCounts,
          Seq("event_type"), col("event_id"), n = 8)
        .select(col("event_id"), col("event_type"), col("type_count"))
    },

    // ── BPE end-to-end roundtrip gate (closes the q88 loop: train →
    // tokenize → verify over the corpus vocabulary). Two invariants,
    // both emitting violations only (oracle = empty set):
    // "roundtrip" — tokenization must PARTITION the word (concat of
    // tokens reassembles it exactly); "no_compress" — any word
    // containing the first merge's pair as a substring has the two
    // chars adjacent in the initial split, so that merge MUST fire
    // and the token count must drop below the char count (kills a
    // tokenizer that never merges, which roundtrip alone would pass).
    "q104_bpe_roundtrip" -> { (s, dir) =>
      import graft.ext.Bpe
      val docs = Tables.documents(s, dir).select(col("text"))
      // ONE corpus pass: the vocab table is materialized once and
      // shared by training and tokenization (see trainFromWords)
      val words = Bpe.wordFreq(docs, "text").localCheckpoint()
      val merges = Bpe.trainFromWords(words, nMerges = 12)
      val tok = Bpe.tokenizeWords(words, merges)
      val broken = tok
        .filter(concat_ws("", col("syms")) =!= col("word"))
        .select(lit("roundtrip").as("kind"), col("word"))
      val uncompressed = merges.headOption match {
        case Some((l, r)) => tok
          .filter(col("word").contains(lit(l + r)) &&
            size(col("syms")) === length(col("word")))
          .select(lit("no_compress").as("kind"), col("word"))
        case None => tok.limit(0)
          .select(lit("no_compress").as("kind"), col("word"))
      }
      broken.union(uncompressed)
    },

    // ── transactional MERGE on the commit-log table (TxLogTable —
    // the multi-writer replacement for the rename-swap sink): the q05
    // merge-latest state rebuilt through THREE serialized optimistic
    // commits (create, merge of even event_ids, merge of odd), each a
    // versioned manifest + immutable data dirs, then a snapshot read.
    // Latest-wins composes across commits (max over a union = max of
    // per-half maxes), so the final snapshot must hash-equal the
    // single-shot q05 oracle — pinning that the log replay, snapshot
    // isolation, and the merge recompute preserve merge semantics
    // exactly, not just "some rows survived".
    "q112_txlog_merge" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q112"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val prec = Seq(col("ts_ns").desc, col("event_id").desc)
      t.ensureExists(ev.schema)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        Seq("user_id"), prec)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), prec)
      t.read().select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"))
    },

    // ── manifest-level DATA SKIPPING on the commit-log table: lineitem
    // appended as four ship-year range batches with per-file l_shipdate
    // stats in the manifests, then a pruned time-range read
    // (TxLogTable.readWhere) — the planner drops the pre-1996 batches
    // from manifest ranges alone (TxLogSkippingSpec pins the file
    // counts; here the HASH pins that pruning never drops a matching
    // row). The 100 TB shape: a time-ranged scan of an append-mostly
    // store schedules work proportional to the matched range, not to
    // table history.
    "q117_txlog_skipping_read" -> { (s, dir) =>
      val dsum = (c: org.apache.spark.sql.Column) =>
        sum(c.cast("decimal(18,4)")).cast("double")
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q117"))
      t.ensureExists(li.schema)
      Seq((0, 1994), (1994, 1996), (1996, 1997), (1997, 9999)).foreach {
        case (lo, hi) =>
          t.append(li.filter(year(col("l_shipdate")) >= lo &&
            year(col("l_shipdate")) < hi), statsCols = Seq("l_shipdate"))
      }
      // literal typed to the column (NTZ in the fixtures) so the
      // family-checked pruner engages instead of conservatively keeping
      val cutLit = li.schema("l_shipdate").dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          lit(java.time.LocalDateTime.of(1996, 6, 15, 0, 0))
        case _ => lit(java.sql.Timestamp.valueOf("1996-06-15 00:00:00"))
      }
      t.readWhere(col("l_shipdate") >= cutLit)
        .groupBy(year(col("l_shipdate")).as("ship_year"),
          month(col("l_shipdate")).as("ship_month"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n_items"))
    },

    // ── row-level CHANGE FEED from the commit-log table: append the
    // even-id events raw (v1), transactionally merge the odd half
    // latest-wins (v2), then read changeFeed(0, v2) — the post-image
    // projection of the typed CDC (`changes()`). v1's change set is
    // the raw appended rows; v2's post-images cover every key the
    // merge changed: the odd-touched users (argmax over latest evens ∪
    // odds = the OVERALL latest event) AND the multi-even-row users
    // whose duplicate keys the latest-wins window collapsed even
    // though the batch never named them. DuckDB replays both arms in
    // one window. Pins that the feed carries exactly the rows each
    // commit changed (no snapshot diffing) with the right
    // `_commit_version` tags — what an incremental downstream (index
    // refresh, dedup-signature update) consumes at 100 TB instead of
    // re-reading the table.
    "q118_txlog_change_feed" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q118"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0))
      val v2 = t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      t.changeFeed(0L, v2)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("_commit_version"))
    },

    // ── full conditional MERGE INTO over the commit-log table: target
    // = the non-multiple-of-3 orders; source = per-order lineitem
    // revenue summary. Ordered clauses — WHEN MATCHED AND has_return
    // DELETE, WHEN MATCHED AND new_price > o_totalprice UPDATE (row :=
    // source projection), ELSE keep; WHEN NOT MATCHED AND NOT
    // has_return INSERT. The oracle replays all four arms in one
    // left-join CASE + insert UNION, so clause ORDER (delete shadows
    // update), the unmatched-keep arm, and the guarded insert are all
    // under the hash. Plan: one full-outer key join + scan-stage
    // when-chain — the clause logic costs no extra exchange.
    "q119_txlog_merge_conditional" -> { (s, dir) =>
      import graft.sources.TxLogTable
      val ord = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val target = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      val src = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").as("new_price"),
          (max(when(col("l_returnflag") === "R", 1).otherwise(0)) === 1)
            .as("has_return"))
        .join(ord.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus")), Seq("o_orderkey"))
        .withColumn("o_totalprice", col("new_price"))
      val t = new TxLogTable(s,
        scratchDir("graft_txlog_q119"))
      t.ensureExists(target.schema)
      t.append(target)
      t.mergeConditional(src, Seq("o_orderkey"),
        whenMatched = Seq(
          TxLogTable.MatchedDelete(Some("s.has_return")),
          TxLogTable.MatchedUpdate(Some("s.new_price > t.o_totalprice"))),
        notMatchedCondition = Some("NOT s.has_return"))
      t.read().select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"))
    },

    // ── exact duplicate-SPAN removal (Lee et al. substring dedup):
    // every ≥8-token run appearing in >1 doc is cut everywhere except
    // a deterministic keeper (min doc_id). The oracle replays the full
    // fixed point — tokenize, k-gram index, keeper election, position
    // cover, rebuild — so gram windowing, overlap union, and the
    // keeper rule are all under the hash (at sf0.01: 24 docs lose
    // 1 254 of 27 165 tokens). Spark plan: grams are array-built per
    // row (no pre-shuffle explode cost beyond the gram groupBy — the
    // one corpus-wide exchange), cut-sets fold per doc.
    "q120_duplicate_span_removal" -> { (s, dir) =>
      graft.ext.DuplicateSpans.removeDuplicateSpans(
        Tables.documents(s, dir), "doc_id", "text", k = 8)
    },

    // ── theta-sketch corpus-overlap estimation: per-source vocabulary
    // sketches (ONE hash aggregate over the raw tokens), then every
    // pairwise intersection is set math over the 20 stored sketches —
    // the set operation HLL fundamentally lacks. Invariant gate (q35
    // family): for all 190 source pairs AND all 20 marginals, the
    // EXACT count (distinct-token equi-join — the plan you'd need per
    // question without sketches) must sit inside the sketch's own
    // ±3σ [lb, ub] band. lgK=9 (512 nominal) keeps the per-source
    // sketches in ESTIMATION mode at sf0.01 (~1k distinct tokens per
    // source), so the bounds math is genuinely exercised, not
    // trivially exact.
    "q121_theta_vocab_overlap" -> { (s, dir) =>
      graft.ext.ThetaSketches.vocabOverlapViolations(
        Tables.documents(s, dir), "text", "source", lgK = 9, numStdDev = 3)
    },

    // ── REAL GIF pixel decode (the palette sibling of q81/q84): per
    // doc_id a 64-color palette + index raster is LZW-COMPRESSED into
    // a GIF89a container (real string-table LZW — dictionary growth,
    // code-width bumps, sub-block framing) and decoded back through
    // the block walk → LZW → palette-map pipeline; odd ids are
    // INTERLACED, so the four-pass row reorder is under the hash too.
    // The oracle replays palette and index arithmetic in SQL — a slip
    // in LZW code scheduling, bit packing, or interlace mapping in
    // EITHER direction breaks it.
    "q122_gif_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val (palette, idx) = graft.functions.GifCodec.syntheticIndexed(id, w, h)
          Multimodal.MediaRow(id,
            graft.functions.GifCodec.encode(w, h, palette, idx,
              interlaced = id % 2 == 1),
            "image/gif", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── unigram-LM (SentencePiece) tokenizer train + segment: the
    // prune-down tokenizer family beside BPE's merge-up (q104). EM
    // over the segmentation lattice fits piece probabilities on the
    // DISTINCT-word table (vocab-sized rounds — the Bpe scale
    // contract), expected counts aggregate as fixed-point micro-longs
    // (bit-deterministic across partitionings). Gate: roundtrip
    // (concat(viterbi pieces) == word for EVERY corpus word), no
    // out-of-vocab piece, vocab budget, and EM's monotone-likelihood
    // law within each phase — violations empty.
    "q123_unigram_lm_roundtrip" -> { (s, dir) =>
      graft.ext.UnigramLm.violations(Tables.documents(s, dir), "text",
        vocabSize = 400, maxPieceLen = 6, seedSize = 1200,
        emIters = 2, postPruneIters = 1)
    },

    // ── compression-ratio repetition signal (Gopher/MassiveText
    // family): per-doc zlib deflate accounting. Deflated lengths are
    // zlib-implementation-specific, so the gate is invariant-form
    // (q28/q44 pattern): raw byte counts hash exactly; the stored-
    // block upper bound and the 10×-repeat self-similarity fact
    // (deflate(text×10) < 10·deflate(text)) ride as pinned-true
    // booleans over every doc with ≥ 20 chars.
    "q89_compression_signal" -> { (s, dir) =>
      graft.ext.CompressionStats.perDoc(
          Tables.documents(s, dir).filter(length(col("text")) >= 20),
          "doc_id", "text").toDF()
        .select(col("doc_id"), col("raw_bytes"),
          (col("deflate_bytes") > 0 &&
            col("deflate_bytes") <= col("raw_bytes") + lit(64) +
              col("raw_bytes") / 1000).as("within_bound"),
          (col("deflate10_bytes") < col("deflate_bytes") * 10)
            .as("repeat_compresses_better"))
    },

    // ── content-addressed FRAME-level video dedup: md5 over exact
    // frame payload bytes, grouped — the broadcast-intro/duplicated-
    // clip collapse a video training pipeline runs before sampling.
    // The value formula folds doc_id mod 32, so ids congruent mod 96
    // (lcm of the width/height/value periods) produce BYTE-IDENTICAL
    // frames: real multi-copy groups exist at every SF (~5 copies per
    // group at 500 docs), not just singletons. The oracle replays
    // byte-identity as arithmetic — frames are equal iff dims agree
    // and (doc_id%32 + 17·frame) mod 256 agrees (the bx/by terms
    // cancel) — so container walk, frame slicing, AND digest grouping
    // are all under the hash.
    "q90_video_frame_dedup" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val nf = (id % 4 + 2).toInt
          val frames = (0 until nf).map { f =>
            graft.functions.JpegCodec.encodeFlatGray(w, h, (bx, by) =>
              ((id % 32 + 17 * f + 7 * bx + 13 * by) % 256).toInt)
          }
          Multimodal.MediaRow(id,
            graft.functions.AviCodec.aviBytes(w, h, 33333, frames),
            "video/x-msvideo", source)
        }
      Multimodal.frameFingerprints(media).toDF()
        .groupBy(col("frame_md5"))
        .agg(min(col("media_id")).as("canonical_doc_id"),
          count(lit(1)).as("n_copies"),
          min(col("media_id") * 1000 + col("frame_idx")).as("canonical_key"))
        .select(col("canonical_doc_id"), col("n_copies"), col("canonical_key"))
    },

    // ── equi-depth (decile) binning of l_extendedprice: exact
    // cutpoints once (9 doubles to the driver), assignment as a pure
    // scan-stage when-chain, then per-bucket mass check. The oracle
    // recomputes the same quantile_cont cutpoints and boundary rule.
    "q74_equidepth_bins" -> { (s, dir) =>
      graft.ext.Binning.equiDepth(
          Tables.lineitem(s, dir).select(col("l_extendedprice")),
          "l_extendedprice", "bucket", nBins = 10)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            .as("sum_price"))
    },

    // ── distributed PCA / whitening invariant, driver-checked
    // (zero-row oracle): one-pass decimal moment aggregate → driver
    // Jacobi (d×d, bounded) → scan-stage projection. The gate replays
    // the eigendecomposition's own laws end to end over the real
    // fixture: eigenvalues descending/non-negative with Σλ = trace,
    // components orthonormal, per-component projected variance equal
    // to λⱼ under ANY partitioning (decimal sums), whitened variance
    // exactly 1, and full-rank per-row reconstruction within 1e-6 —
    // the conditioning stage SemDeDup-style pipelines run before
    // semantic dedup or ANN indexing.
    "q124_pca_whitening_invariant" -> { (s, dir) =>
      graft.ext.Pca.violations(Tables.embeddings(s, dir))
    },

    // ── INCREMENTAL VIEW MAINTENANCE over the typed change feed: the
    // view (count + decimal sum of value by event_type) is seeded from
    // snapshot v1, then maintained PURELY from `changes()` deltas
    // across a merge (pre/post pairs) and a conditional merge with a
    // delete arm (explicit retractions) — the table's final state is
    // NEVER re-aggregated. The oracle recomputes the final state from
    // raw events in SQL; hash equality proves the CDC classification
    // (insert/update_preimage/update_postimage/delete) and the signed
    // fold are exact. The 100 TB contract: view refresh costs
    // O(change batch) + O(view), never O(table).
    "q125_incremental_view" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // even-user half; q126 runs the table-backed twin on the odd
      // half — disjoint workloads, so the two gates differ and the
      // suite pays for the merge pipeline once, not twice
      val ev = Tables.events(s, dir)
        .filter(pmod(col("user_id"), lit(2)) === 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q125"))
      t.ensureExists(ev.schema)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      // v1: per-user latest EVEN event (key-unique append)
      val v1 = t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
      val group = Seq("event_type"); val sums = Seq("value")
      val seeded = graft.ext.IncrementalView.seed(t.readAt(v1), group, sums)
      // v2: merge ALL odd events latest-wins → state = overall latest
      val v2 = t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      // v3: conditional merge — source carries the doubled value plus
      // a guard column; low-value users are deleted, the rest updated
      val src = ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__low", col("value") < 50)
        .withColumn("value", col("value") * 2)
      val v3 = t.mergeConditional(src, Seq("user_id"),
        whenMatched = Seq(
          graft.sources.TxLogTable.MatchedDelete(Some("s.__low")),
          graft.sources.TxLogTable.MatchedUpdate(None)),
        insertWhenNotMatched = false)
      val view = graft.ext.IncrementalView.applyChanges(
        graft.ext.IncrementalView.applyChanges(seeded,
          t.changes(v1, v2), group, sums),
        t.changes(v2, v3), group, sums)
      view.select(col("event_type"), col("n").as("n_users"),
        col("sum_value").cast("double").as("sum_value"))
    },

    // ── transactional MATERIALIZED VIEW refresh (q125's fold, table-
    // backed): the view lives in its own commit-log table and the
    // last-folded source version rides as a commit MARKER — state and
    // watermark advance in one atomic manifest, so refresh is
    // exactly-once (a redundant rerun after each commit is a no-op,
    // exercised here). Same final-state oracle as q125: hash equality
    // proves the marker bookkeeping folds each commit exactly once.
    "q126_materialized_view_refresh" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // odd-user half (q125 covers the evens — see its comment)
      val ev = Tables.events(s, dir)
        .filter(pmod(col("user_id"), lit(2)) === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("ts_ns"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q126s"))
      val mv = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q126v"))
      t.ensureExists(ev.schema)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
      val group = Seq("event_type"); val sums = Seq("value")
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      t.merge(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        Seq("user_id"), Seq(col("ts_ns").desc, col("event_id").desc))
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      // redundant refresh: marker == head, must fold nothing
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      val src = ev.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
        .withColumn("__low", col("value") < 50)
        .withColumn("value", col("value") * 2)
      t.mergeConditional(src, Seq("user_id"),
        whenMatched = Seq(
          graft.sources.TxLogTable.MatchedDelete(Some("s.__low")),
          graft.sources.TxLogTable.MatchedUpdate(None)),
        insertWhenNotMatched = false)
      graft.ext.MaterializedView.refresh(t, mv, group, sums)
      graft.ext.MaterializedView.read(mv)
        .select(col("event_type"), col("n").as("n_users"),
          col("sum_value").cast("double").as("sum_value"))
    },

    // ── WordPiece tokenizer invariant, driver-checked (zero-row
    // oracle, q104/q123 family): likelihood-scored merge training on
    // the distinct-word table, then greedy longest-match encoding
    // with ## continuations. The gate replays the encoding laws over
    // the real corpus vocabulary — pieces ∈ vocab, marker placement,
    // roundtrip, no UNK under alphabet coverage, vocab-word identity.
    // Completes the three production subword families next to BPE
    // (q104, merge-order) and unigram-LM (q123, Viterbi).
    "q127_wordpiece_roundtrip" -> { (s, dir) =>
      graft.ext.WordPiece.violations(
        Tables.documents(s, dir).select(col("text")), "text", nMerges = 12)
    },

    // ── BM25 ranked retrieval (Robertson-Walker Okapi weighting): the
    // lexical-search baseline and standard hard-negative miner for a
    // retrieval-training corpus. Rational (ln-free) idf so every score
    // op is IEEE-exact on both engines; per-doc totals sum ROUNDED
    // per-term scores as DECIMAL(38,6) (q59's bit-stable-sum recipe).
    // One corpus scan; query-sized frames broadcast; top-k is
    // TakeOrdered, never a global sort.
    "q128_bm25_topk" -> { (s, dir) =>
      graft.ext.Bm25.topK(Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "hash", "vector"), k = 25)
    },

    // ── time-series regularization: purchase values resampled onto an
    // hourly grid per user, gaps filled by locf AND linear
    // interpolation — the prep step every metric/sensor feature
    // pipeline runs before windowed models. ONE event-sized Exchange
    // (plan-pinned): the cached bucket aggregate feeds bounds/grid AND
    // the fill join; fills are user_id-partitioned windows. Values are
    // fixed-point ×10⁶ BIGINTs (NUMERICS rule 2).
    "q129_timeseries_fill" -> { (s, dir) =>
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
      graft.ext.TimeSeries.resampleFill(purchases, "user_id",
        unix_micros(col("ts")), "value", stepUs = 3600L * 1000000)
    },

    // ── mergeable QUANTILE rollup (q108's pattern for percentiles):
    // persist per-(type, week) KLL sketches — KBs per group — and
    // answer the per-type p50/p95 by MERGING them; percentiles don't
    // decompose, so without this every rollup repays a full scan.
    // Invariant form: rows only if the true rank of a merged-rollup
    // estimate strays more than 2ε from its target rank (ε = the
    // sketch's own 99 %-confidence bound; KLL compaction is
    // randomized, so only the BOUND is stable — NUMERICS rule 3).
    "q130_kll_quantile_rollup" -> { (s, dir) =>
      val e = Tables.events(s, dir).withColumn("week",
        expr("(unix_micros(ts) div 86400000000) div 7"))
      graft.ext.QuantileSketches.rollupViolations(e,
        fineKeys = Seq("event_type", "week"),
        coarseKeys = Seq("event_type"), valueCol = "value",
        ranks = Seq(0.5, 0.95))
    },

    // ── multi-touch attribution (first/last/linear): purchase value
    // credited to the user's clicks inside a 7-day lookback. EXACT
    // oracle: one user-keyed interval join (q43's shape), windows per
    // conversion for n/first/last, fixed-point ×10⁶ credits with the
    // half-up linear split replayed in integer arithmetic.
    "q131_attribution" -> { (s, dir) =>
      graft.ext.EventAnalytics.attribution(Tables.events(s, dir),
        "user_id", "ts", "event_type", "value", "event_id",
        touchType = "click", convType = "purchase",
        lookbackUs = 7L * 86400 * 1000000)
    },

    // ── Bloom file-skipping on the commit-log table: two appends with
    // fully-overlapping doc_id ranges (evens/odds — range stats alone
    // keep every file for any point lookup), manifest-level per-file
    // Bloom filters over the id AND source columns, then a point-
    // lookup read. The oracle replays the lookup against the raw
    // table; the spec pins pruning EFFECTIVENESS (files actually
    // skipped) — this query gates end-to-end correctness through the
    // build→manifest→prune→scan path.
    "q132_txlog_bloom_lookup" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q132"))
      t.ensureExists(docs.schema)
      t.append(docs.filter(col("doc_id") % 2 === 0).coalesce(1),
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id", "source"))
      t.append(docs.filter(col("doc_id") % 2 === 1).coalesce(1),
        statsCols = Seq("doc_id"), bloomCols = Seq("doc_id", "source"))
      val hits = t.readWhere(col("doc_id").isin(7L, 42L, 123L, 999999L))
      val bySource = t.readWhere(col("source") === "src3")
      hits.unionByName(bySource)
    },

    // ── positional inverted index + exact phrase search: the
    // retrieval primitive BM25 can't answer. Postings build is one
    // scan + posexplode; the 3-word phrase query is term-filtered
    // postings legs equi-joined on (doc_id, anchor = pos − i). EXACT
    // oracle: DuckDB replays the postings and the anchor joins.
    "q133_phrase_search" -> { (s, dir) =>
      val idx = graft.ext.InvertedIndex.postings(
        Tables.documents(s, dir), "doc_id", "text")
      graft.ext.InvertedIndex.phraseSearch(idx,
        Seq("table", "key", "scan"))
    },

    // ── declarative data-quality expectations (the CHECK-constraint /
    // expectations gate): five row rules + a key rule in ONE scan of
    // lineitem, plus one referential anti-join against orders. EXACT
    // oracle: each rule replays as its own SQL count.
    "q134_quality_expectations" -> { (s, dir) =>
      import graft.operators.Expectations._
      val li = Tables.lineitem(s, dir)
      check(li, Seq(
        notNull("shipdate_not_null", "l_shipdate"),
        between("quantity_1_50", "l_quantity", lit(1.0), lit(50.0)),
        between("discount_0_01", "l_discount", lit(0.0), lit(0.1)),
        inSet("returnflag_domain", "l_returnflag", Seq("A", "N", "R")),
        Expect("price_positive", col("l_extendedprice") > 0.0),
        UniqueKey("order_line_unique", Seq("l_orderkey", "l_linenumber")),
        RefIntegrity("orderkey_in_orders", Seq("l_orderkey"),
          Tables.orders(s, dir), Seq("o_orderkey"))))
    },

    // ── transactional row-level UPDATE + DELETE (the DML pair next to
    // MERGE): seed the commit-log table with events, UPDATE clicks
    // (value → value·2 + 1 where value present), DELETE errors, then
    // read the final snapshot AND the change feed's net deletes. The
    // oracle replays both statements over the raw table — pins SQL
    // WHERE semantics (null condition = untouched/kept) through the
    // optimistic-commit path.
    "q135_txlog_dml" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q135"))
      t.ensureExists(ev.schema)
      t.append(ev)
      t.update(col("event_type") === "click" && col("value").isNotNull,
        Map("value" -> (col("value") * 2 + 1)))
      t.delete(col("event_type") === "error")
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    },

    // ── the DataSource façade end-to-end: seed the commit-log table
    // through `df.write.format("txlog")` (three appends, stats+bloom
    // sidecars declared as writer options), then answer through
    // `spark.read.format("txlog")` with the `versionAsOf` option —
    // time travel to the click+view snapshot — and a filter Spark
    // pushes into the relation (manifest file pruning + parquet
    // row-group pushdown). EXACT oracle: replay over the raw events
    // table restricted to the first two appended types.
    "q136_txlog_source" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val root = scratchDir("graft_txlog_q136")
      def put(tpe: String, mode: String): Unit =
        ev.filter(col("event_type") === tpe).write.format("txlog")
          .mode(mode).option("statsCols", "event_id")
          .option("bloomCols", "event_type").save(root)
      put("click", "errorifexists") // v0 create + v1 append
      put("view", "append")         // v2
      put("error", "append")        // v3 — excluded by time travel
      s.read.format("txlog").option("versionAsOf", "2").load(root)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"),
          min(col("event_id")).as("min_event"))
    },

    // ── exact triangle census over the part co-purchase graph
    // (market-basket projection of lineitem): degree-ordered
    // compact-forward — the orientation bounds wedge work at O(m^1.5)
    // regardless of degree skew, the property that keeps the census
    // alive on a 100 TB co-occurrence graph with hub items. EXACT
    // oracle: DuckDB replays the edge projection and the canonical
    // a<b<c triple join.
    "q137_triangle_census" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 40.0)
      graft.ext.Triangles.stats(
        graft.ext.Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
    },

    // ── count-min frequency rollup, driver-checked through a
    // deterministic gate: per-source CMS tables merge cell-wise into
    // the global sketch (merged ≡ direct is asserted IN the query —
    // divergence drops rows and reddens the hash), and every top-20
    // probe survives only if its estimate respects the one-sided
    // bound est ≥ exact. Output = the exact top-20 term counts, which
    // the oracle replays; any sketch-contract violation makes rows
    // vanish. Scale story: per-(source,week) sketches persist, merge
    // by addition for coarser rollups — never rescan the corpus.
    "q138_cms_frequency_rollup" -> { (s, dir) =>
      val C = graft.ext.CountMin
      val tok = graft.core.Partitioning.forCompute(Tables.documents(s, dir))
        .select(col("source"),
          explode(split(T.normalized(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val perSource = C.sketch(tok, Seq("source"), "term")
      val merged = C.merge(Seq(perSource), Nil)
      val direct = C.sketch(tok, Nil, "term")
      val top = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(20)
      val estM = C.estimate(merged, top, Nil, "term")
      val estD = C.estimate(direct, top, Nil, "term")
        .withColumnRenamed("est", "est_direct")
      top.join(estM, "term").join(estD, "term")
        .filter(col("est") >= col("cnt") &&
          col("est") === col("est_direct"))
        .select(col("term"), col("cnt"))
    },

    // ── exact association rules over part co-purchase baskets:
    // support / confidence / lift in ×10⁶ truncating fixed-point, so
    // the rule table is bit-identical on any partitioning and replays
    // exactly in DuckDB's integer division. minCooc floor prunes the
    // singleton tail before the degree joins.
    "q139_association_rules" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 30.0)
      graft.ext.MarketBasket.pairRules(li, "l_orderkey", "l_partkey",
        minCooc = 2L)
    },

    // ── multi-source BFS hop levels over the co-purchase graph
    // (frontier expansion, each edge traversed ≤ 2× total): the
    // distance-from-trusted-set signal. EXACT oracle: DuckDB replays
    // the walk as a recursive CTE with UNION dedup and min-folds the
    // levels.
    "q140_bfs_hop_levels" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 40.0)
      val edges = graft.ext.Triangles.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
      val seeds = li.select(col("l_partkey")).distinct()
        .filter(col("l_partkey") % 97 === 0)
      graft.ext.ShortestPaths.hopLevels(edges, seeds, maxHops = 3)
        .select(col("v"), col("level").cast("long").as("level"))
    },

    // ── TrustRank: personalized PageRank with teleport restricted to
    // a trusted seed set, same integer fixed-point as q71 (bit-exact
    // on any partitioning). Seeds = every 7th node of the q71
    // bipartite customer/supplier graph; 3 unrolled rounds replayed
    // exactly by the oracle.
    "q141_trustrank" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node")))
        .distinct().filter(col("node") % 7 === 0)
      graft.ext.PageRank.personalized(edges, "src", "dst", seeds, iters = 3)
    },

    // ── grouped EXACT linear fit (OLS on quantity → price cents):
    // closed-form normal-equation sums emitted as separate numerator/
    // denominator decimals — no division anywhere, so the regression
    // is exact integer arithmetic end-to-end and hash-replays in
    // DuckDB HUGEINT. slope = num/den, intercept = inum/den for any
    // consumer that wants the float.
    "q142_grouped_linear_fit" -> { (s, dir) =>
      // y = whole dollars, cents truncated via integer DIV — keeps
      // every normal-equation term under ~10^17 at sf1 (documented
      // headroom; the decimal(38,0) intermediates would carry far
      // larger, but the driver contract wants native int64 output)
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("grp"),
        col("l_quantity").cast("decimal(18,0)").cast("decimal(38,0)").as("x"),
        expr("CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 " +
          "AS BIGINT) DIV 100 AS DECIMAL(38,0))").as("y"))
      val terms = li.groupBy(col("grp"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("grp"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("dnum"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("dden"),
          (col("sy") * col("sxx") - col("sx") * col("sxy")).as("dinum"))
      // int64-cap invariant gate, IN-QUERY (not fixture convention):
      // the decimal(38,0) terms are exact; a term past int64 would
      // otherwise null out silently in the non-ANSI cast below. A
      // violating group poisons its key instead — a row the oracle
      // cannot have, so the driver compare goes red loudly (DuckDB's
      // own HUGEINT→BIGINT cast errors on its side).
      val lim = lit(new java.math.BigDecimal("9223372036854775807"))
        .cast("decimal(38,0)")
      val ok = abs(col("dnum")) <= lim && abs(col("dden")) <= lim &&
        abs(col("dinum")) <= lim && col("n") <= lim
      terms.select(
        when(ok, col("grp")).otherwise(concat(lit("OVERFLOW:"), col("grp")))
          .as("grp"),
        col("n").cast("long").as("n_rows"),
        col("dnum").cast("long").as("slope_num"),
        col("dden").cast("long").as("slope_den"),
        col("dinum").cast("long").as("intercept_num"))
    },

    // ── path mining: the 3-step journey census (q110's transition
    // matrix extended to trigrams) — one user-keyed window sort
    // carries both leads, then a hash agg. EXACT oracle: LEAD twice.
    "q143_path_trigrams" -> { (s, dir) =>
      graft.ext.EventAnalytics.pathKGrams(Tables.events(s, dir),
        "user_id", "ts", "event_type", "event_id", k = 3)
    },

    // ── ROLLING 4-week distinct actives from the persisted weekly HLL
    // sketches (q108's stored artifact, now answering the sliding
    // window distinct counts can't decompose over): 4 sketch merges
    // per week, no raw re-scan. Driver-checked bound gate: each
    // week's estimate must sit within 10 % of the exact windowed
    // distinct (rsd ≈ 1.6 % at lgK 12) or its row vanishes; survivors
    // emit the EXACT count the oracle replays.
    "q144_rolling_distinct_actives" -> { (s, dir) =>
      import graft.ext.Sketches
      val e = Tables.events(s, dir).withColumn("week",
        expr("(unix_micros(ts) div 86400000000) div 7"))
      val weekly = Sketches.sketchTable(e, Seq("week"), "user_id")
      val rolled = Sketches.rollingMergeEstimate(weekly, "week", window = 4)
      // exact leg in the same fan-out equi-join shape as the sketch
      // side: an event in week w contributes to the windows anchored
      // at w..w+3 — no range join, no BNLJ
      val wk = e.select(col("week")).distinct()
      val exact = e
        .select(col("user_id"),
          explode(sequence(col("week"), col("week") + 3)).as("week"))
        .join(wk, Seq("week"), "left_semi")
        .groupBy(col("week"))
        .agg(countDistinct(col("user_id")).as("exact_rolling"))
      rolled.join(exact, Seq("week"))
        .filter(abs(col("approx_distinct") - col("exact_rolling")) <=
          col("exact_rolling") * 0.10)
        .select(col("week"), col("exact_rolling"))
    },

    // ── k-core peel: 4 synchronous rounds at k=3 over the co-purchase
    // graph — each round drops sub-k vertices and their edges. Fixed
    // round count ⇒ pure function of the input, EXACT oracle = 4
    // unrolled degree-filter layers. (At convergence the peel IS the
    // 3-core; KCoreSpec pins convergence on its fixtures.)
    "q145_kcore_peel" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 44.0)
      val edges = graft.ext.Triangles.coOccurrenceEdges(
        li, "l_orderkey", "l_partkey")
      graft.ext.KCore.peel(edges, k = 3, rounds = 4)
    },

    // ── SQ8 scalar-quantization recall floor, driver-checked
    // (zero-row oracle, the q27/q35 harness): int8 asymmetric-distance
    // top-k vs exact cosine top-k. SQ8 reconstructs far tighter than
    // PQ's shared codebooks, so the floor is high: measured
    // 1.000/1.000/0.960 at sf0.001/0.01/0.1 (tools/SqCheck); floor
    // 0.70 keeps a wide margin while pinning that the memory tier
    // cannot collapse. Violations emit — EMPTY expected.
    "q146_ann_sq8_recall_floor" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val (lo, hi) = graft.ext.ScalarQuantization.train(emb, "embedding")
      val approx = graft.ext.ScalarQuantization.sqTopK(emb, q, k = 5, lo, hi)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.70)
        .select(lit("sq8").as("method"), round(col("recall"), 6).as("recall"))
    },

    // ── IVF × SQ8 composition recall floor (FAISS "IVF,SQ8"): Lloyd
    // cells restrict candidates, the int8 asymmetric scan runs only
    // inside the probed cells. Measured 0.580/0.580/0.560 across SFs
    // (tools/SqCheck) vs plain IVF's 0.580 — quantization costs
    // ≤ 0.02 recall; the loss is all cell restriction. Floor 0.30 =
    // ~1.9× margin. Zero-row oracle.
    "q147_ann_ivf_sq8_recall_floor" -> { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = SimilaritySearch.bruteForceTopK(emb, q, k = 5)
        .select(col("query_id"), col("cand_id")).cache()
      val (lo, hi) = graft.ext.ScalarQuantization.train(emb, "embedding")
      val approx = graft.ext.ScalarQuantization
        .ivfSqTopK(emb, q, k = 5, lo, hi)
        .select(col("query_id"), col("cand_id"))
      exact.join(approx, Seq("query_id", "cand_id"), "left_semi")
        .agg((count(lit(1)) / exact.count()).as("recall"))
        .filter(col("recall") < 0.30)
        .select(lit("ivf_sq8").as("method"),
          round(col("recall"), 6).as("recall"))
    },

    // ── exact weighted median per group: smallest value whose
    // value-inclusive cumulative weight reaches half the group total
    // (lower weighted median). RANGE frame makes equal values peers,
    // so the definition — and the integer comparison 2·cum ≥ total —
    // is partitioning-independent and replays exactly. One key+value
    // sort window, the q36 cost shape; weights and values are longs
    // (cents), so nothing floats.
    "q150_weighted_median" -> { (s, dir) =>
      val b = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("grp"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("v"),
        col("l_quantity").cast("long").as("w"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("v"))
        .rangeBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      b.withColumn("cum", sum(col("w")).over(win))
        .withColumn("total", sum(col("w")).over(tot))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy(col("grp"))
        .agg(min(col("v")).as("w_median_cents"),
          max(col("total")).as("total_weight"))
    },

    // ── BMP raster identity (the 4th still-image codec): the same
    // integer pixel formulas as q81, recovered through a REAL 24-bit
    // BI_RGB encode→decode (BGR order, bottom-up rows, 4-byte row
    // padding). Shares q81's arithmetic oracle verbatim.
    "q149_bmp_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          Multimodal.MediaRow(id, graft.functions.BmpCodec.encode(img),
            "image/bmp", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── degree-assortativity moments of the co-purchase graph: exact
    // integer sums, no division (q142's numerator/denominator
    // discipline) — Pearson r over edge-end degrees assembles
    // downstream in any precision. One scan + two keyed equi-joins.
    "q148_assortativity_moments" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") > 40.0)
      graft.ext.Triangles.assortativityMoments(
        graft.ext.Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey"))
    },

    // ── deletion-vector DML (merge-on-read): two stacked vectored
    // deletes over the commit-log table — the path a point delete on
    // a 100 TB table takes (deleted-rows-sized commit, zero file
    // rewrite). The in-query require is the no-rewrite invariant
    // gate: the live file set must be IDENTICAL across both deletes
    // (a copy-on-write regression throws, failing the oracle run
    // loudly). EXACT oracle: both WHERE conditions replayed over the
    // raw table with SQL null semantics.
    "q151_dv_delete" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q151"))
      t.ensureExists(ev.schema)
      t.append(ev.repartition(4))
      val before = t.liveDataPaths(t.currentVersion).toSet
      t.deleteVectored(col("event_type") === "error")
      t.deleteVectored(col("event_type") === "click" && col("value") > 100.0)
      val after = t.liveDataPaths(t.currentVersion).toSet
      require(after == before,
        "vectored delete must not rewrite live data files")
      t.read()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,4)")).cast("double")
            .as("sum_value"))
    },

    // ── MP3 frame-walk metadata (the compressed-audio sibling of
    // q80's WAV walk): per doc_id a standards-shaped Layer III stream
    // — MPEG-1 or MPEG-2 by id, cycling bitrate/rate indices, mono/
    // stereo, padding bits every third frame, ID3v2 prefix and ID3v1
    // trailer on id strides — walked frame-by-frame back to exact
    // (version, bitrate, rate, channels, frames, samples). The oracle
    // replays the index arithmetic through the published bitrate/rate
    // tables, so a slip in sync masks, table rows, padding math, the
    // syncsafe ID3 skip, or samples-per-frame breaks the hash.
    "q152_mp3_headers" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val vbits = if (id % 4 == 0) 2 else 3
          val payload = graft.functions.Mp3Codec.mp3Bytes(vbits,
            (id % 14 + 1).toInt, (id % 3).toInt, id % 2 == 0,
            (id % 297 + 3).toInt,
            id3v2Bytes = if (id % 5 == 0) 64 else 0,
            id3v1 = id % 7 == 0)
          Multimodal.MediaRow(id, payload, "audio/mpeg", source)
        }
      Multimodal.mp3Meta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("version"),
          col("bitrate_kbps").cast("long").as("bitrate_kbps"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_frames"), col("n_samples"))
    },

    // ── REAL WebP/VP8L pixel decode (the 5th still-image codec — the
    // majority lossless encoding of a modern crawl): per doc_id a
    // 4×4-BLOCK raster (horizontal runs + repeated colors, so the
    // encoder's LZ77 distance-1 copies AND color-cache hits are on the
    // verified path, not just literals) is VP8L-encoded — package-merge
    // Huffman, RLE'd code lengths, cache inserts — and decoded back
    // through the full container walk → prefix-code rebuild → LZ77/
    // cache pixel loop. Ids rotate the encoder path so every transform
    // arm is under THIS hash gate: id%3==0 subtract-green + predictor
    // mode 11 (Select) with its sub-resolution mode image; id%3==1
    // COLOR-INDEXING (block rasters have ≤20 colors → bundled sub-byte
    // indices); id%3==2 the plain stream. A slip in canonical code
    // assignment, bit order, the repeat codes, cache hashing, copy
    // addressing, any inverse transform, or palette delta-coding
    // breaks the hash.
    "q153_webp_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val data = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val i = (y * w + x) * 3
              data(i) = ((id + 3L * (x / 4) + 7L * (y / 4)) % 256).toByte
              data(i + 1) = ((2L * id + 5L * (x / 4) + (y / 4)) % 256).toByte
              data(i + 2) = ((3L * id + (x / 4) + 11L * (y / 4)) % 256).toByte
              x += 1
            }
            y += 1
          }
          val img = graft.functions.PngCodec.Image(w, h, 3, data)
          val payload = (id % 3) match {
            case 0 => graft.functions.WebpCodec.encodeWith(img,
              subtractGreen = true, predictorMode = Some(11))
            case 1 => graft.functions.WebpCodec.encodeIndexed(img)
            case _ => graft.functions.WebpCodec.encode(img)
          }
          Multimodal.MediaRow(id, payload, "image/webp", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── WARC crawl-archive round trip (the raw-input container of a
    // web-scale corpus): per doc_id a two-record archive (warcinfo +
    // HTTP response whose entity body is the document text) is
    // serialized — odd ids as one-gzip-member-per-record .warc.gz, the
    // Common Crawl layout; even ids plain — and read back through the
    // full parser walk: member-by-member gunzip, WARC header fields,
    // Content-Length block framing, RFC 9112 status/header/body split.
    // doc_id is recovered FROM the parsed WARC-Target-URI (not carried
    // alongside), so a framing slip anywhere breaks the join to the
    // oracle; payload identity is pinned by md5 over the extracted
    // entity body vs DuckDB's md5 over the source text. id%4 rotates
    // the HTTP wire codings (Content-Encoding: gzip × Transfer-
    // Encoding: chunked), so the inflate and chunk-unwrap arms sit
    // under the same hash gate as the plain path.
    "q154_warc_extract" -> { (s, dir) =>
      import s.implicits._
      val files = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val status = if (id % 3 == 0) 404 else 200
          val reason = if (status == 200) "OK" else "Not Found"
          val date = "2026-01-01T00:00:00Z"
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:info-$id>", date, Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:resp-$id>", s"https://example.org/doc/$id", date,
              status, reason, "text/html; charset=utf-8", body,
              gzipBody = id % 2 == 0, chunked = id % 4 >= 2))
          (s"doc-$id.warc", graft.functions.WarcCodec.file(recs, gzip = id % 2 == 1))
        }
      graft.sources.WarcSource.responses(graft.sources.WarcSource.fromBytes(files))
        .toDF()
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("warc_type"),
          col("target_uri"),
          col("http_status").cast("long").as("http_status"),
          col("http_content_type"),
          length(col("payload")).cast("long").as("payload_len"),
          md5(col("payload")).as("payload_md5"))
    },

    // ── main-content extraction (boilerplate removal): each doc's text
    // is planted as the two-paragraph article of a full page skeleton —
    // header/nav, marker-classed sidebar, a link-dense related block
    // (plain class, so only the link-density SCORE can reject it),
    // comments, footer, plus a <script> decoy carrying literal "<p>"
    // markup. The extractor must prune the chrome, zero out the
    // link-dense block, pick the article container, and return exactly
    // the two paragraphs — which the oracle recomputes as trimmed
    // substrings of the source text.
    "q155_main_content" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val p1 = text.substring(0, 40)
          val p2 = text.substring(40)
          val html =
            s"""<!DOCTYPE html><html><head><title>Doc $id</title>
               |<script>var decoy = "<p>not content $id</p>";</script></head>
               |<body>
               |<header><h1>Site</h1><nav><a href="/">home</a> <a href="/a">archive</a></nav></header>
               |<div class="sidebar box"><p>subscribe to our newsletter for daily updates and offers</p></div>
               |<div id="page">
               |<div class="morelinks"><p><a href="/r/1">a very long related article title number one</a> <a href="/r/2">another even longer related article title number two</a></p></div>
               |<article id="story"><p>$p1</p><p>$p2</p></article>
               |<div class="comments"><p>first comment rambling on at considerable length about nothing</p><p>second comment also quite long and equally content free</p></div>
               |</div>
               |<footer><p>copyright twenty twenty six all rights reserved worldwide</p></footer>
               |</body></html>""".stripMargin
          (id, graft.functions.MainContent.extract(html))
        }
        .toDF("doc_id", "main_text")
    },

    // ── robots.txt admission (RFC 9309): per doc_id a robots body with
    // a bot-specific group (prefix Disallow, longer-prefix Allow,
    // wildcard+anchored Disallow, Crawl-delay) over a deny-all "*"
    // group; five probe paths rotate through longest-match-wins, the
    // Allow tie-break, group selection (deny-all must NOT apply), the
    // $ anchor hit, and the $ anchor miss. The oracle replays the
    // decision table arithmetically.
    "q156_robots_check" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val txt =
            s"""# robots for doc $id
               |User-agent: graftbot
               |Disallow: /p$id/
               |Allow: /p$id/pub
               |Disallow: /*.pdf$$
               |Crawl-delay: ${id % 7 + 1}
               |
               |User-agent: *
               |Disallow: /
               |""".stripMargin
          val path = (id % 5) match {
            case 0 => s"/p$id/x"      // prefix Disallow hits
            case 1 => s"/p$id/pub/a"  // longer Allow overrides
            case 2 => "/other"        // no rule in the bot's group
            case 3 => "/doc.pdf"      // anchored wildcard hits
            case _ => "/doc.pdfx"     // $ anchor must miss
          }
          val robots = graft.functions.RobotsRules.parse(txt)
          (id, path, robots.allows("graftbot/1.0", path),
            robots.crawlDelay("graftbot/1.0").getOrElse(-1.0).toLong)
        }
        .toDF("doc_id", "path", "allowed", "crawl_delay")
    },

    // ── URL frontier decomposition: five URL shapes (multi-label
    // public suffix, userinfo+port, IPv4 literal, bare host, relative)
    // through host → registrable domain → politeness shard → path, all
    // pure codegen Column expressions. The shard is the md5-variate of
    // the domain (the house cross-engine hash), so the oracle
    // recomputes it bit-exactly; one host's URLs land in one shard
    // under any partitioning.
    "q157_url_frontier" -> { (s, dir) =>
      import graft.functions.UrlFunctions
      val idS = col("doc_id").cast("string")
      val url = when(col("doc_id") % 5 === 0,
          concat(lit("https://www.sub.site"), idS, lit(".co.uk/a/b?q="), idS))
        .when(col("doc_id") % 5 === 1,
          concat(lit("http://user:pw@site"), idS, lit(".example.com:8080/idx.html#frag")))
        .when(col("doc_id") % 5 === 2, concat(lit("https://10.0.0.7/p"), idS))
        .when(col("doc_id") % 5 === 3, concat(lit("https://host"), idS, lit(".com.au")))
        .otherwise(lit("/relative/only"))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url"))
        .withColumn("host", UrlFunctions.host(col("url")))
        .withColumn("domain", UrlFunctions.registrableDomain(col("host")))
        .withColumn("shard", UrlFunctions.crawlShard(col("domain"), 64))
        .withColumn("path", UrlFunctions.path(col("url")))
    },

    // ── sitemap seed extraction (sitemaps.org protocol): per doc_id a
    // three-entry urlset with XML prolog, namespace attr, and per-entry
    // lastmod/changefreq/priority; parsed through the DOM walk and
    // exploded to one row per entry, each field replayed by the oracle.
    "q158_sitemap_entries" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val entries = (0 until 3).map { i =>
            val day = (id % 28 + 1).toInt
            val freq = Seq("daily", "weekly", "monthly")(((id + i) % 3).toInt)
            s"""  <url>
               |    <loc>https://s$id.example/p/$i</loc>
               |    <lastmod>2026-01-${f"$day%02d"}</lastmod>
               |    <changefreq>$freq</changefreq>
               |    <priority>0.${(id + i) % 10}</priority>
               |  </url>""".stripMargin
          }
          val xml =
            s"""<?xml version="1.0" encoding="UTF-8"?>
               |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
               |${entries.mkString("\n")}
               |</urlset>""".stripMargin
          graft.functions.Sitemap.parse(xml).map { e =>
            (id, e.loc, e.lastmod.orNull, e.changefreq.orNull,
              e.priority.getOrElse(-1.0))
          }
        }
        .toDF("doc_id", "loc", "lastmod", "changefreq", "priority")
    },

    // ── frontier schedule: URLs collapse onto 7 domains; the plan must
    // serialize each domain (row_number by priority DESC, url) and
    // space fetches by the domain's crawl delay — one domain-keyed
    // Exchange, everything else scan-stage. The oracle replays the
    // window arithmetic and the shared md5 shard.
    "q159_frontier_schedule" -> { (s, dir) =>
      import graft.ext.Frontier
      val idS = col("doc_id").cast("string")
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example/d/"), idS).as("url"),
          (col("doc_id") % 10).as("prio"),
          ((col("doc_id") % 7 + 1) * 100).as("delay_ms"))
      Frontier.schedule(urls, "url", col("prio"), col("delay_ms"), nShards = 32)
        .select(col("doc_id"), col("url"), col("domain"),
          col("shard"), col("seq").cast("long").as("seq"),
          col("fetch_offset_ms"))
    },

    // ── hyperlink extraction: per doc a page at a two-deep path with
    // six anchor arms (absolute, path-absolute, relative, ../ climb,
    // protocol-relative, rel=nofollow) plus javascript:/fragment decoys
    // that must drop; each resolved dst replayed by the oracle. DOM
    // scoping: a decoy <a> inside a <script> blob must not surface.
    "q160_link_extract" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val pageUrl = s"https://w$id.example/a/b/page.html"
          val html =
            s"""<html><head><script>var s = '<a href="https://decoy.example/x">no</a>';</script></head>
               |<body>
               |<a href="https://other$id.example/z">link0</a>
               |<a href="/r/s">link1</a>
               |<a href="c/d.html">link2</a>
               |<a href="../up.html">link3</a>
               |<a href="//cdn$id.example/lib.js">link4</a>
               |<a href="https://ref.example/p" rel="sponsored nofollow">link5</a>
               |<a href="#frag">drop me</a>
               |<a href="javascript:void(0)">drop too</a>
               |<a href="mailto:x@example.org">drop three</a>
               |</body></html>""".stripMargin
          graft.ext.LinkGraph.links(pageUrl, html).map { l =>
            (id, l.dst_url, l.anchor, l.nofollow)
          }
        }
        .toDF("doc_id", "dst_url", "anchor", "nofollow")
    },

    // ── REAL FLAC decode (the lossless-audio format of archival
    // corpora): q82's exact PCM formula rides a full FLAC encode →
    // decode instead of a WAV container — frame walk, fixed/LPC
    // prediction, partitioned Rice residuals, CRC-8/16 and the
    // STREAMINFO MD5 integrity gate all under q82's arithmetic oracle.
    // 64-sample blocks force multi-frame streams with partial tails;
    // ids rotate the predictor representation (explicit quantized-LPC
    // vs FIXED) and the Rice partition order 0-2, so every decode arm
    // is hash-gated.
    "q161_flac_pcm_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = (id % 200 + 50).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 17) % 65536) - 32768).toInt)
          val payload = graft.functions.FlacCodec.encode(
            samples, channels = 1, sampleRate = 16000, blockSize = 64,
            useLpc = id % 2 == 0, partitionOrder = (id % 3).toInt)
          Multimodal.MediaRow(id, payload, "audio/flac", source)
        }
      Multimodal.flacSampleStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("n_samples"),
          col("sum_squares"), col("n_clipped"),
          col("peak").cast("long").as("peak"))
    },

    // ── charset sniff + decode (the bytes→text seam): five wire
    // encodings of the doc text with a non-ASCII suffix that
    // discriminates every arm — UTF-8 BOM, windows-1252 via an
    // iso-8859-1 transport label (the € at 0x80 proves the WHATWG
    // superset reading), UTF-16LE BOM, <meta charset> prescan, and
    // undeclared 1252 bytes that must fail strict UTF-8 validation
    // into the fallback. The oracle replays charset and decoded text.
    "q162_charset_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val u = "éüñ" // éüñ
          val (bytes, header) = (id % 5) match {
            case 0 =>
              (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
                (text + " " + u + "№").getBytes("UTF-8"), None)
            case 1 =>
              ((text + " " + u + "€").getBytes("windows-1252"),
                Some("text/html; charset=iso-8859-1"))
            case 2 =>
              (Array[Byte](0xff.toByte, 0xfe.toByte) ++
                (text + " " + u + "№").getBytes("UTF-16LE"), None)
            case 3 =>
              (("<meta charset=\"utf-8\">" + text + " " + u + "№")
                .getBytes("UTF-8"), None)
            case _ =>
              ((text + " " + u + "€").getBytes("windows-1252"), None)
          }
          val d = graft.functions.CharsetDetect.decode(bytes, header)
          (id, d.charset, d.text)
        }
        .toDF("doc_id", "charset", "text_out")
    },

    // ── Ogg container walk (Vorbis + Opus ID headers): per doc a
    // structurally valid multi-page stream — BOS ID page, data pages,
    // EOS granule carrying the duration — CRC-verified page by page.
    // Opus durations subtract the pre-skip from the 48 kHz granule;
    // Vorbis granules are stream-rate samples; both arms land on the
    // same arithmetic n_samples under the oracle.
    "q163_ogg_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val n = id % 1000 + 1
          val nData = (id % 3 + 1).toInt
          val (idPkt, lastGranule) =
            if (id % 2 == 0)
              (graft.functions.OggCodec.vorbisIdPacket(
                (id % 2 + 1).toInt, (8000 + (id % 5) * 8000).toInt), n)
            else
              (graft.functions.OggCodec.opusIdPacket(
                (id % 2 + 1).toInt,
                Seq(48000, 24000, 16000)((id % 3).toInt), preSkip = 312),
                n + 312)
          val granules = (1 to nData).map(i =>
            if (i == nData) lastGranule else lastGranule * i / nData)
          val payload = graft.functions.OggCodec.encode(
            idPkt, serial = (id & 0x7fffffff).toInt, granules)
          Multimodal.MediaRow(id, payload, "audio/ogg", source)
        }
      Multimodal.oggMeta(media).toDF()
        .select(col("media_id").as("doc_id"), col("codec"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("n_pages").cast("long").as("n_pages"),
          col("n_samples"))
    },

    // ── REAL TIFF decode (the 6th still-image codec — the archival/
    // scan format): q81's synthetic raster rides a TIFF encode→decode
    // with ids rotating the compression arm (none / LZW with its
    // early-change width quirk / PackBits), the horizontal predictor
    // on the LZW arm, and multi-strip assembly (5-row strips) — all
    // under the same arithmetic luma oracle as q81/q149. The JDK
    // ImageIO cross-check lives in TiffCodecSpec.
    "q164_tiff_pixel_stats" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val w = (id % 16 + 4).toInt
          val h = (id % 12 + 4).toInt
          val img = graft.functions.PngCodec.syntheticRgb(id, w, h)
          val payload = (id % 3) match {
            case 0 => graft.functions.TiffCodec.encode(img, 5,
              rowsPerStrip = 5, predictor = true)
            case 1 => graft.functions.TiffCodec.encode(img, 32773, rowsPerStrip = 5)
            case _ => graft.functions.TiffCodec.encode(img, 1)
          }
          Multimodal.MediaRow(id, payload, "image/tiff", source)
        }
      Multimodal.pixelStats(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_pixels"), col("luma_sum"))
    },

    // ── WARC random-access index (the CDX model): per doc a 3-record
    // archive — gzip one-member-per-record for even ids, plain for odd
    // — is indexed (per-record byte extents from the gzip member walk
    // or the plain record walk), then every record is re-fetched
    // THROUGH its extent alone and compared field-for-field against
    // the sequential parse; extents must tile the archive exactly.
    // Invariant gate: all flags true, rows = documents.
    "q165_warc_cdx" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val date = "2026-01-01T00:00:00Z"
          val half = text.length / 2
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:i$id>", date, Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:a$id>", s"https://example.org/a/$id", date,
              200, "OK", "text/plain",
              text.substring(0, half).getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:b$id>", s"https://example.org/b/$id", date,
              200, "OK", "text/plain",
              text.substring(half).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          val bytes = graft.functions.WarcCodec.file(recs, gzip = id % 2 == 0)
          val idx = graft.functions.WarcCodec.parseFileIndexed(bytes)
          val full = graft.functions.WarcCodec.parseFile(bytes)
          val okRoundtrip = idx.length == full.length && idx.zip(full).forall {
            case ((_, off, len), f) =>
              graft.functions.WarcCodec.fetchRecord(bytes, off, len).exists { g =>
                g.targetUri == f.targetUri && g.recordId == f.recordId &&
                  java.util.Arrays.equals(g.payload, f.payload)
              }
          }
          val okTiling = idx.nonEmpty && idx.head._2 == 0L &&
            idx.sliding(2).forall {
              case Seq((_, o1, l1), (_, o2, _)) => o1 + l1 == o2
              case _ => true
            } && (idx.last._2 + idx.last._3 == bytes.length)
          (id, idx.length.toLong, okRoundtrip, okTiling)
        }
        .toDF("doc_id", "n_records", "ok_roundtrip", "ok_tiling")
    },

    // ── REAL PDF text extraction (the densest document format a crawl
    // carries): each doc's text rides a spec-valid PDF encode→extract
    // round trip, ids rotating the file shape — classic-xref/plain,
    // classic-xref/Flate with kerned TJ arrays, and xref-stream +
    // object-stream (the post-1.5 producer layout, PNG predictor 12 on
    // the index) with two content streams per page; every 5th doc's
    // last page arrives as an incremental update (/Prev chain). The
    // extractor must reassemble the exact text through deflate, the
    // object grammar, and the text operators. Per-page split points are
    // JVM substring arithmetic, so the oracle only needs page count +
    // full text; PdfCodecSpec pins the grammar corners (hex strings,
    // octal escapes, indirect /Length, UTF-16BE titles).
    "q166_pdf_text" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val nPages = (id % 4 + 1).toInt
          val cuts = (0 to nPages).map(i => text.length * i / nPages)
          val pages = (0 until nPages).map(i => text.substring(cuts(i), cuts(i + 1)))
          val bytes = (id % 3) match {
            case 0 if id % 5 == 0 && nPages >= 2 =>
              graft.functions.PdfCodec.appendPage(
                graft.functions.PdfCodec.encode(pages.init, flate = false),
                pages.last)
            case 0 => graft.functions.PdfCodec.encode(pages, flate = false)
            case 1 => graft.functions.PdfCodec.encode(pages, flate = true,
              kerned = true)
            case _ => graft.functions.PdfCodec.encode(pages, flate = true,
              xrefStream = true, twoStreamsPerPage = true)
          }
          val got = graft.functions.PdfCodec.extractText(bytes)
          (id, got.nPages.toLong, got.pages.mkString)
        }
        .toDF("doc_id", "n_pages", "text_out")
    },

    // ── WET/WAT derivation (the crawl-distribution companions): each
    // doc's text rides a full HTML page (title, script decoy carrying
    // literal markup, k=id%4+1 root-relative links) through a WARC
    // response — HTTP wire codings rotating as in q154 — then through
    // the WET extraction rule (charset sniff → DOM → drop script →
    // normalized visible text) and the WAT envelope (title, resolved
    // outlinks, JSON block hash-gated as a string). ok_wet_roundtrip
    // additionally re-serializes the WET+WAT rows as conversion/
    // metadata WARC records (WARC-Refers-To linkage) and re-parses
    // them — the publishable-artifact invariant.
    "q167_wet_wat" -> { (s, dir) =>
      import s.implicits._
      val files = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val anchors = (0 until k)
            .map(j => s"""<a href="/l/$j">l$j</a>""").mkString(" ")
          val html =
            s"""<!DOCTYPE html><html><head>
               |<title>T$id</title>
               |<script>var decoy = "<p>no $id</p>";</script>
               |</head>
               |<body>
               |<p>$text</p>
               |<p>$anchors</p>
               |</body></html>""".stripMargin
          val recs = Seq(
            graft.functions.WarcCodec.warcinfoRecord(
              s"<urn:uuid:info-$id>", "2026-01-01T00:00:00Z",
              Seq("software" -> "graft")),
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:resp-$id>", s"https://example.org/doc/$id",
              "2026-01-01T00:00:00Z", 200, "OK",
              "text/html; charset=utf-8",
              html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              gzipBody = id % 2 == 0, chunked = id % 4 >= 2))
          (s"doc-$id.warc", graft.functions.WarcCodec.file(recs, gzip = id % 2 == 1))
        }
      val responses = graft.sources.WarcSource.responses(
        graft.sources.WarcSource.fromBytes(files))
      responses.map { r =>
        val we = graft.sources.WarcDerive.wetOf(r)
        val wa = graft.sources.WarcDerive.watOf(r)
        // publishable-artifact invariant: conversion/metadata records
        // re-parse with the linkage and payloads intact
        val wetBytes = graft.sources.WarcDerive.wetFile(Seq(we), gzip = true)
        val watBytes = graft.sources.WarcDerive.watFile(Seq(wa), gzip = false)
        val wetBack = graft.functions.WarcCodec.parseFile(wetBytes)
        val watBack = graft.functions.WarcCodec.parseFile(watBytes)
        val ok = wetBack.length == 1 && watBack.length == 1 &&
          wetBack.head.warcType == "conversion" &&
          watBack.head.warcType == "metadata" &&
          wetBack.head.targetUri == we.target_uri &&
          new String(wetBack.head.payload,
            java.nio.charset.StandardCharsets.UTF_8) == we.text &&
          new String(watBack.head.payload,
            java.nio.charset.StandardCharsets.UTF_8) == wa.meta_json
        (we.target_uri.replaceAll("^.*/doc/", "").toLong,
          we.text, we.text_len, we.charset, wa.title.getOrElse(""),
          wa.n_links, wa.links.headOption.getOrElse(""), wa.meta_json, ok)
      }.toDF("doc_id", "text_out", "text_len", "charset", "title",
        "n_links", "first_link", "meta_json", "ok_wet_roundtrip")
    },

    // ── HITS hubs/authorities (integer fixed-point, L1-normalized):
    // the DIRECTED customer→supplier purchase graph, so the two score
    // axes separate cleanly — customers are pure hubs (auth 0),
    // suppliers pure authorities (hub 0) — and the oracle replays two
    // full unrolled rounds in exact int128 arithmetic. Complements
    // q71/q141's damped-endorsement axis.
    "q168_hits" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ext.Hits.run(edges, "src", "dst", iters = 2)
    },

    // ── synchronous label propagation (2 rounds, symmetrized purchase
    // graph): deterministic mode-label adoption with smallest-label
    // ties, replayed exactly by the oracle's two unrolled rounds —
    // the community-detection axis next to CC (q34) / PageRank (q71).
    "q169_label_propagation" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
      val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.LabelPropagation.run(edges, "src", "dst", iters = 2)
    },

    // ── content-defined chunking (FastCDC) invariants: each doc's
    // 4×-repeated text rides the gear chunker; the oracle-certain
    // properties — exact tiling, [min,max] bounds off the final chunk,
    // bit-determinism of a re-chunk, content-hash integrity — are
    // flag-gated per doc (re-synchronization under edits is measured
    // in ContentChunkingSpec, where a floor can be corpus-calibrated
    // rather than sworn blind). Pure scan stage.
    "q170_cdc_chunks" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val payload = Seq(text, text, text, text).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val cs = graft.ext.ContentChunking.chunk(payload, 32, 64, 128)
          val tile = cs.nonEmpty && cs.head.offset == 0 &&
            cs.sliding(2).forall {
              case Seq(a, b) => a.offset + a.length == b.offset
              case _ => true
            } && cs.last.offset + cs.last.length == payload.length
          val bounds = cs.dropRight(1).forall(c =>
              c.length >= 32 && c.length <= 128) &&
            cs.last.length >= 1 && cs.last.length <= 128
          val det = graft.ext.ContentChunking.chunk(payload, 32, 64, 128) == cs
          val hashOk = cs.forall(c => c.hash ==
            graft.ext.ContentChunking.contentHash(payload, c.offset, c.length))
          (id, tile, bounds, det && hashOk)
        }
        .toDF("doc_id", "tile_ok", "bounds_ok", "det_ok")
    },

    // ── ID3v2 text-frame metadata (TIT2/TPE1/TALB): per doc a real
    // tag — ids rotating tag version × text encoding across all four
    // spec arms (v2.3+Latin-1, v2.3+UTF-16 BOM, v2.4+UTF-16BE,
    // v2.4+UTF-8, the two later encodings being v2.4-only) — fronting
    // a q152-style Layer III frame walk; the parser must recover the
    // exact strings THROUGH the tag grammar (plain vs syncsafe frame
    // sizes, encoding bytes) and the frame walk must still count
    // frames exactly past the tag it skips.
    "q173_mp3_id3" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("source"))
        .as[(Long, String, String)]
        .map { case (id, text, source) =>
          val title = "T" + text.take(20)
          val album = "A" + (id % 7)
          val (v24, enc) = (id % 4) match {
            case 0 => (false, 0)
            case 1 => (false, 1)
            case 2 => (true, 2)
            case _ => (true, 3)
          }
          val tag = graft.functions.Mp3Codec.id3v2TagBytes(
            Seq("TIT2" -> title, "TPE1" -> source, "TALB" -> album),
            v24 = v24, encoding = enc)
          val body = graft.functions.Mp3Codec.mp3Bytes(
            versionBits = 3, bitrateIdx = 9, rateIdx = 0,
            mono = id % 2 == 0, nFrames = (id % 50 + 2).toInt)
          val payload = tag ++ body
          val frames = graft.functions.Mp3Codec.id3v2Frames(payload)
          val m = graft.functions.Mp3Codec.meta(payload)
          (id, frames.getOrElse("TIT2", ""), frames.getOrElse("TPE1", ""),
            frames.getOrElse("TALB", ""), m.map(_.nFrames).getOrElse(-1L))
        }
        .toDF("doc_id", "title", "artist", "album", "n_frames")
    },

    // ── EXIF metadata through a real JPEG APP1 walk: per doc a full
    // IFD0 + Exif sub-IFD (byte order rotating with doc parity,
    // inline SHORT/LONG values, offset-stored ASCII and RATIONAL) is
    // embedded after SOI of a real JpegCodec stream and recovered
    // field-exact; rationals ship as num/den strings (NUMERICS
    // numerator/denominator discipline — never divided).
    "q174_exif_meta" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val meta = graft.functions.ExifCodec.ExifMeta(
            byteOrderLittle = id % 2 == 0,
            orientation = Some((id % 8 + 1).toInt),
            make = Some("CamCo"),
            model = Some("M" + (id % 5)),
            dateTime = Some(s"2026:01:0${id % 9 + 1} 12:00:00"),
            exifWidth = Some(id % 640 + 16),
            exifHeight = Some(id % 480 + 16),
            iso = Some((100 + (id % 8) * 100).toInt),
            exposure = Some(graft.functions.ExifCodec.Rational(1, id % 500 + 1)),
            fNumber = Some(graft.functions.ExifCodec.Rational(id % 10 + 10, 5)))
          val jpeg = graft.functions.JpegCodec.encodeFlatGray(
            16, 16, (_, _) => ((id % 200) + 28).toInt)
          val got = graft.functions.ExifCodec
            .fromJpeg(graft.functions.ExifCodec.withExif(jpeg, meta))
            .getOrElse(graft.functions.ExifCodec.Empty)
          (id,
            got.orientation.map(_.toLong).getOrElse(-1L),
            got.make.getOrElse(""), got.model.getOrElse(""),
            got.dateTime.getOrElse(""),
            got.exifWidth.getOrElse(-1L), got.exifHeight.getOrElse(-1L),
            got.iso.map(_.toLong).getOrElse(-1L),
            got.exposure.map(x => s"${x.num}/${x.den}").getOrElse(""),
            got.fNumber.map(x => s"${x.num}/${x.den}").getOrElse(""))
        }
        .toDF("doc_id", "orientation", "make", "model", "date_time",
          "exif_w", "exif_h", "iso", "exposure", "fnumber")
    },

    // ── ZIP central-directory walk: each doc's text split over
    // k=id%4+1 members (store arm on even ids, deflate on odd) and
    // read back through OUR EOCD→central-directory→local-header parse
    // with per-member CRC verification; total size must re-add to the
    // text length and every member must verify.
    "q175_zip_roundtrip" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val members = (0 until k).map(i =>
            s"m$i" -> text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val zip = graft.functions.ZipCodec.zipBytes(members, store = id % 2 == 0)
          val got = graft.functions.ZipCodec.readAll(zip)
          val okCrc = got.length == k &&
            got.zip(members).forall { case ((gn, gd), (mn, md)) =>
              gn == mn && java.util.Arrays.equals(gd, md)
            }
          (id, got.length.toLong, got.map(_._1).mkString(","),
            graft.functions.ZipCodec.entries(zip).map(_.size).sum, okCrc)
        }
        .toDF("doc_id", "n_entries", "names", "total_size", "ok_crc")
    },

    // ── DOCX text extraction: each doc's text rides a structurally
    // valid OOXML package (content types, rels, document part) split
    // into id%3+1 <w:p> paragraphs, and comes back newline-joined,
    // byte-exact, through the ZIP walk + WordprocessingML text rule.
    "q176_docx_text" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val n = (id % 3 + 1).toInt
          val cuts = (0 to n).map(i => text.length * i / n)
          val paras = (0 until n).map(i => text.substring(cuts(i), cuts(i + 1)))
          val docx = graft.functions.OfficeText.docxBytes(paras)
          (id, n.toLong,
            graft.functions.OfficeText.docxText(docx).getOrElse(""))
        }
        .toDF("doc_id", "n_paras", "text_out")
    },

    // ── XLSX cell extraction: per doc a real SpreadsheetML package —
    // k=id%3+1 rows × m=id%2+2 string columns through a REAL
    // shared-string table plus one untyped numeric column — read back
    // cell-exact through the zip walk + sheet/sst parse. One output
    // row per cell; the oracle rebuilds the grid with range joins.
    "q177_xlsx_cells" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val k = (id % 3 + 1).toInt
          val m = (id % 2 + 2).toInt
          val cells = for (r <- 0 until k; c <- 0 until m) yield
            (r, c, s"c${r}_${c}_$id", false)
          val numeric = (0 until k).map(r => (r, m, (id * 10 + r).toString, true))
          val xlsx = graft.functions.OfficeText.xlsxBytes(cells ++ numeric)
          graft.functions.OfficeText.xlsxCells(xlsx).map(cell =>
            (id, cell.row.toLong, cell.col.toLong, cell.value))
        }
        .toDF("doc_id", "row", "col", "value")
    },

    // ── ISO-BMFF (MP4) box-walk metadata: per doc a structurally real
    // MP4 — ftyp + moov (mvhd, video trak id%5!=4, audio trak id%3!=0,
    // full stbl chain) + free + mdat — is ENCODED and walked back.
    // Ids rotate the grammar arms so every one is under the hash
    // gate: id%5==0 writes version-1 (64-bit) mvhd/tkhd/mdhd,
    // id%4==0 writes mdat in the size==1 largesize form.
    "q178_mp4_meta" -> { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .as[(Long, String)]
        .map { case (id, source) =>
          val vid =
            if (id % 5 != 4) Some(graft.functions.Mp4Codec.VideoSpec(
              "avc1", (id % 320 + 16).toInt, (id % 240 + 16).toInt,
              30000L, 1001L, id % 100 + 1))
            else None
          val aud =
            if (id % 3 != 0) Some(graft.functions.Mp4Codec.AudioSpec(
              "mp4a", (id % 2 + 1).toInt,
              if (id % 3 == 1) 48000 else 32000, 1024L, id % 50 + 1))
            else None
          val payload = graft.functions.Mp4Codec.mp4Bytes(
            if (id % 2 == 0) "isom" else "mp42", 1000L,
            id % 5000 + 1000, vid, aud,
            v1 = id % 5 == 0, largeMdat = id % 4 == 0)
          Multimodal.MediaRow(id, payload, "video/mp4", source)
        }
      Multimodal.mp4Meta(media).toDF()
        .select(col("media_id").as("doc_id"),
          col("major_brand"), col("timescale"), col("duration"),
          col("n_tracks").cast("long").as("n_tracks"),
          col("video_codec"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("v_samples"),
          col("audio_codec"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("a_samples"))
    },

    // ── TAR/ustar archive walk: per doc a real tar of k=id%4+1 text
    // slices (member 0 takes a >100-byte name when id%6==0, carried by
    // the GNU 'L' longname arm when id%4==0 and the pax 'x' path arm
    // otherwise), gzip-wrapped into a .tar.gz when id%2==0 — walked
    // back through gunzip → checksum-verified block walk. Names,
    // sizes, mtimes and a byte-exact payload roundtrip flag are under
    // the hash gate.
    "q179_tar_walk" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 4 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val name0 = if (id % 6 == 0) ("p" * 104) + "/m0" else "m0"
          val members = (0 until k).map { i =>
            val nm = if (i == 0) name0 else s"m$i"
            (nm, text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8),
              id * 100 + i)
          }
          val tar = graft.functions.TarCodec.tarBytes(members,
            gnuLong = id % 4 == 0)
          val payload =
            if (id % 2 == 0) graft.functions.TarCodec.gzip(tar) else tar
          val raw =
            if (id % 2 == 0)
              graft.functions.TarCodec.gunzip(payload)
                .getOrElse(Array.emptyByteArray)
            else payload
          val es = graft.functions.TarCodec.entries(raw)
            .getOrElse(Vector.empty)
          val back = graft.functions.TarCodec.readAll(raw)
          val ok = back.length == k &&
            back.zip(members).forall { case ((gn, gd), (mn, md, _)) =>
              gn == mn && java.util.Arrays.equals(gd, md)
            }
          (id, es.length.toLong, es.map(_.name).mkString(","),
            es.map(_.size).sum, es.map(_.mtime).sum, ok)
        }
        .toDF("doc_id", "n_members", "names", "total_size",
          "sum_mtime", "ok_roundtrip")
    },

    // ── Matroska/WebM (EBML) element walk: per doc a real metadata
    // tree — EBML header, Segment > Info (TimestampScale, Duration)
    // and Tracks — encoded and walked back. id%5==0 writes the
    // Segment with the UNKNOWN-SIZE sentinel (the live-stream shape),
    // so both termination rules are under the hash gate; durations are
    // integers stored in the format's float element (exact in f64).
    "q180_mkv_meta" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val vid =
            if (id % 4 != 3) Some(graft.functions.EbmlCodec.VideoTrackSpec(
              if (id % 3 == 0) "V_VP9"
              else if (id % 3 == 1) "V_AV1" else "V_MPEG4/ISO/AVC",
              id % 1920 + 16, id % 1080 + 16))
            else None
          val aud =
            if (id % 2 == 0) Some(graft.functions.EbmlCodec.AudioTrackSpec(
              "A_OPUS", id % 3 + 1, 48000.0))
            else None
          val b = graft.functions.EbmlCodec.mkvBytes(
            if (id % 2 == 0) "webm" else "matroska", 1000000L,
            (id % 100000 + 1000).toDouble, vid, aud,
            unknownSegment = id % 5 == 0)
          val m = graft.functions.EbmlCodec.meta(b)
          val v = m.flatMap(_.tracks.find(_.trackType == 1L))
          val a = m.flatMap(_.tracks.find(_.trackType == 2L))
          (id, m.map(_.docType), m.map(_.timestampScale),
            m.map(_.durationTicks.toLong), m.map(_.tracks.length.toLong),
            v.map(_.codecId), v.map(_.width), v.map(_.height),
            a.map(_.codecId), a.map(_.channels),
            a.map(_.sampleRate.toLong))
        }
        .toDF("doc_id", "doc_type", "timestamp_scale", "duration_ticks",
          "n_tracks", "video_codec", "width", "height", "audio_codec",
          "channels", "sample_rate")
    },

    // ── Parquet footer decode: Spark WRITES a real parquet file, then
    // the raw bytes are walked back through our own Thrift
    // compact-protocol FileMetaData parse — schema, per-chunk value
    // counts, null counts, min/max statistics — and the oracle
    // recomputes every one of those facts FROM THE DATA. parquet-mr's
    // written statistics sit between the two, so a slip in the zigzag/
    // varint/field-delta walk or the plain-encoded stat decode breaks
    // the hash. This is the engine's data-skipping layer made
    // inspectable: O(footer) per file, no column pages touched.
    "q181_parquet_footer" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_pqf_q181") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 3 - 500).as("v"),
          col("source").as("s"))
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      s.read.format("binaryFile").load(tmp + "/part-*.parquet")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.ParquetFooter.footer(bytes).toSeq.flatMap { fm =>
            fm.rowGroups.flatMap(_.columns)
              .groupBy(c => (c.path, c.physicalType))
              .toSeq.map { case ((path, pt), chunks) =>
                val mins = chunks.flatMap(c => c.minValue.flatMap(
                  graft.functions.ParquetFooter.statAsLong(pt, _)))
                val maxs = chunks.flatMap(c => c.maxValue.flatMap(
                  graft.functions.ParquetFooter.statAsLong(pt, _)))
                (path, pt, chunks.map(_.numValues).sum,
                  chunks.flatMap(_.nullCount).sum,
                  if (mins.nonEmpty) Some(mins.min) else None,
                  if (maxs.nonEmpty) Some(maxs.max) else None)
              }
          }
        }
        .toDF("col_name", "physical_type", "num_values", "null_count",
          "min_v", "max_v")
    },

    // ── protobuf wire-format walk: per doc a real message — varint,
    // zigzag sint, fixed64, string, PACKED repeated varints, and a
    // nested message — encoded and schema-lessly decoded back. Every
    // wire type is on the hash gate.
    "q182_proto_fields" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          import graft.functions.ProtoWire._
          val msg = encode(Seq(
            Field(1, VInt(id)),
            string(2, text.take((id % 20 + 5).toInt)),
            sint(3, -(id + 1)),
            Field(4, Fixed64(id * 1000 + 7)),
            packed(5, Seq(id % 10, id % 100, id % 1000)),
            message(6, Seq(Field(1, VInt(id % 256)),
              string(2, "n" + (id % 7))))))
          val fs = decode(msg).get
          val byNo = fs.groupBy(_.number)
          val title = utf8(byNo(2).head.value.asInstanceOf[Chunk])
          val zz = zigzag(byNo(3).head.value.asInstanceOf[VInt].v)
          val f4 = byNo(4).head.value.asInstanceOf[Fixed64].v
          val psum = packedVarints(
            byNo(5).head.value.asInstanceOf[Chunk]).get.sum
          val inner = nested(byNo(6).head.value.asInstanceOf[Chunk]).get
          (id, byNo(1).head.value.asInstanceOf[VInt].v, title, zz, f4,
            psum, inner(0).value.asInstanceOf[VInt].v,
            utf8(inner(1).value.asInstanceOf[Chunk]))
        }
        .toDF("doc_id", "v1", "title", "zz", "f4", "packed_sum",
          "nested_v", "nested_s")
    },

    // ── CBOR document decode: per doc a real RFC 8949 item — map with
    // int/negint/text/array/bool/float64 members — encoded
    // deterministically; id%4==0 re-frames it through the
    // INDEFINITE-LENGTH array arm (0x9f…0xff) so the streaming
    // framing is on the oracled path too.
    "q183_cbor_doc" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          import graft.functions.CborCodec._
          val nTags = (id % 3 + 1).toInt
          val doc = CMap(Vector(
            CText("id") -> CInt(id),
            CText("neg") -> CInt(-id - 1),
            CText("title") -> CText(text.take((id % 15 + 3).toInt)),
            CText("tags") -> CArr(Vector.tabulate(nTags)(i =>
              CText("t" + ((id + i) % 5)))),
            CText("flag") -> CBool(id % 2 == 0),
            CText("score") -> CFloat((id % 1000) * 0.25)))
          val payload =
            if (id % 4 == 0) encodeIndefiniteArr(Seq(doc))
            else encode(doc)
          val back = decode(payload).get match {
            case CArr(Vector(m: CMap)) => m
            case m: CMap => m
            case _ => CMap(Vector.empty)
          }
          val kv = back.v.collect { case (CText(k), v) => k -> v }.toMap
          (id,
            kv("id").asInstanceOf[CInt].v,
            kv("neg").asInstanceOf[CInt].v,
            kv("title").asInstanceOf[CText].v,
            kv("tags").asInstanceOf[CArr].v.length.toLong,
            kv("tags").asInstanceOf[CArr].v.collect {
              case CText(t) => t }.mkString(","),
            kv("flag").asInstanceOf[CBool].v,
            kv("score").asInstanceOf[CFloat].v)
        }
        .toDF("doc_id", "id_v", "neg_v", "title", "n_tags", "tags",
          "flag", "score")
    },

    // ── TFRecord framing: per doc a real record archive of k=id%3+1
    // text slices, both CRC32Cs verified on the walk back; id%11==0
    // additionally flips one payload byte in a COPY and the gate
    // swears the damaged archive is rejected — the torn-write
    // detection the format exists for, on the oracled path.
    "q184_tfrecord" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val k = (id % 3 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          val recs = (0 until k).map(i =>
            text.substring(cuts(i), cuts(i + 1))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val archive = graft.functions.TfRecordCodec.write(recs)
          val back = graft.functions.TfRecordCodec.records(archive)
            .getOrElse(Vector.empty)
          val ok = back.length == k &&
            back.zip(recs).forall { case (g, w) =>
              java.util.Arrays.equals(g, w)
            }
          val rejected =
            if (id % 11 == 0 && archive.length > 14) {
              val bad = archive.clone()
              bad(12) = (bad(12) ^ 0x01).toByte
              graft.functions.TfRecordCodec.records(bad).isEmpty
            } else false
          (id, back.length.toLong, back.map(_.length.toLong).sum, ok,
            rejected)
        }
        .toDF("doc_id", "n_records", "total_bytes", "ok_roundtrip",
          "rejected_on_damage")
    },

    // ── parquet data-PAGE decode (the read path, not just the
    // footer): Spark writes a SNAPPY parquet file (the default codec,
    // through our own raw-block decompressor) of (doc_id, v, flag)
    // and the raw bytes are walked back to ROWS through our own page
    // decode — Thrift page headers, snappy inflate per page, RLE/
    // bit-packed definition levels on the OPTIONAL column, dictionary
    // + PLAIN value encodings, bit-packed BOOLEAN — and the oracle is
    // simply the source table. A slip anywhere in the page grammar
    // or the snappy tag grammar changes rows and breaks the hash.
    "q185_parquet_pages" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_pqp_q185") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 7 + 1).as("v"),
          (col("doc_id") % 3 === 0).as("flag"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(tmp)
      s.read.format("binaryFile").load(tmp + "/part-*.parquet")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          val ids = graft.functions.ParquetPages
            .readInt64Column(bytes, "doc_id").get
          val vs = graft.functions.ParquetPages
            .readInt64Column(bytes, "v").get
          val fs = graft.functions.ParquetPages
            .readColumn(bytes, "flag").get
          ids.indices.map { i =>
            (ids(i).get, vs(i), fs(i).map(_.asInstanceOf[Boolean]))
          }
        }
        .toDF("doc_id", "v", "flag")
    },

    // ── ORC footer walk: Spark writes a zlib ORC file and the raw
    // tail is decoded back through PostScript → chunked raw-deflate
    // inflate → protobuf Footer — type tree, stripe rows, per-column
    // statistics (ORC's non-null numberOfValues convention, zigzag
    // sint64 min/max/sum incl. negatives) — all recomputed from the
    // data by the oracle.
    "q186_orc_footer" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_orc_q186") + "/t"
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 2 - 300).as("v"),
          col("source").as("s"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "zlib").orc(tmp)
      s.read.format("binaryFile").load(tmp + "/*.orc")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.OrcFooter.footer(bytes).toSeq.flatMap { m =>
            m.columns.map { c =>
              (c.name, c.kind, c.numValues, c.hasNull,
                c.intMin, c.intMax, c.intSum, m.numRows,
                m.stripeRows.sum)
            }
          }
        }
        .toDF("col_name", "kind", "num_values", "has_null", "int_min",
          "int_max", "int_sum", "n_rows", "stripe_rows")
    },

    // ── IDN hostnames (RFC 3492 Punycode): per doc a Unicode host is
    // encoded to its xn-- wire form and decoded back — the oracle
    // rebuilds the Unicode host with chr() arithmetic, so the decode
    // arm is hash-gated (and the encode arm feeds it; its RFC-sample
    // conformance is spec-pinned). The frontier's politeness grouping
    // is only correct if both spellings of a host collapse.
    "q187_idn_host" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val uni = "h" + (0xE0 + id % 16).toChar + "st" + (id % 10) +
            ".example"
          val ascii = graft.functions.Punycode.hostToAscii(uni)
            .getOrElse("")
          val back = graft.functions.Punycode.hostToUnicode(ascii)
            .getOrElse("")
          (id, back, ascii.split('.').head.startsWith("xn--"),
            back == uni)
        }
        .toDF("doc_id", "unicode_host", "is_idn", "roundtrip_ok")
    },

    // ── Avro OCF native read: the REFERENCE avro library writes the
    // container (via sources.AvroTables); our dependency-free walk —
    // metadata map, schema JSON parse, zigzag/length-prefixed binary
    // records, per-block sync verification — decodes it back to ROWS,
    // and the oracle is the source table. Cross-engine in the
    // opposite direction from q185 (library writer, native reader).
    "q188_avro_ocf" -> { (s, dir) =>
      import s.implicits._
      val tmp = scratchDir("graft_avro_q188") + "/t"
      graft.sources.AvroTables.write(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            when(col("doc_id") % 6 === 0, lit(null).cast("long"))
              .otherwise(col("doc_id") * 11 - 40).as("v"),
            (col("doc_id") % 4 === 0).as("flag"))
          .coalesce(1),
        tmp)
      s.read.format("binaryFile").load(tmp + "/*.avro")
        .select(col("content")).as[Array[Byte]]
        .flatMap { bytes =>
          graft.functions.AvroOcf.readRows(bytes)
            .getOrElse(Vector.empty)
            .map { r =>
              (r(0).get.asInstanceOf[Long],
                r(1).map(_.asInstanceOf[Long]),
                r(2).map(_.asInstanceOf[Boolean]))
            }
        }
        .toDF("doc_id", "v", "flag")
    },

    // ── Arrow IPC native read: per PARTITION the arrow reference
    // library (arrow-java, the Spark classpath's pandas-UDF interop
    // dependency) writes a real IPC file in memory, and our own
    // flatbuffers walk — vtables, unions, Block index, validity
    // bitmaps, offset+data Utf8 — decodes it back to rows inside the
    // same scan stage. Library writer → native reader, the q188
    // direction, for the format ML loaders actually exchange.
    "q189_arrow_ipc" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 8 === 0, lit(null).cast("long"))
            .otherwise(col("doc_id") * 13 + 5).as("v"),
          concat(lit("t"), (col("doc_id") % 9).cast("string")).as("s"))
        .as[(Long, Option[Long], String)]
        .mapPartitions { rows =>
          val buf = rows.toVector
          if (buf.isEmpty) Iterator.empty
          else {
            import org.apache.arrow.vector._
            import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
            import scala.jdk.CollectionConverters._
            val alloc = new org.apache.arrow.memory.RootAllocator()
            val schema = new Schema(List(
              new Field("doc_id", FieldType.notNullable(
                new ArrowType.Int(64, true)), null),
              new Field("v", FieldType.nullable(
                new ArrowType.Int(64, true)), null),
              new Field("s", FieldType.nullable(
                new ArrowType.Utf8()), null)).asJava)
            val root = VectorSchemaRoot.create(schema, alloc)
            val bos = new java.io.ByteArrayOutputStream()
            val w = new org.apache.arrow.vector.ipc.ArrowFileWriter(
              root, null, java.nio.channels.Channels.newChannel(bos))
            w.start()
            root.allocateNew()
            val idV = root.getVector("doc_id").asInstanceOf[BigIntVector]
            val vV = root.getVector("v").asInstanceOf[BigIntVector]
            val sV = root.getVector("s").asInstanceOf[VarCharVector]
            buf.zipWithIndex.foreach { case ((id, v, str), r) =>
              idV.setSafe(r, id)
              v match {
                case Some(x) => vV.setSafe(r, x)
                case None => vV.setNull(r)
              }
              sV.setSafe(r, str.getBytes("UTF-8"))
            }
            root.setRowCount(buf.length)
            w.writeBatch()
            w.end(); w.close(); root.close(); alloc.close()
            graft.functions.ArrowIpc.readRows(bos.toByteArray)
              .getOrElse(Vector.empty)
              .iterator
              .map { r =>
                (r(0).get.asInstanceOf[Long],
                  r(1).map(_.asInstanceOf[Long]),
                  r(2).map(_.asInstanceOf[String]))
              }
          }
        }
        .toDF("doc_id", "v", "s")
    },

    // ── Wikipedia dump walk (.xml.bz2): per doc a real MediaWiki
    // export of k=id%3+1 pages is built, bzip2-compressed by the
    // commons-compress reference writer (MULTISTREAM concatenation —
    // the actual Wikipedia layout — when id%4==0), inflated back
    // through our own bzip2 decoder (Huffman groups → MTF/RLE2 →
    // inverse BWT → RLE1, block CRCs verified) and page-walked.
    // Titles/ns/ids and the byte-exact wikitext (entities included:
    // the doc text's '&'/'<' pass through escape→unescape) are under
    // the hash gate.
    "q190_wiki_dump" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val k = (id % 3 + 1).toInt
          val cuts = (0 to k).map(i => text.length * i / k)
          def esc(x: String) = x.replace("&", "&amp;")
            .replace("<", "&lt;").replace(">", "&gt;")
          def pageXml(i: Int): String = {
            val body = text.substring(cuts(i), cuts(i + 1))
            s"""<page>
               |  <title>Doc $id part $i</title>
               |  <ns>${(id + i) % 16}</ns>
               |  <id>${id * 10 + i}</id>
               |  <revision><id>${id * 100 + i}</id>
               |  <text xml:space="preserve">${esc(body)}</text>
               |  </revision>
               |</page>""".stripMargin
          }
          val pagesXml = (0 until k).map(pageXml)
          def bz(x: String): Array[Byte] = {
            val bos = new java.io.ByteArrayOutputStream()
            val o = new org.apache.commons.compress.compressors.bzip2
              .BZip2CompressorOutputStream(bos, 1)
            o.write(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            o.close()
            bos.toByteArray
          }
          val payload =
            if (id % 4 == 0 && k > 1)
              bz("<mediawiki>\n" + pagesXml.head) ++
                bz(pagesXml.tail.mkString("\n") + "\n</mediawiki>")
            else
              bz("<mediawiki>\n" + pagesXml.mkString("\n") +
                "\n</mediawiki>")
          graft.functions.WikiDump.pagesFromBzip2(payload)
            .getOrElse(Vector.empty)
            .zipWithIndex
            .map { case (p, i) =>
              (id, i.toLong, p.title, p.ns.toLong, p.pageId, p.text)
            }
        }
        .toDF("doc_id", "page_idx", "title", "ns", "page_id", "text")
    },

    // ── wikitext→text strip rule under the oracle (q61's decoration
    // pattern): known markup — heading, nested template, comment,
    // plain and piped links, a dropped File: link, emphasis, a list
    // bullet — is wrapped around the doc text at arithmetic
    // positions, and the oracle states the stripped result directly.
    // A strip rule that eats content or leaks markers breaks the hash.
    "q191_wikitext_strip" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          val half = text.length / 2
          val a = text.substring(0, half)
          val b = text.substring(half)
          val wikitext =
            s"== Section $id ==\n" +
              s"{{infobox|id=$id|inner={{nested|${id % 7}}}}}\n" +
              "{| class=\"wikitable\"\n|-\n! h\n" +
              s"| cell $id || v${id % 3}\n|}\n" +
              s"$a<!-- note $id -->\n" +
              s"''italic'' [[Target $id]] and [[P$id|alias ${id % 5}]] " +
              s"[[File:F$id.png|thumb|cap]]\n" +
              s"fact $id<ref name=\"n$id\">{{cite|web $id}}</ref>" +
              s" tail<ref group=g$id />\n" +
              s"* item $id\n" +
              s"[[Category:C${id % 11}]][[fr:Article $id]]" +
              s"[[de:Artikel $id|shown ${id % 9}]]\n" +
              b
          val stripped = graft.functions.WikiDump.stripMarkup(wikitext)
          (id, stripped)
        }
        .toDF("doc_id", "stripped")
    },

    // ── the RANGED-SPLIT Wikipedia read under the oracle: a real
    // multistream archive (8 bzip2 streams × 5 pages, commons-compress
    // reference writer) is assembled on disk from docs 0-39 (a
    // CONSTANT 40-row driver assembly at every SF — fixture scaffolding
    // in the q181 write-path tradition), then read back through
    // WikiSource.pages — the production path: distributed signature
    // scan → lead()-window extents → one ranged decode task per
    // stream. `n_streams` rides every row, so the oracle hashes the
    // FAN-OUT contract (8 extents, not 1) along with every page's
    // id/title/body round trip.
    "q192_wiki_split_read" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1) // constant 40 rows
      def esc(x: String) = x.replace("&", "&amp;")
        .replace("<", "&lt;").replace(">", "&gt;")
      def pageXml(id: Long, text: String): String =
        s"""<page>
           |  <title>Doc $id</title>
           |  <ns>0</ns>
           |  <id>${id * 10 + 1}</id>
           |  <revision><id>${id * 100 + 1}</id>
           |  <text xml:space="preserve">${esc(text)}</text>
           |  </revision>
           |</page>""".stripMargin
      def bz(x: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val o = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorOutputStream(bos, 1)
        o.write(x.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        o.close()
        bos.toByteArray
      }
      val streams = docs.grouped(5).zipWithIndex.map { case (g, i) =>
        bz((if (i == 0) "<mediawiki>\n" else "") +
          g.map { case (id, t) => pageXml(id, t) }.mkString("\n") +
          (if (i == 7) "\n</mediawiki>" else ""))
      }.toSeq
      val file = java.nio.file.Paths
        .get(scratchDir("graft_wiki_q192"), "multi.xml.bz2")
      java.nio.file.Files.write(file, streams.reduce(_ ++ _))
      val nStreams = graft.sources.WikiSource
        .streamExtents(s, file.toString).count()
      graft.sources.WikiSource.pages(s, file.toString)
        .select((col("page_id") / 10).cast("long").as("doc_id"),
          col("title"), col("text").as("body"),
          lit(nStreams).as("n_streams"))
    },

    // ── the CDX-extent ranged WARC read under the oracle: a real
    // one-member-per-record .warc.gz (24 responses from docs 0-23,
    // constant-size driver assembly) lands on disk, its index is built
    // by the production indexer, and readIndexed fans the ONE archive
    // out across offset bands of 2 KiB — many ranged reads, never the
    // whole file. The oracle hashes every record's identity + entity
    // round trip and the >1-band fan-out flag.
    "q193_warc_ranged_read" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id") < 24)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)].collect().sortBy(_._1) // constant 24 rows
      val records = docs.map { case (id, t) =>
        graft.functions.WarcCodec.responseRecord(
          s"<urn:uuid:q193-$id>", s"https://example.org/doc/$id",
          "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
          t.substring(0, math.min(64, t.length))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }.toSeq
      val bytes = graft.functions.WarcCodec.file(records, gzip = true)
      val file = java.nio.file.Paths
        .get(scratchDir("graft_warc_q193"), "crawl.warc.gz")
      java.nio.file.Files.write(file, bytes)
      val split = 2048L
      val index = graft.sources.WarcSource.index(
        s.createDataset(Seq((file.toString, bytes))))
      val fanout = index.select((col("offset") / split).cast("long"))
        .distinct().count() > 1
      graft.sources.WarcSource.readIndexed(index, splitBytes = split)
        .select(col("record_index").cast("long").as("record_index"),
          col("target_uri"), col("http_status").cast("long").as("status"),
          col("payload").cast("string").as("body"),
          lit(if (fanout) 1L else 0L).as("fanout"))
    },

    // ── G.711 µ-law/A-law WAV decode under the oracle (q82's
    // arithmetic-oracle family): per doc, 48 coded bytes are built by
    // arithmetic, wrapped as REAL format-7 and format-6 WAV files
    // (fact chunk and all), and decoded through the production
    // wavSamples16 path. The ORACLE restates both ITU-T G.711 segment
    // expansions as DuckDB integer bit arithmetic — so the Spark-side
    // decode is pinned twice over: byte-exact vs the JDK converters in
    // the spec, and formula-exact vs an independent SQL restatement
    // here. Integer-only stats, no floats under the hash.
    "q194_g711_wav_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val coded = Array.tabulate[Byte](48)(i =>
            ((id * 31 + i * 7) % 256).toByte)
          val mu = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(7, 1, 8000, 8, coded))
            .get.samples
          val al = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(6, 1, 8000, 8, coded))
            .get.samples
          def sum(a: Array[Short]) = a.iterator.map(_.toLong).sum
          def sumSq(a: Array[Short]) = a.iterator.map(v => v.toLong * v).sum
          def peak(a: Array[Short]) = a.iterator.map(v => math.abs(v.toLong)).max
          (id, sum(mu), sumSq(mu), peak(mu), sum(al), peak(al))
        }
        .toDF("doc_id", "mu_sum", "mu_sumsq", "mu_peak", "a_sum", "a_peak")
    },

    // ── IEEE-float32 WAV decode under the oracle: per doc, 32 float
    // samples on the odd/32 grid x_i = (2i + (doc_id % 9)*2 - 39)/32
    // (odd numerators ⇒ x·32767 never lands on an exact .5, so
    // half-up and half-away rounding agree across engines; the grid
    // also crosses ±1 so the clamp arm is under the hash). The floats
    // ride a real format-3 WAV (fact chunk and all) through
    // wavSamples16; the oracle recomputes round(clamp(x)·32767) in
    // plain SQL. Deterministic: i/32 and the products are exact in
    // float64 and the float32 payload values are exactly
    // representable (n/32 with |n| < 2^24).
    "q195_float_wav_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select(col("doc_id"))
        .as[Long]
        .map { id =>
          val off = (id % 9).toInt * 2 - 39
          val floats = Array.tabulate(32)(i => (2 * i + off) / 32.0f)
          val body = java.nio.ByteBuffer.allocate(4 * floats.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          floats.foreach(body.putFloat)
          val pcm = graft.functions.AudioHeaders.wavSamples16(
            graft.functions.AudioHeaders.wavBytesFmt(3, 1, 48000, 32,
              body.array())).get.samples
          (id, pcm.iterator.map(_.toLong).sum,
            pcm.iterator.map(v => math.abs(v.toLong)).max,
            pcm.iterator.map(_.toLong).min)
        }
        .toDF("doc_id", "f_sum", "f_peak", "f_min")
    },

    // ── CHECK constraints under the oracle (invariant form): a txlog
    // table takes a valid leg, gains a constraint, REJECTS a violating
    // append (the table must be byte-identical after the veto — caught
    // exception + version check, q142-style: a missed veto poisons the
    // `enforced` column so the hash goes red loudly), accepts a valid
    // leg under the constraint, then drops it and accepts the formerly
    // vetoed leg. The oracle restates the surviving row set in SQL.
    "q196_txlog_constraint_gate" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q196"))
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 0))
      t.addConstraint("id_mod3", "event_id % 3 = 0")
      val vPre = t.currentVersion
      val vetoed =
        try { t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1)); false }
        catch { case _: Exception => t.currentVersion == vPre }
      // a valid leg under the live constraint (ids ≡2 mod 3, shifted +1)
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .withColumn("event_id", col("event_id") + 1))
      t.dropConstraint("id_mod3")
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1))
      t.read().withColumn("enforced", lit(if (vetoed) 1L else 0L))
    },

    // ── COPY INTO under the oracle (idempotency form): three landing
    // files arrive in two waves; copyInto runs FOUR times (two exact
    // replays among them) and the final table must hold every landed
    // row EXACTLY once, with the ingested-file census on each row.
    "q197_txlog_copy_into" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q197")
      val land = root + "/land"
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
      docs.filter(col("doc_id") < 20).coalesce(1)
        .write.parquet(land + "/f1")
      docs.filter(col("doc_id") >= 20 && col("doc_id") < 40).coalesce(1)
        .write.parquet(land + "/f2")
      val t = new graft.sources.TxLogTable(s, root + "/table")
      t.ensureExists(docs.schema)
      val glob = land + "/f*/part-*.parquet"
      t.copyInto(glob)
      t.copyInto(glob) // exact replay: must be a no-op
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 60).coalesce(1)
        .write.parquet(land + "/f3")
      t.copyInto(glob) // only f3 is fresh
      t.copyInto(glob) // replay again
      t.read().withColumn("n_files", lit(t.copiedFiles.size.toLong))
    },

    // ── TIME TRAVEL under the oracle: three appends land as three
    // versions; the query reads the table AS OF the middle one (by
    // version AND by its commit timestamp — both must agree), so the
    // oracle pins that later commits cannot disturb an old snapshot.
    // The third leg rides a DELETE too, proving the pre-delete
    // snapshot still shows the deleted rows.
    "q198_txlog_time_travel" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q198"))
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 0)) // v1
      val v2 = t.append(ev.filter(pmod(col("event_id"), lit(4)) === 1))
      val ts2 = t.history().find(_._1 == v2).get._3
      // make v3's commit millisecond strictly later so the as-of read
      // of ts2 is unambiguous
      while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 2)) // v3
      t.delete(col("event_id") % 4 === 0) // v4: wipes the v1 leg
      val byVersion = t.readAt(v2)
      val byTime = t.readAsOf(ts2)
      // both reads must agree — union the version read with the
      // timestamp read's anti-diff (empty when equal), so a divergence
      // poisons the row count
      byVersion.unionAll(byTime.exceptAll(byVersion))
        .select(col("event_id"), col("user_id"),
          col("value").cast("double").as("value"))
    },

    // ── SCHEMA EVOLUTION reads under the oracle: three appends with
    // three different column sets (base, +value, −user_id). The final
    // read surfaces the UNION schema with nulls exactly where each
    // leg's files lack the column — the additive-evolution contract
    // restated row-for-row in SQL.
    "q199_txlog_schema_evolution" -> { (s, dir) =>
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q199"))
      val ev = Tables.events(s, dir)
      val base = ev.select(col("event_id"), col("user_id"))
      t.ensureExists(base.schema)
      t.append(base.filter(pmod(col("event_id"), lit(3)) === 0))
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 1)
        .select(col("event_id"), col("user_id"), col("value")))
      t.append(ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .select(col("event_id"), col("value")))
      t.read().select(col("event_id"), col("user_id"),
        col("value").cast("double").as("value"))
    },

    // ── the CAPSTONE composition gate: crawl container → extract →
    // quality gate → exact dedup → constrained transactional store →
    // snapshot read, end to end under ONE oracle. Every doc becomes a
    // single-record .warc.gz whose body is text(doc_id % 400) — so
    // bodies repeat by construction and the dedup leg has real work —
    // parsed back through WarcSource, UTF-8 round-tripped, gated on
    // length, deduped to min(doc_id) per body, appended into a txlog
    // table under a CHECK constraint, and read back as the snapshot.
    // All stages are the production operators; the oracle restates the
    // surviving set from the documents table alone.
    "q200_corpus_pipeline" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val bodies = docs.as("d")
        .join(docs.as("b"),
          col("d.doc_id") % 400 === col("b.doc_id"), "inner")
        .select(col("d.doc_id").as("doc_id"), col("b.text").as("body"))
      // crawl leg: one single-record gzip WARC per doc, parsed back
      val archives = bodies.as[(Long, String)].map { case (id, body) =>
        (s"mem://w$id.warc.gz",
          graft.functions.WarcCodec.file(Seq(
            graft.functions.WarcCodec.responseRecord(
              s"<urn:uuid:q200-$id>", s"https://example.org/p/$id",
              "2026-01-01T00:00:00Z", 200, "OK", "text/plain",
              body.getBytes(java.nio.charset.StandardCharsets.UTF_8))),
            gzip = true))
      }
      val fetched = graft.sources.WarcSource.responses(
        graft.sources.WarcSource.fromBytes(archives))
        .select(
          regexp_extract(col("target_uri"), "/p/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          col("payload").cast("string").as("body"))
      // quality gate + exact dedup (min doc_id wins per body)
      val kept = fetched
        .filter(length(col("body")) >= 64)
        .groupBy(col("body"))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"),
          length(col("body")).cast("long").as("body_len"),
          size(regexp_extract_all(col("body"), lit("\\S+"), lit(0)))
            .cast("long").as("n_tokens"),
          col("body"))
      // constrained transactional store, then the snapshot IS the result
      val t = new graft.sources.TxLogTable(s,
        scratchDir("graft_txlog_q200"))
      t.ensureExists(kept.drop("body").schema)
      t.addConstraint("tokens_positive", "n_tokens > 0")
      t.append(kept.drop("body"))
      t.read()
    },

    // ── the SQL-DML surface, gate 1 of 4: MERGE INTO as a STATEMENT
    // (the reference's own idiom — its upserts are SQL strings,
    // pull_new_sales_list.py:252-264) routed through the parser
    // extension to the same oracled mergeConditional as q119. Same
    // seed, same clauses, same oracle — a routing slip anywhere in
    // parse → clause mapping → key extraction → execution breaks the
    // hash against q119's replay.
    "q201_sql_txlog_merge" -> { (s, dir) =>
      val ord = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      val target = ord.filter(pmod(col("o_orderkey"), lit(3)) =!= 0)
      val src = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double").as("new_price"),
          (max(when(col("l_returnflag") === "R", 1).otherwise(0)) === 1)
            .as("has_return"))
        .join(ord.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus")), Seq("o_orderkey"))
        .withColumn("o_totalprice", col("new_price"))
      val root = scratchDir("graft_txlog_q201")
      val t = new graft.sources.TxLogTable(s, root)
      t.ensureExists(target.schema)
      t.append(target)
      src.createOrReplaceTempView("q201_merge_src")
      graft.plans.GraftSql.sql(s,
        s"""MERGE INTO txlog.`$root` AS tgt USING q201_merge_src AS src
           |ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED AND src.has_return THEN DELETE
           |WHEN MATCHED AND src.new_price > tgt.o_totalprice
           |  THEN UPDATE SET *
           |WHEN NOT MATCHED AND NOT src.has_return THEN INSERT *
           |""".stripMargin).collect()
      graft.plans.GraftSql.sql(s,
        s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM txlog.`$root`""".stripMargin)
    },

    // ── SQL-DML gate 2: UPDATE + DELETE statements (q135's twin), the
    // final aggregate ALSO through SQL over the `txlog.`path`` read
    // substitution — statement-only end to end.
    "q202_sql_txlog_dml" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val root = scratchDir("graft_txlog_q202")
      val t = new graft.sources.TxLogTable(s, root)
      t.ensureExists(ev.schema)
      t.append(ev)
      graft.plans.GraftSql.sql(s,
        s"""UPDATE txlog.`$root` SET value = value * 2 + 1
           |WHERE event_type = 'click' AND value IS NOT NULL""".stripMargin)
        .collect()
      graft.plans.GraftSql.sql(s,
        s"DELETE FROM txlog.`$root` WHERE event_type = 'error'").collect()
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_type, count(*) AS n_events,
           |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
           |FROM txlog.`$root` GROUP BY event_type""".stripMargin)
    },

    // ── SQL-DML gate 3: time travel as SQL (q198's twin) — VERSION AS
    // OF and TIMESTAMP AS OF must agree, pinned by the same
    // union+except construction, all expressed as one statement.
    "q203_sql_txlog_time_travel" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q203")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 0)) // v1
      val v2 = t.append(ev.filter(pmod(col("event_id"), lit(4)) === 1))
      val ts2 = t.history().find(_._1 == v2).get._3
      while (System.currentTimeMillis() <= ts2) Thread.sleep(1)
      t.append(ev.filter(pmod(col("event_id"), lit(4)) === 2)) // v3
      graft.plans.GraftSql.sql(s,
        s"DELETE FROM txlog.`$root` WHERE event_id % 4 = 0").collect()
      val iso = java.time.Instant.ofEpochMilli(ts2).toString
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           |FROM txlog.`$root` VERSION AS OF $v2
           |UNION ALL
           |(SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           | FROM txlog.`$root` TIMESTAMP AS OF '$iso'
           | EXCEPT ALL
           | SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           | FROM txlog.`$root` VERSION AS OF $v2)""".stripMargin)
    },

    // ── SQL-DML gate 4: INSERT INTO / INSERT OVERWRITE statements —
    // positional-cast semantics onto the table schema, overwrite
    // resetting the live set, appends landing after it.
    "q204_sql_txlog_insert" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q204")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      ev.createOrReplaceTempView("q204_events")
      def run(sql: String): Unit =
        { graft.plans.GraftSql.sql(s, sql).collect(); () }
      run(s"""INSERT INTO txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 2 = 0""".stripMargin)
      run(s"""INSERT OVERWRITE txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 3 = 0""".stripMargin)
      run(s"""INSERT INTO txlog.`$root`
             |SELECT event_id, user_id, value FROM q204_events
             |WHERE event_id % 3 = 1""".stripMargin)
      graft.plans.GraftSql.sql(s,
        s"""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
           |FROM txlog.`$root`""".stripMargin)
    },

    // ── DYNAMIC FILE PRUNING under the oracle: a range-clustered
    // txlog fact (lineitem, 16 files with per-file l_orderkey ranges +
    // blooms) joined to a 3-ROW dimension. No static predicate exists
    // on the join key, so without the rewrite every file is scanned;
    // the rule executes the dim's keys at planning time and prunes the
    // file list through the manifest stats. The oracle replays the
    // join exactly — pruning must be invisible to the result — and
    // TxLogDfpSpec pins the files-skipped effectiveness on the same
    // construction.
    "q205_txlog_dynamic_pruning" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q205")
      val t = new graft.sources.TxLogTable(s, root)
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
      t.ensureExists(li.schema)
      t.append(li)
      t.compactClustered(Seq("l_orderkey"), numFiles = 16,
        statsCols = Seq("l_orderkey"))
      val fact = s.read.format("txlog").load(root)
      // deterministic handful-of-rows dim (no static fact predicate)
      val dimKeys = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 997 === 1)
        .select(col("o_orderkey"), col("o_custkey"))
      val joined = fact.join(dimKeys,
          fact("l_orderkey") === dimKeys("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            .as("sum_qty"))
      graft.plans.TxLogDynamicFilePruning.prune(joined)
    },

    // ── the CBO statistics census under the oracle: the manifest-
    // aggregated table stats (exact row count, typed min/max fold,
    // null counts — what TxLogCboStats hands Catalyst) restated by
    // DuckDB directly from the raw table. Stats ride two commits (one
    // plain, one clustered overwrite with its own sidecars), so the
    // chain fold is under the hash, not just a single commit's
    // numbers. NDV is sketch-estimated (±4%) and therefore gated by
    // TxLogCboStatsSpec's error band, not a value oracle.
    "q206_txlog_stats_census" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q206")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        statsCols = Seq("event_id", "value"))
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 1),
        statsCols = Seq("event_id", "value"))
      val (rows, ranges, _) = t.statsSummaryAt(t.currentVersion).get
      val r = ranges("event_id")
      val v = ranges("value")
      import s.implicits._
      Seq((rows, r.min.get.toLong, r.max.get.toLong, r.nulls,
        v.nulls)).toDF("n_rows", "min_event", "max_event",
        "event_nulls", "value_nulls")
    },

    // ── maintenance SQL statements (the Delta idioms Spark's grammar
    // lacks): OPTIMIZE ... ZORDER BY rewrites the two-append table
    // into 8 stat-carrying z-clustered files; VACUUM FULL then
    // collects exactly the two pre-optimize dirs (deterministic — one
    // staged dir per append); DESCRIBE HISTORY counts the four
    // commits (create + 2 appends + optimize). The data aggregate
    // rides the post-optimize snapshot, so the zorder rewrite is
    // under the value hash and the maintenance counts pin the
    // statement semantics.
    "q207_sql_txlog_maintenance" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q207")
      val t = new graft.sources.TxLogTable(s, root)
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      t.ensureExists(li.schema)
      t.append(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
      t.append(li.filter(pmod(col("l_orderkey"), lit(2)) === 1))
      def sql(q: String) = graft.plans.GraftSql.sql(s, q)
      sql(s"OPTIMIZE txlog.`$root` ZORDER BY (l_orderkey, l_partkey) " +
        "INTO 8 FILES").collect()
      val removed = sql(s"VACUUM txlog.`$root` FULL RETAIN 0 HOURS").count()
      val commits = sql(s"DESCRIBE HISTORY txlog.`$root`").count()
      sql(s"""SELECT l_orderkey % 100 AS okey_bucket,
             |  count(*) AS n_items,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             |    AS sum_qty
             |FROM txlog.`$root` GROUP BY l_orderkey % 100""".stripMargin)
        .withColumn("n_removed", lit(removed))
        .withColumn("n_commits", lit(commits))
    },

    // ── the CATALOG path: `CREATE TABLE ... USING txlog` then INSERT
    // INTO / INSERT OVERWRITE / SELECT by TABLE NAME — Spark's own
    // catalog resolution over the registered DataSource (no graft
    // parser involved), exercising the V1 InsertableRelation seam the
    // reference's SQL-first user would hit. refreshTable between
    // writes pins that the catalog cache never serves a stale
    // snapshot.
    "q208_sql_txlog_catalog" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q208")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"))
      new graft.sources.TxLogTable(s, root).ensureExists(ev.schema)
      s.sql("DROP TABLE IF EXISTS q208_cat")
      s.sql(s"CREATE TABLE q208_cat USING txlog OPTIONS (path '$root')")
      ev.createOrReplaceTempView("q208_ev")
      s.sql("""INSERT INTO q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 2 = 0""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""INSERT OVERWRITE TABLE q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 3 = 0""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""INSERT INTO q208_cat
              |SELECT event_id, user_id, value FROM q208_ev
              |WHERE event_id % 3 = 1""".stripMargin)
      s.catalog.refreshTable("q208_cat")
      s.sql("""SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
              |FROM q208_cat""".stripMargin)
    },

    // ── DESCRIBE DETAIL under the oracle: the snapshot-summary row
    // (version, live file count, exact stats-covered row count,
    // required reader protocol) with every field deterministic by
    // construction — two single-file stats-bearing appends — and
    // restated by DuckDB from the raw table. Pins that the summary
    // the CBO/introspection surface reports is the truth, not an
    // estimate.
    "q209_sql_txlog_detail" -> { (s, dir) =>
      val root = scratchDir("graft_txlog_q209")
      val t = new graft.sources.TxLogTable(s, root)
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"))
      t.ensureExists(ev.schema)
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 0).coalesce(1),
        statsCols = Seq("event_id"))
      t.append(ev.filter(pmod(col("event_id"), lit(2)) === 1).coalesce(1),
        statsCols = Seq("event_id"))
      graft.plans.GraftSql.sql(s, s"DESCRIBE DETAIL txlog.`$root`")
        .select(col("version"), col("num_files"), col("num_rows"),
          col("min_reader").cast("long").as("min_reader"))
    }
  )

  private val tokRe = "\\S+"

  private val oracleBase: Map[String, String] = Map(
    // parser∘encoder identity: the oracle recomputes the dims the Spark
    // side ENCODED into real PNG/JPEG header bytes and then PARSED back
    "q06_image_headers" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  doc_id % 640 + 16 AS width,
        |  doc_id % 480 + 16 AS height
        |FROM documents""".stripMargin,

    "q80_audio_headers" ->
      """SELECT doc_id,
        |  doc_id % 2 + 1 AS channels,
        |  8000 + (doc_id % 5) * 8000 AS sample_rate,
        |  doc_id % 1000 + 1 AS n_frames
        |FROM documents""".stripMargin,

    // pixel-kernel identity: the oracle replays the synthetic raster's
    // integer pixel formula; the Spark side must recover it through a
    // real PNG encode→decode (deflate, filters, CRCs)
    "q81_png_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((d.doc_id + 3*x.i + 7*y.i) % 256)
        |         + 587*((2*d.doc_id + 5*x.i + y.i) % 256)
        |         + 114*((3*d.doc_id + x.i + 11*y.i) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // lossy-format identity: the oracle replays the flat-block value
    // formulas and the JFIF YCbCr→RGB matrix (identical double
    // expressions → identical IEEE results → floor agrees); the Spark
    // side must recover them through a real JPEG entropy encode→decode
    "q84_jpeg_pixel_stats" ->
      """WITH px AS (
        |  SELECT d.doc_id AS doc_id, x.i AS x, y.i AS y,
        |    (d.doc_id + 5*(x.i//16)) % 256 AS yv,
        |    (2*d.doc_id + 11*(x.i//16)) % 256 AS cb,
        |    (3*d.doc_id + 7*(x.i//16)) % 256 AS cr
        |  FROM documents d
        |  JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |  JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4),
        |rgb AS (
        |  SELECT doc_id, x, y,
        |    least(255, greatest(0, CAST(floor(yv + 1.402*(cr-128) + 0.5) AS BIGINT))) AS r,
        |    least(255, greatest(0, CAST(floor(yv - 0.344136*(cb-128) - 0.714136*(cr-128) + 0.5) AS BIGINT))) AS g,
        |    least(255, greatest(0, CAST(floor(yv + 1.772*(cb-128) + 0.5) AS BIGINT))) AS b
        |  FROM px)
        |SELECT doc_id,
        |  doc_id % 16 + 4 AS width,
        |  doc_id % 12 + 4 AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS channels,
        |  (doc_id % 16 + 4) * (doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(CASE WHEN doc_id % 2 = 0
        |    THEN 1000*((doc_id + 7*(x//8) + 13*(y//8)) % 256)
        |    ELSE 299*r + 587*g + 114*b END) AS BIGINT) AS luma_sum
        |FROM rgb GROUP BY doc_id""".stripMargin,

    // progressive identity: the successive-approximation round-trip is
    // lossless on flat blocks, so the oracle is q84's gray arithmetic
    // verbatim — the engine side must recover it through the four-scan
    // progressive decode instead of the baseline path
    "q113_jpeg_progressive_stats" ->
      """SELECT d.doc_id AS doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(1000*((d.doc_id + 7*(x.i//8) + 13*(y.i//8)) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // frame-level identity: one oracle row per (doc, frame) replaying
    // the flat-block formula; the Spark side must recover it through
    // the AVI container walk plus a per-frame JPEG entropy decode
    "q85_mjpeg_frame_stats" ->
      """SELECT d.doc_id, f.i AS frame_idx,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(1000*((d.doc_id + 17*f.i + 7*(x.i//8) + 13*(y.i//8)) % 256)) AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 6) f(i) ON f.i < d.doc_id % 4 + 2
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id, f.i""".stripMargin,

    // resample identity: the oracle replays the integer interpolation
    // (idx/frac split, truncating `//` — same semantics as JVM int
    // division) over the synthetic sample formula; the Spark side must
    // recover it through WAV decode → kernel → WAV encode → stats
    "q86_pcm_resample" ->
      """WITH p AS (
        |  SELECT d.doc_id AS doc_id,
        |    d.doc_id % 200 + 50 AS n,
        |    8000 + (d.doc_id % 5) * 4000 AS src
        |  FROM documents d),
        |g AS (
        |  SELECT doc_id, n, src, j.i AS j,
        |    (j.i * src) // 16000 AS idx,
        |    (j.i * src) % 16000 AS frac
        |  FROM p JOIN range(0, 500) j(i) ON j.i < (n * 16000) // src),
        |v AS (
        |  SELECT doc_id, j,
        |    ((doc_id*31 + idx*17) % 65536 - 32768)
        |      + (((doc_id*31 + least(idx+1, n-1)*17) % 65536 - 32768)
        |         - ((doc_id*31 + idx*17) % 65536 - 32768)) * frac // 16000 AS val
        |  FROM g)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(val*val) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN val IN (-32768, 32767) THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(abs(val)) AS BIGINT) AS peak
        |FROM v GROUP BY doc_id""".stripMargin,

    // extraction identity: the oracle replays escape→wrap→extract with
    // the identical regex chain (Java∩RE2 subset) and literal replaces
    "q87_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><style>p{margin:0}</style><script>var id='
        |      || CAST(doc_id AS VARCHAR)
        |      || ';document.write("<b>x</b>");</script></head><body><h1>Doc '
        |      || CAST(doc_id AS VARCHAR) || '</h1><p>'
        |      || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
        |      || '</p><div class="footer">&copy; 2026 &amp; co</div></body></html>' AS html
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, html,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS clean_text
        |  FROM h)
        |SELECT doc_id, clean_text,
        |  round(CAST(length(clean_text) AS DOUBLE) / length(html), 6) AS markup_ratio
        |FROM t""".stripMargin,

    // byte-identity as arithmetic: md5 groups over real JPEG payloads
    // must coincide with the formula-equivalence groups
    "q90_video_frame_dedup" ->
      """WITH f AS (
        |  SELECT d.doc_id, ff.i AS frame_idx,
        |    d.doc_id % 16 AS wk, d.doc_id % 12 AS hk,
        |    (d.doc_id % 32 + 17*ff.i) % 256 AS vk
        |  FROM documents d
        |  JOIN range(0, 6) ff(i) ON ff.i < d.doc_id % 4 + 2)
        |SELECT CAST(min(doc_id) AS BIGINT) AS canonical_doc_id,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(doc_id * 1000 + frame_idx) AS BIGINT) AS canonical_key
        |FROM f GROUP BY wk, hk, vk""".stripMargin,

    // BPE-statistic identity: word freq under the same [a-z]+ pre-tok,
    // per-position adjacent pairs (aa counts twice in aaa), exact sums
    "q88_bpe_pair_stats" ->
      """WITH w AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
        |  FROM documents),
        |wf AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
        |p AS (
        |  SELECT substring(word, i.i, 2) AS pair, freq
        |  FROM wf JOIN range(1, 1000) i(i) ON i.i <= length(word) - 1),
        |pc AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
        |       FROM p GROUP BY pair)
        |SELECT pair, pair_count,
        |  row_number() OVER (ORDER BY pair_count DESC, pair) AS rank
        |FROM pc
        |QUALIFY rank <= 50""".stripMargin,

    // invariant form (q28 family): exact raw byte counts + structural
    // deflate facts pinned true — DuckDB cannot replay zlib lengths
    "q89_compression_signal" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS raw_bytes,
        |  true AS within_bound, true AS repeat_compresses_better
        |FROM documents WHERE length(text) >= 20""".stripMargin,

    "q82_wav_pcm_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 200 + 50 AS n_samples,
        |  CAST(sum(((d.doc_id*31 + i.i*17) % 65536 - 32768)
        |         * ((d.doc_id*31 + i.i*17) % 65536 - 32768)) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN (d.doc_id*31 + i.i*17) % 65536 - 32768 IN (-32768, 32767)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(max(abs((d.doc_id*31 + i.i*17) % 65536 - 32768)) AS BIGINT) AS peak
        |FROM documents d
        |JOIN range(0, 250) i(i) ON i.i < d.doc_id % 200 + 50
        |GROUP BY d.doc_id""".stripMargin,

    "q17_token_stats" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$tokRe')) AS n_tokens,
         |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subwords,
         |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |        / nullif(len(regexp_extract_all(text, '$tokRe')), 0), 6) AS avg_token_len
         |FROM documents""".stripMargin,

    "q18_quality_score" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]-]')) AS punct,
         |    length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
         |    len(regexp_extract_all(lower(text),
         |      '\\b(the|a|an|and|or|of|in|to|is|it|that|was|for|on|with)\\b')) AS stophits,
         |    len(regexp_extract_all(text, '$tokRe')) AS toks,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id,
         |  round(CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE)/nonspace ELSE 0.0 END, 6) AS punct_ratio,
         |  round(CASE WHEN toks > 0 THEN CAST(stophits AS DOUBLE)/toks ELSE 0.0 END, 6) AS stopword_ratio,
         |  round(
         |    least(CAST(n_chars AS DOUBLE)/500.0, 1.0) * 0.4
         |    + least((CASE WHEN toks > 0 THEN CAST(stophits AS DOUBLE)/toks ELSE 0.0 END) * 5.0, 1.0) * 0.4
         |    + greatest(0.0, 1.0 - (CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE)/nonspace ELSE 0.0 END) * 4.0) * 0.2,
         |  6) AS quality
         |FROM t""".stripMargin,

    "q19_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|it|was|for)\b')) AS s_en,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|et|des|une|est|que|pour|dans)\b')) AS s_fr,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|mit|sich|auf)\b')) AS s_de,
        |    len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|en|un|una|por|como)\b')) AS s_es,
        |    len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_zh > 0 THEN 'zh'
        |       WHEN s_en = 0 AND s_fr = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
        |       WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es THEN 'en'
        |       WHEN s_fr >= s_de AND s_fr >= s_es THEN 'fr'
        |       WHEN s_de >= s_es THEN 'de'
        |       ELSE 'es' END AS lang_pred
        |FROM t""".stripMargin,

    "q20_dedup_fingerprint" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |  min(doc_id) AS canonical_doc_id, COUNT(*) AS n_dupes
        |FROM documents GROUP BY 1""".stripMargin,

    "q21_cosine_topk" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, sqrt(SUM(e*e)) AS nrm FROM flat GROUP BY vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.e*b.e) AS dp
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, cand_id,
        |    round(dp / (qn.nrm * cn.nrm), 6) AS cos_sim
        |  FROM pairs
        |  JOIN norms qn ON qn.vec_id = query_id
        |  JOIN norms cn ON cn.vec_id = cand_id)
        |SELECT query_id, cand_id, cos_sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,

    // full line-dedup replay: 4-word windows as lines, df = distinct
    // docs, anti-join removal, ordered string_agg reassembly
    "q92_line_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |lines AS (
        |  SELECT w.doc_id, i.i AS ord,
        |    array_to_string(ws[(i.i*4+1):(i.i*4+4)], ' ') AS line
        |  FROM w JOIN range(0, 1000) i(i) ON i.i <= (len(ws)-1)//4),
        |boiler AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS df
        |    FROM lines WHERE trim(line) <> '' GROUP BY line)
        |  WHERE df >= 2),
        |kept AS (
        |  SELECT l.doc_id, l.ord, l.line
        |  FROM lines l ANTI JOIN boiler b ON l.line = b.line),
        |r AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(line, chr(10) ORDER BY ord) AS text_clean
        |  FROM kept GROUP BY doc_id)
        |SELECT w.doc_id, coalesce(r.text_clean, '') AS text_clean,
        |  (len(ws)-1)//4 + 1 AS n_lines,
        |  (len(ws)-1)//4 + 1 - coalesce(r.n_kept, 0) AS n_removed
        |FROM w LEFT JOIN r ON w.doc_id = r.doc_id""".stripMargin,

    // dHash replay from pure arithmetic: q81's pixel formula sampled at
    // the truncating 9×8 grid indices, Rec.601 integer luma, horizontal
    // gradient-sign bits summed into the two unsigned halves
    "q93_image_dhash" ->
      """WITH g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8)
        |SELECT doc_id,
        |  doc_id % 16 + 4 AS width,
        |  doc_id % 12 + 4 AS height,
        |  CAST(sum(CASE WHEN r*8+c < 32
        |    THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS dhash_lo,
        |  CAST(sum(CASE WHEN r*8+c >= 32
        |    THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS dhash_hi
        |FROM b GROUP BY doc_id""".stripMargin,

    // frame-fold replay from the q82 sample formula: whole 16-sample
    // frames only, in-frame consecutive sign flips, mean-|s| silence
    "q94_audio_frame_energy" ->
      """WITH s AS (
        |  SELECT d.doc_id, i.i AS i,
        |    (d.doc_id*31 + i.i*17) % 65536 - 32768 AS v,
        |    CASE WHEN i.i % 16 <> 0
        |      THEN (d.doc_id*31 + (i.i-1)*17) % 65536 - 32768 END AS prev
        |  FROM documents d
        |  JOIN range(0, 256) i(i)
        |    ON i.i < ((d.doc_id % 200 + 50) // 16) * 16)
        |SELECT doc_id, i // 16 AS frame_idx,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
        |  CAST(sum(v*v) AS BIGINT) AS sum_squares,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (v < 0))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross,
        |  sum(abs(v)) < 8192*16 AS is_silence
        |FROM s GROUP BY doc_id, frame_idx""".stripMargin,

    // invariant form (q35 family): empty unless the PQ recall floor is
    // violated
    "q95_ann_pq_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q100_ann_ivfadc_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q103_ann_residual_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    // invariant form: empty unless the merged-sketch estimate strays
    // past the bound
    "q108_sketch_rollup_bound" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
        |  CAST(NULL AS BIGINT) AS approx_distinct,
        |  CAST(NULL AS BIGINT) AS exact_distinct
        |WHERE 1 = 0""".stripMargin,

    // min-after-min funnel recurrence on µs timestamps
    "q106_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s0 AS (SELECT user_id, MIN(us) AS step0_us FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, MIN(e.us) AS step1_us
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'click' AND e.us > s0.step0_us
        |       GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, MIN(e.us) AS step2_us
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s1.step1_us
        |       GROUP BY e.user_id)
        |SELECT s0.user_id, s0.step0_us, s1.step1_us, s2.step2_us,
        |  CAST(1 + CASE WHEN s1.step1_us IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN s2.step2_us IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS funnel_depth
        |FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
        |        LEFT JOIN s2 ON s0.user_id = s2.user_id""".stripMargin,

    // q106's recurrence, gaps only for depth-3 users
    "q111_funnel_latency" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s0 AS (SELECT user_id, MIN(us) AS step0_us FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, MIN(e.us) AS step1_us
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'click' AND e.us > s0.step0_us
        |       GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, MIN(e.us) AS step2_us
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s1.step1_us
        |       GROUP BY e.user_id)
        |SELECT s0.user_id,
        |  s1.step1_us - s0.step0_us AS gap01_us,
        |  s2.step2_us - s1.step1_us AS gap12_us
        |FROM s0 JOIN s1 ON s0.user_id = s1.user_id
        |        JOIN s2 ON s0.user_id = s2.user_id""".stripMargin,

    // lag replay with the same (ts, event_id) tie order
    "q110_event_transitions" ->
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type,
        |  COUNT(*) AS n_transitions
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    // anchor × greedy-chain replay at T = 6h = 21600000000 µs
    "q109_windowed_funnel" ->
      """WITH v AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |           WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase'),
        |chain AS (
        |  SELECT v.user_id, v.us AS anchor_us, MIN(c.us) AS cus
        |  FROM v JOIN c ON c.user_id = v.user_id
        |    AND c.us > v.us AND c.us <= v.us + 21600000000
        |  GROUP BY v.user_id, v.us),
        |conv AS (
        |  SELECT ch.user_id, ch.anchor_us
        |  FROM chain ch JOIN p ON p.user_id = ch.user_id
        |    AND p.us > ch.cus AND p.us <= ch.anchor_us + 21600000000
        |  GROUP BY ch.user_id, ch.anchor_us)
        |SELECT user_id, MIN(anchor_us) AS first_anchor_us,
        |  COUNT(*) AS n_converting_anchors
        |FROM conv GROUP BY user_id""".stripMargin,

    // integer epoch-week cohort replay
    "q107_retention_cohorts" ->
      """WITH e AS (SELECT user_id, event_type,
        |    (epoch_us(ts) // 86400000000) // 7 AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort_week FROM e
        |      WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT c.cohort_week, e.wk - c.cohort_week AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c ON e.user_id = c.user_id
        |WHERE e.wk >= c.cohort_week
        |GROUP BY 1, 2""".stripMargin,

    // plain-join replay: salting must be result-invisible
    "q105_skew_salted_join" ->
      """SELECT e.event_id, e.event_type, t.type_count
        |FROM events e
        |JOIN (SELECT event_type, COUNT(*) AS type_count
        |      FROM events GROUP BY event_type) t
        |  ON e.event_type = t.event_type""".stripMargin,

    // arithmetic replay of the CARD ids only — the decoys (777/888/999
    // slots) are absent by construction, so a tree-scoping slip in
    // either direction breaks rows or hash
    "q116_dom_extract" ->
      """SELECT d.doc_id, CAST(d.doc_id * 1000 + i.i AS VARCHAR) AS property_id
        |FROM documents d
        |JOIN range(0, 5) i(i)
        |  ON i.i < d.doc_id % 5 + 1 AND i.i <> 4""".stripMargin,

    // the salted skew-robust funnel must reproduce q106's oracle
    // hash-exactly (the physical skew treatment is result-invisible)
    "q115_funnel_skew_robust" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s0 AS (SELECT user_id, MIN(us) AS step0_us FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s1 AS (SELECT e.user_id, MIN(e.us) AS step1_us
        |       FROM e JOIN s0 ON e.user_id = s0.user_id
        |       WHERE e.event_type = 'click' AND e.us > s0.step0_us
        |       GROUP BY e.user_id),
        |s2 AS (SELECT e.user_id, MIN(e.us) AS step2_us
        |       FROM e JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND e.us > s1.step1_us
        |       GROUP BY e.user_id)
        |SELECT s0.user_id, s0.step0_us, s1.step1_us, s2.step2_us,
        |  CAST(1 + CASE WHEN s1.step1_us IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN s2.step2_us IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS funnel_depth
        |FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
        |        LEFT JOIN s2 ON s0.user_id = s2.user_id""".stripMargin,

    // the commit-log merge must reproduce the single-shot q05 state
    // exactly: DuckDB replays latest-wins over ALL events in one pass
    // (max over a union = max of per-half maxes), ns-exact tie order
    "q112_txlog_merge" ->
      """SELECT user_id, event_id AS last_event_id,
        |       event_type AS last_event_type, value AS last_value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    // the pruned read must equal a plain filtered scan — DuckDB sees
    // the whole table, the engine plans from manifest ranges only
    "q117_txlog_skipping_read" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-06-15 00:00:00'
        |GROUP BY 1, 2""".stripMargin,

    // change feed replay: v1 = the raw even-id rows; v2 = per user
    // touched by an odd id, the overall latest event (argmax over
    // evens-latest ∪ odds = argmax over all events of that user)
    "q118_txlog_change_feed" ->
      """SELECT user_id, event_id, event_type, value,
        |       CAST(1 AS BIGINT) AS _commit_version
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT user_id, event_id, event_type, value,
        |       CAST(2 AS BIGINT) AS _commit_version
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND (
        |  user_id IN (
        |    SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1)
        |  OR user_id IN (
        |    SELECT user_id FROM events WHERE event_id % 2 = 0
        |    GROUP BY 1 HAVING COUNT(*) > 1))""".stripMargin,

    // conditional-merge replay: matched+returned → deleted; matched
    // with higher recomputed price → updated; other matched → kept;
    // unmatched source (o_orderkey % 3 = 0) inserted unless returned
    "q119_txlog_merge_conditional" ->
      """WITH src AS (
        |  SELECT l_orderkey AS o_orderkey,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |           AS new_price,
        |         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 1
        |           AS has_return
        |  FROM lineitem GROUP BY 1)
        |SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
        |       CASE WHEN s.o_orderkey IS NOT NULL
        |                 AND s.new_price > t.o_totalprice
        |            THEN s.new_price ELSE t.o_totalprice END AS o_totalprice
        |FROM orders t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |WHERE t.o_orderkey % 3 <> 0
        |  AND (s.o_orderkey IS NULL OR NOT s.has_return)
        |UNION ALL
        |SELECT s.o_orderkey, o.o_custkey, o.o_orderstatus,
        |       s.new_price AS o_totalprice
        |FROM src s JOIN orders o ON s.o_orderkey = o.o_orderkey
        |WHERE s.o_orderkey % 3 = 0 AND NOT s.has_return""".stripMargin,

    // full algorithm replay: k-gram index over whitespace tokens,
    // keeper = min doc_id per cross-doc gram, position cover via
    // range expansion, rebuild from uncovered tokens
    "q120_duplicate_span_removal" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |         CASE WHEN text IS NULL OR length(trim(text)) = 0
        |              THEN CAST([] AS VARCHAR[])
        |              ELSE string_split(
        |                regexp_replace(trim(text), '\s+', ' ', 'g'), ' ')
        |         END AS toks
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(toks) - 8 + 2),
        |                i -> array_to_string(toks[i:i+7], ' '))) AS gram,
        |         unnest(range(1, len(toks) - 8 + 2)) AS pos
        |  FROM docs WHERE len(toks) >= 8),
        |dup AS (
        |  SELECT gram, MIN(doc_id) AS keeper
        |  FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
        |cover AS (
        |  SELECT DISTINCT doc_id, cpos FROM (
        |    SELECT g.doc_id, unnest(range(g.pos, g.pos + 8)) AS cpos
        |    FROM grams g JOIN dup d ON g.gram = d.gram
        |    WHERE g.doc_id <> d.keeper) z),
        |cuts AS (
        |  SELECT doc_id, list_sort(list(cpos)) AS cut
        |  FROM cover GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(array_to_string(list_filter(list_transform(
        |    range(1, len(d.toks) + 1),
        |    i -> CASE WHEN c.cut IS NULL OR NOT list_contains(c.cut, i)
        |              THEN d.toks[i] END), t -> t IS NOT NULL), ' '), '')
        |    AS clean_text,
        |  COALESCE(len(c.cut), 0) AS n_cut,
        |  len(d.toks) AS n_tokens
        |FROM docs d LEFT JOIN cuts c USING (doc_id)""".stripMargin,

    // invariant form: empty unless some source pair's (or marginal's)
    // exact distinct count escapes its theta sketch's ±3σ band
    "q121_theta_vocab_overlap" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS src_a,
        |       CAST(NULL AS VARCHAR) AS src_b, CAST(NULL AS DOUBLE) AS exact,
        |       CAST(NULL AS DOUBLE) AS lb, CAST(NULL AS DOUBLE) AS ub
        |WHERE 1 = 0""".stripMargin,

    // palette-format identity: color index c = (doc_id+3x+7y)%64,
    // palette[c] = ((5c+id)%256, (3c+2id)%256, (7c+3id)%256); the
    // engine must recover this through a real LZW decode (+ interlace
    // reorder on odd ids)
    "q122_gif_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((5*((d.doc_id + 3*x.i + 7*y.i) % 64) + d.doc_id) % 256)
        |         + 587*((3*((d.doc_id + 3*x.i + 7*y.i) % 64) + 2*d.doc_id) % 256)
        |         + 114*((7*((d.doc_id + 3*x.i + 7*y.i) % 64) + 3*d.doc_id) % 256))
        |       AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // invariant form: empty unless the unigram tokenizer breaks
    // roundtrip/vocab/EM-monotonicity (q104's gate pattern)
    "q123_unigram_lm_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS detail
        |WHERE 1 = 0""".stripMargin,

    // invariant form: tokenization violations only — empty when BPE
    // partitions every vocab word and the first merge fires
    "q104_bpe_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS word
        |WHERE 1 = 0""".stripMargin,

    // invariant form: empty unless the re-ranked recall floor (0.60 —
    // 2.4× q103's ADC-ranked floor at the identical probe budget) fails
    "q114_ann_rerank_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    // invariant form (q35 family): empty unless the held-out AUC
    // floor is violated
    "q101_quality_classifier_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS auc
        |WHERE 1 = 0""".stripMargin,

    // brute-force replay of the incremental contract: q93's hash
    // arithmetic, all pairs at Hamming ≤ 2 with at least one batch side
    "q99_incremental_image_dedup" ->
      """WITH g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN r*8+c < 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN r*8+c >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM b GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 2
        |  AND (a.doc_id % 10 = 0 OR b.doc_id % 10 = 0)""".stripMargin,

    // per-column replay of the single-pass profile (exact mode)
    "q98_profile" ->
      """WITH d AS (
        |  SELECT *, nullif(lang, 'en') AS lang_non_en FROM documents)
        |SELECT 'doc_id' AS column_name, count(*) AS n_rows,
        |  count(CASE WHEN doc_id IS NULL THEN 1 END) AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct FROM d
        |UNION ALL
        |SELECT 'text', count(*), count(CASE WHEN text IS NULL THEN 1 END),
        |  count(DISTINCT text) FROM d
        |UNION ALL
        |SELECT 'lang', count(*), count(CASE WHEN lang IS NULL THEN 1 END),
        |  count(DISTINCT lang) FROM d
        |UNION ALL
        |SELECT 'source', count(*), count(CASE WHEN source IS NULL THEN 1 END),
        |  count(DISTINCT source) FROM d
        |UNION ALL
        |SELECT 'n_chars', count(*), count(CASE WHEN n_chars IS NULL THEN 1 END),
        |  count(DISTINCT n_chars) FROM d
        |UNION ALL
        |SELECT 'lang_non_en', count(*),
        |  count(CASE WHEN lang_non_en IS NULL THEN 1 END),
        |  count(DISTINCT lang_non_en) FROM d""".stripMargin,

    // independent-implementation NFC identity: DuckDB's utf8proc vs
    // the JDK Normalizer must agree byte-for-byte; combining marks
    // built via chr() so no editor/encoding layer can corrupt them
    "q97_nfc_normalize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    text || ' Cafe' || chr(769) || ' blu' || chr(776)
        |         || ' A' || chr(778) || ' ss' || chr(803) || chr(775) AS raw
        |  FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm_text,
        |  length(raw) AS len_before,
        |  length(nfc_normalize(raw)) AS len_after
        |FROM r""".stripMargin,

    // q93's hash arithmetic + brute Hamming on the halves + recursive
    // closure (q34's reach pattern)
    "q96_image_dedup_closure" ->
      """WITH RECURSIVE g AS (
        |  SELECT d.doc_id, r.i AS r, c.i AS c,
        |    (c.i * (d.doc_id % 16 + 4)) // 9 AS sx,
        |    (r.i * (d.doc_id % 12 + 4)) // 8 AS sy
        |  FROM documents d
        |  JOIN range(0, 8) r(i) ON true
        |  JOIN range(0, 9) c(i) ON true),
        |l AS (
        |  SELECT doc_id, r, c,
        |    299*((doc_id + 3*sx + 7*sy) % 256)
        |      + 587*((2*doc_id + 5*sx + sy) % 256)
        |      + 114*((3*doc_id + sx + 11*sy) % 256) AS luma
        |  FROM g),
        |b AS (
        |  SELECT a.doc_id, a.r, a.c,
        |    CASE WHEN a.luma < n.luma THEN 1 ELSE 0 END AS bit
        |  FROM l a JOIN l n
        |    ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
        |  WHERE a.c < 8),
        |h AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN r*8+c < 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c)) ELSE 0 END) AS BIGINT) AS lo,
        |    CAST(sum(CASE WHEN r*8+c >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (r*8+c-32)) ELSE 0 END) AS BIGINT) AS hi
        |  FROM b GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM h a JOIN h b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 2),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS vertex, least(src, MIN(dst)) AS component
        |FROM reach GROUP BY src""".stripMargin,

    // q21's arithmetic with the near-dup ceiling applied before rank
    "q91_hard_negatives" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, sqrt(SUM(e*e)) AS nrm FROM flat GROUP BY vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id, SUM(a.e*b.e) AS dp
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < 10 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT query_id, cand_id,
        |    round(dp / (qn.nrm * cn.nrm), 6) AS cos_sim
        |  FROM pairs
        |  JOIN norms qn ON qn.vec_id = query_id
        |  JOIN norms cn ON cn.vec_id = cand_id)
        |SELECT query_id, cand_id, cos_sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
        |FROM scored
        |WHERE cos_sim < 0.8
        |QUALIFY rank <= 5""".stripMargin,

    "q22_embedding_norms" ->
      """WITH flat AS (
        |  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, any_value(label) AS label, sqrt(SUM(e*e)) AS nrm
        |  FROM flat GROUP BY vec_id)
        |SELECT label, COUNT(*) AS n_vecs, round(AVG(nrm), 6) AS avg_norm
        |FROM norms GROUP BY label""".stripMargin,

    "q23_multimodal_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS payload_bytes,
        |  md5(text) AS payload_md5, source
        |FROM documents""".stripMargin,

    // Exact trigram Jaccard in SQL: tokens with positions via
    // generate_subscripts/unnest, trigrams by positional self-joins,
    // distinct-shingle inverted-index join — semantically the plan the
    // Spark operator declares (its prefix filter only prunes candidates,
    // never changes the result). Shared by q24 (exact AllPairs) and q25
    // (MinHash LSH): at the configured banding (k=64, b=32, r=2) the
    // LSH candidate set covers every pair at the 0.5 threshold and the
    // verify step is exact Jaccard, so q25's output is the same frame —
    // now driver-checked, not just spec-asserted.
    "q24_ngram_jaccard_dups" ->
      """WITH tok AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS w
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
        |        FROM documents)),
        |big AS (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
        |  FROM tok a
        |  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM big GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
        |  FROM big a JOIN big b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = doc_a
        |JOIN sizes sb ON sb.doc_id = doc_b
        |WHERE CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter) >= 0.5""".stripMargin,

    "q26_simhash_blocked_vs_brute" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
        |  CAST(NULL AS INTEGER) AS hamming
        |WHERE 1 = 0""".stripMargin,

    // DuckDB twin of the winnowing pipeline: 1-based inclusive slicing,
    // list comprehensions for grams and window minima — the md5 hex
    // domain makes the minima bit-identical to Spark's.
    "q48_winnow_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    [md5(s[i:i+19]) for i in range(1, greatest(len(s)-20+1, 1)+1)] AS hs
        |  FROM t),
        |wm AS (
        |  SELECT doc_id, list_distinct(
        |    [list_aggregate(hs[j+1:j+10], 'min')
        |     for j in range(0, greatest(len(hs)-10, 0)+1)]) AS fps
        |  FROM g)
        |SELECT doc_id, unnest(fps) AS fp FROM wm""".stripMargin,

    "q56_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    [md5(s[i:i+19]) for i in range(1, greatest(len(s)-20+1, 1)+1)] AS hs
        |  FROM t),
        |wm AS (
        |  SELECT doc_id, list_distinct(
        |    [list_aggregate(hs[j+1:j+10], 'min')
        |     for j in range(0, greatest(len(hs)-10, 0)+1)]) AS fps
        |  FROM g),
        |fp AS (SELECT doc_id, unnest(fps) AS fp FROM wm)
        |SELECT c.doc_id AS corpus_id, e.doc_id AS eval_id, COUNT(*) AS n_shared
        |FROM fp c JOIN fp e ON c.fp = e.fp
        |WHERE c.doc_id % 17 <> 0 AND e.doc_id % 17 = 0
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 2""".stripMargin,

    "q49_winnow_shared_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    [md5(s[i:i+19]) for i in range(1, greatest(len(s)-20+1, 1)+1)] AS hs
        |  FROM t),
        |wm AS (
        |  SELECT doc_id, list_distinct(
        |    [list_aggregate(hs[j+1:j+10], 'min')
        |     for j in range(0, greatest(len(hs)-10, 0)+1)]) AS fps
        |  FROM g),
        |fp AS (SELECT doc_id, unnest(fps) AS fp FROM wm)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 4""".stripMargin,

    "q27_ann_lsh_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q35_ann_ivf_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q28_media_features" ->
      """SELECT doc_id AS media_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  true AS deterministic
        |FROM documents""".stripMargin,

    "q38_approx_distinct" ->
      """SELECT event_type, true AS users_within_5pct
        |FROM events GROUP BY 1""".stripMargin,

    // Deterministic-sampling twins: the same md5→60-bit→[0,1) variate
    // (CAST('0x'||hex AS BIGINT) ≡ Spark's conv(hex,16,10)), so the
    // selected row sets match exactly, not statistically.
    "q51_stratified_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id, source FROM u
        |WHERE u < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |                      WHEN 'src2' THEN 0.25 ELSE 0.125 END""".stripMargin,

    "q52_token_budget_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM c
        |WHERE cum <= CASE source WHEN 'src0' THEN 800 WHEN 'src1' THEN 600
        |                         WHEN 'src2' THEN 400 ELSE NULL END""".stripMargin,

    // budget replay: ordered running-window sum of sqrt totals = the
    // driver's left-to-right fold; sqrt/floor are bit-identical
    "q102_temperature_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'temp'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tokens) AS st FROM t GROUP BY source),
        |ord AS (SELECT source, st,
        |    SUM(sqrt(CAST(st AS DOUBLE))) OVER (ORDER BY source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        |  FROM tot),
        |b AS (SELECT source,
        |    CAST(FLOOR(CAST(2000 AS DOUBLE) * (sqrt(CAST(st AS DOUBLE))
        |      / (SELECT MAX(rs) FROM ord))) AS BIGINT) AS budget
        |  FROM tot),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id) AS cum
        |  FROM t)
        |SELECT c.doc_id, c.source, c.n_tokens FROM c
        |JOIN b ON c.source = b.source
        |WHERE c.cum <= b.budget""".stripMargin,

    // Spark's window(ts, 1h, 30m) aligns slides to the epoch; every
    // event is in exactly the two windows starting at floor30(ts) and
    // floor30(ts) − 30 min.
    "q73_hopping_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |w AS (
        |  SELECT (us // 1800000000) * 1800000000 - k * 1800000000 AS win_start_us,
        |         event_type, value
        |  FROM e, unnest([0, 1]) AS t(k))
        |SELECT win_start_us, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,

    "q75_global_row_number" ->
      """SELECT doc_id, source,
        |  row_number() OVER (ORDER BY source, doc_id) AS row_num
        |FROM documents""".stripMargin,

    "q78_entity_match" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE levenshtein(a.p_name, b.p_name) <= 5""".stripMargin,

    "q83_entity_match_segment" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |  levenshtein(a.p_name, b.p_name) AS dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE a.p_partkey % 4 = 0 AND b.p_partkey % 4 = 0
        |  AND levenshtein(a.p_name, b.p_name) <= 3""".stripMargin,

    "q76_iqr_outliers" ->
      """WITH f AS (
        |  SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.25) AS q1,
        |    quantile_cont(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(*) FILTER (WHERE
        |    l_extendedprice < q1 - 1.5 * (q3 - q1)
        |    OR l_extendedprice > q3 + 1.5 * (q3 - q1)) AS n_outliers
        |FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
        |GROUP BY 1""".stripMargin,

    "q77_resample_gaps" ->
      """WITH c AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 86400000000) * 86400000000 AS bucket_start,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT user_id,
        |    unnest(generate_series(min(bucket_start), max(bucket_start),
        |      86400000000)) AS bucket_start
        |  FROM c GROUP BY user_id)
        |SELECT s.user_id, s.bucket_start, coalesce(c.n, 0) AS n_events
        |FROM s LEFT JOIN c
        |  ON c.user_id = s.user_id AND c.bucket_start = s.bucket_start""".stripMargin,

    // Same boundary rule as Binning.bucketFor: values equal to a
    // cutpoint go UP (bucket = 1 + #cutpoints ≤ v).
    "q74_equidepth_bins" ->
      """WITH c AS (
        |  SELECT quantile_cont(l_extendedprice,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
        |  FROM lineitem),
        |b AS (
        |  SELECT l_extendedprice,
        |    1 + len(list_filter(cs, x -> x <= l_extendedprice)) AS bucket
        |  FROM lineitem CROSS JOIN c)
        |SELECT bucket, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM b GROUP BY 1""".stripMargin,

    "q72_sample_k_per_group" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'topk'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
        |  FROM t)
        |SELECT doc_id, source FROM r WHERE rn <= 20""".stripMargin,

    "q67_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'wsamp'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |w AS (SELECT CAST(SUM(n_chars) AS DOUBLE) AS tot FROM documents)
        |SELECT doc_id, n_chars FROM t CROSS JOIN w
        |WHERE n_chars > 0 AND u * tot < 100.0 * n_chars""".stripMargin,

    "q53_split_assign" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'split'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u >= 0.875 THEN 'test'
        |       WHEN u >= 0.75 THEN 'val'
        |       WHEN u >= 0.0 THEN 'train' END AS split
        |FROM u""".stripMargin,

    "q55_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9()\. -]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
        |  len(regexp_extract_all(text, 'https?://[^\s]+'))
        |  + len(regexp_extract_all(regexp_replace(text,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |  + len(regexp_extract_all(regexp_replace(regexp_replace(text,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+?[0-9][0-9()\. -]{7,}[0-9]')) AS n_pii
        |FROM documents""".stripMargin,

    "q44_simhash_exhaustive" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_a, CAST(NULL AS BIGINT) AS doc_b,
        |  CAST(NULL AS INTEGER) AS hamming
        |WHERE 1 = 0""".stripMargin,

    "q60_semdedup_invariant" ->
      """SELECT CAST(NULL AS VARCHAR) AS violation, CAST(NULL AS BIGINT) AS vec_a,
        |  CAST(NULL AS BIGINT) AS vec_b
        |WHERE 1 = 0""".stripMargin,

    "q63_heavy_hitters_superset" ->
      """SELECT CAST(NULL AS VARCHAR) AS term, CAST(NULL AS BIGINT) AS cnt
        |WHERE 1 = 0""".stripMargin,

    "q66_bloom_no_false_negative" ->
      """SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS VARCHAR) AS fp
        |WHERE 1 = 0""".stripMargin,

    // Three unrolled integer-arithmetic rounds; `//` is BIGINT floor
    // division, matching Spark's DIV on positive operands exactly.
    "q71_pagerank" ->
      """WITH pairs AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.dst AS node, CAST(SUM(r0.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r0 ON r0.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r1 AS (SELECT nodes.node,
        |        ((1000000000000 // 100) * 15) // n
        |          + (85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.node = nodes.node),
        |c2 AS (SELECT e.dst AS node, CAST(SUM(r1.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r1 ON r1.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r2 AS (SELECT nodes.node,
        |        ((1000000000000 // 100) * 15) // n
        |          + (85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.node = nodes.node),
        |c3 AS (SELECT e.dst AS node, CAST(SUM(r2.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r2 ON r2.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r3 AS (SELECT nodes.node,
        |        ((1000000000000 // 100) * 15) // n
        |          + (85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.node = nodes.node)
        |SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r3""".stripMargin,

    "q70_char_diversity" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
        |c AS (
        |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
        |  FROM base, unnest(range(1, n_chars + 1)) AS u(i)
        |  WHERE n_chars > 0),
        |g AS (SELECT doc_id, ch, COUNT(*) AS c FROM c GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |    MAX(c) AS maxc, SUM(c * c) AS ss, SUM(c) AS n
        |  FROM g GROUP BY 1)
        |SELECT b.doc_id, b.n_chars,
        |  coalesce(a.n_distinct, 0) AS n_distinct_chars,
        |  CAST((a.maxc * 1000000) // a.n AS BIGINT) AS top_char_frac_e6,
        |  CAST((a.ss * 1000000) // (a.n * a.n) AS BIGINT) AS simpson_e6
        |FROM base b LEFT JOIN a ON a.doc_id = b.doc_id""".stripMargin,

    "q68_scd2_intervals" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM events),
        |m AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) = 1
        |           OR lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        |  FROM e),
        |v AS (
        |  SELECT user_id, ts_us, event_type,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS version
        |  FROM m),
        |g AS (
        |  SELECT user_id, version, min(event_type) AS attr_value,
        |    min(ts_us) AS valid_from, COUNT(*) AS n_events
        |  FROM v GROUP BY 1, 2)
        |SELECT user_id, version, attr_value, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        |  n_events,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL AS is_current
        |FROM g""".stripMargin,

    // Morton interleave: bit j of column i lands at position j·k+i —
    // the 16 shift/mask terms are generated to match ZOrder.interleave
    // exactly (k=2, bits=8; i=0 partkey, i=1 suppkey).
    "q64_zorder_values" -> {
      val terms = (0 until 8).flatMap(j => Seq(
        s"(((bp >> $j) & 1) << ${2 * j})",
        s"(((bs >> $j) & 1) << ${2 * j + 1})")).mkString(" + ")
      s"""WITH mm AS (
         |  SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax,
         |         min(l_suppkey) AS smin, max(l_suppkey) AS smax
         |  FROM lineitem),
         |b AS (
         |  SELECT l_orderkey, l_linenumber,
         |    CAST(floor((l_partkey - pmin) * 256.0 / (pmax - pmin + 1)) AS BIGINT) AS bp,
         |    CAST(floor((l_suppkey - smin) * 256.0 / (smax - smin + 1)) AS BIGINT) AS bs
         |  FROM lineitem CROSS JOIN mm)
         |SELECT l_orderkey, l_linenumber, $terms AS zval FROM b""".stripMargin
    },

    "q45_ann_upper_bound" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS BIGINT) AS query_id,
        |  CAST(NULL AS BIGINT) AS cand_id, CAST(NULL AS INTEGER) AS rank
        |WHERE 1 = 0""".stripMargin,

    "q46_approx_distinct_bound" ->
      """SELECT l_returnflag, true AS parts_within_5pct, true AS supps_within_5pct
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q47_approx_quantile_bound" ->
      """SELECT l_returnflag, true AS p50_within_1pct
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q40_embedding_neardup" ->
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sqrt(SUM(e*e)) AS nrm FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.e*b.e) AS dp
        |  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b, round(dp / (na.nrm * nb.nrm), 6) AS cos_sim
        |FROM dots
        |JOIN norms na ON na.vec_id = vec_a
        |JOIN norms nb ON nb.vec_id = vec_b
        |WHERE dp / (na.nrm * nb.nrm) >= 0.4""".stripMargin,

    "q33_centroids" ->
      """WITH flat AS (
        |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |  FROM embeddings)
        |SELECT label, dim, round(AVG(e), 6) AS centroid_val
        |FROM flat GROUP BY 1, 2""".stripMargin,

    // Transitive closure of the q24 pair graph: recursive reachability,
    // component = min reachable vertex (matches hash-min propagation).
    "q34_dedup_closure" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS w
        |  FROM (SELECT doc_id,
        |          regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\S+') AS l
        |        FROM documents)),
        |big AS (
        |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS sh
        |  FROM tok a
        |  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
        |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM big GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
        |  FROM big a JOIN big b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE CAST(ninter AS DOUBLE) / (sa.sz + sb.sz - ninter) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a)
        |SELECT src AS vertex, least(src, MIN(dst)) AS component
        |FROM reach GROUP BY src""".stripMargin,

    "q57_repetition_stats" ->
      """WITH w AS (
        |  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM w),
        |bgc AS (
        |  SELECT a.doc_id, a.wd || ' ' || b.wd AS g, COUNT(*) AS c
        |  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2),
        |bstat AS (SELECT doc_id, max(c) AS topc FROM bgc GROUP BY 1),
        |tgc AS (
        |  SELECT a.doc_id, a.wd || ' ' || b.wd || ' ' || c.wd AS g, COUNT(*) AS c
        |  FROM flat a
        |  JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  JOIN flat c ON a.doc_id = c.doc_id AND c.i = a.i + 2
        |  GROUP BY 1, 2),
        |tstat AS (SELECT doc_id, SUM(c) AS tot, COUNT(*) AS dist FROM tgc GROUP BY 1)
        |SELECT w.doc_id, w.n_tokens,
        |  round(CASE WHEN bstat.topc IS NOT NULL AND w.n_tokens > 0
        |             THEN least(bstat.topc * 2.0 / w.n_tokens, 1.0)
        |             ELSE 0.0 END, 6) AS top_bigram_frac,
        |  round(coalesce(1.0 - CAST(tstat.dist AS DOUBLE) / tstat.tot, 0.0), 6) AS dup_trigram_frac
        |FROM w
        |LEFT JOIN bstat ON bstat.doc_id = w.doc_id
        |LEFT JOIN tstat ON tstat.doc_id = w.doc_id""".stripMargin,

    "q58_tfidf_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (SELECT doc_id, unnest(words) AS term FROM w),
        |tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM flat GROUP BY 1, 2),
        |dfc AS (SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
        |    round(tfc.tf * (CAST(n.n_docs AS DOUBLE) / dfc.df), 6) AS tfidf
        |  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= 3""".stripMargin,

    "q61_c4_heuristics" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' Lorem ipsum dolor sit.'
        |         WHEN doc_id % 5 = 1 THEN text || ' { code }'
        |         WHEN doc_id % 5 = 2 THEN text || ' A final sentence.'
        |         WHEN doc_id % 5 = 3 THEN text || '!'
        |         ELSE text END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[.!?]')) AS n_sentences,
        |  strpos(lower(t), 'lorem ipsum') > 0 AS has_lorem,
        |  strpos(t, '{') > 0 AS has_brace,
        |  substring(rtrim(t), -1, 1) IN ('.', '!', '?', '"') AS ends_punct,
        |  (len(regexp_extract_all(t, '[.!?]')) >= 1
        |   AND strpos(lower(t), 'lorem ipsum') = 0
        |   AND strpos(t, '{') = 0
        |   AND len(regexp_extract_all(t, '\S+')) >= 5) AS keep
        |FROM d""".stripMargin,

    "q62_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
        |    CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || 'pack'), 1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, u,
        |    CAST(floor(u * 8) AS BIGINT) AS bucket
        |  FROM t),
        |c AS (
        |  SELECT doc_id, bucket, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY u, doc_id) AS cum
        |  FROM b)
        |SELECT doc_id, bucket, n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
        |  CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS pack_idx
        |FROM c""".stripMargin,

    // Window starts every stride=48 tokens; DuckDB list slicing is
    // 1-based inclusive and clamps at the end exactly like Spark's
    // slice(), so the final short window matches bit-for-bit.
    "q65_chunk_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS start_tok FROM t)
        |SELECT doc_id,
        |  CAST(start_tok // 48 AS INTEGER) AS chunk_idx,
        |  CAST(start_tok AS INTEGER) AS start_tok,
        |  len(toks[start_tok + 1 : start_tok + 64]) AS n_chunk_tokens,
        |  array_to_string(toks[start_tok + 1 : start_tok + 64], ' ') AS chunk_text
        |FROM s""".stripMargin,

    "q59_bigram_lm_score" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |flat AS (
        |  SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM w),
        |nb AS (
        |  SELECT a.doc_id, a.wd AS w1, b.wd AS w2, COUNT(*) AS nb
        |  FROM flat a JOIN flat b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |  GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, SUM(nb) AS c12 FROM nb GROUP BY 1, 2),
        |c1 AS (SELECT w1, SUM(nb) AS c1 FROM nb GROUP BY 1),
        |v AS (SELECT COUNT(DISTINCT wd) AS v FROM flat),
        |scored AS (
        |  SELECT nb.doc_id, nb.nb,
        |    nb.nb * CAST(round((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v), 6)
        |                 AS DECIMAL(18,6)) AS contrib
        |  FROM nb
        |  JOIN c12 ON nb.w1 = c12.w1 AND nb.w2 = c12.w2
        |  JOIN c1 ON nb.w1 = c1.w1
        |  CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, CAST(SUM(nb) AS BIGINT) AS n_bigrams,
        |    round(CAST(SUM(contrib) AS DOUBLE) / SUM(nb), 6) AS avg_prob
        |  FROM scored GROUP BY 1)
        |SELECT w.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams, agg.avg_prob
        |FROM w LEFT JOIN agg ON agg.doc_id = w.doc_id""".stripMargin,

    // invariant form: empty unless an eigendecomposition law
    // (ordering, orthonormality, variance=λ, whitening, trace
    // conservation, full-rank reconstruction) is violated
    "q124_pca_whitening_invariant" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS detail
        |WHERE 1 = 0""".stripMargin,

    // full recompute of the table's FINAL state (overall-latest per
    // user, low-value users deleted, survivors' value doubled) — the
    // engine side never aggregates that state, it folds the typed
    // change feed; hash equality proves CDC + IVM exact
    "q125_incremental_view" ->
      """WITH l AS (
        |  SELECT user_id, event_type, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 2 = 0),
        |final AS (
        |  SELECT user_id, event_type, value * 2 AS value
        |  FROM l WHERE rn = 1 AND NOT (value < 50))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM final GROUP BY 1""".stripMargin,

    // invariant form: empty unless a WordPiece encoding law fails
    "q127_wordpiece_roundtrip" ->
      """SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS word
        |WHERE 1 = 0""".stripMargin,

    // same final state as q125, reached through the marker-gated
    // table-backed refresh loop instead of the in-memory fold
    "q126_materialized_view_refresh" ->
      """WITH l AS (
        |  SELECT user_id, event_type, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 2 = 1),
        |final AS (
        |  SELECT user_id, event_type, value * 2 AS value
        |  FROM l WHERE rn = 1 AND NOT (value < 50))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM final GROUP BY 1""".stripMargin,

    // BM25 replay: same tokenization as q58, rational idf, the exact
    // (k1+1)/(1−b) literal folds spelled as double ADDS so both
    // engines round identically, decimal per-doc sum
    "q128_bm25_topk" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |dl AS (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM w),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_dl FROM dl),
        |flat AS (SELECT doc_id, unnest(words) AS term FROM w),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM flat
        |       WHERE term IN ('spark', 'hash', 'vector') GROUP BY 1, 2),
        |dfc AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |per AS (
        |  SELECT tf.doc_id,
        |    round(((CAST(s.n_docs AS DOUBLE) - dfc.df + 0.5) / (dfc.df + 0.5))
        |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * ((1.0 - 0.75)
        |           + 0.75 * (dl.dl / (CAST(s.total_dl AS DOUBLE) / s.n_docs))))),
        |      6) AS term_score
        |  FROM tf JOIN dfc ON tf.term = dfc.term
        |          JOIN dl ON tf.doc_id = dl.doc_id
        |          CROSS JOIN stats s),
        |sc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |    CAST(SUM(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE) AS score
        |  FROM per GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
        |      FROM sc)
        |SELECT doc_id, n_terms, score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 25""".stripMargin,

    // grid replay: generate_series per user over the observed bucket
    // range; locf/interp via IGNORE NULLS window frames; values are
    // fixed-point ×10⁶ BIGINTs (NUMERICS rule 2 — the decimal inputs ×
    // small-integer grid ratios land on terminating .5 constantly),
    // half-up division spelled (2n + d) // (2d) on non-negatives
    "q129_timeseries_fill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS bucket, value
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |obs AS (
        |  SELECT user_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    (2 * CAST(SUM(CAST(value AS DECIMAL(38,6))) * 1000000 AS BIGINT)
        |      + COUNT(*)) // (2 * COUNT(*)) AS v_obs_u6
        |  FROM e GROUP BY 1, 2),
        |bounds AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
        |           FROM obs GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
        |         FROM bounds),
        |j AS (
        |  SELECT g.user_id, g.bucket,
        |    COALESCE(o.n_obs, 0) AS n_obs, o.v_obs_u6
        |  FROM grid g LEFT JOIN obs o
        |    ON g.user_id = o.user_id AND g.bucket = o.bucket),
        |f AS (
        |  SELECT user_id, bucket, n_obs, v_obs_u6,
        |    last_value(v_obs_u6 IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v_obs_u6 IS NOT NULL THEN bucket END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY bucket
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        |    first_value(v_obs_u6 IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v_obs_u6 IS NOT NULL THEN bucket END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY bucket
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM j)
        |SELECT user_id, bucket, n_obs, v_obs_u6, pv AS v_ffill_u6,
        |  CASE WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       WHEN nb = pb THEN pv
        |       ELSE (2 * (pv * (nb - bucket) + nv * (bucket - pb))
        |             + (nb - pb)) // (2 * (nb - pb))
        |  END AS v_interp_u6
        |FROM f""".stripMargin,

    // invariant form: empty unless a merged-KLL quantile estimate's
    // true rank escapes the 2ε band
    "q130_kll_quantile_rollup" ->
      """SELECT CAST(NULL AS VARCHAR) AS event_type,
        |  CAST(NULL AS DOUBLE) AS target_rank,
        |  CAST(NULL AS DOUBLE) AS est_q,
        |  CAST(NULL AS DOUBLE) AS rank_lo,
        |  CAST(NULL AS DOUBLE) AS rank_hi,
        |  CAST(NULL AS DOUBLE) AS eps
        |WHERE 1 = 0""".stripMargin,

    // interval-join replay; (ts, event_id) tie order; half-up linear
    // split in integer micro-units
    "q131_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_id AS touch_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click'),
        |c AS (
        |  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS c_us,
        |    CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS v_u6
        |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
        |p AS (
        |  SELECT c.conv_id, c.v_u6, t.touch_id, t.t_us
        |  FROM c JOIN t ON c.user_id = t.user_id
        |  WHERE t.t_us <= c.c_us AND t.t_us > c.c_us - 604800000000),
        |r AS (
        |  SELECT *,
        |    COUNT(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY t_us, touch_id) AS rn_first,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY t_us DESC, touch_id DESC) AS rn_last
        |  FROM p),
        |u AS (
        |  SELECT 'first_touch' AS model, touch_id, v_u6 AS credit_u6
        |  FROM r WHERE rn_first = 1
        |  UNION ALL
        |  SELECT 'last_touch' AS model, touch_id, v_u6 AS credit_u6
        |  FROM r WHERE rn_last = 1
        |  UNION ALL
        |  SELECT 'linear' AS model, touch_id,
        |    (2 * v_u6 + n) // (2 * n) AS credit_u6
        |  FROM r)
        |SELECT model, touch_id, CAST(SUM(credit_u6) AS BIGINT) AS credit_u6,
        |  CAST(COUNT(*) AS BIGINT) AS n_conversions
        |FROM u GROUP BY 1, 2""".stripMargin,

    // the point-lookup ∪ source-lookup the bloom-pruned read answered
    "q132_txlog_bloom_lookup" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id IN (7, 42, 123, 999999)
        |UNION ALL
        |SELECT doc_id, source, n_chars FROM documents
        |WHERE source = 'src3'""".stripMargin,

    // postings replay (q58 tokenization, 0-based positions) + the
    // anchor-aligned 3-way join
    "q133_phrase_search" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+') AS words
        |  FROM documents),
        |p AS (
        |  -- positions via a bounded range join (no WITH ORDINALITY in
        |  -- DuckDB); fixture docs cap at 100 tokens, bound 1024
        |  SELECT doc_id, words[i.i + 1] AS term, CAST(i.i AS BIGINT) AS pos
        |  FROM w JOIN range(0, 1024) i(i) ON i.i < len(words)),
        |a0 AS (SELECT doc_id, pos AS anchor FROM p WHERE term = 'table'),
        |a1 AS (SELECT doc_id, pos - 1 AS anchor FROM p WHERE term = 'key'),
        |a2 AS (SELECT doc_id, pos - 2 AS anchor FROM p WHERE term = 'scan')
        |SELECT a0.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  MIN(a0.anchor) AS first_pos
        |FROM a0 JOIN a1 ON a0.doc_id = a1.doc_id AND a0.anchor = a1.anchor
        |        JOIN a2 ON a0.doc_id = a2.doc_id AND a0.anchor = a2.anchor
        |GROUP BY a0.doc_id""".stripMargin,

    // each rule as its own SQL count over the same table
    "q134_quality_expectations" ->
      """WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
        |SELECT 'shipdate_not_null' AS rule,
        |  (SELECT COUNT(*) FROM lineitem WHERE l_shipdate IS NULL)
        |    AS n_violations, n.n_rows FROM n
        |UNION ALL
        |SELECT 'quantity_1_50',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_quantity >= 1.0 AND l_quantity <= 50.0, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'discount_0_01',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_discount >= 0.0 AND l_discount <= 0.1, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'returnflag_domain',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_returnflag IN ('A', 'N', 'R'), FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'price_positive',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE NOT COALESCE(l_extendedprice > 0.0, FALSE)),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'order_line_unique',
        |  (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
        |   FROM lineitem),
        |  n.n_rows FROM n
        |UNION ALL
        |SELECT 'orderkey_in_orders',
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |     (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)),
        |  n.n_rows FROM n""".stripMargin,

    // UPDATE then DELETE replayed over the raw table
    "q135_txlog_dml" ->
      """WITH upd AS (
        |  SELECT event_id, user_id, event_type,
        |    CASE WHEN event_type = 'click' AND value IS NOT NULL
        |         THEN value * 2 + 1 ELSE value END AS value
        |  FROM events),
        |fin AS (SELECT * FROM upd WHERE NOT COALESCE(event_type = 'error', FALSE))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY 1""".stripMargin,

    // time-travel snapshot (first two appends) + pushed null filter
    "q136_txlog_source" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(MIN(event_id) AS BIGINT) AS min_event
        |FROM events
        |WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // canonical a<b<c triple join over the co-purchase edge projection
    "q137_triangle_census" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        |  FROM lineitem WHERE l_quantity > 40),
        |e AS (
        |  SELECT DISTINCT x.i AS a, y.i AS b
        |  FROM li x JOIN li y ON x.g = y.g AND x.i < y.i),
        |deg AS (
        |  SELECT v, COUNT(*) AS deg
        |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v)
        |SELECT
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        |  (SELECT CAST(SUM((deg * (deg - 1)) // 2) AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  (SELECT CAST(COUNT(*) AS BIGINT)
        |   FROM e e1
        |   JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        |   JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin,

    // exact top-20 term counts — the CMS gate's survivors
    "q138_cms_frequency_rollup" ->
      """WITH w AS (
        |  SELECT regexp_extract_all(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '[^ ]+')
        |    AS words
        |  FROM documents),
        |flat AS (SELECT unnest(words) AS term FROM w),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM flat GROUP BY 1)
        |SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 20""".stripMargin,

    // the same integer divisions over the basket projection
    "q139_association_rules" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        |  FROM lineitem WHERE l_quantity > 30),
        |nb AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS n_baskets FROM li),
        |it AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM li GROUP BY 1),
        |c AS (
        |  SELECT x.i AS a, y.i AS b, CAST(COUNT(*) AS BIGINT) AS cooc
        |  FROM li x JOIN li y ON x.g = y.g AND x.i < y.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT c.a, c.b, c.cooc, ia.n_i AS n_a, ib.n_i AS n_b,
        |  nb.n_baskets,
        |  (c.cooc * 1000000) // nb.n_baskets AS support_e6,
        |  (c.cooc * 1000000) // ia.n_i AS conf_a_b_e6,
        |  (c.cooc * 1000000) // ib.n_i AS conf_b_a_e6,
        |  CAST((CAST(c.cooc AS HUGEINT) * nb.n_baskets * 1000000)
        |    // (CAST(ia.n_i AS HUGEINT) * ib.n_i) AS BIGINT) AS lift_e6
        |FROM c
        |JOIN it ia ON ia.i = c.a
        |JOIN it ib ON ib.i = c.b
        |CROSS JOIN nb""".stripMargin,

    // recursive-CTE walk with UNION dedup; min level per node
    "q140_bfs_hop_levels" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        |  FROM lineitem WHERE l_quantity > 40),
        |e AS (
        |  SELECT DISTINCT x.i AS a, y.i AS b
        |  FROM li x JOIN li y ON x.g = y.g AND x.i < y.i),
        |u AS (
        |  SELECT a AS src, b AS dst FROM e
        |  UNION ALL SELECT b AS src, a AS dst FROM e),
        |seeds AS (SELECT DISTINCT i AS v FROM li WHERE i % 97 = 0),
        |walk(v, lvl) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT u.dst, walk.lvl + 1
        |  FROM walk JOIN u ON u.src = walk.v
        |  WHERE walk.lvl < 3)
        |SELECT v, CAST(MIN(lvl) AS BIGINT) AS level FROM walk GROUP BY 1""".stripMargin,

    // seed-personalized teleport; otherwise q71's unrolled rounds
    "q141_trustrank" ->
      """WITH pairs AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |flags AS (SELECT node,
        |            CASE WHEN node % 7 = 0 THEN 1 ELSE 0 END AS is_seed
        |          FROM nodes),
        |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
        |ns AS (SELECT COUNT(*) AS n FROM flags WHERE is_seed = 1),
        |r0 AS (SELECT node, is_seed * (1000000000000 // n) AS r
        |       FROM flags CROSS JOIN ns),
        |c1 AS (SELECT e.dst AS node, CAST(SUM(r0.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r0 ON r0.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r1 AS (SELECT flags.node,
        |        flags.is_seed * (((1000000000000 // 100) * 15) // n)
        |          + (85 * coalesce(c1.s, 0)) // 100 AS r
        |       FROM flags CROSS JOIN ns LEFT JOIN c1 ON c1.node = flags.node),
        |c2 AS (SELECT e.dst AS node, CAST(SUM(r1.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r1 ON r1.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r2 AS (SELECT flags.node,
        |        flags.is_seed * (((1000000000000 // 100) * 15) // n)
        |          + (85 * coalesce(c2.s, 0)) // 100 AS r
        |       FROM flags CROSS JOIN ns LEFT JOIN c2 ON c2.node = flags.node),
        |c3 AS (SELECT e.dst AS node, CAST(SUM(r2.r // o.outdeg) AS BIGINT) AS s
        |       FROM edges e JOIN r2 ON r2.node = e.src
        |       JOIN outdeg o ON o.src = e.src GROUP BY 1),
        |r3 AS (SELECT flags.node,
        |        flags.is_seed * (((1000000000000 // 100) * 15) // n)
        |          + (85 * coalesce(c3.s, 0)) // 100 AS r
        |       FROM flags CROSS JOIN ns LEFT JOIN c3 ON c3.node = flags.node)
        |SELECT node, CAST(r AS BIGINT) AS rank_e12 FROM r3""".stripMargin,

    // HUGEINT normal-equation sums, final cast to BIGINT
    "q142_grouped_linear_fit" ->
      """WITH b AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(CAST(l_quantity AS DECIMAL(18,0)) AS HUGEINT) AS x,
        |    CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) // 100 AS HUGEINT) AS y
        |  FROM lineitem),
        |a AS (
        |  SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * x) AS sxx, SUM(x * y) AS sxy
        |  FROM b GROUP BY 1)
        |SELECT grp,
        |  CAST(n AS BIGINT) AS n_rows,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num
        |FROM a""".stripMargin,

    "q143_path_trigrams" ->
      """WITH o AS (
        |  SELECT event_type AS step_0,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS step_1,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS step_2
        |  FROM events)
        |SELECT step_0, step_1, step_2, COUNT(*) AS n_paths
        |FROM o WHERE step_2 IS NOT NULL
        |GROUP BY 1, 2, 3""".stripMargin,

    // exact rolling 4-week windowed distinct per present week
    "q144_rolling_distinct_actives" ->
      """WITH e AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 86400000000) // 7 AS week
        |  FROM events),
        |wk AS (SELECT DISTINCT week FROM e)
        |SELECT wk.week,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS exact_rolling
        |FROM wk JOIN e ON e.week BETWEEN wk.week - 3 AND wk.week
        |GROUP BY 1""".stripMargin,

    // 4 unrolled peel layers at k=3, then final surviving degrees
    "q145_kcore_peel" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        |  FROM lineitem WHERE l_quantity > 44),
        |e0 AS (
        |  SELECT DISTINCT x.i AS a, y.i AS b
        |  FROM li x JOIN li y ON x.g = y.g AND x.i < y.i),
        |d0 AS (SELECT v, COUNT(*) AS deg FROM
        |       (SELECT a AS v FROM e0 UNION ALL SELECT b AS v FROM e0)
        |       GROUP BY v),
        |k0 AS (SELECT v FROM d0 WHERE deg >= 3),
        |e1 AS (SELECT a, b FROM e0
        |       WHERE a IN (SELECT v FROM k0) AND b IN (SELECT v FROM k0)),
        |d1 AS (SELECT v, COUNT(*) AS deg FROM
        |       (SELECT a AS v FROM e1 UNION ALL SELECT b AS v FROM e1)
        |       GROUP BY v),
        |k1 AS (SELECT v FROM d1 WHERE deg >= 3),
        |e2 AS (SELECT a, b FROM e1
        |       WHERE a IN (SELECT v FROM k1) AND b IN (SELECT v FROM k1)),
        |d2 AS (SELECT v, COUNT(*) AS deg FROM
        |       (SELECT a AS v FROM e2 UNION ALL SELECT b AS v FROM e2)
        |       GROUP BY v),
        |k2 AS (SELECT v FROM d2 WHERE deg >= 3),
        |e3 AS (SELECT a, b FROM e2
        |       WHERE a IN (SELECT v FROM k2) AND b IN (SELECT v FROM k2)),
        |d3 AS (SELECT v, COUNT(*) AS deg FROM
        |       (SELECT a AS v FROM e3 UNION ALL SELECT b AS v FROM e3)
        |       GROUP BY v),
        |k3 AS (SELECT v FROM d3 WHERE deg >= 3),
        |e4 AS (SELECT a, b FROM e3
        |       WHERE a IN (SELECT v FROM k3) AND b IN (SELECT v FROM k3))
        |SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |  (SELECT a AS v FROM e4 UNION ALL SELECT b AS v FROM e4)
        |GROUP BY v""".stripMargin,

    "q146_ann_sq8_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q147_ann_ivf_sq8_recall_floor" ->
      """SELECT CAST(NULL AS VARCHAR) AS method, CAST(NULL AS DOUBLE) AS recall
        |WHERE 1 = 0""".stripMargin,

    "q150_weighted_median" ->
      """WITH b AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v,
        |    CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (
        |  SELECT grp, v, w,
        |    SUM(w) OVER (PARTITION BY grp ORDER BY v
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(w) OVER (PARTITION BY grp) AS total
        |  FROM b)
        |SELECT grp, CAST(MIN(v) AS BIGINT) AS w_median_cents,
        |  CAST(MAX(total) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= total GROUP BY 1""".stripMargin,

    "q148_assortativity_moments" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey AS i
        |  FROM lineitem WHERE l_quantity > 40),
        |e AS (
        |  SELECT DISTINCT x.i AS a, y.i AS b
        |  FROM li x JOIN li y ON x.g = y.g AND x.i < y.i),
        |deg AS (
        |  SELECT v, COUNT(*) AS deg
        |  FROM (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
        |  GROUP BY v)
        |SELECT CAST(COUNT(*) * 2 AS BIGINT) AS m2,
        |  CAST(SUM(da.deg * db.deg) AS BIGINT) AS s_prod,
        |  CAST(SUM(da.deg + db.deg) AS BIGINT) AS s_half,
        |  CAST(SUM(da.deg * da.deg + db.deg * db.deg) AS BIGINT) AS s_sq
        |FROM e
        |JOIN deg da ON da.v = e.a
        |JOIN deg db ON db.v = e.b""".stripMargin,

    // both vectored deletes replayed with SQL null semantics
    "q151_dv_delete" ->
      """WITH fin AS (
        |  SELECT * FROM events
        |  WHERE NOT COALESCE(event_type = 'error', FALSE)
        |    AND NOT COALESCE(event_type = 'click' AND value > 100, FALSE))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY 1""".stripMargin,

    // index arithmetic through the published MPEG bitrate/rate tables
    "q152_mp3_headers" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN 'MPEG2' ELSE 'MPEG1' END AS version,
        |  CAST(CASE WHEN doc_id % 4 = 0
        |    THEN [8,16,24,32,40,48,56,64,80,96,112,128,144,160]
        |      [CAST(doc_id % 14 AS INT) + 1]
        |    ELSE [32,40,48,56,64,80,96,112,128,160,192,224,256,320]
        |      [CAST(doc_id % 14 AS INT) + 1]
        |  END AS BIGINT) AS bitrate_kbps,
        |  CAST(CASE WHEN doc_id % 4 = 0
        |    THEN [22050,24000,16000][CAST(doc_id % 3 AS INT) + 1]
        |    ELSE [44100,48000,32000][CAST(doc_id % 3 AS INT) + 1]
        |  END AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS BIGINT)
        |    AS channels,
        |  CAST(doc_id % 297 + 3 AS BIGINT) AS n_frames,
        |  CAST((doc_id % 297 + 3) *
        |    CASE WHEN doc_id % 4 = 0 THEN 576 ELSE 1152 END AS BIGINT)
        |    AS n_samples
        |FROM documents""".stripMargin,

    // block-raster identity: the oracle replays the 4x4-block pixel
    // formula; the Spark side recovers it through a real VP8L
    // encode→decode (prefix codes, LZ77 copies, color cache)
    "q153_webp_pixel_stats" ->
      """SELECT d.doc_id,
        |  d.doc_id % 16 + 4 AS width,
        |  d.doc_id % 12 + 4 AS height,
        |  (d.doc_id % 16 + 4) * (d.doc_id % 12 + 4) AS n_pixels,
        |  CAST(sum(299*((d.doc_id + 3*(x.i//4) + 7*(y.i//4)) % 256)
        |         + 587*((2*d.doc_id + 5*(x.i//4) + (y.i//4)) % 256)
        |         + 114*((3*d.doc_id + (x.i//4) + 11*(y.i//4)) % 256))
        |    AS BIGINT) AS luma_sum
        |FROM documents d
        |JOIN range(0, 20) x(i) ON x.i < d.doc_id % 16 + 4
        |JOIN range(0, 16) y(i) ON y.i < d.doc_id % 12 + 4
        |GROUP BY d.doc_id""".stripMargin,

    // container identity: the oracle recomputes the fields the Spark
    // side ENCODED into a real WARC archive (gzip members, HTTP
    // framing) and then PARSED back; md5 pins the entity body
    "q154_warc_extract" ->
      """SELECT doc_id,
        |  'response' AS warc_type,
        |  'https://example.org/doc/' || doc_id AS target_uri,
        |  CAST(CASE WHEN doc_id % 3 = 0 THEN 404 ELSE 200 END AS BIGINT)
        |    AS http_status,
        |  'text/html; charset=utf-8' AS http_content_type,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
        |  md5(text) AS payload_md5
        |FROM documents""".stripMargin,

    // extraction identity: the oracle recomputes the article paragraphs
    // the Spark side planted in a chrome-laden page and extracted back
    "q155_main_content" ->
      """SELECT doc_id,
        |  trim(substr(text, 1, 40)) || chr(10) || trim(substr(text, 41))
        |    AS main_text
        |FROM documents""".stripMargin,

    // frontier identity: host/domain/path replayed per URL-shape arm;
    // the politeness shard re-derived through the shared md5 recipe
    "q157_url_frontier" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INT)
        |      WHEN 0 THEN 'site' || doc_id || '.co.uk'
        |      WHEN 1 THEN 'example.com'
        |      WHEN 2 THEN '10.0.0.7'
        |      WHEN 3 THEN 'host' || doc_id || '.com.au'
        |      ELSE NULL END AS domain
        |  FROM documents)
        |SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'https://www.sub.site' || doc_id || '.co.uk/a/b?q=' || doc_id
        |    WHEN 1 THEN 'http://user:pw@site' || doc_id || '.example.com:8080/idx.html#frag'
        |    WHEN 2 THEN 'https://10.0.0.7/p' || doc_id
        |    WHEN 3 THEN 'https://host' || doc_id || '.com.au'
        |    ELSE '/relative/only' END AS url,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'www.sub.site' || doc_id || '.co.uk'
        |    WHEN 1 THEN 'site' || doc_id || '.example.com'
        |    WHEN 2 THEN '10.0.0.7'
        |    WHEN 3 THEN 'host' || doc_id || '.com.au'
        |    ELSE NULL END AS host,
        |  domain,
        |  CAST('0x' || substring(md5(domain), 1, 15) AS BIGINT) % 64
        |    AS shard,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN '/a/b'
        |    WHEN 1 THEN '/idx.html'
        |    WHEN 2 THEN '/p' || doc_id
        |    WHEN 3 THEN '/'
        |    ELSE NULL END AS path
        |FROM u""".stripMargin,

    // urlset identity: every entry field replayed arithmetically
    "q158_sitemap_entries" ->
      """SELECT d.doc_id,
        |  'https://s' || d.doc_id || '.example/p/' || x.i AS loc,
        |  '2026-01-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    AS lastmod,
        |  CASE CAST((d.doc_id + x.i) % 3 AS INT)
        |    WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' ELSE 'monthly' END
        |    AS changefreq,
        |  CAST((d.doc_id + x.i) % 10 AS DOUBLE) / 10.0 AS priority
        |FROM documents d JOIN range(0, 3) x(i) ON true""".stripMargin,

    // window arithmetic + md5 shard replayed over the 7-domain collapse
    "q159_frontier_schedule" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    'https://site' || (doc_id % 7) || '.example/d/' || doc_id AS url,
        |    'site' || (doc_id % 7) || '.example' AS domain,
        |    doc_id % 10 AS prio,
        |    (doc_id % 7 + 1) * 100 AS delay_ms
        |  FROM documents)
        |SELECT doc_id, url, domain,
        |  CAST('0x' || substring(md5(domain), 1, 15) AS BIGINT) % 32 AS shard,
        |  CAST(row_number() OVER w AS BIGINT) AS seq,
        |  CAST((row_number() OVER w - 1) * delay_ms AS BIGINT)
        |    AS fetch_offset_ms
        |FROM f
        |WINDOW w AS (PARTITION BY domain ORDER BY prio DESC, url)""".stripMargin,

    // resolution identity per anchor arm; decoys must vanish
    "q160_link_extract" ->
      """SELECT d.doc_id,
        |  CASE x.i
        |    WHEN 0 THEN 'https://other' || d.doc_id || '.example/z'
        |    WHEN 1 THEN 'https://w' || d.doc_id || '.example/r/s'
        |    WHEN 2 THEN 'https://w' || d.doc_id || '.example/a/b/c/d.html'
        |    WHEN 3 THEN 'https://w' || d.doc_id || '.example/a/up.html'
        |    WHEN 4 THEN 'https://cdn' || d.doc_id || '.example/lib.js'
        |    ELSE 'https://ref.example/p' END AS dst_url,
        |  'link' || x.i AS anchor,
        |  x.i = 5 AS nofollow
        |FROM documents d JOIN range(0, 6) x(i) ON true""".stripMargin,

    // container identity: ID-header fields and the granule-derived
    // duration replayed per codec arm
    "q163_ogg_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'vorbis' ELSE 'opus' END AS codec,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 5) * 8000
        |    ELSE [48000,24000,16000][CAST(doc_id % 3 AS INT) + 1]
        |  END AS BIGINT) AS sample_rate,
        |  CAST(doc_id % 3 + 2 AS BIGINT) AS n_pages,
        |  CAST(doc_id % 1000 + 1 AS BIGINT) AS n_samples
        |FROM documents""".stripMargin,

    // index invariant: extent-only fetch ≡ sequential parse, extents
    // tile the archive — all flags must hold on every document
    "q165_warc_cdx" ->
      """SELECT doc_id,
        |  CAST(3 AS BIGINT) AS n_records,
        |  true AS ok_roundtrip,
        |  true AS ok_tiling
        |FROM documents""".stripMargin,

    // sniff-order identity: charset and decoded text per wire arm
    "q162_charset_decode" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 1 THEN 'windows-1252'
        |    WHEN 2 THEN 'utf-16le'
        |    WHEN 4 THEN 'windows-1252'
        |    ELSE 'utf-8' END AS charset,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 1 THEN text || ' éüñ€'
        |    WHEN 3 THEN '<meta charset="utf-8">' || text || ' éüñ№'
        |    WHEN 4 THEN text || ' éüñ€'
        |    ELSE text || ' éüñ№' END AS text_out
        |FROM documents""".stripMargin,

    // decision-table identity over the RFC 9309 precedence rules
    "q156_robots_check" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN '/p' || doc_id || '/x'
        |    WHEN 1 THEN '/p' || doc_id || '/pub/a'
        |    WHEN 2 THEN '/other'
        |    WHEN 3 THEN '/doc.pdf'
        |    ELSE '/doc.pdfx' END AS path,
        |  doc_id % 5 IN (1, 2, 4) AS allowed,
        |  CAST(doc_id % 7 + 1 AS BIGINT) AS crawl_delay
        |FROM documents""".stripMargin,

    // extraction identity: the text must come back byte-exact through
    // the PDF encode→extract round trip; page splits are substring
    // arithmetic, so concatenation restores the original exactly
    "q166_pdf_text" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_pages,
        |  text AS text_out
        |FROM documents""".stripMargin,

    // WET/WAT identity: the oracle recomputes the normalized visible
    // text (title + body + anchor texts, document order), the envelope
    // fields, and the exact JSON string the WAT block must carry
    "q167_wet_wat" ->
      """WITH exp AS (
        |  SELECT doc_id,
        |    'T' || doc_id || ' ' || text || ' ' ||
        |      CASE CAST(doc_id % 4 AS INT)
        |        WHEN 0 THEN 'l0'
        |        WHEN 1 THEN 'l0 l1'
        |        WHEN 2 THEN 'l0 l1 l2'
        |        ELSE 'l0 l1 l2 l3' END AS text_out
        |  FROM documents)
        |SELECT doc_id,
        |  text_out,
        |  CAST(length(text_out) AS BIGINT) AS text_len,
        |  'utf-8' AS charset,
        |  'T' || doc_id AS title,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_links,
        |  'https://example.org/l/0' AS first_link,
        |  '{"uri":"https://example.org/doc/' || doc_id ||
        |    '","status":200,"content_type":"text/html; charset=utf-8","title":"T'
        |    || doc_id || '","n_links":' || (doc_id % 4 + 1) || '}' AS meta_json,
        |  true AS ok_wet_roundtrip
        |FROM exp""".stripMargin,

    // two unrolled HITS rounds in exact integer arithmetic (HUGEINT
    // wide multiplies, floor-div on non-negative operands = Spark DIV)
    "q168_hits" ->
      """WITH edges AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT COUNT(*) AS n FROM nodes),
        |h0 AS (SELECT node, 1000000000000 // n AS h FROM nodes CROSS JOIN nn),
        |a1r AS (SELECT e.dst AS node, SUM(h0.h) AS s
        |        FROM edges e JOIN h0 ON h0.node = e.src GROUP BY 1),
        |a1t AS (SELECT SUM(s) AS t FROM a1r),
        |a1 AS (SELECT nodes.node,
        |         CAST(coalesce(a1r.s, 0) AS HUGEINT) * 1000000000000 // t AS a
        |       FROM nodes LEFT JOIN a1r ON a1r.node = nodes.node CROSS JOIN a1t),
        |h1r AS (SELECT e.src AS node, SUM(a1.a) AS s
        |        FROM edges e JOIN a1 ON a1.node = e.dst GROUP BY 1),
        |h1t AS (SELECT SUM(s) AS t FROM h1r),
        |h1 AS (SELECT nodes.node,
        |         CAST(coalesce(h1r.s, 0) AS HUGEINT) * 1000000000000 // t AS h
        |       FROM nodes LEFT JOIN h1r ON h1r.node = nodes.node CROSS JOIN h1t),
        |a2r AS (SELECT e.dst AS node, SUM(h1.h) AS s
        |        FROM edges e JOIN h1 ON h1.node = e.src GROUP BY 1),
        |a2t AS (SELECT SUM(s) AS t FROM a2r),
        |a2 AS (SELECT nodes.node,
        |         CAST(coalesce(a2r.s, 0) AS HUGEINT) * 1000000000000 // t AS a
        |       FROM nodes LEFT JOIN a2r ON a2r.node = nodes.node CROSS JOIN a2t),
        |h2r AS (SELECT e.src AS node, SUM(a2.a) AS s
        |        FROM edges e JOIN a2 ON a2.node = e.dst GROUP BY 1),
        |h2t AS (SELECT SUM(s) AS t FROM h2r),
        |h2 AS (SELECT nodes.node,
        |         CAST(coalesce(h2r.s, 0) AS HUGEINT) * 1000000000000 // t AS h
        |       FROM nodes LEFT JOIN h2r ON h2r.node = nodes.node CROSS JOIN h2t)
        |SELECT h2.node, CAST(h2.h AS BIGINT) AS hub_e12,
        |  CAST(a2.a AS BIGINT) AS auth_e12
        |FROM h2 JOIN a2 ON a2.node = h2.node""".stripMargin,

    // two unrolled synchronous LPA rounds: per-node neighbor-label
    // mode with (count DESC, label ASC) tie-break, isolated keep own
    "q169_label_propagation" ->
      """WITH pairs AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |edges AS (SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |l0 AS (SELECT node, node AS lab FROM nodes),
        |n1 AS (SELECT e.src AS node, l.lab, COUNT(*) AS c
        |       FROM edges e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2),
        |p1 AS (SELECT node, lab FROM (
        |         SELECT node, lab,
        |           row_number() OVER (PARTITION BY node
        |             ORDER BY c DESC, lab ASC) AS rn
        |         FROM n1) WHERE rn = 1),
        |l1 AS (SELECT n.node, coalesce(p.lab, n.node) AS lab
        |       FROM nodes n LEFT JOIN p1 p ON p.node = n.node),
        |n2 AS (SELECT e.src AS node, l.lab, COUNT(*) AS c
        |       FROM edges e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2),
        |p2 AS (SELECT node, lab FROM (
        |         SELECT node, lab,
        |           row_number() OVER (PARTITION BY node
        |             ORDER BY c DESC, lab ASC) AS rn
        |         FROM n2) WHERE rn = 1),
        |l2 AS (SELECT n.node, coalesce(p.lab, n.node) AS lab
        |       FROM nodes n LEFT JOIN p2 p ON p.node = n.node)
        |SELECT node, lab AS label FROM l2""".stripMargin,

    // invariant gate: every oracle-certain CDC property must hold on
    // every document (resync is spec-measured, not sworn here)
    "q170_cdc_chunks" ->
      """SELECT doc_id,
        |  true AS tile_ok,
        |  true AS bounds_ok,
        |  true AS det_ok
        |FROM documents""".stripMargin,

    // tag-grammar identity: the oracle recomputes the exact strings
    // the ID3v2 frames must deliver and q152's frame-count arithmetic
    "q173_mp3_id3" ->
      """SELECT doc_id,
        |  'T' || substring(text, 1, 20) AS title,
        |  source AS artist,
        |  'A' || (doc_id % 7) AS album,
        |  CAST(doc_id % 50 + 2 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    // IFD-grammar identity: every field the APP1 walk must recover
    "q174_exif_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 8 + 1 AS BIGINT) AS orientation,
        |  'CamCo' AS make,
        |  'M' || (doc_id % 5) AS model,
        |  '2026:01:0' || (doc_id % 9 + 1) || ' 12:00:00' AS date_time,
        |  CAST(doc_id % 640 + 16 AS BIGINT) AS exif_w,
        |  CAST(doc_id % 480 + 16 AS BIGINT) AS exif_h,
        |  CAST(100 + (doc_id % 8) * 100 AS BIGINT) AS iso,
        |  '1/' || (doc_id % 500 + 1) AS exposure,
        |  (doc_id % 10 + 10) || '/5' AS fnumber
        |FROM documents""".stripMargin,

    // central-directory identity: member census + exact size re-add
    "q175_zip_roundtrip" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_entries,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'm0'
        |    WHEN 1 THEN 'm0,m1'
        |    WHEN 2 THEN 'm0,m1,m2'
        |    ELSE 'm0,m1,m2,m3' END AS names,
        |  CAST(length(text) AS BIGINT) AS total_size,
        |  true AS ok_crc
        |FROM documents""".stripMargin,

    // OOXML identity: substring-arithmetic paragraph cuts rejoined
    // with the newline the paragraph boundary maps to
    "q176_docx_text" ->
      """SELECT doc_id,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_paras,
        |  CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN text
        |    WHEN 1 THEN substring(text, 1, length(text) // 2) || chr(10) ||
        |      substring(text, length(text) // 2 + 1)
        |    ELSE substring(text, 1, length(text) // 3) || chr(10) ||
        |      substring(text, length(text) // 3 + 1,
        |        (2 * length(text)) // 3 - length(text) // 3) || chr(10) ||
        |      substring(text, (2 * length(text)) // 3 + 1)
        |  END AS text_out
        |FROM documents""".stripMargin,

    // grid identity: string cells by formula, the extra numeric column
    "q177_xlsx_cells" ->
      """SELECT d.doc_id, CAST(r.i AS BIGINT) AS row,
        |  CAST(c.i AS BIGINT) AS col,
        |  'c' || r.i || '_' || c.i || '_' || d.doc_id AS value
        |FROM documents d
        |JOIN range(0, 3) r(i) ON r.i < d.doc_id % 3 + 1
        |JOIN range(0, 3) c(i) ON c.i < d.doc_id % 2 + 2
        |UNION ALL
        |SELECT d.doc_id, CAST(r.i AS BIGINT) AS row,
        |  CAST(d.doc_id % 2 + 2 AS BIGINT) AS col,
        |  CAST(d.doc_id * 10 + r.i AS VARCHAR) AS value
        |FROM documents d
        |JOIN range(0, 3) r(i) ON r.i < d.doc_id % 3 + 1""".stripMargin,

    // container identity: the oracle recomputes the track facts the
    // Spark side ENCODED into a real ISO-BMFF box tree and WALKED back
    "q178_mp4_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END
        |    AS major_brand,
        |  CAST(1000 AS BIGINT) AS timescale,
        |  CAST(doc_id % 5000 + 1000 AS BIGINT) AS duration,
        |  CAST((CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END)
        |     + (CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tracks,
        |  CASE WHEN doc_id % 5 <> 4 THEN 'avc1' END AS video_codec,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 320 + 16 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 240 + 16 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 5 <> 4
        |    THEN CAST(doc_id % 100 + 1 AS BIGINT) END AS v_samples,
        |  CASE WHEN doc_id % 3 <> 0 THEN 'mp4a' END AS audio_codec,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(doc_id % 2 + 1 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(CASE WHEN doc_id % 3 = 1 THEN 48000 ELSE 32000
        |      END AS BIGINT) END AS sample_rate,
        |  CASE WHEN doc_id % 3 <> 0
        |    THEN CAST(doc_id % 50 + 1 AS BIGINT) END AS a_samples
        |FROM documents""".stripMargin,

    // archive identity: names/sizes/mtimes recomputed arithmetically;
    // the Spark side must recover them through a real ustar write →
    // (gzip →) checksum-verified block walk
    "q179_tar_walk" ->
      """SELECT doc_id,
        |  CAST(doc_id % 4 + 1 AS BIGINT) AS n_members,
        |  (CASE WHEN doc_id % 6 = 0 THEN repeat('p', 104) || '/m0'
        |        ELSE 'm0' END)
        |  || (CASE CAST(doc_id % 4 AS INT)
        |      WHEN 0 THEN '' WHEN 1 THEN ',m1'
        |      WHEN 2 THEN ',m1,m2' ELSE ',m1,m2,m3' END) AS names,
        |  CAST(length(text) AS BIGINT) AS total_size,
        |  CAST((doc_id % 4 + 1) * (doc_id * 100)
        |     + ((doc_id % 4 + 1) * (doc_id % 4)) // 2 AS BIGINT)
        |    AS sum_mtime,
        |  true AS ok_roundtrip
        |FROM documents""".stripMargin,

    // container identity: the EBML tree's fields recomputed
    // arithmetically; the Spark side recovers them through a real
    // element write → VINT walk (incl. unknown-size segments)
    "q180_mkv_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska' END
        |    AS doc_type,
        |  CAST(1000000 AS BIGINT) AS timestamp_scale,
        |  CAST(doc_id % 100000 + 1000 AS BIGINT) AS duration_ticks,
        |  CAST((CASE WHEN doc_id % 4 <> 3 THEN 1 ELSE 0 END)
        |     + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_tracks,
        |  CASE WHEN doc_id % 4 <> 3 THEN
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'V_VP9'
        |      WHEN 1 THEN 'V_AV1' ELSE 'V_MPEG4/ISO/AVC' END
        |  END AS video_codec,
        |  CASE WHEN doc_id % 4 <> 3
        |    THEN CAST(doc_id % 1920 + 16 AS BIGINT) END AS width,
        |  CASE WHEN doc_id % 4 <> 3
        |    THEN CAST(doc_id % 1080 + 16 AS BIGINT) END AS height,
        |  CASE WHEN doc_id % 2 = 0 THEN 'A_OPUS' END AS audio_codec,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN CAST(doc_id % 3 + 1 AS BIGINT) END AS channels,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN CAST(48000 AS BIGINT) END AS sample_rate
        |FROM documents""".stripMargin,

    // statistics identity: the footer's written stats vs the same
    // facts recomputed from the data — the Spark side must recover
    // them through a real Thrift compact-protocol decode
    "q181_parquet_footer" ->
      """WITH base AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL
        |       ELSE doc_id * 3 - 500 END AS v,
        |  source AS s FROM documents)
        |SELECT 'doc_id' AS col_name, 'INT64' AS physical_type,
        |  CAST(COUNT(*) AS BIGINT) AS num_values,
        |  CAST(0 AS BIGINT) AS null_count,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_v,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_v
        |FROM base
        |UNION ALL
        |SELECT 'v', 'INT64', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(v) AS BIGINT),
        |  CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 's', 'BYTE_ARRAY', CAST(COUNT(*) AS BIGINT),
        |  CAST(COUNT(*) - COUNT(s) AS BIGINT),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM base""".stripMargin,

    // wire identity: every field recomputed arithmetically; the Spark
    // side recovers them through a real encode → schema-less walk
    "q182_proto_fields" ->
      """SELECT doc_id,
        |  doc_id AS v1,
        |  substring(text, 1, CAST(doc_id % 20 + 5 AS INT)) AS title,
        |  -(doc_id + 1) AS zz,
        |  doc_id * 1000 + 7 AS f4,
        |  doc_id % 10 + doc_id % 100 + doc_id % 1000 AS packed_sum,
        |  doc_id % 256 AS nested_v,
        |  'n' || (doc_id % 7) AS nested_s
        |FROM documents""".stripMargin,

    "q183_cbor_doc" ->
      """SELECT doc_id,
        |  doc_id AS id_v,
        |  -doc_id - 1 AS neg_v,
        |  substring(text, 1, CAST(doc_id % 15 + 3 AS INT)) AS title,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_tags,
        |  't' || (doc_id % 5) ||
        |    CASE WHEN doc_id % 3 >= 1
        |      THEN ',t' || ((doc_id + 1) % 5) ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 2
        |      THEN ',t' || ((doc_id + 2) % 5) ELSE '' END AS tags,
        |  doc_id % 2 = 0 AS flag,
        |  CAST(doc_id % 1000 AS DOUBLE) * 0.25 AS score
        |FROM documents""".stripMargin,

    // framing identity incl. the NEGATIVE arm: a flipped payload byte
    // must be rejected by the CRC walk on every 11th doc
    "q184_tfrecord" ->
      """SELECT doc_id,
        |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_records,
        |  CAST(length(text) AS BIGINT) AS total_bytes,
        |  true AS ok_roundtrip,
        |  doc_id % 11 = 0 AS rejected_on_damage
        |FROM documents""".stripMargin,

    // read-path identity: rows decoded byte-level from a real parquet
    // file must equal the source table
    "q185_parquet_pages" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 9 = 0 THEN NULL
        |       ELSE doc_id * 7 + 1 END AS v,
        |  doc_id % 3 = 0 AS flag
        |FROM documents""".stripMargin,

    // statistics identity on the ORC side: footer stats vs the same
    // facts recomputed from the data (numberOfValues = NON-null)
    "q186_orc_footer" ->
      """WITH base AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       ELSE doc_id * 2 - 300 END AS v,
        |  source AS s FROM documents)
        |SELECT 'doc_id' AS col_name, 'LONG' AS kind,
        |  CAST(COUNT(*) AS BIGINT) AS num_values, false AS has_null,
        |  CAST(MIN(doc_id) AS BIGINT) AS int_min,
        |  CAST(MAX(doc_id) AS BIGINT) AS int_max,
        |  CAST(SUM(doc_id) AS BIGINT) AS int_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS stripe_rows
        |FROM base
        |UNION ALL
        |SELECT 'v', 'LONG', CAST(COUNT(v) AS BIGINT),
        |  COUNT(*) > COUNT(v),
        |  CAST(MIN(v) AS BIGINT), CAST(MAX(v) AS BIGINT),
        |  CAST(SUM(v) AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 's', 'STRING', CAST(COUNT(s) AS BIGINT),
        |  COUNT(*) > COUNT(s),
        |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  CAST(NULL AS BIGINT),
        |  CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        |FROM base""".stripMargin,

    // wire identity on the decode arm: the Unicode host rebuilt by
    // chr() arithmetic must come back through encode → xn-- → decode
    "q187_idn_host" ->
      """SELECT doc_id,
        |  'h' || chr(CAST(224 + doc_id % 16 AS INT)) || 'st' ||
        |    (doc_id % 10) || '.example' AS unicode_host,
        |  true AS is_idn,
        |  true AS roundtrip_ok
        |FROM documents""".stripMargin,

    // read-path identity, library writer → native reader
    "q188_avro_ocf" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 6 = 0 THEN NULL
        |       ELSE doc_id * 11 - 40 END AS v,
        |  doc_id % 4 = 0 AS flag
        |FROM documents""".stripMargin,

    "q189_arrow_ipc" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 8 = 0 THEN NULL
        |       ELSE doc_id * 13 + 5 END AS v,
        |  't' || (doc_id % 9) AS s
        |FROM documents""".stripMargin,

    // corpus-drop identity: pages rebuilt arithmetically; the Spark
    // side recovers them through bzip2 (our decoder) + the XML walk
    "q190_wiki_dump" ->
      """SELECT d.doc_id,
        |  CAST(p.i AS BIGINT) AS page_idx,
        |  'Doc ' || d.doc_id || ' part ' || p.i AS title,
        |  CAST((d.doc_id + p.i) % 16 AS BIGINT) AS ns,
        |  CAST(d.doc_id * 10 + p.i AS BIGINT) AS page_id,
        |  substring(d.text,
        |    CAST(length(d.text) * p.i // (d.doc_id % 3 + 1) + 1 AS INT),
        |    CAST(length(d.text) * (p.i + 1) // (d.doc_id % 3 + 1)
        |       - length(d.text) * p.i // (d.doc_id % 3 + 1) AS INT))
        |    AS text
        |FROM documents d
        |JOIN range(0, 3) p(i) ON p.i < d.doc_id % 3 + 1""".stripMargin,

    // strip-rule identity: the oracle states the stripped text
    // directly (heading text kept, template+comment+File link gone,
    // links to anchors, emphasis markers off, bullet off)
    "q192_wiki_split_read" ->
      """SELECT doc_id,
        |  'Doc ' || doc_id AS title,
        |  text AS body,
        |  CAST(8 AS BIGINT) AS n_streams
        |FROM documents WHERE doc_id < 40""".stripMargin,
    "q198_txlog_time_travel" ->
      """SELECT event_id, user_id, value
        |FROM events WHERE event_id % 4 IN (0, 1)""".stripMargin,
    "q200_corpus_pipeline" ->
      """WITH src AS (
        |  SELECT d.doc_id, b.text AS body
        |  FROM documents d JOIN documents b ON b.doc_id = d.doc_id % 400
        |), ok AS (
        |  SELECT * FROM src WHERE length(body) >= 64
        |), ded AS (
        |  SELECT min(doc_id) AS keep_id, body FROM ok GROUP BY body
        |)
        |SELECT keep_id,
        |  CAST(length(body) AS BIGINT) AS body_len,
        |  CAST(len(regexp_extract_all(body, '\S+')) AS BIGINT) AS n_tokens
        |FROM ded""".stripMargin,
    "q199_txlog_schema_evolution" ->
      """SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id, user_id, value
        |FROM events WHERE event_id % 3 = 1
        |UNION ALL
        |SELECT event_id, CAST(NULL AS BIGINT), value
        |FROM events WHERE event_id % 3 = 2""".stripMargin,
    "q196_txlog_constraint_gate" ->
      """SELECT event_id, user_id, event_type, CAST(1 AS BIGINT) AS enforced
        |FROM events WHERE event_id % 3 = 0
        |UNION ALL
        |SELECT event_id + 1, user_id, event_type, CAST(1 AS BIGINT)
        |FROM events WHERE event_id % 3 = 2
        |UNION ALL
        |SELECT event_id, user_id, event_type, CAST(1 AS BIGINT)
        |FROM events WHERE event_id % 3 = 1""".stripMargin,
    "q197_txlog_copy_into" ->
      """SELECT doc_id, source, CAST(3 AS BIGINT) AS n_files
        |FROM documents WHERE doc_id < 60""".stripMargin,
    "q195_float_wav_decode" ->
      """WITH g AS (
        |  SELECT d.doc_id, (2*t.i + (d.doc_id % 9)*2 - 39) AS n
        |  FROM documents d, generate_series(0, 31) AS t(i)
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(greatest(-1.0, least(1.0, n / 32.0)) * 32767)
        |      AS BIGINT) AS v
        |  FROM g
        |)
        |SELECT doc_id,
        |  CAST(sum(v) AS BIGINT) AS f_sum,
        |  CAST(max(abs(v)) AS BIGINT) AS f_peak,
        |  CAST(min(v) AS BIGINT) AS f_min
        |FROM s GROUP BY doc_id""".stripMargin,
    "q194_g711_wav_decode" ->
      """WITH bytes AS (
        |  SELECT d.doc_id, (d.doc_id*31 + t.i*7) % 256 AS v
        |  FROM documents d, generate_series(0, 47) AS t(i)
        |), pre AS (
        |  SELECT doc_id, 255 - v AS u, xor(v, 85) AS a FROM bytes
        |), dec AS (
        |  SELECT doc_id,
        |    (CASE WHEN u >= 128 THEN -1 ELSE 1 END) *
        |      ((((u & 15)*8 + 132) << ((u >> 4) & 7)) - 132) AS mu,
        |    (CASE WHEN (a & 128) <> 0 THEN 1 ELSE -1 END) *
        |      (CASE WHEN ((a >> 4) & 7) = 0 THEN (a & 15)*16 + 8
        |            ELSE ((a & 15)*16 + 264) << (((a >> 4) & 7) - 1)
        |       END) AS al
        |  FROM pre
        |)
        |SELECT doc_id,
        |  CAST(sum(mu) AS BIGINT) AS mu_sum,
        |  CAST(sum(mu*mu) AS BIGINT) AS mu_sumsq,
        |  CAST(max(abs(mu)) AS BIGINT) AS mu_peak,
        |  CAST(sum(al) AS BIGINT) AS a_sum,
        |  CAST(max(abs(al)) AS BIGINT) AS a_peak
        |FROM dec GROUP BY doc_id""".stripMargin,
    "q193_warc_ranged_read" ->
      """SELECT doc_id AS record_index,
        |  'https://example.org/doc/' || doc_id AS target_uri,
        |  CAST(200 AS BIGINT) AS status,
        |  substring(text, 1, 64) AS body,
        |  CAST(1 AS BIGINT) AS fanout
        |FROM documents WHERE doc_id < 24""".stripMargin,
    "q191_wikitext_strip" ->
      """SELECT doc_id,
        |  'Section ' || doc_id || chr(10) || chr(10) || chr(10) ||
        |  substring(text, 1, CAST(length(text) // 2 AS INT)) || chr(10) ||
        |  'italic Target ' || doc_id || ' and alias ' ||
        |    (doc_id % 5) || ' ' || chr(10) ||
        |  'fact ' || doc_id || ' tail' || chr(10) ||
        |  'item ' || doc_id || chr(10) ||
        |  'shown ' || (doc_id % 9) || chr(10) ||
        |  substring(text, CAST(length(text) // 2 + 1 AS INT))
        |    AS stripped
        |FROM documents""".stripMargin
  )

  /** q25 (MinHash LSH near-dups) is oracled against the SAME exact
    * Jaccard SQL as q24: banded LSH at (k=64, b=32, r=2) + exact-Jaccard
    * verify must reproduce the exact all-pairs result at the 0.5
    * threshold (P[candidate | j=0.5] ≈ 0.9999 per pair; deterministic
    * hashing makes the outcome stable, and the driver now checks it).
    *
    * PINNED DEPENDENCY: this equality holds for the CURRENT shingling
    * (trigrams, xxhash64 seed 42 family in MinHashDedup), band shape
    * (b=32, r=2), and driver test data. Any change to those can flip
    * this gate red WITHOUT a real recall regression — per-pair capture
    * at exactly j=0.5 is probabilistic in the hash choice, not certain.
    * If this goes red after touching seeds/shingling/data: diff q24 vs
    * q25 output (symmetric difference) first; a handful of j≈0.5 pairs
    * missing from q25 is an LSH near-threshold miss (re-tune bands or
    * re-pin), whereas extra/wrong pairs or large gaps mean a real bug.
    */
  val oracle: Map[String, String] =
    oracleBase +
      // q149 recovers the SAME synthetic raster as q81 through the BMP
      // codec — identical arithmetic oracle
      ("q149_bmp_pixel_stats" -> oracleBase("q81_png_pixel_stats")) +
      // q161 recovers the SAME synthetic PCM as q82 through the FLAC
      // codec — identical arithmetic oracle
      ("q161_flac_pcm_stats" -> oracleBase("q82_wav_pcm_stats")) +
      // q164 recovers the SAME synthetic raster as q81 through the
      // TIFF codec — identical arithmetic oracle
      ("q164_tiff_pixel_stats" -> oracleBase("q81_png_pixel_stats")) +
      ("q25_minhash_dups" -> oracleBase("q24_ngram_jaccard_dups")) +
      // q50 = the exact pair set restricted to pairs touching the
      // simulated new batch (doc_id ≡ 0 mod 10); same capture pinning
      // as q25 (see that Scaladoc for the triage protocol if red).
      ("q50_incremental_dedup" ->
        s"""SELECT * FROM (${oracleBase("q24_ngram_jaccard_dups")})
           |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0""".stripMargin) +
      // q54 = q40's exact pair set restricted the same way (incremental
      // embedding dedup is exact, so this is a value oracle, not a
      // capture-pinned one).
      ("q54_incremental_embedding_neardup" ->
        s"""SELECT * FROM (${oracleBase("q40_embedding_neardup")})
           |WHERE vec_a % 10 = 0 OR vec_b % 10 = 0""".stripMargin) +
      // q79 composes q34's component closure (its final SELECT becomes
      // a CTE) with q18's rounded quality as the ranking key: survivors
      // are each component's argmax-quality member (ties → lowest id),
      // singletons always survive.
      // the SQL-statement twins replay the exact oracles of the API
      // queries they route to — parse/rewrite/execute must be
      // result-identical to the direct TxLogTable calls
      ("q201_sql_txlog_merge" ->
        oracleBase("q119_txlog_merge_conditional")) +
      ("q202_sql_txlog_dml" -> oracleBase("q135_txlog_dml")) +
      ("q203_sql_txlog_time_travel" ->
        oracleBase("q198_txlog_time_travel")) +
      ("q204_sql_txlog_insert" ->
        """SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
          |FROM events WHERE event_id % 3 IN (0, 1)""".stripMargin) +
      // the stats census Catalyst consumes, recomputed from the raw
      // table: exact rows, min/max, null counts through a 2-commit fold
      ("q206_txlog_stats_census" ->
        """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
          |  CAST(MIN(event_id) AS BIGINT) AS min_event,
          |  CAST(MAX(event_id) AS BIGINT) AS max_event,
          |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS event_nulls,
          |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS value_nulls
          |FROM events""".stripMargin) +
      // catalog path: same final set as q204 (overwrite resets, then
      // the %3=1 append lands)
      ("q208_sql_txlog_catalog" ->
        """SELECT event_id, user_id, CAST(value AS DOUBLE) AS value
          |FROM events WHERE event_id % 3 IN (0, 1)""".stripMargin) +
      // DESCRIBE DETAIL restated: v0 create + 2 appends = version 2,
      // two coalesce(1) appends = 2 files, exact rows, base protocol
      ("q209_sql_txlog_detail" ->
        """SELECT CAST(2 AS BIGINT) AS version,
          |  CAST(2 AS BIGINT) AS num_files,
          |  CAST(COUNT(*) AS BIGINT) AS num_rows,
          |  CAST(1 AS BIGINT) AS min_reader
          |FROM events""".stripMargin) +
      // maintenance statements: zorder rewrite invisible to values;
      // vacuum count = the 2 pre-optimize dirs; history = 4 commits
      ("q207_sql_txlog_maintenance" ->
        """SELECT l_orderkey % 100 AS okey_bucket,
          |  CAST(COUNT(*) AS BIGINT) AS n_items,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty,
          |  CAST(2 AS BIGINT) AS n_removed,
          |  CAST(4 AS BIGINT) AS n_commits
          |FROM lineitem GROUP BY 1""".stripMargin) +
      // dynamic file pruning must be invisible to the join result
      ("q205_txlog_dynamic_pruning" ->
        """SELECT o.o_orderkey, o.o_custkey,
          |  CAST(COUNT(*) AS BIGINT) AS n_lines,
          |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
          |    AS sum_qty
          |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |WHERE o.o_orderkey % 997 = 1
          |GROUP BY 1, 2""".stripMargin) +
      ("q79_canonical_by_quality" -> {
        val ccAsCte = oracleBase("q34_dedup_closure").replace(
          "SELECT src AS vertex, least(src, MIN(dst)) AS component\nFROM reach GROUP BY src",
          ", comp0 AS (\n  SELECT src AS vertex, least(src, MIN(dst)) AS component\n  FROM reach GROUP BY src)")
        s"""$ccAsCte,
           |q AS (SELECT doc_id, quality FROM (${oracleBase("q18_quality_score")})),
           |f AS (
           |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component, q.quality
           |  FROM documents d
           |  LEFT JOIN comp0 c ON c.vertex = d.doc_id
           |  JOIN q ON q.doc_id = d.doc_id),
           |r AS (
           |  SELECT doc_id, row_number() OVER (
           |    PARTITION BY component ORDER BY quality DESC, doc_id) AS rn
           |  FROM f)
           |SELECT doc_id FROM r WHERE rn = 1""".stripMargin
      })
}
