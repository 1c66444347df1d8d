package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{DedupOps, MultimodalOps, SimilarityOps, TextOps}
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** Training-data-pipeline suite over `documents` and `embeddings`: text
  * analysis (tokens, quality, language ID, fingerprints), deduplication
  * (exact, n-gram Jaccard, MinHash+LSH, SimHash), similarity search
  * (brute-force and LSH-bucketed cosine), and multimodal binary-column
  * plumbing. Hash-based variants (MinHash/SimHash/LSH) are deterministic but
  * not SQL-expressible in DuckDB, so they get rows-only checks; everything
  * else has an exact oracle. */
object LlmQ {

  private val sqlToks =
    """toks AS (SELECT doc_id, lang, text,
      |  string_split_regex(trim(text), '\s+') AS t FROM documents)""".stripMargin

  /** DuckDB mirror of `TextOps.shingleSet(_, 3)`. */
  private val sqlShingles =
    s"""$sqlToks,
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |  generate_series(1, greatest(len(t) - 2, 0)),
       |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM toks)""".stripMargin

  val queries: ListMap[String, Q] = ListMap(

    // Token counting (whitespace tokenizer) + length stats.
    "q50_token_stats" -> Q(
      (s, d) => Tables.documents(s, d)
        .withColumn("t", TextOps.tokens(col("text")))
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("t")).as("n_tokens"),
          dec6(aggregate(col("t"), lit(0.0), (acc, x) => acc + length(x)) / size(col("t")))
            .as("avg_token_len"))
        .orderBy("doc_id"),
      Some(s"""WITH $sqlToks
              |SELECT doc_id, length(text) AS n_chars, len(t) AS n_tokens,
              |${r6("list_sum(list_transform(t, x -> CAST(length(x) AS DOUBLE))) / len(t)")}
              |  AS avg_token_len
              |FROM toks ORDER BY doc_id""".stripMargin)),

    // Quality scoring: stopword ratio + length-capped score
    // (the classic pre-training heuristics, cf. C4/Gopher-style filters).
    "q51_quality_score" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val docs = Tables.documents(s, d).withColumn("t", TextOps.tokens(col("text")))
        val nStop = TextOps.markerCount(col("t"), stop)
        val ratio = nStop / size(col("t"))
        docs.select(col("doc_id"),
            nStop.as("n_stop"),
            dec6(ratio).as("stop_ratio"),
            dec6(least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio)).as("quality"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, len(t) AS n,
              |  len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS n_stop
              |  FROM toks)
              |SELECT doc_id, n_stop,
              |${r6("CAST(n_stop AS DOUBLE) / n")} AS stop_ratio,
              |${r6("least(1.0, n / 200.0) * (1.0 - CAST(n_stop AS DOUBLE) / n)")} AS quality
              |FROM x ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition quality signals: most-frequent-token fraction
    // and duplicate-2-gram fraction, with the composite keep flag — the
    // repetition half of a pre-training quality filter (q51 covers the
    // stopword/length half). Pure HOFs both sides.
    "q69_repetition" -> Q(
      (s, d) => {
        // spread before the per-doc quadratic HOFs (top-token frac scans
        // distinct×all tokens): unspread this ran as two ~1.2 s single-task
        // stages (orderBy sample + final) with 31 cores idle
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        docs.select(col("doc_id"),
            dec6(TextOps.topTokenFrac(col("t"))).as("top_token_frac"),
            dec6(TextOps.dupBigramFrac(col("t"))).as("dup_2gram_frac"))
          .withColumn("keep",
            (col("top_token_frac") <= 0.2 && col("dup_2gram_frac") <= 0.3).cast("int"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t) END AS tf,
              |  CASE WHEN len(t) >= 2 THEN (
              |    CAST(len(t) - 1 - len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE)) / (len(t) - 1)
              |  WHEN len(t) > 0 THEN NULL END AS df
              |  FROM toks)
              |SELECT doc_id, ${r6("tf")} AS top_token_frac, ${r6("df")} AS dup_2gram_frac,
              |CAST(round(tf, 6) <= 0.2 AND round(df, 6) <= 0.3 AS INT) AS keep
              |FROM x ORDER BY doc_id""".stripMargin)),

    // BPE-ish subword tokenization (GPT-2-style pretokenizer reduced to
    // ASCII classes: contraction suffixes, space-prefixed letter/digit
    // runs, punctuation runs) — the token COUNT a tokenizer-budget filter
    // would use, where whitespace counts undercount ~15%. Identical regex
    // runs in DuckDB (RE2 and Java agree on this ASCII pattern).
    "q67_bpe_tokens" -> Q(
      (s, d) => {
        val pat = "'[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"
        val toks = regexp_extract_all(col("text"), lit(pat), lit(0))
        Tables.documents(s, d)
          .withColumn("bt", toks)
          .select(col("doc_id"),
            size(col("bt")).as("n_bpe"),
            dec6(aggregate(col("bt"), lit(0.0), (a, x) => a + length(x)) / size(col("bt")))
              .as("avg_bpe_len"))
          .orderBy("doc_id")
      },
      Some(s"""WITH b AS (SELECT doc_id,
              |  regexp_extract_all(text, '''[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+', 0) AS bt
              |  FROM documents)
              |SELECT doc_id, len(bt) AS n_bpe,
              |${r6("list_sum(list_transform(bt, x -> CAST(length(x) AS DOUBLE))) / len(bt)")}
              |  AS avg_bpe_len
              |FROM b ORDER BY doc_id""".stripMargin)),

    // Language ID by marker-word scoring (n-gram-free heuristic, cf.
    // fastText-style langid reduced to frequency evidence).
    "q52_langid" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).withColumn("t", TextOps.tokens(col("text")))
        val scores = TextOps.langMarkers.map { case (l, ms) =>
          TextOps.markerCount(col("t"), ms).as(s"s_$l")
        }
        docs.select((col("doc_id") +: col("lang") +: scores): _*)
          .withColumn("pred_lang",
            TextOps.predictLang(col("s_en"), col("s_de"), col("s_fr"), col("s_es")))
          .orderBy("doc_id")
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, lang,
              |  len(list_filter(t, x -> x IN ('the', 'a', 'of', 'and'))) AS s_en,
              |  len(list_filter(t, x -> x IN ('der', 'die', 'das', 'und'))) AS s_de,
              |  len(list_filter(t, x -> x IN ('le', 'la', 'les', 'et'))) AS s_fr,
              |  len(list_filter(t, x -> x IN ('el', 'los', 'las', 'y'))) AS s_es
              |  FROM toks)
              |SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
              |CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
              |     WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
              |     WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang
              |FROM x ORDER BY doc_id""".stripMargin)),

    // Content + bag-of-words fingerprints (document identity for dedup).
    "q53_fingerprint" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.bagFingerprint(col("text")).as("bag_fp"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
             |md5(array_to_string(list_sort(list_distinct(
             |  string_split_regex(trim(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), '\s+')
             |)), ' ')) AS bag_fp
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Exact dedup: canonical id per identical-content group.
    "q54_exact_dedup" -> Q(
      (s, d) => DedupOps.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .select("doc_id", "fp", "canonical_id", "group_size", "is_duplicate")
        .orderBy("doc_id"),
      Some("""WITH x AS (SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |  FROM documents)
             |SELECT doc_id, fp,
             |min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
             |count(*) OVER (PARTITION BY fp) AS group_size,
             |CAST(doc_id <> min(doc_id) OVER (PARTITION BY fp) AS INT) AS is_duplicate
             |FROM x ORDER BY doc_id""".stripMargin)),

    // n-gram Jaccard near-dup pairs via shared-shingle candidates (exact for
    // any threshold > 0 — J=0 pairs share no shingle). Oracle brute-forces
    // all pairs; the Spark side never cross-joins.
    "q55_ngram_jaccard" -> Q(
      (s, d) => DedupOps.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", 3, 0.2)
        .select(col("id_a"), col("id_b"), dec6(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH $sqlShingles,
              |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              |    / len(list_distinct(a.s || b.s)) AS j
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
              |SELECT id_a, id_b, ${r6("j")} AS jaccard
              |FROM p WHERE j >= 0.2 ORDER BY id_a, id_b""".stripMargin)),

    // MinHash+LSH banding (64 perms, 16 bands × 4 rows) with exact-Jaccard
    // verification. Hash-specific candidate set → rows-only check.
    "q56_minhash_lsh" -> Q(
      (s, d) => DedupOps.minhashLshPairs(Tables.documents(s, d), "doc_id", "text")
        .select(col("id_a"), col("id_b"), dec6(col("jaccard")).as("jaccard"))
        .orderBy("id_a", "id_b")),

    // SimHash near-dup pairs (64-bit, Hamming ≤ 3) via the pigeonhole
    // chunk join. Hash-specific → rows-only check.
    "q57_simhash_pairs" -> Q(
      (s, d) => DedupOps.simhashPairs(Tables.documents(s, d), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    // Near-dup clusters: exact Jaccard pairs collapsed to connected
    // components (min-label propagation), yielding the keep/drop list.
    // Oracle: DuckDB recomputes the same components through a recursive
    // transitive-closure CTE over its brute-force pair set — an
    // independent-engine proof of the iterative flooding.
    "q65_neardup_clusters" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2)
        DedupOps.nearDupClusters(docs, pairs, "doc_id")
          .orderBy("id")
      },
      Some(s"""WITH RECURSIVE $sqlShingles,
              |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              |    / len(list_distinct(a.s || b.s)) >= 0.2),
              |ed AS (SELECT id_a AS a, id_b AS b FROM p
              |  UNION SELECT id_b, id_a FROM p),
              |reach(a, b) AS (
              |  SELECT a, b FROM ed
              |  UNION
              |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a)
              |SELECT d.doc_id AS id,
              |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster,
              |  CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) <> d.doc_id AS INT)
              |    AS is_duplicate
              |FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              |GROUP BY d.doc_id ORDER BY id""".stripMargin)),

    // Brute-force cosine top-k against a broadcast query vector — the
    // exactness baseline for ANN.
    "q58_ann_topk" -> Q(
      (s, d) => SimilarityOps.bruteForceTopK(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10, scoreOut = dec6),
      Some(s"""WITH e AS (SELECT vec_id,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |x AS (SELECT vec_id,
              |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(v)),
              |    i -> v[i] * qv[i])), (acc, y) -> acc + y) AS dot,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nv,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nq
              |  FROM e, q)
              |SELECT vec_id,
              |${r6("CASE WHEN nv > 0 AND nq > 0 THEN dot / (nv * nq) END")} AS cos_sim
              |FROM x ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)),

    // LSH-bucketed ANN (4 random hyperplanes): candidates share the
    // query's sign-bit bucket. The seeded planes are DATA-INDEPENDENT,
    // so the oracle embeds them as literal arrays and replays bucket +
    // cosine + top-k exactly (the q344 technique; converted rows-only →
    // hash-green in round 12 — signs are bit-stable because both
    // engines fold the dot product in index order).
    "q59_ann_lsh" -> Q(
      (s, d) => SimilarityOps.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, seed = 7L, nPlanes = 4, dim = 64, scoreOut = dec6),
      Some(lshAnnOracle(probeDist = 0))),

    // Winnowing (MOSS) sketch near-dups: shared-fingerprint equi-join over
    // each doc's window-min gram hashes — finds overlapping-PASSAGE
    // near-dups that whole-document Jaccard misses, with a sketch ~2/(w+1)
    // the gram count. A document-frequency cutoff drops boilerplate
    // fingerprints before the join (a passage shared by >25 docs is
    // template text, not plagiarized content — and it's also the join's
    // quadratic term: this corpus has winnow hashes shared by 100s of
    // docs). Gram hashes are md5-derived (gramHashesMd5) so the
    // window-min selection — and hence the pair set — replays bit-for-bit
    // in the oracle; production swaps xxhash64 back in (hashes are only
    // compared, never read). Winnowing guarantees stay spec-verified.
    "q66_winnow_pairs" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        // persist: the two join branches alias columns differently, so their
        // exchanges canonicalize differently and ReuseExchange cannot share
        // the tokenize→winnow→df-window pipeline (the DedupOps pattern);
        // Bench/Verify release the blocks at the query boundary
        val fp = docs
          .withColumn("g", TextOps.gramHashesMd5(col("t"), 3)) // bind before winnow
          .select(col("doc_id"), explode_outer(TextOps.winnowMins(col("g"), 4)).as("f"))
          .filter(col("f").isNotNull)
          .withColumn("df", count(lit(1)).over(Window.partitionBy("f")))
          .filter(col("df") <= 25)
          .select("doc_id", "f")
          .persist()
        fp.select(col("doc_id").as("id_a"), col("f"))
          .join(fp.select(col("doc_id").as("id_b"), col("f")), Seq("f"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH tk AS (SELECT doc_id,
             |  string_split_regex(trim(text), '\s+') AS t FROM documents),
             |g AS (SELECT doc_id, list_transform(
             |  generate_series(1, greatest(len(t) - 2, 0)),
             |  i -> CAST(('0x' || substring(md5(
             |    concat_ws(' ', t[i], t[i+1], t[i+2])), 1, 15)) AS BIGINT)) AS gh
             |  FROM tk),
             |w AS (SELECT doc_id, CASE
             |  WHEN len(gh) - 3 >= 1 THEN list_distinct(list_transform(
             |    generate_series(1, len(gh) - 3), i -> list_min(gh[i:i+3])))
             |  WHEN len(gh) >= 1 THEN [list_min(gh)]
             |  ELSE [] END AS mins FROM g),
             |fp AS (SELECT doc_id, unnest(mins) AS f FROM w),
             |fd AS (SELECT doc_id, f FROM (SELECT doc_id, f,
             |  count(*) OVER (PARTITION BY f) AS df FROM fp) WHERE df <= 25)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |FROM fd a JOIN fd b ON a.f = b.f AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2""".stripMargin)),

    // Multi-probe LSH ANN (Hamming ≤ 1 around the query signature): the
    // OR-amplification recall lever over q59's single probe. Same
    // literal-plane oracle as q59 (hash-green since round 12): Hamming
    // ≤ 1 over 4 bits enumerates as bucket ∈ {qb, qb⊕1, qb⊕2, qb⊕4,
    // qb⊕8} — identical candidate set, no bit_count needed.
    "q63_ann_multiprobe" -> Q(
      (s, d) => SimilarityOps.lshTopKMultiProbe(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, k = 10, seed = 7L, nPlanes = 4, dim = 64, probeDist = 1, scoreOut = dec6),
      Some(lshAnnOracle(probeDist = 1))),

    // IVF ANN: k-means coarse quantizer (16 cells), probe the 4 nearest.
    // Centroid-specific → rows-only check; recall cross-validated in spec.
    "q64_ann_ivf" -> Q(
      (s, d) => {
        val (indexed, centers) = SimilarityOps.fitIvf(Tables.embeddings(s, d),
          "vec_id", "embedding", nCells = 16, seed = 7L,
          trainFraction = 0.25, maxIter = 10)
        SimilarityOps.ivfTopK(indexed, centers, "vec_id",
          queryId = 0L, k = 10, nProbe = 4, scoreOut = dec6)
      }),

    // PQ/ADC ANN (rows-only like the other approximate variants; recall
    // vs brute force + reconstruction-error monotonicity pinned in
    // PqAnnSpec): codes are 8 bytes/vector vs 256 for the raw floats —
    // the memory format a 100 TB embedding corpus actually serves from.
    // The m k-means fits are the offline index build, amortized in
    // production; the gate keeps them small (maxIter 5, 8 subspaces).
    "q105_ann_pq" -> Q(
      (s, d) => {
        val (encoded, codebooks) = SimilarityOps.fitPq(Tables.embeddings(s, d),
          "vec_id", "embedding", m = 8, k = 16, seed = 7L,
          trainFraction = 0.25, maxIter = 5)
        SimilarityOps.pqTopK(encoded, codebooks, "vec_id",
          queryId = 0L, k = 10, scoreOut = dec6)
      }),

    // IVFPQ (Jégou '11 IVFADC): coarse cells + PQ on the residual — the
    // composition both parts exist for, and the index shape production ANN
    // serves at 100 TB (probe nProbe cells, ADC within, scan touches only
    // (cell, 8-byte code)). Centroid-specific → rows-only check; recall
    // cross-validated against flat PQ in PqAnnSpec.
    "q110_ann_ivfpq" -> Q(
      (s, d) => {
        val (encoded, centers, codebooks) = SimilarityOps.fitIvfPq(
          Tables.embeddings(s, d), "vec_id", "embedding",
          nCells = 16, m = 8, k = 16, seed = 7L,
          trainFraction = 0.25, maxIter = 5)
        SimilarityOps.ivfPqTopK(encoded, centers, codebooks, "vec_id",
          queryId = 0L, k = 10, nProbe = 8, scoreOut = dec6)
      }),

    // Embedding near-dup pairs blocked by the label column (the coarse-
    // quantizer pattern): quadratic work bounded to block sizes.
    "q60_cosine_pairs" -> Q(
      (s, d) => SimilarityOps.blockedCosinePairs(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", threshold = 0.3, scoreOut = dec6)
        .orderBy("id_a", "id_b"),
      Some(s"""WITH e AS (SELECT vec_id, label,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
              |    i -> a.v[i] * b.v[i])), (acc, y) -> acc + y) AS dot,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, y -> y * y)),
              |    (acc, y) -> acc + y)) AS na,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(b.v, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nb
              |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
              |c AS (SELECT id_a, id_b,
              |  CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) END AS cos
              |  FROM p)
              |SELECT id_a, id_b, ${r6("cos")} AS cos_sim
              |FROM c WHERE cos > 0.3 ORDER BY id_a, id_b""".stripMargin)),

    // Multimodal metadata plumbing: binary payload + typed metadata struct.
    "q61_mm_metadata" -> Q(
      (s, d) => MultimodalOps.withPayload(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"),
          col("media_meta.byte_len").as("byte_len"),
          col("media_meta.mime").as("mime"),
          col("media_meta.n_chunks").as("n_chunks"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, octet_length(encode(text)) AS byte_len,
             |'application/octet-stream' AS mime,
             |CAST(floor(octet_length(encode(text)) / 256.0) + 1 AS INT) AS n_chunks
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Batched per-partition decode stub over the real bytes: demonstrates
    // the schema/partitioning/batch contract of a real media decoder.
    // Engine-side-only computation → rows-only check.
    // The decode stub computes pure byte arithmetic over the ASCII corpus,
    // so DuckDB can recompute it exactly: octet_length for byte_len,
    // ascii(first char) for head_byte, codepoint sum for byte_sum.
    "q62_mm_decode" -> Q(
      (s, d) => MultimodalOps.decodeFeatures(s,
          MultimodalOps.withPayload(Tables.documents(s, d), "doc_id", "text"))
        .toDF()
        .orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
             |SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS INT) AS byte_len,
             |  CASE WHEN octet_length(encode(text)) = 0 THEN -1
             |       ELSE ascii(substring(text, 1, 1)) END AS head_byte,
             |  CAST(coalesce(list_sum(list_transform(str_split(text, ''), x -> ascii(x))), 0) AS BIGINT) AS byte_sum,
             |  CAST(floor(octet_length(encode(text)) / 256.0) AS INT) + 1 AS frames
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Payload chunking + every-4th frame sampling, hash-verified: the
    // corpus is ASCII so DuckDB's text substring mirrors the byte slices
    // exactly (chunk arithmetic, boundaries, and the final short chunk).
    "q68_mm_chunks" -> Q(
      (s, d) => {
        MultimodalOps.sampledChunks(
            MultimodalOps.withPayload(Tables.documents(s, d), "doc_id", "text"),
            chunkBytes = 256, everyK = 4)
          .select(col("doc_id"), col("chunk_idx"),
            md5(col("chunk")).as("chunk_md5"),
            octet_length(col("chunk")).as("chunk_len"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""WITH m AS (SELECT doc_id, text,
             |  CAST(floor(octet_length(encode(text)) / 256.0) + 1 AS INT) AS nc
             |  FROM documents),
             |c AS (SELECT doc_id, u.i AS chunk_idx,
             |  substring(text, u.i * 256 + 1, 256) AS chunk
             |  FROM m, LATERAL (SELECT unnest(generate_series(0, m.nc - 1)) AS i) u)
             |SELECT doc_id, chunk_idx, md5(chunk) AS chunk_md5,
             |  octet_length(encode(chunk)) AS chunk_len
             |FROM c WHERE chunk_idx % 4 = 0
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Exact-target mixture rates + deterministic downsample: the scarcest
    // targeted language binds the feasible total (closed-form water line,
    // no iteration); kept quotas realize via the md5 u16 draw.
    "q198_mixture_rates" -> Q(
      (s, d) => graft.operators.CorpusOps.targetMixtureSample(
          Tables.documents(s, d), "doc_id", "lang",
          targetShares = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25),
          scoreOut = c => dec6(c))
        .orderBy("lang"),
      Some(s"""WITH t(lang, share) AS (VALUES ('de', 0.25), ('en', 0.5), ('zh', 0.25)),
              |c AS (SELECT d.lang, t.share AS target_share, count(*) AS n_docs
              |  FROM documents d JOIN t ON d.lang = t.lang
              |  GROUP BY d.lang, t.share),
              |f AS (SELECT min(floor(n_docs / target_share)) AS feasible_total FROM c),
              |r AS (SELECT c.*, f.feasible_total,
              |  CAST(floor(target_share * feasible_total) AS BIGINT) AS kept_target,
              |  floor(target_share * feasible_total) / n_docs AS keep_rate
              |  FROM c, f),
              |kept AS (SELECT d.lang, count(*) AS n_kept
              |  FROM documents d JOIN r ON d.lang = r.lang
              |  WHERE ((strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              |    + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              |    + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              |    + (strpos('0123456789abcdef', substring(md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1))
              |    / 65536.0 < r.keep_rate
              |  GROUP BY d.lang)
              |SELECT r.lang, r.n_docs, ${r6("r.target_share")} AS target_share,
              |  CAST(r.feasible_total AS BIGINT) AS feasible_total, r.kept_target,
              |  ${r6("r.keep_rate")} AS keep_rate,
              |  CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept
              |FROM r LEFT JOIN kept ON r.lang = kept.lang
              |ORDER BY r.lang""".stripMargin)),

    // Fuzzy duplicate pairs: (lang, ±1 length-bucket)-blocked candidates
    // confirmed by thresholded Levenshtein <= 16 — "same text, three
    // typos" dedup that token-set similarity can't separate. With
    // lenBucket (32) > maxDist (16) the ±1-bucket blocking has FULL
    // recall (|len diff| <= maxDist can straddle at most one boundary),
    // so the oracle's abs(lb diff) <= 1 is the same candidate set.
    "q196_fuzzy_pairs" -> Q(
      (s, d) => DedupOps.fuzzyDupPairs(Tables.documents(s, d), "doc_id",
          "text", blockCols = Seq("lang"), lenBucket = 32, maxDist = 16)
        .orderBy("id_a", "id_b"),
      Some("""WITH b AS (SELECT doc_id, lang, text,
             |  CAST(floor(length(text) / 32) AS INT) AS lb FROM documents)
             |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
             |  levenshtein(a.text, c.text) AS edit_dist
             |FROM b a JOIN b c ON a.lang = c.lang AND abs(a.lb - c.lb) <= 1
             |  AND a.doc_id < c.doc_id
             |WHERE levenshtein(a.text, c.text) <= 16
             |ORDER BY id_a, id_b""".stripMargin)),

    // Incremental NEAR-dup: the LSH twin of q103 — the daily batch
    // (doc_id % 5 == 0) band-joins the PERSISTED historical band index
    // (no re-shingling, no corpus rescan), with signature-only estimated
    // Jaccard as the verify. Band-hash-specific → rows-only check;
    // IncrementalNearDupSpec cross-validates against batch q56 machinery
    // on the union.
    "q211_incremental_near_dup" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val hist = docs.filter(col("doc_id") % 5 =!= 0)
        val bSig = DedupOps.minhashSignatures(batch, "doc_id", "text")
        val hSig = DedupOps.minhashSignatures(hist, "doc_id", "text")
        val hIdx = DedupOps.minhashBands(hSig, "doc_id", numHashes = 64, rows = 4)
        DedupOps.incrementalNearDup(bSig, hIdx, hSig, "doc_id",
            numHashes = 64, rows = 4, threshold = 0.3)
          .select(col("batch_id"), col("hist_id"),
            dec6(col("est_jaccard")).as("est_jaccard"))
          .orderBy("batch_id", "hist_id")
      }),

    // Fuzzy-blocking quality harness: pair recall + reduction ratio of the
    // (lang, ±1 length-bucket) blocker against the exact length-bound-only
    // candidate set, on a deterministic 1/4 sample — the fuzzy twin of
    // q155's LSH blocking audit. Recall is 1.0 BY CONSTRUCTION since
    // lenBucket (32) > maxDist (16); this harness keeps that claim
    // measured, not assumed. Sample-draw-specific denominator → rows-only.
    "q212_fuzzy_blocking_quality" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") % 4 === 0)
        val truth = DedupOps.fuzzyDupCandidates(docs, "doc_id", "text",
          blockCols = Seq("lang"), lenBucket = Int.MaxValue, maxDist = 16)
        val cand = DedupOps.fuzzyDupCandidates(docs, "doc_id", "text",
          blockCols = Seq("lang"), lenBucket = 32, maxDist = 16)
        DedupOps.blockingQuality(truth, cand, nDocs = docs.count(), scoreOut = dec6)
      }),

    // Exact-dedup impact report: duplicate-group-size histogram with the
    // docs/chars a dedup pass would drop per size — the "what does dedup
    // buy us" number that decides whether the near-dup pass is even worth
    // its shuffle. Rides q54's fingerprint grouping; one extra aggregate.
    "q226_dedup_impact" -> Q(
      (s, d) => DedupOps.exactDedup(Tables.documents(s, d), "doc_id", "text")
        .groupBy(col("group_size"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("is_duplicate").cast("long")).as("n_dups"),
          sum(when(col("is_duplicate") === 1, length(col("text")).cast("long"))
            .otherwise(lit(0L))).as("chars_dropped"))
        .withColumn("n_groups",
          (col("n_docs") / col("group_size")).cast("long"))
        .orderBy("group_size"),
      Some("""WITH f AS (SELECT doc_id, length(text) AS c,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |  FROM documents),
             |g AS (SELECT fp, count(*) AS gs, min(doc_id) AS canon
             |  FROM f GROUP BY fp),
             |x AS (SELECT f.doc_id, f.c, g.gs,
             |  CAST(f.doc_id <> g.canon AS INT) AS dup
             |  FROM f JOIN g USING (fp))
             |SELECT gs AS group_size, count(*) AS n_docs,
             |  CAST(sum(dup) AS BIGINT) AS n_dups,
             |  CAST(sum(dup * c) AS BIGINT) AS chars_dropped,
             |  CAST(count(*) / gs AS BIGINT) AS n_groups
             |FROM x GROUP BY gs ORDER BY group_size""".stripMargin)),

    // Calibration (reliability) curve for the q51 quality score against
    // the q69 repetition keep label: per score decile, predicted-vs-
    // observed rate and the |gap| whose n-weighted sum is the ECE — the
    // companion diagnostic to q221's PR sweep (a score can rank well and
    // still be miscalibrated).
    "q228_calibration" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(
          (least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            .as("q"),
          (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
            dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3)
            .cast("long").as("keep"))
        scored
          .withColumn("bucket", least(floor(col("q") * 10).cast("int"), lit(9)))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            dec6(avg("q")).as("mean_score"),
            dec6(avg(col("keep").cast("double"))).as("obs_rate"),
            dec6(abs(avg("q") - avg(col("keep").cast("double")))).as("abs_gap"))
          .orderBy("bucket")
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, t,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM toks),
              |scored AS (SELECT
              |  least(1.0, len(t) / 200.0) * (1.0 - ratio) AS q,
              |  CAST(${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3 AS BIGINT) AS keep
              |  FROM x)
              |SELECT least(CAST(floor(q * 10) AS INT), 9) AS bucket,
              |  count(*) AS n, ${r6("avg(q)")} AS mean_score,
              |  ${r6("avg(CAST(keep AS DOUBLE))")} AS obs_rate,
              |  ${r6("abs(avg(q) - avg(CAST(keep AS DOUBLE)))")} AS abs_gap
              |FROM scored GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Isotonic calibration (PAVA) of the q228 score/label pair: fits the
    // monotone map score → P(keep) whose gap q228's fixed deciles only
    // report. The oracle replays the PAVA stack pass as a list-typed
    // recursive CTE (the q215 precedent): one step per push-or-merge
    // operation over the dec6 score support, terminal state = all rows
    // consumed with no violating top pair. Block sums stay integer-valued
    // doubles (counts and 0/1 label sums), so the merge trajectory is
    // bit-exact cross-engine. IsotonicSpec additionally pins the
    // hand-worked pooling, monotonicity, mass conservation, and the
    // distinct-support collapse.
    "q276_isotonic_calibration" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(
          (least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            .as("q"),
          (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
            dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3)
            .cast("long").as("keep"))
        graft.operators.StatOps.isotonicCalibration(scored, "q", "keep",
            scoreOut = dec6)
          .orderBy("score")
      },
      Some(s"""WITH RECURSIVE $sqlToks,
              |x AS (SELECT doc_id, t,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM toks),
              |scored AS (SELECT
              |  ${r6("least(1.0, len(t) / 200.0) * (1.0 - ratio)")} AS q,
              |  CAST(${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3 AS BIGINT) AS keep
              |  FROM x),
              |sup AS (SELECT q AS x, count(*) AS n,
              |    CAST(sum(keep) AS DOUBLE) AS s,
              |    row_number() OVER (ORDER BY q) AS rn
              |  FROM scored GROUP BY q),
              |pava AS (
              |  SELECT 0 AS i,
              |    CAST([] AS STRUCT(w DOUBLE, v DOUBLE, r INTEGER)[]) AS st
              |  UNION ALL
              |  SELECT CASE WHEN p.needmerge THEN p.i ELSE p.i + 1 END AS i,
              |    CASE WHEN p.needmerge THEN list_append(p.st[1:len(p.st)-2],
              |        {'w': p.st[-2].w + p.st[-1].w,
              |         'v': p.st[-2].v + p.st[-1].v,
              |         'r': p.st[-2].r + p.st[-1].r})
              |      ELSE list_append(p.st,
              |        {'w': CAST(nxt.n AS DOUBLE), 'v': nxt.s, 'r': 1})
              |    END AS st
              |  FROM (SELECT i, st, len(st) >= 2 AND
              |          st[-2].v / st[-2].w > st[-1].v / st[-1].w AS needmerge
              |        FROM pava) p
              |  LEFT JOIN sup nxt ON nxt.rn = p.i + 1
              |  WHERE p.needmerge OR nxt.rn IS NOT NULL),
              |fin AS (SELECT st FROM pava
              |  WHERE i = (SELECT count(*) FROM sup)
              |    AND NOT (len(st) >= 2
              |      AND st[-2].v / st[-2].w > st[-1].v / st[-1].w)),
              |blocks AS (SELECT unnest(st) AS b,
              |    generate_subscripts(st, 1) AS bi FROM fin),
              |be AS (SELECT bi, b.w AS w, b.v AS v, b.r AS r,
              |    sum(b.r) OVER (ORDER BY bi) AS rend FROM blocks),
              |fit AS (SELECT v / w AS iso, rend - r + 1 AS rstart, rend
              |  FROM be)
              |SELECT sup.x AS score, CAST(sup.n AS BIGINT) AS n,
              |  ${r6("sup.s / sup.n")} AS obs_rate,
              |  ${r6("fit.iso")} AS iso_rate
              |FROM sup JOIN fit ON sup.rn BETWEEN fit.rstart AND fit.rend
              |ORDER BY score""".stripMargin)),

    // Cohen's kappa between the two cheap labelers (q51 quality >= 0.5 vs
    // q69 repetition keep): are they independent signals or the same
    // filter twice? One four-counter aggregate — the redundancy check a
    // curation pipeline runs before paying for BOTH filters at 100 TB.
    "q232_labeler_kappa" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val labeled = docs.select(
          ((least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            >= 0.5).cast("long").as("a"),
          (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
            dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3)
            .cast("long").as("b"))
        graft.operators.StatOps.cohensKappa(labeled, "a", "b", dec6)
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, t,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM toks),
              |lab AS (SELECT
              |  CAST(least(1.0, len(t) / 200.0) * (1.0 - ratio) >= 0.5
              |    AS INT) AS a,
              |  CAST(${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3 AS INT) AS b
              |  FROM x),
              |agg AS (SELECT count(*) AS n,
              |  avg(CAST(a AS DOUBLE)) AS pa, avg(CAST(b AS DOUBLE)) AS pb,
              |  avg(CASE WHEN a = b THEN 1.0 ELSE 0.0 END) AS po FROM lab)
              |SELECT n, ${r6("pa")} AS p_a, ${r6("pb")} AS p_b,
              |  ${r6("po")} AS po,
              |  ${r6("pa*pb + (1-pa)*(1-pb)")} AS pe,
              |  ${r6("CASE WHEN pa*pb + (1-pa)*(1-pb) < 1.0 THEN " +
                 "(po - (pa*pb + (1-pa)*(1-pb))) / (1.0 - (pa*pb + (1-pa)*(1-pb))) END")}
              |  AS kappa
              |FROM agg""".stripMargin)),

    // Grid-density outliers over the leading 2 embedding coordinates:
    // DBSCAN's density intuition as a two-pass linear scan (cell count +
    // cell-keyed window), never a pairwise radius search — the outlier
    // sweep that scales to any corpus. Reported per label.
    "q231_grid_outliers" -> Q(
      (s, d) => SimilarityOps.gridDensityOutliers(
          Tables.embeddings(s, d), "vec_id", "embedding", "label",
          dims = 2, h = 0.05, minPts = 3, scoreOut = dec6),
      Some(s"""WITH b AS (SELECT vec_id, label, concat_ws(',',
              |  CAST(CAST(floor(CAST(embedding[1] AS DOUBLE) / 0.05)
              |    AS BIGINT) AS VARCHAR),
              |  CAST(CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05)
              |    AS BIGINT) AS VARCHAR)) AS cell FROM embeddings),
              |w AS (SELECT *, count(*) OVER (PARTITION BY cell) AS n_cell
              |  FROM b)
              |SELECT label, count(*) AS n_points,
              |  CAST(sum(CASE WHEN n_cell < 3 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_outliers,
              |  ${r6("avg(CASE WHEN n_cell < 3 THEN 1.0 ELSE 0.0 END)")}
              |    AS outlier_rate,
              |  count(DISTINCT cell) AS n_cells
              |FROM w GROUP BY label ORDER BY label""".stripMargin)),

    // Positional phrase search ("table scan") via posting-list equi-joins
    // — the inverted-index query plan: token filters prune the exploded
    // postings BEFORE the (doc, pos+1)=(doc, pos) join, so join inputs
    // are term-frequency-sized, never corpus-sized.
    "q235_phrase_search" -> Q(
      (s, d) => graft.operators.CorpusOps.phraseSearch(
          Tables.documents(s, d), "doc_id", "text", Seq("table", "scan"))
        .orderBy("doc_id"),
      Some(s"""WITH $sqlToks,
              |m AS (SELECT doc_id,
              |  CAST(len(list_filter(generate_series(1, len(t) - 1),
              |    i -> t[i] = 'table' AND t[i+1] = 'scan')) AS BIGINT)
              |    AS n_matches
              |  FROM toks WHERE len(t) >= 2)
              |SELECT doc_id, n_matches FROM m WHERE n_matches > 0
              |ORDER BY doc_id""".stripMargin)),

    // Per-source curation report: the composite scorecard (volume,
    // language mix, token budget, quality, keep rate) that decides which
    // sources get up/down-weighted in the q86 mixture — one grouped scan.
    "q236_source_report" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val q = least(lit(1.0), size(col("t")) / lit(200.0)) *
          (lit(1.0) - ratio)
        val keep = (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
          dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3).cast("double")
        docs.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("lang").as("n_langs"),
            dec6(avg(size(col("t")).cast("double"))).as("mean_tokens"),
            dec6(avg(q)).as("mean_quality"),
            dec6(avg(keep)).as("keep_rate"))
          .orderBy("source")
      },
      Some(s"""WITH tk AS (SELECT doc_id, lang, source,
              |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
              |x AS (SELECT source, lang, len(t) AS nt,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM tk),
              |lab AS (SELECT source, lang, nt,
              |  least(1.0, nt / 200.0) * (1.0 - ratio) AS q,
              |  CASE WHEN ${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3
              |    THEN 1.0 ELSE 0.0 END AS keep FROM x)
              |SELECT source, count(*) AS n_docs,
              |  count(DISTINCT lang) AS n_langs,
              |  ${r6("avg(CAST(nt AS DOUBLE))")} AS mean_tokens,
              |  ${r6("avg(q)")} AS mean_quality,
              |  ${r6("avg(keep)")} AS keep_rate
              |FROM lab GROUP BY source ORDER BY source""".stripMargin)),

    // ROC AUC of the q51 quality score against the q69 repetition keep
    // label — the threshold-free rank statistic completing the q221 (PR
    // sweep) / q228 (calibration) harness trio. Corpus collapses to the
    // distinct ROUNDED-score table before the one rank window (the q171
    // midrank machinery), so ties — and the AUC — are engine-identical.
    "q237_quality_auc" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(
          dec6(least(lit(1.0), size(col("t")) / lit(200.0)) *
            (lit(1.0) - ratio)).as("quality"),
          (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
            dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3).cast("long").as("keep"))
        graft.operators.StatOps.rocAuc(scored, "quality", "keep",
          scoreOut = dec6)
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, t,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM toks),
              |scored AS (SELECT
              |  ${r6("least(1.0, len(t) / 200.0) * (1.0 - ratio)")} AS s,
              |  CAST(${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3 AS BIGINT) AS y
              |  FROM x),
              |bys AS (SELECT s, count(*) AS t, sum(y) AS tp
              |  FROM scored GROUP BY s),
              |rk AS (SELECT tp, t,
              |  (sum(t) OVER (ORDER BY s) * 2 - t + 1) / 2.0 AS midrank
              |  FROM bys),
              |ag AS (SELECT CAST(sum(tp) AS DOUBLE) AS np,
              |  CAST(sum(t - tp) AS DOUBLE) AS nn,
              |  count(*) AS n_scores, sum(tp * midrank) AS rp FROM rk)
              |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
              |  n_scores,
              |  CASE WHEN np > 0 AND nn > 0 THEN
              |    ${r6("(rp - np * (np + 1) / 2) / (np * nn)")} END AS auc
              |FROM ag""".stripMargin)),

    // Per-source Pareto frontier on (token count, quality): the documents
    // not dominated on both axes — the best document at every length
    // budget, i.e. the multi-objective curation cut. Two group-partitioned
    // windows (strictly-longer max + same-length tie max), never the
    // O(n^2) dominance self-join.
    "q239_pareto_frontier" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val base = docs.select(col("doc_id"), col("source"),
          size(col("t")).as("n_tokens"),
          dec6(least(lit(1.0), size(col("t")) / lit(200.0)) *
            (lit(1.0) - ratio)).as("quality"))
        graft.operators.StatOps.paretoFrontier(base, "source",
            "n_tokens", "quality")
          .orderBy("source", "n_tokens", "doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, source,
              |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
              |b AS (SELECT doc_id, source, len(t) AS n_tokens,
              |  ${r6("""least(1.0, len(t) / 200.0) * (1.0 -
              |    CAST(len(list_filter(t, y -> list_contains(
              |      ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |      / len(t))""")} AS quality
              |  FROM tk),
              |w AS (SELECT doc_id, source, n_tokens, quality,
              |  max(quality) OVER (PARTITION BY source ORDER BY n_tokens
              |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS m1,
              |  max(quality) OVER (PARTITION BY source, n_tokens) AS m2
              |  FROM b)
              |SELECT doc_id, source, n_tokens, quality FROM w
              |WHERE (m1 IS NULL OR quality > m1) AND quality = m2
              |ORDER BY source, n_tokens, doc_id""".stripMargin)),

    // Quality-score calibration: PR sweep of the q51 stopword/length
    // quality score against q69's Gopher-repetition keep flag as the weak
    // label — "where to cut" answered with measured precision/recall per
    // threshold instead of a folklore constant. One scan + a 10-threshold
    // keyed aggregate.
    "q221_quality_pr_curve" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        // spread the narrow gate scan before the quadratic repetition HOFs
        // (top-token frac is distinct x tokens per doc) — the q69 fix
        val docs = graft.operators.Spread.ifNarrow(Tables.documents(s, d))
          .withColumn("t", TextOps.tokens(col("text")))
        val ratio = TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(
          (least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            .as("quality"),
          (dec6(TextOps.topTokenFrac(col("t"))) <= 0.2 &&
            dec6(TextOps.dupBigramFrac(col("t"))) <= 0.3).cast("long").as("keep"))
        graft.operators.StatOps.prCurve(scored, "quality", "keep",
            thresholds = (0 to 9).map(_ / 10.0), scoreOut = dec6)
          .orderBy("threshold")
      },
      Some(s"""WITH $sqlToks,
              |x AS (SELECT doc_id, t,
              |  CAST(len(list_filter(t, y -> list_contains(
              |    ['a', 'the', 'and', 'of', 'in', 'to'], y))) AS DOUBLE)
              |    / len(t) AS ratio,
              |  CASE WHEN len(t) > 0 THEN
              |    CAST(list_max(list_transform(list_distinct(t),
              |      x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
              |  END AS tf,
              |  CASE WHEN len(t) > 1 THEN
              |    1.0 - CAST(len(list_distinct(list_transform(
              |      generate_series(1, len(t) - 1),
              |      i -> concat_ws(' ', t[i], t[i+1])))) AS DOUBLE) / (len(t) - 1)
              |  ELSE 0.0 END AS dg
              |  FROM toks),
              |scored AS (SELECT
              |  least(1.0, len(t) / 200.0) * (1.0 - ratio) AS s,
              |  CAST(${r6("tf")} <= 0.2 AND ${r6("dg")} <= 0.3 AS BIGINT) AS y
              |  FROM x),
              |sweep AS (SELECT s, y, th / 10.0 AS threshold
              |  FROM scored, LATERAL (SELECT unnest(generate_series(0, 9)) AS th)),
              |ag AS (SELECT threshold, count(*) AS n,
              |  CAST(sum(y) AS BIGINT) AS n_pos,
              |  CAST(sum(CAST(s >= threshold AS INT)) AS BIGINT) AS n_pred_pos,
              |  CAST(sum(CAST(s >= threshold AS INT) * y) AS BIGINT) AS tp
              |  FROM sweep GROUP BY threshold)
              |SELECT threshold, n, n_pos, n_pred_pos, tp,
              |  ${r6("CASE WHEN n_pred_pos > 0 THEN CAST(tp AS DOUBLE) / n_pred_pos END")} AS precision,
              |  ${r6("CASE WHEN n_pos > 0 THEN CAST(tp AS DOUBLE) / n_pos END")} AS recall,
              |  ${r6("""CASE WHEN n_pred_pos > 0 AND n_pos > 0
              |    AND CAST(tp AS DOUBLE) / n_pred_pos + CAST(tp AS DOUBLE) / n_pos > 0
              |  THEN 2.0 * (CAST(tp AS DOUBLE) / n_pred_pos) * (CAST(tp AS DOUBLE) / n_pos)
              |    / (CAST(tp AS DOUBLE) / n_pred_pos + CAST(tp AS DOUBLE) / n_pos) END""")} AS f1
              |FROM ag ORDER BY threshold""".stripMargin)),

    // PQ reconstruction-distortion report: per-subspace MSE vs slice
    // energy for the q105 codebook budget (m=8, k=16) — the storage-side
    // quality denominator next to q153's recall. Codebook-specific →
    // rows-only; PqDistortionSpec pins the contracts.
    "q218_pq_distortion" -> Q(
      (s, d) => SimilarityOps.pqDistortion(Tables.embeddings(s, d),
        "vec_id", "embedding", m = 8, k = 16, seed = 11L, scoreOut = dec6)),

    // Leave-one-out kNN label eval on the vec_id % 10 query slice:
    // does cosine neighborhood structure predict the label? Per-label
    // accuracy + overall row; rounded-cosine ranks and smallest-label
    // vote ties keep both engines' predictions identical.
    "q220_knn_label_eval" -> Q(
      (s, d) => SimilarityOps.knnLabelEval(Tables.embeddings(s, d),
        "vec_id", "embedding", "label", k = 5, sampleMod = 10, scoreOut = dec6),
      Some(s"""WITH e AS (SELECT vec_id, label,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |nrm AS (SELECT vec_id, label, v,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nv FROM e),
              |q AS (SELECT vec_id AS qid, label AS qlbl, v AS qv, nv AS qn
              |  FROM nrm WHERE vec_id % 10 = 0),
              |p AS (SELECT q.qid, q.qlbl, nrm.vec_id, nrm.label,
              |  ${r6(s"""CASE WHEN nrm.nv > 0 AND q.qn > 0 THEN
              |    list_reduce(list_prepend(0.0, list_transform(
              |      generate_series(1, len(nrm.v)), i -> nrm.v[i] * q.qv[i])),
              |      (acc, y) -> acc + y) / (nrm.nv * q.qn) ELSE 0.0 END""")} AS cs
              |  FROM nrm JOIN q ON nrm.vec_id <> q.qid),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY qid
              |    ORDER BY cs DESC, vec_id) AS r FROM p),
              |votes AS (SELECT qid, qlbl, label, count(*) AS nv
              |  FROM rk WHERE r <= 5 GROUP BY 1, 2, 3),
              |pred AS (SELECT qid, qlbl, label, row_number() OVER (
              |    PARTITION BY qid ORDER BY nv DESC, label) AS vr FROM votes),
              |ok AS (SELECT qid, qlbl, CAST(label = qlbl AS BIGINT) AS ok
              |  FROM pred WHERE vr = 1)
              |SELECT CAST(qlbl AS INT) AS label, count(*) AS n_queries,
              |  CAST(sum(ok) AS BIGINT) AS n_correct,
              |  ${r6("CAST(sum(ok) AS DOUBLE) / count(*)")} AS accuracy
              |FROM ok GROUP BY 1
              |UNION ALL
              |SELECT -1, count(*), CAST(sum(ok) AS BIGINT),
              |  ${r6("CAST(sum(ok) AS DOUBLE) / count(*)")} FROM ok
              |ORDER BY label""".stripMargin)),

    // Embedding snapshot drift: per label (and overall, label -1), the
    // cosine between the two snapshot halves' centroids and the L2
    // centroid shift — the "did the new encoder move the space" check
    // run before swapping an embedding index. vec_id parity stands in for
    // the two snapshots; centroids are elementwise means assembled from
    // one posexplode + (label, half, dim)-keyed aggregate (map-side
    // combinable; dims x labels x 2 rows, never vector-count-sized
    // state).
    "q224_embedding_drift" -> Q(
      (s, d) => {
        val base = Tables.embeddings(s, d).select(col("label"),
          SimilarityOps.toDouble(col("embedding")).as("v"),
          (col("vec_id") % 2).cast("int").as("half"))
        val e = base.unionByName(base.withColumn("label", lit(-1)))
        val el = e.select(col("label"), col("half"),
            posexplode(col("v")).as(Seq("i", "x")))
          .groupBy("label", "half", "i").agg(avg("x").as("m"))
        val cent = el.groupBy("label", "half")
          .agg(sort_array(collect_list(struct(col("i"), col("m"))))
            .getField("m").as("c"))
        val counts = e.groupBy("label", "half").agg(count(lit(1)).as("n"))
        val a = cent.filter(col("half") === 0)
          .join(counts.filter(col("half") === 0), Seq("label", "half"))
          .select(col("label"), col("c").as("ca"), col("n").as("n_a"))
        val b = cent.filter(col("half") === 1)
          .join(counts.filter(col("half") === 1), Seq("label", "half"))
          .select(col("label"), col("c").as("cb"), col("n").as("n_b"))
        val dot = SimilarityOps.dot(col("ca"), col("cb"))
        val l2 = sqrt(aggregate(zip_with(col("ca"), col("cb"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
        a.join(b, Seq("label"))
          .select(col("label"), col("n_a"), col("n_b"),
            dec6(dot / (SimilarityOps.norm(col("ca")) *
              SimilarityOps.norm(col("cb")))).as("centroid_cos"),
            dec6(l2).as("l2_shift"))
          .orderBy("label")
      },
      Some(s"""WITH e0 AS (SELECT label, CAST(vec_id % 2 AS INT) AS half,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |e AS (SELECT * FROM e0
              |  UNION ALL SELECT -1 AS label, half, v FROM e0),
              |el AS (SELECT label, half, s.i, avg(v[s.i]) AS m
              |  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) s
              |  GROUP BY 1, 2, 3),
              |cent AS (SELECT label, half, list(m ORDER BY i) AS c
              |  FROM el GROUP BY 1, 2),
              |cnt AS (SELECT label, half, count(*) AS n FROM e GROUP BY 1, 2),
              |a AS (SELECT cent.label, c AS ca, n AS n_a FROM cent
              |  JOIN cnt USING (label, half) WHERE half = 0),
              |b AS (SELECT cent.label, c AS cb, n AS n_b FROM cent
              |  JOIN cnt USING (label, half) WHERE half = 1),
              |x AS (SELECT label, n_a, n_b,
              |  list_reduce(list_prepend(0.0, list_transform(
              |    generate_series(1, 64), i -> ca[i] * cb[i])),
              |    (acc, y) -> acc + y) AS dd,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(ca, y -> y * y)),
              |    (acc, y) -> acc + y)) AS na,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(cb, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nb,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(
              |    generate_series(1, 64), i -> (ca[i] - cb[i]) * (ca[i] - cb[i]))),
              |    (acc, y) -> acc + y)) AS l2
              |  FROM a JOIN b USING (label))
              |SELECT label, n_a, n_b, ${r6("dd / (na * nb)")} AS centroid_cos,
              |  ${r6("l2")} AS l2_shift
              |FROM x ORDER BY label""".stripMargin)),

    // Tokenizer fertility per language: chars-per-token and tokens-per-doc
    // by lang — the budget-planning numbers behind "how many training
    // tokens does this corpus slice actually buy"; languages whose
    // fertility outruns the corpus mean get tokenizer attention first.
    // One map-side-combinable aggregate over (lang, counts).
    "q185_fertility" -> Q(
      (s, d) => {
        graft.functions.VectorFunctions.register(s)
        Tables.documents(s, d)
        .select(col("lang"), length(col("text")).cast("long").as("c"),
          TextOps.tokenCountFast(col("text")).cast("long").as("n"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("c").as("total_chars"), sum("n").as("total_tokens"),
          dec6(sum("c").cast("double") / sum("n")).as("chars_per_token"),
          dec6(sum("n").cast("double") / count(lit(1))).as("tokens_per_doc"))
        .orderBy("lang")
      },
      Some(s"""WITH x AS (SELECT lang, CAST(length(text) AS BIGINT) AS c,
              |  CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
              |  FROM documents)
              |SELECT lang, count(*) AS n_docs,
              |  CAST(sum(c) AS BIGINT) AS total_chars,
              |  CAST(sum(n) AS BIGINT) AS total_tokens,
              |  ${r6("CAST(sum(c) AS DOUBLE) / sum(n)")} AS chars_per_token,
              |  ${r6("CAST(sum(n) AS DOUBLE) / count(*)")} AS tokens_per_doc
              |FROM x GROUP BY lang ORDER BY lang""".stripMargin)),

    // Matryoshka truncation eval: top-10 survival when cosine search runs
    // on the first 8/16/64 dims — TakeOrdered per budget over the rounded
    // truncated cosine, never a corpus-wide rank window; the 64-dim row is
    // the recall=1 sanity anchor.
    "q183_matryoshka" -> Q(
      (s, d) => SimilarityOps.matryoshkaRecall(Tables.embeddings(s, d),
        "vec_id", "embedding", queryId = 0L, k = 10, dims = Seq(8, 16, 64),
        scoreOut = dec6),
      Some {
        def topkAt(d: Int, name: String) =
          s"""$name AS (SELECT vec_id FROM (
             |  SELECT vec_id,
             |    ${r6(s"""CASE WHEN nv_$d > 0 AND nq_$d > 0
             |      THEN dot_$d / (nv_$d * nq_$d) END""")} AS cs
             |  FROM x ORDER BY cs DESC, vec_id LIMIT 10))""".stripMargin
        def parts(d: Int) =
          s"""  list_reduce(list_prepend(0.0, list_transform(generate_series(1, $d),
             |    i -> v[i] * qv[i])), (acc, y) -> acc + y) AS dot_$d,
             |  sqrt(list_reduce(list_prepend(0.0, list_transform(v[1:$d], y -> y * y)),
             |    (acc, y) -> acc + y)) AS nv_$d,
             |  sqrt(list_reduce(list_prepend(0.0, list_transform(qv[1:$d], y -> y * y)),
             |    (acc, y) -> acc + y)) AS nq_$d""".stripMargin
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |x AS (SELECT vec_id,
           |${parts(8)},
           |${parts(16)},
           |${parts(64)}
           |  FROM e, q),
           |${topkAt(8, "t8")},
           |${topkAt(16, "t16")},
           |${topkAt(64, "t64")},
           |u AS (SELECT 8 AS dim_budget, vec_id FROM t8
           |  UNION ALL SELECT 16, vec_id FROM t16
           |  UNION ALL SELECT 64, vec_id FROM t64)
           |SELECT u.dim_budget, count(*) AS k,
           |  CAST(sum(CASE WHEN t64.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_overlap,
           |  ${r6("""CAST(sum(CASE WHEN t64.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS DOUBLE) / count(*)""")} AS recall
           |FROM u LEFT JOIN t64 ON u.vec_id = t64.vec_id
           |GROUP BY u.dim_budget ORDER BY u.dim_budget""".stripMargin
      }),

    // Embedding-cloud diversity of a deterministic id-sample: mean/min/max
    // pairwise cosine — the before/after-dedup spread check. Sample by
    // vec_id % 37 (engine-neutral, no RNG); pair table is sample-bounded.
    "q184_sample_diversity" -> Q(
      (s, d) => SimilarityOps.sampleDiversity(Tables.embeddings(s, d),
        "vec_id", "embedding", sampleMod = 37L, scoreOut = dec6),
      Some(s"""WITH e AS (SELECT vec_id,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings WHERE vec_id % 37 = 0),
              |n AS (SELECT vec_id, v,
              |  sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)),
              |    (acc, y) -> acc + y)) AS nv FROM e),
              |p AS (SELECT
              |  CASE WHEN a.nv > 0 AND b.nv > 0 THEN
              |    list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
              |      i -> a.v[i] * b.v[i])), (acc, y) -> acc + y) / (a.nv * b.nv)
              |  END AS cos
              |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
              |s AS (SELECT count(*) AS n_pairs, avg(cos) AS m,
              |  min(cos) AS lo, max(cos) AS hi FROM p),
              |c AS (SELECT count(*) AS n_sample FROM e)
              |SELECT c.n_sample, s.n_pairs, ${r6("s.m")} AS mean_cos,
              |  ${r6("s.lo")} AS min_cos, ${r6("s.hi")} AS max_cos
              |FROM c, s""".stripMargin))
  )

  /** Shared oracle for the q59/q63 LSH ANN pair: the seeded hyperplanes
    * (data-INDEPENDENT, `hyperplanes(7, 4, 64)`) are rendered as literal
    * arrays into the SQL, the sign-bit bucket is the identical in-index-
    * order dot-product fold (`Double.toString` round-trips exactly, so
    * the parsed plane bits — and hence every sign — match Spark's), and
    * the candidate filter is bucket equality (`probeDist = 0`) or the
    * Hamming ≤ 1 xor enumeration (`probeDist = 1`). A `def` — `queries`
    * above initializes first and would read a forward-referenced val as
    * null. */
  private def lshAnnOracle(probeDist: Int): String = {
    require(probeDist == 0 || probeDist == 1)
    val planes = SimilarityOps.hyperplanes(seed = 7L, planes = 4, dim = 64)
    def dotFold(vExpr: String, qExpr: String): String =
      s"""list_reduce(list_prepend(0.0, list_transform(
         |    generate_series(1, 64), i -> $vExpr[i] * $qExpr[i])),
         |    (acc, y) -> acc + y)""".stripMargin
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val lit = p.mkString("[", ", ", "]")
      s"""(CASE WHEN ${dotFold("v", s"($lit)")} > 0
         |    THEN ${1L << i} ELSE 0 END)""".stripMargin
    }.mkString("\n  + ")
    val cand =
      if (probeDist == 0) "sg.bucket = q.qb"
      else ("sg.bucket = q.qb" +: (0 until 4).map(i =>
        s"sg.bucket = xor(q.qb, ${1L << i})")).mkString(" OR ")
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |sg AS (SELECT vec_id, v,
       |  $bucket AS bucket,
       |  sqrt(list_reduce(list_prepend(0.0,
       |    list_transform(v, y -> y * y)), (acc, y) -> acc + y)) AS nv
       |  FROM e),
       |q AS (SELECT v AS qv, bucket AS qb, nv AS qn FROM sg WHERE vec_id = 0)
       |SELECT sg.vec_id, ${r6(s"""CASE WHEN sg.nv > 0 AND q.qn > 0
       |  THEN (${dotFold("sg.v", "q.qv")}) / (sg.nv * q.qn) END""")} AS cos_sim
       |FROM sg, q WHERE $cand
       |ORDER BY cos_sim DESC NULLS LAST, sg.vec_id LIMIT 10""".stripMargin
  }
}
