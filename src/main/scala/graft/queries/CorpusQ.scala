package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{CorpusOps, DedupOps, SimilarityOps}
import Q.{dec6, r6}
import scala.collection.immutable.ListMap

/** Corpus-curation suite: the corpus-LEVEL stages of a training-data
  * pipeline that sit between per-document signals (LlmQ) and a training
  * run — benchmark decontamination, mixture sampling, vocabulary/relevance
  * statistics, and semantic (embedding-space) deduplication. */
object CorpusQ {

  private val sqlToks =
    """toks AS (SELECT doc_id, lang, source, n_chars,
      |  string_split_regex(trim(text), '\s+') AS t FROM documents)""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    // Benchmark decontamination: docs where doc_id % 37 = 0 stand in for the
    // eval corpus; every remaining training doc is scored by how many of its
    // distinct word 5-grams appear anywhere in the eval set. The Spark side
    // joins 8-byte gram hashes against a broadcast eval-gram set; the oracle
    // rebuilds the same overlap from string shingles.
    "q80_contamination" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val eval = docs.filter(col("doc_id") % 37 === 0)
        val train = docs.filter(col("doc_id") % 37 =!= 0)
        CorpusOps.contamination(train, eval, "doc_id", "text", n = 5)
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |sh AS (SELECT doc_id, list_distinct(list_transform(
             |  generate_series(1, greatest(len(t) - 4, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) AS s FROM toks),
             |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 0),
             |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 0),
             |hits AS (SELECT tr.doc_id, count(*) AS n_shared
             |  FROM tr JOIN ev USING (g) GROUP BY tr.doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
             |  CAST(coalesce(h.n_shared, 0) > 0 AS INT) AS contaminated
             |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
             |WHERE d.doc_id % 37 <> 0 ORDER BY d.doc_id""".stripMargin)),

    // Mixture sampling: deterministic hash-bucket stratified sample with
    // per-language keep rates (en 8/16, de/fr 4/16, rest 2/16). Both
    // engines derive the bucket from the same md5 hex digit, so the sampled
    // row set is bit-identical — the reproducibility property the operator
    // exists for.
    "q81_stratified_sample" -> Q(
      (s, d) => CorpusOps.stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          keepOf16 = Map("en" -> 8, "de" -> 4, "fr" -> 4), defaultKeep = 2)
        .select("doc_id", "lang", "bucket", "keep_of_16")
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id, lang,
             |  CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
             |    AS INT) AS bucket,
             |  CAST(CASE lang WHEN 'en' THEN 8 WHEN 'de' THEN 4 WHEN 'fr' THEN 4 ELSE 2 END
             |    AS INT) AS keep_of_16
             |  FROM documents)
             |SELECT doc_id, lang, bucket, keep_of_16 FROM b
             |WHERE bucket < keep_of_16 ORDER BY doc_id""".stripMargin)),

    // SemDeDup-style semantic dedup (Abbas et al. '23): embedding cosine
    // pairs within coarse blocks collapsed to connected components → the
    // keep/drop list. Reuses the label-blocked pair generator (q60) and the
    // star-contraction components (q65); the oracle independently rebuilds
    // both stages (brute-force blocked pairs + recursive transitive closure).
    "q84_semdedup" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pairs = SimilarityOps.blockedCosinePairs(emb, "vec_id", "embedding",
          "label", threshold = 0.3, scoreOut = identity)
        DedupOps.nearDupClusters(emb, pairs, "vec_id")
          .orderBy("id")
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, label,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |p0 AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(a.v)),
             |    i -> a.v[i] * b.v[i])), (acc, y) -> acc + y) AS dot,
             |  sqrt(list_reduce(list_prepend(0.0, list_transform(a.v, y -> y * y)),
             |    (acc, y) -> acc + y)) AS na,
             |  sqrt(list_reduce(list_prepend(0.0, list_transform(b.v, y -> y * y)),
             |    (acc, y) -> acc + y)) AS nb
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
             |p AS (SELECT id_a, id_b FROM p0
             |  WHERE na > 0 AND nb > 0 AND dot / (na * nb) > 0.3),
             |ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM ed
             |  UNION
             |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a)
             |SELECT d.vec_id AS id,
             |  least(d.vec_id, coalesce(min(r.b), d.vec_id)) AS cluster,
             |  CAST(least(d.vec_id, coalesce(min(r.b), d.vec_id)) <> d.vec_id AS INT)
             |    AS is_duplicate
             |FROM embeddings d LEFT JOIN reach r ON r.a = d.vec_id
             |GROUP BY d.vec_id ORDER BY id""".stripMargin)),

    // Training-mixture report: the per-(lang, source) composition summary a
    // mixture-weight decision is made from — doc counts, token totals, mean
    // document length.
    "q86_data_mix" -> Q(
      (s, d) => Tables.documents(s, d)
        .select(col("lang"), col("source"), col("n_chars"),
          graft.operators.TextOps.tokens(col("text")).as("__t"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("__t"))).as("n_tokens"),
          dec6(avg(col("n_chars"))).as("avg_chars"))
        .orderBy("lang", "source"),
      Some(s"""WITH $sqlToks
              |SELECT lang, source, count(*) AS n_docs,
              |  CAST(sum(len(t)) AS BIGINT) AS n_tokens,
              |  ${r6("avg(CAST(n_chars AS DOUBLE))")} AS avg_chars
              |FROM toks GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // Corpus-level quality cut (the FineWeb/C4-style "keep the top X%"
    // step): score every document with the q51 quality heuristic, take the
    // exact 70th percentile of the ROUNDED scores as the cutoff, keep docs
    // at or above it. Rounding before the percentile makes the comparison
    // set identical across engines; a non-integer rank interpolates
    // strictly between two distinct doc scores, so the >= comparison never
    // sits on cross-engine ulp noise. At 100 TB the exact percentile
    // becomes approx_percentile (a sketch) and the cutoff broadcast is
    // unchanged — one aggregate row against the full scan.
    "q87_quality_cut" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val docs = Tables.documents(s, d)
          .withColumn("t", graft.operators.TextOps.tokens(col("text")))
        val ratio = graft.operators.TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(col("doc_id"),
          dec6(least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            .as("quality"))
        val cut = scored.agg(expr("percentile(quality, 0.7)").as("cutoff"))
        scored.crossJoin(broadcast(cut))
          .filter(col("quality") >= col("cutoff"))
          .select(col("doc_id"), col("quality"), dec6(col("cutoff")).as("cutoff"))
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |x AS (SELECT doc_id, len(t) AS n,
              |  len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS n_stop
              |  FROM toks),
              |scored AS (SELECT doc_id,
              |  ${r6("least(1.0, n / 200.0) * (1.0 - CAST(n_stop AS DOUBLE) / n)")} AS quality
              |  FROM x),
              |cut AS (SELECT quantile_cont(quality, 0.7) AS cutoff FROM scored)
              |SELECT doc_id, quality, ${r6("cutoff")} AS cutoff
              |FROM scored, cut WHERE quality >= cutoff ORDER BY doc_id""".stripMargin)),

    // Embedding-space outlier scan: distance to the block centroid, ranked
    // within the block on the rounded distance — the garbage/mislabel
    // detector beside the near-dup removers. Spark computes the centroid
    // with a Summarizer vector mean (no per-dimension explode); the oracle
    // rebuilds it element-wise.
    "q91_centroid_outlier" -> Q(
      (s, d) => SimilarityOps.centroidOutliers(Tables.embeddings(s, d),
          "vec_id", "embedding", "label", topK = 5, scoreOut = dec6)
        .orderBy("vec_id"),
      Some(s"""WITH e AS (SELECT vec_id, label,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |ex AS (SELECT vec_id, label, u.i AS idx, v[u.i] AS x
              |  FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) u(i)),
              |cent AS (SELECT label, idx, avg(x) AS m FROM ex GROUP BY label, idx),
              |d AS (SELECT ex.vec_id, ex.label,
              |  ${r6("sqrt(sum((x - m) * (x - m)))")} AS dist
              |  FROM ex JOIN cent ON ex.label = cent.label AND ex.idx = cent.idx
              |  GROUP BY ex.vec_id, ex.label),
              |r AS (SELECT vec_id, label, dist,
              |  row_number() OVER (PARTITION BY label ORDER BY dist DESC, vec_id) AS rk
              |  FROM d)
              |SELECT vec_id, label, dist, rk, CAST(rk <= 5 AS INT) AS is_outlier
              |FROM r ORDER BY vec_id""".stripMargin)),

    // Leakage-free train/val/test split: assignment is a pure function of
    // the doc id (12/2/2 of 16 hash buckets), summarized per (split, lang).
    // Adding data or re-partitioning can never migrate an old row between
    // splits — the property the oracle proves by recomputing the same
    // buckets from the same md5 digits.
    "q94_train_split" -> Q(
      (s, d) => CorpusOps.assignSplit(Tables.documents(s, d), "doc_id",
          valOf16 = 2, testOf16 = 2)
        .groupBy("split", "lang").agg(count(lit(1)).as("n_docs"))
        .orderBy("split", "lang"),
      Some("""WITH b AS (SELECT doc_id, lang,
             |  strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
             |    AS bucket FROM documents),
             |s AS (SELECT lang, CASE WHEN bucket < 12 THEN 'train'
             |  WHEN bucket < 14 THEN 'val' ELSE 'test' END AS split FROM b)
             |SELECT split, lang, count(*) AS n_docs FROM s
             |GROUP BY split, lang ORDER BY split, lang""".stripMargin)),

    // Context-window chunking: split each document into 32-token windows
    // with an 8-token overlap (stride 24) — the tokenizer-budget chunker
    // that turns long documents into training sequences. The chunk index
    // sequence is bounded/filtered BEFORE slicing (no oversized slices are
    // built then discarded), and the lambda slices a BOUND token array
    // (the HOF re-expansion pitfall). Verified by chunk fingerprints.
    "q95_token_chunks" -> Q(
      (s, d) => {
        val win = 32; val stride = 24
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("__t"))
          .withColumn("n", size(col("__t")))
        // chunk starts 0, stride, 2·stride, … while start < n (last window
        // may be short; empty docs produce no chunks via explode of [])
        val nChunks = ceil(col("n") / lit(stride.toDouble)).cast("int")
        // guard BEFORE sequence: sequence(0, -1) would count DOWN (the
        // repo's documented pitfall) for null-text docs where n is null
        val idxs = when(col("n") > 0, sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))
        docs
          // explode_outer, not explode: InferFiltersFromGenerate's size>0
          // predicate would re-expand the aliased index expression (the
          // documented pitfall); the stride filter already drops null rows
          .withColumn("idx", explode_outer(idxs))
          .filter(col("idx") * stride < col("n"))
          .select(col("doc_id"), col("idx").as("chunk_idx"),
            slice(col("__t"), col("idx") * stride + 1, lit(win)).as("__c"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("__c")).as("n_tokens"),
            md5(array_join(col("__c"), " ").cast("binary")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |m AS (SELECT doc_id, t, len(t) AS n,
              |  CAST(ceil(len(t) / 24.0) AS INT) AS nc FROM toks WHERE len(t) > 0),
              |c AS (SELECT doc_id, u.i AS chunk_idx,
              |  t[u.i * 24 + 1 : u.i * 24 + 32] AS ck
              |  FROM m, LATERAL (SELECT unnest(generate_series(0, m.nc - 1)) AS i) u(i)
              |  WHERE u.i * 24 < n)
              |SELECT doc_id, chunk_idx, len(ck) AS n_tokens,
              |  md5(array_to_string(ck, ' ')) AS chunk_md5
              |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Sequence packing: documents in id order packed greedily into
    // fixed-budget token bins via a running cumulative sum — bin id =
    // floor((cumsum − n)/budget) assigns each doc to the bin its FIRST
    // token lands in (contiguous packing, the deterministic approximation
    // of training-batch packing). Pure integer arithmetic — exact in both
    // engines; the running sum is the range-partitioned two-phase
    // orderedPrefixSum (doc-length metadata never rides a global window,
    // however many documents there are).
    "q96_seq_packing" -> Q(
      (s, d) => {
        graft.functions.VectorFunctions.register(s)
        val budget = 512
        val lengths = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.operators.TextOps.tokenCountFast(col("text")).cast("long").as("n_tokens"))
        CorpusOps.orderedPrefixSum(lengths, Seq(col("doc_id").asc),
            col("n_tokens"), "cum_tokens")
          .withColumn("bin", floor((col("cum_tokens") - col("n_tokens")) / budget.toDouble).cast("long"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |  sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
             |  FROM t)
             |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens,
             |  CAST(floor((cum_tokens - n_tokens) / 512.0) AS BIGINT) AS bin
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Quality deciles over the rounded quality score (rounding first makes
    // the order deterministic cross-engine; ties break on doc_id) — the
    // distribution report a threshold decision is read from. The decile is
    // the explicit floor((rank−1)·10/n)+1 of the range-partitioned
    // prefix-sum rank (identical formula in the oracle), NOT a global
    // ntile window — (doc_id, quality) pairs are corpus-cardinality and
    // never funnel through one partition.
    "q98_quality_deciles" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val docs = Tables.documents(s, d)
          .withColumn("t", graft.operators.TextOps.tokens(col("text")))
        val ratio = graft.operators.TextOps.markerCount(col("t"), stop) / size(col("t"))
        val scored = docs.select(col("doc_id"),
          dec6(least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio))
            .as("quality"))
        val n = scored.agg(count(lit(1)).as("n"))
        CorpusOps.orderedPrefixSum(scored,
            Seq(col("quality").asc, col("doc_id").asc), lit(1L), "rn")
          .crossJoin(broadcast(n))
          .withColumn("decile",
            (floor((col("rn") - 1) * 10 / col("n")) + 1).cast("int"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            dec6(min("quality")).as("min_q"),
            dec6(max("quality")).as("max_q"))
          .orderBy("decile")
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |x AS (SELECT doc_id, len(t) AS n,
              |  len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS n_stop
              |  FROM toks),
              |scored AS (SELECT doc_id,
              |  ${r6("least(1.0, n / 200.0) * (1.0 - CAST(n_stop AS DOUBLE) / n)")} AS quality
              |  FROM x),
              |dec AS (SELECT quality,
              |  CAST(floor((row_number() OVER (ORDER BY quality, doc_id) - 1) * 10
              |    / (SELECT count(*) FROM scored)) AS INT) + 1 AS decile FROM scored)
              |SELECT decile, count(*) AS n_docs,
              |  ${r6("min(quality)")} AS min_q, ${r6("max(quality)")} AS max_q
              |FROM dec GROUP BY decile ORDER BY decile""".stripMargin)),

    // The curation funnel: one row summarizing survivors through the full
    // cleaning cascade — exact dedup → near-dup clusters (Jaccard ≥ 0.5,
    // star-contraction components) → benchmark decontamination → quality
    // cut at the 70th percentile. Each stage's flag joins on doc_id and the
    // funnel counts cumulative conjunctions; the oracle re-derives all four
    // stages independently (window dedup, recursive-CTE components,
    // string-shingle overlap, quantile_cont).
    "q92_curation_funnel" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val eval = docs.filter(col("doc_id") % 37 === 0)
        val train = docs.filter(col("doc_id") % 37 =!= 0)
        val exact = DedupOps.exactDedup(train, "doc_id", "text")
          .select(col("doc_id"), col("is_duplicate").as("d_exact"))
        val near = DedupOps.nearDupClusters(train,
            DedupOps.ngramJaccardPairs(train, "doc_id", "text", 3, 0.5), "doc_id")
          .select(col("id").as("doc_id"), col("is_duplicate").as("d_near"))
        val contam = CorpusOps.contamination(train, eval, "doc_id", "text", n = 5)
          .select(col("doc_id"), col("contaminated"))
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val t = graft.operators.TextOps.tokens(col("text"))
        val scored = train
          .withColumn("t", t)
          .select(col("doc_id"),
            dec6(least(lit(1.0), size(col("t")) / lit(200.0)) *
              (lit(1.0) - graft.operators.TextOps.markerCount(col("t"), stop) / size(col("t"))))
              .as("quality"))
        val cut = scored.agg(expr("percentile(quality, 0.7)").as("cutoff"))
        val flags = exact.join(near, "doc_id").join(contam, "doc_id")
          .join(scored, "doc_id").crossJoin(broadcast(cut))
          .withColumn("q_keep", (col("quality") >= col("cutoff")).cast("int"))
        flags.agg(
          count(lit(1)).as("n_total"),
          sum((col("d_exact") === 0).cast("int")).as("n_exact"),
          sum((col("d_exact") === 0 && col("d_near") === 0).cast("int")).as("n_neardup"),
          sum((col("d_exact") === 0 && col("d_near") === 0 &&
            col("contaminated") === 0).cast("int")).as("n_clean"),
          sum((col("d_exact") === 0 && col("d_near") === 0 &&
            col("contaminated") === 0 && col("q_keep") === 1).cast("int")).as("n_final"))
      },
      Some("""WITH RECURSIVE train AS (SELECT * FROM documents WHERE doc_id % 37 <> 0),
             |ex AS (SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM train),
             |exact AS (SELECT doc_id,
             |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY fp) AS INT) AS d_exact FROM ex),
             |toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM train),
             |sh AS (SELECT doc_id, list_distinct(list_transform(
             |  generate_series(1, greatest(len(t) - 2, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM toks),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |    / len(list_distinct(a.s || b.s)) >= 0.5),
             |ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM ed
             |  UNION
             |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
             |near AS (SELECT t.doc_id,
             |  CAST(least(t.doc_id, coalesce(min(r.b), t.doc_id)) <> t.doc_id AS INT) AS d_near
             |  FROM train t LEFT JOIN reach r ON r.a = t.doc_id GROUP BY t.doc_id),
             |sh5 AS (SELECT doc_id, list_distinct(list_transform(
             |  generate_series(1, greatest(len(t) - 4, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4]))) AS s
             |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents)),
             |ev AS (SELECT DISTINCT unnest(s) AS g FROM sh5 WHERE doc_id % 37 = 0),
             |tr AS (SELECT doc_id, unnest(s) AS g FROM sh5 WHERE doc_id % 37 <> 0),
             |contam AS (SELECT t.doc_id,
             |  CAST(count(ev.g) > 0 AS INT) AS contaminated
             |  FROM (SELECT doc_id FROM train) t
             |  LEFT JOIN tr ON tr.doc_id = t.doc_id
             |  LEFT JOIN ev ON tr.g = ev.g GROUP BY t.doc_id),
             |x AS (SELECT doc_id, len(t) AS n,
             |  len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS n_stop
             |  FROM toks),
             |scored AS (SELECT doc_id,
             |  floor((least(1.0, n / 200.0) * (1.0 - CAST(n_stop AS DOUBLE) / n)) * 1000000.0 + 0.500618034) / 1000000.0 AS quality
             |  FROM x),
             |cut AS (SELECT quantile_cont(quality, 0.7) AS cutoff FROM scored),
             |flags AS (SELECT e.doc_id, d_exact, d_near, contaminated,
             |  CAST(quality >= cutoff AS INT) AS q_keep
             |  FROM exact e JOIN near USING (doc_id) JOIN contam USING (doc_id)
             |  JOIN scored USING (doc_id), cut)
             |SELECT count(*) AS n_total,
             |  CAST(sum(CAST(d_exact = 0 AS INT)) AS BIGINT) AS n_exact,
             |  CAST(sum(CAST(d_exact = 0 AND d_near = 0 AS INT)) AS BIGINT) AS n_neardup,
             |  CAST(sum(CAST(d_exact = 0 AND d_near = 0 AND contaminated = 0 AS INT)) AS BIGINT)
             |    AS n_clean,
             |  CAST(sum(CAST(d_exact = 0 AND d_near = 0 AND contaminated = 0 AND q_keep = 1
             |    AS INT)) AS BIGINT) AS n_final
             |FROM flags""".stripMargin)),

    // Incremental ingestion dedup: docs with doc_id % 5 == 0 stand in for
    // the newly-crawled batch, the rest for the already-curated corpus.
    // The batch is flagged against the historical fingerprint index (left
    // join) and within itself (window) — the daily-increment shape where
    // history is 1000x the batch and must never be rescanned pair-wise.
    "q103_incremental_dedup" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val batch = docs.filter(col("doc_id") % 5 === 0)
        val hist = docs.filter(col("doc_id") % 5 =!= 0)
        val seen = hist.select(
          graft.operators.TextOps.fingerprint(col("text")).as("fp"))
        DedupOps.incrementalDedup(batch, seen, "doc_id", "text")
          .select("doc_id", "dup_of_corpus", "dup_in_batch", "keep")
          .orderBy("doc_id")
      },
      Some("""WITH f AS (SELECT doc_id,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp FROM documents),
             |hist AS (SELECT fp FROM f WHERE doc_id % 5 <> 0),
             |m AS (SELECT doc_id, fp,
             |  CAST(fp IN (SELECT fp FROM hist) AS INT) AS dup_of_corpus,
             |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY fp) AS INT) AS dup_in_batch
             |  FROM f WHERE doc_id % 5 = 0)
             |SELECT doc_id, dup_of_corpus, dup_in_batch,
             |  CAST(dup_of_corpus = 0 AND dup_in_batch = 0 AS INT) AS keep
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Cross-document repeated n-gram spans (Lee et al. ACL'22 §4 exact-
    // substring duplication, at POSITION granularity): per doc, how many
    // 8-gram positions carry a gram occurring in >= 2 documents. The gram-df
    // join runs on the groupBy-established hash partitioning (no extra
    // exchange); the oracle rebuilds the identical counts from gram strings.
    "q112_dup_ngram_spans" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        CorpusOps.dupNgramSpans(docs, "doc_id", "text", n = 8)
          .withColumn("dup_ratio",
            when(col("n_grams") > 0,
              dec6(col("n_dup_grams").cast("double") / col("n_grams")))
              .otherwise(lit(0.0)))
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |pos AS (SELECT doc_id, unnest(list_transform(
             |  generate_series(1, greatest(len(t) - 7, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
             |                      t[i+4], t[i+5], t[i+6], t[i+7]))) AS g FROM toks),
             |pd AS (SELECT doc_id, g, count(*) AS occ FROM pos GROUP BY doc_id, g),
             |gdf AS (SELECT g, count(*) AS df FROM pd GROUP BY g),
             |per AS (SELECT doc_id, sum(occ) AS n_grams,
             |  sum(CASE WHEN df >= 2 THEN occ ELSE 0 END) AS n_dup
             |  FROM pd JOIN gdf USING (g) GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
             |  CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams,
             |  CASE WHEN coalesce(n_grams, 0) > 0
             |    THEN floor((CAST(n_dup AS DOUBLE) / n_grams) * 1000000.0
             |      + 0.500618034) / 1000000.0
             |    ELSE 0.0 END AS dup_ratio
             |FROM documents d LEFT JOIN per USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // Corpus snapshot diff: v1 drops doc_id % 23 == 1 (those become "added"),
    // v2 drops % 29 == 2 ("removed") and revises text for % 31 == 0
    // ("changed"). Spark compares 8-byte xxhash64 fingerprints (text never
    // joins); the oracle compares the strings themselves — equal on this
    // corpus, which is precisely the collision-free contract.
    "q117_snapshot_diff" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.filter(col("doc_id") % 23 =!= 1)
        val v2 = docs.filter(col("doc_id") % 29 =!= 2)
          .withColumn("text", when(col("doc_id") % 31 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        CorpusOps.snapshotDiff(v1, v2, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 23 <> 1),
             |v2 AS (SELECT doc_id,
             |  CASE WHEN doc_id % 31 = 0 THEN text || ' rev2' ELSE text END AS text
             |  FROM documents WHERE doc_id % 29 <> 2)
             |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             |  CASE WHEN v1.doc_id IS NULL THEN 'added'
             |       WHEN v2.doc_id IS NULL THEN 'removed'
             |       WHEN v1.text <> v2.text THEN 'changed'
             |       ELSE 'unchanged' END AS status
             |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Merkle-bucket anti-entropy over q117's planted snapshots: each side
    // collapses to 64 (bucket, count, xor-digest) rows map-side; only
    // buckets whose summaries disagree need a row rescan — the scale form
    // of the snapshot diff (compare 64 rows, not every id).
    "q243_merkle_diff" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val v1 = docs.filter(col("doc_id") % 23 =!= 1)
        val v2 = docs.filter(col("doc_id") % 29 =!= 2)
          .withColumn("text", when(col("doc_id") % 31 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text")))
        graft.operators.SyncOps.merkleDiff(v1, v2, "doc_id", "text",
            buckets = 64)
          .orderBy("bucket")
      },
      Some("""WITH v1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 23 <> 1),
             |v2 AS (SELECT doc_id,
             |  CASE WHEN doc_id % 31 = 0 THEN text || ' rev2' ELSE text END AS text
             |  FROM documents WHERE doc_id % 29 <> 2),
             |d1 AS (SELECT
             |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
             |    AS BIGINT) % 64 AS bucket,
             |  count(*) AS n_old,
             |  bit_xor(CAST(('0x' || substring(
             |    md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))
             |    AS BIGINT)) AS digest_old
             |  FROM v1 GROUP BY 1),
             |d2 AS (SELECT
             |  CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
             |    AS BIGINT) % 64 AS bucket,
             |  count(*) AS n_new,
             |  bit_xor(CAST(('0x' || substring(
             |    md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))
             |    AS BIGINT)) AS digest_new
             |  FROM v2 GROUP BY 1)
             |SELECT coalesce(d1.bucket, d2.bucket) AS bucket,
             |  coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new,
             |  coalesce(digest_old, 0) AS digest_old,
             |  coalesce(digest_new, 0) AS digest_new,
             |  CAST(coalesce(n_old, 0) <> coalesce(n_new, 0)
             |    OR coalesce(digest_old, 0) <> coalesce(digest_new, 0)
             |    AS INT) AS differs
             |FROM d1 FULL OUTER JOIN d2 ON d1.bucket = d2.bucket
             |ORDER BY bucket""".stripMargin)),

    // Bloom-filtered decontamination — q80's scale path when the eval side
    // outgrows broadcast: eval grams collapse to ONE mergeable bloom filter
    // (order-independent OR-merge => deterministic bits), and the training
    // scan probes it inline, no join. Rows-only: the filter's bit pattern
    // has no SQL twin; CorpusBloomSpec proves the inclusion property
    // (bloom hits ⊇ exact hits per doc) and bounds false positives.
    "q113_bloom_contamination" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val eval = docs.filter(col("doc_id") % 37 === 0)
        val train = docs.filter(col("doc_id") % 37 =!= 0)
        // fpp 1e-4, not the customary 0.01: the flag is ANY-hit semantics,
        // so a doc's false-flag probability compounds to ~n_grams·fpp —
        // ~190 grams/doc needs fpp << 1/190 for the prefilter to actually
        // prune (at 0.01 nearly every clean doc would flag)
        CorpusOps.bloomContamination(train, eval, "doc_id", "text", n = 5,
            expectedItems = 100000L, fpp = 1e-4)
          .orderBy("doc_id")
      },
      None),

    // Near-dup clusters with QUALITY-ranked representative selection: keep
    // the best-scoring member of each cluster, not the min-id one. Quality
    // is rounded to 6 decimals BEFORE ranking so both engines rank
    // identical values (doc_id breaks the remaining ties). The oracle
    // rebuilds components via recursive reachability.
    "q122_best_of_cluster" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val labels = DedupOps.nearDupClusters(docs,
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5), "doc_id")
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val t = graft.operators.TextOps.tokens(col("text"))
        val quality = docs
          .withColumn("t", t)
          .select(col("doc_id"),
            dec6(least(lit(1.0), size(col("t")) / lit(200.0)) *
              (lit(1.0) - graft.operators.TextOps.markerCount(col("t"), stop) /
                size(col("t")))).as("quality"))
        CorpusOps.bestOfCluster(labels, quality, "doc_id", "quality")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE toks AS (SELECT doc_id,
             |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
             |sh AS (SELECT doc_id, list_distinct(list_transform(
             |  generate_series(1, greatest(len(t) - 2, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM toks),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |    / len(list_distinct(a.s || b.s)) >= 0.5),
             |ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM ed
             |  UNION
             |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
             |lab AS (SELECT t.doc_id,
             |  least(t.doc_id, coalesce(min(r.b), t.doc_id)) AS cluster
             |  FROM toks t LEFT JOIN reach r ON r.a = t.doc_id GROUP BY t.doc_id),
             |q AS (SELECT doc_id,
             |  ${r6("least(1.0, len(t) / 200.0) * (1.0 - CAST(len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS DOUBLE) / len(t))")}
             |  AS quality FROM toks),
             |rk AS (SELECT l.doc_id, l.cluster, q.quality,
             |  CAST(row_number() OVER (PARTITION BY l.cluster
             |    ORDER BY q.quality DESC, l.doc_id) = 1 AS INT) AS keep
             |  FROM lab l JOIN q USING (doc_id))
             |SELECT doc_id, cluster, quality, keep FROM rk
             |ORDER BY doc_id""".stripMargin)),

    // Token-budget selection + shard manifest via the DISTRIBUTED prefix
    // sum (range partitions + per-partition running sums + broadcast
    // offsets — never a single-partition global window). The oracle is the
    // naive global window, which DuckDB can afford at oracle scale.
    "q123_token_shards" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val t = graft.operators.TextOps.tokens(col("text"))
        val base = docs
          .withColumn("t", t)
          .select(col("doc_id"), size(col("t")).as("n_toks"),
            dec6(least(lit(1.0), size(col("t")) / lit(200.0)) *
              (lit(1.0) - graft.operators.TextOps.markerCount(col("t"), stop) /
                size(col("t")))).as("quality"))
        CorpusOps.tokenShards(base, "doc_id", col("n_toks"), col("quality"),
            budget = 50000L, shardTokens = 10000L)
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id,
             |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
             |b AS (SELECT doc_id, len(t) AS tokens,
             |  ${r6("least(1.0, len(t) / 200.0) * (1.0 - CAST(len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS DOUBLE) / len(t))")}
             |  AS quality FROM toks),
             |c AS (SELECT doc_id, CAST(tokens AS BIGINT) AS tokens, quality,
             |  CAST(sum(tokens) OVER (ORDER BY quality DESC, doc_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM b)
             |SELECT doc_id, tokens, quality, cum_tokens,
             |  CAST(cum_tokens <= 50000 AS INT) AS selected,
             |  CASE WHEN cum_tokens <= 50000
             |    THEN CAST(floor((cum_tokens - tokens) / 10000.0) AS BIGINT)
             |    ELSE -1 END AS shard
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Temperature-scaled mixture weights over (lang, source) strata at
    // α = 0.3: flatten the head, boost the tail. Two tiny aggregates; the
    // oracle recomputes the same shares with window totals.
    "q124_temperature_mix" -> Q(
      (s, d) => CorpusOps.temperatureMix(Tables.documents(s, d),
          Seq("lang", "source"), alpha = 0.3)
        .select(col("lang"), col("source"), col("n_docs"),
          dec6(col("p_nat")).as("p_nat"), dec6(col("p_temp")).as("p_temp"),
          dec6(col("multiplier")).as("multiplier"))
        .orderBy("lang", "source"),
      Some(s"""WITH c AS (SELECT lang, source, CAST(count(*) AS DOUBLE) AS n
              |  FROM documents GROUP BY lang, source),
              |t AS (SELECT lang, source, n, sum(n) OVER () AS total,
              |  sum(pow(n, 0.3)) OVER () AS ztemp FROM c)
              |SELECT lang, source, CAST(n AS BIGINT) AS n_docs,
              |  ${r6("n / total")} AS p_nat,
              |  ${r6("pow(n, 0.3) / ztemp")} AS p_temp,
              |  ${r6("pow(n, 0.3) / ztemp / (n / total)")} AS multiplier
              |FROM t ORDER BY lang, source""".stripMargin)),

    // Deterministic k-per-group sample: rank by md5(doc_id) inside each
    // (lang, source) stratum, keep the first 5 — a content-stable stand-in
    // for a random permutation, identical in both engines.
    "q125_group_sample" -> Q(
      (s, d) => CorpusOps.groupSample(Tables.documents(s, d), "doc_id",
          Seq("lang", "source"), k = 5)
        .select(col("doc_id"), col("lang"), col("source"), col("rank_in_group"))
        .orderBy("lang", "source", "rank_in_group"),
      Some("""WITH r AS (SELECT doc_id, lang, source,
             |  CAST(row_number() OVER (PARTITION BY lang, source
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT)
             |    AS rank_in_group
             |  FROM documents)
             |SELECT doc_id, lang, source, rank_in_group FROM r
             |WHERE rank_in_group <= 5
             |ORDER BY lang, source, rank_in_group""".stripMargin)),

    // Source-relative quality normalization: per-source percent_rank of the
    // q98 quality score — "keep the top 30% of EVERY source" semantics.
    // Both engines rank the ROUNDED score with doc_id tiebreak, so the
    // rank (and keep set) is bit-identical.
    "q127_source_quality_norm" -> Q(
      (s, d) => {
        val stop = Seq("a", "the", "and", "of", "in", "to")
        val docs = Tables.documents(s, d)
          .withColumn("t", graft.operators.TextOps.tokens(col("text")))
        val ratio = graft.operators.TextOps.markerCount(col("t"), stop) / size(col("t"))
        val quality = least(lit(1.0), size(col("t")) / lit(200.0)) * (lit(1.0) - ratio)
        CorpusOps.sourceRelativeQuality(docs, "doc_id", "source", quality,
            keepFrom = 0.7, scoreOut = dec6)
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, source,
              |  string_split_regex(trim(text), '\\s+') AS t FROM documents),
              |x AS (SELECT doc_id, source, len(t) AS n,
              |  len(list_filter(t, x -> x IN ('a', 'the', 'and', 'of', 'in', 'to'))) AS n_stop
              |  FROM toks),
              |scored AS (SELECT doc_id, source,
              |  ${r6("least(1.0, n / 200.0) * (1.0 - CAST(n_stop AS DOUBLE) / n)")} AS quality
              |  FROM x),
              |ranked AS (SELECT doc_id, source, quality,
              |  ${r6("percent_rank() OVER (PARTITION BY source ORDER BY quality, doc_id)")}
              |    AS pct_rank FROM scored)
              |SELECT doc_id, source, quality, pct_rank,
              |  CAST(pct_rank >= 0.7 AS INT) AS keep
              |FROM ranked ORDER BY doc_id""".stripMargin)),

    // Jensen–Shannon divergence between the English and non-English token
    // distributions — the domain-drift / mixture-distance statistic. Both
    // engines fold the identical per-token formula over the full-outer
    // vocabulary join; ln's ulp noise is absorbed by the biased rounding.
    "q128_js_divergence" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        CorpusOps.jsDivergence(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"),
          "text", scoreOut = dec6)
      },
      Some(s"""WITH fa AS (SELECT token, CAST(count(*) AS DOUBLE) AS tf FROM (
              |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
              |    FROM documents WHERE lang = 'en')
              |  WHERE token IS NOT NULL AND token <> '' GROUP BY token),
              |fb AS (SELECT token, CAST(count(*) AS DOUBLE) AS tf FROM (
              |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
              |    FROM documents WHERE lang <> 'en')
              |  WHERE token IS NOT NULL AND token <> '' GROUP BY token),
              |na AS (SELECT sum(tf) AS n FROM fa),
              |nb AS (SELECT sum(tf) AS n FROM fb),
              |j AS (SELECT coalesce(fa.token, fb.token) AS token,
              |  coalesce(fa.tf / (SELECT n FROM na), 0.0) AS p,
              |  coalesce(fb.tf / (SELECT n FROM nb), 0.0) AS q
              |  FROM fa FULL OUTER JOIN fb ON fa.token = fb.token),
              |terms AS (SELECT token, p, q, (p + q) / 2.0 AS m FROM j),
              |raw AS (SELECT
              |  sum(CASE WHEN p > 0 THEN 1 ELSE 0 END) AS vocab_a,
              |  sum(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS vocab_b,
              |  count(*) AS vocab_union,
              |  sum(CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0.0 END) AS kl_a_m,
              |  sum(CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0.0 END) AS kl_b_m
              |  FROM terms)
              |SELECT CAST((SELECT n FROM na) AS BIGINT) AS n_a,
              |  CAST((SELECT n FROM nb) AS BIGINT) AS n_b,
              |  CAST(vocab_a AS BIGINT) AS vocab_a,
              |  CAST(vocab_b AS BIGINT) AS vocab_b,
              |  CAST(vocab_union AS BIGINT) AS vocab_union,
              |  ${r6("kl_a_m")} AS kl_a_m, ${r6("kl_b_m")} AS kl_b_m,
              |  ${r6("(kl_a_m + kl_b_m) / 2.0")} AS js
              |FROM raw""".stripMargin)),

    // Embedding covariance entries (dims 0-2, upper triangle): the moment
    // computation under PCA, verified cross-engine with the EXPLICIT
    // E[xy] − E[x]E[y] formula (not each engine's covar_pop, whose
    // accumulation schemes differ). PcaSpec ties fitPca's driver-side
    // covariance assembly to these same moments.
    "q129_embed_cov" -> Q(
      (s, d) => {
        val e = Tables.embeddings(s, d)
          .select((0 until 3).map(i => col("embedding")(i).cast("double").as(s"x$i")): _*)
        def cv(i: Int, j: Int) =
          dec6(avg(col(s"x$i") * col(s"x$j")) - avg(col(s"x$i")) * avg(col(s"x$j")))
            .as(s"cov_$i$j")
        e.agg(cv(0, 0), cv(0, 1), cv(0, 2), cv(1, 1), cv(1, 2), cv(2, 2))
      },
      Some(s"""WITH e AS (SELECT CAST(embedding[1] AS DOUBLE) AS x0,
              |  CAST(embedding[2] AS DOUBLE) AS x1,
              |  CAST(embedding[3] AS DOUBLE) AS x2 FROM embeddings)
              |SELECT ${r6("avg(x0 * x0) - avg(x0) * avg(x0)")} AS cov_00,
              |  ${r6("avg(x0 * x1) - avg(x0) * avg(x1)")} AS cov_01,
              |  ${r6("avg(x0 * x2) - avg(x0) * avg(x2)")} AS cov_02,
              |  ${r6("avg(x1 * x1) - avg(x1) * avg(x1)")} AS cov_11,
              |  ${r6("avg(x1 * x2) - avg(x1) * avg(x2)")} AS cov_12,
              |  ${r6("avg(x2 * x2) - avg(x2) * avg(x2)")} AS cov_22
              |FROM e""".stripMargin)),

    // PCA projection to 8 principal components — the dimensionality
    // reduction in front of ANN indexing/clustering at scale. The basis is
    // a driver-side eigensolve (engine-specific float path) → rows-only;
    // PcaSpec pins orthonormality, eigenvalue ordering, variance capture
    // and a hand-computed case.
    "q130_pca_project" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val (mean, _, comps, _) = SimilarityOps.fitPca(emb, "vec_id", "embedding", k = 8)
        SimilarityOps.pcaProject(emb, "vec_id", "embedding", mean, comps)
          .select(col("vec_id") +:
            (0 until 8).map(i => dec6(col("proj")(i)).as(s"pc$i")): _*)
          .orderBy("vec_id")
      },
      None),

    // MMR diversity re-rank of the query's top-50 cosine candidates
    // (λ = 0.7) — the post-ANN pass that keeps a retrieval context from
    // being k near-copies. Greedy argmax is driver-side over the BOUNDED
    // candidate set; the oracle (rows-only → HASH-GREEN in round 12)
    // replays the sequential greedy as a recursive CTE carrying the
    // per-candidate max-sim array and the picked set as LIST state —
    // every dot/norm fold runs in index order (graft_dot's loop ≡
    // list_reduce), so the raw relevances, the top-50 cut, the argmax
    // ties (first-in-(−rel, id)-order ≡ list_position first match) and
    // the scores are bit-identical before the dec6 output rounding.
    // MmrJsSpec still pins the semantics on planted fixtures.
    "q131_mmr_rerank" -> Q(
      (s, d) => SimilarityOps.mmrRerank(Tables.embeddings(s, d), "vec_id", "embedding",
        queryId = 0L, candN = 50, k = 10, lambda = 0.7, scoreOut = dec6),
      Some {
        def fold(a: String, b: String) =
          s"""list_reduce(list_prepend(0.0, list_transform(
             |        generate_series(1, 64), dd -> $a[dd] * $b[dd])),
             |        (acc, y) -> acc + y)""".stripMargin
        def nrm(a: String) =
          s"""sqrt(list_reduce(list_prepend(0.0,
             |    list_transform($a, y -> y * y)), (acc, y) -> acc + y))"""
            .stripMargin
        // (1.0 - 0.7) is CAST to DOUBLE: bare DuckDB decimals subtract
        // exactly to 0.3, while Scala's 1 - lambda is the double
        // 0.30000000000000004 — the q341 CAST convention
        val score = "CASE WHEN list_contains(picked, i) THEN -1e300 " +
          "ELSE 0.7 * rels[i] - (CAST(1.0 AS DOUBLE) - 0.7) * prem[i] END"
        s"""WITH RECURSIVE e AS (SELECT vec_id,
           |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |q AS (SELECT v AS qv, ${nrm("v")} AS qn FROM e WHERE vec_id = 0),
           |cd AS MATERIALIZED (SELECT e.vec_id,
           |  CASE WHEN ${nrm("e.v")} > 0 AND q.qn > 0
           |    THEN ${fold("e.v", "q.qv")} / (${nrm("e.v")} * q.qn)
           |    ELSE 0.0 END AS rel,
           |  e.v FROM e, q WHERE e.vec_id <> 0
           |  ORDER BY rel DESC, e.vec_id LIMIT 50),
           |cv AS MATERIALIZED (SELECT
           |  list(v ORDER BY rel DESC, vec_id) AS vs,
           |  list(rel ORDER BY rel DESC, vec_id) AS rels,
           |  list(vec_id ORDER BY rel DESC, vec_id) AS ids,
           |  list(${nrm("v")} ORDER BY rel DESC, vec_id) AS nrms,
           |  CAST(count(*) AS INT) AS n FROM cd),
           |rec(rank, bi, prem, picked) AS (
           |  SELECT 1, list_position(s, list_max(s)), prem, picked FROM (
           |    SELECT list_transform(generate_series(1, n), i -> $score) AS s,
           |      prem, picked FROM (
           |      SELECT n, rels,
           |        list_transform(generate_series(1, n),
           |          i -> CAST(0.0 AS DOUBLE)) AS prem,
           |        CAST([] AS INT[]) AS picked FROM cv))
           |  UNION ALL
           |  SELECT rank + 1, list_position(s, list_max(s)), prem, picked FROM (
           |    SELECT rank, prem, picked,
           |      list_transform(generate_series(1, n), i -> $score) AS s
           |    FROM (
           |      SELECT rec.rank, cv.rels, cv.n,
           |        list_transform(generate_series(1, cv.n), i ->
           |          greatest(rec.prem[i],
           |            CASE WHEN cv.nrms[i] = 0 OR cv.nrms[rec.bi] = 0
           |              THEN CAST(0.0 AS DOUBLE)
           |              ELSE ${fold("cv.vs[i]", "cv.vs[rec.bi]")}
           |                / (cv.nrms[i] * cv.nrms[rec.bi]) END)) AS prem,
           |        list_append(rec.picked, rec.bi) AS picked
           |      FROM rec, cv WHERE rec.rank < 10)))
           |SELECT CAST(rec.rank AS INT) AS mmr_rank, cv.ids[rec.bi] AS vec_id,
           |  ${r6("cv.rels[rec.bi]")} AS relevance,
           |  ${r6("rec.prem[rec.bi]")} AS max_sim_sel,
           |  ${r6("0.7 * cv.rels[rec.bi] - (CAST(1.0 AS DOUBLE) - 0.7) * rec.prem[rec.bi]")}
           |    AS mmr_score
           |FROM rec, cv ORDER BY mmr_rank""".stripMargin
      }),

    // Weighted sampling without replacement (A-Res): 25 docs ∝ token
    // count, keys from a portable multiplicative hash — both engines
    // compute the identical key arithmetic, so the sampled SET (not just
    // its size) is bit-identical.
    "q132_weighted_sample" -> Q(
      (s, d) => CorpusOps.weightedSample(Tables.documents(s, d), "doc_id",
          weight = graft.operators.TextOps.tokenCountFast(col("text")), k = 25,
          scoreOut = dec6)
        .orderBy("rank"),
      Some(s"""WITH t AS (SELECT doc_id,
              |  CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS w
              |  FROM documents),
              |keyed AS (SELECT doc_id, w,
              |  (CAST(((doc_id % 2147483648) * 2654435761) % 2147483647 AS DOUBLE) + 1.0)
              |    / 2147483648.0 AS u0
              |  FROM t WHERE w > 0),
              |scored AS (SELECT doc_id, w, ${r6("u0")} AS u,
              |  ${r6("pow(u0, 1.0 / w)")} AS key FROM keyed),
              |r AS (SELECT doc_id, w, u, key,
              |  CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INT) AS "rank"
              |  FROM scored)
              |SELECT doc_id, w, u, key, "rank" FROM r
              |WHERE "rank" <= 25 ORDER BY "rank"""".stripMargin)),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    // ranking (q83's scorer) and the dense cosine ranking against query
    // vector 0 (q58's scorer), c = 60 — the standard two-tower search
    // combiner. Ranks are over ROUNDED scores with id tiebreaks, so both
    // engines fuse identical rank lists.
    "q133_hybrid_rrf" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // orderBy+limit FIRST (TakeOrderedAndProject: per-partition heaps +
        // a 100-row driver merge), THEN rank within the bounded 100 — a
        // row_number window over the whole scored corpus would funnel it
        // through one partition; mirrors the dense arm's bruteForceTopK
        val lex = CorpusOps.bm25(Tables.documents(s, d), "doc_id", "text",
            terms = Seq("merge", "stream", "filter"), k1 = 1.2, b = 0.75)
          .select(col("doc_id"), dec6(col("bm25")).as("s"))
          .orderBy(col("s").desc, col("doc_id")).limit(100)
          .withColumn("rank", row_number().over(Window.orderBy(col("s").desc, col("doc_id"))))
          .select("doc_id", "rank")
        val emb = Tables.embeddings(s, d)
        val dense = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding",
            queryId = 0L, k = 100, scoreOut = dec6)
          .withColumn("rank", row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank"))
        SimilarityOps.rrfFuse(Seq(lex, dense), "doc_id", c = 60)
          .select(col("doc_id"), col("n_lists"), dec6(col("rrf_score")).as("rrf_score"))
          .orderBy(col("rrf_score").desc, col("doc_id"))
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |base AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
              |  CAST(len(list_filter(t, x -> x = 'merge')) AS DOUBLE) AS tf_0,
              |  CAST(len(list_filter(t, x -> x = 'stream')) AS DOUBLE) AS tf_1,
              |  CAST(len(list_filter(t, x -> x = 'filter')) AS DOUBLE) AS tf_2
              |  FROM toks),
              |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
              |  CAST(sum(CAST(tf_0 > 0 AS INT)) AS DOUBLE) AS df_0,
              |  CAST(sum(CAST(tf_1 > 0 AS INT)) AS DOUBLE) AS df_1,
              |  CAST(sum(CAST(tf_2 > 0 AS INT)) AS DOUBLE) AS df_2
              |  FROM base),
              |lexs AS (SELECT doc_id,
              |${r6("""ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
              |    * (tf_0 * (1.2 + 1.0)) / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              |  + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
              |    * (tf_1 * (1.2 + 1.0)) / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
              |  + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
              |    * (tf_2 * (1.2 + 1.0)) / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))""")}
              |    AS s
              |  FROM base, stats),
              |lex AS (SELECT doc_id,
              |  row_number() OVER (ORDER BY s DESC, doc_id) AS "rank" FROM lexs),
              |e AS (SELECT vec_id,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
              |denss AS (SELECT vec_id,
              |  ${r6("""CASE WHEN
              |    sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y)) > 0
              |    AND sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)) > 0
              |  THEN list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(v)),
              |      i -> v[i] * qv[i])), (acc, y) -> acc + y)
              |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y))
              |     * sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)))
              |  END""")} AS s
              |  FROM e, qv),
              |dense AS (SELECT vec_id AS doc_id,
              |  row_number() OVER (ORDER BY s DESC, doc_id) AS "rank" FROM denss),
              |unioned AS (SELECT doc_id, "rank" FROM lex WHERE "rank" <= 100
              |  UNION ALL SELECT doc_id, "rank" FROM dense WHERE "rank" <= 100),
              |fused AS (SELECT doc_id, count(*) AS n_lists,
              |  ${r6("sum(1.0 / (60.0 + \"rank\"))")} AS rrf_score
              |  FROM unioned GROUP BY doc_id)
              |SELECT doc_id, n_lists, rrf_score FROM fused
              |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin)),

    // Contrastive hard negatives for anchors 0 and 7: top-5 cosine
    // neighbors carrying a DIFFERENT label — both engines rank the rounded
    // similarity within each anchor.
    "q134_hard_negatives" -> Q(
      (s, d) => SimilarityOps.hardNegatives(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", queryIds = Seq(0L, 7L), k = 5, scoreOut = dec6)
        .orderBy("query_id", "rank"),
      Some(s"""WITH e AS (SELECT vec_id, label,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |q AS (SELECT vec_id AS query_id, label AS qlbl, v AS qv FROM e
              |  WHERE vec_id IN (0, 7)),
              |x AS (SELECT q.query_id, e.vec_id, e.label,
              |  ${r6("""CASE WHEN
              |    sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y)) > 0
              |    AND sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)) > 0
              |  THEN list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(v)),
              |      i -> v[i] * qv[i])), (acc, y) -> acc + y)
              |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y))
              |     * sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)))
              |  ELSE 0.0 END""")} AS cos_sim
              |  FROM e, q WHERE e.label <> q.qlbl),
              |r AS (SELECT query_id, vec_id, label, cos_sim,
              |  CAST(row_number() OVER (PARTITION BY query_id
              |    ORDER BY cos_sim DESC, vec_id) AS INT) AS "rank" FROM x)
              |SELECT query_id, vec_id, label, cos_sim, "rank" FROM r
              |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin)),

    // Cross-source duplication matrix: for every source pair, how many
    // fingerprints (and doc pairs) they share — the mirror-site detector
    // that tells a crawl which sources to collapse. A deterministic
    // "mirror" source (copies of id % 23 docs) is injected identically in
    // both engines so the matrix provably lights up.
    "q162_source_dup_matrix" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))
        val mirrored = docs.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            lit("mirror").as("source"), col("text"))
        val all = docs.unionByName(mirrored)
          .withColumn("fp", graft.operators.TextOps.fingerprint(col("text")))
        val perSrc = all.groupBy("fp", "source").agg(count(lit(1)).as("c"))
        val a = perSrc.select(col("fp"), col("source").as("source_a"), col("c").as("ca"))
        a.join(perSrc.select(col("fp"), col("source").as("source_b"), col("c").as("cb")), Seq("fp"))
          .filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_shared_fps"),
            sum(col("ca") * col("cb")).as("n_doc_pairs"))
          .orderBy("source_a", "source_b")
      },
      Some("""WITH base AS (SELECT doc_id, source, text FROM documents),
             |mir AS (SELECT doc_id + 200000 AS doc_id, 'mirror' AS source, text
             |  FROM documents WHERE doc_id % 23 = 0),
             |allx AS (SELECT *,
             |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
             |  FROM (SELECT * FROM base UNION ALL SELECT * FROM mir)),
             |ps AS (SELECT fp, source, count(*) AS c FROM allx GROUP BY fp, source),
             |pr AS (SELECT a.source AS source_a, b.source AS source_b,
             |  a.c AS ca, b.c AS cb
             |  FROM ps a JOIN ps b ON a.fp = b.fp AND a.source < b.source)
             |SELECT source_a, source_b, count(*) AS n_shared_fps,
             |  CAST(sum(ca * cb) AS BIGINT) AS n_doc_pairs
             |FROM pr GROUP BY source_a, source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    // HLL vocabulary overlap between the English and non-English corpora:
    // inclusion-exclusion over mergeable sketches — pairwise overlap from
    // kilobytes, no distinct-token join. Sketch estimates → rows-only;
    // CorpusOverlapSpec pins the error bound against exact counts.
    "q156_hll_overlap" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        CorpusOps.hllOverlap(docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"), "text", lgK = 12, scoreOut = dec6)
      },
      None),

    // Blocking-quality harness: pair recall + reduction ratio of the
    // MinHash-LSH blocker against the exact PPJoin pair set at the same
    // Jaccard threshold — the dedup twin of q153's ANN recall. Band-hash-
    // specific → rows-only.
    "q155_blocking_quality" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val truth = DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
        val cand = DedupOps.minhashLshPairs(docs, "doc_id", "text",
          shingleN = 3, numHashes = 64, rows = 4, threshold = 0.3)
        DedupOps.blockingQuality(truth, cand, nDocs = docs.count(), scoreOut = dec6)
      },
      None),

    // Leakage-safe split: near-dup clusters (3-gram Jaccard ≥ 0.2, the q65
    // components) are split-assigned by the md5 bucket of their CLUSTER
    // representative — near-copies can never straddle train/test. The
    // oracle re-derives components with a recursive CTE and applies the
    // identical bucket rule.
    "q135_leakage_safe_split" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val clusters = DedupOps.nearDupClusters(docs,
          DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2), "doc_id")
        CorpusOps.leakageSafeSplit(clusters, "doc_id", valOf16 = 2, testOf16 = 2)
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE toks2 AS (SELECT doc_id,
             |  string_split_regex(trim(text), '\s+') AS t FROM documents),
             |sh2 AS (SELECT doc_id, list_distinct(list_transform(
             |  generate_series(1, greatest(len(t) - 2, 0)),
             |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM toks2),
             |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |    / len(list_distinct(a.s || b.s)) >= 0.2),
             |ed AS (SELECT id_a AS a, id_b AS b FROM p
             |  UNION SELECT id_b, id_a FROM p),
             |reach(a, b) AS (
             |  SELECT a, b FROM ed
             |  UNION
             |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
             |cl AS (SELECT d.doc_id,
             |  least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster
             |  FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
             |  GROUP BY d.doc_id),
             |b AS (SELECT doc_id, cluster,
             |  CAST(strpos('0123456789abcdef',
             |    substring(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1 AS INT) AS bucket
             |  FROM cl)
             |SELECT doc_id, cluster, bucket,
             |  CASE WHEN bucket < 12 THEN 'train'
             |    WHEN bucket < 14 THEN 'val' ELSE 'test' END AS split
             |FROM b ORDER BY doc_id""".stripMargin)),

    // Deterministic temperature-mixture schedule (α = 0.5): an explicit
    // stream position whose every prefix holds strata in temperature
    // proportion — both engines derive the identical md5 permutation and
    // key arithmetic, so the entire epoch ordering is bit-identical.
    "q138_mixture_schedule" -> Q(
      (s, d) => CorpusOps.mixtureSchedule(Tables.documents(s, d), "doc_id", "lang",
          alpha = 0.5, scoreOut = dec6)
        .orderBy("doc_id"),
      Some(s"""WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
              |  FROM documents GROUP BY lang),
              |z AS (SELECT sum(pow(n, 0.5)) AS ztemp FROM c),
              |m AS (SELECT lang, pow(n, 0.5) / ztemp AS p_temp FROM c, z),
              |r AS (SELECT doc_id, lang,
              |  CAST(row_number() OVER (PARTITION BY lang
              |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS r_in_stratum
              |  FROM documents)
              |SELECT r.doc_id, r.lang, r.r_in_stratum,
              |  ${r6("p_temp")} AS p_temp,
              |  ${r6("(r.r_in_stratum - 0.5) / p_temp")} AS sched_key
              |FROM r JOIN m USING (lang) ORDER BY r.doc_id""".stripMargin)),

    // Triplet mining for contrastive training: per anchor the hardest
    // same-label positive and hardest different-label negative, with the
    // margin for curriculum filtering — ranks on the rounded similarity,
    // id tiebreaks, so both engines pick identical triplets.
    "q147_triplet_mine" -> Q(
      (s, d) => SimilarityOps.tripletMine(Tables.embeddings(s, d), "vec_id",
          "embedding", "label", queryIds = Seq(0L, 7L, 21L), scoreOut = dec6)
        .orderBy("query_id"),
      Some(s"""WITH e AS (SELECT vec_id, label,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
              |q AS (SELECT vec_id AS query_id, label AS qlbl, v AS qv FROM e
              |  WHERE vec_id IN (0, 7, 21)),
              |x AS (SELECT q.query_id, e.vec_id,
              |  CASE WHEN e.label = q.qlbl THEN 'pos' ELSE 'neg' END AS side,
              |  ${r6("""CASE WHEN
              |    sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y)) > 0
              |    AND sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)) > 0
              |  THEN list_reduce(list_prepend(0.0, list_transform(generate_series(1, len(v)),
              |      i -> v[i] * qv[i])), (acc, y) -> acc + y)
              |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(v, y -> y * y)), (acc, y) -> acc + y))
              |     * sqrt(list_reduce(list_prepend(0.0, list_transform(qv, y -> y * y)), (acc, y) -> acc + y)))
              |  ELSE 0.0 END""")} AS cos_sim
              |  FROM e, q WHERE e.vec_id <> q.query_id),
              |r AS (SELECT query_id, vec_id, side, cos_sim,
              |  row_number() OVER (PARTITION BY query_id, side
              |    ORDER BY cos_sim DESC, vec_id) AS rk FROM x),
              |top AS (SELECT query_id,
              |  max(CASE WHEN side = 'pos' THEN vec_id END) AS pos_id,
              |  max(CASE WHEN side = 'pos' THEN cos_sim END) AS pos_sim,
              |  max(CASE WHEN side = 'neg' THEN vec_id END) AS neg_id,
              |  max(CASE WHEN side = 'neg' THEN cos_sim END) AS neg_sim
              |  FROM r WHERE rk = 1 GROUP BY query_id)
              |SELECT query_id, pos_id, pos_sim, neg_id, neg_sim,
              |  ${r6("pos_sim - neg_sim")} AS margin
              |FROM top ORDER BY query_id""".stripMargin)),

    // k-anonymity audit on the (lang, source) quasi-identifier pair:
    // groups under k=5 members are re-identifiable — the release-side
    // governance check beside content-level PII redaction.
    "q148_k_anonymity" -> Q(
      (s, d) => CorpusOps.kAnonymity(Tables.documents(s, d),
          Seq("lang", "source"), k = 5)
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, count(*) AS n,
             |  CAST(count(*) < 5 AS INT) AS violates
             |FROM documents GROUP BY lang, source
             |ORDER BY lang, source""".stripMargin)),

    // l-diversity audit on (event_type, day) groups with user_id as the
    // sensitive attribute — the homogeneity attack q148's k-anonymity
    // misses: a large group with ONE distinct user still discloses
    // membership. Distinct collapse first; single countDistinct stays on
    // the two-phase path.
    "q292_l_diversity" -> Q(
      (s, d) => graft.operators.CorpusOps.lDiversity(
          Tables.events(s, d)
            .withColumn("day", date_format(col("ts"), "yyyy-MM-dd")),
          Seq("event_type", "day"), "user_id", l = 5)
        .orderBy("event_type", "day"),
      Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |  count(*) AS n,
             |  count(DISTINCT user_id) AS distinct_sensitive,
             |  CAST(count(DISTINCT user_id) < 5 AS INT) AS violates
             |FROM events GROUP BY 1, 2
             |ORDER BY event_type, day""".stripMargin)),

    // Maximal duplicated-span runs (Lee '22 exact-substring semantics):
    // consecutive duplicated 8-gram positions merge into runs; a run of r
    // grams covers r+7 tokens — the excisable span length.
    "q149_dup_span_runs" -> Q(
      (s, d) => CorpusOps.dupSpanRuns(Tables.documents(s, d), "doc_id", "text",
          n = 8)
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |pos AS (SELECT doc_id, u.i AS pos,
             |  concat_ws(' ', t[u.i], t[u.i+1], t[u.i+2], t[u.i+3],
             |                 t[u.i+4], t[u.i+5], t[u.i+6], t[u.i+7]) AS g
             |  FROM toks, LATERAL (SELECT unnest(generate_series(1,
             |    greatest(len(t) - 7, 0))) AS i) u),
             |gdf AS (SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g),
             |dup AS (SELECT doc_id, pos FROM pos JOIN gdf USING (g) WHERE df >= 2),
             |isl AS (SELECT doc_id, pos,
             |  pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             |  FROM dup),
             |runs AS (SELECT doc_id, grp, count(*) AS run FROM isl
             |  GROUP BY doc_id, grp),
             |per AS (SELECT doc_id, sum(run) AS n_dup_pos, count(*) AS n_runs,
             |  max(run) AS max_run FROM runs GROUP BY doc_id)
             |SELECT d.doc_id,
             |  CAST(coalesce(n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
             |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs,
             |  CAST(coalesce(max_run, 0) AS BIGINT) AS max_run_grams,
             |  CAST(CASE WHEN max_run IS NULL THEN 0 ELSE max_run + 7 END AS BIGINT)
             |    AS max_span_tokens
             |FROM documents d LEFT JOIN per USING (doc_id)
             |ORDER BY d.doc_id""".stripMargin)),

    // SCD1 MERGE: apply a deterministic changeset (updates on id%10,
    // tombstones on id%37, inserts at id+100000 for id%97) to the document
    // snapshot in ONE full-outer join, with the op audit attached.
    "q150_upsert_apply" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val upd = Tables.documents(s, d)
          .filter(col("doc_id") % 10 === 0 && col("doc_id") % 37 =!= 0)
          .select(col("doc_id"), concat(lit("U_"), col("doc_id")).as("text"),
            lit(false).as("del"))
        val ins = Tables.documents(s, d)
          .filter(col("doc_id") % 97 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("N_"), col("doc_id")).as("text"), lit(false).as("del"))
        val del = Tables.documents(s, d)
          .filter(col("doc_id") % 37 === 0)
          .select(col("doc_id"), lit(null).cast("string").as("text"),
            lit(true).as("del"))
        val changes = upd.unionByName(ins).unionByName(del)
        CorpusOps.applyChangeset(base, changes, "doc_id", "text", "del")
          .select(col("doc_id"), md5(coalesce(col("text"), lit("")).cast("binary"))
            .as("text_md5"), col("op"))
          .orderBy("doc_id")
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             |upd AS (SELECT doc_id, 'U_' || CAST(doc_id AS VARCHAR) AS text,
             |  false AS del FROM documents WHERE doc_id % 10 = 0 AND doc_id % 37 <> 0),
             |ins AS (SELECT doc_id + 100000 AS doc_id,
             |  'N_' || CAST(doc_id AS VARCHAR) AS text, false AS del
             |  FROM documents WHERE doc_id % 97 = 0),
             |del AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS text, true AS del
             |  FROM documents WHERE doc_id % 37 = 0),
             |ch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins
             |  UNION ALL SELECT * FROM del),
             |j AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
             |  b.text AS bv, c.text AS cv, c.del AS del,
             |  b.doc_id IS NOT NULL AS in_base, c.doc_id IS NOT NULL AS in_ch
             |  FROM base b FULL OUTER JOIN ch c ON b.doc_id = c.doc_id)
             |SELECT doc_id,
             |  md5(coalesce(CASE WHEN del THEN NULL
             |    WHEN cv IS NOT NULL THEN cv ELSE bv END, '')) AS text_md5,
             |  CASE WHEN del AND bv IS NOT NULL THEN 'delete'
             |    WHEN del THEN 'delete_missing'
             |    WHEN cv IS NOT NULL AND bv IS NULL THEN 'insert'
             |    WHEN cv IS NOT NULL AND cv <> bv THEN 'update'
             |    WHEN cv IS NOT NULL THEN 'noop_update'
             |    ELSE 'keep' END AS op
             |FROM j ORDER BY doc_id""".stripMargin)),

    // T5-style span corruption: deterministic hash-drawn token masking
    // (first md5 hex digit of "id_pos" < 2 → 12.5% rate), sentinel input +
    // collected target, emitted as fingerprints. Pure row-local algebra —
    // both engines derive the identical mask set.
    "q151_span_corruption" -> Q(
      (s, d) => CorpusOps.spanCorrupt(Tables.documents(s, d), "doc_id", "text",
          maskOf16 = 2)
        .orderBy("doc_id"),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
             |  FROM documents),
             |m AS (SELECT doc_id, t,
             |  list_transform(generate_series(1, len(t)), i ->
             |    strpos('0123456789abcdef', substring(md5(
             |      CAST(doc_id AS VARCHAR) || '_' || CAST(i - 1 AS VARCHAR)), 1, 1))
             |      - 1 < 2) AS mk
             |  FROM toks)
             |SELECT doc_id,
             |  CAST(len(t) AS BIGINT) AS n_tokens,
             |  CAST(len(list_filter(mk, x -> x)) AS BIGINT) AS n_masked,
             |  md5(array_to_string(list_transform(generate_series(1, len(t)),
             |    i -> CASE WHEN mk[i] THEN '<X>' ELSE t[i] END), ' ')) AS corrupted_md5,
             |  md5(coalesce(array_to_string(list_filter(list_transform(
             |    generate_series(1, len(t)), i -> CASE WHEN mk[i] THEN t[i] END),
             |    x -> x IS NOT NULL), ' '), '')) AS target_md5
             |FROM m ORDER BY doc_id""".stripMargin)),

    // Pairwise 3-gram-Jaccard overlap matrix between sources — which
    // corpus slices share content (mixture-weighting / contamination
    // triage input). Text scanned once into distinct (shingle, source);
    // each shingle collapses to its sorted source SET, identical sets
    // dedupe into a weighted table, and the sources² pair fanout runs
    // only there (measured 7.6 s self-join → set collapse at sf0.1).
    // The oracle keeps the direct pair join — same result, different
    // plan, which is exactly what a cross-engine gate should compare.
    "q258_source_overlap" -> Q(
      (s, d) => CorpusOps.groupOverlap(Tables.documents(s, d),
          "source", "text", shingleN = 3, scoreOut = dec6)
        .orderBy("src_a", "src_b"),
      Some(s"""WITH toks AS (SELECT source, string_split_regex(trim(text), '\\s+') AS t
              |  FROM documents),
              |d AS (SELECT DISTINCT source AS g, unnest(list_transform(
              |  generate_series(1, greatest(len(t) - 2, 0)),
              |  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh FROM toks),
              |tot AS (SELECT g, count(*) AS n FROM d GROUP BY g),
              |p AS (SELECT a.g AS src_a, b.g AS src_b, count(*) AS n_both
              |  FROM d a JOIN d b ON a.sh = b.sh AND a.g < b.g GROUP BY 1, 2)
              |SELECT src_a, src_b, ta.n AS n_a, tb.n AS n_b, n_both,
              |  ${r6("n_both / CAST(ta.n + tb.n - n_both AS DOUBLE)")} AS jaccard
              |FROM p JOIN tot ta ON ta.g = p.src_a JOIN tot tb ON tb.g = p.src_b
              |ORDER BY src_a, src_b""".stripMargin)),

    // Distributed Lloyd k-means (k = 8, 5 iterations) over the embedding
    // corpus — the SemDeDup cluster-then-prune stage at corpus scale:
    // assignment is k unrolled codegen expressions per row, the update
    // shuffles O(k*d) doubles per iteration, only the centroid table
    // touches the driver. Deterministic smallest-id init + dec6-rounded
    // centroids per step make the whole trajectory engine-replayable:
    // the oracle (rows-only → HASH-GREEN in round 12) unrolls all 5
    // assign→mean→round steps as MATERIALIZED CTEs — assignment ties
    // break to the lowest cluster id (array_position first-match ≡
    // ORDER BY d2, c), empty clusters keep their previous centroid via
    // the left-join fallback, and every distance/norm fold runs in
    // index order so the bits match before the dec6 grid. The numpy
    // replay in tools/crosscheck_stats.py reproduces the same
    // trajectory independently; ClusterSpec pins two planted blobs.
    "q326_kmeans_embeddings" -> Q(
      (s, d) => graft.operators.ClusterOps.lloyd(
          Tables.embeddings(s, d), "vec_id", "embedding",
          k = 8, iters = 5, scoreOut = dec6)
        .orderBy("cluster_id"),
      Some(lloydOracle(k = 8, iters = 5, dim = 64))),

    // DBSCAN density clustering over the embeddings (cos ≥ 0.3 pairs,
    // minPts 5): core = ≥5-point eps-neighborhood incl. self, clusters =
    // core-subgraph components labeled by min id (the q65 flooding),
    // borders adopt the min core-neighbor cluster — every convention
    // total-ordered so the oracle's brute pairs + transitive-closure CTE
    // replays the identical partition. The gate feeds exact all-pairs
    // (vector-table-sized BNLJ — the parity path); production feeds
    // dbscan LSH-bucketed candidates instead (ClusterOps.dbscan scaladoc).
    "q342_dbscan" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pairs = SimilarityOps.exactCosinePairs(emb, "vec_id", "embedding",
          threshold = 0.3, scoreOut = dec6)
        graft.operators.ClusterOps.dbscan(emb, "vec_id", pairs, minPts = 5)
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE e AS (SELECT vec_id,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |nrm AS (SELECT vec_id, v,
              |  sqrt(list_reduce(list_prepend(0.0,
              |    list_transform(v, y -> y * y)), (acc, y) -> acc + y)) AS nv
              |  FROM e),
              |p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
              |  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
              |  WHERE ${r6("""CASE WHEN a.nv > 0 AND b.nv > 0 THEN
              |    list_reduce(list_prepend(0.0,
              |      list_transform(generate_series(1, len(a.v)),
              |        i -> a.v[i] * b.v[i])), (acc, y) -> acc + y)
              |    / (a.nv * b.nv) END""")} >= 0.3),
              |sym AS MATERIALIZED (SELECT ia AS a, ib AS b FROM p
              |  UNION ALL SELECT ib, ia FROM p),
              |wn AS (SELECT e.vec_id,
              |  CAST(coalesce(nn.n, 0) AS BIGINT) AS n_neighbors
              |  FROM e LEFT JOIN (SELECT a, count(*) AS n FROM sym GROUP BY a) nn
              |  ON nn.a = e.vec_id),
              |core AS (SELECT vec_id FROM wn WHERE n_neighbors + 1 >= 5),
              |ed AS MATERIALIZED (SELECT s.a, s.b FROM sym s
              |  JOIN core c1 ON s.a = c1.vec_id
              |  JOIN core c2 ON s.b = c2.vec_id),
              |reach(a, b) AS (SELECT a, b FROM ed
              |  UNION SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
              |cc AS (SELECT c.vec_id,
              |  least(c.vec_id, coalesce(min(r.b), c.vec_id)) AS cluster
              |  FROM core c LEFT JOIN reach r ON r.a = c.vec_id
              |  GROUP BY c.vec_id),
              |bc AS (SELECT s.a AS vec_id, min(cc.cluster) AS bcl
              |  FROM sym s JOIN cc ON s.b = cc.vec_id GROUP BY 1)
              |SELECT wn.vec_id, wn.n_neighbors,
              |  CASE WHEN cc.cluster IS NOT NULL THEN 'core'
              |    WHEN bc.bcl IS NOT NULL THEN 'border'
              |    ELSE 'noise' END AS point_type,
              |  coalesce(cc.cluster, bc.bcl) AS cluster
              |FROM wn LEFT JOIN cc ON cc.vec_id = wn.vec_id
              |LEFT JOIN bc ON bc.vec_id = wn.vec_id
              |ORDER BY wn.vec_id""".stripMargin)),

    // DBSCAN over BANDED-LSH candidates — the q342 production path as a
    // TESTED CONTRACT, the q213 way: the Spark side generates candidate
    // pairs from 12 two-bit sign-LSH bands (any-band match → exact
    // rounded cosine only on distinct candidates) and clusters them; the
    // ORACLE is the exact brute-force all-pairs DBSCAN, so a recall
    // regression in the prefilter surfaces as a hash mismatch, never a
    // silent quality drop. eps = cos ≥ 0.4, minPts = 3 (59 qualifying
    // pairs at sf0.01; band recall probed at 100% on both gate fixtures
    // with seed 13 — the AND-OR amplification math puts the worst
    // qualifying pair's miss probability at (1 − 0.6²)¹² ≈ 2e-3, and
    // the probe confirms zero misses). On a 500-vector fixture the band
    // join saves nothing (96% of all pairs are candidates — banding at
    // low thresholds needs corpus-scale n to pay); what the gate pins is
    // the EQUIVALENCE, the knobs (bandBits ↑, threshold ↑) tune the
    // economics at 100 TB where the quadratic term is bounded by bucket
    // size. ClusterSpec pins bucketed ≡ exact explicitly; the numpy
    // replay re-runs the banded path end to end.
    "q344_dbscan_lsh" -> Q(
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val pairs = SimilarityOps.lshBandedCosinePairs(emb, "vec_id",
          "embedding", threshold = 0.4, nPlanes = 24, bandBits = 2,
          dim = 64, seed = 13L, scoreOut = dec6)
        graft.operators.ClusterOps.dbscan(emb, "vec_id", pairs, minPts = 3)
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE e AS (SELECT vec_id,
              |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |nrm AS (SELECT vec_id, v,
              |  sqrt(list_reduce(list_prepend(0.0,
              |    list_transform(v, y -> y * y)), (acc, y) -> acc + y)) AS nv
              |  FROM e),
              |p AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib
              |  FROM nrm a JOIN nrm b ON a.vec_id < b.vec_id
              |  WHERE ${r6("""CASE WHEN a.nv > 0 AND b.nv > 0 THEN
              |    list_reduce(list_prepend(0.0,
              |      list_transform(generate_series(1, len(a.v)),
              |        i -> a.v[i] * b.v[i])), (acc, y) -> acc + y)
              |    / (a.nv * b.nv) END""")} >= 0.4),
              |sym AS MATERIALIZED (SELECT ia AS a, ib AS b FROM p
              |  UNION ALL SELECT ib, ia FROM p),
              |wn AS (SELECT e.vec_id,
              |  CAST(coalesce(nn.n, 0) AS BIGINT) AS n_neighbors
              |  FROM e LEFT JOIN (SELECT a, count(*) AS n FROM sym GROUP BY a) nn
              |  ON nn.a = e.vec_id),
              |core AS (SELECT vec_id FROM wn WHERE n_neighbors + 1 >= 3),
              |ed AS MATERIALIZED (SELECT s.a, s.b FROM sym s
              |  JOIN core c1 ON s.a = c1.vec_id
              |  JOIN core c2 ON s.b = c2.vec_id),
              |reach(a, b) AS (SELECT a, b FROM ed
              |  UNION SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
              |cc AS (SELECT c.vec_id,
              |  least(c.vec_id, coalesce(min(r.b), c.vec_id)) AS cluster
              |  FROM core c LEFT JOIN reach r ON r.a = c.vec_id
              |  GROUP BY c.vec_id),
              |bc AS (SELECT s.a AS vec_id, min(cc.cluster) AS bcl
              |  FROM sym s JOIN cc ON s.b = cc.vec_id GROUP BY 1)
              |SELECT wn.vec_id, wn.n_neighbors,
              |  CASE WHEN cc.cluster IS NOT NULL THEN 'core'
              |    WHEN bc.bcl IS NOT NULL THEN 'border'
              |    ELSE 'noise' END AS point_type,
              |  coalesce(cc.cluster, bc.bcl) AS cluster
              |FROM wn LEFT JOIN cc ON cc.vec_id = wn.vec_id
              |LEFT JOIN bc ON bc.vec_id = wn.vec_id
              |ORDER BY wn.vec_id""".stripMargin)),
  )

  /** q326's Lloyd-trajectory oracle: unrolls `iters` assign→mean→round
    * steps over the embedding table. Assignment replicates the Scala
    * side's `array_position(ds, array_min(ds))` first-match semantics
    * as `row_number() OVER (ORDER BY d2, c)` (exact-bit d2 equality —
    * both engines fold the squared distance in index order over the
    * SAME dec6-rounded centroids); empty clusters keep their previous
    * centroid via the left-join fallback, the documented lloyd
    * convention. Per-step CTEs are MATERIALIZED: c{i} feeds both
    * a{i+1} and c{i+1}'s fallback, and an inlined double reference
    * would re-expand the whole prefix per level (the q337 lesson).
    * A `def` — `queries` above initializes first. */
  private def lloydOracle(k: Int, iters: Int, dim: Int): String = {
    def d2fold(vExpr: String, centExpr: String): String =
      s"""list_reduce(list_prepend(0.0, list_transform(
         |        generate_series(1, $dim),
         |        j -> ($vExpr[j] - $centExpr[j]) * ($vExpr[j] - $centExpr[j]))),
         |        (acc, y) -> acc + y)""".stripMargin
    def assign(name: String, prev: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT vec_id, v, c, d2 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY d2, c) AS rk FROM (
         |      SELECT e.vec_id, e.v, cc.c,
         |        ${d2fold("e.v", "cc.cent")} AS d2
         |      FROM e CROSS JOIN $prev cc))
         |  WHERE rk = 1)""".stripMargin
    val steps = (1 to iters).map { i =>
      Seq(assign(s"a$i", s"c${i - 1}"),
        s"""m$i AS MATERIALIZED (SELECT c, j AS pos,
           |  ${r6("sum(v[j]) / count(*)")} AS mu
           |  FROM a$i, generate_series(1, $dim) t(j) GROUP BY c, j)"""
          .stripMargin,
        s"""c$i AS MATERIALIZED (SELECT p.c, coalesce(n.cent, p.cent) AS cent
           |  FROM c${i - 1} p LEFT JOIN (SELECT c, list(mu ORDER BY pos) AS cent
           |    FROM m$i GROUP BY c) n ON n.c = p.c)""".stripMargin
      ).mkString(",\n")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |c0 AS MATERIALIZED (SELECT
       |  CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c,
       |  v AS cent FROM e ORDER BY vec_id LIMIT $k),
       |$steps,
       |${assign("af", s"c$iters")},
       |nt AS (SELECT c, sqrt(list_reduce(list_prepend(0.0,
       |  list_transform(cent, y -> y * y)), (acc, y) -> acc + y)) AS nrm
       |  FROM c$iters)
       |SELECT af.c AS cluster_id, CAST(count(*) AS BIGINT) AS n_points,
       |  ${r6("sum(af.d2)")} AS inertia,
       |  ${r6("any_value(nt.nrm)")} AS centroid_norm
       |FROM af JOIN nt ON nt.c = af.c
       |GROUP BY af.c ORDER BY cluster_id""".stripMargin
  }
}
