package graft.queries

import graft.ops.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents`/`embeddings`,
  * each with a DuckDB oracle. These are first-class engine components
  * per the build brief (dedup / similarity / text analysis). */
object PipelineOps {
  import Tables.t

  type Q = (SparkSession, String) => DataFrame

  // ---- deduplication ----

  val qDedupExact: Q = (s, dir) =>
    Dedup.exactGroups(t(s, dir, "documents"), "doc_id", "text").orderBy("h")
  val sDedupExact =
    """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
       FROM documents GROUP BY md5(text) ORDER BY h"""

  val qDedupJaccard: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.1, maxDocsPerKey = 100)
      .orderBy("id_a", "id_b")
  val sDedupJaccard =
    """WITH tok AS (SELECT doc_id AS doc, string_split(text, ' ') AS t FROM documents),
       pre AS (SELECT doc, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
               FROM tok WHERE len(t) >= 3),
       sh AS (SELECT DISTINCT doc, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM pre),
       sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
       kept AS (SELECT doc, sh FROM (
                  SELECT doc, sh, COUNT(*) OVER (PARTITION BY sh) AS n_docs FROM sh)
                WHERE n_docs <= 100),
       inter AS (SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS inter
                 FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc < b.doc
                 GROUP BY a.doc, b.doc)
       SELECT id_a, id_b, inter, inter / (sa.sz + sb.sz - inter) AS jaccard
       FROM inter JOIN sizes sa ON id_a = sa.doc JOIN sizes sb ON id_b = sb.doc
       WHERE inter / (sa.sz + sb.sz - inter) >= 0.1
       ORDER BY id_a, id_b"""

  val qDedupMinhashSig: Q = (s, dir) =>
    Dedup.minhashSignatures(t(s, dir, "documents"), "doc_id", "text",
        k = 3, nHashes = 4, bandSize = 2)
      .orderBy("doc")
  val sDedupMinhashSig =
    """WITH tok AS (SELECT doc_id AS doc, string_split(text, ' ') AS t FROM documents),
       pre AS (SELECT doc, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
               FROM tok WHERE len(t) >= 3),
       sh AS (SELECT DISTINCT doc, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM pre),
       sig AS (SELECT doc,
                 MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
                 MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
               FROM sh GROUP BY doc)
       SELECT doc, h0, h1, h2, h3,
              md5(h0 || h1) AS band0, md5(h2 || h3) AS band1
       FROM sig ORDER BY doc"""

  /** Corpus with injected clones (doc_id+1000000) so LSH has true
    * positives to find. */
  private def cloneCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    d.unionByName(d.filter(col("doc_id") < 25)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  val qDedupLshPairs: Q = (s, dir) => {
    val sig = Dedup.minhashSignatures(cloneCorpus(s, dir), "doc_id", "text",
      k = 3, nHashes = 4, bandSize = 2)
    Dedup.lshCandidatePairs(sig, nBands = 2).orderBy("id_a", "id_b")
  }
  /** Shared CTE chain: clone corpus → shingles → minhash sig → LSH
    * bands → candidate pairs (used by q_dedup_lsh_pairs and as the
    * edge set of q_dedup_groups' recursive closure). */
  private val lshPairsCte =
    """corpus AS (SELECT doc_id, text FROM documents
                  UNION ALL
                  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 25),
       tok AS (SELECT doc_id AS doc, string_split(text, ' ') AS t FROM corpus),
       pre AS (SELECT doc, t, unnest(generate_series(1, greatest(len(t)-2, 0))) AS i
               FROM tok WHERE len(t) >= 3),
       sh AS (SELECT DISTINCT doc, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh FROM pre),
       sig AS (SELECT doc,
                 MIN(md5('0|' || sh)) AS h0, MIN(md5('1|' || sh)) AS h1,
                 MIN(md5('2|' || sh)) AS h2, MIN(md5('3|' || sh)) AS h3
               FROM sh GROUP BY doc),
       bands AS (SELECT doc, md5(h0 || h1) AS key, 0 AS band FROM sig
                 UNION ALL
                 SELECT doc, md5(h2 || h3) AS key, 1 AS band FROM sig),
       pairs AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
                 FROM bands a JOIN bands b
                 ON a.key = b.key AND a.band = b.band AND a.doc < b.doc)"""
  val sDedupLshPairs =
    s"""WITH $lshPairsCte
       SELECT id_a, id_b FROM pairs ORDER BY id_a, id_b"""

  /** Dedup GROUP resolution: connected components over the LSH pair
    * graph → (doc, component_id) keep/drop sets. Spark side: iterative
    * min-label propagation; oracle: recursive reachability closure. */
  val qDedupGroups: Q = (s, dir) => {
    val sig = Dedup.minhashSignatures(cloneCorpus(s, dir), "doc_id", "text",
      k = 3, nHashes = 4, bandSize = 2)
    Dedup.connectedComponents(Dedup.lshCandidatePairs(sig, nBands = 2))
      .orderBy("doc")
  }
  val sDedupGroups =
    s"""WITH RECURSIVE $lshPairsCte,
       edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                 UNION SELECT id_b AS a, id_a AS b FROM pairs),
       reach(node, r) AS (SELECT a, a FROM edges
                          UNION
                          SELECT e.a, reach.r FROM edges e
                          JOIN reach ON e.b = reach.node)
       SELECT node AS doc, MIN(r) AS component_id
       FROM reach GROUP BY node ORDER BY doc"""

  val qDedupSimhash: Q = (s, dir) =>
    Dedup.simhash(t(s, dir, "documents"), "doc_id", "text", bits = 16)
      .orderBy("doc")
  val sDedupSimhash = Dedup.simhashOracleSql("documents", "doc_id", "text", bits = 16)

  // ---- similarity search ----

  val qSimCosineTopk: Q = (s, dir) =>
    Similarity.bruteForceTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 10)
  val sSimCosineTopk =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
       d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
       SELECT vec_id,
         floor(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) * 1e4) / 1e4 AS cos
       FROM d, q ORDER BY cos DESC, vec_id LIMIT 10"""

  val qAnnLshBuckets: Q = (s, dir) =>
    Similarity.srpBuckets(t(s, dir, "embeddings"), "vec_id", "embedding", nBits = 8)
      .orderBy("vec_id")
  val sAnnLshBuckets = {
    val bits = (0 until 8).map(i =>
      s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""SELECT vec_id, CAST($bits AS BIGINT) AS bucket FROM embeddings ORDER BY vec_id"""
  }

  val qAnnBucketedTopk: Q = (s, dir) =>
    Similarity.bucketedTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 5, nBits = 8)
  val sAnnBucketedTopk = {
    val bits = (0 until 8).map(i =>
      s"(CASE WHEN embedding[${i + 1}] >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     CAST($bits AS BIGINT) AS bucket FROM embeddings),
       q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
       SELECT vec_id, bucket,
         floor(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) * 1e4) / 1e4 AS cos
       FROM b, q WHERE bucket = qb AND vec_id <> 0
       ORDER BY cos DESC, vec_id LIMIT 5"""
  }

  // ---- text analysis ----

  val qTextLangid: Q = (s, dir) =>
    TextAnalysis.langId(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")
  val sTextLangid = {
    val hitCols = TextAnalysis.Markers.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(t, w -> w IN ($set))) AS ${l}_hits"
    }.mkString(", ")
    val langs = TextAnalysis.Markers.map(_._1)
    val guess = langs.zipWithIndex.map { case (l, i) =>
      val later = langs.drop(i + 1).map(o => s"${l}_hits >= ${o}_hits")
      val earlier = langs.take(i).map(o => s"${l}_hits > ${o}_hits")
      val conds = (later ++ earlier :+ s"${l}_hits > 0").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, CASE $guess ELSE 'und' END AS lang_guess,
          ${langs.map(l => s"${l}_hits").mkString(", ")}
        FROM (SELECT doc_id, $hitCols
              FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
        ORDER BY doc_id"""
  }

  val qTextQuality: Q = (s, dir) =>
    TextAnalysis.qualityScore(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")
  val sTextQuality = {
    val en = TextAnalysis.Markers.head._2.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, n_tokens, n_punct, n_stop, stop_ratio, mean_token_len,
          floor((least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5 +
                 stop_ratio * 0.3 +
                 greatest(0.0, 0.2 - CAST(n_punct AS DOUBLE) / greatest(n_tokens, 1) * 0.2)) * 1e4) / 1e4 AS quality
        FROM (SELECT doc_id, n_tokens, n_punct, n_stop,
                floor(CAST(n_stop AS DOUBLE) / n_tokens * 1e4) / 1e4 AS stop_ratio,
                floor(CAST(len_txt - (n_tokens - 1) AS DOUBLE) / n_tokens * 1e4) / 1e4 AS mean_token_len
              FROM (SELECT doc_id,
                      len(string_split(text, ' ')) AS n_tokens,
                      len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                      len(list_filter(string_split(text, ' '), w -> w IN ($en))) AS n_stop,
                      length(text) AS len_txt
                    FROM documents))
        ORDER BY doc_id"""
  }

  val qTextTokens: Q = (s, dir) =>
    TextAnalysis.tokenCounts(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")
  val sTextTokens =
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
       FROM documents ORDER BY doc_id"""

  val qTextFingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprint(t(s, dir, "documents"), "doc_id", "text").orderBy("doc_id")
  val sTextFingerprint =
    """SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
       FROM documents ORDER BY doc_id"""

  // ---- X3: byline cleaning / wire detection ----
  // the byline is synthesized DETERMINISTICALLY from each document's
  // own words (doc_id selects one of 8 reference byline shapes), so
  // both engines build the identical input with no external data and
  // the oracle recomputes the full cleaning rule chain — wire
  // table/suffix matching, junk removal, separator split, title-word
  // filter, capitalization, order-preserving dedup — not the id class.

  private def synthBylineCol: org.apache.spark.sql.Column = {
    val w = split(col("text"), " ")
    val n1 = initcap(concat_ws(" ", element_at(w, 1), element_at(w, 2)))
    val n2 = initcap(concat_ws(" ", element_at(w, 3), element_at(w, 4)))
    val m = pmod(col("doc_id"), lit(8))
    when(m === 0, concat(lit("By "), n1))
      .when(m === 1, concat(lit("By "), n1, lit(" and "), n2))
      .when(m === 2, concat(n1, lit(", Staff Writer")))
      .when(m === 3, lit("Associated Press"))
      .when(m === 4, concat(n1, lit(" USA TODAY")))
      .when(m === 5, concat(lit("By "), n1, lit(" "),
        lower(regexp_replace(n2, " ", ".")), lit("@example.com")))
      .when(m === 6, lit("From Reuters"))
      .otherwise(lit(""))
  }

  val qX3BylineClean: Q = (s, dir) =>
    graft.ops.Bylines.clean(
        t(s, dir, "documents").withColumn("byline", synthBylineCol),
        "doc_id", "byline")
      .withColumn("authors_csv", array_join(col("authors"), "; "))
      .drop("authors")
      .orderBy("doc_id")

  // ---- X3 byline-clean DuckDB chain, shared by q_x3_byline_clean and
  // the T3 payload gate (CrawlExpected.t3PayloadSql): the CTE block
  // expects a prior CTE `syn` providing ($keyCol, byline) and exposes
  // `dd` with (keyCol, byline, nb, exact_c, suf_c, before_d, std_d).
  private def bylineCleanListSql(x: String): String = {
    import graft.ops.Bylines._
    val titles = TitleWords.map(w => s"'$w'").mkString(", ")
    // JunkRe holds the regex verbatim (single backslashes); DuckDB ''
    // literals do no escape processing, so it embeds as-is
    s"""list_filter(list_transform(
          str_split_regex(trim(regexp_replace(regexp_replace($x, '$JunkRe', ' ', 'g'), '\\s+', ' ', 'g')),
            '\\s*(,|\\band\\b|&|\\bwith\\b)\\s*'),
          p -> array_to_string(list_transform(
            list_filter(str_split(p, ' '), x -> x <> '' AND NOT list_contains([$titles], x)),
            x -> upper(x[1]) || substring(x, 2)), ' ')), p -> p <> '')"""
  }

  private[queries] def bylineChainCtes(keyCol: String): String = {
    import graft.ops.Bylines._
    val wsVals = WireServices.zipWithIndex
      .map { case ((k, c), i) => s"(${i + 1}, '$k', '$c')" }.mkString(", ")
    val sfVals = SyndicatedSuffixes.zipWithIndex
      .map { case ((r, c), i) => s"(${i + 1}, '\\b$r\\s*$$', '$c')" }.mkString(", ")
    s"""ws(ord, k, c) AS (VALUES $wsVals),
       sf(ord, r, c) AS (VALUES $sfVals),
       base AS (SELECT $keyCol, byline,
         lower(trim(regexp_replace(byline, '\\s+', ' ', 'g'))) AS nb FROM syn),
       core_t AS (SELECT *, regexp_replace(nb, '^(by|from|source:|-)\\s+', '') AS core FROM base),
       hits AS (SELECT $keyCol, byline, nb, core,
         (SELECT c FROM ws WHERE core = k OR starts_with(core, k || ' ') ORDER BY ord LIMIT 1) AS exact_c,
         (SELECT c FROM sf WHERE regexp_matches(core, r) ORDER BY ord LIMIT 1) AS suf_c,
         (SELECT trim(regexp_replace(core, r, '')) FROM sf WHERE regexp_matches(core, r) ORDER BY ord LIMIT 1) AS suf_before
        FROM core_t),
       cl AS (SELECT $keyCol, byline, nb, exact_c, suf_c,
         ${bylineCleanListSql("coalesce(suf_before, '')")} AS before_c,
         ${bylineCleanListSql("regexp_replace(nb, '^(written by|story by|report by|by)\\s+', '')")} AS std_c
        FROM hits),
       dd AS (SELECT $keyCol, byline, nb, exact_c, suf_c,
         list_filter(before_c, (p, i) -> list_position(before_c, p) = i) AS before_d,
         list_filter(std_c, (p, i) -> list_position(std_c, p) = i) AS std_d
        FROM cl)"""
  }

  /** Final authors_csv projection over `dd` (see bylineChainCtes). */
  private[queries] val bylineAuthorsCsvSql: String =
    """coalesce(array_to_string(
         CASE WHEN nb = '' THEN []
              WHEN exact_c IS NOT NULL THEN [trim(regexp_replace(byline, '\s+', ' ', 'g'))]
              WHEN suf_c IS NOT NULL THEN
                (CASE WHEN len(before_d) > 0 THEN before_d
                      ELSE [trim(regexp_replace(byline, '\s+', ' ', 'g'))] END)
              ELSE std_d END, '; '), '')"""

  val sX3BylineClean: String = {
    s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
       nm AS (SELECT doc_id,
         array_to_string(list_transform([w[1], w[2]], x -> upper(x[1]) || substring(x, 2)), ' ') AS n1,
         array_to_string(list_transform([w[3], w[4]], x -> upper(x[1]) || substring(x, 2)), ' ') AS n2
        FROM d),
       syn AS (SELECT doc_id, CASE CAST(doc_id % 8 AS INT)
         WHEN 0 THEN 'By ' || n1
         WHEN 1 THEN 'By ' || n1 || ' and ' || n2
         WHEN 2 THEN n1 || ', Staff Writer'
         WHEN 3 THEN 'Associated Press'
         WHEN 4 THEN n1 || ' USA TODAY'
         WHEN 5 THEN 'By ' || n1 || ' ' || lower(replace(n2, ' ', '.')) || '@example.com'
         WHEN 6 THEN 'From Reuters'
         ELSE '' END AS byline FROM nm),
       ${bylineChainCtes("doc_id")}
       SELECT doc_id,
         (exact_c IS NOT NULL OR suf_c IS NOT NULL) AS wire_detected,
         coalesce(exact_c, suf_c) AS wire_service,
         $bylineAuthorsCsvSql AS authors_csv
       FROM dd ORDER BY doc_id"""
  }

  // seeded-random-hyperplane SRP (full-dimension) + Hamming-1 multiprobe —
  // the production ANN path; recall vs brute force asserted in AnnSpec.
  // Hyperplane coefficients are dyadic rationals, so the decimal
  // literals embedded in the DuckDB SQL are bit-exact.
  private val AnnSeed = 7L
  private val AnnBits = 8
  private val AnnDim = 64
  private lazy val annPlanes = Similarity.seededHyperplanes(AnnSeed, AnnBits, AnnDim)
  private lazy val seededBitsSql: String =
    annPlanes.zipWithIndex.map { case (h, i) =>
      val dot = h.zipWithIndex.map { case (c, d) =>
        s"embedding[${d + 1}]*(${java.math.BigDecimal.valueOf(c).toPlainString})"
      }.mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  // multi-table LSH (L independent hyperplane sets, collide-in-ANY
  // amplification) — the production-ANN recall workhorse; each table's
  // seed derives from AnnSeed, and each coefficient is dyadic, so the
  // DuckDB oracle recomputes both tables' buckets bit-identically.
  private val AnnTables = 2
  private lazy val annTablePlanes =
    Similarity.hyperplaneTables(AnnSeed, AnnTables, AnnBits, AnnDim)
  private def planeBitsSql(planes: Array[Array[Double]]): String =
    planes.zipWithIndex.map { case (h, i) =>
      val dot = h.zipWithIndex.map { case (c, d) =>
        s"embedding[${d + 1}]*(${java.math.BigDecimal.valueOf(c).toPlainString})"
      }.mkString(" + ")
      s"(CASE WHEN ($dot) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  val qAnnMultitable: Q = (s, dir) =>
    Similarity.multiTableTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 10, tables = annTablePlanes)
  val sAnnMultitable = {
    val bcols = annTablePlanes.zipWithIndex.map { case (p, i) =>
      s"CAST(${planeBitsSql(p)} AS BIGINT) AS b$i"
    }.mkString(", ")
    val collide = annTablePlanes.indices.map(i => s"b$i = qb$i").mkString(" OR ")
    val qcols = annTablePlanes.indices.map(i => s"b$i AS qb$i").mkString(", ")
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     $bcols FROM embeddings),
       q AS (SELECT v AS qv, $qcols FROM b WHERE vec_id = 0)
       SELECT vec_id,
         floor(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) * 1e4) / 1e4 AS cos
       FROM b, q WHERE ($collide) AND vec_id <> 0
       ORDER BY cos DESC, vec_id LIMIT 10"""
  }

  // IVF-Flat ANN (coarse quantizer = sampled centroids cid < nLists,
  // nProbe nearest lists scanned). Deterministic and training-free, so
  // the DuckDB oracle recomputes the assignment and probe set exactly.
  private val IvfLists = 16
  private val IvfProbe = 4
  val qAnnIvf: Q = (s, dir) =>
    Similarity.ivfTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 10, nLists = IvfLists, nProbe = IvfProbe)
  val sAnnIvf: String = {
    def cosSql(a: String, b: String) =
      s"""list_inner_product($a, $b) /
          (sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b)))"""
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       cent AS (SELECT vec_id AS cid, v AS cv FROM b WHERE vec_id < $IvfLists),
       asg AS (SELECT b.vec_id, b.v,
                 (SELECT c.cid FROM cent c
                  ORDER BY ${cosSql("b.v", "c.cv")} DESC, c.cid
                  LIMIT 1) AS cluster
               FROM b),
       q AS (SELECT v AS qv FROM b WHERE vec_id = 0),
       probes AS (SELECT c.cid AS pcid FROM cent c, q
                  ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.cid
                  LIMIT $IvfProbe)
       SELECT a.vec_id, a.cluster,
         floor((${cosSql("a.v", "q.qv")}) * 1e4) / 1e4 AS cos
       FROM asg a, q
       WHERE a.cluster IN (SELECT pcid FROM probes) AND a.vec_id <> 0
       ORDER BY cos DESC, a.vec_id LIMIT 10"""
  }

  val qAnnSrpBuckets: Q = (s, dir) =>
    t(s, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.srpBucketSeeded(col("embedding"), annPlanes).as("bucket"))
      .orderBy("vec_id")
  val sAnnSrpBuckets =
    s"""SELECT vec_id, CAST($seededBitsSql AS BIGINT) AS bucket
       FROM embeddings ORDER BY vec_id"""

  val qAnnSrpMultiprobe: Q = (s, dir) =>
    Similarity.multiprobeTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
      queryId = 0L, k = 10, planes = annPlanes)
  val sAnnSrpMultiprobe =
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     CAST($seededBitsSql AS BIGINT) AS bucket FROM embeddings),
       q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)
       SELECT vec_id, bucket,
         floor(list_inner_product(v, qv) /
               (sqrt(list_inner_product(v, v)) * sqrt(list_inner_product(qv, qv))) * 1e4) / 1e4 AS cos
       FROM b, q WHERE bit_count(xor(bucket, qb)) <= 1 AND vec_id <> 0
       ORDER BY cos DESC, vec_id LIMIT 10"""

  // embedding-cosine near-dup (semantic dedup over the embedding column,
  // complementing the lexical Jaccard/MinHash/SimHash family): candidate
  // pairs only within an SRP bucket, exact truncated cosine ≥ τ. Reuses
  // the seeded dyadic hyperplanes, so the DuckDB oracle computes the
  // identical buckets.
  private val NearDupTau = 0.30
  val qDedupEmbeddingCosine: Q = (s, dir) =>
    Dedup.embeddingNearDupPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        annPlanes, NearDupTau)
      .orderBy("id_a", "id_b")
  val sDedupEmbeddingCosine =
    s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                     CAST($seededBitsSql AS BIGINT) AS bucket FROM embeddings),
       pairs AS (SELECT a.vec_id AS id_a, c.vec_id AS id_b, a.bucket,
                   floor(list_inner_product(a.v, c.v) /
                         (sqrt(list_inner_product(a.v, a.v)) *
                          sqrt(list_inner_product(c.v, c.v))) * 1e4) / 1e4 AS cos
                 FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id)
       SELECT id_a, id_b, bucket, cos FROM pairs WHERE cos >= $NearDupTau
       ORDER BY id_a, id_b"""

  val queries: Map[String, Q] = Map(
    "q_dedup_embedding_cosine" -> qDedupEmbeddingCosine,
    "q_ann_srp_buckets" -> qAnnSrpBuckets,
    "q_ann_srp_multiprobe" -> qAnnSrpMultiprobe,
    "q_ann_multitable" -> qAnnMultitable,
    "q_ann_ivf" -> qAnnIvf,
    "q_x3_byline_clean" -> qX3BylineClean,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ngram_jaccard" -> qDedupJaccard,
    "q_dedup_minhash_sig" -> qDedupMinhashSig,
    "q_dedup_lsh_pairs" -> qDedupLshPairs,
    "q_dedup_groups" -> qDedupGroups,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_sim_cosine_topk" -> qSimCosineTopk,
    "q_ann_lsh_buckets" -> qAnnLshBuckets,
    "q_ann_bucketed_topk" -> qAnnBucketedTopk,
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_text_tokens" -> qTextTokens,
    "q_text_fingerprint" -> qTextFingerprint)

  val oracle: Map[String, String] = Map(
    "q_dedup_embedding_cosine" -> sDedupEmbeddingCosine,
    "q_ann_srp_buckets" -> sAnnSrpBuckets,
    "q_ann_srp_multiprobe" -> sAnnSrpMultiprobe,
    "q_ann_multitable" -> sAnnMultitable,
    "q_ann_ivf" -> sAnnIvf,
    "q_x3_byline_clean" -> sX3BylineClean,
    "q_dedup_exact" -> sDedupExact,
    "q_dedup_ngram_jaccard" -> sDedupJaccard,
    "q_dedup_minhash_sig" -> sDedupMinhashSig,
    "q_dedup_lsh_pairs" -> sDedupLshPairs,
    "q_dedup_groups" -> sDedupGroups,
    "q_dedup_simhash" -> sDedupSimhash,
    "q_sim_cosine_topk" -> sSimCosineTopk,
    "q_ann_lsh_buckets" -> sAnnLshBuckets,
    "q_ann_bucketed_topk" -> sAnnBucketedTopk,
    "q_text_langid" -> sTextLangid,
    "q_text_quality" -> sTextQuality,
    "q_text_tokens" -> sTextTokens,
    "q_text_fingerprint" -> sTextFingerprint)
}
