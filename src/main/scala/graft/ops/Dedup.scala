package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB design): every operator here is a pure
  * shuffle-on-key dataflow — no driver-side state, no collect. The
  * candidate-pair generators (shingle join, LSH band join) are the only
  * quadratic-risk steps; both carry a frequent-key prune (`maxDocsPerKey`)
  * that bounds per-key fanout, the standard stop-shingle treatment —
  * at cluster scale this is what keeps the shuffle skew-free (hot
  * shingles are exactly the keys AQE skew-split would otherwise chase).
  */
object Dedup {

  /** Exact duplicate groups by content hash (reference analogue:
    * content_hash/text_hash SHA-256 dedup, database.py:792-794).
    * One hash-aggregate, map-side combinable. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word k-shingles per document: (id, sh). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val parts = (0 until k).map(i => s"t[i+$i]").mkString(", ")
    docs.select(col(idCol).as("doc"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc"), explode(
        expr(s"transform(sequence(0, size(t)-$k), i -> concat_ws(' ', $parts))")).as("sh"))
      .distinct()
  }

  /** Candidate near-dup pairs with n-gram Jaccard similarity.
    * Pair generation joins on shared shingles; shingles held by more
    * than `maxDocsPerKey` docs are pruned (stop-shingles) to bound the
    * join fanout. Jaccard computed exactly from distinct-shingle counts. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.1,
                        maxDocsPerKey: Int = 100): DataFrame = {
    // persist the shingle set: it feeds the stop-shingle agg, BOTH sides
    // of the intersection self-join, and the per-doc sizes — without the
    // persist the explode + 2-shuffle distinct subtree is planned (and
    // executed) 5× in one query (r6 before-plan: 4 full scan→Generate→
    // HashAggregate chains + no exchange reuse). Guide §5: reuse ≥ 2 and
    // expensive recompute is exactly the persist case; MEMORY_AND_DISK
    // (default) spills instead of OOMing at scale.
    val sh = shingles(docs, idCol, textCol, k).persist()
    // EAGER fill: the first action launches several broadcast-side
    // builds concurrently, and each thread that finds the cache cold
    // recomputes the full subtree (measured: lazy persist alone did not
    // move q_dedup_ngram_jaccard). One cheap count materializes the
    // cache once, before any consumer races.
    sh.count()
    // stop-shingle prune as hash-agg + semi-join (map-side combinable)
    // instead of a per-shingle window, which would add a full sort
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxDocsPerKey).select("sh")
    val kept = sh.join(rare, Seq("sh"), "left_semi").select("doc", "sh")
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = kept.as("a").join(kept.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc"))
      .withColumn("jaccard",
        col("inter") / (col("sa.sz") + col("sb.sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "jaccard")
  }

  /** MinHash signatures (nHashes mins over md5(seed|shingle)) grouped
    * into LSH bands of `bandSize`; band key = md5 of the band's hashes.
    * Using min-of-md5-hex as the hash family keeps the signature
    * reproducible in any engine (the correctness oracle recomputes it
    * in SQL). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, nHashes: Int = 4, bandSize: Int = 2): DataFrame = {
    val sh = shingles(docs, idCol, textCol, k)
    val hashes = (0 until nHashes).map(i =>
      min(md5(concat(lit(s"$i|"), col("sh")))).as(s"h$i"))
    val sig = sh.groupBy("doc").agg(hashes.head, hashes.tail: _*)
    val bands = (0 until nHashes / bandSize).map { b =>
      val cols = (b * bandSize until (b + 1) * bandSize).map(i => col(s"h$i"))
      md5(concat(cols: _*)).as(s"band$b")
    }
    sig.select(col("doc") +: (0 until nHashes).map(i => col(s"h$i")) ++: bands: _*)
  }

  /** LSH candidate pairs: docs sharing any band bucket. */
  def lshCandidatePairs(signatures: DataFrame, nBands: Int,
                        maxDocsPerKey: Int = 1000): DataFrame = {
    // persist the signature table: each band projection references it,
    // and the band union feeds the frequent-key agg plus BOTH sides of
    // the candidate self-join — unpersisted, the minhash aggregation
    // (shingle explode + distinct + 4-way min agg) executed up to 8×
    // per query (r6 before-plan: 32 parquet scans of `documents` in
    // q_dedup_lsh_pairs, zero reuse). Guide §5.
    val sig = signatures.persist()
    sig.count() // eager fill — see ngramJaccardPairs
    val perBand = (0 until nBands).map { b =>
      sig.select(col("doc"), col(s"band$b").as("key"), lit(b).as("band"))
    }.reduce(_ unionByName _)
    val rare = perBand.groupBy("band", "key").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxDocsPerKey).select("band", "key")
    val pruned = perBand.join(rare, Seq("band", "key"), "left_semi")
      .select("doc", "key", "band").persist()
    pruned.as("a").join(pruned.as("b"),
        col("a.key") === col("b.key") && col("a.band") === col("b.band") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
  }

  /** Duplicate-GROUP resolution: connected components over a candidate-
    * pair graph → (doc, component_id = min doc id reachable), the step
    * that turns pair lists (LSH/Jaccard output) into keep/drop sets.
    * Iterative min-label propagation: each round joins every node's
    * label across its edges and keeps the minimum; rounds are plain
    * shuffle-on-key joins/aggregations (no driver state beyond the
    * converged? counter), and convergence takes ≤ graph-diameter
    * rounds — near-dup clusters are shallow (dup clusters of size
    * 2-10), so 2-3 rounds in practice. At 10^10-doc scale the same
    * dataflow upgrades to alternating large-star/small-star (O(log n)
    * rounds, identical per-round shape); `maxIter` bounds the loop
    * either way. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // one action materializes the (possibly expensive) upstream pair
    // chain AND sizes the iteration: every later round runs over the
    // checkpointed label set at a partition count matched to the graph
    // (~500k edges/partition), not the session shuffle default — for
    // near-dup graphs (thousands of edges) that is ONE partition, so a
    // propagation round is a single local task instead of 32 scheduled
    // shuffles
    // the pair set feeds BOTH union legs below; persist + eager fill so
    // the (possibly expensive) upstream candidate chain runs once, not
    // once per leg (the legs are stages of one job and would otherwise
    // race on a cold cache — see ngramJaccardPairs)
    val pairsC = pairs.persist()
    pairsC.count()
    val edges = pairsC.select(col(idA).as("a"), col(idB).as("b"))
      .unionByName(pairsC.select(col(idB).as("a"), col(idA).as("b")))
      .distinct().localCheckpoint()
    val nEdges = edges.count()
    pairsC.unpersist() // edges is materialized; the pair cache is done
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (nEdges / 500000L).toInt))
    val edgesP = (if (parts == 1) edges.coalesce(1)
                  else edges.repartition(parts, col("b"))).cache()
    // seed with min(self, direct neighbors) — one aggregation instead
    // of a distinct, and it fully converges pair/clique components (the
    // common near-dup cluster shape), so those graphs finish after one
    // convergence check instead of a propagation round + check
    var labels = edgesP.groupBy(col("a").as("node"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .repartition(parts, col("node")).localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // each round is ONE job: the eager localCheckpoint materializes
      // the round (cutting the recompute lineage) and fills the
      // Observation the convergence test reads — no separate
      // driver-blocking count() per round
      val (round, obs) = ccRound(edgesP, labels, parts)
      labels = round.localCheckpoint()
      changed = obs.get("changed").asInstanceOf[Long]
      it += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(graph diameter exceeds the bound) — labels would be wrong")
    edgesP.unpersist()
    labels.select(col("node").as("doc"), col("label").as("component_id"))
  }

  /** One min-label propagation round: neighbors' labels equi-joined in,
    * merged with the node's own label by a partial-aggregating min. The
    * convergence test rides the SAME aggregation as an Observation
    * (each node's previous label is carried through the agg; changed =
    * #nodes whose label fell), so a round costs exactly one job and no
    * extra driver action. Exposed for PlanSpec's shape assertions. */
  private[graft] def ccRound(edgesP: DataFrame, labels: DataFrame, parts: Int)
  : (DataFrame, org.apache.spark.sql.Observation) = {
    val prop = edgesP.join(labels, edgesP("b") === labels("node"))
      .select(edgesP("a").as("node"), col("label"),
        lit(null).cast("long").as("prev_tag"))
    val merged = labels.select(col("node"), col("label"), lit(1L).as("prev_tag"))
      .unionByName(prop)
    val obs = org.apache.spark.sql.Observation()
    val next = merged.groupBy("node")
      .agg(min("label").as("label"),
        min(when(col("prev_tag").isNotNull, col("label"))).as("prev"))
      .observe(obs,
        sum(when(col("label") < col("prev"), 1L).otherwise(0L)).as("changed"))
      .select("node", "label")
      .repartition(parts, col("node"))
    (next, obs)
  }

  /** SimHash over distinct tokens: md5(token) supplies `bits` bits
    * (4 per leading hex char); each token votes ±1 per bit; the sign
    * of the per-bit sum (ties → 1) forms the fingerprint. Pure SQL
    * expressions → whole-stage codegen, and engine-portable for the
    * oracle. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 16): DataFrame = {
    require(bits % 4 == 0, "bits must be a multiple of 4 (hex nibbles)")
    val tok = docs.select(col(idCol).as("doc"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .withColumn("hh", md5(col("w")))
    val sums = (0 until bits).map { j =>
      val hexPos = j / 4 + 1
      val mask = 8 >> (j % 4)
      sum(expr(
        s"CASE WHEN ((instr('0123456789abcdef', substr(hh, $hexPos, 1)) - 1) & $mask) > 0 THEN 1 ELSE -1 END"))
        .as(s"s$j")
    }
    val agg = tok.groupBy("doc").agg(sums.head, sums.tail: _*)
    val fp = (0 until bits).map { j =>
      when(col(s"s$j") >= 0, lit(1L << (bits - 1 - j))).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc"), fp.as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs: SRP-bucket the corpus with
    * seeded hyperplanes (Similarity.srpBucketSeeded), generate candidate
    * pairs ONLY within a bucket (equi-join on the bucket key — at 100 TB
    * the bucket is the table's partition key, so this is a co-partitioned
    * self-join, never all-pairs), then keep pairs whose exact cosine
    * clears `tau`. Complements the lexical dedups (Jaccard/MinHash/
    * SimHash) with a semantic near-dup signal over the embedding column. */
  def embeddingNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                            planes: Array[Array[Double]],
                            tau: Double): DataFrame = {
    // persist the bucketed corpus: both self-join sides reference it,
    // and the SRP signature (8 seeded-hyperplane dots per row) would
    // otherwise be evaluated twice per row (guide §5)
    val withB = vectors.select(col(idCol), col(vecCol),
      Similarity.srpBucketSeeded(col(vecCol), planes).as("bucket")).persist()
    withB.count() // eager fill — see ngramJaccardPairs
    val a = withB.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("bucket"))
    val b = withB.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"),
        (floor(Similarity.cosine(col("va"), col("vb")) * 1e4) / 1e4).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** SQL text (shared Spark/DuckDB shape) for the simhash oracle. */
  def simhashOracleSql(table: String, idCol: String, textCol: String,
                       bits: Int = 16): String = {
    val sums = (0 until bits).map { j =>
      val hexPos = j / 4 + 1
      val mask = 8 >> (j % 4)
      s"SUM(CASE WHEN ((instr('0123456789abcdef', substr(hh, $hexPos, 1)) - 1) & $mask) > 0 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val fp = (0 until bits).map { j =>
      s"(CASE WHEN s$j >= 0 THEN ${1L << (bits - 1 - j)} ELSE 0 END)"
    }.mkString(" + ")
    s"""SELECT doc, CAST($fp AS BIGINT) AS simhash FROM (
          SELECT doc, $sums FROM (
            SELECT DISTINCT doc, md5(w) AS hh FROM (
              SELECT $idCol AS doc, unnest(string_split($textCol, ' ')) AS w FROM $table)
            WHERE w <> '')
          GROUP BY doc)
        ORDER BY doc"""
  }
}
