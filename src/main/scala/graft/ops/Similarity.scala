package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Scale path: `bruteForceTopK` is the exactness baseline (one pass,
  * map-side partial top-k via TakeOrderedAndProject — no full sort).
  * `srpBuckets`/`bucketedTopK` is the 100-TB path: sign-random-projection
  * LSH keys co-partition candidates so each query probes one bucket
  * (a broadcast-joinable slice) instead of the full corpus.
  */
object Similarity {

  /** Deterministic 4-decimal truncation — identical in any IEEE engine
    * (unlike round(), which half-rounds on the decimal repr). */
  private def trunc4(c: Column): Column = floor(c * 1e4) / 1e4

  /** Cosine similarity between two double-cast float arrays, summed in
    * index order (deterministic bitwise across engines). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k by cosine against one query vector (given as the row of
    * `vectors` with id `queryId`). Output: (vec_id, cos) ordered. */
  def bruteForceTopK(vectors: DataFrame, idCol: String, vecCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val q = vectors.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"))
    vectors.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        trunc4(cosine(col(vecCol), col("qv"))).as("cos"))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }

  /** Sign-random-projection bucket id from the first `nBits` dimensions
    * (axis-aligned hyperplanes — deterministic, engine-portable; swap in
    * seeded hyperplanes for production randomness). */
  def srpBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map { i =>
      when(element_at(vec, i + 1) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  def srpBuckets(vectors: DataFrame, idCol: String, vecCol: String,
                 nBits: Int = 8): DataFrame =
    vectors.select(col(idCol), srpBucket(col(vecCol), nBits).as("bucket"))

  /** LSH-bucketed ANN: probe only the query's bucket, exact cosine
    * within it. At scale the bucket column is the table's partition
    * key, so this prunes partitions at the scan. */
  def bucketedTopK(vectors: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val withB = vectors.withColumn("bucket", srpBucket(col(vecCol), nBits))
    val q = withB.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("bucket").as("qb"))
    withB.join(broadcast(q), col("bucket") === col("qb"))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), col("bucket"),
        trunc4(cosine(col(vecCol), col("qv"))).as("cos"))
      .orderBy(desc("cos"), asc(idCol))
      .limit(k)
  }
}
