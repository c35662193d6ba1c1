package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-random-hyperplane SRP ANN: recall@10 of the Hamming-1
  * multiprobe against the exact brute-force baseline, plus the pruning
  * invariant (the candidate set is a small fraction of the corpus —
  * that fraction is what a partition-keyed bucket scan would read). */
class AnnSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("ann-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dim = 64
  val nBits = 8
  lazy val planes: Array[Array[Double]] = Similarity.seededHyperplanes(7L, nBits, dim)
  lazy val vectors = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("hyperplanes are seeded, full-dimension, and dyadic-exact") {
    val again = Similarity.seededHyperplanes(7L, nBits, dim)
    assert(planes.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    assert(planes.length == nBits && planes.forall(_.length == dim))
    planes.flatten.foreach { c =>
      assert(c >= -1.0 && c <= 1.0)
      assert(c * 1024.0 == math.rint(c * 1024.0), s"non-dyadic coefficient $c")
    }
    // not axis-aligned: every plane has many nonzero components
    assert(planes.forall(_.count(_ != 0.0) > dim / 2))
  }

  lazy val lshTables: Seq[Array[Array[Double]]] =
    Similarity.hyperplaneTables(7L, nTables = 8, nBits = 6, dim = dim)

  test("multi-table LSH finds planted near-duplicates (recall@1 = 1.0)") {
    // the pipeline's ANN use case: near-dup retrieval (cos ≈ 0.99).
    // Plant perturbed copies of 10 corpus vectors and require the LSH
    // path to retrieve the source as the top hit for every one.
    val planted = vectors.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x.cast("double") * 1.02 + (i % 3 - 1) * 0.003).cast("float"))
          .as("embedding"))
    val corpus = vectors.select("vec_id", "embedding").unionByName(planted).cache()
    (1000L until 1010L).foreach { qid =>
      val top = Similarity.multiTableTopK(corpus, "vec_id", "embedding",
        qid, 1, lshTables).collect()
      assert(top.nonEmpty, s"no candidates for planted query $qid")
      assert(top.head.getLong(0) == qid - 1000L,
        s"planted near-dup $qid: top hit ${top.head} != source ${qid - 1000}")
    }
  }

  test("multi-table LSH recall@10 on natural (low-similarity) queries") {
    // this corpus's true neighbors sit at cos ≈ 0.3 (near-random), so
    // bounded-candidate LSH recall is information-theoretically modest
    // here; assert a floor and that candidates stay a bounded fraction
    // (the near-dup regime above is the design target).
    val queryIds = Seq(0L, 7L, 42L, 123L, 321L)
    val recalls = queryIds.map { qid =>
      val exact = Similarity.bruteForceTopK(vectors, "vec_id", "embedding", qid, 10)
        .collect().map(_.getLong(0)).toSet
      val approx = Similarity.multiTableTopK(vectors, "vec_id", "embedding",
          qid, 10, lshTables)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.2, s"mean recall@10 $mean < 0.2 (recalls=$recalls)")
  }

  test("multi-table candidate set is a bounded fraction of the corpus") {
    val withB = lshTables.zipWithIndex.foldLeft(vectors) { case (df, (p, t)) =>
      df.withColumn(s"b$t", Similarity.srpBucketSeeded(col("embedding"), p))
    }.cache()
    val q = withB.filter(col("vec_id") === 0L).head()
    val cond = lshTables.indices
      .map(t => col(s"b$t") === lit(q.getAs[Long](s"b$t"))).reduce(_ || _)
    val cand = withB.filter(cond).count()
    val total = vectors.count()
    assert(cand < total / 2, s"candidates $cand not < corpus/2 ($total)")
    assert(cand >= 10)
  }

  test("multiprobe candidate set is a small fraction of the corpus") {
    val withB = vectors.withColumn("bucket",
      Similarity.srpBucketSeeded(col("embedding"), planes))
    val qb = withB.filter(col("vec_id") === 0L).select("bucket").head().getLong(0)
    val cand = withB.filter(bit_count(col("bucket").bitwiseXOR(lit(qb))) <= 1).count()
    val total = vectors.count()
    assert(cand < total / 4, s"candidates $cand not < corpus/4 ($total)")
    assert(cand >= 10, s"too few candidates for top-10: $cand")
  }

  test("IVF assigns every vector and prunes the probe scan") {
    val nLists = 16
    val top = Similarity.ivfTopK(vectors, "vec_id", "embedding",
      queryId = 0L, k = 10, nLists = nLists, nProbe = 4).collect()
    assert(top.length == 10)
    // results come only from probed clusters, ordered by truncated cos
    val cs = top.map(_.getAs[Double]("cos")).toSeq
    assert(cs == cs.sorted.reverse)
    assert(top.map(_.getAs[Int]("cluster")).toSet.size <= 4)
  }

  test("IVF near-dup recall@1 = 1.0 (planted queries, nProbe=4/16)") {
    val planted = vectors.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x.cast("double") * 1.02 + (i % 3 - 1) * 0.003).cast("float"))
          .as("embedding"))
    val corpus = vectors.select("vec_id", "embedding").unionByName(planted).cache()
    (1000L until 1010L).foreach { qid =>
      val top = Similarity.ivfTopK(corpus, "vec_id", "embedding",
        qid, 1, nLists = 16, nProbe = 4).collect()
      assert(top.nonEmpty, s"no candidates for planted query $qid")
      assert(top.head.getLong(0) == qid - 1000L,
        s"planted near-dup $qid: top hit ${top.head} != source ${qid - 1000}")
    }
  }

  test("bucket signature spreads across the keyspace (partition-key quality)") {
    val nBuckets = vectors
      .select(Similarity.srpBucketSeeded(col("embedding"), planes).as("b"))
      .distinct().count()
    assert(nBuckets > 50, s"only $nBuckets distinct buckets of ${1 << nBits}")
  }
}
