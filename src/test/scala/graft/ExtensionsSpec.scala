package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface parity: the SparkSessionExtensions-injected functions
  * must plan the same native expressions as the DataFrame API and
  * agree with the shared kernels. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate may return another suite's session (shared test JVM),
  // where withExtensions cannot apply — attach via register(), the
  // same builders the extensions inject
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.core.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftExtensions.register(s)
    s
  }

  test("injected SQL functions match the kernels") {
    val url = "https://www.Host-0001.example/stories/a-1?utm=rss#frag"
    val row = spark.sql(
      s"""SELECT normalize_url('$url') AS n, canonical_host('$url') AS h,
          is_valid_url('$url') AS v, check_is_article('$url') AS a""").collect()(0)
    assert(row.getString(0) == graft.core.UrlKernels.normalizeUrl(url))
    assert(row.getString(1) == graft.core.UrlKernels.canonicalHost(url))
    assert(row.getBoolean(2) == graft.core.UrlKernels.isValidUrl(url))
    assert(row.getBoolean(3) == graft.core.UrlKernels.checkIsArticle(url))
    assert(row.getString(1) == "host-0001.example")
  }

  test("SQL form plans the native expression (codegen, not a UDF)") {
    val p = spark.sql("SELECT normalize_url('https://a.example/x/')")
      .queryExecution.executedPlan.toString()
    assert(p.toLowerCase.contains("normalizeurl"), s"not the native expression:\n$p")
  }
}
