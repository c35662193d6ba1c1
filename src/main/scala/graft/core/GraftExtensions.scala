package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injection: registers the native URL
  * kernels as SQL functions, so `spark.sql("SELECT normalize_url(u)")`
  * plans the SAME codegen'd Catalyst expressions the DataFrame API
  * uses — a user of the reference's SQL surface
  * (e.g. `SELECT ... WHERE url NOT LIKE ...` pipelines) can call the
  * rebuild's kernels from plain SQL. Wire up with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // or
  *     .config("spark.sql.extensions", "graft.core.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def reg(ext: SparkSessionExtensions, name: String,
                  build: Expression => Expression, usage: String): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft.core", name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects exactly one argument")
        build(args.head)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    reg(ext, "normalize_url", NormalizeUrl,
      "normalize_url(url) - frontier dedup key (strip query/fragment, trim trailing /)")
    reg(ext, "canonical_host", CanonicalHost,
      "canonical_host(url_or_host) - lowercased host, www/port/credentials stripped")
    reg(ext, "is_valid_url", IsValidUrl,
      "is_valid_url(url) - scheme in {http,https} and nonempty netloc")
    reg(ext, "check_is_article", CheckIsArticle,
      "check_is_article(url) - conservative positive article-URL classifier")
  }
}
