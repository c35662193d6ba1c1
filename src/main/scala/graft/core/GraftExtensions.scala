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
  import GraftExtensions.Functions

  override def apply(ext: SparkSessionExtensions): Unit =
    Functions.foreach { case (name, usage, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        GraftExtensions.info(name, usage),
        build))
    }
}

object GraftExtensions {

  /** DESCRIBE FUNCTION metadata: the 3-arg ExpressionInfo constructor
    * is (className, db, name) — registering usage there puts the usage
    * string where the NAME belongs; use the explicit-usage overload. */
  private[core] def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[NormalizeUrl].getPackage.getName + "." + name,
      null, name, usage, "")

  private def unary(name: String, build: Expression => Expression)
  : Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"$name expects exactly one argument")
    build(args.head)
  }

  /** (name, usage, builder) — the registered SQL surface. */
  val Functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("normalize_url",
      "normalize_url(url) - frontier dedup key (strip query/fragment, trim trailing /)",
      unary("normalize_url", NormalizeUrl)),
    ("canonical_host",
      "canonical_host(url_or_host) - lowercased host, www/port/credentials stripped",
      unary("canonical_host", CanonicalHost)),
    ("is_valid_url",
      "is_valid_url(url) - scheme in {http,https} and nonempty netloc",
      unary("is_valid_url", IsValidUrl)),
    ("check_is_article",
      "check_is_article(url) - conservative positive article-URL classifier",
      unary("check_is_article", CheckIsArticle)))

  /** Attach the same functions to an ALREADY-RUNNING session (a
    * notebook, or a shared test JVM where `withExtensions` cannot take
    * effect because the session pre-exists). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Functions.foreach { case (name, usage, build) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name,
        info(name, usage), build)
    }
}
