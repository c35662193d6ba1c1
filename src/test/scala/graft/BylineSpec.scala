package graft

import graft.ops.Bylines
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** X3 byline cleaning / wire detection — reference behavior vectors
  * (byline_cleaner.py): wire passthrough, syndicated author
  * extraction, title stripping, junk removal, capitalization,
  * order-preserving dedup. */
class BylineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def run(bylines: String*): Map[String, (Boolean, String, Seq[String])] = {
    val df = bylines.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "byline")
    Bylines.clean(df, "id", "byline").collect().map { r =>
      bylines(r.getLong(0).toInt) ->
        ((r.getBoolean(1), r.getString(2), r.getSeq[String](3)))
    }.toMap
  }

  test("standard 'By' bylines: extraction, multi-author, capitalization") {
    val out = run(
      "By John Smith",
      "By John Smith and Jane Doe",
      "Written by  JANE   DOE",
      "JANE DOE, Staff Writer")
    assert(out("By John Smith") == ((false, null, Seq("John Smith"))))
    assert(out("By John Smith and Jane Doe") ==
      ((false, null, Seq("John Smith", "Jane Doe"))))
    assert(out("Written by  JANE   DOE") == ((false, null, Seq("Jane Doe"))))
    assert(out("JANE DOE, Staff Writer") == ((false, null, Seq("Jane Doe"))))
  }

  test("wire services: exact/prefix matches pass through as-is") {
    val out = run("Associated Press", "AP", "From Reuters", "reuters staff")
    assert(out("Associated Press") ==
      ((true, "The Associated Press", Seq("Associated Press"))))
    assert(out("AP") == ((true, "The Associated Press", Seq("AP"))))
    // "from " prefix stripped before the table match (reference :1018)
    assert(out("From Reuters") == ((true, "Reuters", Seq("From Reuters"))))
    // prefix match: "reuters " + anything
    assert(out("reuters staff")._1 && out("reuters staff")._2 == "Reuters")
  }

  test("syndicated suffix: author extracted before the service name") {
    val out = run(
      "Trisha Easto USA TODAY",
      "John Roe The Washington Post",
      "USA TODAY")
    assert(out("Trisha Easto USA TODAY") ==
      ((true, "USA TODAY", Seq("Trisha Easto"))))
    assert(out("John Roe The Washington Post") ==
      ((true, "The Washington Post", Seq("John Roe"))))
    // no name before the service → exact-table hit, passthrough
    assert(out("USA TODAY") == ((true, "USA TODAY", Seq("USA TODAY"))))
  }

  test("junk removal: emails, phones, handles, copyright tails") {
    val out = run(
      "john.smith@example.com John Smith 555-123-4567",
      "By John Smith, jsmith@paper.com, @jsmith",
      "Jane Doe copyright 2024 Tribune Co")
    assert(out("john.smith@example.com John Smith 555-123-4567") ==
      ((false, null, Seq("John Smith"))))
    assert(out("By John Smith, jsmith@paper.com, @jsmith") ==
      ((false, null, Seq("John Smith"))))
    assert(out("Jane Doe copyright 2024 Tribune Co") ==
      ((false, null, Seq("Jane Doe"))))
  }

  test("title-word stripping covers 'Special to' shapes; dedup preserves order") {
    val out = run(
      "Jane Doe Special to the Tribune",
      "Zed Yost and Zed Yost",
      "")
    assert(out("Jane Doe Special to the Tribune") ==
      ((false, null, Seq("Jane Doe"))))
    assert(out("Zed Yost and Zed Yost") == ((false, null, Seq("Zed Yost"))))
    assert(out("") == ((false, null, Seq())))
  }
}
