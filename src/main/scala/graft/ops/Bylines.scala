package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X3: byline cleaning + wire-service detection, the reference's
  * per-extraction author-normalization pass
  * (src/utils/byline_cleaner.py — wire detection :1013-1091, basic
  * cleaning :1093-1110, byline patterns :429-459, author extraction
  * :1500-1663, title stripping via TITLES_TO_REMOVE :26-144,
  * capitalization :2080, order-preserving dedup :2129). The reference
  * runs it row-at-a-time in Python against DB-backed caches; here the
  * whole pass is a single codegen'd column-expression pipeline — no
  * UDF, no shuffle, no driver loop — so it rides any scan at
  * 100 TB untouched.
  *
  * Deterministic documented subset of the reference's rule set (the
  * full module also consults a live publications table and emits
  * telemetry): wire detection = prefix-strip + table equality/prefix
  * match + syndicated-suffix regexes; cleaning = junk-pattern removal
  * (emails/phones/handles/copyright tails), separator split, title-word
  * filtering, capitalization, order-preserving dedup.
  */
object Bylines {

  /** (match key, canonical name), checked in order — reference
    * WIRE_SERVICES (:145-192) ∩ WIRE_SERVICE_NORMALIZATION (:194+). */
  val WireServices: Seq[(String, String)] = Seq(
    "the associated press" -> "The Associated Press",
    "associated press" -> "The Associated Press",
    "ap" -> "The Associated Press",
    "reuters" -> "Reuters",
    "bloomberg" -> "Bloomberg",
    "cnn newssource" -> "CNN NewsSource",
    "cnn" -> "CNN NewsSource",
    "npr" -> "NPR",
    "pbs" -> "PBS",
    "usa today" -> "USA TODAY",
    "wall street journal" -> "Wall Street Journal",
    "the new york times" -> "The New York Times",
    "new york times" -> "The New York Times",
    "the washington post" -> "The Washington Post",
    "washington post" -> "The Washington Post",
    "los angeles times" -> "Los Angeles Times",
    "afp" -> "AFP",
    "mcclatchy" -> "McClatchy",
    "gannett" -> "Gannett",
    "states newsroom" -> "States Newsroom")

  /** Syndicated trailing-service shapes ("Jane Doe USA TODAY"), in
    * order — reference syndicated_suffix_patterns (:1064-1082). The
    * text BEFORE the suffix, if it cleans to a name, is the extracted
    * author (:978-1011); otherwise the byline passes through as-is. */
  val SyndicatedSuffixes: Seq[(String, String)] = Seq(
    "usa today" -> "USA TODAY",
    "(the )?associated press" -> "The Associated Press",
    "reuters" -> "Reuters",
    "(the )?new york times" -> "The New York Times",
    "(the )?washington post" -> "The Washington Post",
    "los angeles times" -> "Los Angeles Times")

  /** Title/role/stop words stripped from author-name words — subset of
    * TITLES_TO_REMOVE (:26-144). */
  val TitleWords: Seq[String] = Seq(
    "staff", "reporter", "editor", "publisher", "writer", "journalist",
    "correspondent", "contributor", "freelancer", "intern", "blogger",
    "senior", "lead", "chief", "managing", "executive", "associate",
    "assistant", "deputy", "news", "sports", "politics", "business",
    "opinion", "editorial", "column", "columnist", "photographer",
    "special", "contributing", "freelance", "guest",
    "the", "for", "at", "of", "and", "from", "with", "by", "to",
    "tribune", "herald", "gazette", "times", "post", "press", "journal",
    "daily", "weekly", "newspaper", "magazine")

  /** Junk removed from byline text before author extraction —
    * reference BYLINE_PATTERNS (:440-459): emails, phones, handles,
    * copyright/source tails. */
  val JunkRe: String =
    "([a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,})" +
      "|(\\(\\d{3}\\)\\s*\\d{3}[-.]?\\d{4})" +
      "|(\\b\\d{3}[-.]?\\d{3}[-.]?\\d{4}\\b)" +
      "|(@\\w+)" +
      "|((copyright|all rights reserved|source:|photo[^:]*:|image[^:]*:).*$)"

  private val wireArr: Column = array(WireServices.map { case (k, c) =>
    struct(lit(k).as("k"), lit(c).as("c"))
  }: _*)
  private val titleArr: Column = array(TitleWords.map(lit): _*)

  /** Whitespace-normalized lowercase view (reference :1095). */
  private def norm(b: Column): Column =
    lower(trim(regexp_replace(b, "\\s+", " ")))

  /** Core identifier for wire matching: "by "/"from "/"source: "/"- "
    * prefixes stripped (reference :1018-1021). */
  private def wireCore(b: Column): Column =
    regexp_replace(norm(b), "^(by|from|source:|-)\\s+", "")

  /** Author-name cleaning over a lowercase text fragment: junk
    * removal → separator split → per-part title-word filter →
    * capitalization → drop empties → order-preserving dedup. */
  private def cleanAuthors(x: Column): Column = {
    val squished = trim(regexp_replace(regexp_replace(x, JunkRe, " "), "\\s+", " "))
    val parts = split(squished, "\\s*(,|\\band\\b|&|\\bwith\\b)\\s*")
    val cleaned = transform(parts, p =>
      initcap(array_join(
        filter(split(p, " "), w => w =!= "" && !array_contains(titleArr, w)),
        " ")))
    array_distinct(filter(cleaned, p => p =!= ""))
  }

  /** The X3 pass: `(id, wire_detected, wire_service, authors)` per
    * row. `wire_detected` rows keep the byline as the single "author"
    * (reference wire_service_passthrough) unless a syndicated suffix
    * left an extractable name before it. */
  def clean(df: DataFrame, idCol: String, bylineCol: String): DataFrame = {
    val b = col(bylineCol)
    val core = wireCore(b)

    // try_element_at: the filtered array is empty on non-wire rows
    // (plain element_at errors under ANSI semantics)
    val exactHit = try_element_at(
      filter(wireArr, s =>
        core === s.getField("k") ||
          startswith(core, concat(s.getField("k"), lit(" ")))), lit(1))
    val exactService = exactHit.getField("c")

    // unrolled in declaration order: first matching suffix wins
    val nullStr = lit(null).cast("string")
    val (sufService, sufBefore) = SyndicatedSuffixes.foldRight((nullStr, nullStr)) {
      case ((k, c), (accC, accB)) =>
        val re = "\\b" + k + "\\s*$"
        (when(core.rlike(re), lit(c)).otherwise(accC),
          when(core.rlike(re), trim(regexp_replace(core, re, ""))).otherwise(accB))
    }

    val passthrough = array(trim(regexp_replace(b, "\\s+", " ")))
    val beforeAuthors = cleanAuthors(coalesce(sufBefore, lit("")))
    val stdAuthors = cleanAuthors(
      regexp_replace(norm(b), "^(written by|story by|report by|by)\\s+", ""))

    val wireService = coalesce(exactService, sufService)
    val authors =
      when(norm(b) === "", array().cast("array<string>"))
        .when(exactService.isNotNull, passthrough)
        .when(sufService.isNotNull,
          when(size(beforeAuthors) > 0, beforeAuthors).otherwise(passthrough))
        .otherwise(stdAuthors)

    df.select(col(idCol), wireService.isNotNull.as("wire_detected"),
      wireService.as("wire_service"), authors.as("authors"))
  }
}
