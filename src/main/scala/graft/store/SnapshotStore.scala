package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer over parquet (no Iceberg runtime
  * in this sandbox — SURVEY.md §7). Layout:
  *
  *   root/<table>/snap-%05d/part-*.parquet
  *   root/<table>/manifest.json      (atomic-rename commit)
  *   root/_commits/wave-%05d.json    (cross-table wave manifest)
  *
  * The manifest carries per-snapshot row counts and lineage notes, so a
  * resumed run can locate the last fully-committed wave and time-travel
  * reads are just snapshot-id pins. Atomic rename after temp-write is
  * the same commit protocol the reference uses for artifacts
  * (src/pipeline/io_utils.py:72-185). At cluster scale the rename
  * target is an object-store manifest swap; the table data itself is
  * immutable append, exactly like Iceberg snapshots. */
final class SnapshotStore(val root: String) {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def manifestPath(table: String): Path = tableDir(table).resolve("manifest.json")

  private def atomicWrite(path: Path, content: String): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.getParent.resolve(path.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write `df` as the next snapshot of `table`; returns snapshot id.
    * The data lands under snap-<id>/ first; the manifest rename is the
    * commit point. */
  def write(df: DataFrame, table: String, wave: Int, rows: Long = -1L,
            lineage: String = ""): Int = {
    val next = currentSnapshot(table).map(_ + 1).getOrElse(0)
    val dir = tableDir(table).resolve(f"snap-$next%05d")
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    val n = if (rows >= 0) rows else -1L
    val prior = manifestJsonEntries(table)
    val entry =
      s"""{"id":$next,"wave":$wave,"rows":$n,"lineage":"${escape(lineage)}"}"""
    atomicWrite(manifestPath(table),
      s"""{"current":$next,"snapshots":[${(prior :+ entry).mkString(",")}]}""")
    next
  }

  private def escape(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }

  private def manifestJsonEntries(table: String): Seq[String] = {
    val p = manifestPath(table)
    if (!Files.exists(p)) Seq.empty
    else {
      val txt = Files.readString(p)
      val arr = txt.substring(txt.indexOf('[') + 1, txt.lastIndexOf(']')).trim
      if (arr.isEmpty) Seq.empty
      else splitTopLevel(arr)
    }
  }

  private def splitTopLevel(arr: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    arr.zipWithIndex.foreach { case (c, i) =>
      c match {
        case '{' => depth += 1
        case '}' => depth -= 1
          if (depth == 0) { out += arr.substring(start, i + 1).trim }
        case ',' if depth == 0 => start = i + 1
        case _ =>
      }
    }
    out.toSeq
  }

  def currentSnapshot(table: String): Option[Int] = {
    val p = manifestPath(table)
    if (!Files.exists(p)) None
    else {
      val txt = Files.readString(p)
      val m = """"current":(-?\d+)""".r.findFirstMatchIn(txt)
      m.map(_.group(1).toInt).filter(_ >= 0)
    }
  }

  def read(spark: SparkSession, table: String): DataFrame =
    readSnapshot(spark, table, currentSnapshot(table).getOrElse(
      sys.error(s"no snapshot for table $table")))

  /** Time-travel read of a pinned snapshot id. */
  def readSnapshot(spark: SparkSession, table: String, id: Int): DataFrame =
    spark.read.parquet(tableDir(table).resolve(f"snap-$id%05d").toString)

  /** Read the union of all snapshots ≤ current — the append-only view
    * for log-style tables (results, metrics), where each wave writes
    * only its delta instead of rewriting history. */
  def readAll(spark: SparkSession, table: String): DataFrame = {
    val cur = currentSnapshot(table).getOrElse(sys.error(s"no snapshot for $table"))
    val dirs = (0 to cur).map(i => tableDir(table).resolve(f"snap-$i%05d").toString)
    spark.read.parquet(dirs: _*)
  }

  def exists(table: String): Boolean = currentSnapshot(table).isDefined

  // ---- cross-table wave commits (checkpoint/resume) ----

  private def commitsDir: Path = Paths.get(root, "_commits")
  private def commitPath(wave: Int): Path = commitsDir.resolve(f"wave-$wave%05d.json")

  /** Atomically record that `wave` committed with the given table →
    * snapshot-id pins plus metric counters. */
  def commitWave(wave: Int, pins: Map[String, Int], metrics: Map[String, Long]): Unit = {
    val p = pins.map { case (t, i) => s""""${escape(t)}":$i""" }.mkString(",")
    val m = metrics.map { case (k, v) => s""""${escape(k)}":$v""" }.mkString(",")
    atomicWrite(commitPath(wave), s"""{"wave":$wave,"pins":{$p},"metrics":{$m}}""")
  }

  /** Highest wave with a complete commit manifest, or -1. */
  def lastCommittedWave(): Int = {
    if (!Files.exists(commitsDir)) return -1
    Files.list(commitsDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("wave-") && s.endsWith(".json") =>
        s.stripPrefix("wave-").stripSuffix(".json").toInt }
      .foldLeft(-1)(math.max)
  }

  /** Snapshot pins recorded at a wave commit. */
  def wavePins(wave: Int): Map[String, Int] = {
    val txt = Files.readString(commitPath(wave))
    """"([a-z_]+)":(\d+)""".r.findAllMatchIn(
      txt.substring(txt.indexOf("\"pins\""), txt.indexOf("\"metrics\"")))
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }
}
