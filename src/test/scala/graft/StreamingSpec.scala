package graft

import graft.crawl.Politeness
import graft.streaming.PolitenessStream
import graft.streaming.PolitenessStream.FetchEvent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-mode politeness: the flatMapGroupsWithState pipeline must
  * produce the same state trajectory as folding the pure kernel —
  * streaming, batch engine, and oracle share one rule set. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("streaming-politeness")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("politeness state stream matches the pure-kernel fold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val updates = PolitenessStream.politenessUpdates(input.toDS(), waveSeconds = 60.0)
    val q = updates.writeStream.format("memory").queryName("pol_updates")
      .outputMode("append").start()

    // wave 0: two failures on h1; wave 1: one more (3rd consecutive → pause)
    input.addData(
      FetchEvent("h1", 0, "429", 5, 0.0), FetchEvent("h1", 0, "timeout", 5, 0.0),
      FetchEvent("h2", 0, "extracted", 3, 0.0))
    q.processAllAvailable()
    input.addData(FetchEvent("h1", 1, "timeout", 5, 0.0))
    q.processAllAvailable()
    input.addData(FetchEvent("h1", 2, "429", 5, 0.0))
    q.processAllAvailable()
    val got = spark.table("pol_updates").as[PolitenessStream.HostUpdate]
      .collect().sortBy(u => (u.host, u.wave))
    q.stop()

    // pure-kernel fold for h1
    var st = Politeness.initial("h1", 5, 0.0, 60.0)
    st = Politeness.update(st, Politeness.HostOutcome(0, 0, 0, 1, 1, 0), 0, 60.0, 0.0)
    val w0 = st
    st = Politeness.update(st, Politeness.HostOutcome(0, 0, 0, 0, 1, 0), 1, 60.0, 0.0)
    val w1 = st
    st = Politeness.update(st, Politeness.HostOutcome(0, 0, 0, 1, 0, 0), 2, 60.0, 0.0)
    val w2 = st

    val h1 = got.filter(_.host == "h1")
    assert(h1.length == 3)
    assert(h1(0).cooldown_until_s == w0.cooldown_until_s)
    assert(h1(1).consecutive_failures == w1.consecutive_failures)
    assert(h1(2).consecutive_failures == 3)
    assert(h1(2).paused_until_s == w2.paused_until_s)
    assert(w2.paused_until_s > 0) // 3rd consecutive failure → 30-min pause
    // h2 had a success: no cooldown
    val h2 = got.filter(_.host == "h2")
    assert(h2.length == 1 && h2(0).consecutive_failures == 0)
  }

  test("X4 content-typed outcomes count as ok — streaming equals batch kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FetchEvent]
    val updates = PolitenessStream.politenessUpdates(input.toDS(), waveSeconds = 60.0)
    val q = updates.writeStream.format("memory").queryName("pol_x4")
      .outputMode("append").start()

    // wave 0: two failures (streak starts); wave 1: obituary + wire —
    // X4 content types MUST reset the failure streak exactly as the
    // batch kernel's OkStatuses fold does
    input.addData(FetchEvent("h3", 0, "429", 5, 0.0), FetchEvent("h3", 0, "timeout", 5, 0.0))
    q.processAllAvailable()
    input.addData(FetchEvent("h3", 1, "obituary", 5, 0.0), FetchEvent("h3", 1, "wire", 5, 0.0))
    q.processAllAvailable()
    val got = spark.table("pol_x4").as[PolitenessStream.HostUpdate]
      .collect().sortBy(_.wave)
    q.stop()

    var st = Politeness.initial("h3", 5, 0.0, 60.0)
    st = Politeness.update(st, Politeness.HostOutcome(0, 0, 0, 1, 1, 0), 0, 60.0, 0.0)
    assert(got(0).consecutive_failures == st.consecutive_failures && st.consecutive_failures == 1)
    st = Politeness.update(st, Politeness.HostOutcome(2, 0, 0, 0, 0, 0), 1, 60.0, 0.0)
    assert(got(1).consecutive_failures == st.consecutive_failures && st.consecutive_failures == 0)
    assert(got(1).cooldown_until_s == st.cooldown_until_s)
  }

  test("windowed failure counts honor watermark + threshold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val df = input.toDF().toDF("event_ts", "host", "status")
    val agg = PolitenessStream.failureWindows(df, "10 minutes", threshold = 2)
    val q = agg.writeStream.format("memory").queryName("fail_windows")
      .outputMode("update").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    input.addData(
      (ts(1), "h1", "403"), (ts(2), "h1", "429"), (ts(3), "h2", "403"),
      (ts(4), "h1", "extracted"))
    q.processAllAvailable()
    val rows = spark.table("fail_windows")
      .select("host", "failures", "trips_threshold").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    q.stop()
    assert(rows.contains(("h1", 2L, true)))
    assert(rows.contains(("h2", 1L, false)))
  }
}
