package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingSessions.{ClosedSession, OpenSession, SessionEvent}
import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.TestGroupState
import java.sql.Timestamp

/** Stateful streaming sessionization: state-transition unit contracts
  * (via TestGroupState) and an end-to-end MemoryStream drive, checked
  * for agreement with the batch Sessionize operator.
  */
class StreamingSessionsSpec extends SparkSpec {

  private val M = 60L * 1000000L // one minute in micros
  private val Gap = 30L * M

  private def ev(u: Long, tus: Long, id: Long, v: Double) =
    SessionEvent(u, tus, id, v, new Timestamp(tus / 1000L))

  test("sessionFunc: in-batch gap closes a session, exact-gap does not") {
    val state = TestGroupState.create[OpenSession](
      optionalState = Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L), hasTimedOut = false)
    val events = Iterator(
      ev(1L, 0L, 1L, 10.0),
      ev(1L, 30L * M, 2L, 5.0), // exactly the gap → same session
      ev(1L, 61L * M, 3L, 2.5)) // 31 min later → new session
    val out = StreamingSessions.sessionFunc(Gap)(1L, events, state).toSeq
    assert(out == Seq(ClosedSession(1L, 0L, 30L * M, 2L, 15.0)))
    assert(state.get == OpenSession(61L * M, 61L * M, 1L, 250L))
  }

  test("sessionFunc: late events merge backward and chain earlier sessions (batch-identical)") {
    // Open session spans [100m, 110m]. The batch delivers, late:
    //  - 80m  → within gap of sessionStart → merges, LOWERS start
    //  - 10m, 20m → their own earlier session (closed immediately)
    val state = TestGroupState.create[OpenSession](
      optionalState = Optional.of(OpenSession(100L * M, 110L * M, 2L, 1000L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L), hasTimedOut = false)
    val events = Iterator(
      ev(1L, 10L * M, 1L, 1.0), ev(1L, 20L * M, 2L, 2.0), ev(1L, 80L * M, 3L, 4.0))
    val out = StreamingSessions.sessionFunc(Gap)(1L, events, state).toSeq
    assert(out == Seq(ClosedSession(1L, 10L * M, 20L * M, 2L, 3.0)))
    assert(state.get == OpenSession(80L * M, 110L * M, 3L, 1400L))
  }

  test("sessionFunc: timeout flushes and clears state") {
    val state = TestGroupState.create[OpenSession](
      optionalState = Optional.of(OpenSession(0L, 5L * M, 3L, 1234L)),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(99999999L), hasTimedOut = true)
    val out = StreamingSessions.sessionFunc(Gap)(7L, Iterator.empty, state).toSeq
    assert(out == Seq(ClosedSession(7L, 0L, 5L * M, 3L, 12.34)))
    assert(!state.exists)
  }

  test("memory-stream drive closes sessions by gap and by watermark, matching batch semantics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Long, Double)]
    val df = ms.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = StreamingSessions.sessionize(df, Gap, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()

    def t(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // user 1: two sessions split by a 40-min gap; user 2: one session.
    ms.addData((1L, t(0), 1L, 1.0), (1L, t(10), 2L, 2.0), (2L, t(5), 3L, 7.0))
    q.processAllAvailable()
    ms.addData((1L, t(50), 4L, 4.0)) // 40 min after t(10) → closes session 1
    q.processAllAvailable()
    // Advance the watermark far past every open session: user 3's event
    // at t(1000) puts the watermark at t(995), beyond lastTus + gap of
    // users 1 and 2 → both flush by timeout on the following trigger.
    ms.addData((3L, t(1000), 5L, 0.0))
    q.processAllAvailable()
    ms.addData((3L, t(1001), 6L, 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions").as[ClosedSession].collect()
      .map(c => (c.user_id, c.session_start, c.session_end, c.n_events, c.total_value))
      .toSet
    def us(min: Long) = (1700000000000L + min * 60000L) * 1000L
    assert(got.contains((1L, us(0), us(10), 2L, 3.0)), s"gap-closed session missing: $got")
    assert(got.contains((1L, us(50), us(50), 1L, 4.0)), s"timeout-flushed session missing: $got")
    assert(got.contains((2L, us(5), us(5), 1L, 7.0)), s"user 2 session missing: $got")

    // Batch replay over the same first-four events agrees.
    val batch = Seq(
      (1L, us(0) / 1000000L, 1L, 1.0), (1L, us(10) / 1000000L, 2L, 2.0),
      (2L, us(5) / 1000000L, 3L, 7.0), (1L, us(50) / 1000000L, 4L, 4.0))
      .toDF("user_id", "tus_s", "event_id", "value")
      .withColumn("tus", org.apache.spark.sql.functions.col("tus_s") * 1000000L)
    val sessions = graft.operators.Sessionize
      .sessionStats(batch, "user_id", "tus", "event_id", Gap, "value")
      .select("user_id", "session_start", "session_end", "n_events", "total_value")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(sessions == Set(
      (1L, us(0), us(10), 2L, 3.0), (1L, us(50), us(50), 1L, 4.0),
      (2L, us(5), us(5), 1L, 7.0)))
  }
}
