package graft.queries

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  test("ev_asof: latest click at-or-before each purchase, ties inclusive") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evasof").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // user 1: purchase before any click (null as-of), then a same-second
    // click+purchase tie (click must count — inclusive <= semantics);
    // user 2: two clicks around two purchases, plus a 'view' that must be
    // ignored by the click/purchase filter.
    Seq(
      (10L, ts(5), 1L, "purchase", 1.0, "{}"),
      (11L, ts(10), 1L, "click", 0.0, "{}"),
      (12L, ts(10), 1L, "purchase", 2.0, "{}"),
      (20L, ts(100), 2L, "click", 0.0, "{}"),
      (21L, ts(150), 2L, "view", 0.0, "{}"),
      (22L, ts(160), 2L, "purchase", 3.0, "{}"),
      (23L, ts(200), 2L, "click", 0.0, "{}"),
      (24L, ts(250), 2L, "purchase", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = Events.queries("ev_asof")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getLong(3))), r.getLong(4)))
      .toMap
    def us(sec: Long) = sec * 1000000L
    assert(got(10L) == ((None, 0L)), "purchase before any click")
    assert(got(12L) == ((Some(us(10)), 1L)), "same-timestamp click included")
    assert(got(22L) == ((Some(us(100)), 1L)), "strictly-preceding click")
    assert(got(24L) == ((Some(us(200)), 2L)), "latest of two clicks + count")
    assert(got.keySet == Set(10L, 12L, 22L, 24L), "one row per purchase only")
  }
}
