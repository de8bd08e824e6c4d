package graft.relational

import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private lazy val left = Seq(
    (10L, 1L, ts(10)), // after r1/r2 -> latest is r2
    (11L, 1L, ts(5)),  // exactly at r2's instant
    (12L, 1L, ts(1)),  // before any right row -> null
    (13L, 2L, ts(30))  // key with no right rows at all -> null
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (100L, 1L, ts(2)),
    (101L, 1L, ts(5)),
    (102L, 1L, ts(5)), // tie on (k, t): larger ord must win
    (103L, 1L, ts(20)) // in the future of every left row
  ).toDF("rid", "k", "t")

  test("asofJoin: latest at-or-before per key, ties to max ord, null when none") {
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t",
        valueCols = Seq("rid"), rightOrd = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(10L).contains(102L)) // 5min tie resolved to rid 102, not 103 (future)
    assert(got(11L).contains(102L)) // at-instant row IS visible
    assert(got(12L).isEmpty)
    assert(got(13L).isEmpty)
  }

  test("asofJoin strict: at-instant right rows are invisible") {
    val got = TemporalJoins.asofJoin(left, right, Seq("k"), "t",
        valueCols = Seq("rid"), rightOrd = "rid", strict = true)
      .select("id", "asof_rid").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(11L).contains(100L)) // only ts(2) is strictly before ts(5)
    assert(got(10L).contains(102L)) // unaffected away from the boundary
  }

  test("rangeCount: inclusive window, zero for empty, latest right ts carried") {
    val got = TemporalJoins.rangeCount(left, right, Seq("k"), "t",
        horizonMicros = 5L * 60L * 1000000L) // 5 minutes
      .select("id", "n_right", "last_right_us")
      .as[(Long, Long, Option[Long])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // id 10 at min10, window [5,10]: rids 101,102 at min5 -> 2
    assert(got(10L)._1 == 2L)
    assert(got(10L)._2.contains(ts(5).getTime * 1000L))
    // id 11 at min5, window [0,5]: rids 100,101,102 -> 3
    assert(got(11L)._1 == 3L)
    // id 12 at min1: nothing at-or-before in range -> 0, null ts
    assert(got(12L) == ((0L, None)))
    assert(got(13L) == ((0L, None)))
  }

  test("temporal joins plan as one window shuffle, never a join node") {
    val asof = TemporalJoins.asofJoin(left, right, Seq("k"), "t",
      valueCols = Seq("rid"), rightOrd = "rid")
    val range = TemporalJoins.rangeCount(left, right, Seq("k"), "t", 60000000L)
    for (df <- Seq(asof, range)) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"temporal op planned a join:\n$p")
      assert(p.contains("Window"), p)
      // exactly one exchange: the window's hash partitioning on the key
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    }
  }

  test("asof_join entry matches a per-row reference on real events") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("asof_join")(spark, dir)
    val ev = Tables(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("click_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
    val expected = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect().map { r =>
        val (uid, t) = (r.getLong(1), r.getTimestamp(2).getTime)
        val cand = clicks.filter(c => c._1 == uid && c._2 <= t)
        r.getLong(0) -> (if (cand.isEmpty) None
                         else Some(cand.maxBy(c => (c._2, c._3))._3))
      }.toMap
    val gotMap = got.select("event_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(gotMap == expected)
    assert(gotMap.valuesIterator.count(_.isDefined) > 0, "vacuous: no purchase matched any click")
  }
}
