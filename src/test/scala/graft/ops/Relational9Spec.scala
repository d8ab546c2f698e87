package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class Relational9Spec extends SparkSpec {

  test("q_integrity computes zero orphans on the generator's star schema") {
    val rows = Relational9.qIntegrity(spark, sfDir).collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getLong(1) == 0L,
      s"edge ${r.getString(0)}: expected 0 orphans, got ${r.getLong(1)}"))
  }

  test("q_streaks equals a brute-force streak computation") {
    val day = 86400000000L
    val du = Tables.loadEventsUs(spark, sfDir)
      .select(col("user_id"), expr(s"ts_us DIV $day").as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = du.groupBy(_._1).map { case (u, pairs) =>
      val days = pairs.map(_._2).distinct.sorted
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
          (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }
      u -> (runs.map(_.length).max.toLong, runs.length.toLong)
    }
    val got = Relational9.qStreaks(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }
}
