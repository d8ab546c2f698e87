package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KcoreSpec extends SparkSpec {

  private lazy val edges: Seq[(Long, Long)] = {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.toSeq.groupBy(_._1).values.toSeq.flatMap { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
  }

  private def peel(k: Int): Map[Long, Int] = {
    var e = edges
    var stable = false
    while (!stable) {
      val deg = e.flatMap(ab => Seq(ab._1, ab._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val ne = e.filter(ab => keep(ab._1) && keep(ab._2))
      stable = ne.size == e.size
      e = ne
    }
    e.flatMap(ab => Seq(ab._1, ab._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size }
  }

  test("graph_kcore: round-synchronous peel matches a plain-Scala replay " +
    "and every survivor meets the degree bound") {
    for (k <- Seq(3, 8, 15)) {
      val got = Graph.graphKcore(spark, sfDir, k = k).collect()
        .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
      val want = peel(k)
      assert(got == want, s"k=$k core diverges from the replay")
      got.values.foreach(d => assert(d >= k, s"k=$k survivor below bound"))
    }
    // monotonicity: a higher k yields a (weakly) smaller core
    val c3 = peel(3).keySet; val c8 = peel(8).keySet
    assert(c8.subsetOf(c3))
  }
}
