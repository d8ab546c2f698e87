package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sorted_common / sorted_intersect must be value-identical to
  * size(array_intersect) / array_intersect on sorted, distinct long
  * arrays — the only inputs the graph kernels feed them. */
class SortedIntersectSpec extends SparkSpec {

  test("merge intersection matches array_intersect on sorted distinct arrays") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def arr() = rnd.shuffle((0L to 400L).toList)
        .take(rnd.nextInt(40)).distinct.sorted
      (arr(), arr())
    } :+ ((List.empty[Long], List(1L, 2L))) :+ ((List(3L), List.empty[Long]))
    import spark.implicits._
    val df = rows.toDF("a", "b")
    val got = df.select(
      call_function("sorted_common", col("a"), col("b")).as("c"),
      call_function("sorted_intersect", col("a"), col("b")).as("ix"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("c0"),
      array_intersect(col("a"), col("b")).as("ix0")).collect()
    got.foreach { r =>
      assert(r.getLong(0) === r.getLong(2), "count diverges")
      assert(r.getSeq[Long](1) === r.getSeq[Long](3), "elements diverge")
    }
  }
}
