package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewAccuracySpec extends SparkSpec {

  test("salted join equals the plain join row-for-row") {
    val fact = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val dim = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = fact.join(dim, Seq("l_suppkey"))
    val salted = SkewJoin.saltedJoin(fact, dim, "l_suppkey", buckets = 8)
      .select(plain.columns.map(col): _*)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("approximate aggregates stay near the exact answers") {
    val approx = Relational3.qApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (n, med)) =>
      val (an, amed) = approx(k)
      assert(math.abs(an - n).toDouble / n < 0.05, s"$k distinct: $an vs $n")
      assert(math.abs(amed - med) / med < 0.05, s"$k median: $amed vs $med")
    }
  }
}
