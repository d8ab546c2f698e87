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

  test("saltedSelfPairs equals the naive self-join on a planted hot bucket") {
    import spark.implicits._
    // one hot bucket (100 members), several small ones, singletons
    val rows =
      (1 to 100).map(i => (0L, 7L, i.toLong)) ++            // hot bucket
      (1 to 5).map(i => (1L, 9L, 1000L + i)) ++             // small bucket
      Seq((2L, 3L, 2000L), (3L, 4L, 3000L))                 // singletons
    val df = rows.toDF("band", "bk", "doc_id")
    val naive = df.as("a").join(df.as("b"),
        $"a.band" === $"b.band" && $"a.bk" === $"b.bk" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("_ida"), $"b.doc_id".as("_idb"))
    // target=8 forces the hot bucket over ceil(100/8)=13 salt keys
    val salted = SkewJoin.saltedSelfPairs(df, Seq("band", "bk"), "doc_id",
      target = 8)
    assert(naive.count() == 100L * 99 / 2 + 5L * 4 / 2)
    assert(salted.count() == naive.count())
    assert(naive.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(naive).count() == 0)
  }

  test("approximate aggregates stay within their documented bounds") {
    // q_approx now EMITS its bounded-error audit (exact side + in-bound
    // booleans, hash-gated against the oracle's literal TRUEs); here we
    // assert the booleans directly and that the audit is non-degenerate
    val rows = Relational3.qApprox(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, s"${r.getString(0)}: degenerate exact side")
      assert(r.getBoolean(2), s"${r.getString(0)}: HLL outside 5% of exact")
      assert(r.getBoolean(3),
        s"${r.getString(0)}: approx median outside the 0.49..0.51 bracket")
    }
  }
}
