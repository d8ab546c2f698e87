package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for heavily skewed keys (SURVEY.md §4). AQE's skew-join
  * splitting covers sort-merge joins at runtime; explicit salting is
  * the planned-ahead variant for joins AQE can't split (e.g. when the
  * skewed side must stay hash-partitioned for a downstream stage, or
  * a shuffled build side explodes one reducer).
  *
  * fact ⋈ dim on `key`: the fact side gets a random-ish salt in
  * [0, buckets); the dim side is replicated `buckets` times; the join
  * key becomes (key, salt), spreading one hot key over `buckets`
  * reducers. Row-level results identical to the unsalted join.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    // deterministic salt (hash of the whole fact row id-ish columns
    // would also do); pmod(xxhash64) spreads uniformly
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets))
        .cast("int"))
    val replicas = (0 until buckets).toDF("_salt")
    val dimRep = dim.join(broadcast(replicas))
    salted.join(dimRep, Seq(key, "_salt")).drop("_salt")
  }
}
