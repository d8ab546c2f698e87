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

  /** All unordered within-group pairs (ida < idb) of a (keys…, id)
    * table, with per-group salting sized to the group: a group of m
    * rows is split over ceil(m / target) shuffle keys, so one hot LSH
    * band-bucket (or simhash block) cannot pin its m² pair generation
    * on a single reducer (SURVEY.md §4 "salt skewed buckets").
    *
    * Mechanics: group sizes are computed once (an aggregation on the
    * same keys — no extra shuffle of the full table); singleton groups
    * are dropped outright (they yield no pairs — typically the vast
    * majority of LSH buckets); the left side gets a deterministic salt
    * hash(id) % n, the right side is replicated n times, and the join
    * key becomes (keys…, salt). Each pair (a, b) with a < b surfaces
    * exactly once, in a's salt partition. Result: (ida, idb) with the
    * group keys dropped — identical row set to the unsalted self-join.
    */
  def saltedSelfPairs(df: DataFrame, keys: Seq[String], idCol: String,
                      target: Int): DataFrame = {
    val sizes = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
      .withColumn("_nsalt", ceil(col("_n") / target).cast("int"))
      .select(keys.map(col) :+ col("_nsalt"): _*)
    val sized = df.join(sizes, keys) // drops singleton groups
    val a = sized
      .withColumn("_salt", pmod(xxhash64(col(idCol)), col("_nsalt")).cast("int"))
      .select(keys.map(col) :+ col("_salt") :+ col(idCol).as("_ida"): _*)
    val b = sized
      .withColumn("_salt", explode(sequence(lit(0), col("_nsalt") - 1)))
      .select(keys.map(col) :+ col("_salt") :+ col(idCol).as("_idb"): _*)
    a.join(b, keys :+ "_salt")
      .filter(col("_ida") < col("_idb"))
      .select(col("_ida"), col("_idb"))
  }
}
