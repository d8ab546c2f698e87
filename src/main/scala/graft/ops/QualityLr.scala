package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the learned gate every 2024+ data
  * pipeline ships next to its hard rules (CCNet trains a model to
  * separate a target domain from raw web text; FineWeb-Edu a quality
  * scorer; both are linear-class models over cheap text features):
  * batch-gradient LOGISTIC REGRESSION over hashed bag-of-words
  * counts, trained distributed and served as a broadcastable weight
  * vector. Semantics reference: duckpipe has no learned stage — this
  * is brief-mandated extra surface (cf. reference pipeline stages in
  * duckpipe/core.py:87-116 being fixed SQL filters).
  *
  * Determinism contract (the embed_pca / text_bpe_train pattern —
  * N unrolled rounds the oracle replays exactly):
  *   - features x_{d,b} = token multiplicities hashed into `Buckets`
  *     slots by the replayable md5-conv bucket (+ a bias slot b = −1
  *     with k = 1), so the per-doc logit z = Σ W_b·x_b is an INTEGER
  *     dot product against the fixed-point weight vector (scale 10⁶)
  *     — exact and order-free in both engines;
  *   - p = 1/(1+exp(−z/10⁶)) on the identical double z;
  *   - the gradient is QUANTIZED per term, Σ floor((p−y)·k·10⁶+0.5)
  *     (the qsum128 idiom): an integer sum both engines agree on;
  *   - the update W ← W − floor(η·G/n + 0.5) is pure IEEE
  *     mult/div/floor on exactly-representable integers.
  *   The only non-exactly-rounded op is exp(); a 1-ulp divergence
  *   shifts a quantized gradient term only when its argument lands
  *   within ~1e-9 of a .5 boundary — the same accepted exposure class
  *   as embed_pca's per-round quantization.
  *
  * Scale shape for 100 TB: the corpus is touched once to fold the
  * (doc, bucket) multiplicities into ONE checkpointed row per doc
  * (sparse vector ≤ Buckets+1 entries — the collect_list is bounded);
  * each training round is a single scan of that table with a map-side
  * logit (weight vector rides in as an array LITERAL — the model is
  * O(Buckets), the textbook broadcast) and one ≤ Buckets+1-key
  * aggregate whose partials combine map-side. The weight vector lives
  * on the driver between rounds — a routing-aggregate-sized collect
  * (≤ 129 rows), the production parameter-server lifecycle for a
  * model this small.
  */
object QualityLr {

  /** Feature space: 128 hash buckets + the bias slot. Small enough
    * that the oracle's unrolled replay stays cheap; the operator is
    * the TRAINING shape, not a vocabulary-fidelity claim. */
  val Buckets = 128

  /** Full-batch gradient rounds — mirrored exactly by the unrolled
    * oracle SQL; changing one requires changing the other. */
  val Rounds = 3

  /** Learning rate 1/2 — exactly representable, so η·G/n is one
    * correctly-rounded division in both engines. */
  val Eta = 0.5

  /** The replayable token→bucket hash (md5-conv, the sample_dsir
    * idiom) — ONE definition shared by training and the
    * CorpusPipeline filter step so the two cannot drift. */
  def bucketCol(w: Column): Column =
    conv(substring(md5(concat(lit("qlr:"), w)), 1, 8), 16, 10)
      .cast("long") % Buckets

  /** Fixed-point logit of a token array under a trained weight
    * vector: bias + Σ W_{bucket(w)} per token OCCURRENCE — the same
    * integer arithmetic training uses, exposed for the pipeline
    * filter step. `w` is indexed w(0)=bias, w(b+1)=bucket b. */
  def logitZ(toks: Column, w: Array[Long]): Column =
    aggregate(toks, lit(w(0)),
      (acc, t) => acc + element_at(typedlit(w),
        (bucketCol(t) + 2L).cast("int")))

  /** Train on any (doc_id, y: double 0/1, toks: array<string>) frame.
    * Returns (sorted feature keys incl. −1 = bias, weights indexed
    * b+1, fixed-point scale 10⁶). */
  def trainLr(labeled: DataFrame, rounds: Int = Rounds)
      : (Array[Long], Array[Long]) = {
    // ONE corpus pass folds token multiplicities into a sparse
    // per-doc vector row (bounded ≤ Buckets+1 entries) + bias slot;
    // hotCount doubles as the materialization and measures n.
    val (db, nDocs) = Tables.hotCount(
      labeled
        .select(col("doc_id"), col("y"), explode(col("toks")).as("t"))
        .withColumn("b", bucketCol(col("t")))
        .groupBy("doc_id", "y", "b").agg(count(lit(1)).as("k"))
        .groupBy("doc_id", "y")
        .agg(collect_list(struct(col("b").cast("int").as("b"),
          col("k").cast("int").as("k"))).as("xs"))
        .select(col("doc_id"), col("y"),
          concat(col("xs"),
            array(struct(lit(-1).as("b"), lit(1).as("k")))).as("xs")))
    require(nDocs > 0, "text_quality_lr: empty training corpus")
    val w = Array.fill(Buckets + 1)(0L)
    var keys: Array[Long] = null
    for (_ <- 1 to rounds) {
      // map-side logit: integer dot product against the weight
      // literal; p once per doc, then the quantized gradient terms
      // explode and combine into ≤ Buckets+1 groups
      val z = aggregate(col("xs"), lit(0L),
        (acc, e) => acc +
          element_at(typedlit(w), (e("b") + lit(2)).cast("int")) *
            e("k"))
      val p = lit(1.0) /
        (lit(1.0) + exp(-(z.cast("double") / lit(1e6))))
      val g = db
        .select(col("y"), p.as("p"), explode(col("xs")).as("e"))
        .groupBy(col("e.b").cast("long").as("b"))
        .agg(sum(floor((col("p") - col("y")) * col("e.k") * lit(1e6)
          + lit(0.5)).cast("long")).as("g"),
          sum(col("e.k").cast("long")).as("kt"))
        .collect()
      if (keys == null) keys = g.map(_.getLong(0)).sorted
      g.foreach { r =>
        val b = r.getLong(0).toInt
        // exactness envelope: each gradient term is bounded by k·10⁶,
        // so the per-bucket LongType sum is exact only while
        // Σk·10⁶ < 2⁶² — past ~4.6·10¹² tokens in one bucket the plain
        // long accumulator could wrap SILENTLY (non-ANSI sum) while the
        // oracle's HUGEINT keeps going. Fail loudly at the envelope
        // (the dsum128 exactness-contract pattern); a corpus that big
        // routes through a 128-bit accumulator instead.
        require(r.getLong(2) <= (1L << 62) / 1000000L,
          s"text_quality_lr: bucket $b token mass ${r.getLong(2)} " +
            "exceeds the 2^62/1e6 long-gradient envelope — route the " +
            "gradient through a 128-bit accumulator (qsum128)")
        w(b + 1) -= math.floor(Eta * r.getLong(1).toDouble / nDocs
          + 0.5).toLong
      }
    }
    (keys, w)
  }

  /** Registered query: train the target-domain classifier (CCNet
    * framing: y = 1 for the `en` slice, 0 for the rest) and emit the
    * learned weight vector — bucket −1 is the bias; weights are exact
    * 6-dp decimals (fixed-point longs / 10⁶). */
  def textQualityLr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (keys, w) = trainLr(
      Text.docToks(s, dir).select(col("doc_id"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
        col("toks")))
    keys.map(b => (b, w(b.toInt + 1).toDouble / 1e6)).toSeq
      .toDF("bucket", "w")
      .orderBy("bucket")
  }

  val textQualityLrSql: String = s"""
    WITH tok AS (
      SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             unnest(string_split(text, ' ')) AS w
      FROM documents),
    dbx AS (
      SELECT doc_id, y,
             CAST(CAST(('0x' || substring(md5('qlr:' || w), 1, 8))
               AS UBIGINT) % $Buckets AS BIGINT) AS b,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM tok GROUP BY 1, 2, 3),
    db AS MATERIALIZED (
      SELECT doc_id, y, b, k FROM dbx
      UNION ALL
      SELECT DISTINCT doc_id, y, CAST(-1 AS BIGINT), CAST(1 AS BIGINT)
      FROM dbx),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM db WHERE b = -1),
    g1 AS (
      SELECT b, SUM(CAST(floor((0.5 - y) * k * 1000000.0 + 0.5)
        AS HUGEINT)) AS g
      FROM db GROUP BY 1),
    w1 AS MATERIALIZED (
      SELECT b, -CAST(floor(0.5 * CAST(g AS DOUBLE)
        / (SELECT n FROM nn) + 0.5) AS BIGINT) AS wq
      FROM g1),
    z2 AS (
      SELECT db.doc_id, db.y, SUM(w1.wq * db.k) AS zi
      FROM db JOIN w1 USING (b) GROUP BY 1, 2),
    g2 AS (
      SELECT db.b, SUM(CAST(floor(
          (1.0 / (1.0 + exp(-(CAST(z2.zi AS DOUBLE) / 1000000.0)))
            - db.y) * db.k * 1000000.0 + 0.5) AS HUGEINT)) AS g
      FROM db JOIN z2 USING (doc_id) GROUP BY 1),
    w2 AS MATERIALIZED (
      SELECT w1.b, w1.wq - CAST(floor(0.5 * CAST(g2.g AS DOUBLE)
        / (SELECT n FROM nn) + 0.5) AS BIGINT) AS wq
      FROM w1 JOIN g2 ON w1.b = g2.b),
    z3 AS (
      SELECT db.doc_id, db.y, SUM(w2.wq * db.k) AS zi
      FROM db JOIN w2 USING (b) GROUP BY 1, 2),
    g3 AS (
      SELECT db.b, SUM(CAST(floor(
          (1.0 / (1.0 + exp(-(CAST(z3.zi AS DOUBLE) / 1000000.0)))
            - db.y) * db.k * 1000000.0 + 0.5) AS HUGEINT)) AS g
      FROM db JOIN z3 USING (doc_id) GROUP BY 1),
    w3 AS (
      SELECT w2.b, w2.wq - CAST(floor(0.5 * CAST(g3.g AS DOUBLE)
        / (SELECT n FROM nn) + 0.5) AS BIGINT) AS wq
      FROM w2 JOIN g3 ON w2.b = g3.b)
    SELECT b AS bucket, CAST(wq AS DOUBLE) / 1000000.0 AS w
    FROM w3 ORDER BY bucket"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("text_quality_lr", textQualityLr, Some(textQualityLrSql)))
}
