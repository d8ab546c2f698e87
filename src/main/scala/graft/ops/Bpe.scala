package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and corpus encoding — the
  * tokenizer-construction stage of an LLM data pipeline, certified
  * end-to-end under the oracle gate (the DuckDB twin unrolls every
  * merge round in SQL, the ann_ivf_pq precedent).
  *
  * The scale split is the real one: merge selection runs on the
  * WORD-FREQUENCY table (tiny at any corpus size — that is also how
  * production BPE trainers work), while the two corpus-sized stages —
  * the vocabulary aggregation feeding training and the encode join-back
  * — are single map-side-combined shuffles. Reference semantics: the
  * classic Sennrich et al. greedy pair-merge; leftmost-greedy,
  * within-word, no end-of-word marker (documented simplification).
  */
object Bpe {

  val Rounds = 6

  /** Leftmost-greedy single-pair merge of a space-separated symbol
    * string, as a string FOLD so both engines replay it step-for-step:
    * Spark `aggregate` seeded with '' ≡ DuckDB `list_reduce` seeded
    * with the first element. A plain string replace of "x y" cannot
    * express this: on runs like "a a a a" the shared boundary space
    * makes replace yield [aa, a, a] where BPE requires [aa, aa]. */
  private def mergeFold(bx: String, by: String): String = s"""
    aggregate(split(sq, ' '), CAST('' AS STRING), (acc, s) ->
      CASE WHEN acc = '' THEN s
           WHEN element_at(split(acc, ' '), -1) = $bx AND s = $by
             THEN concat(left(acc, length(acc) - length($bx)), $bx, $by)
           ELSE concat(acc, ' ', s) END)"""

  /** Adjacent symbol pairs of the current sequences, weighted by word
    * frequency. Guarded: Spark's sequence(1, 0) DESCENDS, so
    * single-symbol words must short-circuit to an empty pair array. */
  private val pairsExpr = """
    CASE WHEN size(split(sq, ' ')) >= 2 THEN
      transform(sequence(1, size(split(sq, ' ')) - 1),
        i -> named_struct('x', element_at(split(sq, ' '), i),
                          'y', element_at(split(sq, ' '), i + 1)))
    ELSE CAST(array() AS ARRAY<STRUCT<x: STRING, y: STRING>>) END"""

  private def vocab(s: SparkSession, dir: String): DataFrame =
    Text.docToks(s, dir)
      .select(explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Run the merge loop; returns (merge table, final sequences). */
  private def train(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    var st = Tables.hot(vocab(s, dir).select(col("w"), col("freq"),
      concat_ws(" ", split(col("w"), "")).as("sq")))
    var bests = Seq.empty[DataFrame]
    for (k <- 1 to Rounds) {
      val best = Tables.hot(
        st.select(col("freq"), explode(expr(pairsExpr)).as("p"))
          .groupBy(col("p.x").as("bx"), col("p.y").as("by"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("bx"), col("by"))
          .limit(1))
      bests :+= best.select(lit(k).as("step"), col("bx").as("x"),
        col("by").as("y"), col("cnt"))
      st = Tables.hot(st.crossJoin(broadcast(best))
        .select(col("w"), col("freq"),
          expr(mergeFold("bx", "by")).as("sq")))
    }
    (bests.reduce(_ unionAll _).orderBy("step"), st)
  }

  /** The learned merge table: 6 rounds of (step, x, y, cnt). */
  def bpeTrain(s: SparkSession, dir: String): DataFrame =
    train(s, dir)._1

  /** Corpus encoded with the learned merges: per-source whitespace
    * token count, BPE token count, and BPE tokens per word. The encode
    * is ONE corpus explode + a shuffle hash join onto the merged
    * vocabulary — pinned off broadcast (text_unigram_lp rule: a real
    * vocabulary is unbounded at web scale) — + one aggregate. */
  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val seqs = train(s, dir)._2
      .select(col("w"), size(split(col("sq"), " ")).as("n_sym"))
    Text.docToks(s, dir)
      .select(col("source"), explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .join(seqs.hint("shuffle_hash"), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_bpe"),
        round(sum(col("n_sym")).cast("double") / count(lit(1)), 6)
          .as("bpe_per_word"))
      .orderBy("source")
  }

  // ---- byte-level variant --------------------------------------------
  /** Byte-level BPE — the form real tokenizers train (GPT-2/tiktoken
    * class: UTF-8 bytes as the base alphabet, so ANY string tokenizes
    * with no unknown symbols and multi-byte scripts merge across
    * character fragments). Base symbols are the word's UTF-8 bytes as
    * decimal strings (both engines derive them from the same hex dump);
    * merged symbols join with '.' so nested merges stay unambiguous
    * ("104.101" can never collide with a base byte). Same greedy
    * highest-count merge loop and leftmost-greedy fold as the
    * char-level trainer; reports tokens-per-BYTE next to
    * tokens-per-word — the number a byte-level tokenizer is actually
    * judged on (bytes, unlike "words", exist in every script). */
  private def mergeFoldByte(bx: String, by: String): String = s"""
    aggregate(split(sq, ' '), CAST('' AS STRING), (acc, s) ->
      CASE WHEN acc = '' THEN s
           WHEN element_at(split(acc, ' '), -1) = $bx AND s = $by
             THEN concat(left(acc, length(acc) - length($bx)),
                         $bx, '.', $by)
           ELSE concat(acc, ' ', s) END)"""

  private def trainBytes(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    var st = Tables.hot(vocab(s, dir)
      .withColumn("hx", hex(encode(col("w"), "UTF-8")))
      .select(col("w"), col("freq"), expr("""array_join(
          transform(sequence(1, length(hx) DIV 2),
            i -> conv(substring(hx, i * 2 - 1, 2), 16, 10)), ' ')""")
        .as("sq")))
    var bests = Seq.empty[DataFrame]
    for (k <- 1 to Rounds) {
      val best = Tables.hot(
        st.select(col("freq"), explode(expr(pairsExpr)).as("p"))
          .groupBy(col("p.x").as("bx"), col("p.y").as("by"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("bx"), col("by"))
          .limit(1))
      bests :+= best.select(lit(k).as("step"), col("bx").as("x"),
        col("by").as("y"), col("cnt"))
      st = Tables.hot(st.crossJoin(broadcast(best))
        .select(col("w"), col("freq"),
          expr(mergeFoldByte("bx", "by")).as("sq")))
    }
    (bests.reduce(_ unionAll _).orderBy("step"), st)
  }

  /** Corpus encoded with byte-level merges: whitespace-word count,
    * UTF-8 byte count, BPE token count, tokens per word AND per byte. */
  def bpeBytes(s: SparkSession, dir: String): DataFrame = {
    val seqs = trainBytes(s, dir)._2
      .select(col("w"), size(split(col("sq"), " ")).as("n_sym"),
        octet_length(col("w")).cast("long").as("n_b"))
    Text.docToks(s, dir)
      .select(col("source"), explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .join(seqs.hint("shuffle_hash"), "w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_b")).as("n_bytes"),
        sum(col("n_sym")).as("n_bpe"),
        round(sum(col("n_sym")).cast("double") / count(lit(1)), 6)
          .as("bpe_per_word"),
        round(sum(col("n_sym")).cast("double") / sum(col("n_b")), 6)
          .as("bpe_per_byte"))
      .orderBy("source")
  }

  private val vocabBytesSql = """
    vocab AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    seq0 AS (
      SELECT w, freq, array_to_string(list_transform(
          generate_series(1, len(hx) // 2),
          i -> CAST(CAST(('0x' || substr(hx, i * 2 - 1, 2)) AS UBIGINT)
                 AS VARCHAR)), ' ') AS sq
      FROM (SELECT w, freq, hex(encode(w)) AS hx FROM vocab))"""

  private def roundBytesSql(k: Int): String = s"""
    pairs$k AS (
      SELECT p.x AS x, p.y AS y, SUM(freq) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(
                 generate_series(1, len(string_split(sq, ' ')) - 1),
                 i -> struct_pack(x := string_split(sq, ' ')[i],
                                  y := string_split(sq, ' ')[i + 1]))) AS p
        FROM seq${k - 1})
      GROUP BY 1, 2),
    best$k AS (
      SELECT x, y, CAST(cnt AS BIGINT) AS cnt
      FROM pairs$k ORDER BY cnt DESC, x, y LIMIT 1),
    seq$k AS (
      SELECT w, freq,
             list_reduce(string_split(sq, ' '), (acc, s) ->
               CASE WHEN (string_split(acc, ' '))[-1] = b.x AND s = b.y
                    THEN left(acc, len(acc) - len(b.x)) || b.x || '.' || b.y
                    ELSE acc || ' ' || s END) AS sq
      FROM seq${k - 1}, best$k b)"""

  val bpeBytesSql: String = s"""
    WITH $vocabBytesSql,
    ${(1 to Rounds).map(roundBytesSql).mkString(",")},
    enc AS (
      SELECT w, len(string_split(sq, ' ')) AS n_sym,
             octet_length(encode(w)) AS n_b
      FROM seq$Rounds)
    SELECT d.source, COUNT(*) AS n_words,
           CAST(SUM(e.n_b) AS BIGINT) AS n_bytes,
           CAST(SUM(e.n_sym) AS BIGINT) AS n_bpe,
           ROUND(CAST(SUM(e.n_sym) AS DOUBLE) / COUNT(*), 6)
             AS bpe_per_word,
           ROUND(CAST(SUM(e.n_sym) AS DOUBLE) / SUM(e.n_b), 6)
             AS bpe_per_byte
    FROM (SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents) d
    JOIN enc e ON d.w = e.w
    WHERE d.w <> ''
    GROUP BY d.source ORDER BY d.source"""

  /** Tokenizer fertility per LANGUAGE — the multilingual-equity metric
    * (tokens-per-byte by lang, and parity = each language's fertility
    * over the corpus-best): a tokenizer that fragments one script
    * inflates that language's training cost and truncates its
    * effective context, so multilingual pipelines audit exactly this
    * table before freezing a tokenizer. Same byte-BPE encoder and
    * shuffle-hash join-back as text_bpe_bytes, regrouped by `lang`;
    * parity divides two identically-derived doubles (one IEEE divide,
    * rounded at 6 dp — both engines agree given equal inputs). */
  def textFertility(s: SparkSession, dir: String): DataFrame = {
    val seqs = trainBytes(s, dir)._2
      .select(col("w"), size(split(col("sq"), " ")).as("n_sym"),
        octet_length(col("w")).cast("long").as("n_b"))
    val per = Text.docToks(s, dir)
      .select(col("lang"), explode(col("toks")).as("w"))
      .filter(col("w") =!= "")
      .join(seqs.hint("shuffle_hash"), "w")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_b")).as("n_bytes"),
        sum(col("n_sym")).as("n_bpe"),
        // ratio of exact integer counts can land on a .xxxxxx5
        // boundary — quantize by floor(x·1e6 + 0.5) (pure IEEE,
        // engine-identical), never round() (the CLAUDE.md ROUND rule)
        (floor(sum(col("n_sym")).cast("double") / sum(col("n_b"))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("bpe_per_byte"))
    val best = broadcast(per.agg(min(col("bpe_per_byte")).as("best")))
    per.crossJoin(best)
      .select(col("lang"), col("n_words"), col("n_bytes"), col("n_bpe"),
        col("bpe_per_byte"),
        (floor(col("bpe_per_byte") / col("best") * lit(1e6) + lit(0.5))
          / lit(1e6)).as("parity"))
      .orderBy("lang")
  }

  val textFertilitySql: String = s"""
    WITH $vocabBytesSql,
    ${(1 to Rounds).map(roundBytesSql).mkString(",")},
    enc AS (
      SELECT w, len(string_split(sq, ' ')) AS n_sym,
             octet_length(encode(w)) AS n_b
      FROM seq$Rounds),
    per AS (
      SELECT d.lang, COUNT(*) AS n_words,
             CAST(SUM(e.n_b) AS BIGINT) AS n_bytes,
             CAST(SUM(e.n_sym) AS BIGINT) AS n_bpe,
             floor(CAST(SUM(e.n_sym) AS DOUBLE) / SUM(e.n_b) * 1e6 + 0.5)
               / 1e6 AS bpe_per_byte
      FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
            FROM documents) d
      JOIN enc e ON d.w = e.w
      WHERE d.w <> ''
      GROUP BY d.lang),
    best AS (SELECT MIN(bpe_per_byte) AS best FROM per)
    SELECT lang, n_words, n_bytes, n_bpe, bpe_per_byte,
           floor(bpe_per_byte / best * 1e6 + 0.5) / 1e6 AS parity
    FROM per, best ORDER BY lang"""

  // ---- oracle: the merge loop unrolled in SQL ------------------------

  private val vocabSql = """
    vocab AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w),
    seq0 AS (
      SELECT w, freq,
             array_to_string(regexp_split_to_array(w, ''), ' ') AS sq
      FROM vocab)"""

  private def roundSql(k: Int): String = s"""
    pairs$k AS (
      SELECT p.x AS x, p.y AS y, SUM(freq) AS cnt FROM (
        SELECT freq,
               unnest(list_transform(
                 generate_series(1, len(string_split(sq, ' ')) - 1),
                 i -> struct_pack(x := string_split(sq, ' ')[i],
                                  y := string_split(sq, ' ')[i + 1]))) AS p
        FROM seq${k - 1})
      GROUP BY 1, 2),
    best$k AS (
      SELECT x, y, CAST(cnt AS BIGINT) AS cnt
      FROM pairs$k ORDER BY cnt DESC, x, y LIMIT 1),
    seq$k AS (
      SELECT w, freq,
             list_reduce(string_split(sq, ' '), (acc, s) ->
               CASE WHEN (string_split(acc, ' '))[-1] = b.x AND s = b.y
                    THEN left(acc, len(acc) - len(b.x)) || b.x || b.y
                    ELSE acc || ' ' || s END) AS sq
      FROM seq${k - 1}, best$k b)"""

  val bpeTrainSql: String = s"""
    WITH $vocabSql,
    ${(1 to Rounds).map(roundSql).mkString(",")}
    SELECT * FROM (
      ${(1 to Rounds)
        .map(k => s"SELECT $k AS step, x, y, cnt FROM best$k")
        .mkString(" UNION ALL ")})
    ORDER BY step"""

  val bpeEncodeSql: String = s"""
    WITH $vocabSql,
    ${(1 to Rounds).map(roundSql).mkString(",")},
    enc AS (
      SELECT w, len(string_split(sq, ' ')) AS n_sym FROM seq$Rounds)
    SELECT d.source, COUNT(*) AS n_words,
           CAST(SUM(e.n_sym) AS BIGINT) AS n_bpe,
           ROUND(CAST(SUM(e.n_sym) AS DOUBLE) / COUNT(*), 6)
             AS bpe_per_word
    FROM (SELECT source, unnest(string_split(text, ' ')) AS w
          FROM documents) d
    JOIN enc e ON d.w = e.w
    WHERE d.w <> ''
    GROUP BY d.source ORDER BY d.source"""

  def all: Seq[QueryDef] = Seq(
    QueryDef("text_bpe_train", bpeTrain, Some(bpeTrainSql)),
    QueryDef("text_bpe_encode", bpeEncode, Some(bpeEncodeSql)),
    QueryDef("text_bpe_bytes", bpeBytes, Some(bpeBytesSql)),
    QueryDef("text_fertility", textFertility, Some(textFertilitySql)))
}
