package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-health additions (r14). */
object Corpus2Ops extends QueryPack {

  private val dec9 = DecimalType(28, 9)

  // ---- q_entropy_rate ------------------------------------------------------
  /** Character-level entropy rate per source (Shannon '51's estimate at
    * bigram order): unigram entropy H1, bigram entropy H2, and the
    * conditional rate H(c₂|c₁) = H2 − H1 over the first 64 characters
    * of every document — the CHARACTER-side complement of q_entropy's
    * token diversity: a source whose rate collapses is template/markup
    * spam even when its token vocabulary looks healthy, and a rate near
    * the uniform bound is noise/obfuscation. Characters come from a
    * position spine (substr at i — the engine-portable form; the
    * fixture is ASCII so bytes ≡ chars in both engines, the
    * q_frame_sample precedent); −p·ln p terms round once to 9dp into
    * exact decimal sums (the q_kl_sources ln discipline). Scale: cost
    * is docs × 64 positions; the entropy aggregates are
    * (source, gram)-keyed — fully partial-aggregable. */
  def qEntropyRate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val chars = Tables.df(spark, sfDir, "documents")
      .select($"source", $"text",
        explode(sequence(lit(1), lit(64))).as("i"))
      .filter(length($"text") >= $"i")
      .select($"source", $"i", $"text",
        substring($"text", 1, 64).as("head"))
      .select($"source", $"i",
        expr("substr(head, i, 1)").as("c1"),
        when(expr("i < 64 AND length(head) >= i + 1"),
          expr("substr(head, i, 2)")).as("c2"))
      .localCheckpoint() // unigram + bigram aggregations
    def entropy(df: DataFrame, col: String): DataFrame = {
      val cnt = df.filter(org.apache.spark.sql.functions.col(col).isNotNull)
        .groupBy($"source", org.apache.spark.sql.functions.col(col))
        .agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy($"source").agg(sum($"c").as("tn"),
        count(lit(1)).as("vocab"))
      cnt.join(tot, "source")
        .select($"source", $"tn", $"vocab",
          round(($"c".cast("double") / $"tn")
            * log($"c".cast("double") / $"tn"), 9).cast(dec9).as("tm"))
        .groupBy($"source", $"tn", $"vocab")
        .agg((-sum($"tm").cast("double")).as("h"))
    }
    val h1 = entropy(chars, "c1")
      .select($"source", $"tn".as("n_chars"), $"vocab".as("vocab_chars"),
        $"h".as("h1r"))
    val h2 = entropy(chars, "c2")
      .select($"source".as("s2"), $"vocab".as("vocab_bigrams"),
        $"h".as("h2r"))
    h1.join(h2, $"source" === $"s2")
      .select($"source", $"n_chars", $"vocab_chars", $"vocab_bigrams",
        round($"h1r", 6).as("h1"),
        round($"h2r", 6).as("h2"),
        round($"h2r" - $"h1r", 6).as("h_rate"))
      .orderBy($"source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entropy_rate" -> qEntropyRate
  )

  val oracle: Map[String, String] = Map(
    // same position spine, same 9dp -p ln p terms, same h2 - h1 rate
    "q_entropy_rate" ->
      """WITH pos AS (
        |  SELECT source, substr(text, 1, 64) AS head,
        |    CAST(unnest(range(1, 65)) AS INT) AS i, length(text) AS L
        |  FROM documents),
        |chars AS (
        |  SELECT source, i, substr(head, i, 1) AS c1,
        |    CASE WHEN i < 64 AND length(head) >= i + 1
        |      THEN substr(head, i, 2) END AS c2
        |  FROM pos WHERE L >= i),
        |u1 AS (
        |  SELECT source, c1 AS g, count(*) AS c FROM chars
        |  WHERE c1 IS NOT NULL GROUP BY 1, 2),
        |t1 AS (SELECT source, CAST(sum(c) AS BIGINT) AS tn,
        |       count(*) AS vocab FROM u1 GROUP BY 1),
        |h1 AS (
        |  SELECT u1.source, t1.tn, t1.vocab,
        |    -CAST(sum(CAST(round((CAST(c AS DOUBLE) / tn)
        |      * ln(CAST(c AS DOUBLE) / tn), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS h
        |  FROM u1 JOIN t1 ON t1.source = u1.source
        |  GROUP BY 1, 2, 3),
        |u2 AS (
        |  SELECT source, c2 AS g, count(*) AS c FROM chars
        |  WHERE c2 IS NOT NULL GROUP BY 1, 2),
        |t2 AS (SELECT source, CAST(sum(c) AS BIGINT) AS tn,
        |       count(*) AS vocab FROM u2 GROUP BY 1),
        |h2 AS (
        |  SELECT u2.source, t2.vocab,
        |    -CAST(sum(CAST(round((CAST(c AS DOUBLE) / tn)
        |      * ln(CAST(c AS DOUBLE) / tn), 9) AS DECIMAL(28,9)))
        |      AS DOUBLE) AS h
        |  FROM u2 JOIN t2 ON t2.source = u2.source
        |  GROUP BY 1, 2)
        |SELECT h1.source, h1.tn AS n_chars, h1.vocab AS vocab_chars,
        |  h2.vocab AS vocab_bigrams,
        |  round(h1.h, 6) AS h1, round(h2.h, 6) AS h2,
        |  round(h2.h - h1.h, 6) AS h_rate
        |FROM h1 JOIN h2 ON h2.source = h1.source
        |ORDER BY h1.source""".stripMargin
  )
}
