package graft.queries

import graft.Tables
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding similarity search + multimodal column plumbing over the
  * `embeddings` and `documents` fixtures. */
object VectorQueries extends QueryPack {

  /** Exact top-10 cosine neighbors for every vec_id % 100 query vector
    * (oracle: DuckDB list_cosine_similarity). */
  def qKnnCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.df(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 100 === 0)
    Similarity.knnBruteForce(emb, queries, 10)
      .orderBy($"qid", $"rank")
  }

  /** LSH-bucketed approximate neighbors (rows-only: bucket boundaries are
    * seed-dependent; recall vs brute force is unit-tested). */
  def qAnnLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.df(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 100 === 0)
    Similarity.annLshCandidates(emb, queries, 1.5)
      .orderBy($"qid", $"vec_id")
  }

  /** Multimodal pipeline: binary payload + metadata → partition-parallel
    * decode (stubbed codec) → typed features. Metadata/byte features are
    * oracle-checkable because the stub is a pure function of the bytes. */
  def qMultimodal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.asMediaTable(Tables.df(spark, sfDir, "documents"))
    Multimodal.decodeFeatures(media).toDF()
      .orderBy($"doc_id")
  }

  /** IVF-cell ANN top-k (rows-only: cell assignment depends on xxhash64
    * centroid sampling; recall vs brute force is unit-tested). */
  def qAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.df(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 100 === 0)
    Similarity.ivfTopK(emb, queries, k = 10)
      .orderBy($"qid", $"rank")
  }

  /** Frame sampling over the media table (video-pipeline UDTF shape):
    * 4 evenly-spaced payload slices per doc, boundary-byte stats — fully
    * oracle-checkable because the stub slicing is pure byte arithmetic
    * and the fixture text is ASCII (bytes ≡ chars for DuckDB substr). */
  def qFrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = Multimodal.asMediaTable(
      Tables.df(spark, sfDir, "documents").filter($"doc_id" % 25 === 0))
    Multimodal.frameSample(media, 4).toDF()
      .orderBy($"doc_id", $"frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_cosine" -> qKnnCosine,
    "q_ann_lsh" -> qAnnLsh,
    "q_ann_ivf" -> qAnnIvf,
    "q_multimodal" -> qMultimodal,
    "q_frame_sample" -> qFrameSample
  )

  val oracle: Map[String, String] = Map(
    "q_knn_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id % 100 = 0),
        |p AS (
        |  SELECT q.qid, e.vec_id,
        |    round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
        |      CAST(e.embedding AS DOUBLE[])), 6) AS sim
        |  FROM q JOIN embeddings e ON e.vec_id != q.qid),
        |r AS (
        |  SELECT qid, vec_id, sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC)
        |      AS rank
        |  FROM p)
        |SELECT qid, vec_id, sim, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id, 'text/plain' AS mime,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  ascii(substr(text, 1, 1)) AS first_byte,
        |  ascii(substr(text, length(text), 1)) AS last_byte,
        |  round(CAST(list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split(text, ''),
        |          ch -> CAST(ascii(ch) AS BIGINT))),
        |      (a, b) -> a + b) AS DOUBLE)
        |    / octet_length(encode(text)), 6) AS byte_mean
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_frame_sample" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS L
        |  FROM documents WHERE doc_id % 25 = 0),
        |f AS (
        |  SELECT doc_id, text, L, unnest(range(0, 4)) AS fi FROM d),
        |b AS (
        |  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |    CAST(fi * L // 4 AS INT) AS lo,
        |    CAST((fi + 1) * L // 4 AS INT) AS hi, text
        |  FROM f)
        |SELECT doc_id, frame_idx, hi - lo AS f_len,
        |  ascii(substr(text, lo + 1, 1)) AS f_first,
        |  ascii(substr(text, hi, 1)) AS f_last
        |FROM b WHERE hi > lo
        |ORDER BY doc_id, frame_idx""".stripMargin
    // q_ann_lsh: rows-only (seeded LSH bucketing)
  )
}
