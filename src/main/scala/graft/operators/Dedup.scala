package graft.operators

import graft.functions.{SimHash64, TextFunctions}
import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * scalability order:
  *
  *  1. exact       — hash/group on content: one shuffle, fully scalable;
  *  2. simhash     — 64-bit fingerprint + group-by: one shuffle, scalable,
  *                   catches near-dups that differ in few tokens;
  *  3. minhash LSH — banding via MLlib MinHashLSH: shuffles per hash table,
  *                   candidate pairs only — the 100 TB near-dup path;
  *  4. pairwise Jaccard — exact O(n²) token-set comparison: ONLY for
  *                   small/blocked candidate sets (we use it both as the
  *                   oracle-checkable reference semantics and as the
  *                   verifier for LSH recall).
  */
object Dedup {

  /** Exact dedup: deterministic keep-lowest-id per distinct `col`.
    * Equivalent to Hive's row_number-over-partition idiom; at scale this is
    * one hash shuffle on the dedup key. */
  def exactDedup(df: DataFrame, col: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(df(col)).orderBy(df(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(expr("__rn = 1"))
      .drop("__rn")
  }

  /** All near-duplicate pairs (id1 < id2) with token-set Jaccard ≥
    * `threshold`. O(n²) in the candidate set — caller must pre-block. */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"doc_id",
      TextFunctions.tokenSet($"text").as("t"))
    val a = toks.select($"doc_id".as("id1"), $"t".as("t1"))
    val b = toks.select($"doc_id".as("id2"), $"t".as("t2"))
    val inter = size(array_intersect($"t1", $"t2")).cast("double")
    a.join(b, $"id1" < $"id2")
      .withColumn("j", inter / (size($"t1") + size($"t2")
        - size(array_intersect($"t1", $"t2"))))
      .filter($"j" >= threshold)
      .select($"id1", $"id2", round($"j", 6).as("j"))
  }

  /** SimHash near-dup grouping: fingerprint every doc, group identical
    * fingerprints. One projection + one shuffle — the cheapest near-dup
    * signal at scale. */
  def simhashGroups(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    SimHash64.register(spark)
    docs.select($"doc_id", $"text")
      .withColumn("toks", TextFunctions.tokenSet($"text"))
      .withColumn("fp", expr("simhash64(toks)"))
  }

  /** MinHash-LSH candidate pairs at Jaccard distance ≤ `maxDistance`:
    * shingle → binary HashingTF vector → banded minhash join. Seeded, so
    * results are deterministic. This is the scale path: candidate
    * generation is linear in docs × hash tables. */
  def minhashCandidates(docs: DataFrame, maxDistance: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"doc_id", TextFunctions.tokenSet($"text").as("toks"))
      .filter(size($"toks") > 0)
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(1 << 14).setBinary(true)
    val feat = tf.transform(toks)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("bands")
      .setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(feat)
    model.approxSimilarityJoin(feat, feat, maxDistance, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("id1"),
        col("datasetB.doc_id").as("id2"),
        round(col("jaccard_dist"), 6).as("jaccard_dist"))
      .filter(col("id1") < col("id2"))
  }
}
