package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an `array<float>` embedding column.
  *
  *  - Brute-force top-k cosine: exact, O(|queries| × |corpus|) — correct
  *    baseline, oracle-checkable, and still the right choice when the
  *    query set is small (broadcast the queries, scan the corpus once).
  *  - Bucketed random-projection LSH: approximate, candidates only meet
  *    inside matching buckets — the scale path when both sides are large.
  *
  * An IVF-style variant falls out of the LSH shape (cluster → join on
  * cluster id); at 100 TB the corpus side stays partitioned and only the
  * query side is broadcast, so no all-to-all shuffle ever happens.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector (self excluded).
    * Ranking is on round(cos, 6) with id tie-break so results are
    * engine-portable; the query side should be small (it is broadcast). */
  def knnBruteForce(embeddings: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // codegen'd native expression; bit-identical to VectorFunctions.cosineSim
    // (asserted in CosineSpec) but ~BLAS-loop-shaped in generated code
    graft.functions.CosineSimilarity.register(spark)
    val q = queries.select($"vec_id".as("qid"), $"embedding".as("qv"))
    val pairs = embeddings.join(broadcast(q), $"vec_id" =!= $"qid")
      .withColumn("sim",
        round(expr("cosine_similarity(qv, embedding)"), 6))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"qid", $"vec_id", $"sim", $"rank")
  }

  /** Approximate neighbor candidate pairs within `radius` (euclidean),
    * via seeded random-projection LSH buckets. */
  def annLshCandidates(embeddings: DataFrame, queries: DataFrame,
      radius: Double): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val corpus = embeddings
      .withColumn("fv", array_to_vector($"embedding"))
    val qs = queries
      .withColumn("fv", array_to_vector($"embedding"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("fv").setOutputCol("buckets")
      .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
    val model = lsh.fit(corpus)
    model.approxSimilarityJoin(qs, corpus, radius, "dist")
      .select(
        col("datasetA.vec_id").as("qid"),
        col("datasetB.vec_id").as("vec_id"),
        round(col("dist"), 6).as("dist"))
      .filter(col("qid") =!= col("vec_id"))
  }
}
