package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented query pack (one pack per SURVEY.md §2
  * category) into the flat `queries` / `oracleSql` maps the driver's
  * Verify/Bench harness consumes.
  */
object SparkEntry {

  /** All implemented packs. Order is irrelevant; names must be unique. */
  private val packs: Seq[QueryPack] = Seq(
    Relational,
    Joins,
    SetOps,
    Aggregates,
    Windows,
    Functions,
    Lateral,
    TextOps,
    VectorQueries,
    EventOps,
    SourceOps,
    TpchMore,
    TpchFull,
    Pivot,
    FnExtra,
    SubqueryNulls,
    Analytics,
    Typed,
    PipelineOps,
    LearnOps,
    GraphOps,
    SketchOps,
    CorpusOps,
    StatsOps,
    CurateOps,
    GovernOps,
    InferOps,
    NonparamOps,
    DecisionOps,
    SeriesOps,
    Series2Ops,
    Vector2Ops,
    SqlSurface2,
    Corpus2Ops,
    Stats2Ops,
    Stats3Ops,
    EvalOps,
    XModalOps,
    ValueOps,
    ServeOps
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = packs.flatMap(_.queries)
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate query names across packs: ${dups.mkString(", ")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
