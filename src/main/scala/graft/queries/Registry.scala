package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator demonstration: a Spark query over the driver test data plus
  * (optionally) the equivalent ANSI SQL the driver runs in DuckDB.
  * Column names/order must match between the two (the driver sorts columns
  * by name before hashing values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def queries: Seq[Q]
}

object Registry {
  def groups: Seq[QueryGroup] = Seq(
    RelationalQueries,
    WindowQueries,
    ResampleQueries,
    InterpQueries,
    ClimateQueries,
    DslQueries,
    PipelineQueries,
    TextQueries,
    SimilarityQueries,
    AlignQueries,
    DiscoveryQueries,
    ClusterQueries,
    AnalyticsQueries,
    SamplingQueries,
    ScaleQueries,
    CorpusQueries,
    RetrievalQueries,
    AssemblyQueries,
    PcaQueries,
    CmorQueries,
    MediaQueries,
    EvalQueries,
    GraphQueries,
    ComposedQueries)

  lazy val all: Seq[Q] = groups.flatMap(_.queries)

  lazy val runMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
