package graft

import graft.queries._

/** Central inventory of all verifiable operator demonstrations.
  * SparkEntry / Verify / Bench all derive from this single list.
  */
object Registry {
  def all: Seq[QueryDef] =
    AggQueries.defs ++
    JoinQueries.defs ++
    OverQueries.defs ++
    SetQueries.defs ++
    WindowTvfQueries.defs ++
    CalcQueries.defs ++
    FuncQueries.defs ++
    FuncQueries2.defs ++
    TextDedupQueries.defs ++
    AnnQueries.defs ++
    TextAnalysisQueries.defs ++
    SamplingPackQueries.defs ++
    CdcFormatQueries.defs ++
    CdcAggQueries.defs ++
    CdcJoinQueries.defs ++
    CepQueries.defs ++
    UdfQueries.defs ++
    TpchQueries.defs ++
    TpcdsQueries.defs ++
    TpcdsQueries2.defs ++
    TpcdsTwinQueries.defs ++
    TpcdsTwinQueries2.defs ++
    BpeQueries.defs ++
    GraphQueries.defs ++
    AnalyticsQueries.defs ++
    CurationQueries.defs ++
    ClassifierQueries.defs ++
    ClusterQueries.defs

  lazy val byName: Map[String, QueryDef] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }
}
