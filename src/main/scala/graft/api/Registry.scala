package graft.api

/** All engine queries, in stable declaration order. */
object Registry {
  def all: Seq[QueryDef] =
    graft.queries.CoreParityQueries.defs ++
      graft.queries.Relational.defs ++
      graft.queries.RelationalExt.defs ++
      graft.queries.RelationalMore.defs ++
      graft.queries.RelationalScale.defs ++
      graft.queries.RelationalAnalytics.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.PipelineExt.defs ++
      graft.queries.PipelineMore.defs ++
      graft.queries.PipelineRecent.defs ++
      graft.queries.PipelineLatest.defs ++
      graft.queries.PipelineE2e.defs

  lazy val byName: Map[String, QueryDef] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    all.map(q => q.name -> q).toMap
  }
}
