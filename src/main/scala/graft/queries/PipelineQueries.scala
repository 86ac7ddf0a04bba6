package graft.queries

object PipelineQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
