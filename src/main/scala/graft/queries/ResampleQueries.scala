package graft.queries

object ResampleQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
