package graft.queries

object DslQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
