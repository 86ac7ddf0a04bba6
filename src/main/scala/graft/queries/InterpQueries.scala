package graft.queries

object InterpQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
