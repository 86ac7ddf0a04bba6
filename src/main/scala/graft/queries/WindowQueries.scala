package graft.queries

object WindowQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
