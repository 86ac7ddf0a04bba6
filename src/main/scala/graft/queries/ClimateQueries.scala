package graft.queries

object ClimateQueries extends QueryGroup {
  def queries: Seq[Q] = Seq()
}
