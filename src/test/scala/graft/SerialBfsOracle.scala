package graft

/** Test-scope alias for the in-library serial baseline
  * ([[graft.operators.SerialBfs]]) — kept so specs read as
  * "engine vs oracle". */
object SerialBfsOracle {
  def distances(edges: Seq[(Long, Long)], source: Long): Map[Long, Long] =
    graft.operators.SerialBfs.distances(edges, source)
}
