package graft

import scala.collection.mutable

/** In-memory serial BFS — the test oracle (reference `BFS_serial.py`,
  * O21 in SURVEY.md §2.1; distances only, per hazard H5: the serial
  * reference's path construction is defective, the MR semantics are the
  * spec and are asserted structurally instead). */
object SerialBfsOracle {
  /** @param edges directed edge list (symmetrize before calling for
    *              undirected graphs)
    * @return vertex -> shortest hop distance from source (reached only) */
  def distances(edges: Seq[(Long, Long)], source: Long): Map[Long, Long] = {
    val adj = edges.groupMap(_._1)(_._2)
    val dist = mutable.Map(source -> 0L)
    val queue = mutable.Queue(source)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for (v <- adj.getOrElse(u, Nil) if !dist.contains(v)) {
        dist(v) = dist(u) + 1
        queue.enqueue(v)
      }
    }
    dist.toMap
  }
}
