package graft.operators

import scala.collection.mutable

/** Serial in-memory BFS — the reference's comparison baseline
  * (`BFS_serial.py:12-29`, O21 in SURVEY.md §2.1), with its path defect
  * fixed: the reference's serial path construction appends the parent
  * AND the parent's whole path onto `[source]` (`BFS_serial.py:26-27`,
  * hazard H5); the MapReduce semantics (path = parent path ++ [child],
  * `BFS_map_reduce.py:31-35`) are the spec and are what this computes.
  *
  * Neighbours are expanded in ascending order, which makes the
  * first-discovery path the lexicographically-smallest shortest path —
  * exactly [[Bfs]]'s deterministic `min(struct(dist, path))` semantics,
  * so the two implementations are directly comparable (and the test
  * suite does).
  *
  * Not a Spark operator: this is the single-process baseline the
  * reference ships as its own entry point, and the property-test oracle
  * for the distributed engine.
  */
object SerialBfs {

  /** @param edges directed edge list (symmetrize for undirected)
    * @return vertex -> (distance, path source..v inclusive), reached
    *         vertices only */
  def run(edges: Seq[(Long, Long)], source: Long): Map[Long, (Long, Vector[Long])] = {
    val adj = edges.groupMap(_._1)(_._2).view.mapValues(_.sorted).toMap
    val result = mutable.Map(source -> (0L, Vector(source)))
    val queue = mutable.Queue(source)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      val (du, pu) = result(u)
      for (v <- adj.getOrElse(u, Nil) if !result.contains(v)) {
        result(v) = (du + 1, pu :+ v)
        queue.enqueue(v)
      }
    }
    result.toMap
  }

  /** Distances only (the reference's observable output — it prints
    * timing and holds state in memory; `BFS_serial.py:31-33`). */
  def distances(edges: Seq[(Long, Long)], source: Long): Map[Long, Long] =
    run(edges, source).view.mapValues(_._1).toMap
}
