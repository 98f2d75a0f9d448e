package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation: every
  * vertex starts labeled with its own id; each round a vertex adopts
  * the minimum label among itself and its neighbours; at fixpoint the
  * label is the minimum vertex id of the component.
  *
  * A capability extension over the reference (same BSP semilattice
  * machinery as its BFS — `BFS_map_reduce.py:115-150` — with min-label
  * instead of min-dist; multi-source init instead of single-source).
  *
  * Round structure mirrors [[Bfs.run]]: ONE shuffle per round
  * (`labels ∪ propagated → groupBy(id).min`), eager localCheckpoint to
  * truncate lineage, and convergence detected WITHOUT a compare-join:
  * labels only ever decrease, so the fixpoint is reached exactly when
  * `sum(label)` stops changing — one cheap aggregate action per round.
  *
  * Rounds = O(max component diameter). For the adversarial long-path
  * case the classic fix is large-star/small-star (doubling rounds);
  * for the bounded-diameter graphs this engine targets, plain
  * propagation with per-round checkpointing is faster in practice.
  */
object ConnectedComponents {

  /** @param edges DIRECTED edge table (`src`, `dst`); symmetrize for
    *              undirected semantics (a one-directional edge still
    *              merges components, just over more rounds undirected).
    * @return DataFrame(id LONG, comp LONG) — comp = min vertex id of
    *         the component. */
  def run(edges: DataFrame, maxIterations: Int = 100,
          keepAqe: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    GraphOps.withLoopAqeDisabled(spark, keepAqe) {
      runLoop(edges, maxIterations)
    }
  }

  private def runLoop(edges: DataFrame, maxIterations: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select($"src", $"dst")
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = GraphOps.vertices(e)
      .select($"id", $"id".as("comp"))
      .localCheckpoint(true)

    // sum() of an empty frame is null — an empty edge table has no
    // vertices and is already converged. Decimal sum: a Long sum of
    // ~1e9 vertex ids around 1e10 overflows (ANSI crash under Spark 4
    // defaults); decimal(38) is exact at any realistic scale.
    def checksumOf(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(sum($"comp".cast("decimal(38,0)"))).head()
      if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
    }
    var checksum = checksumOf(labels)
    if (labels.isEmpty) { e.unpersist(false); return labels }
    var converged = false
    var iter = 0
    val toRelease = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    while (!converged && iter < maxIterations) {
      iter += 1
      // propagate: each edge offers its src's label to its dst
      val offers = labels.as("l").join(e.as("e"), col("l.id") === col("e.src"))
        .select(col("e.dst").as("id"), col("l.comp").as("comp"))
      val merged = labels.union(offers)
        .groupBy($"id").agg(min($"comp").as("comp"))
        .localCheckpoint(true)

      val newChecksum = checksumOf(merged)
      converged = newChecksum.compareTo(checksum) == 0
      checksum = newChecksum
      toRelease += labels
      labels = merged
    }
    toRelease.foreach(_.unpersist(false))
    e.unpersist(false)
    labels
  }
}
