package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Minimum spanning forest by Borůvka's algorithm — the MST/MSF shape
  * that parallelizes (Kruskal's union-find and Prim's frontier are
  * inherently sequential; Borůvka is the textbook distributed choice,
  * the same skeleton GraphX/Pregel formulations use).
  *
  * Per round, every component picks its minimum-weight outgoing edge
  * under the STRICT total order (weight, src, dst) — distinct
  * tie-break keys make the forest UNIQUE, so every correct MST
  * algorithm (including the spec's serial Kruskal and the gate's
  * relational Kruskal-rule oracle) lands on the identical edge set.
  * Chosen edges join the forest; their endpoint components merge
  * (connected components over the CHOSEN edge graph — a frame with at
  * most one edge per component, on component ids, i.e. a structure
  * that at least HALVES in size every round); vertices relabel
  * through the merged roots. Components at least halve per round →
  * ≤ log₂ V rounds regardless of diameter.
  *
  * 100 TB design: the only full-size work per round is
  * edges ⋈ labels (2 hash joins against the persisted, pre-
  * repartitioned edge table — the [[Bfs]] loop shape); the per-round
  * contraction runs on the component graph, whose size is bounded by
  * the CURRENT component count, not |V| or |E|. Never all-pairs,
  * never a driver-side collect; the loop keeps the house discipline
  * (eager localCheckpoint per round, superseded frames released
  * in-loop, AQE off inside the loop, per-round stderr telemetry).
  *
  * Capability extension over the reference (no spanning-tree
  * machinery exists there — its graph surface is BFS only,
  * `BFS_map_reduce.py:115-150`); same BSP semilattice family: the
  * per-component argmin here is O11/O12's min-reduce with a
  * different key.
  */
object SpanningForest {

  /** @param edges undirected weighted edges (`src`, `dst`, `weight`)
    *              — one row per direction or per unordered pair, both
    *              accepted (canonicalized to src < dst, parallel
    *              edges keep the lightest).
    * @return the unique MSF under (weight, src, dst): columns
    *         (`src`, `dst`, `weight`), src < dst.
    * @throws IllegalStateException if `maxRounds` is exhausted —
    *         returning a partial forest would silently under-span. */
  def boruvka(edges: DataFrame, maxRounds: Int = 40,
              keepAqe: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    GraphOps.withLoopAqeDisabled(spark, keepAqe) {
      runLoop(edges, maxRounds)
    }
  }

  private def runLoop(edges: DataFrame, maxRounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical undirected edge set: src < dst, lightest parallel edge
    val e0 = edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("src"),
        greatest($"src", $"dst").as("dst"), $"weight")
      .groupBy($"src", $"dst").agg(min($"weight").as("weight"))
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    var comp = GraphOps.vertices(e0)
      .select($"id", $"id".as("comp"))
      .localCheckpoint(true)
    var forest = e0.limit(0).select($"src", $"dst", $"weight")
      .localCheckpoint(true)

    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val tRound = System.nanoTime()
      // label endpoints with their current components; cross-component
      // edges are the only candidates
      val lab = e0.as("e")
        .join(comp.as("cs"), col("e.src") === col("cs.id"))
        .join(comp.as("cd"), col("e.dst") === col("cd.id"))
        .select(col("e.src"), col("e.dst"), col("e.weight"),
          col("cs.comp").as("cs"), col("cd.comp").as("cd"))
        .filter($"cs" =!= $"cd")
      // per-component argmin outgoing edge under (weight, src, dst) —
      // struct-min is the O12 argmin; distinct because an edge is
      // legitimately chosen by BOTH its endpoint components
      val chosen = lab
        .select(explode(array($"cs", $"cd")).as("c"),
          struct($"weight", $"src", $"dst", $"cs", $"cd").as("e"))
        .groupBy($"c").agg(min($"e").as("e"))
        .select(col("e.weight"), col("e.src"), col("e.dst"),
          col("e.cs"), col("e.cd"))
        .distinct()
        .localCheckpoint(true)
      val nChosen = chosen.count()
      if (nChosen == 0) {
        done = true
        GraphOps.releaseCheckpointedFrame(chosen)
      } else {
        val newForest = forest
          .union(chosen.select($"src", $"dst", $"weight"))
          .localCheckpoint(true)
        GraphOps.releaseCheckpointedFrame(forest)
        forest = newForest
        // contract: components of the CHOSEN edge graph (vertices =
        // component ids, ≤ 1 chosen edge per component). Min-label
        // propagation needs symmetric edges; keepAqe — already inside
        // the outer loop's AQE scope.
        val compEdges = chosen.select($"cs".as("src"), $"cd".as("dst"))
        val roots = ConnectedComponents.run(
          compEdges.union(compEdges.select($"dst".as("src"), $"src".as("dst"))),
          keepAqe = true)
        val newComp = comp.as("c")
          .join(roots.as("r"), col("c.comp") === col("r.id"), "left")
          .select(col("c.id"),
            coalesce(col("r.comp"), col("c.comp")).as("comp"))
          .localCheckpoint(true)
        GraphOps.releaseCheckpointedFrame(comp)
        GraphOps.releaseCheckpointedFrame(chosen)
        GraphOps.releaseCheckpointedFrame(roots)
        comp = newComp
      }
      System.err.println(
        f"[msf] round $round chosen=$nChosen ${(System.nanoTime() - tRound) / 1e9}%.2fs")
    }
    e0.unpersist(false)
    GraphOps.releaseCheckpointedFrame(comp)
    if (!done) throw new IllegalStateException(
      s"Borůvka did not converge in $maxRounds rounds — components " +
        "must at least halve per round, so this indicates a broken " +
        "contraction, not a deep graph")
    forest
  }
}
