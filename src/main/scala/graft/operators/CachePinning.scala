package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Cache-lifetime tracking for operator families that persist
  * intermediate DataFrames (quantized embeddings, signature
  * projections) feeding multiple join sides of one returned query.
  *
  * The returned query needs those persists alive until the caller
  * materializes it, so the operator cannot unpersist eagerly; but a
  * long-lived application issuing many calls should not have to fall
  * back to `spark.catalog.clearCache()` (which drops EVERY cached
  * relation in the session) or LRU pressure. Mixing this in gives each
  * operator object a `releaseCaches()` the caller invokes after
  * materializing a query's result: it unpersists exactly the frames
  * that object pinned since the last release, nothing else.
  *
  * Thread-safe mechanically (pins land in a concurrent queue;
  * concurrent release and pin interleave without corruption), but the
  * release SEMANTICS assume serialized query issuance per operator
  * object: pins live on the singleton (Dedup, Similarity, CorpusOps),
  * so thread A's post-materialization release also drains pins backing
  * thread B's not-yet-materialized query — B silently reverts to full
  * recomputation (correct, but re-pays the per-row cost the persist
  * exists to avoid). Applications issuing these operators concurrently
  * should materialize results before the next call, or skip
  * releaseCaches and rely on storage-level LRU eviction.
  *
  * Callers that never invoke releaseCaches leak strong DataFrame
  * references into the queue (block storage still frees via LRU or
  * `clearCache()`, but the plan objects stay driver-resident) — the
  * graft harnesses (Bench, Verify) drain it after every query.
  */
private[graft] trait CachePinning {

  private val pins = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and remember the handle for [[releaseCaches]]. */
  protected def pin(df: DataFrame): DataFrame = {
    val p = df.persist()
    pins.add(p)
    p
  }

  /** Unpersist every DataFrame this operator family persisted since
    * the last release. Call after materializing the query result —
    * results already collected/written are unaffected. `blocking`
    * forces synchronous block removal (useful before timing runs). */
  def releaseCaches(blocking: Boolean = false): Unit = {
    var d = pins.poll()
    while (d != null) {
      d.unpersist(blocking)
      d = pins.poll()
    }
  }

  /** Pins registered and not yet released — test/diagnostic surface
    * (CachePinningSpec asserts the harness drain leaves this at 0).
    *
    * On the queue's strong references: they are NOT the retention
    * root — Spark's CacheManager itself holds every persisted plan
    * strongly until unpersist, so a WeakReference queue would not free
    * anything; it would only lose the handle needed to unpersist after
    * a GC, making the leak permanent. Strong refs + an explicit drain
    * is the correct shape. */
  private[graft] def pinnedCount: Int = pins.size()
}
