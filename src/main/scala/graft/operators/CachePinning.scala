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
  * Thread-safe: pins land in a concurrent queue; concurrent release
  * and pin interleave safely (a frame pinned during a release is
  * either drained now or released next time).
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
}
