package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Gates the r18 release contract: `releaseCheckpointedFrame` accepts
  * ONLY flat checkpoint handles. The hazard it makes impossible: the
  * old deep-sweep unpersisted EVERY LogicalRDD in a frame's analyzed
  * plan, so releasing a frame DERIVED from a live checkpoint freed the
  * PARENT's blocks mid-query (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — hit
  * in RandomWalk during the r17 loop-residency sweep). */
class ReleaseContractSpec extends AnyFunSuite with SparkTestBase {

  test("refuses a frame derived from a checkpoint; parent stays alive") {
    val base = spark.range(0, 10).toDF("id").localCheckpoint(true)
    val derived = base.filter(col("id") > 3)
    val ex = intercept[IllegalArgumentException] {
      GraphOps.releaseCheckpointedFrame(derived)
    }
    assert(ex.getMessage.contains("flat checkpoint"))
    // the refusal left the parent's blocks untouched: both frames
    // still evaluate (the old sweep would have freed base.rdd here)
    assert(derived.count() == 6L)
    assert(base.count() == 10L)
    GraphOps.releaseCheckpointedFrame(base)
  }

  test("refuses a plain persisted (non-checkpoint) frame") {
    val cached = spark.range(0, 5).toDF("id").persist()
    try intercept[IllegalArgumentException] {
      GraphOps.releaseCheckpointedFrame(cached)
    } finally cached.unpersist(true)
  }

  test("releases a flat checkpoint handle's blocks") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ckpt = spark.range(0, 8).toDF("id").localCheckpoint(true)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "localCheckpoint should register blocks")
    GraphOps.releaseCheckpointedFrame(ckpt, blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((added -- after) == added, "checkpoint blocks must be freed")
  }

  test("isFlatCheckpoint discriminates handle vs derived vs raw") {
    val ckpt = spark.range(0, 4).toDF("id").localCheckpoint(true)
    assert(GraphOps.isFlatCheckpoint(ckpt))
    assert(!GraphOps.isFlatCheckpoint(ckpt.select(col("id") + 1)))
    assert(!GraphOps.isFlatCheckpoint(spark.range(0, 4).toDF("id")))
    GraphOps.releaseCheckpointedFrame(ckpt)
  }
}
