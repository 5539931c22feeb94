package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed connected components by iterative min-label
  * propagation — the GraphX-free CC shared by every near-dup
  * clustering operator (q54 text clusters, q73 embedding clusters).
  * Each round is one join + min-aggregation, converging in
  * graph-diameter rounds; near-dup components are clique-like, so 2-3
  * rounds in practice. The driver loop carries only a scalar
  * convergence witness per round — labels never leave the cluster.
  *
  * `reliable = false` (default / bench): each round truncates lineage
  * with `localCheckpoint` — fastest, but the materialized label blocks
  * live only on executors and are NOT recomputable on executor loss.
  * `reliable = true`: rounds checkpoint to the session's checkpoint
  * directory (`sparkContext.setCheckpointDir`, shared storage on a
  * cluster — REQUIRED before calling, else this fails fast) — one
  * write+read of the skinny label frame per round buys survival of any
  * executor loss, the durability a long many-round run on a
  * 1000-executor cluster needs. Checkpoint files are left for the
  * directory owner to reap (Spark only auto-cleans them with
  * spark.cleaner.referenceTracking.cleanCheckpoints=true).
  */
private[operators] object Components {

  /** The previous invocation's converged frames (per caller key): the
    * returned DataFrame reads the label frame lazily, so it must stay
    * persisted until the NEXT invocation under the same key replaces
    * it — without this, repeated runs (bench min-of-3) would leak one
    * cached frame each. */
  private val lastFrames =
    collection.concurrent.TrieMap.empty[(SparkSession, String), Seq[DataFrame]]

  /** Release a frame's storage DETERMINISTICALLY whether it is
    * CacheManager-persisted or localCheckpoint-backed:
    * Dataset.unpersist only uncaches CacheManager entries and is a
    * silent no-op on a checkpoint-backed frame, whose blocks are
    * RDD-level-persisted and otherwise linger until the JVM happens
    * to GC the RDD reference. */
  private def release(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
    ()
  }

  /** Min-label propagation over `nodes` ("id") and undirected `pairs`
    * ("src","dst", one direction; mirrored here). Returns ("id",
    * "label") with label = the component's minimum node id. `key`
    * scopes the persisted-frame bookkeeping per caller+dir.
    *
    * `maxRounds` bounds the propagation: min-label converges in
    * graph-DIAMETER rounds, so the default 25 is generous for the
    * clique-like near-dup graphs this serves (diameter 2-3) but a
    * CHAIN-shaped graph (a long similarity chain of pairwise-only
    * neighbors) has diameter ≈ node count and will hit the cap — the
    * loop then fails loudly (unconverged labels are wrong labels)
    * rather than emit a partial labeling. Callers clustering
    * potentially chain-shaped graphs must raise the cap explicitly;
    * rounds stay O(1)-plan-size each, so a larger cap costs only the
    * rounds actually used. */
  def connected(s: SparkSession, key: String, nodes: DataFrame,
      pairs: DataFrame, reliable: Boolean, maxRounds: Int = 25): DataFrame = {
    // evict bookkeeping for sessions that have been stopped since the
    // last call: their executors (and any cached blocks) are gone, but
    // the map entry would otherwise strongly reference the session
    // object forever in a long-lived multi-session process
    lastFrames.keys.filter(_._1.sparkContext.isStopped)
      .foreach(lastFrames.remove)
    if (reliable) require(s.sparkContext.getCheckpointDir.isDefined,
      "Components.connected(reliable = true) needs sparkContext.setCheckpointDir " +
        "(shared storage) set first")
    val checkpointRound: DataFrame => DataFrame =
      if (reliable) { df =>
        // persist before checkpoint: the eager action computes the
        // aggregation, then the checkpoint-file write job re-computes
        // it unless the result is cached — persist halves per-round
        // materialization cost on exactly the long runs this path is
        // for. The cache is dropped as soon as the files are durable.
        val cached = df.persist()
        val out = cached.checkpoint(true)
        cached.unpersist()
        out
      } else _.localCheckpoint(true)
    lastFrames.remove((s, key)).foreach(_.foreach(release))
    val edges = pairs.select(col("src"), col("dst"))
      .unionByName(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("label")).persist()
    // Convergence witness: labels are non-increasing under
    // min-propagation (own label is in every round's min), so the
    // label-sum is strictly decreasing until the fixed point — ONE
    // scalar aggregate per round detects convergence, instead of a
    // count() plus a label-compare join (2 actions + a shuffle). The
    // sum runs in decimal so it stays exact at any id magnitude.
    var prevSum: java.math.BigDecimal = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxRounds) {
      val neighborLabels = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .select(col("src").as("id"), col("label"))
      // localCheckpoint (not persist): each round's plan embeds the
      // previous round's FULL tree twice (union + join), so lineage
      // grows exponentially with iterations — PlanSweep measured 8347
      // Exchange nodes in the printed plan after convergence. The
      // checkpoint truncates lineage to the materialized partitions
      // (implicitly cached), keeping driver-side analysis O(1) per
      // round — at a billion docs the loop still runs in diameter
      // rounds with constant-size plans.
      val next = checkpointRound(
        labels.unionByName(neighborLabels)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      val sumNow = next.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)
      // a null sum means zero nodes: the empty labeling is trivially
      // the fixed point (without this, prevSum stays null forever and
      // the loop would spin to the round cap and throw on empty input)
      converged = sumNow == null || (prevSum != null && sumNow.compareTo(prevSum) == 0)
      prevSum = sumNow
      release(labels)
      labels = next
      iter += 1
    }
    // unconverged labels are WRONG labels (one component, many ids) —
    // fail loudly rather than emit them; the oracles are exact closure
    require(converged,
      s"Components.connected($key): min-label propagation not converged after $iter rounds " +
        s"(cap $maxRounds) — the graph's diameter exceeds the cap; raise maxRounds " +
        "(chain-shaped graphs need ~node-count rounds, see scaladoc)")
    // edges stays persisted; labels is checkpoint-backed (reliable =
    // survives executor loss from shared storage; local = fast but
    // not recomputable — the caller's dial). Both are released on the
    // next invocation under this key.
    lastFrames.put((s, key), Seq(labels, edges))
    labels
  }
}
