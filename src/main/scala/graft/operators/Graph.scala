package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation — PageRank (Brin & Page 1998) over an
  * undirected pair list, the centrality pass the label-propagation
  * components operator ([[Dedup.connectedComponents]]) doesn't give:
  * WHICH member of a cluster (or which token of a co-occurrence graph,
  * TextRank, Mihalcea & Tarau 2004) is most central.
  *
  * Fixed-iteration power method, never run-to-convergence: a bounded,
  * replayable job count is the production contract (convergence loops
  * have data-dependent wall time and make the result depend on a float
  * epsilon), and the oracle can restate exactly k unrolled iterations.
  *
  * Scale shape per iteration: ONE join of the edge list against the
  * (node, rank) frame on the source key + ONE groupBy on the
  * destination — both shuffles keyed by node id; no corpus-wide
  * windows, no driver-side graph state (the only driver action is one
  * bounded node count). The edge frame is persisted once and reused
  * by every iteration; rank generations go through the two-frame
  * localCheckpoint discipline of the components loop (the superseded
  * generation unpersists as soon as its successor materializes), so
  * lineage and cached footprint stay O(1) in the iteration count.
  *
  * Determinism: per-node contribution sums are float folds whose
  * partition order varies, so every iteration's rank passes the
  * CrossRound.ra(·, 8) collapse — mirrored in the oracle as
  * round(round(x, 12), 8) per unrolled iteration — making iteration
  * t+1's input bit-identical on both engines regardless of shuffle
  * order.
  */
object Graph {

  /** PageRank over `pairs` taken as UNDIRECTED edges (each row
    * contributes both directions; callers pass canonicalized pairs).
    * Returns (node, rank) with rank collapsed at 8 dp. Every node in
    * the pair list has degree ≥ 1, so mass is well-defined without a
    * dangling-node correction.
    */
  def pageRank(
      pairs: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val fwd = pairs.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val edges = fwd.unionByName(fwd.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy("u").agg(count(lit(1)).as("d"))
    // edge × degree joined ONCE, persisted for the loop (every
    // iteration reads it; re-deriving would re-shuffle per iteration)
    val withDeg = edges.join(deg, Seq("u")).persist()
    val n = deg.count() // bounded driver action: one aggregate row count
    val base = lit((1.0 - damping) / n)
    var ranks = deg
      .select(col("u").as("node"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    // checkpoint every few generations, not every one: a handful of
    // chained join+agg stages is a perfectly healthy lineage, and each
    // eager checkpoint is a full job barrier — per-iteration barriers
    // tripled this operator's wall time on a small graph. The interval
    // still bounds lineage depth (and cached footprint stays two
    // frames: a checkpoint's predecessor unpersists only after the
    // successor materializes, which depends on it).
    val ckptEvery = 3
    var lastCkpt = ranks
    for (i <- 1 to iterations) {
      var next = withDeg
        .join(ranks, col("u") === col("node"))
        .select(col("v"), (col("rank") / col("d")).as("c"))
        .groupBy(col("v").as("node"))
        .agg(CrossRound.ra(base + lit(damping) * sum(col("c")), 8).as("rank"))
      if (i % ckptEvery == 0 || i == iterations) {
        next = next.localCheckpoint(true)
        lastCkpt.unpersist()
        lastCkpt = next
      }
      ranks = next
    }
    withDeg.unpersist()
    ranks
  }
}
