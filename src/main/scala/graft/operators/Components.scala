package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Connected components over a near-dup pair graph (SURVEY C22) —
  * the step that turns pairwise matches into DECISIONS: every doc in
  * a component keeps exactly one canonical representative (the min
  * id), everything else is a duplicate of it. Without this, A~B and
  * B~C can both drop their "right side" and lose C's content even
  * though A survives.
  *
  * Iterative min-label propagation in DataFrames: every node starts
  * as its own label; each round takes the min of its own and its
  * neighbors' labels (edges walked BOTH directions); convergence is
  * checked with a per-round count — the same driver-coordinated
  * iteration pattern as the IVF Lloyd loop, with only a scalar ever
  * reaching the driver. Rounds needed = graph diameter; dedup
  * graphs are overwhelmingly tiny cliques/chains, so 3-5 rounds is
  * typical. (For adversarially long chains at 100 TB, switch to the
  * large-star/small-star alternation — same join shapes, O(log n)
  * rounds.) Each round is two key shuffles; `checkpointEvery` truncates
  * the growing lineage so round N's plan doesn't replay rounds 1..N-1.
  */
object Components {

  /** (id, component) for every node in `nodes`; component = min
    * reachable id via `edges` (undirected pairs). Nodes absent from
    * every edge are their own singleton component. */
  def connected(nodes: DataFrame, id: Column, edges: DataFrame,
                a: Column, b: Column, maxIter: Int = 20,
                checkpointEvery: Int = 1): DataFrame = {
    // materialize the (small) edge list and seed labels ONCE — the
    // iteration runs one action per round, and without this every
    // round would replay the entire upstream pair-generation pipeline
    val sym = edges.select(a.as("src"), b.as("dst"))
      .unionByName(edges.select(b.as("src"), a.as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(id.as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = sym.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("comp")).as("nc"))
      val next = labels.join(nbrMin, col("id") === col("dst"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nc"), col("comp"))).as("comp"),
          (col("nc") < col("comp")).as("chg"))
      val step = if ((iter + 1) % checkpointEvery == 0) next.localCheckpoint(true) else next
      converged = step.filter(col("chg")).isEmpty
      labels = step.select(col("id"), col("comp"))
      iter += 1
    }
    // partially-propagated labels are silently WRONG (one component
    // reported as several) — refuse rather than return them
    require(converged,
      s"Components.connected: not converged after $maxIter rounds " +
        "(graph diameter exceeds maxIter — raise it, or use " +
        "large-star/small-star for long-chain graphs)")
    labels
  }
}
