package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-dup pair lists → duplicate CLUSTERS: connected components by
  * iterative min-label propagation, the survivor-selection step every
  * dedup pipeline needs after q36/q37-style pair generation (keep
  * cluster_id == doc_id, drop the rest — the multi-doc generalization
  * of q34's min-id survivor rule).
  *
  * Algorithm: every node starts labeled with its own id; each round
  * every node takes the MIN of its label and its neighbors' labels;
  * fixpoint = every node labeled with the smallest id in its
  * component. Deterministic (the fixpoint is unique), converges in
  * O(component diameter) rounds — near-dup components are dense
  * (clique-ish) in practice, so 2-4 rounds; the `maxIter` bound turns
  * a pathological path-graph corpus into a loud failure instead of an
  * infinite loop. At 10⁹⁺-edge scale the same loop runs with
  * large-star/small-star optimizations (halves the round count); the
  * per-round shape here is already the scalable one — one keyed join
  * + one min aggregation, labels pinned per round so lineage stays
  * flat (the classic iterative-algorithm discipline; GraphX's CC is
  * this same loop over RDDs).
  *
  * The round-over-round driver loop IS the intended shape (each round
  * is a distributed job; only the converged? count comes back), not a
  * driver-side computation over collected data.
  */
object ConnectedComponents {

  /** (a, b) pair rows → (node, cluster_id = min id in component),
    * one row per node that appears in any pair. */
  def clusters(pairs: DataFrame, a: String = "a", b: String = "b",
               maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(a).as("x"), col(b).as("y"))
      .unionAll(pairs.select(col(b).as("x"), col(a).as("y")))
      .transform(Pin(_, eager = true)) // reused every round
    var labels = edges.select(col("x").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .transform(Pin(_, eager = true))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      it += 1
      val nbrMin = edges.join(labels, edges("y") === labels("node"))
        .groupBy(col("x")).agg(min(col("lbl")).as("nl"))
      val next = labels.join(nbrMin, labels("node") === nbrMin("x"), "left")
        .select(col("node"), col("lbl"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("nxt"))
        .transform(Pin(_, eager = true))
      changed = next.filter(col("nxt") < col("lbl")).count()
      labels = next.select(col("node"), col("nxt").as("lbl"))
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter rounds " +
        "(pathological high-diameter component — raise maxIter)")
    labels.select(col("node"), col("lbl").as("cluster_id"))
  }

  /** End-to-end dedup tail: drop every document that belongs to a
    * near-dup cluster but is not its min-id representative. Docs in no
    * pair pass through untouched (the anti-join side holds only
    * clustered non-survivors — far smaller than the corpus, and the
    * join is keyed on `idCol`). */
  def survivors(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                a: String = "a", b: String = "b"): DataFrame = {
    val losers = clusters(pairs, a, b)
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
