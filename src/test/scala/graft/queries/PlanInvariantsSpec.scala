package graft.queries

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Plan-shape regression gate over the ENTIRE driver query surface: no query
 * may plan a CartesianProduct or BroadcastNestedLoopJoin — the two physical
 * shapes that silently turn a bucketed/banded design into an O(N²)
 * comparison at corpus scale — unless it is on the explicit allowlist of
 * documented quadratic ground-truth miners (kept deliberately: they are the
 * oracle contracts the scalable paths are verified against, and each has a
 * production twin that blocks).
 *
 * This is the test that catches "someone simplified a join and the band key
 * fell out of the equi-condition" before the bench does.
 */
class PlanInvariantsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** The five queries allowed a nested-loop/cartesian shape, each with a
    * BOUNDED side by construction (verified in PLANS.md / source):
    *  - q_ann_cosine — brute-force baseline: the QUERY SET broadcasts and
    *    every query must score every vector (that is the operator);
    *  - q_hybrid_search — its vector arm is the same brute-force baseline
    *    with a SINGLE broadcast query vector (the scale path swaps in
    *    ivfTopK unchanged — rrfFuse only sees (id, rank) lists);
    *  - q_ann_ivf — the query set × nlist centroid-literal table (both
    *    tiny) expand to pick probe cells; the corpus side stays equi;
    *  - q_dedup_embedding — the documented planes=0 EXACT opt-in (this
    *    fixture has no true near-dups, so LSH blocking would be pure
    *    recall loss; the blocked path is exercised in SimilaritySpec);
    *  - q_cross_join — the dimension-complete categorical matrix IS a
    *    cross join of two tiny dimensions;
    *  - q_tpch_q22 — the scalar subquery (global average balance) is a
    *    ONE-ROW aggregate broadcast against the probe side; Catalyst
    *    constant-folds the literal join key away, degenerating the
    *    BroadcastHashJoin into a nested-loop with a single-row build —
    *    O(N·1), the same shape Spark's own scalar-subquery rewrite
    *    executes.
    *
    *  - q_text_knn — the same single-broadcast-query brute-force cosine
    *    shape as q_ann_cosine, over hashed-TF vectors instead of the
    *    embeddings table (one query row broadcasts; the corpus side
    *    streams once).
    *
    * Notably NOT here: the n-gram ground-truth miners — they plan as
    * inverted-index equi-joins on shared shingle hashes (the quadratic in
    * their cost model is candidate VERIFICATION, not the join shape). */
  /**  - q_ann_recall — the recall@k evaluator joins BOTH allowed ANN arms
    *    (the brute-force ground truth and the IVF probe walk), so it
    *    inherits exactly their bounded shapes: the 16-query set broadcasts
    *    against the corpus, and queries × nlist centroid literals pick
    *    probe cells. The overlap join itself is equi-keyed. */
  private val allowedBounded = Set(
    "q_ann_cosine", "q_ann_ivf", "q_ann_recall", "q_dedup_embedding", "q_cross_join",
    "q_hybrid_search", "q_tpch_q22", "q_text_knn")

  "every driver query" should "plan without cartesian or nested-loop joins (unless bounded by design)" in {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val bad = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
      if (bad && !allowedBounded.contains(name)) Some(name) else None
    }
    withClue(s"plan-shape violations: ${offenders.mkString(", ")}\n") {
      offenders shouldBe empty
    }
  }
}
