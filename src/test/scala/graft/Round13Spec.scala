package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-13 contracts: the clustered-corpus residual-vs-plain report
  * (c78) — the measurement c70's near-uniform corpus cannot make. */
class Round13Spec extends AnyFunSuite {
  import TestSpark._

  test("c78 clustered derivation: 8 blocks, float width preserved, deterministic") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val c = Similarity.clusteredCorpus(emb)
    // same schema, same row count, still 64 floats per vector
    assert(c.schema("embedding").dataType == emb.schema("embedding").dataType)
    assert(c.count() == emb.count())
    // the planted structure: for vector v, the block [8g, 8g+8) with
    // g = vec_id % 8 carries the +4.0 concentration — its elements
    // sit near 4, every other block's near 0 (offsets are 0.25×orig)
    val row = c.filter(col("vec_id") === 3).select("embedding").head()
    val arr = row.getSeq[Float](0)
    val home = arr.slice(24, 32) // g = 3
    val away = arr.slice(0, 8)
    assert(home.forall(x => math.abs(x - 4.0) < 1.0), s"home block $home")
    assert(away.forall(x => math.abs(x) < 1.0), s"away block $away")
  }

  test("c78 report contract: both variants priced over the full query set, deterministic") {
    // The residual-beats-plain INEQUALITY is proven on the synthetic
    // plant (Round12Spec "c65 residual IVFADC beats non-residual…"),
    // where the cluster geometry is pinned by construction. On the
    // driver's corpus derivation the DRIVER controls the scale, and at
    // tiny sf the first-16-slice seed books / first-K coarse centroids
    // need not align with the 8 planted blocks (r9: 0.263 vs 0.341 at
    // sf0.001) — so c78 is a REPORT here (measure, don't guess): we
    // pin its contract, not the measured ordering.
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val rows = Similarity.c78ClusteredRecall(emb).collect()
    val rep = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rep.keySet == Set("ivfadc", "ivfadc_residual"), s"variants: ${rep.keySet}")
    // every variant prices the SAME full query set, recalls in [0,1]
    val nQ = rows.map(_.getLong(1)).distinct
    assert(nQ.length == 1, s"variants price different query counts: ${nQ.mkString(",")}")
    assert(rep.values.forall(v => v >= 0.0 && v <= 1.0), s"recall out of range: $rep")
    // deterministic: a second evaluation reproduces the report exactly
    val again = Similarity.c78ClusteredRecall(emb).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again == rep, s"report not deterministic: $rep vs $again")
  }
}
