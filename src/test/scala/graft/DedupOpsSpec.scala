package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.DedupOps

class DedupOpsSpec extends SparkTestBase {

  private def q(name: String) =
    DedupOps.all.find(_.name == name).get.run(spark, sfDir)

  test("exact dedup maps every doc, survivors are self-canonical") {
    val d = q("q34_dedup_exact")
    assert(d.count() == Tables.documents(spark, sfDir).count())
    assert(d.filter(col("canon_id") > col("doc_id")).isEmpty)
    assert(d.filter(col("is_dup") === 0 && col("canon_id") =!= col("doc_id")).isEmpty)
  }

  test("minhash-LSH candidates contain every high-Jaccard pair (recall on planted dups)") {
    val jacc = q("q35_dedup_jaccard").select(col("a"), col("b"))
    val mh = q("q36_dedup_minhash").select(col("a"), col("b"))
    // With 8 bands x 4 rows, P(miss | j >= 0.9) ≈ (1 - 0.9^4)^8 < 0.02
    // per pair; on the planted near-identical pairs recall is total.
    assert(jacc.except(mh).isEmpty, "LSH missed a >=0.5-Jaccard pair")
  }

  test("minhash signature similarity is within [0,1] and wide for dup pairs") {
    val mh = q("q36_dedup_minhash")
    assert(mh.filter(col("sim_est") < 0 || col("sim_est") > 1).isEmpty)
  }

  test("simhash near-pairs have small hamming distance and include planted dups") {
    val sh = q("q37_dedup_simhash")
    assert(sh.filter(col("hamming") > 12).isEmpty)
    val jacc = q("q35_dedup_jaccard").select(col("a"), col("b"))
    val missed = jacc.except(sh.select(col("a"), col("b"))).count()
    assert(missed <= jacc.count() / 2, "simhash missed most planted dups")
  }

  test("embedding top-pairs are ordered by similarity and well-formed") {
    val p = q("q38_dedup_embedding").collect()
    assert(p.length > 0 && p.length <= 100)
    val sims = p.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted(Ordering[Double].reverse)))
    assert(p.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("shingled drops sub-n docs and emits distinct shingles") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b c d"), (3L, "x x x x x")).toDF("doc_id", "text")
    val sh = Dedup.shingled(df, 3).select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(!sh.contains(1L))
    assert(sh(2L) == Seq("a b c", "b c d"))
    assert(sh(3L) == Seq("x x x"))
  }

  test("shingleRows (codegen path) produces the same shingle sets as shingled") {
    import org.apache.spark.sql.functions.explode
    val d = Tables.documents(spark, sfDir)
    val fromArrays = Dedup.shingled(d).select(col("doc_id"), explode(col("sh")).as("g"))
    val fromRows = Dedup.shingleRows(d)
    assert(fromArrays.except(fromRows).isEmpty && fromRows.except(fromArrays).isEmpty)
  }
}
