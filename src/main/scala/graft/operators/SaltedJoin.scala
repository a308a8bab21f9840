package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-robust equi-join by key salting: a hot key that would pin one
  * reducer (the classic straggler at 100 TB — one user/instance with
  * 100M events) is spread across `salts` sub-keys.
  *
  * The probe (large, skewed) side gets a per-ROW salt — uniform even
  * within one key — and the build side is replicated once per salt, so
  * the join key becomes (key, salt) and the hot key's rows fan out
  * over `salts` tasks. Row-level results are identical to the plain
  * join: every build row exists under every salt.
  *
  * AQE's skew-join handles MOST skew automatically (splitting
  * oversized partitions); explicit salting remains the tool when one
  * KEY (not partition) is hot on both map and reduce sides, or when
  * the skewed agg/join runs under a non-AQE-splittable operator
  * (e.g. a window on the same key).
  */
object SaltedJoin {

  /** Inner equi-join of probe ⋈ build on `keyCol`, salted `salts`
    * ways. Build side is replicated `salts`× — keep it the smaller
    * input. */
  def inner(probe: DataFrame, build: DataFrame, keyCol: String,
            salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // per-row salt (hash of a per-row id, NOT of the key — the whole
    // point is spreading rows that share the key)
    val p = probe.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val b = build.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, Seq(keyCol, "_salt")).drop("_salt")
  }
}
