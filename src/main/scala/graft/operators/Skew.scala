package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY E5, §5): salted equi-join for hot keys.
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so badly that even split
  * partitions bottleneck (the classic null-key / celebrity-key case),
  * or when AQE is unavailable (streaming joins).
  *
  * The probe side scatters each row into one of `salts` sub-keys via
  * a deterministic hash of a unique column; the build side replicates
  * each row `salts` times. The join key becomes (key, salt): the hot
  * key's rows spread over `salts` reducers instead of one. Cost:
  * build side inflates ×salts — use for dimension-sized build sides.
  */
object Skew {

  /** Inner equi-join of `probe` and `build` on `key`, salted to
    * `salts` sub-partitions. `probeUnique` is any column giving a
    * deterministic per-row spread (an id). Result = plain inner join
    * on the key columns. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 probeUnique: Column, salts: Int): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(probeUnique), lit(salts)).cast("int"))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
