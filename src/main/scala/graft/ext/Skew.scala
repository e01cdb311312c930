package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: SALTING. A hot join key
  * sends its entire row mass to one reducer — the single-task stage that
  * turns a 100× scale-up into a wall-clock cliff. Salting splits each
  * key's mass across `salts` sub-keys: the probe side derives a
  * deterministic salt from a high-cardinality column, the build side is
  * replicated once per salt value, and the join runs on
  * `(key…, salt)` — so the hottest key now occupies `salts` reducers
  * instead of one.
  *
  * This is the MANUAL form of what AQE's skew-join split does at
  * runtime; it exists as a first-class operator because (a) AQE only
  * splits sort-merge/shuffled-hash partitions AFTER a stage materializes
  * oversized blocks, while salting shapes the shuffle up front, and
  * (b) streaming / non-AQE contexts (foreachBatch bodies, bucketed
  * pipelines) have no runtime re-plan to lean on.
  *
  * Cost model: the build side is duplicated `salts`× (choose a dimension
  * small enough that `salts · |small|` still broadcasts or shuffles
  * cheaply), the probe side is untouched, and the result is EXACTLY the
  * plain join — SkewSpec pins both the equality and the flattened
  * shuffle histogram. */
object Skew {

  /** Inner equi-join of `big ⋈ small` on `keyCols`, salted `salts` ways.
    * `saltFrom` must be a deterministic high-cardinality expression over
    * `big`'s columns (an id column; NOT rand() — results must be
    * replayable). `small`'s rows are replicated across all salt values,
    * so every `(key, salt)` probe bucket finds its build row. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 saltFrom: Column, salts: Int): DataFrame = {
    require(salts >= 2, s"salts=$salts: a single salt is the unsalted join")
    require(keyCols.nonEmpty, "salted join needs at least one equi-key")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    // shuffle_hash on the replicated build side: the demonstration must
    // not silently degrade to a broadcast (which would bypass the very
    // shuffle the salt is flattening)
    saltedBig.join(saltedSmall.hint("shuffle_hash"),
        keyCols :+ "__salt", "inner")
      .drop("__salt")
  }
}
