package graft.ext

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-integrity audits for corpus-scale tables (north-star extension;
  * the reference's only integrity machinery is the per-document key/shape
  * gate, M7): content fingerprints for replica/version equality and
  * referential-integrity sweeps for relationship health. Both are the
  * checks a 100 TB ingest runs BEFORE a training job spends a cluster-day
  * on corrupted input.
  */
object Audit {

  /** Order-independent content fingerprint per group: `(grp, n_rows,
    * xor_sig)` where `xor_sig` is the XOR-fold of a 60-bit content hash
    * of each row's chosen columns. XOR is commutative/associative ⇒ the
    * digest is identical under ANY partitioning, row order, or merge
    * tree (map-side combinable, fixed 8-byte state — the cheapest
    * possible "are these two copies the same corpus?" answer: compare
    * shard digests, ship only mismatched shards). Rows must be UNIQUE on
    * the hashed columns (include the primary key): XOR cancels an even
    * number of identical rows, so a duplicated+dropped pair would go
    * unseen on a multiset — with a key column present every row is
    * distinct and the digest is a faithful set fingerprint; `n_rows`
    * independently pins cardinality.
    *
    * The payload encoding is INJECTIVE: each part is length-prefixed
    * (`V<len>:<value>`, NULL → `N`), so a delimiter character inside a
    * value cannot alias two distinct rows ('a|b','c' vs 'a','b|c') and a
    * NULL is distinct from '' — a '' → NULL rewrite (the classic CSV
    * round-trip hazard) flips the digest instead of hiding. Same rule
    * PlanMemo.tag applies to memo keys, same reason. */
  def fingerprintBy(df: DataFrame, groupCol: String, cols: Seq[String],
                    seed: Int): DataFrame = {
    val payload = concat(cols.map { c =>
      val s = col(c).cast("string")
      when(s.isNull, lit("N"))
        .otherwise(concat(lit("V"), length(s).cast("string"), lit(":"), s))
    }: _*)
    df.select(col(groupCol), TextFunctions.seededHash(payload, seed).as("__h"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(__h)").as("xor_sig"))
  }

  /** Referential-integrity sweep: orphan count for one child→parent
    * relationship. One left-outer join on the key — broadcast when the
    * parent's key column is dimension-sized, shuffle-hash/SMJ otherwise
    * (Catalyst's call); the result is one row of bounded metadata per
    * relationship, so a full star-schema audit is a union of these.
    *
    * NULL convention: a NULL child key is an OPTIONAL FK left unset, not
    * a dangling reference — NULL never equi-joins, so counting it as an
    * orphan would conflate "not set" with "referenced parent missing".
    * `n_orphans` therefore counts only NON-NULL keys with no parent, and
    * NULL keys are reported separately as `n_null_keys` so a nullable-FK
    * table's audit row still surfaces them. */
  def fkOrphans(rel: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__k")).distinct()
      .withColumn("__present", lit(1))
    // one outer join + one agg yields child/null/orphan counts in a
    // single pass (a separate anti-join + count pair would need a 1-row
    // join to reassemble — a nested-loop shape PlanAuditSpec bans)
    child.select(col(childKey).as("__k"))
      .join(p, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_child"),
        sum(when(col("__k").isNull, 1L).otherwise(0L)).as("n_null_keys"),
        sum(when(col("__k").isNotNull && col("__present").isNull, 1L)
          .otherwise(0L)).as("n_orphans"))
      .select(lit(rel).as("relationship"), col("n_child"),
        col("n_null_keys"), col("n_orphans"))
  }
}
