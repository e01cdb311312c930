package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo of LEARNED MODELS (merge tables, centroids,
  * codebooks — driver-side metadata, not relations), keyed like
  * [[PlanMemo]] by (session, canonicalized input plan, tag). The
  * [[PlanMemo]] counterpart for values that are not DataFrames; every
  * instance self-registers so [[Caches.invalidate]] sweeps ALL model
  * memos structurally — a new memo cannot be forgotten from the sweep
  * (the hazard that has bitten hand-rolled memos twice in this repo's
  * history).
  *
  * Unlike a computeIfAbsent memo, `train` runs OUTSIDE any lock: an
  * eager multi-job Spark training inside a ConcurrentHashMap bin lock
  * would serialize unrelated callers for the training's whole duration.
  * The cost is a benign race — two concurrent first callers may both
  * train, one result is discarded — which is safe exactly because every
  * training this memo holds is deterministic (same key ⇒ same value).
  */
final class ModelMemo[T <: AnyRef] {
  private val entries = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), AnyRef]()

  def apply(input: DataFrame, tag: String)(train: => T): T = {
    val key = (input.sparkSession, input.queryExecution.analyzed.canonicalized, tag)
    val cached = entries.get(key)
    if (cached != null) cached.asInstanceOf[T]
    else {
      // disk layer: a fresh JVM deserializes the stored model instead of
      // retraining (the stored-tokenizer/index contract); a first
      // training commits its result. Runs lock-free like the training.
      val trained = ArtifactStore.getOrTrain[T](
        ArtifactStore.dfKey(tag, Seq(input)))(train)
      val prev = entries.putIfAbsent(key, trained)
      (if (prev != null) prev else trained).asInstanceOf[T]
    }
  }

  /** Drop this session's entries. */
  def invalidate(spark: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1 eq spark) it.remove()
  }

  // LAST constructor statement, same publication argument as PlanMemo:
  // the registry's lock publishes the fully-initialized instance
  ModelMemo.register(this)
}

object ModelMemo {
  private val registry = new java.util.concurrent.CopyOnWriteArrayList[ModelMemo[_ <: AnyRef]]()
  private def register(m: ModelMemo[_ <: AnyRef]): Unit = registry.add(m)

  /** Sweep every registered model memo for `spark` — called by
    * [[Caches.invalidate]]. */
  def invalidateAll(spark: SparkSession): Unit = {
    val it = registry.iterator()
    while (it.hasNext) it.next().invalidate(spark)
  }
}
