package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All engine operators take DataFrames, so this is the only place that
  * knows the on-disk layout. At 100 TB these would be bucketed/partitioned
  * catalog tables; locally they are single parquet files, and we rely on
  * Catalyst pushing filters/projections into the scan (verify with
  * `.explain("formatted")`: PushedFilters / ReadSchema).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Name-dispatched loader that routes tables needing special handling
    * (currently `events`) through their dedicated readers. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case other    => apply(spark, sfDir, other)
    }

  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** `events.parquet`'s `ts` physical type has changed across fixture
    * generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, isAdjustedToUTC=false)),
    * so normalize on the *observed* read schema rather than assuming one
    * layout:
    *   - LongType: nanos read via `spark.sql.legacy.parquet.nanosAsLong`
    *     (scoped: the conf is set only around an EAGER materialization of
    *     the legacy read — `localCheckpoint` truncates the lineage so no
    *     later lazy scan needs the conf — and restored in a finally, so
    *     one legacy file can never flip a session-wide parquet setting
    *     for unrelated reads; the nanos→micros truncation is the same one
    *     DuckDB applies casting timestamp_ns to TIMESTAMP);
    *   - TimestampNTZType: cast to TimestampType — the session is pinned
    *     UTC, so the wall-clock instant is preserved and DuckDB's ntz read
    *     of the same file lines up;
    *   - TimestampType: pass through.
    * The nanos conf is only touched when the nanos layout is actually
    * seen, and the materialized legacy read is memoized per (session,
    * path) so the eager pass runs once, not per query. At 100 TB the
    * legacy path is a one-time REWRITE job (normalize + write micros),
    * not a per-query checkpoint — this is the local stand-in.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$sfDir/events.parquet"
    def tsType(df: DataFrame) = df.schema("ts").dataType
    val probe =
      try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.SparkException => None } // nanos: vectorized reader rejects
    probe.map(tsType) match {
      case Some(TimestampType)    => probe.get
      case Some(TimestampNTZType) => probe.get.withColumn("ts", col("ts").cast(TimestampType))
      case _ => // LongType probe or read rejection: legacy nanos layout.
        legacyEvents.computeIfAbsent((spark, path), _ => {
          val confKey = "spark.sql.legacy.parquet.nanosAsLong"
          val prior = spark.conf.getOption(confKey)
          spark.conf.set(confKey, "true")
          try {
            val raw = spark.read.parquet(path)
            val norm =
              if (tsType(raw) == LongType)
                raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
              else raw
            norm.localCheckpoint(eager = true) // lineage cut: conf no longer needed
          } finally prior match {
            case Some(v) => spark.conf.set(confKey, v)
            case None    => spark.conf.unset(confKey)
          }
        })
    }
  }
  // memo for the (rare) legacy-nanos layout's eager normalization
  private val legacyEvents =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Release the memoized legacy-events checkpoints (the [[graft.Caches]]
    * sweep): a fixture regenerated at the same path mid-session must not
    * keep serving pre-regen rows from the eager checkpoint forever. */
  def invalidate(spark: SparkSession): Unit = {
    val it = legacyEvents.entrySet().iterator()
    while (it.hasNext) if (it.next().getKey._1 eq spark) it.remove()
  }
  /** Scale-adaptive fan-out for scans whose consumers do heavy PER-ROW
    * work before any exchange (tokenize/regexp over documents, media
    * decode over synthesized assets, vector math over embeddings): a
    * single-row-group parquet file reads as ONE task no matter how many
    * cores the session has, so every map-side kernel above it runs
    * single-threaded — the unsplittable-input case of the optimization
    * guide (§2.5: "repartition immediately after the read"). The exchange
    * moves only the columns the consumer keeps (projection pushes below
    * a keyed repartition), is keyed on the row id so the layout is
    * deterministic under task retry, and is SKIPPED whenever the scan
    * already carries at least the session's parallelism — at warehouse
    * scale these are many-split tables and this is a no-op, so nothing
    * here tunes for local mode. */
  private def fanOut(spark: SparkSession, df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(keyCol))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    fanOut(spark, apply(spark, sfDir, "documents"), "doc_id")
  /** embeddings deliberately does NOT fan out: the vector kernels either
    * get their parallelism from their own bucketing exchanges (IVF cells,
    * LSH bands) or carry a map-only-plan contract (the IVF delta path is
    * pinned exchange-free by ExtSpec — a batch assignment that shuffles
    * before assigning has lost its O(batch) claim). */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "embeddings")
}
