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
    *     (set as a scoped read here, then truncated to micros — the same
    *     truncation DuckDB applies casting timestamp_ns to TIMESTAMP);
    *   - TimestampNTZType: cast to TimestampType — the session is pinned
    *     UTC, so the wall-clock instant is preserved and DuckDB's ntz read
    *     of the same file lines up;
    *   - TimestampType: pass through.
    * The nanos conf is only touched when the nanos layout is actually seen.
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
        // The conf must stay set for the lazy scan to execute, so it is
        // left enabled — but only ever touched when this layout is seen.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(path)
        if (tsType(raw) == LongType)
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
