package graft.tools

import graft.operators.Validate
import graft.plans.JsonExpressions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the m5_validate_json hot spot (not part of the
  * driver contract; run manually while optimizing). */
object ProfileM5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("count(md5(cast(id as string)))").collect()

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[m5] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val ev = graft.sources.Tables.events(spark, sfDir)
    println(s"[m5] events rows = ${ev.count()}")

    val schemaJson =
      """{"type":"object","additionalProperties":false,
         "required":["k"],"properties":{"k":{"type":"integer"}}}""".stripMargin
    val schema = graft.functions.JsonSchema.parse(schemaJson)

    def evp = ev.withColumn("props2",
      when(col("event_id") % 5 === 0, lit("""{"x": 1}""")).otherwise(col("props")))

    for (rep <- 1 to 2) {
      time(s"full_m5_query rep$rep") {
        graft.SparkEntry.queries("m5_validate_json")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    time("fused_errors_only") {
      evp.select(JsonExpressions.jsonSchemaErrors(col("props2"), schema).as("e"))
        .write.format("noop").mode("overwrite").save()
    }
    time("tags_only (1 JsonPathTypes)") {
      evp.select(JsonExpressions.jsonPathTypes(col("props2"), Seq("$", "$.k")).as("t"))
        .write.format("noop").mode("overwrite").save()
    }
    time("errors_only (no reuse)") {
      evp.select(Validate.errors(col("props2"), schema).as("e"))
        .write.format("noop").mode("overwrite").save()
    }
    time("errors_x2_reuse (m5 shape)") {
      evp.withColumn("__errors", Validate.errors(col("props2"), schema))
        .select(col("event_id"),
          when(size(col("__errors")) === 0,
            get_json_object(col("props2"), "$.k").cast("long")).as("k_val"),
          size(col("__errors")).cast("int").as("n_errors"))
        .write.format("noop").mode("overwrite").save()
    }
    println("---- plan of m5 shape ----")
    evp.withColumn("__errors", Validate.errors(col("props2"), schema))
      .select(col("event_id"),
        when(size(col("__errors")) === 0,
          get_json_object(col("props2"), "$.k").cast("long")).as("k_val"),
        size(col("__errors")).cast("int").as("n_errors"))
      .explain("formatted")
    spark.stop()
  }
}
