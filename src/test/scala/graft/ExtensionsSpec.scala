package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {

  test("custom kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    graft.sources.Tables.embeddings(spark, sf).limit(50).createOrReplaceTempView("e50")
    val viaSql = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, cosine_sim(a.embedding, b.embedding) c
        |FROM e50 a JOIN e50 b ON a.vec_id < b.vec_id""".stripMargin)
    val viaApi = {
      val e = graft.sources.Tables.embeddings(spark, sf).limit(50)
      e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          graft.functions.VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("c"))
    }
    assert(viaSql.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      viaApi.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)

    val sig = spark.sql(
      "SELECT minhash_sig(hashed_shingles(split('a b c d e f g', ' '), 3), 4) s")
      .head().getSeq[Long](0)
    assert(sig.length == 4 && sig.forall(_ >= 0))

    assert(spark.sql(
      "SELECT sorted_jaccard(array(1L,2L,3L), array(2L,3L,4L)) j")
      .head().getDouble(0) == 0.5)
  }
}
