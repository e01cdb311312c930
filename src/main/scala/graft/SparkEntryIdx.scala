package graft

import graft.ext.InvertedIndex
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third query batch (round 7): the inverted-index family and the
  * remaining curation/indexing extensions. Merged into
  * [[SparkEntry.queries]]; same oracle conventions. */
object SparkEntryIdx {

  /** conjunctive-lookup terms: three dense terms — the intersection still
    * keeps ~3/4³ of the corpus, a meaningful AND */
  private val andTerms = Seq("spark", "query", "window")
  /** BM25 terms: two dense + one rare (`dup`, df≈5%) so idf spread is real */
  private val bm25Terms = Seq("spark", "query", "dup")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_inverted_directory" -> { (s, dir) =>
      InvertedIndex.directory(
        InvertedIndex.postings(Tables.documents(s, dir)))
    },
    "x_index_lookup" -> { (s, dir) =>
      InvertedIndex.lookupAll(
        InvertedIndex.postings(Tables.documents(s, dir)), andTerms)
    },
    "x_bm25_topk" -> { (s, dir) =>
      InvertedIndex.bm25TopK(Tables.documents(s, dir), bm25Terms)
    },
  )

  private def inSql(terms: Seq[String]) = terms.map(t => s"'$t'").mkString(", ")
  private val toks = SparkEntryExt.toksSql

  def oracleSql: Map[String, String] = Map(
    "x_inverted_directory" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents), " +
        "tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2) " +
        "SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc, " +
        "array_to_string(list_sort(list(doc_id))[1:8], ',') AS posting_head " +
        "FROM tf GROUP BY term"),

    "x_index_lookup" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents), " +
        "tf AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2) " +
        s"SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_total FROM tf " +
        s"WHERE term IN (${inSql(andTerms)}) GROUP BY doc_id " +
        s"HAVING count(*) = ${andTerms.size}"),

    // same determinism contract as x_quality_unigram_lm: idf and each
    // per-term score rounded to 6 decimals, per-doc sum over
    // DECIMAL(18,6) (exact, order-independent), rank ties on doc_id
    "x_bm25_topk" ->
      (s"WITH toks AS (SELECT doc_id, unnest($toks) AS term FROM documents), " +
        "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), " +
        s"dl AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl FROM documents), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM dl), " +
        s"dfx AS (SELECT term, count(*) AS df FROM tf WHERE term IN (${inSql(bm25Terms)}) GROUP BY 1), " +
        "idf AS (SELECT term, round(ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf FROM dfx, st), " +
        "sc AS (SELECT t.doc_id, round((i.idf * (t.tf * 2.2)) / " +
        "(t.tf + 1.2 * (0.25 + (0.75 * d.dl) / s.avgdl)), 6) AS s1 " +
        s"FROM tf t JOIN idf i USING (term) JOIN dl d USING (doc_id), st s " +
        s"WHERE t.term IN (${inSql(bm25Terms)})), " +
        "per AS (SELECT doc_id, sum(CAST(s1 AS DECIMAL(18,6))) AS s FROM sc GROUP BY 1) " +
        "SELECT doc_id, CAST(s AS DOUBLE) AS score, " +
        "CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM per " +
        "QUALIFY rank <= 20"),
  )
}
