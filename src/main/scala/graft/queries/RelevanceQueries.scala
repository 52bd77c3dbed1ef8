package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Aggregates, Relevance}

/** Relevance scoring over the documents table (TF-IDF, BM25) plus the
  * grouped-AUC battery — all hash-exact against DuckDB: tf/df/N are
  * integers, the idf/score formulas are spelled identically on both
  * sides, and the only cross-row double sums fold in a deterministic
  * order (BM25 per-doc sum term-sorted; AUC ranks are half-integers).
  */
object RelevanceQueries extends QuerySet {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 TF-IDF terms per document over a bounded slice — the
    // "what is this document about" profile used for topic filtering.
    // Corpus vocabulary with document-frequency pruning: rare terms
    // (df < 30) and stopword-like terms (df > 78% of docs) cut — the
    // CountVectorizer preprocessing step, thresholds chosen so BOTH
    // bounds bite on this corpus's df distribution. All-integer output.
    "t19_vocabulary" -> ((s, d) =>
      Relevance.vocabulary(
        Tables.documents(s, d).select("doc_id", "text"),
        "text", "doc_id", minDf = 30L, maxDfRatio = 0.78)
        .orderBy(col("term"))),

    // Zipf's-law slope over the top-100 vocabulary terms: the log-log
    // OLS corpus-health diagnostic (natural text ≈ −1; flat =
    // boilerplate, spiky = duplication). Composes the unpruned
    // vocabulary frame through the factored fit; ln rounds 7dp before
    // order-free DECIMAL moment sums.
    "t28_zipf" -> ((s, d) =>
      Relevance.zipfSlope(
        Relevance.vocabulary(
          Tables.documents(s, d).select("doc_id", "text"),
          "text", "doc_id"),
        topN = 100)),

    "t09_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        // CAP: baseline cover=t22_bm25_retrieval
        .filter(col("doc_id") < 50).select("doc_id", "text")
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term").asc)
      Relevance.tfidf(docs, "text", "doc_id")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        // ln() is transcendental — not correctly rounded, so the last
        // ulp may differ across engines; 9dp keeps the score exact for
        // comparison while ranking stays on the raw doubles
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          col("df"), round(col("tfidf"), 9).as("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Windowed co-occurrence PMI (collocation mining / the SGNS
    // training statistic): unordered token pairs within a 5-token
    // forward window, unigram marginals, ln rounded 9dp. Pair counts,
    // unigram counts, and totals are exact integers; the probability
    // ratio is spelled identically in the oracle.
    "t21_pmi" -> ((s, d) =>
      Relevance.pmi(Tables.documents(s, d).select("doc_id", "text"),
        "text", "doc_id", window = 5, minPairs = 40L)
        .orderBy(col("a"), col("b"))),

    // BM25 top-10 documents for a three-term query — targeted corpus
    // selection before an expensive downstream pass.
    "t10_bm25" -> ((s, d) =>
      Relevance.bm25(Tables.documents(s, d).select("doc_id", "text"),
        "text", "doc_id", Seq("table", "data", "vector"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(10)
        .select(col("doc_id"), round(col("bm25"), 9).as("bm25"))),

    // Multi-query BM25 retrieval (the batch RAG shape): every 97th
    // doc's first-5-token prefix plays a query; one corpus pass scores
    // all queries through the inverted-index join, top-5 docs per
    // query via the bounded TopKAgg heap. Each query's own source doc
    // should surface at/near rank 1 — and the oracle replays postings,
    // idf, the round(·,7)→DECIMAL per-(query,doc) sum, and ranking
    // verbatim.
    "t22_bm25_retrieval" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val qs = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+"),
            1, 5), " ").as("qtext"))
      Relevance.bm25Retrieval(docs, qs, "text", "doc_id",
        "query_id", "qtext", k = 5)
        .select(col("query_id"), col("rank"), col("doc_id"),
          round(col("bm25"), 9).as("bm25"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // t22 with the query set FIXED to base-corpus doc ids (< 10^7 —
    // ScaleUp shifts copy k's ids by k·10^7, so scale-up corpora grow
    // ONLY the document axis here). At any shipped sf this is
    // identical to t22 (all ids < 10^7); on a scale probe it decouples
    // the two growth axes t22 deliberately couples, isolating
    // per-query retrieval cost from query-count growth.
    "t22b_bm25_fixed_queries" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val qs = docs.filter(col("doc_id") % 97 === 0 &&
          // CAP: queryset
          col("doc_id") < 10000000L)
        .select(col("doc_id").as("query_id"),
          array_join(slice(split(trim(lower(col("text"))), "\\s+"),
            1, 5), " ").as("qtext"))
      Relevance.bm25Retrieval(docs, qs, "text", "doc_id",
        "query_id", "qtext", k = 5)
        .select(col("query_id"), col("rank"), col("doc_id"),
          round(col("bm25"), 9).as("bm25"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // TextRank keywords: t21's co-occurrence pairs feed g02's integer
    // fixed-point PageRank over string nodes — two oracle-proven
    // modules composed, ranks bit-exact, top-20 by (rank desc, token).
    "t24_textrank" -> ((s, d) =>
      Relevance.textRank(
        Tables.documents(s, d).select("doc_id", "text"),
        "text", "doc_id", window = 5, minPairs = 40L, iters = 3,
        topK = 20)),

    // Grouped ROC AUC: one traversal scores both l_linestatus cohorts
    // (the fused multi-model evaluation path, oracle-gated).
    "a16c_auc_by_group" -> ((s, d) =>
      Aggregates.rocAucByGroup(
        Tables.lineitem(s, d).select(col("l_linestatus").as("grp"),
          (col("l_returnflag") === "R").cast("int").as("label"),
          (col("l_discount") * 9 + col("l_tax")).as("proba")),
        "label", "proba", Seq("grp"))
        .orderBy(col("grp")))
  )

  def oracle: Map[String, String] = Map(
    // replay zipfSlope: the t19 token recipe unpruned, top-100 by
    // (tf desc, term), ln(rank)/ln(tf) at 7dp, DECIMAL moment sums,
    // slope then intercept FROM the rounded slope
    "t28_zipf" ->
      """WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(trim(lower(text)), '\s+'))
                        AS term
               FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM t GROUP BY doc_id, term),
         stats AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS tf
                   FROM tf GROUP BY term),
         top AS (SELECT term, tf FROM stats
                 ORDER BY tf DESC, term LIMIT 100),
         rk AS (SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, term)
                  AS r FROM top),
         lg AS (SELECT round(ln(CAST(r AS DOUBLE)), 7) AS lx,
                       round(ln(CAST(tf AS DOUBLE)), 7) AS ly
                FROM rk),
         ag AS (SELECT COUNT(*) AS n,
                  SUM(CAST(lx AS DECIMAL(18,7))) AS sx,
                  SUM(CAST(ly AS DECIMAL(18,7))) AS sy,
                  SUM(CAST(round(lx * ly, 7) AS DECIMAL(18,7))) AS sxy,
                  SUM(CAST(round(lx * lx, 7) AS DECIMAL(18,7))) AS sxx
                FROM lg),
         sl AS (SELECT n, sx, sy,
                  CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            <> 0.0 THEN
                    round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                          (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 7)
                  END AS slope
                FROM ag)
         SELECT CAST(n AS BIGINT) AS n_terms, slope,
                round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE), 7) AS intercept
         FROM sl""",
    "t19_vocabulary" ->
      """WITH t AS (SELECT doc_id,
                      unnest(string_split_regex(trim(lower(text)), '\s+'))
                        AS term
               FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM t GROUP BY doc_id, term),
         stats AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS tf,
                          COUNT(*) AS df
                   FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n_docs FROM documents)
         SELECT term, tf, df FROM stats CROSS JOIN n
         WHERE df >= 30 AND CAST(df AS DOUBLE) <= 0.78 * n_docs
         ORDER BY term""",
    "t09_tfidf" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         t AS (SELECT doc_id,
                      unnest(string_split_regex(trim(lower(text)), '\s+'))
                        AS term
               FROM docs),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM t GROUP BY doc_id, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n_docs FROM docs),
         scored AS (
           SELECT doc_id, term, tf, df,
                  tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1)
                    AS tfidf
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC) AS rank
           FROM scored)
         SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
                round(tfidf, 9) AS tfidf
         FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",
    "t21_pmi" ->
      """WITH base AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
         pos AS (SELECT doc_id, unnest(t) AS tok,
                        generate_subscripts(t, 1) AS i FROM base),
         uni AS (SELECT tok, COUNT(*) AS c FROM pos GROUP BY tok),
         nt AS (SELECT COUNT(*) AS n_tok FROM pos),
         pr AS (SELECT least(p1.tok, p2.tok) AS a,
                       greatest(p1.tok, p2.tok) AS b
                FROM pos p1 JOIN pos p2
                  ON p1.doc_id = p2.doc_id
                    AND p2.i > p1.i AND p2.i <= p1.i + 5),
         pc AS (SELECT a, b, COUNT(*) AS n_pair FROM pr GROUP BY a, b),
         np AS (SELECT COUNT(*) AS n_pairs_total FROM pr)
         SELECT pc.a, pc.b, pc.n_pair, ua.c AS c_a, ub.c AS c_b,
                round(ln((CAST(pc.n_pair AS DOUBLE) / n_pairs_total) /
                         ((CAST(ua.c AS DOUBLE) / n_tok) *
                          (CAST(ub.c AS DOUBLE) / n_tok))), 9) AS pmi
         FROM pc JOIN uni ua ON ua.tok = pc.a
                 JOIN uni ub ON ub.tok = pc.b
         CROSS JOIN np CROSS JOIN nt
         WHERE pc.n_pair >= 40
         ORDER BY a, b""",
    "t10_bm25" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         b2 AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl
                FROM base),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM b2),
         t AS (SELECT doc_id, dl, unnest(toks) AS term FROM b2),
         tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM t
                WHERE term IN ('table', 'data', 'vector')
                GROUP BY doc_id, dl, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id, tf.term,
                  ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
                    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         agg AS (
           SELECT doc_id,
                  list_dot_product(list(score ORDER BY term),
                    list_transform(list(score ORDER BY term),
                      x -> CAST(1 AS DOUBLE))) AS bm25
           FROM sc GROUP BY doc_id)
         SELECT doc_id, round(bm25, 9) AS bm25 FROM (
           -- order/limit on the RAW score inside the subquery: the outer
           -- ORDER BY would bind to the rounded output alias and could
           -- rank 9dp ties differently than Spark's raw-score sort
           SELECT doc_id, bm25 FROM agg
           ORDER BY bm25 DESC, doc_id ASC LIMIT 10)""",
    // t21's pair CTE + g02's unrolled integer PageRank, string nodes
    "t24_textrank" ->
      """WITH base AS (SELECT doc_id,
                string_split_regex(trim(lower(text)), '\s+') AS t
              FROM documents),
         pos AS (SELECT doc_id, unnest(t) AS tok,
                        generate_subscripts(t, 1) AS i FROM base),
         pr0 AS (SELECT least(p1.tok, p2.tok) AS a,
                        greatest(p1.tok, p2.tok) AS b
                 FROM pos p1 JOIN pos p2
                   ON p1.doc_id = p2.doc_id
                     AND p2.i > p1.i AND p2.i <= p1.i + 5),
         pc AS (SELECT a, b, COUNT(*) AS n_pair FROM pr0 GROUP BY a, b),
         e AS (SELECT a AS u, b AS v FROM pc WHERE n_pair >= 40),
         sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
         deg AS (SELECT u AS node, COUNT(*) AS deg FROM sym GROUP BY 1),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
         c1 AS (SELECT s.v AS node, SUM(r.r // d.deg) AS m
                FROM sym s JOIN r0 r ON s.u = r.node
                           JOIN deg d ON s.u = d.node GROUP BY 1),
         r1 AS (SELECT d.node,
                  CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT)
                    AS r
                FROM deg d LEFT JOIN c1 c ON d.node = c.node),
         c2 AS (SELECT s.v AS node, SUM(r.r // d.deg) AS m
                FROM sym s JOIN r1 r ON s.u = r.node
                           JOIN deg d ON s.u = d.node GROUP BY 1),
         r2 AS (SELECT d.node,
                  CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT)
                    AS r
                FROM deg d LEFT JOIN c2 c ON d.node = c.node),
         c3 AS (SELECT s.v AS node, SUM(r.r // d.deg) AS m
                FROM sym s JOIN r2 r ON s.u = r.node
                           JOIN deg d ON s.u = d.node GROUP BY 1),
         r3 AS (SELECT d.node,
                  CAST(150000 + (85 * COALESCE(c.m, 0)) // 100 AS BIGINT)
                    AS r
                FROM deg d LEFT JOIN c3 c ON d.node = c.node)
         SELECT node, r AS "rank" FROM r3
         ORDER BY r DESC, node LIMIT 20""",
    "t22_bm25_retrieval" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         b2 AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl
                FROM base),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM b2),
         qs AS (SELECT doc_id AS query_id, list_distinct(toks[1:5]) AS qt
                FROM base WHERE doc_id % 97 = 0),
         qterms AS (SELECT query_id, unnest(qt) AS term FROM qs),
         vocab AS (SELECT DISTINCT term FROM qterms),
         t AS (SELECT doc_id, dl, unnest(toks) AS term FROM b2),
         tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
                FROM t JOIN vocab USING (term)
                GROUP BY doc_id, dl, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id, tf.term,
                  ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
                    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         agg AS (
           SELECT q.query_id, s.doc_id,
                  CAST(SUM(CAST(round(s.score, 7) AS DECIMAL(27,7)))
                    AS DOUBLE) AS bm25
           FROM sc s JOIN qterms q ON s.term = q.term
           GROUP BY q.query_id, s.doc_id),
         rk AS (
           SELECT query_id, doc_id, bm25,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY bm25 DESC, doc_id) AS rank
           FROM agg)
         SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
                round(bm25, 9) AS bm25
         FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",
    "t22b_bm25_fixed_queries" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents),
         b2 AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl
                FROM base),
         stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM b2),
         qs AS (SELECT doc_id AS query_id, list_distinct(toks[1:5]) AS qt
                FROM base WHERE doc_id % 97 = 0 AND doc_id < 10000000),
         qterms AS (SELECT query_id, unnest(qt) AS term FROM qs),
         vocab AS (SELECT DISTINCT term FROM qterms),
         t AS (SELECT doc_id, dl, unnest(toks) AS term FROM b2),
         tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
                FROM t JOIN vocab USING (term)
                GROUP BY doc_id, dl, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         sc AS (
           SELECT tf.doc_id, tf.term,
                  ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
                    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS score
           FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
         agg AS (
           SELECT q.query_id, s.doc_id,
                  CAST(SUM(CAST(round(s.score, 7) AS DECIMAL(27,7)))
                    AS DOUBLE) AS bm25
           FROM sc s JOIN qterms q ON s.term = q.term
           GROUP BY q.query_id, s.doc_id),
         rk AS (
           SELECT query_id, doc_id, bm25,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY bm25 DESC, doc_id) AS rank
           FROM agg)
         SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
                round(bm25, 9) AS bm25
         FROM rk WHERE rank <= 5 ORDER BY query_id, rank""",
    "a16c_auc_by_group" ->
      """WITH s AS (
           SELECT l_linestatus AS grp,
                  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS label,
                  l_discount * 9 + l_tax AS proba
           FROM lineitem),
         ranked AS (
           SELECT grp, CAST(label AS DOUBLE) AS y,
                  RANK() OVER (PARTITION BY grp ORDER BY proba) +
                    (COUNT(*) OVER (PARTITION BY grp, proba) - 1) / 2.0 AS r
           FROM s)
         SELECT grp,
                CASE WHEN SUM(y) = 0 OR SUM(1 - y) = 0 THEN NULL
                     ELSE (SUM(CASE WHEN y = 1 THEN r ELSE 0.0 END) -
                           SUM(y) * (SUM(y) + 1) / 2.0) /
                          (SUM(y) * SUM(1 - y))
                END AS roc_auc
         FROM ranked GROUP BY grp ORDER BY grp"""
  )
}
