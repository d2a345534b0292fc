package graft

/** DuckDB oracle SQL for every entry in [[Queries.all]].
  *
  * Each statement mirrors the Spark query 1:1 — same star-adapter
  * mapping (see [[graft.sources.TestData]]), same aliases, same ORDER
  * BY — so the driver's hash-compare sees identical column names,
  * types, and row order. Money sums mirror [[graft.functions.money]]:
  * `SUM(CAST(ROUND(x*100) AS BIGINT))/100.0` (exact cents, then one
  * exact final division). Integer sums are cast to BIGINT to match
  * Spark's LongType (DuckDB would otherwise widen to HUGEINT).
  */
object Oracle {

  /** Exact cosine top-10 over the planted corpus (embeddings minus the
    * query row, plus ten exact query copies at ids 1000001–1000010) —
    * the shared oracle for the four planted ANN catalog entries. */
  private val PlantedTopKSql: String = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <> 0
  UNION ALL
  SELECT 1000000 + i AS vec_id, qe AS e FROM q, range(1, 11) r(i))
SELECT c.vec_id,
       ROUND(list_dot_product(c.e, q.qe)
             / (sqrt(list_dot_product(c.e, c.e))
                * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine
FROM corpus c, q
ORDER BY cosine DESC, c.vec_id LIMIT 10"""

  /** The s02–s05 variant of [[PlantedTopKSql]]: query = vec_id 1,
    * planted copies at 2000001–2000010 (an independent planting, so
    * the coarse/narrow-parameter catalog entries don't share a cached
    * index or corpus with the default-parameter s06–s09 rows). */
  private val PlantedTopKQ1Sql: String = """
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 1),
corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id <> 1
  UNION ALL
  SELECT 2000000 + i AS vec_id, qe AS e FROM q, range(1, 11) r(i))
SELECT c.vec_id,
       ROUND(list_dot_product(c.e, q.qe)
             / (sqrt(list_dot_product(c.e, c.e))
                * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine
FROM corpus c, q
ORDER BY cosine DESC, c.vec_id LIMIT 10"""

  /** Shared CTE chain of the semantic curation pipeline: scoring,
    * lexical + embedding dup clusters, decontamination, split buckets,
    * and the survivor set `surv`. The c03 catalog entry selects the
    * survivors directly; c06 composes mixture sampling + sequence
    * packing on top of the same chain. */
  private val semanticCurationCtes: String = """WITH RECURSIVE t AS (
  SELECT doc_id, source, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
cc AS (SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node),
ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ep AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM ev x JOIN ev y ON x.vec_id < y.vec_id
  WHERE ROUND(list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.4),
ee AS (SELECT a, b FROM ep UNION ALL SELECT b AS a, a AS b FROM ep),
er AS (
  SELECT vec_id AS node, vec_id AS label FROM embeddings
  UNION
  SELECT ee.b AS node, er.label FROM er JOIN ee ON er.node = ee.a),
ecc AS (SELECT node, MIN(label) AS cluster_id FROM er GROUP BY node),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM t WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT g FROM grams WHERE source IN ('src0', 'src1')),
contam AS (
  SELECT DISTINCT c.doc_id FROM grams c JOIN bench b ON c.g = b.g
  WHERE c.source NOT IN ('src0', 'src1')),
sc AS (
  SELECT doc_id, source, CAST(len(toks) AS INTEGER) AS n_tokens,
         length(text) AS nchars,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS sr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to'], x))) AS c_en,
         len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
         len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une'], x))) AS c_fr,
         len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS c_de
  FROM t),
q AS (
  SELECT doc_id, source, n_tokens,
         ROUND((least(nchars / 500.0, 1.0)
                + CASE WHEN pr > 0.2 THEN 0.0 ELSE 1.0 - pr / 0.2 END
                + least(sr * 4.0, 1.0)
                + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
           AS quality_score,
         CASE WHEN c_en = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'en'
              WHEN c_es = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'es'
              WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'fr'
              WHEN c_de = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'de'
              ELSE 'und' END AS lang_pred
  FROM sc),
sp AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 AS bucket
  FROM documents),
surv AS (
  SELECT q.doc_id, q.source, q.n_tokens, q.quality_score, q.lang_pred,
         CASE WHEN sp.bucket < 80 THEN 'train'
              WHEN sp.bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM q
  JOIN cc ON q.doc_id = cc.node AND q.doc_id = cc.cluster_id
  JOIN ecc ON q.doc_id = ecc.node AND q.doc_id = ecc.cluster_id
  JOIN sp ON sp.doc_id = q.doc_id
  WHERE q.source NOT IN ('src0', 'src1')
    AND q.doc_id NOT IN (SELECT doc_id FROM contam)
    AND q.quality_score >= 0.72 AND q.lang_pred <> 'und' AND q.n_tokens >= 3)"""

  /** c06's full chain through the packed sequences (`seqs`): the
    * semantic-curation CTEs + train filter + token-budget mixture +
    * fixed-length packing. c06 selects `seqs`; c08 adds the shard
    * assignment + manifest on top. */
  private val exportSeqCtes: String = semanticCurationCtes + s""",
tr AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS tok
  FROM surv WHERE split = 'train'),
totals AS (
  SELECT source, CAST(SUM(tok) AS BIGINT) AS total FROM tr GROUP BY source),
budgets(source, token_budget) AS (VALUES
  ${graft.text.Mixture.ExportBudgets
      .map { case (src, b) => s"('$src', $b)" }.mkString(", ")}),
rates AS (
  SELECT t2.source,
         CAST(floor(LEAST(CAST(1.0 AS DOUBLE),
                          CAST(token_budget AS DOUBLE) / total) * 10000)
              AS BIGINT) AS keep
  FROM totals t2 JOIN budgets b ON t2.source = b.source),
mixed AS (
  SELECT tr.doc_id, tr.source, tr.tok
  FROM tr JOIN rates ON tr.source = rates.source
  WHERE (ascii(substr(md5(CAST(tr.doc_id AS VARCHAR)), 1, 1)) * 1000
         + ascii(substr(md5(CAST(tr.doc_id AS VARCHAR)), 2, 1)) * 100
         + ascii(substr(md5(CAST(tr.doc_id AS VARCHAR)), 3, 1)) * 10
         + ascii(substr(md5(CAST(tr.doc_id AS VARCHAR)), 4, 1))) % 10000 < keep),
cm AS (
  SELECT source, doc_id, tok,
         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM mixed),
seqs AS (
  SELECT source,
         CAST(FLOOR((cum - tok) / ${graft.text.Mixture.ExportSeqTokens}.0) AS BIGINT) AS seq_id,
         COUNT(*) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS seq_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
  FROM cm GROUP BY source, seq_id)"""

  /** Shared prelude: reference-shaped frames over the TPC-H testdata,
    * the flagship view, and per-customer spending. Mirrors
    * `TestData.star` + `PurchaseSummary.customerPurchaseSummary` +
    * `Dashboard.calculateCustomerSpending(low=20000, high=60000)`.
    */
  val star: String = """WITH
cust AS (
  SELECT c_custkey AS customer_id, c_name AS customer_name,
         CAST(18 + c_custkey % 73 AS INTEGER) AS age,
         c_mktsegment AS segment, c_nationkey AS nation_id
  FROM customer),
merch AS (
  SELECT s_suppkey AS merchant_id, s_name AS merchant_name,
         n_name AS merchant_category
  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
prod AS (
  SELECT p_partkey AS product_id, p_name AS product_name,
         n_name AS product_category, p_retailprice AS price
  FROM part JOIN nation ON p_partkey % 25 = n_nationkey),
tx AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS transaction_id,
         o_custkey AS customer_id, l_partkey AS product_id, l_suppkey AS merchant_id,
         CAST(o_orderdate AS DATE) AS transaction_date,
         strftime(o_orderdate, '%H:%M:%S') AS transaction_time,
         CAST(FLOOR(l_quantity) AS INTEGER) AS quantity,
         l_extendedprice AS total_price,
         o_orderpriority AS transaction_card,
         CASE WHEN l_returnflag = 'R' THEN 'Refund' ELSE 'Purchase' END AS transaction_category
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
summary AS (
  SELECT t.transaction_id, t.customer_id, c.age AS customer_age, t.product_id,
         p.product_name, p.product_category, t.merchant_id, m.merchant_name,
         m.merchant_category, t.transaction_date, t.transaction_time, t.quantity,
         t.quantity * p.price AS total_price, t.transaction_card, t.transaction_category
  FROM tx t
  JOIN cust c ON t.customer_id = c.customer_id
  JOIN prod p ON t.product_id = p.product_id
  JOIN merch m ON t.merchant_id = m.merchant_id
             AND m.merchant_category = p.product_category),
spending AS (
  SELECT customer_id,
         CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
  FROM summary WHERE transaction_category = 'Purchase' GROUP BY customer_id),
customer_spending AS (
  SELECT customer_id, total_price,
         CASE WHEN total_price < 20000 THEN 'Low Spenders'
              WHEN total_price >= 20000 AND total_price < 60000 THEN 'Medium Spenders'
              ELSE 'High Spenders' END AS spend_status
  FROM spending)
"""

  /** Shared CTE prefix of the t19 family (control + round-13 bisect
    * probes): t02's quality formula → label, t17's exact micro-unit
    * margin → pred, one row per doc in CTE `s`. Factored so the fresh
    * keys (t19a/b/c) are BY CONSTRUCTION the same SQL text as the
    * control's corresponding fragments. */
  private def classifierScoredSql: String = {
    val w = graft.text.TextClassifier.DefaultWeightsMicro
      .mkString("[", ", ", "]")
    val b = graft.text.TextClassifier.DefaultBiasMicro
    s"""
WITH t AS (
  SELECT doc_id, source, text,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents),
c AS (
  SELECT doc_id, source, text, toks,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS punct_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS stopword_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl
  FROM t),
q AS (
  SELECT doc_id, source,
         ROUND((least(length(text) / 500.0, 1.0)
                + CASE WHEN punct_ratio > 0.2 THEN 0.0 ELSE 1.0 - punct_ratio / 0.2 END
                + least(stopword_ratio * 4.0, 1.0)
                + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
           AS quality_score
  FROM c),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
h AS (
  SELECT doc_id,
         (ascii(substr(md5(tk), 1, 1)) * 1000
          + ascii(substr(md5(tk), 2, 1)) * 100
          + ascii(substr(md5(tk), 3, 1)) * 10
          + ascii(substr(md5(tk), 4, 1))) % 64 AS h
  FROM tok),
m AS (
  SELECT doc_id, SUM(($w)[h + 1]) + ($b) AS mi FROM h GROUP BY doc_id),
s AS (
  SELECT q.source, q.quality_score >= 0.72 AS label, m.mi > 0 AS pred, m.mi
  FROM m JOIN q USING (doc_id))"""
  }

  /** The per-source rank CTE (average-tie rank on the ×2 BIGINT grid). */
  private val classifierRankSql: String = """,
r AS (
  SELECT source, label, pred, mi,
         2 * RANK() OVER (PARTITION BY source ORDER BY mi)
           + COUNT(*) OVER (PARTITION BY source, mi) - 1 AS r2
  FROM s)"""

  /** The |sources|-row aggregate CTE `a` — every t19 metric's
    * numerator and denominator. NOTE: DuckDB SUM over INTEGER returns
    * HUGEINT (int128); any column of `a` that reaches a final SELECT
    * must be CAST to BIGINT there, or the driver materializes it as
    * float64 and the value hash diverges from Spark's int64 on
    * representation alone (the four-round t19 red — see the t19d–t19j
    * catalog comments in Queries.scala). */
  private def classifierAggSql: String =
    classifierScoredSql + classifierRankSql + """,
a AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CASE WHEN label THEN 1 ELSE 0 END) AS n_pos,
         SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS n_correct,
         SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS fn,
         SUM(CASE WHEN label THEN r2 END) AS rp2
  FROM r GROUP BY source)"""

  /** Full t19 report SQL — shared verbatim by `t19_classifier_eval`
    * (control) and `t19c_eval_v2` (fresh key, round-13 bisect).
    * Round-14 fix: n_docs/n_pos CAST to BIGINT (see classifierAggSql). */
  private def classifierEvalSql: String =
    classifierAggSql + """
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST((20000 * n_correct + n_docs) // (2 * n_docs)
            AS BIGINT) AS accuracy_e4,
       CASE WHEN tp + fp > 0
            THEN CAST((20000 * tp + tp + fp) // (2 * (tp + fp)) AS BIGINT)
       END AS prec_e4,
       CASE WHEN n_pos > 0
            THEN CAST((20000 * tp + n_pos) // (2 * n_pos) AS BIGINT)
       END AS recall_e4,
       CASE WHEN 2*tp + fp + fn > 0
            THEN CAST((20000 * 2 * tp + (2*tp + fp + fn))
                      // (2 * (2*tp + fp + fn)) AS BIGINT)
       END AS f1_e4,
       CASE WHEN n_pos > 0 AND n_pos < n_docs
            THEN CAST((20000 * (rp2 - n_pos * (n_pos + 1))
                       + 2 * n_pos * (n_docs - n_pos))
                      // (4 * n_pos * (n_docs - n_pos)) AS BIGINT)
       END AS auc_e4
FROM a ORDER BY source"""

  val all: Map[String, String] = Map(
    // transaction_id is not unique in the synthetic testdata, so every
    // positional-order-sensitive query sorts by a key set that
    // functionally determines all output columns (ties = identical rows).
    "q01_purchase_summary" -> (star +
      "SELECT * FROM summary ORDER BY transaction_id, product_id, merchant_id, quantity, transaction_category"),

    "q02_customer_spending" -> (star +
      "SELECT * FROM customer_spending ORDER BY customer_id"),

    "q03_age_groups" -> (star + """
SELECT transaction_id, customer_id, customer_age,
       CASE WHEN customer_age BETWEEN 18 AND 25 THEN 'Gen Z'
            WHEN customer_age BETWEEN 26 AND 41 THEN 'Millennials'
            WHEN customer_age BETWEEN 42 AND 57 THEN 'Gen X'
            WHEN customer_age BETWEEN 58 AND 76 THEN 'Boomers'
            WHEN customer_age BETWEEN 77 AND 90 THEN 'Silent Generation'
       END AS age_group
FROM summary ORDER BY transaction_id"""),

    "q04_spend_status_counts" -> (star + """
SELECT b.spend_status, COALESCE(c.cnt, 0) AS count
FROM (VALUES ('High Spenders'), ('Medium Spenders'), ('Low Spenders')) b(spend_status)
LEFT JOIN (
  SELECT spend_status, COUNT(*) AS cnt FROM customer_spending
  WHERE total_price > 0 GROUP BY spend_status) c
USING (spend_status)
ORDER BY spend_status"""),

    "q05_date_range" -> (star + """
SELECT * FROM summary
WHERE transaction_date >= DATE '1998-01-01' AND transaction_date <= DATE '1999-12-31'
ORDER BY transaction_id, product_id, merchant_id, quantity, transaction_category"""),

    "q06_total_spent" -> (star + """
SELECT COALESCE(CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0, 0.0) AS total_spent
FROM summary WHERE transaction_category = 'Purchase'"""),

    "q07_earliest_date" -> (star +
      "SELECT MIN(transaction_date) AS earliest_date FROM summary"),

    "q08_distinct_customers" -> (star +
      "SELECT DISTINCT customer_id FROM summary ORDER BY customer_id"),

    "q09_with_spend_status" -> (star + """
SELECT s.transaction_id, s.customer_id, s.merchant_name, s.total_price, cs.spend_status
FROM summary s LEFT JOIN customer_spending cs ON s.customer_id = cs.customer_id
ORDER BY s.transaction_id, s.merchant_name, s.total_price"""),

    "q10_semi_high_spenders" -> (star + """
SELECT transaction_id, customer_id, total_price FROM summary
WHERE customer_id IN (SELECT customer_id FROM customer_spending WHERE spend_status = 'High Spenders')
ORDER BY transaction_id, total_price"""),

    "q11_daily_items" -> (star + """
SELECT transaction_date, transaction_category,
       CAST(SUM(quantity) AS BIGINT) AS total_items
FROM summary GROUP BY transaction_date, transaction_category
ORDER BY transaction_date, transaction_category"""),

    "q12_card_counts" -> (star + """
SELECT transaction_card, COUNT(transaction_id) AS transaction_count
FROM summary GROUP BY transaction_card ORDER BY transaction_card"""),

    "q13_category_counts" -> (star + """
SELECT product_category, COUNT(transaction_id) AS purchase_count
FROM summary GROUP BY product_category ORDER BY product_category"""),

    "q14_merchant_stats" -> (star + """
SELECT merchant_name, COUNT(transaction_id) AS transaction_count,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM summary GROUP BY merchant_name ORDER BY merchant_name"""),

    "q15_top_merchant" -> (star + """
SELECT merchant_name,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM summary GROUP BY merchant_name
ORDER BY total_price DESC, merchant_name LIMIT 1"""),

    "q16_topk_merchants" -> (star + """
SELECT merchant_name,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM summary GROUP BY merchant_name
ORDER BY total_price DESC, merchant_name LIMIT 5"""),

    "q17_refunds" -> (star + """
SELECT transaction_id, customer_id, merchant_name, total_price
FROM summary WHERE transaction_category = 'Refund'
ORDER BY transaction_id, merchant_name, total_price"""),

    "q18_scalar_exprs" -> ("""
SELECT 'TX' || CAST(l_orderkey AS VARCHAR) || CAST(l_linenumber AS VARCHAR) AS gen_id,
       list_extract(['American Express', 'Visa', 'Mastercard', 'Discover'],
                    CAST(l_orderkey % 4 + 1 AS INTEGER)) AS card,
       CAST((l_orderkey + l_linenumber) % 7 + 1 AS INTEGER) AS gen_quantity,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
       CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS ship_month,
       CAST(EXTRACT(DAY FROM l_shipdate) AS INTEGER) AS ship_day,
       strftime(l_shipdate, '%H:%M:%S') AS ship_time
FROM lineitem ORDER BY gen_id, ship_year, ship_month, ship_day, ship_time"""),

    "q19_category_revenue" -> (star + """
SELECT transaction_category,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price
FROM summary GROUP BY transaction_category ORDER BY transaction_category"""),

    "q20_event_type_stats" -> ("""
SELECT event_type, COUNT(*) AS event_count,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 / COUNT(value) AS avg_value
FROM events GROUP BY event_type ORDER BY event_type"""),

    "q21_last_event_per_user" -> ("""
SELECT user_id, event_id, event_type, value FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id"""),

    "q22_hourly_event_stats" -> ("""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""),

    "q26_sliding_event_stats" -> ("""
WITH ev AS (
  SELECT epoch_ns(ts) // 1000 AS tus, event_type, value FROM events),
w AS (
  SELECT unnest([(tus // 1800000000) * 1800000000,
                 (tus // 1800000000) * 1800000000 - 1800000000]) AS ws,
         event_type, value
  FROM ev)
SELECT make_timestamp(ws) AS window_start, event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
FROM w GROUP BY 1, 2 ORDER BY window_start, event_type"""),

    "q23_user_sessions" -> ("""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       CAST(MIN(ts_ns) // 1000 AS BIGINT) AS session_start,
       CAST(MAX(ts_ns) // 1000 AS BIGINT) AS session_end,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
FROM sessions GROUP BY user_id, session_seq
ORDER BY user_id, session_seq"""),

    "q41_session_window" -> ("""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tus, value FROM events),
flagged AS (
  SELECT user_id, tus, value,
         CASE WHEN lag(tus) OVER w IS NULL
                OR tus - lag(tus) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
sessions AS (
  SELECT user_id, tus, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS seq
  FROM flagged)
SELECT user_id,
       make_timestamp(MIN(tus)) AS session_start,
       make_timestamp(MAX(tus)) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS session_value
FROM sessions GROUP BY user_id, seq
ORDER BY user_id, session_start"""),

    "q24_median_order_value" -> (star + """
, ranked AS (
  SELECT merchant_name, total_price,
         ROW_NUMBER() OVER (PARTITION BY merchant_name ORDER BY total_price) AS rn,
         COUNT(*) OVER (PARTITION BY merchant_name) AS cnt
  FROM summary)
SELECT merchant_name,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / COUNT(*) / 100.0
         AS median_price
FROM ranked
WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
GROUP BY merchant_name ORDER BY merchant_name"""),

    "q27_card_category_pivot" -> (star + """
SELECT product_category,
       CAST(SUM(CASE WHEN transaction_card = '1-URGENT' THEN CAST(ROUND(total_price * 100) AS BIGINT) END) AS BIGINT) / 100.0 AS "1-URGENT",
       CAST(SUM(CASE WHEN transaction_card = '2-HIGH' THEN CAST(ROUND(total_price * 100) AS BIGINT) END) AS BIGINT) / 100.0 AS "2-HIGH",
       CAST(SUM(CASE WHEN transaction_card = '3-MEDIUM' THEN CAST(ROUND(total_price * 100) AS BIGINT) END) AS BIGINT) / 100.0 AS "3-MEDIUM",
       CAST(SUM(CASE WHEN transaction_card = '4-NOT SPECIFIED' THEN CAST(ROUND(total_price * 100) AS BIGINT) END) AS BIGINT) / 100.0 AS "4-NOT SPECIFIED",
       CAST(SUM(CASE WHEN transaction_card = '5-LOW' THEN CAST(ROUND(total_price * 100) AS BIGINT) END) AS BIGINT) / 100.0 AS "5-LOW"
FROM summary GROUP BY product_category ORDER BY product_category"""),

    "q28_rollup_revenue" -> (star + """
SELECT COALESCE(product_category, '(all)') AS product_category,
       COALESCE(transaction_card, '(all)') AS transaction_card,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price,
       COUNT(*) AS n
FROM summary GROUP BY ROLLUP(product_category, transaction_card)
ORDER BY product_category, transaction_card"""),

    "q29_running_revenue" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS c
  FROM summary GROUP BY 1, 2)
SELECT transaction_category, transaction_date,
       CAST(c AS BIGINT) / 100.0 AS daily_revenue,
       CAST(SUM(c) OVER (PARTITION BY transaction_category
                         ORDER BY transaction_date
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) / 100.0
         AS running_revenue
FROM daily ORDER BY transaction_category, transaction_date"""),

    "q30_revenue_ranks" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS c
  FROM summary GROUP BY 1, 2)
SELECT transaction_category, transaction_date,
       CAST(c AS BIGINT) / 100.0 AS daily_revenue,
       CAST(lag(c) OVER w AS BIGINT) / 100.0 AS prev_revenue,
       CAST(RANK() OVER (PARTITION BY transaction_category ORDER BY c DESC) AS BIGINT) AS rev_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY transaction_category ORDER BY c DESC) AS BIGINT) AS rev_dense,
       CAST(NTILE(4) OVER (PARTITION BY transaction_category ORDER BY c, transaction_date) AS BIGINT) AS quartile
FROM daily
WINDOW w AS (PARTITION BY transaction_category ORDER BY transaction_date)
ORDER BY transaction_category, transaction_date"""),

    "q31_customer_set_ops" -> (star + """
, purch AS (SELECT DISTINCT customer_id FROM summary WHERE transaction_category = 'Purchase'),
ref AS (SELECT DISTINCT customer_id FROM summary WHERE transaction_category = 'Refund')
SELECT 'both' AS tag, customer_id FROM (SELECT * FROM purch INTERSECT SELECT * FROM ref)
UNION ALL
SELECT 'purchase_only' AS tag, customer_id FROM (SELECT * FROM purch EXCEPT SELECT * FROM ref)
UNION ALL
SELECT 'refund_only' AS tag, customer_id FROM (SELECT * FROM ref EXCEPT SELECT * FROM purch)
ORDER BY tag, customer_id"""),

    "q32_unsold_products" -> (star + """
SELECT p.product_id, p.product_name, p.product_category
FROM prod p ANTI JOIN summary s ON p.product_id = s.product_id
ORDER BY p.product_id"""),

    "q33_cube_revenue" -> (star + """
SELECT COALESCE(transaction_category, '(all)') AS transaction_category,
       COALESCE(transaction_card, '(all)') AS transaction_card,
       CAST(GROUPING(transaction_category) * 2 + GROUPING(transaction_card) AS BIGINT) AS gid,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_price,
       COUNT(*) AS n
FROM summary GROUP BY CUBE(transaction_category, transaction_card)
ORDER BY gid, transaction_category, transaction_card"""),

    "q34_asof_purchase" -> ("""
WITH trades AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type <> 'purchase'),
quotes AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         MAX(value) AS ref_value, MAX(event_id) AS ref_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT t.event_id, t.user_id, t.ts_us, q.ref_event_id, q.ref_value
FROM trades t ASOF LEFT JOIN quotes q
  ON t.user_id = q.user_id AND t.ts_us >= q.ts_us
ORDER BY t.event_id"""),

    "q38_scalar_subquery" -> (star + """
SELECT transaction_id, product_id, merchant_id, quantity, total_price
FROM summary
WHERE CAST(ROUND(total_price * 100) AS BIGINT) >
      (SELECT CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / COUNT(*)
       FROM summary)
ORDER BY transaction_id, product_id, merchant_id, quantity, total_price"""),

    "q39_unpivot" -> (star + """
SELECT product_category, transaction_card,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
FROM summary GROUP BY 1, 2
ORDER BY product_category, transaction_card"""),

    "q37_interval_join" -> ("""
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
l AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type <> 'purchase'),
r AS (SELECT user_id AS r_user, ts_us AS r_ts, value AS r_value
      FROM ev WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id,
       COUNT(r.r_ts) AS n_recent_purchases,
       CAST(COALESCE(SUM(CAST(ROUND(r.r_value * 100) AS BIGINT)), 0) AS BIGINT) / 100.0
         AS recent_purchase_value
FROM l LEFT JOIN r
  ON l.user_id = r.r_user AND r.r_ts <= l.ts_us AND r.r_ts > l.ts_us - 1800000000
GROUP BY 1, 2 ORDER BY event_id"""),

    "q40_distinct_agg" -> ("""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(props->>'k' AS INTEGER)) AS n_k,
       COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type"""),

    "t10_string_funcs" -> ("""
SELECT doc_id,
       upper(substr(text, 1, 12)) AS head12,
       strpos(lower(text), 'the') AS first_the,
       length(replace(lower(text), ' ', '')) AS n_nonspace,
       levenshtein(substr(lower(text), 1, 30), substr(lower(reverse(text)), 1, 30)) AS lev30,
       repeat(substr(source, 1, 4), 2) AS tag
FROM documents ORDER BY doc_id"""),

    "q35_json_props" -> ("""
SELECT event_type,
       CAST(SUM(CAST(props->>'k' AS INTEGER)) AS BIGINT) AS k_sum,
       CAST(MIN(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS k_min,
       CAST(MAX(CAST(props->>'k' AS INTEGER)) AS INTEGER) AS k_max,
       COUNT(*) AS n
FROM events GROUP BY event_type ORDER BY event_type"""),

    "e02_cosine_pairs" -> ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) AS cosine
FROM e x JOIN e y ON x.vec_id < y.vec_id
WHERE ROUND(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.4
ORDER BY a, b"""),

    // c01 composes the t01/t02/t03 scoring SQL with the d05/d06
    // recursive-CTE clustering: keep each cluster's min-id doc, then
    // apply the admission filters.
    "c01_curation_pipeline" -> ("""
WITH RECURSIVE t AS (
  SELECT doc_id, source, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
cc AS (SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node),
sc AS (
  SELECT doc_id, source, CAST(len(toks) AS INTEGER) AS n_tokens,
         length(text) AS nchars,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS sr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to'], x))) AS c_en,
         len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
         len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une'], x))) AS c_fr,
         len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS c_de
  FROM t),
q AS (
  SELECT doc_id, source, n_tokens,
         ROUND((least(nchars / 500.0, 1.0)
                + CASE WHEN pr > 0.2 THEN 0.0 ELSE 1.0 - pr / 0.2 END
                + least(sr * 4.0, 1.0)
                + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
           AS quality_score,
         CASE WHEN c_en = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'en'
              WHEN c_es = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'es'
              WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'fr'
              WHEN c_de = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'de'
              ELSE 'und' END AS lang_pred
  FROM sc)
SELECT q.doc_id, q.source, q.n_tokens, q.quality_score, q.lang_pred
FROM q JOIN cc ON q.doc_id = cc.node AND q.doc_id = cc.cluster_id
WHERE q.quality_score >= 0.72 AND q.lang_pred <> 'und' AND q.n_tokens >= 3
ORDER BY doc_id"""),

    // c02 = c01's SQL + the d04 decontamination CTEs + the t07 split
    // CASE: the composed oracle for the full curation-export pipeline.
    "c02_curation_splits" -> ("""
WITH RECURSIVE t AS (
  SELECT doc_id, source, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
cc AS (SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM t WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT g FROM grams WHERE source IN ('src0', 'src1')),
contam AS (
  SELECT DISTINCT c.doc_id FROM grams c JOIN bench b ON c.g = b.g
  WHERE c.source NOT IN ('src0', 'src1')),
sc AS (
  SELECT doc_id, source, CAST(len(toks) AS INTEGER) AS n_tokens,
         length(text) AS nchars,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS pr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS sr,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to'], x))) AS c_en,
         len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
         len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une'], x))) AS c_fr,
         len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS c_de
  FROM t),
q AS (
  SELECT doc_id, source, n_tokens,
         ROUND((least(nchars / 500.0, 1.0)
                + CASE WHEN pr > 0.2 THEN 0.0 ELSE 1.0 - pr / 0.2 END
                + least(sr * 4.0, 1.0)
                + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
           AS quality_score,
         CASE WHEN c_en = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'en'
              WHEN c_es = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'es'
              WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'fr'
              WHEN c_de = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'de'
              ELSE 'und' END AS lang_pred
  FROM sc),
sp AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 AS bucket
  FROM documents)
SELECT q.doc_id, q.source, q.n_tokens, q.quality_score, q.lang_pred,
       CASE WHEN sp.bucket < 80 THEN 'train'
            WHEN sp.bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM q
JOIN cc ON q.doc_id = cc.node AND q.doc_id = cc.cluster_id
JOIN sp ON sp.doc_id = q.doc_id
WHERE q.source NOT IN ('src0', 'src1')
  AND q.doc_id NOT IN (SELECT doc_id FROM contam)
  AND q.quality_score >= 0.72 AND q.lang_pred <> 'und' AND q.n_tokens >= 3
ORDER BY q.doc_id"""),

    // c03 = c02 + the semantic (embedding-cluster) keep stage: the
    // e05 recursive-CTE clustering joined on representative, same
    // recall-pin soundness note as e03/e05.
    "c03_curation_semantic" -> (semanticCurationCtes + """
SELECT doc_id, source, n_tokens, quality_score, lang_pred, split
FROM surv ORDER BY doc_id"""),

    // c07 = the funnel report over c03's CTE chain: per source, the
    // cumulative survivor counts of each curation stage (fixed stage
    // order: admission -> lexical keep -> semantic keep -> bench
    // exclusion -> decontamination) plus final token volume. cc covers
    // every document; ecc only embedded docs, hence the LEFT join with
    // a null-safe semantic flag (matching the Spark side's left join +
    // isNotNull).
    "c07_curation_funnel" -> (semanticCurationCtes + """
, fl AS (
  SELECT q.source, q.n_tokens,
         CASE WHEN q.quality_score >= 0.72 AND q.lang_pred <> 'und'
                   AND q.n_tokens >= 3 THEN 1 ELSE 0 END AS s1,
         CASE WHEN cc.cluster_id = q.doc_id THEN 1 ELSE 0 END AS lex,
         CASE WHEN ecc.cluster_id IS NOT NULL
                   AND ecc.cluster_id = q.doc_id THEN 1 ELSE 0 END AS sem,
         CASE WHEN q.source IN ('src0', 'src1') THEN 1 ELSE 0 END AS bench,
         CASE WHEN q.doc_id IN (SELECT doc_id FROM contam)
              THEN 1 ELSE 0 END AS con
  FROM q
  JOIN cc ON q.doc_id = cc.node
  LEFT JOIN ecc ON q.doc_id = ecc.node)
SELECT source,
       COUNT(*) AS n_raw,
       CAST(SUM(s1) AS BIGINT) AS n_admitted,
       CAST(SUM(s1 * lex) AS BIGINT) AS n_lexical_kept,
       CAST(SUM(s1 * lex * sem) AS BIGINT) AS n_semantic_kept,
       CAST(SUM(s1 * lex * sem * (1 - bench)) AS BIGINT) AS n_unbenched,
       CAST(SUM(s1 * lex * sem * (1 - bench) * (1 - con)) AS BIGINT)
         AS n_final,
       CAST(SUM(n_tokens * s1 * lex * sem * (1 - bench) * (1 - con))
            AS BIGINT) AS final_tokens
FROM fl GROUP BY source ORDER BY source"""),

    // c06 = the complete export: train-split survivors -> token-budget
    // mixture on survivor volumes -> fixed-length sequence packing.
    // Budget VALUES and the sequence length come from the SAME
    // constants the Spark side uses (Mixture.ExportBudgets /
    // ExportSeqTokens).
    "c06_export_packed" -> (exportSeqCtes +
      "\nSELECT * FROM seqs ORDER BY source, seq_id"),

    // c08 = c06's CTE chain + the md5-keyed shard assignment and the
    // per-shard manifest aggregate (t07's portable md5-bucket formula
    // over source#seq_id).
    "c08_shard_manifest" -> (exportSeqCtes + """
, keyed AS (
  SELECT *, source || '#' || CAST(seq_id AS VARCHAR) AS k FROM seqs)
SELECT CAST((ascii(substr(md5(k), 1, 1)) * 1000
           + ascii(substr(md5(k), 2, 1)) * 100
           + ascii(substr(md5(k), 3, 1)) * 10
           + ascii(substr(md5(k), 4, 1))) % 8 AS BIGINT) AS shard_id,
       COUNT(*) AS n_seqs,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(seq_tokens) AS BIGINT) AS shard_tokens,
       MIN(md5(k)) AS first_pick
FROM keyed GROUP BY shard_id ORDER BY shard_id"""),

    // e03 shares e02's brute-force SQL: the LSH form's verification is
    // exact and its recall is measured 100% on the shipped corpora
    // (LshScaleGateSpec), so the emitted set IS the exact set. The 0.4
    // threshold here MUST equal Similarity.PairThreshold — gate,
    // catalog query, and this SQL all key off that one constant
    // (tables = Similarity.PairTables), so a parameter drift fails the
    // recall gate before it can turn probabilistic misses into a
    // confusing driver hash mismatch.
    "e03_cosine_lsh_pairs" -> ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT x.vec_id AS a, y.vec_id AS b,
       ROUND(list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) AS cosine
FROM e x JOIN e y ON x.vec_id < y.vec_id
WHERE ROUND(list_dot_product(x.v, y.v)
            / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.4
ORDER BY a, b"""),

    // e04: per-vector argmax over the >= 0.4 band. WHERE runs before
    // QUALIFY in DuckDB, but filter-then-argmax == argmax-then-filter
    // here: a vector whose best neighbor passes the floor has that
    // same best inside the filtered band.
    "e04_self_knn_bucketed" -> ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
  SELECT x.vec_id AS id, y.vec_id AS nn,
         ROUND(list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4)
           AS cosine
  FROM e x JOIN e y ON x.vec_id <> y.vec_id)
SELECT id, nn, cosine FROM c
WHERE cosine >= 0.4
QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY cosine DESC, nn) = 1
ORDER BY id"""),

    // e05/e06: exact pairs (e03's brute-force SQL — sound under the
    // same LshScaleGateSpec 100%-recall pin) + d05's recursive-CTE
    // min-label propagation. Singleton vectors are their own cluster.
    "e05_embedding_dup_clusters" -> ("""
WITH RECURSIVE ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM ev x JOIN ev y ON x.vec_id < y.vec_id
  WHERE ROUND(list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.4),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT vec_id AS node, vec_id AS label FROM embeddings
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a)
SELECT node AS vec_id, MIN(label) AS cluster_id
FROM r GROUP BY node ORDER BY vec_id"""),

    "e06_embedding_keep" -> ("""
WITH RECURSIVE ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM ev x JOIN ev y ON x.vec_id < y.vec_id
  WHERE ROUND(list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4) >= 0.4),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT vec_id AS node, vec_id AS label FROM embeddings
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
c AS (SELECT node AS vec_id, MIN(label) AS cluster_id FROM r GROUP BY node)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM c GROUP BY cluster_id ORDER BY cluster_id"""),

    "q25_filtered_dashboard" -> (star + """
, ag AS (
  SELECT *,
         CASE WHEN customer_age BETWEEN 18 AND 25 THEN 'Gen Z'
              WHEN customer_age BETWEEN 26 AND 41 THEN 'Millennials'
              WHEN customer_age BETWEEN 42 AND 57 THEN 'Gen X'
              WHEN customer_age BETWEEN 58 AND 76 THEN 'Boomers'
              WHEN customer_age BETWEEN 77 AND 90 THEN 'Silent Generation'
         END AS age_group
  FROM summary)
SELECT transaction_id, customer_id, customer_age, age_group, merchant_name, total_price
FROM ag
WHERE transaction_date >= DATE '1995-01-01' AND transaction_date <= DATE '1998-12-31'
  AND transaction_category = 'Purchase'
  AND customer_id IN (SELECT customer_id FROM customer_spending
                      WHERE spend_status = 'Medium Spenders')
  AND age_group = 'Millennials'
ORDER BY transaction_id, merchant_name, total_price"""),

    // STUB decoder outputs are md5-derived (md5 exists in DuckDB;
    // xxhash64 does not), so the multimodal plumbing is fully
    // hash-checkable despite the fake codec. The two planted
    // uncompressed-image rows take the REAL hand-parsed pixel path on
    // the Spark side; their oracle rows are GOLDEN literals computed
    // by an independent Python implementation of the pinned
    // PixelFixtures grid + format specs (DuckDB cannot hash blobs, so
    // literals are the honest cross-check).
    "m01_multimodal_decode" -> ("""
WITH a AS (SELECT doc_id AS asset_id, text, md5(text) AS h FROM documents)
SELECT asset_id,
       'image/fake' AS mime,
       CAST((ascii(substr(h,1,1))*1000 + ascii(substr(h,2,1))*100
             + ascii(substr(h,3,1))*10 + ascii(substr(h,4,1))) % 1920 + 1 AS INTEGER) AS width,
       CAST((ascii(substr(h,5,1))*1000 + ascii(substr(h,6,1))*100
             + ascii(substr(h,7,1))*10 + ascii(substr(h,8,1))) % 1080 + 1 AS INTEGER) AS height,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       CAST(((ascii(substr(md5(text || '0'),1,1))*1000 + ascii(substr(md5(text || '0'),2,1))*100
              + ascii(substr(md5(text || '0'),3,1))*10 + ascii(substr(md5(text || '0'),4,1))) % 2000
             - 1000) / 1000.0 AS FLOAT) AS f0
FROM a
UNION ALL SELECT 9000001, 'image/bmp', CAST(64 AS INTEGER),
       CAST(48 AS INTEGER), CAST(9270 AS INTEGER), CAST(0.44 AS FLOAT)
UNION ALL SELECT 9000002, 'image/x-portable-pixmap', CAST(40 AS INTEGER),
       CAST(30 AS INTEGER), CAST(3613 AS INTEGER), CAST(0.798 AS FLOAT)
ORDER BY asset_id"""),

    // ---- training-data pipeline extensions ----
    // (hash-based operators — minhash/simhash/ANN — have no SQL mirror
    //  and take the driver's weaker rows-only check)

    "d01_exact_dedup" -> ("""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents GROUP BY text ORDER BY doc_id"""),

    "j01_word_jaccard_pairs" -> ("""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents)
SELECT x.doc_id AS a, y.doc_id AS b,
       ROUND(1.0 * len(list_intersect(x.w, y.w))
             / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))), 4) AS jaccard
FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
WHERE 1.0 * len(list_intersect(x.w, y.w))
      / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7
ORDER BY a, b"""),

    "j02_fuzzy_name_pairs" -> ("""
SELECT a.c_custkey AS a, b.c_custkey AS b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a, b"""),

    // j03 = brute-force overlap coefficient (containment) ≥ 0.9 within
    // a source — the prefix-filtered containment join emits exactly
    // this set.
    "j03_containment_pairs" -> ("""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents)
SELECT x.doc_id AS a, y.doc_id AS b,
       ROUND(1.0 * len(list_intersect(x.w, y.w))
             / LEAST(len(x.w), len(y.w)), 4) AS containment
FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
WHERE 1.0 * len(list_intersect(x.w, y.w))
      / LEAST(len(x.w), len(y.w)) >= 0.9
ORDER BY a, b"""),

    // Brute-force SimHash oracle: recompute the md5-nibble packed
    // signature (token-hash bit j = bit (j%4) of hex nibble j/4 of
    // md5(token) — Dedup.simhashPackedPortable's exact convention,
    // packed as two 32-bit halves because DuckDB's << overflows at bit
    // 63), then the all-pairs Hamming ≤ 3 join. The banded operator is
    // pigeonhole-complete at its radius, so the exact join IS its
    // result set.
    "d03_simhash_neardups" -> ("""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
  FROM documents WHERE text IS NOT NULL),
sums AS (
  SELECT doc_id, j,
         SUM(CASE WHEN ((position(substr(md5(t), CAST(j // 4 AS INT) + 1, 1)
                          IN '0123456789abcdef') - 1)
                        >> CAST(j % 4 AS INT)) & 1 = 1
                  THEN 1 ELSE -1 END) AS c
  FROM toks, range(0, 64) r(j)
  GROUP BY doc_id, j),
sigs AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN c > 0 AND j < 32
                       THEN 1::BIGINT << CAST(j AS INT) ELSE 0 END)
              AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN c > 0 AND j >= 32
                       THEN 1::BIGINT << CAST(j - 32 AS INT) ELSE 0 END)
              AS BIGINT) AS hi
  FROM sums GROUP BY doc_id)
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi))
            AS INTEGER) AS hamming
FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) <= 3
ORDER BY a, b"""),

    // Data mixing: budgets VALUES are generated from the SAME constant
    // the Spark query uses (Mixture.DemoBudgets) — a budget drift
    // cannot desynchronize the two sides. The md5 arithmetic is the
    // t07 bucket at 10000 resolution; division/floor are single IEEE
    // double ops, identical across engines.
    "c04_token_mixture" -> (s"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) AS n_tokens
  FROM documents),
totals AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total FROM tok GROUP BY source),
budgets(source, token_budget) AS (VALUES
  ${graft.text.Mixture.DemoBudgets
      .map { case (src, b) => s"('$src', $b)" }.mkString(", ")}),
rates AS (
  SELECT t.source,
         CAST(floor(LEAST(CAST(1.0 AS DOUBLE),
                          CAST(token_budget AS DOUBLE) / total) * 10000)
              AS BIGINT) AS keep
  FROM totals t JOIN budgets b ON t.source = b.source)
SELECT doc_id, tok.source, n_tokens
FROM tok JOIN rates ON tok.source = rates.source
WHERE (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 10000 < keep
ORDER BY doc_id"""),

    // Upsampling mixture: floor(w) full epochs + a hash-sampled
    // fractional epoch; range(1, n+1) mirrors Spark's
    // explode(sequence(1, n)). Budgets from Mixture.EpochBudgets.
    "c05_mixture_epochs" -> (s"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INTEGER) AS n_tokens
  FROM documents),
totals AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total FROM tok GROUP BY source),
budgets(source, token_budget) AS (VALUES
  ${graft.text.Mixture.EpochBudgets
      .map { case (src, b) => s"('$src', $b)" }.mkString(", ")}),
rates AS (
  SELECT source,
         CAST(floor(w) AS BIGINT) AS n_full,
         CAST(floor((w - floor(w)) * 10000) AS BIGINT) AS frac10k
  FROM (SELECT t.source, CAST(token_budget AS DOUBLE) / total AS w
        FROM totals t JOIN budgets b ON t.source = b.source)),
n AS (
  SELECT doc_id, tok.source, n_tokens,
         n_full + CASE WHEN
           (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
            + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
            + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
            + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 10000
           < frac10k THEN 1 ELSE 0 END AS n_copies
  FROM tok JOIN rates ON tok.source = rates.source)
SELECT doc_id, source, n_tokens,
       unnest(range(1, n_copies + 1)) AS epoch
FROM n WHERE n_copies > 0
ORDER BY doc_id, epoch"""),

    "t01_token_stats" -> ("""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INTEGER) AS n_subwords,
       CASE WHEN len(toks) = 0 THEN 0.0
            ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
       END AS mean_token_len
FROM t ORDER BY doc_id"""),

    "t02_quality_scores" -> ("""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
c AS (
  SELECT doc_id, text, toks,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS punct_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS stopword_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl
  FROM t)
SELECT doc_id, punct_ratio, stopword_ratio,
       ROUND((least(length(text) / 500.0, 1.0)
              + CASE WHEN punct_ratio > 0.2 THEN 0.0 ELSE 1.0 - punct_ratio / 0.2 END
              + least(stopword_ratio * 4.0, 1.0)
              + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
         AS quality_score
FROM c ORDER BY doc_id"""),

    "t03_langid" -> ("""
WITH t AS (
  SELECT doc_id, lang,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
c AS (
  SELECT doc_id, lang,
         len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to'], x))) AS c_en,
         len(list_filter(toks, x -> list_contains(['el','la','de','que','y','los'], x))) AS c_es,
         len(list_filter(toks, x -> list_contains(['le','la','les','des','est','une'], x))) AS c_fr,
         len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS c_de
  FROM t)
SELECT doc_id, lang,
       CASE WHEN c_en = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'en'
            WHEN c_es = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'es'
            WHEN c_fr = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'fr'
            WHEN c_de = greatest(c_en, c_es, c_fr, c_de) AND greatest(c_en, c_es, c_fr, c_de) > 0 THEN 'de'
            ELSE 'und' END AS lang_pred
FROM c ORDER BY doc_id"""),

    "t04_fingerprints" -> ("""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id"""),

    "e01_self_knn" -> ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (
  SELECT x.vec_id AS id, y.vec_id AS nn,
         ROUND(list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 4)
           AS cosine
  FROM e x JOIN e y ON x.vec_id <> y.vec_id)
SELECT id, nn, cosine FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY cosine DESC, nn) = 1
ORDER BY id"""),

    "t05_top_bigrams" -> ("""
WITH t AS (
  SELECT string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
b AS (
  SELECT unnest(CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
                ELSE list_distinct(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) END) AS bigram
  FROM t)
SELECT bigram, COUNT(*) AS doc_freq FROM b
GROUP BY bigram ORDER BY doc_freq DESC, bigram LIMIT 50"""),

    "t06_source_stats" -> ("""
WITH t AS (
  SELECT source,
         len(string_split_regex(lower(trim(text)), '\s+')) AS n FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_tokens,
       CAST(MAX(n) AS INTEGER) AS max_tokens
FROM t GROUP BY source ORDER BY source"""),

    "t07_hash_split" -> ("""
WITH b AS (
  SELECT doc_id,
         (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
          + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 AS bucket
  FROM documents)
SELECT doc_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id"""),

    "d04_decontaminate" -> ("""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM tok WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT g FROM grams WHERE source IN ('src0', 'src1')),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_contaminated_grams
  FROM grams c JOIN bench b ON c.g = b.g
  WHERE c.source NOT IN ('src0', 'src1')
  GROUP BY c.doc_id)
SELECT doc_id, CAST(n_contaminated_grams AS BIGINT) AS n_contaminated_grams
FROM hits ORDER BY doc_id"""),


    // d11 = brute-force cross jaccard (j01's formula, corpus × bench),
    // aggregated to the per-doc verdict.
    "d11_fuzzy_decontaminate" -> ("""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT c.doc_id AS a,
         ROUND(1.0 * len(list_intersect(c.w, b.w))
               / (len(c.w) + len(b.w) - len(list_intersect(c.w, b.w))), 4)
           AS jaccard
  FROM t c JOIN t b ON c.source NOT IN ('src0', 'src1')
                   AND b.source IN ('src0', 'src1')
  WHERE 1.0 * len(list_intersect(c.w, b.w))
        / (len(c.w) + len(b.w) - len(list_intersect(c.w, b.w))) >= 0.9)
SELECT a AS doc_id, COUNT(*) AS n_bench_matches, MAX(jaccard) AS max_jaccard
FROM p GROUP BY a ORDER BY doc_id"""),

    // d16 = brute-force cross-corpus overlap coefficient (containment),
    // aggregated to the per-doc verdict — the asymmetric sibling of
    // d11's symmetric-jaccard check.
    "d16_containment_decontaminate" -> ("""
WITH t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT c.doc_id AS a,
         ROUND(1.0 * len(list_intersect(c.w, b.w))
               / LEAST(len(c.w), len(b.w)), 4) AS containment
  FROM t c JOIN t b ON c.source NOT IN ('src0', 'src1')
                   AND b.source IN ('src0', 'src1')
  WHERE 1.0 * len(list_intersect(c.w, b.w))
        / LEAST(len(c.w), len(b.w)) >= 0.9)
SELECT a AS doc_id, COUNT(*) AS n_bench_matches,
       MAX(containment) AS max_containment
FROM p GROUP BY a ORDER BY doc_id"""),

    // d12 = brute-force token-set jaccard over the SAME planted corpus
    // the Spark entry constructs (base docs with doc-unique tokens,
    // set-identical duplicates at id+1e9 for doc_id%7=0, sub-threshold
    // distractors at id+2e9 for doc_id%11=0). LSH recall over the
    // planted pairs is provably 1 (identical sets ⟹ identical
    // signatures ⟹ collide in every band) and verification is exact,
    // so brute force is a FULL pair-level oracle for the minhash
    // operator. The token join replaces the cross join: tokens are
    // cluster-disjoint by construction, so only true candidates meet.
    // Passage dedup: 10-token segments, first-occurrence keep
    // (min doc_id, seg_idx), docs reassembled in segment order.
    // DuckDB list slices are 1-based inclusive; string_agg skips the
    // NULLed dropped segments and orders within the group.
    "d14_segment_dedup" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
segs AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(toks[(i*10+1):(i*10+10)], ' ') AS seg
  FROM t, UNNEST(range(((len(toks)-1)//10) + 1)) AS u(i)),
ranked AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM segs),
reb AS (
  SELECT doc_id, COUNT(*) AS n_segs,
         CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
         string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx)
           AS t2
  FROM ranked GROUP BY doc_id)
SELECT doc_id, n_segs, n_dropped, md5(COALESCE(t2, '')) AS text_hash
FROM reb ORDER BY doc_id"""),

    // d15 = per-doc share of DISTINCT 5-grams present in >= 1 other
    // doc (a gram counts each containing doc once, so nd >= 2 means
    // "in another document"); the d04 grams convention verbatim.
    "d15_crossdoc_ngram_dup" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM t WHERE len(toks) >= 5),
c AS (SELECT g, COUNT(*) AS nd FROM g GROUP BY g)
SELECT g.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_shared_grams,
       ROUND(CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS dup_gram_ratio
FROM g JOIN c USING (g) GROUP BY g.doc_id ORDER BY g.doc_id"""),

    "t22_bm25_topk" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl FROM t),
st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM tok WHERE term IN ('hash', 'join', 'sort', 'merge')
  GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
s AS (
  SELECT tf.doc_id,
         LN(1 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)) AS sc
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st)
SELECT doc_id, ROUND(SUM(sc), 4) AS bm25,
       CAST(COUNT(*) AS BIGINT) AS n_matched_terms
FROM s GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20"""),

    // t23: exploded group-by formulation of the Gopher repetition
    // filters (the Spark side is a row-local sorted-run scan — same
    // semantics, opposite plan shape). Top-gram tie-break: count desc,
    // gram asc, matching the run scan over the ascending sort.
    "t23_gopher_repetition" -> ("""
WITH raw AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm0,
         string_split_regex(lower(trim(text)), '\s+') AS toks0
  FROM documents),
pl AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 AND len(toks0) >= 8
              THEN norm0 || ' ' || array_to_string(toks0[1:8], ' ')
              ELSE norm0 END AS norm
  FROM raw),
tok AS (
  SELECT doc_id, string_split(norm, ' ') AS toks, length(norm) AS tot
  FROM pl),
grams AS (
  SELECT doc_id, tot, 2 AS n,
         unnest(list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM tok WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id, tot, 3 AS n,
         unnest(list_transform(range(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
  FROM tok WHERE len(toks) >= 3
  UNION ALL
  SELECT doc_id, tot, 4 AS n,
         unnest(list_transform(range(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3])) AS gram
  FROM tok WHERE len(toks) >= 4
  UNION ALL
  SELECT doc_id, tot, 5 AS n,
         unnest(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4])) AS gram
  FROM tok WHERE len(toks) >= 5),
cnt AS (
  SELECT doc_id, tot, n, gram, COUNT(*) AS c, length(gram) AS glen
  FROM grams GROUP BY doc_id, tot, n, gram),
top AS (
  SELECT doc_id, tot, n, c, glen,
         row_number() OVER (PARTITION BY doc_id, n
                            ORDER BY c DESC, gram ASC) AS rn
  FROM cnt WHERE n IN (2, 3, 4)),
topv AS (
  SELECT doc_id,
         MAX(CASE WHEN n = 2 THEN ROUND(c * glen * 1.0 / tot, 4) END) AS t2,
         MAX(CASE WHEN n = 3 THEN ROUND(c * glen * 1.0 / tot, 4) END) AS t3,
         MAX(CASE WHEN n = 4 THEN ROUND(c * glen * 1.0 / tot, 4) END) AS t4
  FROM top WHERE rn = 1 GROUP BY doc_id),
dupv AS (
  SELECT doc_id,
         ROUND(LEAST(1.0, SUM(c * glen) * 1.0 / ANY_VALUE(tot)), 4) AS d5
  FROM cnt WHERE n = 5 AND c >= 2 GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(tv.t2, 0.0) AS top2_frac,
       COALESCE(tv.t3, 0.0) AS top3_frac,
       COALESCE(tv.t4, 0.0) AS top4_frac,
       COALESCE(dv.d5, 0.0) AS dup5_frac
FROM tok t LEFT JOIN topv tv USING (doc_id) LEFT JOIN dupv dv USING (doc_id)
ORDER BY t.doc_id"""),

    // t24: the derived-line corpus (5-token lines; planted "- " bullet
    // on lines opening with "the", " ..." ellipsis on lines closing
    // with "dup") reproduced verbatim, then the exploded line
    // group-by.
    "t24_line_stats" -> ("""
WITH tok AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents),
dec AS (
  SELECT doc_id,
         list_transform(
           string_split(regexp_replace(norm, '((?:\S+ ){4}\S+) ',
                                       '\1' || chr(10), 'g'), chr(10)),
           l -> CASE WHEN regexp_matches(l, '( |^)dup$') THEN
                  CASE WHEN regexp_matches(l, '^the( |$)')
                       THEN '- ' || l || ' ...' ELSE l || ' ...' END
                ELSE
                  CASE WHEN regexp_matches(l, '^the( |$)')
                       THEN '- ' || l ELSE l END
                END) AS ls
  FROM tok),
pl AS (
  SELECT doc_id,
         list_concat(ls, CASE WHEN doc_id % 3 = 0 THEN [ls[1]]
                              ELSE []::VARCHAR[] END) AS ls
  FROM dec),
ln AS (SELECT doc_id, unnest(ls) AS line FROM pl),
cnt AS (
  SELECT doc_id, line, COUNT(*) AS c, length(line) AS ll
  FROM ln GROUP BY doc_id, line),
agg AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd,
         SUM(CASE WHEN c >= 2 THEN c * ll ELSE 0 END) AS dchars,
         SUM(c * ll) AS tchars,
         SUM(CASE WHEN line LIKE '- %' THEN c ELSE 0 END) AS bl,
         SUM(CASE WHEN line LIKE '%...' THEN c ELSE 0 END) AS el
  FROM cnt GROUP BY doc_id)
SELECT doc_id, CAST(n AS INTEGER) AS n_lines,
       ROUND(1.0 - nd * 1.0 / n, 4) AS dup_line_frac,
       CASE WHEN tchars = 0 THEN 0.0
            ELSE ROUND(LEAST(1.0, dchars * 1.0 / tchars), 4)
       END AS dup_line_char_frac,
       ROUND(bl * 1.0 / n, 4) AS bullet_frac,
       ROUND(el * 1.0 / n, 4) AS ellipsis_frac
FROM agg ORDER BY doc_id"""),

    "t21_source_overlap" -> ("""
WITH t AS (
  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
g AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM t WHERE len(toks) >= 5),
c AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS n_shared_grams
  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.source_a, p.source_b,
       CAST(p.n_shared_grams AS BIGINT) AS n_shared_grams,
       ROUND(CAST(p.n_shared_grams AS DOUBLE)
             / (ca.n + cb.n - p.n_shared_grams), 4) AS jaccard
FROM p JOIN c ca ON p.source_a = ca.source
       JOIN c cb ON p.source_b = cb.source
ORDER BY p.source_a, p.source_b"""),

    // d18/d19 share the positioned-gram + cross-doc-mark CTE chain:
    // pos is the 0-based token index a gram starts at; dup means the
    // gram occurs in >= 2 distinct docs (min != max window, mirroring
    // the Spark form exactly).
    "d18_dup_span_stats" -> ("""
WITH t AS (
  SELECT doc_id,
         string_split_regex(
           regexp_replace(lower(text), '^\s+|\s+$', '', 'g'),
           '\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(range(1, len(toks) - 3)) - 1 AS pos,
         unnest(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4])) AS g
  FROM t WHERE len(toks) >= 5),
m AS (
  SELECT doc_id, pos,
         MIN(doc_id) OVER (PARTITION BY g)
           <> MAX(doc_id) OVER (PARTITION BY g) AS dup
  FROM g),
u AS (
  SELECT doc_id, pos,
         GREATEST(0, pos + 5 - GREATEST(pos,
           COALESCE(MAX(pos + 5) OVER (PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos)))
           AS contrib
  FROM m WHERE dup),
a AS (
  SELECT doc_id, COUNT(*) AS n_dup_grams, SUM(contrib) AS covered
  FROM u GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(a.covered, 0) AS BIGINT) AS covered_tokens,
       ROUND(CAST(COALESCE(a.covered, 0) AS DOUBLE) / len(t.toks), 4)
         AS dup_fraction
FROM t LEFT JOIN a USING (doc_id) ORDER BY t.doc_id"""),

    "d20_longest_dup_span" -> ("""
WITH t AS (
  SELECT doc_id,
         string_split_regex(
           regexp_replace(lower(text), '^\s+|\s+$', '', 'g'),
           '\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(range(1, len(toks) - 3)) - 1 AS pos,
         unnest(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4])) AS g
  FROM t WHERE len(toks) >= 5),
m AS (
  SELECT doc_id, pos,
         MIN(doc_id) OVER (PARTITION BY g)
           <> MAX(doc_id) OVER (PARTITION BY g) AS dup
  FROM g),
s AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + 5) OVER (PARTITION BY doc_id
           ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           -1) THEN 1 ELSE 0 END AS nw
  FROM m WHERE dup),
seg AS (
  SELECT doc_id, pos,
         SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sg
  FROM s),
b AS (
  SELECT doc_id, sg, MAX(pos) + 5 - MIN(pos) AS len
  FROM seg GROUP BY doc_id, sg),
a AS (
  SELECT doc_id, COUNT(*) AS nb, MAX(len) AS longest
  FROM b GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(a.nb, 0) AS BIGINT) AS n_dup_blocks,
       CAST(COALESCE(a.longest, 0) AS BIGINT) AS longest_dup_span
FROM t LEFT JOIN a USING (doc_id) ORDER BY t.doc_id"""),

    "d19_strip_dup_spans" -> ("""
WITH t AS (
  SELECT doc_id,
         string_split_regex(
           regexp_replace(lower(text), '^\s+|\s+$', '', 'g'),
           '\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(range(1, len(toks) - 3)) - 1 AS pos,
         unnest(list_transform(range(1, len(toks) - 3),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4])) AS g
  FROM t WHERE len(toks) >= 5),
m AS (
  SELECT doc_id, pos,
         MIN(doc_id) OVER (PARTITION BY g)
           <> MAX(doc_id) OVER (PARTITION BY g) AS dup
  FROM g),
cov AS (
  SELECT DISTINCT doc_id, pos + unnest(range(0, 5)) AS p
  FROM m WHERE dup),
tok AS (
  SELECT doc_id, unnest(range(1, len(toks) + 1)) - 1 AS tpos,
         unnest(toks) AS tok
  FROM t),
kept AS (
  SELECT k.doc_id, k.tpos, k.tok
  FROM tok k LEFT JOIN cov c ON k.doc_id = c.doc_id AND k.tpos = c.p
  WHERE c.p IS NULL),
a AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(t.toks) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN a USING (doc_id) ORDER BY t.doc_id"""),

    // d02 = the planted minhash corpus at shingleLen = 2 (bigram
    // shingles — the explode/hash-agg signature path; d12 pins the
    // 1-gram codegen path). The oracle reproduces the construction
    // and brute-forces bigram-set jaccard; the duplicate's different
    // SURFACE form (upper-case, double-spaced) normalizes to the same
    // bigram set, so the oracle uses the base token list for it.
    "d02_minhash_neardups" -> ("""
WITH ids AS (SELECT DISTINCT doc_id FROM documents),
corpus AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         list_transform(range(0, 10),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)) AS w
  FROM ids
  UNION ALL
  SELECT doc_id + 1000000000,
         list_transform(range(0, 10),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
  FROM ids WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000000,
         list_transform(range(0, 5),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
         || list_transform(range(0, 5),
           j -> 'u' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
  FROM ids WHERE doc_id % 11 = 0),
big AS (
  SELECT id, list_distinct(list_transform(range(1, len(w)),
           i -> w[i] || ' ' || w[i + 1])) AS g
  FROM corpus),
tok AS (SELECT id, len(g) AS n, unnest(g) AS t FROM big),
cand AS (
  SELECT x.id AS a, y.id AS b, COUNT(*) AS si, MAX(x.n) AS nx, MAX(y.n) AS ny
  FROM tok x JOIN tok y ON x.t = y.t AND x.id < y.id
  GROUP BY x.id, y.id)
SELECT a, b, ROUND(1.0 * si / (nx + ny - si), 4) AS jaccard
FROM cand
WHERE 1.0 * si / (nx + ny - si) >= 0.7
ORDER BY a, b"""),

    "d12_minhash_planted" -> ("""
WITH ids AS (SELECT DISTINCT doc_id FROM documents),
corpus AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         list_transform(range(0, 10),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)) AS w
  FROM ids
  UNION ALL
  SELECT doc_id + 1000000000,
         list_transform(range(0, 10),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
  FROM ids WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000000,
         list_transform(range(0, 5),
           j -> 't' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
         || list_transform(range(0, 5),
           j -> 'u' || CAST(doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR))
  FROM ids WHERE doc_id % 11 = 0),
tok AS (SELECT id, len(w) AS n, unnest(w) AS t FROM corpus),
cand AS (
  SELECT x.id AS a, y.id AS b, COUNT(*) AS si, MAX(x.n) AS nx, MAX(y.n) AS ny
  FROM tok x JOIN tok y ON x.t = y.t AND x.id < y.id
  GROUP BY x.id, y.id)
SELECT a, b, ROUND(1.0 * si / (nx + ny - si), 4) AS jaccard
FROM cand
WHERE 1.0 * si / (nx + ny - si) >= 0.7
ORDER BY a, b"""),

    // d09 = the bloom-prefiltered form of d04 — same exact output
    // (the bloom only prunes the join input), so the oracle is d04's
    // SQL verbatim.
    "d09_decontaminate_bloom" -> ("""
WITH tok AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
  FROM tok WHERE len(toks) >= 5),
bench AS (SELECT DISTINCT g FROM grams WHERE source IN ('src0', 'src1')),
hits AS (
  SELECT c.doc_id, COUNT(*) AS n_contaminated_grams
  FROM grams c JOIN bench b ON c.g = b.g
  WHERE c.source NOT IN ('src0', 'src1')
  GROUP BY c.doc_id)
SELECT doc_id, CAST(n_contaminated_grams AS BIGINT) AS n_contaminated_grams
FROM hits ORDER BY doc_id"""),

    "d05_dup_clusters" -> ("""
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a)
SELECT node AS doc_id, MIN(label) AS cluster_id
FROM r GROUP BY node ORDER BY doc_id"""),

    "d06_dedup_keep" -> ("""
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
cc AS (SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM cc GROUP BY cluster_id ORDER BY cluster_id"""),

    // d17 = the d05 recursive-CTE clustering joined to t02's quality
    // formula, representative = highest quality (min doc_id tie).
    "d17_quality_keep" -> ("""
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         list_distinct(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents),
p AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM t x JOIN t y ON x.source = y.source AND x.doc_id < y.doc_id
  WHERE 1.0 * len(list_intersect(x.w, y.w))
        / (len(x.w) + len(y.w) - len(list_intersect(x.w, y.w))) >= 0.7),
e AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
r AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.b AS node, r.label FROM r JOIN e ON r.node = e.a),
cc AS (SELECT node, MIN(label) AS cluster_id FROM r GROUP BY node),
tq AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
cq AS (
  SELECT doc_id, text, toks,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) / length(text)
         END AS punct_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, x -> list_contains(
                     ['the','a','an','of','to','and','in','is','it','that'], x))) AS DOUBLE)
                   / len(toks)
         END AS stopword_ratio,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks)
         END AS mwl
  FROM tq),
q AS (
  SELECT doc_id,
         ROUND((least(length(text) / 500.0, 1.0)
                + CASE WHEN punct_ratio > 0.2 THEN 0.0 ELSE 1.0 - punct_ratio / 0.2 END
                + least(stopword_ratio * 4.0, 1.0)
                + CASE WHEN mwl >= 3.0 AND mwl <= 8.0 THEN 1.0 ELSE 0.5 END) / 4.0, 4)
           AS quality_score
  FROM cq),
j AS (
  SELECT cc.cluster_id, cc.node AS doc_id, q.quality_score,
         ROW_NUMBER() OVER (PARTITION BY cc.cluster_id
           ORDER BY q.quality_score DESC, cc.node) AS rn,
         COUNT(*) OVER (PARTITION BY cc.cluster_id) AS n_members
  FROM cc JOIN q ON cc.node = q.doc_id)
SELECT cluster_id, doc_id AS keep_doc_id, quality_score AS keep_quality,
       CAST(n_members AS BIGINT) AS n_members
FROM j WHERE rn = 1 ORDER BY cluster_id"""),

    "t08_repetition" -> ("""
WITH tok AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN 0 ELSE len(toks) - 2 END AS n_grams,
         CASE WHEN len(toks) < 3 THEN 0
              ELSE len(list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) END AS n_distinct
  FROM tok)
SELECT doc_id, CAST(n_grams AS INTEGER) AS n_grams,
       CASE WHEN n_grams = 0 THEN 0.0
            ELSE ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) END AS rep_ratio
FROM g ORDER BY doc_id"""),

    "t09_tfidf" -> ("""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
  FROM documents),
tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.t,
         ROUND(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 4) AS tfidf
  FROM tf JOIN df USING (t) CROSS JOIN n)
SELECT doc_id, t AS term, tfidf FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, t) <= 3
ORDER BY doc_id, tfidf DESC, term"""),

    "t11_unigram_logprob" -> ("""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
  FROM documents),
cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
tot AS (SELECT COUNT(*) AS n FROM tok),
scored AS (
  SELECT tok.doc_id,
         CAST(ROUND(-ln(CAST(cnt.c AS DOUBLE) / tot.n) * 1000000) AS BIGINT) AS m
  FROM tok JOIN cnt USING (t) CROSS JOIN tot)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_nll
FROM scored GROUP BY doc_id ORDER BY doc_id"""),

    "q36_moving_avg" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS c
  FROM summary GROUP BY 1, 2)
SELECT transaction_category, transaction_date,
       CAST(c AS BIGINT) / 100.0 AS daily_revenue,
       ROUND(AVG(c) OVER w / 100.0, 4) AS ma7,
       CAST(MIN(c) OVER w AS BIGINT) / 100.0 AS min7,
       CAST(MAX(c) OVER w AS BIGINT) / 100.0 AS max7
FROM daily
WINDOW w AS (PARTITION BY transaction_category ORDER BY transaction_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY transaction_category, transaction_date"""),

    "q42_exists_users" -> ("""
SELECT DISTINCT e.user_id FROM events e
WHERE e.event_type = 'purchase'
  AND NOT EXISTS (SELECT 1 FROM events x
                  WHERE x.user_id = e.user_id AND x.event_type = 'error'
                    AND epoch_us(x.ts) > epoch_us(e.ts))
ORDER BY user_id"""),

    "q43_card_lists" -> (star + """
SELECT product_category,
       array_to_string(list_sort(list(DISTINCT transaction_card)), '|') AS cards,
       COUNT(DISTINCT transaction_card) AS n_cards
FROM summary GROUP BY product_category ORDER BY product_category"""),

    "q44_price_histogram" -> (star + """
, cts AS (SELECT CAST(ROUND(total_price * 100) AS BIGINT) AS __c FROM summary)
SELECT __c // 250000 AS bucket, COUNT(*) AS n,
       CAST(SUM(__c) AS BIGINT) / 100.0 AS revenue
FROM cts GROUP BY bucket ORDER BY bucket"""),

    "q45_conditional_agg" -> ("""
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 100.0) AS n_big,
       COUNT(*) FILTER (WHERE value <= 100.0) AS n_small,
       CAST(COALESCE(SUM(CAST(ROUND(value * 100) AS BIGINT))
                     FILTER (WHERE value > 100.0), 0) AS DOUBLE) / 100.0
         AS big_value
FROM events GROUP BY event_type ORDER BY event_type"""),

    "q46_token_positions" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
x AS (SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS token
      FROM t)
SELECT doc_id, pos, token FROM x WHERE pos < 5 ORDER BY doc_id, pos"""),

    "q47_revenue_windows" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS c
  FROM summary GROUP BY 1, 2)
SELECT transaction_category, transaction_date,
       CAST(c AS BIGINT) / 100.0 AS daily_revenue,
       ROUND(percent_rank() OVER byrev, 6) AS pct_rank,
       ROUND(cume_dist() OVER byrev, 6) AS cume,
       CAST(first_value(c) OVER bydate AS BIGINT) / 100.0 AS first_rev,
       CAST(last_value(c) OVER whole AS BIGINT) / 100.0 AS last_rev,
       CAST(nth_value(c, 3) OVER whole AS BIGINT) / 100.0 AS third_rev
FROM daily
WINDOW
  byrev AS (PARTITION BY transaction_category ORDER BY c, transaction_date),
  bydate AS (PARTITION BY transaction_category ORDER BY transaction_date
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
  whole AS (PARTITION BY transaction_category ORDER BY transaction_date
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY transaction_category, transaction_date"""),

    "q48_value_moments" -> ("""
WITH e AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS x,
         CAST(props->>'k' AS BIGINT) AS y
  FROM events),
m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
  FROM e GROUP BY event_type)
SELECT event_type, n,
       ROUND(CAST(sx AS DOUBLE) / n / 100.0, 6) AS mean_value,
       ROUND(SQRT(CAST(n*sxx - sx*sx AS DOUBLE) / (n*(n-1))) / 100.0, 6)
         AS stddev_value,
       ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
             / (SQRT(CAST(n*sxx - sx*sx AS DOUBLE))
                * SQRT(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr_vk
FROM m ORDER BY event_type"""),

    "q49_grouping_sets" -> (star + """
SELECT COALESCE(product_category, '(all)') AS product_category,
       COALESCE(transaction_card, '(all)') AS transaction_card,
       CAST(GROUPING(product_category) * 2
            + GROUPING(transaction_card) AS BIGINT) AS gid,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_price,
       COUNT(*) AS n
FROM summary
GROUP BY GROUPING SETS ((product_category), (transaction_card), ())
ORDER BY gid, product_category, transaction_card"""),

    "q50_gap_fill" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS c
  FROM summary WHERE transaction_date >= DATE '1998-01-01'
  GROUP BY 1, 2),
bounds AS (
  SELECT transaction_category, MIN(transaction_date) AS d0,
         MAX(transaction_date) AS d1
  FROM daily GROUP BY 1),
cal AS (
  SELECT transaction_category,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
           AS transaction_date
  FROM bounds)
SELECT cal.transaction_category, cal.transaction_date,
       (daily.c IS NULL) AS is_gap,
       CAST(last_value(daily.c IGNORE NULLS) OVER (
              PARTITION BY cal.transaction_category
              ORDER BY cal.transaction_date
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) / 100.0 AS revenue_ffill
FROM cal LEFT JOIN daily
  USING (transaction_category, transaction_date)
ORDER BY transaction_category, transaction_date"""),

    "q51_percentiles" -> (star + """
, cts AS (
  SELECT transaction_category,
         CAST(ROUND(total_price * 100) AS BIGINT) AS c
  FROM summary)
SELECT transaction_category,
       ROUND(quantile_cont(c, 0.25) / 100.0, 6) AS p25,
       ROUND(quantile_cont(c, 0.50) / 100.0, 6) AS p50,
       ROUND(quantile_cont(c, 0.75) / 100.0, 6) AS p75
FROM cts GROUP BY transaction_category ORDER BY transaction_category"""),

    "q52_cohort_retention" -> (star + """
, sm AS (
  SELECT customer_id, date_trunc('month', transaction_date)::DATE AS m
  FROM summary),
cohorts AS (SELECT customer_id, MIN(m) AS cohort FROM sm GROUP BY 1)
SELECT cohort, m,
       CAST(datediff('month', cohort, m) AS BIGINT) AS months_since,
       CAST(COUNT(DISTINCT sm.customer_id) AS BIGINT) AS n_active
FROM (SELECT DISTINCT customer_id, m FROM sm) sm
JOIN cohorts USING (customer_id)
GROUP BY cohort, m ORDER BY cohort, m"""),

    "s01_cosine_topk" -> ("""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       ROUND(list_dot_product(e.embedding::DOUBLE[], q.qe)
             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(q.qe, q.qe))), 4) AS cosine
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cosine DESC, e.vec_id LIMIT 10"""),

    // Planted-corpus ANN oracles: the exact brute-force top-10 over the
    // corpus-plus-ten-planted-query-copies frame (mirrors
    // Queries.plantedEmbeddings). The ten planted rows are the unique
    // exact answer (cosine 1.0 each), which every index family provably
    // returns — so one exact SQL oracles all four approximate
    // operators.
    "s06_ann_planted" -> PlantedTopKSql,
    "s07_ivf_planted" -> PlantedTopKSql,
    "s08_pq_planted" -> PlantedTopKSql,
    "s09_ivfpq_planted" -> PlantedTopKSql,

    // s02–s05: the same four index families at coarse/narrow
    // parameters over the independent vec_id-1 planting — one exact
    // SQL oracles all four (the planted ten are the unique top-10).
    "s02_ann_topk" -> PlantedTopKQ1Sql,
    "s03_ivf_topk" -> PlantedTopKQ1Sql,
    "s04_pq_topk" -> PlantedTopKQ1Sql,
    "s05_ivfpq_topk" -> PlantedTopKQ1Sql,

    // Planted BMP/PPM rows: thumb values are GOLDEN literals from an
    // independent Python implementation of the pinned box-filter
    // thumbnail spec (both fixtures downscale to a 32×24 PPM: 13-byte
    // header + 2304 raster bytes); frame md5s hash the documented
    // byte windows of the fixture bytes. The planted AVI row
    // (9000005) is the REAL video-frame path: its frame md5s hash the
    // PPM encodings of TRUE decoded pixels of evenly-strided frames
    // 0/3/6/9 (pinned time-varying grid, independent Python goldens);
    // its thumb is the 32-byte container window (thumbnail stays a
    // pixel-format/image concern).
    "m02_multimodal_frames" -> ("""
SELECT doc_id AS asset_id,
       CAST(strlen(substr(text, 1, 32)) AS INTEGER) AS thumb_bytes,
       md5(substr(text, 1, 32)) AS thumb_md5,
       CAST(4 AS INTEGER) AS n_frames,
       md5(substr(text, 1, 64)) AS frame0_md5,
       md5(substr(text, 193, 64)) AS frame3_md5
FROM documents
UNION ALL SELECT 9000001, CAST(2317 AS INTEGER),
       'dd5b0090f0e527b293ff02a9b24d1e22', CAST(4 AS INTEGER),
       '8f891045dcf270230627797d0a24f08e',
       '9cbdba840427cdc4c2485aa33a3382f3'
UNION ALL SELECT 9000002, CAST(2317 AS INTEGER),
       '63733e9a77ecdbaf82f162dae716cccf', CAST(4 AS INTEGER),
       '13d200f5794aa871eddbb86ce724d93b',
       '0971f0175f5d4d3d3a1ed1f215fd036e'
UNION ALL SELECT 9000005, CAST(32 AS INTEGER),
       'a5e25e076eb60568df19d1407b254501', CAST(4 AS INTEGER),
       '78b07fffa08696630effdbb4bfe25039',
       '704471c23af7f89aa03b0eb2a7b666f1'
UNION ALL SELECT 9000006, CAST(32 AS INTEGER),
       '957a27d5a50f498ba8a9c1c03da4da10', CAST(4 AS INTEGER),
       '14984daeb4550cbb8abb7a7e0f515882',
       '62e5b1dec71583e23c1d533165f66825'
ORDER BY asset_id"""),

    // m05: the four planted clips' features are GOLDEN literals from
    // independent Python implementations of the pinned integer
    // waveforms + the RIFF spec — two 16-bit PCM clips, and two IMA
    // ADPCM clips (a real compressed codec; bit-exact integer decode,
    // fixture bytes + features from tools/build_adpcm_fixture.py).
    // Energy / zero-crossings / peak / 4-window energy profile are
    // all exact integers by construction; text-derived assets can
    // never parse as WAV, so the result is exactly these rows.
    "m05_audio_features" -> ("""
SELECT * FROM (VALUES
  (9000003, CAST(1 AS INTEGER), CAST(8000 AS INTEGER), CAST(1600 AS BIGINT),
   CAST(2107929559 AS BIGINT), CAST(29 AS BIGINT), CAST(2000 AS INTEGER),
   CAST(511084143 AS BIGINT), CAST(572063600 AS BIGINT),
   CAST(538722432 AS BIGINT), CAST(486059384 AS BIGINT)),
  (9000004, CAST(2 AS INTEGER), CAST(16000 AS INTEGER), CAST(2048 AS BIGINT),
   CAST(2605217128 AS BIGINT), CAST(119 AS BIGINT), CAST(1500 AS INTEGER),
   CAST(649997320 AS BIGINT), CAST(650991842 AS BIGINT),
   CAST(651821801 AS BIGINT), CAST(652406165 AS BIGINT)),
  (9000007, CAST(1 AS INTEGER), CAST(8000 AS INTEGER), CAST(2020 AS BIGINT),
   CAST(930336102 AS BIGINT), CAST(21 AS BIGINT), CAST(1259 AS INTEGER),
   CAST(220669245 AS BIGINT), CAST(252484128 AS BIGINT),
   CAST(247402795 AS BIGINT), CAST(209779934 AS BIGINT)),
  (9000008, CAST(2 AS INTEGER), CAST(16000 AS INTEGER), CAST(996 AS BIGINT),
   CAST(444316714 AS BIGINT), CAST(34 AS BIGINT), CAST(949 AS INTEGER),
   CAST(106832171 AS BIGINT), CAST(112784106 AS BIGINT),
   CAST(106563163 AS BIGINT), CAST(118137274 AS BIGINT)))
  AS t(asset_id, channels, sample_rate_hz, n_frames, energy,
       zero_crossings, peak, w0, w1, w2, w3)
ORDER BY asset_id"""),

    // m03's embedding-level dedup: identical content ⇒ identical
    // byte-n-gram feature vector (and distinct content ⇒ distinct
    // vector on these corpora), so vector-equality groups ≡ md5(text)
    // groups — a full oracle for the REAL embedding path. The planted
    // exact copies (every 50th doc at id+1000000) mirror the Spark
    // side's construction verbatim.
    "m03_embed_content_dedup" -> ("""
WITH p AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents
           WHERE doc_id % 50 = 0),
a AS (SELECT doc_id AS asset_id, md5(text) AS h FROM p),
g AS (SELECT h, min(asset_id) AS rep_id, count(*) AS group_size
      FROM a GROUP BY h)
SELECT a.asset_id, g.rep_id, g.group_size
FROM a JOIN g USING (h) ORDER BY asset_id"""),

    // m04's planted mutation→source retrieval: each mutated asset's
    // argmax-cosine corpus match is its true source (margin measured
    // in FeatureHashSpec), so the planted mapping IS the result.
    "m04_embed_mutation_source" -> ("""
SELECT doc_id + 2000000 AS query_id, doc_id AS src_id
FROM documents WHERE doc_id % 37 = 0 ORDER BY query_id"""),

    // d13's embedding-space decontamination: brute-force cross cosine
    // between the held-out benchmark slice and the rest, same rounding
    // discipline as e03.
    "d13_embed_decontaminate" -> ("""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT c.vec_id,
         ROUND(list_dot_product(b.v, c.v)
               / (sqrt(list_dot_product(b.v, b.v))
                  * sqrt(list_dot_product(c.v, c.v))), 4) AS cosine
  FROM e b, e c
  WHERE b.vec_id % 10 = 0 AND c.vec_id % 10 <> 0)
SELECT vec_id, COUNT(*) AS n_bench_hits, MAX(cosine) AS max_cosine
FROM p WHERE cosine >= 0.4 GROUP BY vec_id ORDER BY vec_id"""),

    // Multi-way TPC-H-style joins. Revenue mirrors the Spark side's
    // integer domain: cents(extendedprice) × (100 − discount%) summed
    // exactly, one division at the end. DuckDB widens BIGINT sums to
    // HUGEINT — cast back before the division so types match Spark.
    "q53_regional_revenue" -> ("""
SELECT r_name AS region, n_name AS nation,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY region, nation"""),

    "q71_yoy_spend_diff" -> ("""
WITH a AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS ca,
         COUNT(*) AS na
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
  GROUP BY o_custkey),
b AS (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cb,
         COUNT(*) AS nb
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
  GROUP BY o_custkey)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       COALESCE(ca, 0) / 100.0 AS spend_1997,
       COALESCE(cb, 0) / 100.0 AS spend_1998,
       (COALESCE(cb, 0) - COALESCE(ca, 0)) / 100.0 AS delta,
       CAST(COALESCE(na, 0) AS BIGINT) AS n_orders_1997,
       CAST(COALESCE(nb, 0) AS BIGINT) AS n_orders_1998
FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
ORDER BY custkey"""),

    "q69_nation_profit" -> ("""
SELECT n_name AS nation,
       EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              - CAST(ROUND(p_retailprice * 100) AS BIGINT)
                * CAST(ROUND(l_quantity) AS BIGINT) * 100) AS BIGINT)
         / 10000.0 AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY nation, o_year"""),

    "q70_nation_trade" -> ("""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""),

    "q54_shipping_priority" -> ("""
SELECT l_orderkey AS orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority AS priority,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, orderkey LIMIT 10"""),

    "q55_returned_revenue" -> ("""
SELECT c_custkey AS custkey, c_name AS customer_name, n_name AS nation,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT)
         / 10000.0 AS lost_revenue,
       COUNT(*) AS n_returned
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, custkey LIMIT 20"""),

    "q56_promo_share" -> ("""
WITH m AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
             ELSE 0 END) AS promo,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1)
SELECT ship_month,
       CAST(promo AS BIGINT) / 10000.0 AS promo_revenue,
       ROUND(100.0 * CAST(promo AS BIGINT) / CAST(total AS BIGINT), 6)
         AS promo_pct
FROM m ORDER BY ship_month"""),

    "q57_range_frame" -> (star + """
, daily AS (
  SELECT transaction_category, transaction_date,
         datediff('day', DATE '1990-01-01', transaction_date) AS day_n,
         CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) AS c
  FROM summary GROUP BY 1, 2, 3)
SELECT transaction_category, transaction_date,
       c / 100.0 AS daily_revenue,
       CAST(SUM(c) OVER w AS BIGINT) / 100.0 AS rev7d,
       COUNT(*) OVER w AS n7d
FROM daily
WINDOW w AS (PARTITION BY transaction_category ORDER BY day_n
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY transaction_category, transaction_date"""),

    "q58_keyset_page" -> (star + """
SELECT transaction_id, product_id, merchant_id, total_price
FROM summary
WHERE (transaction_id, product_id, merchant_id) > ('3000-1', 0, 0)
ORDER BY transaction_id, product_id, merchant_id, total_price
LIMIT 50"""),

    "q59_calendar_funcs" -> (star + """
SELECT date_trunc('quarter', transaction_date)::DATE AS quarter_start,
       CAST(quarter(transaction_date) AS INTEGER) AS q,
       CAST(weekofyear(transaction_date) AS INTEGER) AS iso_week,
       CAST(dayofweek(transaction_date) + 1 AS INTEGER) AS dow,
       last_day(transaction_date) AS month_end,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) / 100.0
         AS revenue
FROM summary
GROUP BY 1, 2, 3, 4, 5
ORDER BY quarter_start, iso_week, dow"""),

    "q60_null_semantics" -> (star + """
, ag AS (
  SELECT transaction_id, customer_id, transaction_category,
         CASE WHEN customer_age BETWEEN 18 AND 25 THEN 'Gen Z'
              WHEN customer_age BETWEEN 26 AND 41 THEN 'Millennials'
              WHEN customer_age BETWEEN 42 AND 57 THEN 'Gen X'
              WHEN customer_age BETWEEN 58 AND 76 THEN 'Boomers'
              WHEN customer_age BETWEEN 77 AND 90 THEN 'Silent Generation'
         END AS age_group
  FROM summary)
SELECT COALESCE(age_group, '(unbucketed)') AS age_or_default,
       COUNT(*) AS n,
       COUNT(NULLIF(transaction_category, 'Refund')) AS n_purchases,
       CAST(SUM(CASE WHEN age_group IS NOT DISTINCT FROM 'Gen Z'
                THEN 1 ELSE 0 END) AS BIGINT) AS n_gen_z
FROM ag GROUP BY 1 ORDER BY age_or_default"""),

    "q61_json_typed" -> ("""
SELECT event_type,
       COUNT(CAST(props->>'k' AS BIGINT)) AS n_parsed,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type"""),

    "q62_topk_per_group" -> (star + """
, rev AS (
  SELECT merchant_category, merchant_name,
         CAST(SUM(CAST(ROUND(total_price * 100) AS BIGINT)) AS BIGINT) AS rev
  FROM summary GROUP BY 1, 2),
rk AS (
  SELECT merchant_category, merchant_name, rev,
         ROW_NUMBER() OVER (PARTITION BY merchant_category
                            ORDER BY rev DESC, merchant_name) AS rank
  FROM rev)
SELECT merchant_category, CAST(rank AS BIGINT) AS rank, merchant_name,
       rev / 100.0 AS revenue
FROM rk WHERE rank <= 3
ORDER BY merchant_category, rank"""),

    // Mirrors graft.functions.DigestBuckets exactly: decimal
    // log-buckets by (digit count, leading two digits) — pure
    // integer/string math, no float log, so the bucket index and the
    // midpoint representative match the Scala sketch bit-for-bit
    // (cents here are all positive; the Scala side also mirrors
    // negatives, unused by this query).
    "q63_quantile_sketch" -> (star + """
, cts AS (
  SELECT transaction_category,
         CAST(ROUND(total_price * 100) AS BIGINT) AS v
  FROM summary),
b AS (
  SELECT transaction_category,
         CASE WHEN v < 10 THEN v
              ELSE 10 + (LENGTH(CAST(v AS VARCHAR)) - 2) * 90
                   + CAST(SUBSTR(CAST(v AS VARCHAR), 1, 2) AS BIGINT) - 10
         END AS idx,
         COUNT(*) AS c
  FROM cts GROUP BY 1, 2),
cum AS (
  SELECT transaction_category, idx,
         SUM(c) OVER (PARTITION BY transaction_category ORDER BY idx) AS cum,
         SUM(c) OVER (PARTITION BY transaction_category) AS n
  FROM b),
r AS (
  SELECT transaction_category, cum, n,
         CASE WHEN idx < 10 THEN idx
              ELSE ((10 + (idx - 10) % 90)
                      * CAST(POWER(10, (idx - 10) // 90) AS BIGINT) * 2
                    + CAST(POWER(10, (idx - 10) // 90) AS BIGINT) - 1) // 2
         END AS rep
  FROM cum)
SELECT transaction_category,
       MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.50 * n) AS BIGINT), 1)
                THEN rep END) / 100.0 AS p50,
       MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.90 * n) AS BIGINT), 1)
                THEN rep END) / 100.0 AS p90,
       MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.99 * n) AS BIGINT), 1)
                THEN rep END) / 100.0 AS p99
FROM r GROUP BY transaction_category
ORDER BY transaction_category"""),

    // Exact form of q64's under-capacity KMV answers: distinct count
    // per category + Jaccard overlap with the union of the rest.
    "q64_kmv_overlap" -> (star + """
, kmvc AS (
  SELECT DISTINCT transaction_category, customer_id FROM summary),
kmvn AS (
  SELECT transaction_category, CAST(COUNT(*) AS BIGINT) AS n_customers
  FROM kmvc GROUP BY 1),
kmvr AS (
  SELECT a.transaction_category,
         CAST(COUNT(DISTINCT b.customer_id) AS BIGINT) AS rest_n
  FROM kmvn a JOIN kmvc b
    ON b.transaction_category <> a.transaction_category
  GROUP BY 1),
kmvi AS (
  SELECT a.transaction_category, CAST(COUNT(*) AS BIGINT) AS inter_n
  FROM kmvc a
  WHERE EXISTS (SELECT 1 FROM kmvc b
                WHERE b.customer_id = a.customer_id
                  AND b.transaction_category <> a.transaction_category)
  GROUP BY 1)
SELECT kmvn.transaction_category, kmvn.n_customers,
       CAST(COALESCE(inter_n, 0) AS DOUBLE)
         / CAST(kmvn.n_customers + rest_n - COALESCE(inter_n, 0) AS DOUBLE)
         AS jaccard_vs_rest
FROM kmvn JOIN kmvr USING (transaction_category)
LEFT JOIN kmvi USING (transaction_category)
ORDER BY transaction_category"""),

    "q65_uncontacted_customers" -> ("""
WITH pos AS (
  SELECT c_custkey, c_nationkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_acctbal > 0.0),
tot AS (SELECT SUM(bal_c) AS s, COUNT(*) AS n FROM pos)
SELECT c_nationkey AS nation_id,
       COUNT(*) AS n_customers,
       SUM(bal_c) / 100.0 AS total_acctbal
FROM pos, tot
WHERE bal_c * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pos.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY nation_id"""),

    "q66_small_quantity_revenue" -> ("""
SELECT l.l_partkey AS partkey,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS small_revenue
FROM lineitem l
WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 *
        (SELECT COUNT(*) FROM lineitem x WHERE x.l_partkey = l.l_partkey)
      < (SELECT SUM(CAST(ROUND(x.l_quantity * 100) AS BIGINT))
         FROM lineitem x WHERE x.l_partkey = l.l_partkey)
GROUP BY l.l_partkey ORDER BY partkey"""),

    "q67_sole_returned_supplier" -> ("""
SELECT s.s_name AS supplier, COUNT(*) AS n_items
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name ORDER BY supplier"""),

    "q68_large_orders" -> ("""
SELECT c.c_name AS customer_name, o.o_orderkey AS orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) / 100.0 AS totalprice,
       CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
         / 100.0 AS total_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN
      (SELECT l_orderkey FROM lineitem
       GROUP BY l_orderkey
       HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 25000)
GROUP BY c.c_name, o.o_orderkey, CAST(o.o_orderdate AS DATE),
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
ORDER BY totalprice DESC, orderkey
LIMIT 100"""),

    "t12_sequence_packing" -> ("""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS tok
  FROM documents),
c AS (
  SELECT source, doc_id, tok,
         SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT source, CAST(FLOOR((cum - tok) / 2048.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM c GROUP BY source, seq_id
ORDER BY source, seq_id"""),

    "t13_oov_rate" -> ("""
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents),
vocab AS (
  SELECT tok FROM toks GROUP BY tok HAVING COUNT(DISTINCT doc_id) >= 5)
SELECT t.doc_id, t.source,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id, t.source
ORDER BY t.doc_id"""),

    "d07_stratified_sample" -> ("""
WITH h AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS pick_hash,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS rn
  FROM documents)
SELECT source, doc_id, pick_hash, CAST(rn AS BIGINT) AS sample_rank
FROM h WHERE rn <= 5
ORDER BY source, sample_rank"""),

    // t14 = the stepwise scrub: each pattern counts + replaces on the
    // PREVIOUS step's output, exactly like TextFunctions.redact's fold
    // (patterns shared via RedactPatterns — drift fails the hash).
    "t14_redaction" -> {
      val p = graft.text.TextFunctions.RedactPatterns.toMap
      s"""
WITH s1 AS (
  SELECT c_custkey,
         len(regexp_extract_all(c_name, '${p("email")}')) AS n1,
         regexp_replace(c_name, '${p("email")}', '[REDACTED]', 'g') AS t1
  FROM customer),
s2 AS (
  SELECT c_custkey, n1,
         len(regexp_extract_all(t1, '${p("hex_id")}')) AS n2,
         regexp_replace(t1, '${p("hex_id")}', '[REDACTED]', 'g') AS t2
  FROM s1),
s3 AS (
  SELECT c_custkey, n1, n2,
         len(regexp_extract_all(t2, '${p("digit_run")}')) AS n3,
         regexp_replace(t2, '${p("digit_run")}', '[REDACTED]', 'g') AS t3
  FROM s2)
SELECT c_custkey, t3 AS redacted_name,
       CAST(n1 + n2 + n3 AS BIGINT) AS n_redacted
FROM s3 ORDER BY c_custkey"""
    },

    // Frozen hashed-BoW logistic classifier: the same micro-unit
    // integer weights the Spark entry uses (shared source of truth),
    // margin as an exact BIGINT sum over md5-bucketed tokens.
    "t17_quality_classifier" -> {
      val w = graft.text.TextClassifier.DefaultWeightsMicro
        .mkString("[", ", ", "]")
      val b = graft.text.TextClassifier.DefaultBiasMicro
      s"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents),
h AS (
  SELECT doc_id,
         (ascii(substr(md5(t), 1, 1)) * 1000
          + ascii(substr(md5(t), 2, 1)) * 100
          + ascii(substr(md5(t), 3, 1)) * 10
          + ascii(substr(md5(t), 4, 1))) % 64 AS h
  FROM tok),
m AS (
  SELECT doc_id, SUM(($w)[h + 1]) + ($b) AS mi FROM h GROUP BY doc_id)
SELECT doc_id, CAST(mi AS BIGINT) AS score_micro,
       CAST(mi > 0 AS BIGINT) AS pred,
       ROUND(1.0 / (1.0 + exp(-(CAST(mi AS DOUBLE) / 1000000.0))), 4)
         AS q_prob
FROM m ORDER BY doc_id"""
    },

    // t20 = interpolated Kneser–Ney bigram NLL: identical count
    // relations (dense_rank stands in for distinct-count windows, as
    // in Spark) and an identically-associated double expression on
    // the 1e-6 grid.
    "t20_kneser_ney" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
w AS (
  SELECT doc_id, split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2
  FROM bg),
tt AS (SELECT COUNT(*) AS t FROM (SELECT DISTINCT w1, w2 FROM w)),
cnt AS (
  SELECT doc_id, w1, w2,
         COUNT(*) OVER (PARTITION BY w1) AS c1,
         MAX(dr1) OVER (PARTITION BY w1) AS n1f,
         COUNT(*) OVER (PARTITION BY w1, w2) AS cb,
         MAX(dr2) OVER (PARTITION BY w2) AS n1b
  FROM (SELECT doc_id, w1, w2,
               DENSE_RANK() OVER (PARTITION BY w1 ORDER BY w2) AS dr1,
               DENSE_RANK() OVER (PARTITION BY w2 ORDER BY w1) AS dr2
        FROM w)),
m AS (
  SELECT doc_id,
         CAST(ROUND(-ln(
           ((cb - 0.75) + (0.75 * n1f) * (CAST(n1b AS DOUBLE) / tt.t)) / c1)
           * 1000000) AS BIGINT) AS m
  FROM cnt CROSS JOIN tt)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_kn_nll
FROM m GROUP BY doc_id ORDER BY doc_id"""),

    // t19 = t17's margin CTE × t02's quality formula, confusion
    // counts + Mann–Whitney rank-sum AUC with average tie ranks; NULL
    // where a metric is undefined.
    "t19_classifier_eval" -> classifierEvalSql,

    // Round-13 driver bisect of the t19 red row (see Queries.scala):
    // fresh catalog keys over the SAME shared SQL fragments.
    "t19a_confusion" -> (classifierScoredSql + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(SUM(CASE WHEN pred AND NOT label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(SUM(CASE WHEN NOT pred AND label THEN 1 ELSE 0 END) AS BIGINT) AS fn
FROM s GROUP BY source ORDER BY source"""),

    "t19b_ranksum" -> (classifierScoredSql + classifierRankSql + """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(SUM(CASE WHEN label THEN r2 END) AS BIGINT) AS rp2
FROM r GROUP BY source ORDER BY source"""),

    "t19c_eval_v2" -> classifierEvalSql,

    // Round-14 per-metric bisect keys over the SAME shared `a` CTE —
    // see the t19d–t19j catalog comments in Queries.scala for the
    // outcome decoding and the HUGEINT root cause.
    "t19d_numden" -> (classifierAggSql + """
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_correct AS BIGINT) AS n_correct,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(rp2 AS BIGINT) AS rp2,
       CAST(2*tp + fp + fn AS BIGINT) AS f1_den,
       CAST(rp2 - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
       CAST(2 * n_pos * (n_docs - n_pos) AS BIGINT) AS auc_den
FROM a ORDER BY source"""),

    "t19e_acc" -> (classifierAggSql + """
SELECT source, CAST((20000 * n_correct + n_docs) // (2 * n_docs)
            AS BIGINT) AS accuracy_e4
FROM a ORDER BY source"""),

    "t19f_prec" -> (classifierAggSql + """
SELECT source,
       CASE WHEN tp + fp > 0
            THEN CAST((20000 * tp + tp + fp) // (2 * (tp + fp)) AS BIGINT)
       END AS prec_e4
FROM a ORDER BY source"""),

    "t19g_rec" -> (classifierAggSql + """
SELECT source,
       CASE WHEN n_pos > 0
            THEN CAST((20000 * tp + n_pos) // (2 * n_pos) AS BIGINT)
       END AS recall_e4
FROM a ORDER BY source"""),

    "t19h_f1" -> (classifierAggSql + """
SELECT source,
       CASE WHEN 2*tp + fp + fn > 0
            THEN CAST((20000 * 2 * tp + (2*tp + fp + fn))
                      // (2 * (2*tp + fp + fn)) AS BIGINT)
       END AS f1_e4
FROM a ORDER BY source"""),

    "t19i_auc" -> (classifierAggSql + """
SELECT source,
       CASE WHEN n_pos > 0 AND n_pos < n_docs
            THEN CAST((20000 * (rp2 - n_pos * (n_pos + 1))
                       + 2 * n_pos * (n_docs - n_pos))
                      // (4 * n_pos * (n_docs - n_pos)) AS BIGINT)
       END AS auc_e4
FROM a ORDER BY source"""),

    // Mechanism probe: the HUGEINT sum left bare ON PURPOSE (the only
    // one in the catalog) vs Spark's DOUBLE — green ⟺ the t19 red was
    // the int64-vs-float64 representation, not the values.
    "t19j_hugeint_repr" -> (classifierAggSql + """
SELECT source, n_pos AS n_pos_f
FROM a ORDER BY source"""),

    // The histogram formulation computes the IDENTICAL report, so it
    // shares t19's oracle verbatim — one oracle, two Spark plans.
    "t25_eval_histogram" -> classifierEvalSql,

    // Temperature mixing: shares/budgets on the exact integer grid
    // (sqrt is correctly rounded IEEE; the budget is one integer
    // multiply + integer divide, so both engines agree bit-for-bit).
    "c09_temperature_mixture" -> {
      val t = graft.text.Mixture.TemperatureBudget
      s"""
WITH tot AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source),
w AS (
  SELECT source, n_tokens,
         CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
           AS w_micro
  FROM tot),
s AS (SELECT SUM(w_micro) AS sw FROM w)
SELECT source, n_tokens, w_micro,
       ROUND(CAST(w_micro AS DOUBLE) / sw, 6) AS sample_share,
       CAST(w_micro * $t // sw AS BIGINT) AS budget_tokens
FROM w CROSS JOIN s ORDER BY source"""
    },

    // DSIR importance selection: add-1-smoothed unigram log-likelihood
    // ratio on the 1e-6 integer grid (the t11 discipline), top slice
    // by (score desc, id).
    "c10_importance_select" -> {
      val tgt = graft.text.Mixture.DsirTargetSource
      val k = graft.text.Mixture.DsirTopK
      s"""
WITH tok AS (
  SELECT doc_id, source = '$tgt' AS t,
         unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
  FROM documents),
tot AS (
  SELECT SUM(CASE WHEN t THEN 1 ELSE 0 END) AS nt,
         SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS nr,
         COUNT(DISTINCT w) AS v
  FROM tok),
cnt AS (
  SELECT w, SUM(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cr
  FROM tok GROUP BY w),
m AS (
  SELECT tok.doc_id,
         CAST(ROUND((ln((ct + 1.0) / (nt + v)) - ln((cr + 1.0) / (nr + v)))
              * 1000000) AS BIGINT) AS m
  FROM tok JOIN cnt USING (w) CROSS JOIN tot WHERE NOT tok.t)
SELECT doc_id, COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS logratio
FROM m GROUP BY doc_id
ORDER BY logratio DESC, doc_id LIMIT $k"""
    },

    // CCNet perplexity terciles: t16's bigram-NLL scorer verbatim,
    // wrapped in ANSI NTILE(3) per language under the deterministic
    // (mean_nll, doc_id) total order.
    "c11_perplexity_buckets" -> ("""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM t),
ucnt AS (SELECT t, COUNT(*) AS ca FROM tok GROUP BY t),
v AS (SELECT COUNT(*) AS v FROM ucnt),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
bgw AS (SELECT doc_id, lang, bg, split_part(bg, ' ', 1) AS w1 FROM bg),
bcnt AS (SELECT bg, COUNT(*) AS cb FROM bgw GROUP BY bg),
scored AS (
  SELECT bgw.doc_id, bgw.lang,
         CAST(ROUND(-ln((bcnt.cb + 1.0) / (ucnt.ca + v.v)) * 1000000)
              AS BIGINT) AS m
  FROM bgw JOIN bcnt USING (bg) JOIN ucnt ON ucnt.t = bgw.w1 CROSS JOIN v),
docscore AS (
  SELECT doc_id, lang,
         ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_nll
  FROM scored GROUP BY doc_id, lang)
SELECT doc_id, lang, mean_nll,
       NTILE(3) OVER (PARTITION BY lang ORDER BY mean_nll, doc_id)
         AS ppl_bucket
FROM docscore ORDER BY doc_id"""),

    // c12 = c11's NTILE gate (keep terciles 1-2) composed with c04's
    // budget mixture over the survivors.
    "c12_perplexity_gated_mixture" -> (s"""
WITH t AS (
  SELECT doc_id, lang, source,
         string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents),
wtok AS (SELECT doc_id, unnest(toks) AS w FROM t),
ucnt AS (SELECT w, COUNT(*) AS ca FROM wtok GROUP BY w),
v AS (SELECT COUNT(*) AS v FROM ucnt),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
bgw AS (SELECT doc_id, lang, bg, split_part(bg, ' ', 1) AS w1 FROM bg),
bcnt AS (SELECT bg, COUNT(*) AS cb FROM bgw GROUP BY bg),
scored AS (
  SELECT bgw.doc_id, bgw.lang,
         CAST(ROUND(-ln((bcnt.cb + 1.0) / (ucnt.ca + v.v)) * 1000000)
              AS BIGINT) AS m
  FROM bgw JOIN bcnt USING (bg) JOIN ucnt ON ucnt.w = bgw.w1 CROSS JOIN v),
docscore AS (
  SELECT doc_id, lang,
         ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_nll
  FROM scored GROUP BY doc_id, lang),
gated AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           NTILE(3) OVER (PARTITION BY lang ORDER BY mean_nll, doc_id)
             AS ppl_bucket
    FROM docscore) WHERE ppl_bucket <= 2),
tok2 AS (
  SELECT t.doc_id, t.source, CAST(len(t.toks) AS INTEGER) AS n_tokens
  FROM t JOIN gated USING (doc_id)),
totals AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS total
  FROM tok2 GROUP BY source),
budgets(source, token_budget) AS (VALUES
  ${graft.text.Mixture.DemoBudgets
      .map { case (src, b) => s"('$src', $b)" }.mkString(", ")}),
rates AS (
  SELECT t.source,
         CAST(floor(LEAST(CAST(1.0 AS DOUBLE),
                          CAST(token_budget AS DOUBLE) / total) * 10000)
              AS BIGINT) AS keep
  FROM totals t JOIN budgets b ON t.source = b.source)
SELECT doc_id, tok2.source, n_tokens
FROM tok2 JOIN rates ON tok2.source = rates.source
WHERE (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 1000
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 100
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 10
       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 10000 < keep
ORDER BY doc_id"""),

    // Per-source BPE compression under the same frozen replace chain
    // as t15.
    "t18_bpe_source_stats" -> {
      val start =
        """regexp_replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '(.)', '|\1|', 'g')"""
      val chain = graft.text.Bpe.DefaultMerges.foldLeft(start) {
        case (acc, (a, b)) => s"replace($acc, '|$a||$b|', '|$a$b|')"
      }
      s"""
WITH enc AS (
  SELECT source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         $chain AS e
  FROM documents),
per AS (
  SELECT source,
         length(replace(norm, ' ', '')) AS chars,
         (length(e) - length(replace(e, '|', ''))) // 2
           - (length(norm) - length(replace(norm, ' ', ''))) AS toks
  FROM enc)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS total_chars,
       CAST(SUM(toks) AS BIGINT) AS total_bpe_tokens,
       ROUND(CAST(SUM(chars) AS DOUBLE) / SUM(toks), 4) AS chars_per_token
FROM per GROUP BY source ORDER BY source"""
    },

    // Bigram LM scoring: bigrams via the t05 list derivation
    // (NON-distinct), add-1 smoothing over the distinct-unigram
    // vocabulary, per-term 1e-6 grid rounding like t11.
    "t16_bigram_logprob" -> ("""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM t),
ucnt AS (SELECT t, COUNT(*) AS ca FROM tok GROUP BY t),
v AS (SELECT COUNT(*) AS v FROM ucnt),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM t WHERE len(toks) >= 2),
bgw AS (SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1 FROM bg),
bcnt AS (SELECT bg, COUNT(*) AS cb FROM bgw GROUP BY bg),
scored AS (
  SELECT bgw.doc_id,
         CAST(ROUND(-ln((bcnt.cb + 1.0) / (ucnt.ca + v.v)) * 1000000)
              AS BIGINT) AS m
  FROM bgw JOIN bcnt USING (bg) JOIN ucnt ON ucnt.t = bgw.w1 CROSS JOIN v)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(m) AS DOUBLE) / COUNT(*) / 1000000.0, 4) AS mean_nll
FROM scored GROUP BY doc_id ORDER BY doc_id"""),

    // Full-strength BPE oracle: the IDENTICAL rank-ordered replace
    // chain over the piped symbol representation (see graft.text.Bpe
    // for why chained literal replace == greedy left-to-right BPE
    // merge application), built from the same frozen merge table the
    // Spark entry uses. md5 of the final state checks the entire
    // tokenization, not just the count.
    "t15_bpe_encode" -> {
      val start =
        """regexp_replace(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '(.)', '|\1|', 'g')"""
      val chain = graft.text.Bpe.DefaultMerges.foldLeft(start) {
        case (acc, (a, b)) => s"replace($acc, '|$a||$b|', '|$a$b|')"
      }
      s"""
WITH enc AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         $chain AS e
  FROM documents)
SELECT doc_id,
       CAST((length(e) - length(replace(e, '|', ''))) // 2
            - (length(norm) - length(replace(norm, ' ', ''))) AS BIGINT)
         AS n_bpe_tokens,
       md5(e) AS bpe_hash
FROM enc ORDER BY doc_id"""
    },

    // d08 = A-ES weighted sampling on the shared integer grid: u from
    // the first 8 md5 hex chars, -ln(u) quantized to 1e-9 before an
    // exact integer divide by the token-count weight (see
    // Mixture.weightedPriority) — everything after the grid is BIGINT
    // math, identical in both engines.
    "d08_weighted_sample" -> ("""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS weight,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS u32
  FROM documents),
p AS (
  SELECT source, doc_id, weight,
         CAST(floor(-ln((u32 + 0.5) / 4294967296.0) * 1e9) AS BIGINT)
           // GREATEST(weight, 1) AS priority
  FROM t),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY priority, doc_id) AS rn
  FROM p)
SELECT source, doc_id, weight, priority, CAST(rn AS BIGINT) AS sample_rank
FROM r WHERE rn <= 5 ORDER BY source, sample_rank"""),

    // d10 = the MinKAgg aggregate form of d08 — identical output by the
    // shared (priority, key) total order, so the oracle is d08's SQL.
    "d10_weighted_sample_agg" -> ("""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
           AS weight,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           AS u32
  FROM documents),
p AS (
  SELECT source, doc_id, weight,
         CAST(floor(-ln((u32 + 0.5) / 4294967296.0) * 1e9) AS BIGINT)
           // GREATEST(weight, 1) AS priority
  FROM t),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY priority, doc_id) AS rn
  FROM p)
SELECT source, doc_id, weight, priority, CAST(rn AS BIGINT) AS sample_rank
FROM r WHERE rn <= 5 ORDER BY source, sample_rank"""),
  )
}
